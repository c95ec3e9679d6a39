"""Generate the repo's own deterministic FHIR test fixtures.

Structure (not content) mirrors the reference's test corpus so the same
golden counts hold (SURVEY §5): 3 patient bundles containing Patient /
Condition (5 total) / Observation (14 blood-pressure rows, LOINC 8462-4,
plus non-BP observations) / MedicationRequest entries; a bundle holding
an extensional ValueSet (4 concepts); a gender ConceptMap (5 mappings);
a marital-status ValueSet (1 concept); LOINC-hierarchy-style CSV and
SNOMED-relationship-style TSV samples (the SNOMED sample contains a
deliberate cycle to exercise cycle-safe closure).

All content is synthetic and written by this script; run from the repo
root: ``python tools/make_fixtures.py``.
"""

from __future__ import annotations

import json
from pathlib import Path

FIX = Path(__file__).resolve().parent.parent / "fixtures"

LOINC = "http://loinc.org"
SNOMED = "http://snomed.info/sct"

PATIENTS = [
    ("pat-1001", "female", "1974-03-12", 2, 6, 1),  # (id, gender, birth, n_cond, n_bp, n_med)
    ("pat-1002", "male", "1952-11-30", 2, 5, 2),
    ("pat-1003", "female", "1989-07-04", 1, 3, 1),
]

CONDITION_CODES = [
    (SNOMED, "44054006", "Diabetes mellitus type 2"),
    (SNOMED, "38341003", "Hypertensive disorder"),
    (SNOMED, "195967001", "Asthma"),
    (SNOMED, "13645005", "COPD"),
    (SNOMED, "49436004", "Atrial fibrillation"),
]


def patient(pid: str, gender: str, birth: str) -> dict:
    return {
        "resourceType": "Patient",
        "id": pid,
        "meta": {"versionId": "1", "lastUpdated": "2016-01-01T00:00:00Z"},
        "name": [{"use": "official", "family": f"Fam{pid[-4:]}", "given": [f"Given{pid[-4:]}"]}],
        "gender": gender,
        "birthDate": birth,
        "maritalStatus": {
            "coding": [
                {"system": "http://hl7.org/fhir/v3/MaritalStatus", "code": "M", "display": "Married"}
            ],
            "text": "Married",
        },
        "multipleBirthBoolean": False,
        "address": [{"use": "home", "city": "Springfield", "state": "IL", "postalCode": "62701"}],
    }


def condition(cid: str, pid: str, code: tuple[str, str, str], onset: str) -> dict:
    system, value, display = code
    return {
        "resourceType": "Condition",
        "id": cid,
        "clinicalStatus": "active",
        "verificationStatus": "confirmed",
        "category": [
            {
                "coding": [
                    {
                        "system": "http://hl7.org/fhir/condition-category",
                        "code": "problem-list-item",
                    }
                ]
            }
        ],
        "code": {"coding": [{"system": system, "code": value, "display": display}], "text": display},
        "subject": {"reference": f"Patient/{pid}"},
        "onsetDateTime": onset,
        "assertedDate": onset,
    }


def bp_observation(oid: str, pid: str, when: str, systolic: float) -> dict:
    return {
        "resourceType": "Observation",
        "id": oid,
        "status": "final",
        "category": [
            {
                "coding": [
                    {
                        "system": "http://hl7.org/fhir/observation-category",
                        "code": "vital-signs",
                    }
                ]
            }
        ],
        "code": {
            "coding": [{"system": LOINC, "code": "8462-4", "display": "Diastolic blood pressure"}],
            "text": "Diastolic blood pressure",
        },
        "subject": {"reference": f"Patient/{pid}"},
        "effectiveDateTime": when,
        "valueQuantity": {
            "value": systolic,
            "unit": "mm[Hg]",
            "system": "http://unitsofmeasure.org",
            "code": "mm[Hg]",
        },
    }


def other_observation(oid: str, pid: str, when: str) -> dict:
    # a non-BP lab: leukocyte count (code 5000-5, a leaf of the repo's
    # LOINC sample tree so isa_loinc descendants match it); status "?"
    # exercises the code null-flavor normalization
    return {
        "resourceType": "Observation",
        "id": oid,
        "status": "?",
        "code": {"coding": [{"system": LOINC, "code": "5000-5", "display": "Leukocytes [#/volume]"}]},
        "subject": {"reference": f"Patient/{pid}"},
        "effectiveDateTime": when,
        "valueQuantity": {
            "value": 7.3,
            "unit": "10*3/uL",
            "system": "http://unitsofmeasure.org",
            "code": "10*3/uL",
        },
    }


def med_request(mid: str, pid: str, when: str) -> dict:
    return {
        "resourceType": "MedicationRequest",
        "id": mid,
        "status": "active",
        "intent": "order",
        "medicationCodeableConcept": {
            "coding": [
                {
                    "system": "http://www.nlm.nih.gov/research/umls/rxnorm",
                    "code": "197361",
                    "display": "Lisinopril 10 MG Oral Tablet",
                }
            ]
        },
        "subject": {"reference": f"Patient/{pid}"},
        "authoredOn": when,
        "dosageInstruction": [
            {
                "sequence": 1,
                "text": "one daily",
                "asNeededBoolean": False,
                "doseQuantity": {"value": 1.0, "unit": "tablet"},
            }
        ],
    }


def make_bundles() -> None:
    out = FIX / "bundles" / "json"
    out.mkdir(parents=True, exist_ok=True)
    ci = iter(CONDITION_CODES)
    n_obs = 0
    n_cond = 0
    for pid, gender, birth, n_c, n_bp, n_med in PATIENTS:
        entries: list[dict] = [{"resource": patient(pid, gender, birth)}]
        for k in range(n_c):
            n_cond += 1
            entries.append(
                {
                    "resource": condition(
                        f"cond-{n_cond:03d}", pid, next(ci), f"201{k}-0{k + 1}-15T00:00:00Z"
                    )
                }
            )
        for k in range(n_bp):
            n_obs += 1
            entries.append(
                {
                    "resource": bp_observation(
                        f"obs-{n_obs:03d}", pid, f"2015-0{(k % 9) + 1}-0{(k % 27) + 1}T10:3{k % 10}:00Z",
                        60.0 + n_obs + k * 0.5,
                    )
                }
            )
        n_obs += 1
        entries.append({"resource": other_observation(f"obs-{n_obs:03d}", pid, "2015-06-01T08:00:00Z")})
        for k in range(n_med):
            entries.append({"resource": med_request(f"med-{pid[-4:]}-{k}", pid, "2015-07-01T00:00:00Z")})
        bundle = {"resourceType": "Bundle", "type": "collection", "entry": entries}
        (out / f"{pid}.bundle.json").write_text(json.dumps(bundle, indent=1))

    # valueset bundle: one extensional ValueSet with 4 concepts
    vs = {
        "resourceType": "ValueSet",
        "id": "vs-extensional-example",
        "url": "urn:bunsen-spark:valueset:extensional-example",
        "version": "20150622",
        "name": "ExtensionalExample",
        "status": "active",
        "experimental": False,
        "compose": {
            "include": [
                {
                    "system": LOINC,
                    "version": "2.36",
                    "concept": [
                        {"code": "14647-2", "display": "Cholesterol [Moles/volume]"},
                        {"code": "2093-3", "display": "Cholesterol [Mass/volume]"},
                        {"code": "35200-5", "display": "Cholesterol [Mass or Moles/volume]"},
                        {"code": "9342-7", "display": "Cholesterol [Percentile]"},
                    ],
                }
            ]
        },
    }
    bundle = {"resourceType": "Bundle", "type": "collection", "entry": [{"resource": vs}]}
    (out / "valueset.bundle.json").write_text(json.dumps(bundle, indent=1))


def make_terminology() -> None:
    cm_dir = FIX / "conceptmaps"
    vs_dir = FIX / "valuesets"
    cm_dir.mkdir(parents=True, exist_ok=True)
    vs_dir.mkdir(parents=True, exist_ok=True)
    gender_map = {
        "resourceType": "ConceptMap",
        "id": "demographics-gender",
        "url": "urn:bunsen-spark:conceptmap:demographics:gender",
        "version": "0.0.1",
        "name": "DemographicsGender",
        "status": "active",
        "experimental": False,
        "sourceUri": "urn:bunsen-spark:valueset:gender-source",
        "targetUri": "urn:bunsen-spark:valueset:gender-target",
        "group": [
            {
                "source": "urn:bunsen-spark:code:raw-gender",
                "target": "http://hl7.org/fhir/administrative-gender",
                "element": [
                    {"code": "F", "target": [{"code": "female", "equivalence": "equivalent"}]},
                    {"code": "f", "target": [{"code": "female", "equivalence": "equivalent"}]},
                    {"code": "M", "target": [{"code": "male", "equivalence": "equivalent"}]},
                    {"code": "m", "target": [{"code": "male", "equivalence": "equivalent"}]},
                    {"code": "U", "target": [{"code": "unknown", "equivalence": "equivalent"}]},
                ],
            }
        ],
    }
    (cm_dir / "gender.json").write_text(json.dumps(gender_map, indent=1))

    married = {
        "resourceType": "ValueSet",
        "id": "married-maritalstatus",
        "url": "urn:bunsen-spark:valueset:married_maritalstatus",
        "version": "0.0.1",
        "name": "MarriedMaritalStatus",
        "status": "active",
        "experimental": False,
        "compose": {
            "include": [
                {
                    "system": "http://hl7.org/fhir/v3/MaritalStatus",
                    "concept": [{"code": "M", "display": "Married"}],
                }
            ]
        },
    }
    (vs_dir / "married_maritalstatus.json").write_text(json.dumps(married, indent=1))


def make_hierarchies() -> None:
    FIX.mkdir(parents=True, exist_ok=True)
    # LOINC multiaxial-hierarchy-style CSV: golden closure — descendants of
    # LP100-0 = {LP100-0, LP110-1, 5000-5} (incl. self); deeper chain under LP000-9
    loinc_rows = [
        "PATH_TO_ROOT,SEQUENCE,IMMEDIATE_PARENT,CODE,CODE_TEXT",
        ",1,,LP000-9,Root panel",
        "LP000-9,1,LP000-9,LP100-0,Leukocyte panel",
        "LP000-9.LP100-0,1,LP100-0,LP110-1,Leukocyte count group",
        "LP000-9.LP100-0.LP110-1,1,LP110-1,5000-5,Leukocytes [#/volume]",
        "LP000-9,2,LP000-9,LP200-2,Erythrocyte panel",
        "LP000-9.LP200-2,1,LP200-2,6000-6,Erythrocytes [#/volume]",
    ]
    (FIX / "LOINC_HIERARCHY_SAMPLE.CSV").write_text("\n".join(loinc_rows) + "\n")

    # SNOMED relationship-style TSV: is-a rows (typeId 116680003) incl. a
    # deliberate 2-node cycle (900100-900200) and inactive/non-isa noise.
    # Golden closure: descendants of 73211009 = {73211009, 44054006}.
    header = (
        "id\teffectiveTime\tactive\tmoduleId\tsourceId\tdestinationId"
        "\trelationshipGroup\ttypeId\tcharacteristicTypeId\tmodifierId"
    )
    rows = [
        header,
        # sourceId (child) -> destinationId (parent), is-a, active
        "1\t20160101\t1\tm\t44054006\t73211009\t0\t116680003\tc\tmod",
        "2\t20160101\t1\tm\t73211009\t362969004\t0\t116680003\tc\tmod",
        "3\t20160101\t1\tm\t38341003\t362969004\t0\t116680003\tc\tmod",
        # non-is-a typeId → must be filtered out
        "4\t20160101\t1\tm\t44054006\t362969004\t0\t363698007\tc\tmod",
        # inactive row → must be filtered out
        "5\t20160101\t0\tm\t38341003\t73211009\t0\t116680003\tc\tmod",
        # deliberate cycle: 900100 is-a 900200 is-a 900100
        "6\t20160101\t1\tm\t900100\t900200\t0\t116680003\tc\tmod",
        "7\t20160101\t1\tm\t900200\t900100\t0\t116680003\tc\tmod",
        # a child hanging off the cycle
        "8\t20160101\t1\tm\t900300\t900100\t0\t116680003\tc\tmod",
    ]
    (FIX / "SNOMED_RELATIONSHIP_SAMPLE.TXT").write_text("\n".join(rows) + "\n")


if __name__ == "__main__":
    make_bundles()
    make_terminology()
    make_hierarchies()
    print(f"fixtures written to {FIX}")
