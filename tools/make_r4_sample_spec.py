"""Generate ``fixtures/r4/profiles-resources.sample.json`` — a faithful
SUBSET of the public R4 (4.0.1) base StructureDefinitions for Patient,
Observation, Condition, Endpoint and CarePlan, in the spec's own
``profiles-resources.json`` Bundle publish format.

The element lists transcribe the published R4 resource definitions
(hl7.org/fhir/R4/<type>.html "Resource Content"), trimmed to the
elements those pages list (no extension slices), and reproduce the R4
artifact dialect the compiler must handle:

* ``Resource.id`` typed as the FHIRPath system string code;
* ``type.targetProfile`` / ``type.profile`` as LISTS of URLs;
* R4-only primitives (``canonical``, ``url``) and the R4 ``Meta``;
* a ``contentReference`` (Observation.component.referenceRange);
* backbone elements with multi-target references.

This container has no network access, so the full artifact cannot be
fetched; when it is available, drop it at ``fixtures/spec-r4/`` or
``$BUNSEN_SPARK_FHIR_R4_SPEC_DIR`` and every R4 type resolves the same
way (structdef.r4_registry auto-load).
"""

from __future__ import annotations

import json
from pathlib import Path

SPEC = "http://hl7.org/fhir/StructureDefinition"
SYS_STRING = "http://hl7.org/fhirpath/System.String"


def el(path, types=None, mx="1", mn=0, **kw):
    out = {"path": path, "min": mn, "max": mx}
    if types is not None:
        out["type"] = types
    out.update(kw)
    return out


def t(code, target=None):
    out = {"code": code}
    if target:
        out["targetProfile"] = [f"{SPEC}/{x}" for x in target]
    return out


def resource_header(name):
    """Elements every R4 DomainResource opens with."""
    return [
        el(name),
        el(f"{name}.id", [t(SYS_STRING)]),
        el(f"{name}.meta", [t("Meta")]),
        el(f"{name}.implicitRules", [t("uri")]),
        el(f"{name}.language", [t("code")]),
        el(f"{name}.text", [t("Narrative")]),
        el(f"{name}.contained", [t("Resource")], mx="*"),
        el(f"{name}.extension", [t("Extension")], mx="*"),
        el(f"{name}.modifierExtension", [t("Extension")], mx="*"),
    ]


PATIENT = resource_header("Patient") + [
    el("Patient.identifier", [t("Identifier")], mx="*"),
    el("Patient.active", [t("boolean")]),
    el("Patient.name", [t("HumanName")], mx="*"),
    el("Patient.telecom", [t("ContactPoint")], mx="*"),
    el("Patient.gender", [t("code")]),
    el("Patient.birthDate", [t("date")]),
    el("Patient.deceased[x]", [t("boolean"), t("dateTime")]),
    el("Patient.address", [t("Address")], mx="*"),
    el("Patient.maritalStatus", [t("CodeableConcept")]),
    el("Patient.multipleBirth[x]", [t("boolean"), t("integer")]),
    el("Patient.photo", [t("Attachment")], mx="*"),
    el("Patient.contact", [t("BackboneElement")], mx="*"),
    el("Patient.contact.relationship", [t("CodeableConcept")], mx="*"),
    el("Patient.contact.name", [t("HumanName")]),
    el("Patient.contact.telecom", [t("ContactPoint")], mx="*"),
    el("Patient.contact.address", [t("Address")]),
    el("Patient.contact.gender", [t("code")]),
    el("Patient.contact.organization", [t("Reference", ["Organization"])]),
    el("Patient.contact.period", [t("Period")]),
    el("Patient.communication", [t("BackboneElement")], mx="*"),
    el("Patient.communication.language", [t("CodeableConcept")], mn=1),
    el("Patient.communication.preferred", [t("boolean")]),
    el(
        "Patient.generalPractitioner",
        [t("Reference", ["Organization", "Practitioner", "PractitionerRole"])],
        mx="*",
    ),
    el("Patient.managingOrganization", [t("Reference", ["Organization"])]),
    el("Patient.link", [t("BackboneElement")], mx="*"),
    el("Patient.link.other", [t("Reference", ["Patient", "RelatedPerson"])], mn=1),
    el("Patient.link.type", [t("code")], mn=1),
]

OBS_VALUE_TYPES = [
    t("Quantity"),
    t("CodeableConcept"),
    t("string"),
    t("boolean"),
    t("integer"),
    t("Range"),
    t("Ratio"),
    t("SampledData"),
    t("time"),
    t("dateTime"),
    t("Period"),
]

OBSERVATION = resource_header("Observation") + [
    el("Observation.identifier", [t("Identifier")], mx="*"),
    el(
        "Observation.basedOn",
        [t("Reference", ["CarePlan", "DeviceRequest", "MedicationRequest", "ServiceRequest"])],
        mx="*",
    ),
    el(
        "Observation.partOf",
        [t("Reference", ["MedicationAdministration", "Procedure", "Immunization"])],
        mx="*",
    ),
    el("Observation.status", [t("code")], mn=1),
    el("Observation.category", [t("CodeableConcept")], mx="*"),
    el("Observation.code", [t("CodeableConcept")], mn=1),
    el(
        "Observation.subject",
        [t("Reference", ["Patient", "Group", "Device", "Location"])],
    ),
    el("Observation.encounter", [t("Reference", ["Encounter"])]),
    el(
        "Observation.effective[x]",
        [t("dateTime"), t("Period"), t("Timing"), t("instant")],
    ),
    el("Observation.issued", [t("instant")]),
    el(
        "Observation.performer",
        [t("Reference", ["Practitioner", "PractitionerRole", "Organization", "Patient", "RelatedPerson"])],
        mx="*",
    ),
    el("Observation.value[x]", OBS_VALUE_TYPES),
    el("Observation.dataAbsentReason", [t("CodeableConcept")]),
    el("Observation.interpretation", [t("CodeableConcept")], mx="*"),
    el("Observation.note", [t("Annotation")], mx="*"),
    el("Observation.bodySite", [t("CodeableConcept")]),
    el("Observation.method", [t("CodeableConcept")]),
    el("Observation.specimen", [t("Reference", ["Specimen"])]),
    el("Observation.device", [t("Reference", ["Device", "DeviceMetric"])]),
    el("Observation.referenceRange", [t("BackboneElement")], mx="*"),
    el("Observation.referenceRange.low", [t("Quantity")]),
    el("Observation.referenceRange.high", [t("Quantity")]),
    el("Observation.referenceRange.type", [t("CodeableConcept")]),
    el("Observation.referenceRange.appliesTo", [t("CodeableConcept")], mx="*"),
    el("Observation.referenceRange.age", [t("Range")]),
    el("Observation.referenceRange.text", [t("string")]),
    el("Observation.hasMember", [t("Reference", ["Observation"])], mx="*"),
    el(
        "Observation.derivedFrom",
        [t("Reference", ["DocumentReference", "Observation"])],
        mx="*",
    ),
    el("Observation.component", [t("BackboneElement")], mx="*"),
    el("Observation.component.code", [t("CodeableConcept")], mn=1),
    el("Observation.component.value[x]", OBS_VALUE_TYPES),
    el("Observation.component.dataAbsentReason", [t("CodeableConcept")]),
    el("Observation.component.interpretation", [t("CodeableConcept")], mx="*"),
    el(
        "Observation.component.referenceRange",
        mx="*",
        contentReference="#Observation.referenceRange",
    ),
]

CONDITION = resource_header("Condition") + [
    el("Condition.identifier", [t("Identifier")], mx="*"),
    el("Condition.clinicalStatus", [t("CodeableConcept")]),
    el("Condition.verificationStatus", [t("CodeableConcept")]),
    el("Condition.category", [t("CodeableConcept")], mx="*"),
    el("Condition.severity", [t("CodeableConcept")]),
    el("Condition.code", [t("CodeableConcept")]),
    el("Condition.bodySite", [t("CodeableConcept")], mx="*"),
    el("Condition.subject", [t("Reference", ["Patient", "Group"])], mn=1),
    el("Condition.encounter", [t("Reference", ["Encounter"])]),
    el(
        "Condition.onset[x]",
        [t("dateTime"), t("Age"), t("Period"), t("Range"), t("string")],
    ),
    el(
        "Condition.abatement[x]",
        [t("dateTime"), t("Age"), t("Period"), t("Range"), t("string")],
    ),
    el("Condition.recordedDate", [t("dateTime")]),
    el(
        "Condition.recorder",
        [t("Reference", ["Practitioner", "PractitionerRole", "Patient", "RelatedPerson"])],
    ),
    el(
        "Condition.asserter",
        [t("Reference", ["Practitioner", "PractitionerRole", "Patient", "RelatedPerson"])],
    ),
    el("Condition.stage", [t("BackboneElement")], mx="*"),
    el("Condition.stage.summary", [t("CodeableConcept")]),
    el(
        "Condition.stage.assessment",
        [t("Reference", ["ClinicalImpression", "DiagnosticReport", "Observation"])],
        mx="*",
    ),
    el("Condition.stage.type", [t("CodeableConcept")]),
    el("Condition.evidence", [t("BackboneElement")], mx="*"),
    el("Condition.evidence.code", [t("CodeableConcept")], mx="*"),
    el("Condition.evidence.detail", [t("Reference", ["Resource"])], mx="*"),
    el("Condition.note", [t("Annotation")], mx="*"),
]

# Endpoint exercises the R4-only ``url`` primitive
ENDPOINT = resource_header("Endpoint") + [
    el("Endpoint.identifier", [t("Identifier")], mx="*"),
    el("Endpoint.status", [t("code")], mn=1),
    el("Endpoint.connectionType", [t("Coding")], mn=1),
    el("Endpoint.name", [t("string")]),
    el("Endpoint.managingOrganization", [t("Reference", ["Organization"])]),
    el("Endpoint.contact", [t("ContactPoint")], mx="*"),
    el("Endpoint.period", [t("Period")]),
    el("Endpoint.payloadType", [t("CodeableConcept")], mx="*", mn=1),
    el("Endpoint.payloadMimeType", [t("code")], mx="*"),
    el("Endpoint.address", [t("url")], mn=1),
    el("Endpoint.header", [t("string")], mx="*"),
]

# CarePlan (subset) exercises the R4-only ``canonical`` primitive
CAREPLAN = resource_header("CarePlan") + [
    el("CarePlan.identifier", [t("Identifier")], mx="*"),
    el(
        "CarePlan.instantiatesCanonical",
        [{"code": "canonical", "targetProfile": [f"{SPEC}/PlanDefinition", f"{SPEC}/Questionnaire"]}],
        mx="*",
    ),
    el("CarePlan.instantiatesUri", [t("uri")], mx="*"),
    el("CarePlan.status", [t("code")], mn=1),
    el("CarePlan.intent", [t("code")], mn=1),
    el("CarePlan.category", [t("CodeableConcept")], mx="*"),
    el("CarePlan.title", [t("string")]),
    el("CarePlan.description", [t("string")]),
    el("CarePlan.subject", [t("Reference", ["Patient", "Group"])], mn=1),
    el("CarePlan.encounter", [t("Reference", ["Encounter"])]),
    el("CarePlan.period", [t("Period")]),
    el("CarePlan.created", [t("dateTime")]),
    el("CarePlan.author", [t("Reference", ["Patient", "Practitioner", "Organization"])]),
    el("CarePlan.note", [t("Annotation")], mx="*"),
]


# R4 terminology resources (hl7.org/fhir/R4/conceptmap.html and
# /valueset.html "Resource Content"), trimmed like the rest of this
# sample: ContactDetail/UsageContext/jurisdiction metadata elements are
# omitted (no complex-datatype mapping, same trim as the STU3 engine
# schemas), and ValueSet.expansion is omitted (its `contains` element
# is self-recursive, which no finite relational schema can carry; the
# STU3 engine schema omits expansion for the same reason). Everything
# the terminology collections touch is present, in the R4 dialect:
# source[x]/target[x] as uri|canonical (STU3: uri|Reference), canonical
# unmapped.url / include.valueSet, dependsOn.property/system/value, and
# `exclude` + `product` as contentReference re-uses.
CONCEPTMAP = resource_header("ConceptMap") + [
    el("ConceptMap.url", [t("uri")]),
    el("ConceptMap.identifier", [t("Identifier")]),
    el("ConceptMap.version", [t("string")]),
    el("ConceptMap.name", [t("string")]),
    el("ConceptMap.title", [t("string")]),
    el("ConceptMap.status", [t("code")], mn=1),
    el("ConceptMap.experimental", [t("boolean")]),
    el("ConceptMap.date", [t("dateTime")]),
    el("ConceptMap.publisher", [t("string")]),
    el("ConceptMap.description", [t("markdown")]),
    el("ConceptMap.purpose", [t("markdown")]),
    el("ConceptMap.copyright", [t("markdown")]),
    el("ConceptMap.source[x]", [t("uri"), {"code": "canonical", "targetProfile": [f"{SPEC}/ValueSet"]}]),
    el("ConceptMap.target[x]", [t("uri"), {"code": "canonical", "targetProfile": [f"{SPEC}/ValueSet"]}]),
    el("ConceptMap.group", [t("BackboneElement")], mx="*"),
    el("ConceptMap.group.source", [t("uri")]),
    el("ConceptMap.group.sourceVersion", [t("string")]),
    el("ConceptMap.group.target", [t("uri")]),
    el("ConceptMap.group.targetVersion", [t("string")]),
    el("ConceptMap.group.element", [t("BackboneElement")], mx="*", mn=1),
    el("ConceptMap.group.element.code", [t("code")]),
    el("ConceptMap.group.element.display", [t("string")]),
    el("ConceptMap.group.element.target", [t("BackboneElement")], mx="*"),
    el("ConceptMap.group.element.target.code", [t("code")]),
    el("ConceptMap.group.element.target.display", [t("string")]),
    el("ConceptMap.group.element.target.equivalence", [t("code")], mn=1),
    el("ConceptMap.group.element.target.comment", [t("string")]),
    el("ConceptMap.group.element.target.dependsOn", [t("BackboneElement")], mx="*"),
    el("ConceptMap.group.element.target.dependsOn.property", [t("uri")], mn=1),
    el(
        "ConceptMap.group.element.target.dependsOn.system",
        [{"code": "canonical", "targetProfile": [f"{SPEC}/CodeSystem"]}],
    ),
    el("ConceptMap.group.element.target.dependsOn.value", [t("string")], mn=1),
    el("ConceptMap.group.element.target.dependsOn.display", [t("string")]),
    el(
        "ConceptMap.group.element.target.product",
        mx="*",
        contentReference="#ConceptMap.group.element.target.dependsOn",
    ),
    el("ConceptMap.group.unmapped", [t("BackboneElement")]),
    el("ConceptMap.group.unmapped.mode", [t("code")], mn=1),
    el("ConceptMap.group.unmapped.code", [t("code")]),
    el("ConceptMap.group.unmapped.display", [t("string")]),
    el(
        "ConceptMap.group.unmapped.url",
        [{"code": "canonical", "targetProfile": [f"{SPEC}/ConceptMap"]}],
    ),
]

VALUESET = resource_header("ValueSet") + [
    el("ValueSet.url", [t("uri")]),
    el("ValueSet.identifier", [t("Identifier")], mx="*"),
    el("ValueSet.version", [t("string")]),
    el("ValueSet.name", [t("string")]),
    el("ValueSet.title", [t("string")]),
    el("ValueSet.status", [t("code")], mn=1),
    el("ValueSet.experimental", [t("boolean")]),
    el("ValueSet.date", [t("dateTime")]),
    el("ValueSet.publisher", [t("string")]),
    el("ValueSet.description", [t("markdown")]),
    el("ValueSet.immutable", [t("boolean")]),
    el("ValueSet.purpose", [t("markdown")]),
    el("ValueSet.copyright", [t("markdown")]),
    el("ValueSet.compose", [t("BackboneElement")]),
    el("ValueSet.compose.lockedDate", [t("date")]),
    el("ValueSet.compose.inactive", [t("boolean")]),
    el("ValueSet.compose.include", [t("BackboneElement")], mx="*", mn=1),
    el("ValueSet.compose.include.system", [t("uri")]),
    el("ValueSet.compose.include.version", [t("string")]),
    el("ValueSet.compose.include.concept", [t("BackboneElement")], mx="*"),
    el("ValueSet.compose.include.concept.code", [t("code")], mn=1),
    el("ValueSet.compose.include.concept.display", [t("string")]),
    el("ValueSet.compose.include.concept.designation", [t("BackboneElement")], mx="*"),
    el("ValueSet.compose.include.concept.designation.language", [t("code")]),
    el("ValueSet.compose.include.concept.designation.use", [t("Coding")]),
    el("ValueSet.compose.include.concept.designation.value", [t("string")], mn=1),
    el("ValueSet.compose.include.filter", [t("BackboneElement")], mx="*"),
    el("ValueSet.compose.include.filter.property", [t("code")], mn=1),
    el("ValueSet.compose.include.filter.op", [t("code")], mn=1),
    el("ValueSet.compose.include.filter.value", [t("string")], mn=1),
    el(
        "ValueSet.compose.include.valueSet",
        [{"code": "canonical", "targetProfile": [f"{SPEC}/ValueSet"]}],
        mx="*",
    ),
    el(
        "ValueSet.compose.exclude",
        mx="*",
        contentReference="#ValueSet.compose.include",
    ),
]


def sd(name, elements):
    return {
        "resourceType": "StructureDefinition",
        "id": name,
        "url": f"{SPEC}/{name}",
        "name": name,
        "fhirVersion": "4.0.1",
        "kind": "resource",
        "type": name,
        "baseDefinition": f"{SPEC}/DomainResource",
        "snapshot": {"element": elements},
    }


def main() -> None:
    bundle = {
        "resourceType": "Bundle",
        "type": "collection",
        "entry": [
            {"resource": sd(n, e)}
            for n, e in (
                ("Patient", PATIENT),
                ("Observation", OBSERVATION),
                ("Condition", CONDITION),
                ("Endpoint", ENDPOINT),
                ("CarePlan", CAREPLAN),
                ("ConceptMap", CONCEPTMAP),
                ("ValueSet", VALUESET),
            )
        ],
    }
    out = Path(__file__).resolve().parent.parent / "fixtures" / "r4"
    out.mkdir(parents=True, exist_ok=True)
    path = out / "profiles-resources.sample.json"
    path.write_text(json.dumps(bundle, indent=1) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
