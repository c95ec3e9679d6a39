"""Spec-driven schema generation (VERDICT r1 item 2; SURVEY §1.3).

Compiling FHIR StructureDefinition snapshot JSON (the public spec
artifact) must give any listed resource or profile the full schema /
converter machinery — parity targets `Stu3StructureDefinitions.java:35-371`
and the 26 US-Core profiles of `UsCoreStu3ProfileProvider.java:43-69`.
"""

from __future__ import annotations

import pytest

from bunsen_spark.schema import core
from bunsen_spark.schema.structdef import DATATYPES, default_registry

US_CORE = "http://hl7.org/fhir/us/core/StructureDefinition"


def field_types(struct):
    return {f.name: f.dataType for f in struct.fields}


def test_all_bundled_definitions_compile():
    reg = default_registry()
    assert len(reg.urls()) == 26  # same set the reference ships
    for url in reg.urls():
        compiled = reg.get(url)
        assert compiled is not None, url
        if isinstance(compiled, core.Complex):
            # every resource profile expands to both schema forms
            assert core.spark_schema(compiled).fields
            assert core.json_schema(compiled).fields


def test_choice_reference_and_cardinality_rules():
    """§1.3 structural rules on a resource with no hand-written DSL."""
    reg = default_registry()
    schema = core.spark_schema(reg.get("us-core-diagnosticreport"))
    ft = field_types(schema)

    # choice element effective[x] → one struct with a field per type
    eff = ft["effective"]
    assert {f.name for f in eff.fields} == {"dateTime", "period"}

    # Reference elements carry synthetic <target>Id columns, resolved
    # through profile targetProfiles to BASE resource types
    subj = {f.name for f in ft["subject"].fields}
    assert subj == {"reference", "display", "patientId"}
    result = ft["result"].elementType
    assert "observationId" in {f.name for f in result.fields}

    # max=* → array
    assert ft["result"].typeName() == "array"


def test_max_zero_elements_dropped():
    # US-Core Patient constrains Patient.animal to max=0
    reg = default_registry()
    names = {f.name for f in core.spark_schema(reg.get("us-core-patient")).fields}
    assert "animal" not in names
    assert {"race", "ethnicity", "birthsex", "link"} <= names


def test_compiled_profile_matches_handwritten_dsl():
    """The compiled us-core-patient must be a superset of the
    hand-written US_CORE_PATIENT DSL with identical shared shapes."""
    from bunsen_spark.schema.resources import US_CORE_PATIENT

    reg = default_registry()
    comp = field_types(core.spark_schema(reg.get("us-core-patient")))
    hand = field_types(core.spark_schema(US_CORE_PATIENT))
    missing = set(hand) - set(comp)
    assert not missing
    for name in set(hand) & set(comp) - {"race"}:  # compiled race adds 'detailed'
        assert comp[name] == hand[name], name


def test_extension_slice_forms():
    reg = default_registry()
    # leaf extension: birthsex → code (string column)
    ext = reg.get(f"{US_CORE}/us-core-birthsex")
    assert isinstance(ext, core.Extension) and ext.vtype == "code"
    # parent extension: race → nested sub-extension struct
    race = reg.get(f"{US_CORE}/us-core-race")
    assert race.is_parent
    subs = {f.name: f for f in race.children}
    assert set(subs) == {"ombCategory", "detailed", "text"}
    assert subs["ombCategory"].many  # max=5 in the spec → array
    assert subs["text"].ftype.vtype == "string"


def test_content_reference_reuses_backbone():
    # Observation.component.referenceRange → #Observation.referenceRange
    reg = default_registry()
    schema = core.spark_schema(reg.get("us-core-observationresults"))
    ft = field_types(schema)
    direct = ft["referenceRange"].elementType
    via_component = field_types(ft["component"].elementType)["referenceRange"].elementType
    assert direct == via_component


def test_quantity_derived_datatypes_share_shape():
    q = core._spark_type(DATATYPES["Quantity"], ())
    for code in ("Age", "Duration", "Money"):
        assert core._spark_type(DATATYPES[code], ()) == q


def test_unknown_resource_error_lists_spec_profiles():
    from bunsen_spark.schema.resources import definition_for

    with pytest.raises(ValueError, match="us-core-diagnosticreport"):
        definition_for("NotAResource")


@pytest.fixture(scope="module")
def spec_bundles(spark):
    from bunsen_spark.sources.bundles import load_from_directory

    return load_from_directory(spark, "fixtures/bundles/specdriven")


def test_extract_entry_spec_only_resource(spark, spec_bundles):
    """extract_entry for a resource with NO hand-written definition
    (the VERDICT's done-criterion: DiagnosticReport end-to-end)."""
    from bunsen_spark.sources.bundles import extract_entry

    dr = extract_entry(spark, spec_bundles, "us-core-diagnosticreport")
    row = dr.collect()[0]
    assert row["id"] == "diag-2001" and row["status"] == "final"
    assert row["code"]["coding"][0]["code"] == "24323-8"
    # choice branch populated from the JSON sibling spelling
    assert row["effective"]["dateTime"] == "2016-03-04T08:30:00Z"
    # relative-reference id extraction against profile-resolved targets
    assert row["subject"]["patientId"] == "pat-1001"
    assert [r["observationId"] for r in row["result"]] == [
        "obs-glucose",
        "obs-sodium",
    ]
    assert row["performer"][0]["actor"]["display"] == "Acme Lab"


def test_extract_entry_addressable_by_url_id(spark, spec_bundles):
    from bunsen_spark.sources.bundles import extract_entry

    by_id = extract_entry(spark, spec_bundles, "us-core-careteam")
    by_url = extract_entry(spark, spec_bundles, f"{US_CORE}/us-core-careteam")
    assert by_id.schema == by_url.schema
    row = by_id.collect()[0]
    assert row["participant"][0]["member"]["practitionerId"] == "pract-9"


def test_user_loaded_structure_definition(tmp_path, spark, spec_bundles):
    """A user-registered spec file (full artifact form, not minimized)
    becomes addressable — here a tiny custom Basic-like resource."""
    import json

    sd = {
        "resourceType": "StructureDefinition",
        "id": "simple-flag",
        "url": "http://example.org/StructureDefinition/simple-flag",
        "name": "SimpleFlag",
        "type": "Flag",
        "kind": "resource",
        "snapshot": {
            "element": [
                {"path": "Flag", "min": 0, "max": "*"},
                {"path": "Flag.id", "min": 0, "max": "1", "type": [{"code": "id"}]},
                {"path": "Flag.status", "min": 1, "max": "1", "type": [{"code": "code"}]},
                {
                    "path": "Flag.code",
                    "min": 1,
                    "max": "1",
                    "type": [{"code": "CodeableConcept"}],
                },
                {
                    "path": "Flag.subject",
                    "min": 1,
                    "max": "1",
                    "type": [
                        {
                            "code": "Reference",
                            "targetProfile": "http://hl7.org/fhir/StructureDefinition/Patient",
                        }
                    ],
                },
            ]
        },
    }
    p = tmp_path / "StructureDefinition-simple-flag.json"
    p.write_text(json.dumps(sd))
    from bunsen_spark.schema.structdef import load_structure_definitions

    urls = load_structure_definitions(p)
    assert urls == ["http://example.org/StructureDefinition/simple-flag"]
    from bunsen_spark.schema.resources import base_resource_type, definition_for

    d = definition_for("simple-flag")
    assert base_resource_type("simple-flag") == "Flag"
    ft = field_types(core.spark_schema(d))
    assert {f.name for f in ft["subject"].fields} == {
        "reference",
        "display",
        "patientId",
    }


def test_contained_types_with_spec_profile(spark):
    """extract_entry(contained_types=...) composes with spec-compiled
    profiles: a contained Observation inside a DiagnosticReport."""
    import json

    from bunsen_spark.sources.bundles import extract_entry, from_json_column

    bundle = {
        "resourceType": "Bundle",
        "type": "collection",
        "entry": [
            {
                "resource": {
                    "resourceType": "DiagnosticReport",
                    "id": "dr-c1",
                    "status": "final",
                    "code": {"text": "panel"},
                    "contained": [
                        {
                            "resourceType": "Observation",
                            "id": "inner-obs",
                            "status": "final",
                            "code": {"text": "glucose"},
                            "valueQuantity": {"value": 5.5, "unit": "mmol/L"},
                        }
                    ],
                }
            }
        ],
    }
    df = spark.createDataFrame([(json.dumps(bundle),)], "content string")
    dr = extract_entry(
        spark,
        from_json_column(df, "content"),
        "us-core-diagnosticreport",
        contained_types=("Observation",),
    )
    row = dr.collect()[0]
    inner = row["contained"][0]["observation"]
    assert inner["id"] == "inner-obs"
    assert inner["code"]["text"] == "glucose"
    assert str(inner["value"]["quantity"]["value"]) == "5.5000"
