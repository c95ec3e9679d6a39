"""R4 terminology API (`python/bunsen/r4/codes/__init__.py:7-102`,
`python/bunsen/r4/valuesets.py:18-159`): the same factory surface as
the STU3 drop-in, compiled from the R4 registry (``r4:ConceptMap`` /
``r4:ValueSet``). Replays the STU3 suite's golden counts — gender map
→ 5 mappings, married marital-status set → 1 value — through the R4
classes, and pins the R4-dialect schema differences (no
``extensible``, canonical choice branches, dependsOn-bearing target
backbones) flowing through strip/explode/re-assembly unchanged."""

from __future__ import annotations

from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

MAP_URL = "urn:example:map:priority"
VS_URL = "urn:example:valueset:vitals"
GENDER_URL = "urn:bunsen-spark:conceptmap:demographics:gender"
MARRIED_URL = "urn:bunsen-spark:valueset:married_maritalstatus"


@pytest.fixture(scope="module", autouse=True)
def r4_spec():
    from bunsen_spark.schema.structdef import load_r4_structure_definitions

    load_r4_structure_definitions(REPO / "fixtures" / "r4" / "profiles-resources.sample.json")


def test_r4_schemas_are_r4_shaped(spark):
    from bunsen_spark.r4.codes import create_concept_maps, create_value_sets

    cm = create_concept_maps(spark)
    assert cm.resource_type == "r4:ConceptMap"
    src = cm.concept_maps.schema["source"].dataType
    # R4 source[x] is uri | canonical (STU3: uri | Reference)
    assert [f.name for f in src.fields] == ["uri", "canonical"]
    tgt = (
        cm.concept_maps.schema["group"].dataType.elementType["element"]
        .dataType.elementType["target"].dataType.elementType
    )
    assert "dependsOn" in [f.name for f in tgt.fields]

    vs = create_value_sets(spark)
    assert vs.resource_type == "r4:ValueSet"
    names = [f.name for f in vs.value_sets.schema.fields]
    assert "extensible" not in names  # dropped in R4
    assert "immutable" in names


@pytest.mark.slow
def test_r4_with_new_map_and_add_mappings(spark):
    from bunsen_spark.r4.codes import create_concept_maps

    maps = create_concept_maps(spark).with_new_map(
        MAP_URL,
        "1",
        "urn:example:src",
        "urn:example:tgt",
        [
            ("sysA", "a", "sysB", "b", "equivalent"),
            ("sysA", "c", "sysB", "d", "wider"),
        ],
    )
    got = {
        (r["sourcevalue"], r["targetvalue"], r["equivalence"])
        for r in maps.get_mappings(MAP_URL).collect()
    }
    assert got == {("a", "b", "equivalent"), ("c", "d", "wider")}

    v2 = maps.add_mappings(
        MAP_URL, "1", "2", [("sysA", "e", "sysB", "f", "equivalent")]
    )
    assert v2.latest_version(MAP_URL) == "2"
    assert v2.get_mappings(MAP_URL, "2").count() == 3
    assert v2.get_mappings(MAP_URL, "1").count() == 2

    xml = maps.get_map_as_xml(MAP_URL, "1")
    assert xml.startswith('<ConceptMap xmlns="http://hl7.org/fhir">')
    assert '<code value="a"/>' in xml and '<equivalence value="wider"/>' in xml


@pytest.mark.slow
def test_r4_with_new_value_set_and_add_values(spark):
    from bunsen_spark.r4.codes import create_value_sets

    vs = create_value_sets(spark).with_new_value_set(
        VS_URL,
        "1",
        [("http://loinc.org", "8480-6"), ("http://loinc.org", "2020-4", "8462-4")],
    )
    got = {
        (r["system"], r["version"], r["value"])
        for r in vs.get_values(VS_URL).collect()
    }
    assert got == {
        ("http://loinc.org", None, "8480-6"),
        ("http://loinc.org", "2020-4", "8462-4"),
    }

    v2 = vs.add_values(VS_URL, "1", "2", [("http://loinc.org", "8867-4")])
    assert v2.get_values(VS_URL, "2").count() == 3
    assert v2.get_values(VS_URL, "1").count() == 2

    xml = vs.get_value_set_as_xml(VS_URL, "1")
    assert xml.startswith('<ValueSet xmlns="http://hl7.org/fhir">')
    assert '<code value="8480-6"/>' in xml


def test_r4_gender_map_golden_counts(spark):
    """The generation-neutral gender fixture loads through the R4
    schema with the same golden counts as STU3 (5 mappings), and
    translate() produces identical results."""
    from bunsen_spark.r4.codes import create_concept_maps

    maps = create_concept_maps(spark).with_maps_from_directory("fixtures/conceptmaps")
    assert maps.get_mappings(GENDER_URL).count() == 5
    # payload strip: stored metadata rows carry no elements
    import pyspark.sql.functions as F

    n_elems = (
        maps.get_maps()
        .select(F.explode("group").alias("g"))
        .select(F.size("g.element").alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert n_elems == 0

    facts = spark.createDataFrame(
        [("urn:bunsen-spark:code:raw-gender", "F")], "system string, code string"
    )
    out = maps.translate(facts, GENDER_URL, "system", "code").collect()[0]
    assert out["targetvalue"] == "female"


def test_r4_married_valueset_golden_counts_and_reassembly(spark):
    import json as jsonlib

    from bunsen_spark.r4.codes import create_value_sets

    vs = create_value_sets(spark).with_value_sets_from_directory("fixtures/valuesets")
    values = vs.get_values(MARRIED_URL).collect()
    assert len(values) == 1
    assert (values[0]["system"], values[0]["value"]) == (
        "http://hl7.org/fhir/v3/MaritalStatus",
        "M",
    )
    # re-assembled resource row restores the concept payload
    rebuilt = vs.get_value_set(MARRIED_URL).collect()[0]
    want = jsonlib.load(open("fixtures/valuesets/married_maritalstatus.json"))
    got_codes = [
        c["code"] for inc in rebuilt["compose"]["include"] for c in inc["concept"]
    ]
    want_codes = [
        c["code"] for inc in want["compose"]["include"] for c in inc["concept"]
    ]
    assert got_codes == want_codes


def test_r4_push_valuesets_resolves_r4_store(spark):
    from bunsen_spark.r4.codes import create_value_sets
    from bunsen_spark.r4.valuesets import pop_valuesets, push_valuesets, valueset

    vs = create_value_sets(spark).with_new_value_set(
        VS_URL, "1", [("sysZ", "z1"), ("sysZ", "z2")]
    )
    pushed = push_valuesets(spark, {"zset": valueset(VS_URL)}, value_sets=vs)
    try:
        assert pushed["zset"] == {"sysZ": {"z1", "z2"}}
    finally:
        pop_valuesets(spark)


def test_r4_disjoint_import_and_duplicate_guard(spark):
    from bunsen_spark.r4.codes import create_value_sets

    vs = create_value_sets(spark).with_value_sets_from_directory("fixtures/valuesets")
    n = vs.get_value_sets().count()
    again = vs.with_disjoint_value_sets_from_directory("fixtures/valuesets")
    assert again.get_value_sets().count() == n
    with pytest.raises(ValueError, match="already present"):
        vs.with_value_sets_from_directory("fixtures/valuesets")


def test_r4_bundles_extract_and_to_bundle(spark):
    """r4.bundles routes extraction through the R4 registry and bundles
    export back out (`python/bunsen/r4/bundles.py:62-156`)."""
    import json as jsonlib

    from bunsen_spark.r4 import bundles as r4b

    bundle = {
        "resourceType": "Bundle",
        "type": "collection",
        "entry": [
            {"resource": {"resourceType": "Patient", "id": "p1", "gender": "female"}},
            {"resource": {"resourceType": "Patient", "id": "p2", "gender": "male"}},
            {"resource": {"resourceType": "Condition", "id": "c1"}},
        ],
    }
    raw = spark.createDataFrame([(jsonlib.dumps(bundle),)], "content string")
    b = r4b.from_json(raw, "content")
    pats = r4b.extract_entry(spark, b, "Patient")
    rows = {r["id"]: r["gender"] for r in pats.collect()}
    assert rows == {"p1": "female", "p2": "male"}
    out = r4b.to_bundle(pats, "Patient")
    assert out["resourceType"] == "Bundle" and len(out["entry"]) == 2
    assert {e["resource"]["resourceType"] for e in out["entry"]} == {"Patient"}
