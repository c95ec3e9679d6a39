"""Drop-in python API parity (`python/bunsen/stu3/codes/__init__.py`,
`valuesets.py`, `loinc.py`, `snomed.py`): module-level factories,
programmatic map/set construction, versioned appends, and XML
read-back."""

from __future__ import annotations

import pytest

MAP_URL = "urn:example:map:priority"
VS_URL = "urn:example:valueset:vitals"


@pytest.mark.slow
def test_with_new_map_and_add_mappings(spark):
    from bunsen_spark.codes import create_concept_maps

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
    assert v2.get_mappings(MAP_URL, "1").count() == 2  # old version intact

    with pytest.raises(ValueError, match="no stored map"):
        maps.add_mappings("urn:nope", "1", "2", [])

    xml = maps.get_map_as_xml(MAP_URL, "1")
    assert xml.startswith('<ConceptMap xmlns="http://hl7.org/fhir">')
    assert '<code value="a"/>' in xml and '<equivalence value="wider"/>' in xml


@pytest.mark.slow
def test_with_new_value_set_and_add_values(spark):
    from bunsen_spark.codes import create_value_sets

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


def test_disjoint_value_sets_from_directory(spark):
    from bunsen_spark.codes import create_value_sets

    vs = create_value_sets(spark).with_value_sets_from_directory("fixtures/valuesets")
    n = vs.get_value_sets().count()
    again = vs.with_disjoint_value_sets_from_directory("fixtures/valuesets")
    assert again.get_value_sets().count() == n  # nothing re-imported


def test_valueset_marker_resolves_through_push(spark):
    from bunsen_spark.codes import create_value_sets
    from bunsen_spark.functions import pop_valuesets, push_valuesets, valueset

    vs = create_value_sets(spark).with_new_value_set(
        VS_URL, "1", [("sysZ", "z1"), ("sysZ", "z2")]
    )
    pushed = push_valuesets(spark, {"zset": valueset(VS_URL)}, value_sets=vs)
    try:
        assert pushed["zset"] == {"sysZ": {"z1", "z2"}}
    finally:
        pop_valuesets(spark)


def test_hierarchy_import_helpers(spark):
    from bunsen_spark.codes import (
        create_hierarchies,
        with_loinc_hierarchy,
        with_relationships,
    )

    h = create_hierarchies(spark)
    h = with_loinc_hierarchy(h.spark, h, "fixtures/LOINC_HIERARCHY_SAMPLE.CSV", "2.56")
    h = with_relationships(
        h.spark, h, "fixtures/SNOMED_RELATIONSHIP_SAMPLE.TXT", "20240101"
    )
    uris = {r["uri"] for r in h.get_ancestors().select("uri").distinct().collect()}
    assert uris == {
        "urn:bunsen-spark:hierarchy:loinc",
        "urn:bunsen-spark:hierarchy:snomed",
    }
