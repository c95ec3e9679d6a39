"""Compiler shape tests mirroring the reference's bunsen-test profile
suite (`bunsen-uscore-resources-stu3/src/test/resources/definitions/
StructureDefinition-bunsen-test-*.json` exercised by
`SparkRowConverterTest`): boolean/integer/integer-array field
extensions, a codeableConcept extension, a nested (parent) extension,
and a sliced MODIFIER extension — each authored here as a minimal
spec-format StructureDefinition and driven end-to-end through ingest,
export and re-ingest."""

from __future__ import annotations

import json

import pytest

from bunsen_spark.schema import core

EX = "http://example.org/StructureDefinition"


def _ext_sd(ext_id: str, value_rows: list[dict], slices: list[dict] | None = None) -> dict:
    elements = [
        {"path": "Extension", "min": 0, "max": "1"},
        {"path": "Extension.extension", "min": 0, "max": "*", "type": [{"code": "Extension"}]},
        *(slices or []),
        {"path": "Extension.url", "min": 1, "max": "1", "type": [{"code": "uri"}]},
        *value_rows,
    ]
    return {
        "resourceType": "StructureDefinition",
        "id": ext_id,
        "url": f"{EX}/{ext_id}",
        "name": ext_id,
        "type": "Extension",
        "kind": "complex-type",
        "snapshot": {"element": elements},
    }


def _leaf_rows(code: str, mx: str = "1") -> list[dict]:
    return [
        {
            "path": f"Extension.value{code[0].upper() + code[1:]}",
            "min": 0,
            "max": mx,
            "type": [{"code": code}],
        }
    ]


@pytest.fixture(scope="module")
def registry():
    from bunsen_spark.schema.structdef import StructureDefinitionRegistry

    reg = StructureDefinitionRegistry()
    reg.add(_ext_sd("t-bool", _leaf_rows("boolean")))
    reg.add(_ext_sd("t-int", _leaf_rows("integer")))
    # integer ARRAY field: the slice itself repeats (max=*)
    reg.add(_ext_sd("t-int-array", _leaf_rows("integer")))
    reg.add(_ext_sd("t-cc", _leaf_rows("CodeableConcept")))
    reg.add(_ext_sd("t-mod-string", _leaf_rows("string")))
    reg.add(
        _ext_sd(
            "t-nested",
            [],
            slices=[
                {
                    "path": "Extension.extension",
                    "sliceName": "inner1",
                    "min": 0,
                    "max": "1",
                    "type": [{"code": "Extension"}],
                },
                {"path": "Extension.extension.id", "min": 0, "max": "1", "type": [{"code": "string"}]},
                {"path": "Extension.extension.url", "min": 1, "max": "1", "type": [{"code": "uri"}]},
                {"path": "Extension.extension.valueString", "min": 0, "max": "1", "type": [{"code": "string"}]},
                {
                    "path": "Extension.extension",
                    "sliceName": "inner2",
                    "min": 0,
                    "max": "*",
                    "type": [{"code": "Extension"}],
                },
                {"path": "Extension.extension.id", "min": 0, "max": "1", "type": [{"code": "string"}]},
                {"path": "Extension.extension.url", "min": 1, "max": "1", "type": [{"code": "uri"}]},
                {"path": "Extension.extension.valueInteger", "min": 0, "max": "1", "type": [{"code": "integer"}]},
            ],
        )
    )
    reg.add(
        {
            "resourceType": "StructureDefinition",
            "id": "t-profile-basic",
            "url": f"{EX}/t-profile-basic",
            "name": "TestProfileBasic",
            "type": "Basic",
            "kind": "resource",
            "snapshot": {
                "element": [
                    {"path": "Basic", "min": 0, "max": "*"},
                    {"path": "Basic.id", "min": 0, "max": "1", "type": [{"code": "id"}]},
                    {
                        "path": "Basic.extension",
                        "sliceName": "boolfield",
                        "min": 0,
                        "max": "1",
                        "type": [{"code": "Extension", "profile": f"{EX}/t-bool"}],
                    },
                    {
                        "path": "Basic.extension",
                        "sliceName": "intfield",
                        "min": 0,
                        "max": "1",
                        "type": [{"code": "Extension", "profile": f"{EX}/t-int"}],
                    },
                    {
                        "path": "Basic.extension",
                        "sliceName": "intarray",
                        "min": 0,
                        "max": "*",
                        "type": [{"code": "Extension", "profile": f"{EX}/t-int-array"}],
                    },
                    {
                        "path": "Basic.extension",
                        "sliceName": "ccfield",
                        "min": 0,
                        "max": "1",
                        "type": [{"code": "Extension", "profile": f"{EX}/t-cc"}],
                    },
                    {
                        "path": "Basic.extension",
                        "sliceName": "nested",
                        "min": 0,
                        "max": "1",
                        "type": [{"code": "Extension", "profile": f"{EX}/t-nested"}],
                    },
                    {
                        "path": "Basic.modifierExtension",
                        "sliceName": "modstring",
                        "min": 0,
                        "max": "1",
                        "type": [{"code": "Extension", "profile": f"{EX}/t-mod-string"}],
                    },
                    {"path": "Basic.code", "min": 1, "max": "1", "type": [{"code": "CodeableConcept"}]},
                ]
            },
        }
    )
    return reg


def test_compiled_shapes(registry):
    d = registry.get("t-profile-basic")
    ft = {f.name: f for f in core.spark_schema(d).fields}
    assert ft["boolfield"].dataType.typeName() == "boolean"
    assert ft["intfield"].dataType.typeName() == "integer"
    assert ft["intarray"].dataType.typeName() == "array"
    assert ft["intarray"].dataType.elementType.typeName() == "integer"
    assert {f.name for f in ft["ccfield"].dataType.fields} == {"id", "coding", "text"}
    assert {f.name for f in ft["nested"].dataType.fields} == {"inner1", "inner2"}
    assert ft["modstring"].dataType.typeName() == "string"
    # modifier slice parses from its own array
    parse = {f.name for f in core.json_schema(d).fields}
    assert {"extension", "modifierExtension"} <= parse


RESOURCE = {
    "resourceType": "Basic",
    "id": "b1",
    "extension": [
        {"url": f"{EX}/t-bool", "valueBoolean": True},
        {"url": f"{EX}/t-int", "valueInteger": 7},
        {"url": f"{EX}/t-int-array", "valueInteger": 1},
        {"url": f"{EX}/t-int-array", "valueInteger": 2},
        {
            "url": f"{EX}/t-cc",
            "valueCodeableConcept": {
                "coding": [{"system": "http://example.org/cs", "code": "X"}],
                "text": "ex",
            },
        },
        {
            "url": f"{EX}/t-nested",
            "extension": [
                {"url": "inner1", "valueString": "deep"},
                {"url": "inner2", "valueInteger": 3},
                {"url": "inner2", "valueInteger": 4},
            ],
        },
    ],
    "modifierExtension": [{"url": f"{EX}/t-mod-string", "valueString": "careful"}],
    "code": {"text": "test"},
}


def test_ingest_and_roundtrip(spark, registry):
    from pyspark.sql import functions as F

    d = registry.get("t-profile-basic")
    parse_schema = core.json_schema(d)
    raw = spark.createDataFrame([(json.dumps(RESOURCE),)], "resource_json string")

    def ingest(df):
        return (
            df.select(F.from_json("resource_json", parse_schema).alias("r"))
            .select(core.converter(d, F.col("r")).alias("res"))
            .select("res.*")
        )

    row = ingest(raw).collect()[0]
    assert row["boolfield"] is True
    assert row["intfield"] == 7
    assert row["intarray"] == [1, 2]
    assert row["ccfield"]["coding"][0]["code"] == "X"
    assert row["nested"]["inner1"] == "deep"
    assert row["nested"]["inner2"] == [3, 4]
    assert row["modstring"] == "careful"

    # export → re-ingest round-trip (modifier array included)
    first = ingest(raw)
    exported = first.select(
        F.to_json(
            core.export_struct(d, F.struct(*first.columns)),
            {"ignoreNullFields": "true"},
        ).alias("resource_json")
    )
    doc = json.loads(exported.collect()[0]["resource_json"])
    assert doc["modifierExtension"] == RESOURCE["modifierExtension"]
    second = ingest(exported)
    assert sorted(map(str, first.collect())) == sorted(map(str, second.collect()))
