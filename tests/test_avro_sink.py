"""Avro sink wrapper (S11, VERDICT r1 item 8). The round-trip test
runs only when the external spark-avro module is on the classpath
(it is not baked into this container); the guard behavior is always
tested."""

from __future__ import annotations

import pytest


def test_guard_raises_clearly_when_module_absent(spark, tmp_path):
    from bunsen_spark.sources.export import avro_available, write_avro

    if avro_available(spark):
        pytest.skip("spark-avro present; guard path not reachable")
    df = spark.range(3)
    with pytest.raises(RuntimeError, match="spark-avro"):
        write_avro(df, str(tmp_path / "out.avro"))


def test_roundtrip_when_module_present(spark, tmp_path):
    from bunsen_spark.sources.bundles import extract_entry, load_from_directory
    from bunsen_spark.sources.export import avro_available, read_avro, write_avro

    if not avro_available(spark):
        pytest.skip("spark-avro not deployable in this container")
    patients = extract_entry(
        spark, load_from_directory(spark, "fixtures/bundles/json"), "Patient"
    )
    out = str(tmp_path / "patients.avro")
    write_avro(patients, out)
    back = read_avro(spark, out)
    # avro has no struct-vs-row distinction loss for this schema; the
    # resource StructType must survive the format round-trip
    assert back.schema == patients.schema
    assert sorted(map(str, back.collect())) == sorted(map(str, patients.collect()))


# -- jar-free schema-equivalence (VERDICT r3 item 5) -------------------------


def _unwrap(t):
    """Strip a [value, "null"] nullable union."""
    if isinstance(t, list):
        assert t[1] == "null" and len(t) == 2, t
        return t[0]
    return t


def test_avro_schema_for_resource_structtypes():
    """The Avro schemas derived for real resource StructTypes must
    encode the S11 mapping: nullable unions on every optional FHIR
    element, arrays of namespaced records, decimals as sized fixed."""
    from bunsen_spark.schema.resources import spark_schema_for
    from bunsen_spark.sources.export import avro_schema_for

    for rtype in ("Patient", "Observation"):
        schema = spark_schema_for(rtype)
        avro = avro_schema_for(schema, record_name=rtype)
        assert avro["type"] == "record" and avro["name"] == rtype
        by_name = {f["name"]: f["type"] for f in avro["fields"]}
        assert set(by_name) == {f.name for f in schema.fields}
        # FHIR elements are optional -> nullable unions everywhere
        assert isinstance(by_name["id"], list) and _unwrap(by_name["id"]) == "string"

    obs = avro_schema_for(spark_schema_for("Observation"), record_name="Observation")
    fields = {f["name"]: f["type"] for f in obs["fields"]}
    # repeating element: array whose items are the nullable record union
    cat = _unwrap(fields["category"])
    assert cat["type"] == "array"
    cat_item = _unwrap(cat["items"])
    assert cat_item["type"] == "record"
    assert cat_item["namespace"].startswith("Observation")
    # choice-type struct: nested record keeps its element tree
    vq = _unwrap(fields["value"])
    assert vq["type"] == "record"
    value_fields = {f["name"] for f in vq["fields"]}
    assert "quantity" in value_fields or "valueQuantity" in {
        f["name"] for f in obs["fields"]
    }


def test_avro_schema_scalar_and_decimal_mapping():
    from pyspark.sql import types as T

    from bunsen_spark.sources.export import _decimal_fixed_size, avro_schema_for

    st = T.StructType(
        [
            T.StructField("a", T.IntegerType(), False),
            T.StructField("b", T.LongType(), True),
            T.StructField("c", T.DecimalType(12, 2), True),
            T.StructField("d", T.ArrayType(T.DoubleType(), containsNull=False), False),
            T.StructField("e", T.MapType(T.StringType(), T.StringType(), True), True),
            T.StructField("f", T.DateType(), True),
            T.StructField("g", T.TimestampType(), True),
            T.StructField("h", T.BinaryType(), True),
        ]
    )
    avro = avro_schema_for(st, record_name="rec")
    f = {x["name"]: x["type"] for x in avro["fields"]}
    assert f["a"] == "int"
    assert f["b"] == ["long", "null"]
    dec = _unwrap(f["c"])
    assert dec == {
        "type": "fixed",
        "name": "c",
        "namespace": "rec",
        "size": 6,
        "logicalType": "decimal",
        "precision": 12,
        "scale": 2,
    }
    assert _decimal_fixed_size(12) == 6  # 10^12-1 needs 40 bits -> 6 bytes
    assert f["d"] == {"type": "array", "items": "double"}
    assert _unwrap(f["e"]) == {"type": "map", "values": ["string", "null"]}
    assert _unwrap(f["f"]) == {"type": "int", "logicalType": "date"}
    assert _unwrap(f["g"]) == {"type": "long", "logicalType": "timestamp-micros"}
    assert _unwrap(f["h"]) == "bytes"


def test_avro_schema_nested_namespaces_disambiguate():
    """Two same-named records in different branches must carry
    different namespaces (Avro fullname uniqueness)."""
    from pyspark.sql import types as T

    from bunsen_spark.sources.export import avro_schema_for

    coding = T.StructType([T.StructField("code", T.StringType(), True)])
    st = T.StructType(
        [
            T.StructField("x", T.StructType([T.StructField("inner", coding, True)]), True),
            T.StructField("y", T.StructType([T.StructField("inner", coding, True)]), True),
        ]
    )
    avro = avro_schema_for(st, record_name="rec")
    f = {x["name"]: _unwrap(x["type"]) for x in avro["fields"]}
    inner_x = _unwrap({g["name"]: g["type"] for g in f["x"]["fields"]}["inner"])
    inner_y = _unwrap({g["name"]: g["type"] for g in f["y"]["fields"]}["inner"])
    assert inner_x["namespace"] == "rec.x" and inner_y["namespace"] == "rec.y"
