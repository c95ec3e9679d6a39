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
