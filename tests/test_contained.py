"""Contained-resource extraction (SURVEY S4 / §1.3 contained rule):
declared contained types become one struct field each inside a
``contained`` array, populated by resourceType dispatch — mirrors
`SparkRowConverterTest` testContained."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bundles(spark):
    from bunsen_spark.sources.bundles import load_from_directory

    return load_from_directory(spark, "fixtures/bundles/contained")


def test_contained_schema_and_dispatch(spark, bundles):
    from bunsen_spark.schema import spark_schema_for
    from bunsen_spark.sources.bundles import extract_entry

    mr = extract_entry(
        spark, bundles, "MedicationRequest", contained_types=("Medication",)
    )
    contained_type = mr.schema["contained"].dataType.elementType
    assert contained_type.names == ["medication"]
    assert contained_type["medication"].dataType == spark_schema_for("Medication")

    rows = {r["id"]: r for r in mr.collect()}
    assert set(rows) == {"medrx-2001", "medrx-2002"}
    med = rows["medrx-2001"]["contained"][0]["medication"]
    assert med["id"] == "med-inline-1"
    assert med["code"]["coding"][0]["code"] == "582620"
    assert med["ingredient"][0]["isActive"] is True
    assert str(med["ingredient"][0]["amount"]["numerator"]["value"]) == "15.0000"
    # no contained entries → null array slot
    assert rows["medrx-2002"]["contained"] is None


def test_without_contained_param_schema_unchanged(spark, bundles):
    from bunsen_spark.schema import spark_schema_for
    from bunsen_spark.sources.bundles import extract_entry

    mr = extract_entry(spark, bundles, "MedicationRequest")
    assert mr.schema == spark_schema_for("MedicationRequest")


def test_local_reference_points_at_contained(spark, bundles):
    from bunsen_spark.sources.bundles import extract_entry

    mr = extract_entry(
        spark, bundles, "MedicationRequest", contained_types=("Medication",)
    )
    row = (
        mr.where(F.col("id") == "medrx-2001")
        .select(
            F.col("medication.reference.reference").alias("ref"),
            F.col("contained")[0]["medication"]["id"].alias("cid"),
        )
        .collect()[0]
    )
    assert row["ref"] == "#med-inline-1"
    assert row["cid"] == "med-inline-1"
