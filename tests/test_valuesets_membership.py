"""in_valueset membership tests — golden counts mirror the reference's
python suite: 14 blood-pressure observations by explicit code, 3
leukocyte observations via LOINC hierarchy descendants; push/pop stack;
SQL UDF parity; array-of-CodeableConcept support.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from bunsen_spark.functions.valuesets import (
    get_current_valuesets,
    in_valueset,
    in_valueset_join,
    isa_loinc,
    pop_valuesets,
    push_valuesets,
)
from bunsen_spark.operators.hierarchies import Hierarchies, loinc_hierarchy_edges
from bunsen_spark.sources.bundles import extract_entry, load_from_directory

FIX = Path(__file__).resolve().parent.parent / "fixtures"


@pytest.fixture(scope="module")
def observations(spark):
    bundles = load_from_directory(spark, str(FIX / "bundles" / "json"))
    return extract_entry(spark, bundles, "Observation").cache()


@pytest.fixture(scope="module")
def loinc(spark):
    edges = loinc_hierarchy_edges(spark, str(FIX / "LOINC_HIERARCHY_SAMPLE.CSV"))
    return Hierarchies.from_edges(spark, edges, "urn:bunsen-spark:hierarchy:loinc", "2.56")


@pytest.fixture()
def pushed(spark, loinc):
    vs = push_valuesets(
        spark,
        {
            "blood_pressure": [("http://loinc.org", "8462-4")],
            "leukocytes": isa_loinc("LP100-0"),
        },
        hierarchies=loinc,
    )
    yield vs
    pop_valuesets(spark)


def test_explicit_code_membership(observations, pushed):
    bp = observations.where(in_valueset(F.col("code"), "blood_pressure"))
    assert bp.count() == 14


def test_hierarchy_descendant_membership(observations, pushed):
    leuk = observations.where(in_valueset(F.col("code"), "leukocytes"))
    assert leuk.count() == 3


def test_sql_udf_parity(spark, observations, pushed):
    observations.createOrReplaceTempView("observations")
    n = spark.sql(
        "SELECT id FROM observations WHERE in_valueset(code, 'blood_pressure')"
    ).count()
    assert n == 14
    with pytest.raises(Exception, match="Unknown valueset reference"):
        spark.sql("SELECT id FROM observations WHERE in_valueset(code, 'nope')").count()


def test_null_input_is_false(spark, pushed):
    df = spark.createDataFrame(
        [(None,)],
        "code struct<coding: array<struct<system:string, code:string>>>",
    )
    out = df.select(in_valueset(F.col("code"), "blood_pressure").alias("m")).collect()
    assert out[0]["m"] is False


def test_unknown_reference_raises(pushed):
    with pytest.raises(ValueError, match="unknown valueset reference"):
        in_valueset(F.col("code"), "nope")


def test_array_of_codeable_concepts(spark, pushed):
    df = spark.createDataFrame(
        [
            ([{"coding": [{"system": "http://loinc.org", "code": "8462-4"}]}],),
            ([{"coding": [{"system": "http://loinc.org", "code": "0000-0"}]}],),
            (None,),
        ],
        "types array<struct<coding: array<struct<system:string, code:string>>>>",
    )
    out = df.select(in_valueset(F.col("types"), "blood_pressure", is_array=True).alias("m"))
    assert [r["m"] for r in out.collect()] == [True, False, False]


def test_push_pop_stack(spark, loinc, pushed):
    assert set(get_current_valuesets(spark)) == {"blood_pressure", "leukocytes"}
    push_valuesets(spark, {"only": [("s", "c")]})
    assert set(get_current_valuesets(spark)) == {"only"}
    pop_valuesets(spark)
    assert set(get_current_valuesets(spark)) == {"blood_pressure", "leukocytes"}
    cur = get_current_valuesets(spark)
    assert cur["leukocytes"] == [
        ("http://loinc.org", "5000-5"),
        ("http://loinc.org", "LP100-0"),
        ("http://loinc.org", "LP110-1"),
    ]


def test_semi_join_form(observations, pushed):
    bp = in_valueset_join(observations, "code", "blood_pressure")
    assert bp.count() == 14
