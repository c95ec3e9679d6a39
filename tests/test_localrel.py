"""values_df: LocalRelation semantics and literal fidelity."""

import pytest

from bunsen_spark.localrel import values_df


@pytest.fixture(scope="module")
def spark():
    from bunsen_spark.session import get_spark

    return get_spark("test_localrel")


def test_values_df_matches_createdataframe(spark):
    rows = [
        (1, "it's a 'quote'", 2.5),
        (2, "back\\slash", float("inf")),
        (3, None, -0.0),
        (None, "", 1e-300),
    ]
    ddl = "a long, b string, c double"
    got = values_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


def test_values_df_is_local_relation(spark):
    df = values_df(spark, [(1, "x")], "a int, b string")
    # a LocalRelation collect launches no job: executedPlan has no scan
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan


def test_values_df_empty_rows(spark):
    df = values_df(spark, [], "a long, b string")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_values_df_rejects_unknown_type(spark):
    with pytest.raises(ValueError):
        values_df(spark, [([1],)], "a array<long>")
