"""write_range_sorted: disjoint per-file ranges, lossless content,
and predicate pruning reaching the scan."""

from __future__ import annotations

import tempfile


def test_ranges_disjoint_and_lossless(spark, sf_dir):
    from bunsen_spark.sources.warehouse import file_ranges, write_range_sorted

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/li_by_shipdate"
        write_range_sorted(li, path, "l_shipdate", num_files=6)

        ranges = sorted(
            ((r.lo, r.hi, r.n) for r in file_ranges(spark, path, "l_shipdate").collect())
        )
        assert len(ranges) > 1
        # pairwise disjoint up to the boundary key (a key equal to the
        # range split can only appear in one file with repartitionByRange)
        for (_lo_a, hi_a, _na), (lo_b, _hi_b, _nb) in zip(ranges, ranges[1:]):
            assert hi_a <= lo_b
        # every row still present
        back = spark.read.parquet(path)
        assert back.count() == li.count()
        a = sorted(str(r) for r in li.collect())
        b = sorted(str(r) for r in back.select(*li.columns).collect())
        assert a == b


def test_range_filter_pushed_to_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    from bunsen_spark.sources.warehouse import write_range_sorted

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/li_by_qty"
        write_range_sorted(li, path, "l_quantity", num_files=4)
        q = spark.read.parquet(path).where(F.col("l_quantity") <= 2.0)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
        expected = li.where(F.col("l_quantity") <= 2.0).count()
        assert q.count() == expected


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path, sf_dir):
    """A z-ordered (user_id, ts) events layout must give SMALL per-file
    spans on BOTH columns, where a user_id-range-sorted layout leaves
    ts spanning ~the full range in every file. Span is measured from
    exactly the per-file min/max parquet footer statistics would hold."""
    from pyspark.sql import functions as F

    from bunsen_spark.queries import load, ts_us
    from bunsen_spark.sources.warehouse import write_range_sorted, write_zorder

    e = load(spark, str(sf_dir), "events")
    e = e.select("user_id", ts_us(e).alias("us"))
    lo_u, hi_u, lo_t, hi_t = e.agg(
        F.min("user_id"), F.max("user_id"), F.min("us"), F.max("us")
    ).collect()[0]
    span_u, span_t = max(hi_u - lo_u, 1), max(hi_t - lo_t, 1)

    def file_spans(path):
        df = spark.read.parquet(path).withColumn("f", F.input_file_name())
        rows = (
            df.groupBy("f")
            .agg(
                ((F.max("user_id") - F.min("user_id")) / span_u).alias("su"),
                ((F.max("us") - F.min("us")) / span_t).alias("st"),
            )
            .collect()
        )
        n = len(rows)
        return sum(r.su for r in rows) / n, sum(r.st for r in rows) / n, n

    zpath, upath = str(tmp_path / "z"), str(tmp_path / "u")
    write_zorder(e, zpath, ["user_id", "us"], bits=6, num_files=16)
    write_range_sorted(e, upath, "user_id", num_files=16)
    zu, zt, zn = file_spans(zpath)
    uu, ut, un = file_spans(upath)
    assert zn >= 8 and un >= 8  # both actually split into many files
    # user-sorted: ts unsorted -> every file spans ~the whole ts range
    assert ut > 0.9
    # z-order: BOTH dims bounded well below full range per file
    assert zt < 0.5 * ut, (zt, ut)
    assert zu < 0.5, (zu,)


def test_zorder_value_validates_bits(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from bunsen_spark.sources.warehouse import zorder_value

    df = spark.range(10).withColumn("a", F.col("id") * 1.0)
    with _pytest.raises(ValueError, match="bits"):
        zorder_value(df, ["a"], bits=0)


def test_zorder_value_rejects_sign_bit_overflow(spark):
    import pytest

    from pyspark.sql import functions as F

    from bunsen_spark.sources.warehouse import zorder_value

    # the 63-bit budget check is bits*ndim, agnostic to the split —
    # exercise the exact 60-accept/64-reject boundary with 1-bit
    # columns (the former 4x15 acceptance paid a 2^15-prob
    # approxQuantile pass, ~2 driver-minutes, to test the same check)
    df = spark.range(10).select(
        *[(F.col("id") * 1.0).alias(f"c{i}") for i in range(64)]
    )
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_value(df, [f"c{i}" for i in range(64)], bits=1)
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_value(df, [f"c{i}" for i in range(4)], bits=16)
    # 60 interleaved bits: fine
    assert zorder_value(df, [f"c{i}" for i in range(60)], bits=1) is not None


def test_zorder_bucket_matches_filter_count(spark):
    """The r14 O(bits) binary-search bucket must agree with the
    original O(2^bits) filter-count semantics (count of cuts <= v) on
    every row — including duplicate cut boundaries (skewed data) and
    values below/above all cuts. Single column, so the z value IS the
    bucket (no interleaving) on both sides."""
    from pyspark.sql import functions as F

    from bunsen_spark.sources.warehouse import zorder_value

    # heavy duplication -> approxQuantile yields repeated cuts
    vals = [0.0] * 20 + [1.0] * 5 + [2.0] * 40 + [3.0] * 3 + [50.0, -7.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    bits = 5
    z = zorder_value(df, ["v"], bits=bits)
    nb = 1 << bits
    probs = [i / nb for i in range(1, nb)]
    cuts = df.stat.approxQuantile(["v"], probs, 0.001)[0]
    arr = F.array(*[F.lit(float(b)).cast("double") for b in cuts])
    old = F.size(F.filter(arr, lambda b: b <= F.col("v").cast("double"))).cast(
        "long"
    )
    mism = df.select(z.alias("new"), old.alias("old")).where(
        F.col("new") != F.col("old")
    )
    assert mism.count() == 0
