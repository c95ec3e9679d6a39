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
