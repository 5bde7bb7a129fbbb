"""Unit coverage for the range-join and time-rollup operators beyond
the driver oracle (API errors, bin-boundary correctness)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import range_join, time_rollup


def test_range_join_bin_boundaries(spark):
    # Interval spans two bins; points at the exact bounds match
    # (inclusive); points one day outside do not.
    points = spark.createDataFrame(
        [(1, dt.date(2024, 1, 10)), (2, dt.date(2024, 2, 9)),
         (3, dt.date(2024, 1, 9)), (4, dt.date(2024, 2, 10))],
        "pid: long, d: date",
    )
    intervals = spark.createDataFrame(
        [(100, dt.date(2024, 1, 10), dt.date(2024, 2, 9))],
        "iid: long, s: date, e: date",
    )
    out = range_join.range_join_points(points, "d", intervals, "s", "e", bin_days=30)
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]


def test_hierarchy_pointer_jumping_resolves_log_depth(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import hierarchy

    # Chain 1→2→3→…→12 (depth 11) plus a disjoint root 100.
    edges = spark.createDataFrame(
        [(i, i + 1 if i < 12 else None) for i in range(1, 13)] + [(100, None)],
        "node: long, parent: long",
    )
    # 4 iterations resolve depth up to 2^4 = 16 ≥ 11.
    out = {r["node"]: r["root"] for r in hierarchy.resolve_roots(edges, max_iters=4).collect()}
    assert all(out[i] == 12 for i in range(1, 13))
    assert out[100] == 100
    # 2 iterations (depth ≤ 4) must NOT fully resolve an 11-deep chain.
    partial = {r["node"]: r["root"] for r in hierarchy.resolve_roots(edges, max_iters=2).collect()}
    assert partial[1] != 12


def test_hierarchy_early_exits_at_fixed_point(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import hierarchy

    # Depth-3 chain: pointer jumping converges in 2 rounds; one more
    # round detects the fixed point — so 3 join rounds, never the
    # max_iters=8 budget.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, None)], "node: long, parent: long"
    )
    stats: dict = {}
    out = {
        r["node"]: r["root"]
        for r in hierarchy.resolve_roots(edges, max_iters=8, _stats=stats).collect()
    }
    assert out == {1: 4, 2: 4, 3: 4, 4: 4}
    assert stats["iterations"] == 3


def test_time_rollup_granularities_consistent(spark):
    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 5, 30), "a", 1.0),
         (dt.datetime(2024, 1, 1, 5, 45), "a", 2.0),
         (dt.datetime(2024, 1, 2, 7, 0), "a", 4.0)],
        "ts: timestamp, event_type: string, value: double",
    )
    out = time_rollup.time_rollup(
        ev, "ts", ["event_type"],
        [F.count(F.lit(1)).alias("n")],
        granularities=("hour", "day", "month"),
    ).collect()
    by = {(r["gran"], str(r["bucket"])): r["n"] for r in out}
    assert by[("hour", "2024-01-01 05:00:00")] == 2
    assert by[("day", "2024-01-01 00:00:00")] == 2
    assert by[("day", "2024-01-02 00:00:00")] == 1
    assert by[("month", "2024-01-01 00:00:00")] == 3
    with pytest.raises(ValueError):
        time_rollup.time_rollup(ev, "ts", [], [], granularities=("minute",))


def test_interval_overlap_join_emits_each_pair_once(spark):
    """Pairs overlapping across MANY shared bins must appear exactly
    once (emitted from the overlap-start bin), with closed-bound
    touch-overlaps included and disjoint intervals excluded."""
    from tiki_e_commerce_analytics_etl_spark.operators.range_join import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [
            (1, "2024-01-01", "2024-06-30"),   # long interval: spans many 30d bins
            (2, "2024-03-10", "2024-03-15"),
            (3, "2025-01-01", "2025-01-02"),   # disjoint from everything
        ],
        "lid: long, ls: string, le: string",
    ).select("lid", F.col("ls").cast("date").alias("ls"), F.col("le").cast("date").alias("le"))
    right = spark.createDataFrame(
        [
            (10, "2024-02-01", "2024-05-31"),  # long overlap with lid=1
            (20, "2024-03-15", "2024-04-15"),  # touches lid=2 at one day
        ],
        "rid: long, rs: string, re: string",
    ).select("rid", F.col("rs").cast("date").alias("rs"), F.col("re").cast("date").alias("re"))

    rows = interval_overlap_join(left, "ls", "le", right, "rs", "re", bin_days=30).collect()
    pairs = sorted((r.lid, r.rid) for r in rows)
    assert pairs == [(1, 10), (1, 20), (2, 10), (2, 20)]  # each exactly once


def test_interval_overlap_rejects_shared_column_names(spark):
    import pytest as _pytest
    from tiki_e_commerce_analytics_etl_spark.operators.range_join import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, "2024-01-01", "2024-01-05")], "id long, s string, e string"
    ).selectExpr("id", "CAST(s AS DATE) AS s", "CAST(e AS DATE) AS e")
    with _pytest.raises(ValueError, match="appear on both sides"):
        interval_overlap_join(left, "s", "e", left, "s", "e")


def test_interval_overlap_rejects_inverted_intervals(spark):
    import pytest as _pytest
    from tiki_e_commerce_analytics_etl_spark.operators.range_join import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, "2024-01-05", "2024-01-01")], "lid long, ls string, le string"
    ).selectExpr("lid", "CAST(ls AS DATE) AS ls", "CAST(le AS DATE) AS le")
    right = spark.createDataFrame(
        [(2, "2024-01-01", "2024-01-09")], "rid long, rs string, re string"
    ).selectExpr("rid", "CAST(rs AS DATE) AS rs", "CAST(re AS DATE) AS re")
    with _pytest.raises(Exception, match="inverted interval|ASSERT"):
        interval_overlap_join(left, "ls", "le", right, "rs", "re").collect()


def test_interval_overlap_null_bounds_drop_silently(spark):
    from tiki_e_commerce_analytics_etl_spark.operators.range_join import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, "2024-01-01", "2024-01-05"), (2, None, "2024-01-05")],
        "lid long, ls string, le string",
    ).selectExpr("lid", "CAST(ls AS DATE) AS ls", "CAST(le AS DATE) AS le")
    right = spark.createDataFrame(
        [(7, "2024-01-02", "2024-01-03")], "rid long, rs string, re string"
    ).selectExpr("rid", "CAST(rs AS DATE) AS rs", "CAST(re AS DATE) AS re")
    rows = interval_overlap_join(left, "ls", "le", right, "rs", "re").collect()
    assert [(r.lid, r.rid) for r in rows] == [(1, 7)]
