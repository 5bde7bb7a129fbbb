"""Round-6 adversarial properties: exact_percentiles on NaN / ±Inf /
massive-tie / single-value inputs (pinned to Spark `percentile`
semantics, cross-checked bit-exact vs DuckDB quantile_cont on the
NaN-free domain), and DIB-frame pixel-stat round trips on arbitrary
payload bytes."""

from __future__ import annotations

import math

import hypothesis.strategies as st
import pytest
from hypothesis import given, settings

from pyspark.sql import functions as F


def _same(a: float, b: float) -> bool:
    return (math.isnan(a) and math.isnan(b)) or a == b


ADVERSARIAL_CASES = [
    [5.0] * 1000 + [1.0] * 3 + [9.0] * 7,  # massive ties straddling ranks
    [3.14],  # single value
    [float("inf")] * 5 + [1.0],
    [float("-inf"), 1.0, 2.0],
    [float("-inf"), float("inf"), 0.0],
    [1.0, float("nan"), 2.0],
    [float("nan")] * 3,
    [float("nan"), float("inf"), float("-inf"), 0.0, 0.0],
]


@pytest.mark.parametrize("vals", ADVERSARIAL_CASES)
def test_exact_percentiles_adversarial_matches_spark_percentile(spark, vals):
    """The pinned behavior: exact_percentiles ≡ Spark's own
    `percentile` aggregate on EVERY input Spark accepts — including
    NaN, which Spark orders GREATER than +Inf (so high quantiles of
    NaN-bearing data are NaN).  DuckDB's quantile_cont disagrees on
    NaN ordering; the DuckDB-oracle precondition is therefore NaN-free
    data, which the sibling property test covers bit-exact."""
    from tiki_e_commerce_analytics_etl_spark.operators.quality import (
        exact_percentiles,
    )

    probs = [0.0, 0.1, 0.5, 0.9, 1.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    arr = ", ".join(repr(p) for p in probs)
    want = df.agg(F.expr(f"percentile(v, array({arr}))")).collect()[0][0]
    got = exact_percentiles(df, "v", probs)
    assert len(got) == len(want)
    assert all(_same(g, w) for g, w in zip(got, want)), (got, want)


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.sampled_from([float("inf"), float("-inf")]),
            st.sampled_from([0.0, 1.0, 1.0, 1.0, 2.5]),  # tie-heavy pool
            st.floats(
                min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
            ),
        ),
        min_size=1,
        max_size=80,
    ),
    n_parts=st.sampled_from([1, 4, 32]),
)
def test_exact_percentiles_nanfree_matches_duckdb_bit_exact(spark, vals, n_parts):
    """On the NaN-free domain (the documented oracle precondition),
    exact_percentiles is BIT-identical to DuckDB quantile_cont even
    with infinities and heavy ties — both engines use the same
    lower*(1-frac) + higher*frac IEEE expression."""
    import duckdb

    from tiki_e_commerce_analytics_etl_spark.operators.quality import (
        exact_percentiles,
    )

    probs = [0.0, 0.25, 0.5, 2 / 3, 0.9, 1.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = exact_percentiles(df, "v", probs, n_partitions=n_parts)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    arr = "[" + ", ".join(repr(p) for p in probs) + "]"
    want = con.execute(f"SELECT quantile_cont(v, {arr}) FROM t").fetchone()[0]
    con.close()
    # NaN-free INPUTS can still produce NaN outputs (the -Inf..+Inf
    # midpoint interpolates to NaN in both engines, equally) — compare
    # NaN-aware, bit-exact otherwise.
    assert len(got) == len(want)
    assert all(_same(g, float(w)) for g, w in zip(got, want)), (got, want)


def test_exact_percentiles_rejects_out_of_range_probs(spark):
    from tiki_e_commerce_analytics_etl_spark.operators.quality import (
        exact_percentiles,
        grouped_exact_percentiles,
    )

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        exact_percentiles(df, "v", [0.5, 1.5])
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        exact_percentiles(df, "v", [-0.1])
    gdf = spark.createDataFrame([(1, 1.0)], "g long, v double")
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        grouped_exact_percentiles(gdf, "g", "v", [2.0])


# -- DIB pixel-stat round trip ---------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    frames=st.lists(
        st.binary(min_size=1, max_size=37), min_size=1, max_size=6
    ),
    usec=st.sampled_from([1, 33333, 40000]),
)
def test_dib_pixel_stats_roundtrip_arbitrary_bytes(frames, usec):
    """Any byte payloads muxed as equal-width 8-bit gray DIB frames
    come back from avi_pixel_stats with arithmetically-exact stats —
    the property behind the avi_pixel_stats oracle query."""
    from tiki_e_commerce_analytics_etl_spark.operators import multimodal as mm

    width = min(len(f) for f in frames)
    frames = [f[:width] for f in frames]
    stride = mm.dib_row_stride(width, 8)
    padded = [f + b"\x00" * (stride - width) for f in frames]
    avi = mm.avi_mux(
        padded, usec_per_frame=usec, width=width, height=1, bit_count=8
    )
    assert mm.avi_demux(avi) == (usec, padded)
    got = mm.avi_pixel_stats(avi)
    want = [
        (i, width, sum(f), min(f), max(f)) for i, f in enumerate(frames)
    ]
    assert got == want


@pytest.mark.parametrize(
    "vals",
    [
        [5.0] * 300 + [1.0, 9.0],
        [float("inf"), 1.0, float("-inf")],
        [3.14],
        [1.0, float("nan"), 2.0],
    ],
)
def test_grouped_exact_percentiles_adversarial_matches_spark(spark, vals):
    """grouped_exact_percentiles ≡ a per-group Spark `percentile`
    aggregate on ties / infinities / NaN / single-value groups — the
    grouped twin of the scalar pinning above.  Two groups share the
    adversarial values with different paddings so the group partition
    boundary is exercised."""
    from tiki_e_commerce_analytics_etl_spark.operators.quality import (
        grouped_exact_percentiles,
    )

    rows = [(1, v) for v in vals] + [(2, v) for v in vals + [7.5, 7.5]]
    df = spark.createDataFrame(rows, "g long, v double")
    probs = [0.0, 0.5, 0.9, 1.0]
    names = [f"p{i}" for i in range(len(probs))]
    got = {
        r["g"]: [r[n] for n in names]
        for r in grouped_exact_percentiles(df, "g", "v", probs, names).collect()
    }
    arr = ", ".join(repr(p) for p in probs)
    want = {
        r["g"]: list(r["ps"])
        for r in df.groupBy("g")
        .agg(F.expr(f"percentile(v, array({arr}))").alias("ps"))
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert all(_same(a, b) for a, b in zip(got[g], want[g])), (g, got[g], want[g])
