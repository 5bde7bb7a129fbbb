"""Physical-plan regression guards: the properties that make the big
queries scale must survive refactors.  Asserting on the explain output
is deliberate — a correctness-preserving change that, say, drops the
shipdate pushdown or turns the Golden Join's broadcasts into
sort-merge shuffles is a performance bug we want CI to catch."""

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "extended")


@pytest.fixture(scope="module")
def plans(spark):
    return {
        name: _plan(spark, name)
        for name in ["golden_join", "pricing_summary", "topk_orders", "dedup_latest"]
    }


def test_pricing_summary_pushes_date_filter(plans):
    p = plans["pricing_summary"]
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_pricing_summary_partial_aggregation(plans):
    assert "partial_sum" in plans["pricing_summary"]


def test_golden_join_broadcasts_all_five_dims(plans):
    p = plans["golden_join"]
    assert p.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in p


def test_golden_join_prunes_fact_columns(plans):
    # The fact scan must not read all 16 lineitem columns.
    p = plans["golden_join"]
    scan = next(
        line for line in p.splitlines()
        if "FileScan parquet" in line and "lineitem" in line
    )
    assert "l_comment" not in scan and "l_shipmode" not in scan


def test_topk_uses_take_ordered_not_full_sort(plans):
    assert "TakeOrderedAndProject" in plans["topk_orders"]


def test_dedup_latest_partial_aggregates_before_exchange(plans):
    p = plans["dedup_latest"]
    assert "partial_max_by" in p
    # exactly one exchange: the per-key shuffle
    physical = p.split("== Physical Plan ==")[-1]
    assert physical.count("Exchange hashpartitioning") == 1
