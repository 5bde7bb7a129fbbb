"""Round-10 third-wave operators: the non-repetition Gopher quality
suite, leakage-safe cluster splits, distributed integer-Lloyd k-means,
and the integer-quantized logistic-regression quality classifier.

Each test plants a hand-computable corpus and checks EXACT values or
published invariants — the oracle gate (tools/check.py) separately
proves bit-exactness against DuckDB at three SFs.
"""

import pytest
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops


def _docs(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# Gopher quality suite (non-repetition half)
# ---------------------------------------------------------------------------


def test_gopher_quality_hand_computed(spark):
    # Doc 0: 4 words, 18 word-chars -> mean 450 centi; all alphabetic;
    # stop hits: the, with (2).  One line, no bullets/ellipses/symbols.
    d0 = "the cat with whiskers"
    # Doc 1: bullet lines and an ellipsis-terminated line.
    d1 = "• first point\n- second point\nplain line ends...\n* third"
    # Doc 2: symbol soup — '#' chars and a unicode ellipsis.
    d2 = "tag1 # tag2 # code… end"
    # Doc 3: numeric tokens fail the alphabetic-word rule.
    d3 = "12345 67890 11 22 33"
    out = {
        r["id"]: r.asDict()
        for r in text_ops.gopher_quality(_docs(spark, [d0, d1, d2, d3])).collect()
    }

    r0 = out[0]
    assert r0["n_words"] == 4
    assert r0["mean_word_len_centi"] == (100 * 18) // 4 == 450
    assert r0["alpha_word_ppm"] == 1_000_000
    assert r0["stop_hits"] == 2
    assert r0["symbol_word_ppm"] == 0
    assert r0["bullet_line_ppm"] == 0
    # fails only the 50-word minimum
    assert not r0["pass_gopher"]

    r1 = out[1]
    assert r1["n_lines"] == 4
    # 3 of 4 lines bullet-started ('•', '-', '*')
    assert r1["bullet_line_ppm"] == (1_000_000 * 3) // 4
    # 1 of 4 lines ends in '...'
    assert r1["ellipsis_line_ppm"] == (1_000_000 * 1) // 4

    r2 = out[2]
    # 6 words; symbols: two '#' + one '…' = 3
    assert r2["n_words"] == 6
    assert r2["symbol_word_ppm"] == (1_000_000 * 3) // 6
    # '#' tokens carry no [a-z]; 'code…' does -> 4 of 6 alphabetic
    assert r2["alpha_word_ppm"] == (1_000_000 * 4) // 6

    r3 = out[3]
    assert r3["alpha_word_ppm"] == 0
    assert r3["stop_hits"] == 0
    assert not r3["pass_gopher"]


def test_gopher_quality_pass_flag_thresholds(spark):
    # A doc engineered to PASS every Gopher rule: 50 words of mean
    # length in [3, 10] including two required stop words.
    passing = " ".join(["the", "with"] + ["word"] * 48)
    # Its twin with 49 words fails ONLY the min-word rule.
    failing = " ".join(["the", "with"] + ["word"] * 47)
    out = {
        r["id"]: r
        for r in text_ops.gopher_quality(_docs(spark, [passing, failing])).collect()
    }
    assert out[0]["n_words"] == 50 and out[0]["pass_gopher"]
    assert out[1]["n_words"] == 49 and not out[1]["pass_gopher"]


def test_gopher_quality_empty_doc_row(spark):
    # Empty and whitespace-only docs still emit a (zeroed, failing)
    # row: filters consume this as a per-doc join.
    out = text_ops.gopher_quality(_docs(spark, ["", "   "])).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_words"] == 0
        assert r["mean_word_len_centi"] == 0
        assert not r["pass_gopher"]


# ---------------------------------------------------------------------------
# Leakage-safe cluster split
# ---------------------------------------------------------------------------


def test_cluster_safe_split_no_pair_straddles(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import sampling

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # a chain component {0,1,2}, a pair {10, 150}, the rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 150)], "id_a long, id_b long"
    )
    out = sampling.cluster_safe_split(docs, pairs, "doc_id")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 200
    # every doc of a component carries the component's min id and the
    # SAME split label
    for comp in ([0, 1, 2], [10, 150]):
        assert {rows[i]["component"] for i in comp} == {min(comp)}
        assert len({rows[i]["split"] for i in comp}) == 1
    # singletons label themselves
    assert rows[42]["component"] == 42
    # and the plain per-doc hash_split WOULD have leaked at least one
    # of the planted components across splits (the bug this fixes)
    naive = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(
            docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    leaked = any(
        len({naive[i] for i in comp}) > 1 for comp in ([0, 1, 2], [10, 150])
    )
    assert leaked, "planted components chosen to demonstrate the leak"
