"""Fuzzy (edit-distance) string matching — the entity-resolution step
for catalog name variants ("cold ring" vs "cold rod"), composed from
built-ins: blocked equi-join candidates + codegen ``levenshtein``
rerank.

Scale shape: the cross product is never materialized — candidates come
from an equi-join on a BLOCKING KEY, and only candidates pay the
O(len²) edit-distance DP.  The ``|len(a) - len(b)| <= max_dist``
pre-filter is free recall-wise (edit distance is bounded below by the
length difference).  Prefix blocking is the classic cheap scheme and
is RECALL-LOSSY for edits inside the first ``block_prefix`` chars —
that caveat is part of the declared semantics (the SQL oracle blocks
identically); for guaranteed-recall set-similarity at corpus scale use
the n-gram inverted index (``dedup.ngram_jaccard_pairs``) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join", "fuzzy_self_join"]


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    col: str,
    max_dist: int = 2,
    block_prefix: int = 2,
    right_col: str | None = None,
) -> DataFrame:
    """Pairs (a, b, dist) over the DISTINCT values of the two string
    columns with ``levenshtein(a, b) <= max_dist``, candidate-blocked
    on the first ``block_prefix`` characters.  Output columns are
    exactly (a, b, dist) — a VALUE-level match table; join it back to
    the row level on the string columns to carry other attributes
    (matching on values, not rows, is what keeps duplicate-heavy
    columns from exploding the candidate join)."""
    rc = right_col or col
    a = left.select(F.col(col).alias("a")).distinct()
    b = right.select(F.col(rc).alias("b")).distinct()
    cand = a.join(
        b,
        (F.substring("a", 1, block_prefix) == F.substring("b", 1, block_prefix))
        & (F.abs(F.length("a") - F.length("b")) <= max_dist),
    )
    return (
        cand.withColumn("dist", F.levenshtein("a", "b"))
        .filter(F.col("dist") <= max_dist)
    )


def fuzzy_self_join(
    df: DataFrame,
    col: str,
    max_dist: int = 2,
    block_prefix: int = 2,
) -> DataFrame:
    """Distinct unordered pairs (a < b) of near-matching values within
    one column — catalog-variant discovery.  Exact duplicates are
    collapsed by the distinct, so every emitted pair has dist >= 1."""
    out = fuzzy_join(df, df, col, max_dist, block_prefix)
    return out.filter(F.col("a") < F.col("b"))
