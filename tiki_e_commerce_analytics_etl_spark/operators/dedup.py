"""Deduplication operators.

Reference surface (SURVEY.md §2.3): keep-latest-per-key (D1,
transform_tiki.py:582-587), first-seen (D2, :660), duplicate-pair
detection (D3, transform_google_trends.py:133-136).

Beyond the reference, the large-scale training-data operators: exact
content dedup, MinHash+LSH, SimHash, and n-gram Jaccard near-dup — all
expressed as shuffle-conscious DataFrame plans (no driver-side loops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Reference dedup operators
# --------------------------------------------------------------------------

def keep_latest(df: DataFrame, keys: list[str], order_col: str, tiebreakers: list[str] | None = None) -> DataFrame:
    """D1 — latest row per key ≡ row_number() OVER (PARTITION BY keys
    ORDER BY order_col DESC) = 1 (transform_tiki.py:582-587).

    Implemented as ``max_by(struct(<all>), struct(order, tiebreak…))``
    rather than a ranking window: a hash aggregate does map-side
    partial combining, so each input partition ships at most one
    candidate row per key to the shuffle — versus the window's full
    sort of every row.  At 100 TB of daily crawl data that's the
    difference between shuffling per-key winners and shuffling the
    whole table.  ``tiebreakers`` pins determinism on order_col ties
    (struct ordering is lexicographic; "latest, then highest
    tiebreaker" matches the desc/desc window ordering).
    """
    order_struct = F.struct(order_col, *(tiebreakers or []))
    row_struct = F.struct(*df.columns)
    picked = df.groupBy(*keys).agg(
        F.max_by(row_struct, order_struct).alias("__row")
    )
    return picked.select([F.col(f"__row.{c}").alias(c) for c in df.columns])


def keep_latest_window(df: DataFrame, keys: list[str], order_col: str, tiebreakers: list[str] | None = None) -> DataFrame:
    """Window-function formulation of keep_latest — same result; kept
    for cases where the full row ordering must break ties on more than
    the provided columns or the struct agg is undesirable."""
    order = [F.desc(order_col)] + [F.desc(c) for c in (tiebreakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def first_seen(df: DataFrame, keys: list[str]) -> DataFrame:
    """D2 — unordered dropDuplicates on the key set (transform_tiki.py:660).
    Spark's dropDuplicates is a partial-agg-friendly hash aggregate —
    map-side combining keeps the shuffle small."""
    return df.dropDuplicates(keys)


def duplicate_pairs(df: DataFrame, keys: list[str]) -> DataFrame:
    """D3 — diagnostic: key groups with count > 1
    (transform_google_trends.py:133-136)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


# --------------------------------------------------------------------------
# Training-data-pipeline dedup (beyond-reference, BASELINE.json north star)
# --------------------------------------------------------------------------

def _normalized(text: Column) -> Column:
    """Canonical text form for content hashing: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: md5 over normalized text, keep the row with
    the smallest id per digest.

    Scale: hash aggregate keyed on the 128-bit digest — uniformly
    distributed (no skew) and partial-agg friendly: each map partition
    ships one candidate row per digest, versus a window sort shuffling
    every row.
    """
    with_hash = df.withColumn("content_hash", F.md5(_normalized(F.col(text_col))))
    cols = with_hash.columns
    picked = with_hash.groupBy("content_hash").agg(
        F.min_by(F.struct(*[c for c in cols if c != "content_hash"]), F.col(id_col)).alias("__row")
    )
    return picked.select(
        *[F.col(f"__row.{c}").alias(c) for c in cols if c != "content_hash"], "content_hash"
    )


def shingles(text: Column, k: int = 5) -> Column:
    """Word k-shingles of the normalized text as array<string>.
    Documents shorter than k words yield a single shingle of the whole
    text so they still participate."""
    words = F.split(_normalized(text), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n > k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def minhash_signature(shingle_arr: Column, num_hashes: int = 32) -> Column:
    """MinHash signature as array<int>: for hash function i, the minimum
    of ``hash(shingle, i)`` over the document's shingles.

    Uses Spark's built-in xxhash64 with per-function seeds — pure
    expression (TRANSFORM + AGGREGATE over the array), no UDF, no
    shuffle.
    """
    sigs = [
        F.array_min(F.transform(shingle_arr, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """MinHash + LSH near-duplicate candidate pairs.

    Plan shape (the classic shingle→minhash→band→bucket-join pipeline):
      1. per-row signature (narrow, codegen'd expressions)
      2. explode into ``bands`` band-hash rows
      3. self-join on (band_index, band_hash) — the only shuffle; bucket
         keys are hashes, so the exchange is skew-free unless many true
         duplicates share a bucket, which is exactly the data we want
         colocated.
    Returns distinct candidate pairs (id_a < id_b).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(shingles(F.col(text_col), shingle_k), num_hashes)
    banded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(",", F.slice(sig, b * rows_per_band + 1, rows_per_band)), F.lit(b)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def simhash(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash of the word set, as a signed long.

    For each bit position, sum +1/-1 votes of each word-hash's bit and
    set the bit when the vote is positive.  All array expressions —
    JVM-side, no UDF.
    """
    words = F.split(_normalized(text), " ")
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    bit_cols = []
    for i in range(bits):
        mask = F.shiftleft(F.lit(1).cast("long"), i)
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )
        bit_cols.append(F.when(vote > 0, mask).otherwise(F.lit(0).cast("long")))
    out = bit_cols[0]
    for b in bit_cols[1:]:
        out = out.bitwiseOR(b)
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs above ``threshold``.

    Inverted-index join: explode distinct n-grams, join on the n-gram,
    count shared grams per pair, then Jaccard = shared / (|A|+|B|-shared).
    The n-gram join is the scalable formulation — it only pairs
    documents that share at least one gram, versus the O(N²) cross
    join.

    ``max_df`` prunes grams appearing in more than that many documents
    before the pair join — at 100 TB, stop-phrase grams ("in the the")
    would otherwise create quadratic hot buckets (a pair of documents
    sharing only ultra-common grams cannot clear a high threshold
    anyway, but the join would still enumerate it).  Note max_df
    pruning makes the reported Jaccard a lower bound for pairs that
    also share pruned grams; keep it None for exact semantics.
    """
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("grams"),
    ).select("__id", F.size("grams").alias("n_grams"), F.explode("grams").alias("gram"))

    if max_df is not None:
        doc_freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
        grams = (
            grams.join(F.broadcast(doc_freq.filter(F.col("__df") <= max_df).select("gram")), "gram")
        )

    a = grams.alias("a")
    b = grams.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.first(F.col("a.n_grams")).alias("na"),
            F.first(F.col("b.n_grams")).alias("nb"),
        )
    )
    jaccard = (F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))).alias("jaccard")
    return shared.select("id_a", "id_b", jaccard).filter(F.col("jaccard") >= threshold)
