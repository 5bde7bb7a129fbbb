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
    rather than a ranking window: the aggregate does map-side partial
    combining (Spark plans SortAggregate here — struct buffers aren't
    hash-aggregable — but the partial step still runs before the
    exchange), so each input partition ships at most one candidate row
    per key to the shuffle — versus the window's full sort of every
    row.  At 100 TB of daily crawl data that's the difference between
    shuffling per-key winners and shuffling the whole table.
    ``tiebreakers`` pins determinism on order_col ties (struct ordering
    is lexicographic; "latest, then highest tiebreaker" matches the
    desc/desc window ordering).
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

    Scale: aggregate keyed on the 128-bit digest — uniformly
    distributed (no skew) and partial-agg friendly: each map partition
    ships one candidate row per digest (partial min_by before the
    exchange), versus a window sort shuffling every row.
    """
    with_hash = df.withColumn("content_hash", F.md5(_normalized(F.col(text_col))))
    cols = with_hash.columns
    picked = with_hash.groupBy("content_hash").agg(
        F.min_by(F.struct(*[c for c in cols if c != "content_hash"]), F.col(id_col)).alias("__row")
    )
    return picked.select(
        *[F.col(f"__row.{c}").alias(c) for c in cols if c != "content_hash"], "content_hash"
    )


def shingles_from_words(words: Column, k: int = 5) -> Column:
    """Word k-shingle STRINGS from an already-materialized word array
    column.  Pass an attribute: expressions referenced inside the
    per-position lambda are re-evaluated per element, so an inline
    split here would re-tokenize the document O(n) times."""
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n > k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def shingles(text: Column, k: int = 5) -> Column:
    """Word k-shingles of the normalized text as array<string>.
    Documents shorter than k words yield a single shingle of the whole
    text so they still participate.

    Splitting on ``\\s+`` directly produces the identical word list as
    normalize-then-split-on-space in one regex pass instead of two.
    NOTE: the split is inlined into the per-position lambda, so prefer
    ``shingles_from_words`` over a materialized word column in hot
    paths.
    """
    return shingles_from_words(F.split(F.trim(F.lower(text)), r"\s+"), k)


def word_hashes(text: Column) -> Column:
    """Per-word xxhash64 of the whitespace-lowercased tokens."""
    words = F.split(F.trim(F.lower(text)), r"\s+")
    return F.transform(words, lambda w: F.xxhash64(w))


def shingle_hashes_from(whashes: Column, k: int = 5) -> Column:
    """k-window hashes over an already-materialized word-hash ARRAY
    COLUMN (pass an attribute, not an expression: subtrees referenced
    inside a higher-order lambda are re-evaluated per element, so an
    inline word-hash expression here would turn O(n) into O(n²))."""
    n = F.size(whashes)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n > k,
        F.transform(idx, lambda i: F.xxhash64(F.slice(whashes, i + 1, k))),
    ).otherwise(F.array(F.xxhash64(whashes)))


_MAX_LONG = (1 << 63) - 1


def minhash_signature(shingle_arr: Column, num_hashes: int = 32) -> Column:
    """MinHash signature as array<long>: for hash function i, the
    minimum of ``xxhash64(shingle, i)`` over the document's shingles.

    Single pass over the shingle array (one AGGREGATE whose accumulator
    is the running per-function minimum vector) — the naive
    one-array_min-per-function form re-evaluates the shingle expression
    ``num_hashes`` times, which turns a text normalization that should
    run once per row into hundreds of evaluations.  Pure expressions,
    no UDF, no shuffle.
    """
    seeds = F.sequence(F.lit(0).cast("long"), F.lit(num_hashes - 1).cast("long"))
    init = F.array_repeat(F.lit(_MAX_LONG), num_hashes)
    return F.aggregate(
        shingle_arr,
        init,
        lambda acc, s: F.zip_with(acc, seeds, lambda a, i: F.least(a, F.xxhash64(s, i))),
    )


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
    # Materialize the signature as a column in its own projection, THEN
    # band — keeps the expensive shingle→minhash expression evaluated
    # once per row instead of being inlined into every band expression.
    with_sig = (
        df.select(
            F.col(id_col).alias("__id"),
            word_hashes(F.col(text_col)).alias("__wh"),
        )
        .select(
            "__id",
            F.array_distinct(shingle_hashes_from(F.col("__wh"), shingle_k)).alias("__sh"),
        )
        .select(
            "__id",
            minhash_signature(F.col("__sh"), num_hashes).alias("__sig"),
        )
    )
    banded = with_sig.select(
        "__id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",", F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band)
                        ),
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    # Single-sided pair generation: ONE shuffle of the banded rows,
    # collect each bucket's ids, expand pairs with array expressions.
    # A self-join would evaluate the whole signature pipeline twice
    # (Spark can't reuse the exchange across a broadcast side) and
    # shuffle it twice.  Bucket membership lists are bounded by the
    # true-duplicate cluster size — exactly the rows LSH exists to
    # colocate.
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list("__id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
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
    # Single pass: the accumulator is the per-bit vote vector, so the
    # word hashing runs once per row rather than once per bit.
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            bit_idx,
            lambda a, i: a
            + F.when(h.bitwiseAND(F.call_function("shiftleft", F.lit(1).cast("long"), i)) != 0, 1).otherwise(-1),
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            votes,
            bit_idx,
            lambda v, i: F.when(v > 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, m: acc.bitwiseOR(m),
    )
    return packed


def simhash_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "simhash64",
) -> DataFrame:
    """DataFrame-level SimHash: word hashing stays JVM-side (one
    transform), bit-vote accumulation runs vectorized in numpy via
    mapInPandas (unpack 64 bits of every word hash, sum votes, repack)
    — an order of magnitude less interpreter overhead than the 64-wide
    zip_with fold of the Column form for long documents.  Same
    signature semantics as ``simhash`` (identical word-hash family)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    hashed = df.select(
        F.col(id_col), word_hashes(F.col(text_col)).alias("__wh")
    )
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField(out_col, T.LongType())]
    )

    bit_weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def run(batches):
        for pdf in batches:
            ids, sigs = [], []
            for i, hs in zip(pdf[id_col], pdf["__wh"]):
                h = np.asarray(hs, dtype=np.int64).view(np.uint64)
                if h.size == 0:
                    ids.append(i)
                    sigs.append(0)
                    continue
                bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
                votes = 2 * bits.sum(axis=0, dtype=np.int64) - h.size
                sig = int(bit_weights[votes > 0].sum(dtype=np.uint64))
                if sig >= 1 << 63:  # two's-complement to signed long
                    sig -= 1 << 64
                ids.append(i)
                sigs.append(sig)
            yield pd.DataFrame({id_col: ids, out_col: np.array(sigs, dtype=np.int64)})

    return hashed.mapInPandas(run, out_schema)


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
    # Grams participate only as join/group keys, so they are carried as
    # 64-bit shingle hashes, not strings: same set semantics (collision
    # odds over a corpus of G grams ≈ G²/2⁶⁵ — negligible), no string
    # building, and an 8-byte shuffle key.  Stages are materialized as
    # columns so higher-order lambdas never re-evaluate their inputs.
    grams = (
        df.select(
            F.col(id_col).alias("__id"), word_hashes(F.col(text_col)).alias("__wh")
        )
        .select(
            "__id",
            F.array_distinct(shingle_hashes_from(F.col("__wh"), n)).alias("grams"),
        )
        .select("__id", F.size("grams").alias("n_grams"), F.explode("grams").alias("gram"))
    )

    # Single-sided inverted index: ONE shuffle of the gram rows, then
    # per-gram pair expansion in array expressions.  Grams held by only
    # one document produce no pairs (size filter) — semantics-preserving
    # pruning that kills the bulk of the index (most shingles are
    # unique).  A self-join formulation would compute and shuffle the
    # shingling pipeline twice.  ``max_df`` caps the hot tail: a pair
    # sharing only ultra-common grams can't clear a high threshold, but
    # expansion would still enumerate it quadratically.  (max_df makes
    # the reported Jaccard a lower bound for pairs that also share
    # pruned grams; keep it None for exact semantics.)
    hi = F.size("docs") <= max_df if max_df is not None else F.lit(True)
    buckets = (
        grams.groupBy("gram")
        .agg(F.array_sort(F.collect_list(F.struct("__id", "n_grams"))).alias("docs"))
        .filter((F.size("docs") > 1) & hi)
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                lambda y: F.struct(
                    x["__id"].alias("id_a"),
                    y["__id"].alias("id_b"),
                    x["n_grams"].alias("na"),
                    y["n_grams"].alias("nb"),
                ),
            ),
        )
    )
    shared = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.first(F.col("p.na")).alias("na"),
            F.first(F.col("p.nb")).alias("nb"),
        )
    )
    jaccard = (F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))).alias("jaccard")
    return shared.select("id_a", "id_b", jaccard).filter(F.col("jaccard") >= threshold)
