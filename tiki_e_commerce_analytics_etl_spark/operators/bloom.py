"""Relational Bloom filter: a distributed membership sketch built and
probed entirely with DataFrame expressions (no UDFs, no driver-side
bit arrays).

Use case (LLM-corpus scale): incremental ingest dedup against a
multi-PB historical corpus.  The reference dedups within each load
(``transform_data.py`` drop_duplicates); at 100 TB the equivalent
"is this new document already in the corpus?" question cannot be a
full-history join per batch.  Instead the history's content hashes
are summarized ONCE into an m-bit bitmap stored relationally as
``m/63`` bigint words (a few MB even for billions of keys, mergeable
by ``bit_or``), each new batch is screened against the *broadcast*
bitmap — a narrow plan in which no history row moves — and only the
"maybe seen" survivors (a small superset of the true duplicates) pay
the exact join.  No false negatives by construction: a key that was
fed to the build always probes positive.

Portability: the k probe positions derive from the same md5-based
48-bit portable hash family as
``dedup.minhash_lsh_candidates_portable`` (``h`` = first 12 hex chars
of md5, ``pos_i = (a_i*h + b_i) mod m`` with the seeded coefficients
from ``portable_minhash_params``), so any SQL engine reproduces the
bitmap and every probe decision bit-exactly — the DuckDB oracle for
the ``bloom_screen`` query does exactly that.

Layout note: words hold 63 bits (positions ``pos // 63`` / masks
``1 << (pos % 63)``), not 64, so no mask ever touches the sign bit —
DuckDB raises on ``1 << 63`` overflow while Spark wraps, and keeping
every word non-negative sidesteps engine-specific sign semantics.

Scale notes: the build is one scan with a partial (map-side) bit_or
aggregation down to at most ``m/63`` rows; the probe is a k-row
explode of the *batch only*, a broadcast hash join against the words,
and a groupBy on the batch's own key (same cardinality as the batch,
uniformly distributed).  At 1000 executors nothing about the history
moves except the bitmap words.  Sizing: for n keys and a target
false-positive rate p, m ≈ -n·ln p / (ln 2)² and k ≈ (m/n)·ln 2; the
defaults (m = 2^20 bits, k = 4) hold p < 1% out to ~10^5 keys — size
m from catalog stats (``stats.read_stats``) for real corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_minhash_params

BITS_PER_WORD = 63


def md5_48(col: Column) -> Column:
    """Portable 48-bit hash: first 12 hex chars of md5, as a long.
    Bit-exact across Spark (`conv`) and DuckDB (`CAST('0x'||… AS
    BIGINT)`); arithmetic headroom per portable_minhash_params."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def bloom_positions(key: Column, m_bits: int, k: int, seed: int = 7) -> Column:
    """Array of the k bit positions (each in [0, m_bits)) for a key."""
    a, b = portable_minhash_params(k, seed=seed)
    h = md5_48(key)
    return F.array(*[(F.lit(a[i]) * h + F.lit(b[i])) % F.lit(m_bits) for i in range(k)])


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Aggregate a corpus of keys into bitmap words.

    Returns ``(word_idx: long, word: long)`` with at most
    ``ceil(m_bits / 63)`` rows.  One scan, partial-agg friendly
    (bit_or is commutative/associative), null keys ignored.  Two
    builds over disjoint corpora merge with
    ``union → groupBy(word_idx).agg(bit_or(word))`` — the basis for
    incremental maintenance alongside ``merge.combine_aggregates``.
    """
    pos = F.explode(bloom_positions(F.col(key_col), m_bits, k, seed)).alias("__pos")
    exploded = df.where(F.col(key_col).isNotNull()).select(pos)
    return (
        exploded.select(
            (F.col("__pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
            _bit_mask("__pos"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("word"))
    )


def _bit_mask(pos_col: str) -> Column:
    """``1L << (pos % 63)`` as a column (PySpark's shiftleft only takes
    a literal shift count, so this goes through the SQL expression)."""
    return F.expr(
        f"shiftleft(cast(1 as bigint), cast({pos_col} % {BITS_PER_WORD} as int))"
    ).alias("__mask")


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union bitmaps built with identical (m_bits, k, seed)."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_probe(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    seed: int = 7,
    flag_col: str = "maybe_seen",
) -> DataFrame:
    """Membership screen: one row per distinct batch key with a
    boolean ``flag_col`` — false means *definitely not* in the built
    corpus; true means "maybe" (false-positive rate set by m/n and k).

    Plan: explode the batch's k positions, broadcast-join the bitmap
    words, groupBy the batch key requiring every probed bit set.  The
    history side never shuffles; the groupBy is on uniform batch keys.
    """
    pos = F.posexplode(bloom_positions(F.col(key_col), m_bits, k, seed))
    exploded = (
        batch.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("__key"), pos.alias("__i", "__pos"))
        .select(
            "__key",
            (F.col("__pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
            _bit_mask("__pos"),
        )
    )
    joined = exploded.join(F.broadcast(bloom), "word_idx", "left")
    bit_set = F.when(
        F.col("word").isNotNull() & (F.col("word").bitwiseAND(F.col("__mask")) != 0),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        joined.groupBy("__key")
        .agg((F.min(bit_set) == 1).alias(flag_col))
        .withColumnRenamed("__key", key_col)
    )
