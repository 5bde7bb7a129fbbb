"""Incremental corpus ingest with history-wide exact dedup at
bloom-filter cost — the composite the round-4 storage/sketch layers
exist for.

The problem at 100 TB: every ingest batch must answer "which of these
documents are already in the corpus?"  A join against all history is
a full-corpus shuffle per batch.  This pipeline keeps three acid
tables that together answer it in O(batch):

- ``corpus``   — the documents themselves (append-only);
- ``hashes``   — one row per content hash ever admitted (the exact
                 side; grows with the corpus but holds ONE short row
                 per doc);
- ``bloom``    — the fixed-size bitmap summary of ``hashes``.

Per batch: (1) hash + in-batch dedup (first occurrence wins);
(2) probe the BROADCAST bloom — rows probing negative are DEFINITELY
new (the bloom has no false negatives) and skip the exact check
entirely; (3) only the "maybe seen" sliver joins the hash table;
(4) survivors append to ``corpus`` + ``hashes``, and their bits fold
into ``bloom`` — each commit transactional with the (app, batch) txn
id, so crash-replayed batches are skipped and the pipeline is
exactly-once end to end.

With a healthy bloom sizing the exact join probes a few percent of
each batch against an indexed one-column table; nothing about the
corpus body is ever re-read or re-shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark import acid
from tiki_e_commerce_analytics_etl_spark.operators import bloom as bloom_ops


class IngestStore:
    """Paths of the three acid tables backing one corpus."""

    def __init__(self, root: str, m_bits: int = 1 << 20, k: int = 4) -> None:
        self.corpus = f"{root}/corpus"
        self.hashes = f"{root}/hashes"
        self.bloom = f"{root}/bloom"
        self.m_bits = m_bits
        self.k = k


def _hashed(batch: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return batch.withColumn(
        "content_hash",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))),
    )


def _recover_committed_batch(
    spark: SparkSession, path: str, app_id: str, batch_id: int
) -> DataFrame:
    """The EXACT row set a crashed ingest appended to ``path`` under
    (app_id, batch_id): find the snapshot whose app cursor first
    reached batch_id and read that commit's file-level change feed.
    This is the recovery source when a multi-table chain crashed
    between commits — recomputing the batch from live state would
    derive a DIFFERENT set (the already-committed tables have moved),
    while the corpus commit itself is the durable record of what was
    admitted."""
    versions = sorted(h["version"] for h in acid.table_history(path))
    hit = None
    for h in sorted(acid.table_history(path), key=lambda h: h["version"]):
        if h["app_versions"].get(app_id, -1) >= batch_id:
            hit = h["version"]
            break
    if hit is None:  # caller checked the cursor; defensive
        raise RuntimeError(f"no commit for ({app_id}, {batch_id}) in {path}")
    idx = versions.index(hit)
    prev = versions[idx - 1] if idx > 0 else None
    feed = acid.changes_between(spark, path, prev, hit, row_level=False)
    return feed.filter(F.col("_change_type") == "insert").drop("_change_type")


def _commit_admitted(
    spark: SparkSession,
    store: IngestStore,
    admitted: DataFrame,
    batch_id: int,
    app_id: str,
) -> None:
    """corpus → hashes → bloom commit chain for one batch's admitted
    rows.  Each per-table commit is idempotent under (app_id,
    batch_id), so re-running the chain after a partial crash only
    performs the missing commits."""
    acid.atomic_overwrite_partitions(
        admitted, store.corpus, mode="append", txn_app=app_id, txn_version=batch_id
    )
    acid.atomic_overwrite_partitions(
        admitted.select("content_hash"),
        store.hashes,
        mode="append",
        txn_app=app_id,
        txn_version=batch_id,
    )
    new_words = bloom_ops.bloom_build(
        admitted, "content_hash", m_bits=store.m_bits, k=store.k
    )
    try:
        existing = acid.read_atomic(spark, store.bloom)
    except FileNotFoundError:
        merged = new_words
    else:
        merged = bloom_ops.bloom_merge(existing, new_words)
    acid.atomic_overwrite_partitions(
        merged, store.bloom, txn_app=app_id, txn_version=batch_id
    )


def ingest_batch(
    spark: SparkSession,
    store: IngestStore,
    batch: DataFrame,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    app_id: str = "ingest",
) -> dict:
    """Admit the batch's content-new documents; returns counts
    {'batch', 'in_batch_dups', 'definitely_new', 'maybe_seen',
    'admitted'}.  Exactly-once per (app_id, batch_id).

    Crash consistency: the chain commits corpus → hashes → bloom, each
    per-table commit idempotent under its (app, batch) txn id.  The
    whole-batch replay check is against the LAST table in the chain
    (bloom) — only then is the batch fully durable.  If a crash landed
    the corpus commit but not the downstream ones, the replay does NOT
    recompute the admitted set from live state (the hash/bloom probes
    would now see the batch's own rows and derive a different —
    bloom-breaking — set); it recovers the EXACT admitted rows from
    the corpus commit's change feed and finishes the chain.
    """
    if acid.last_txn_version(store.bloom, app_id) >= batch_id:
        return {"replay_skipped": True}
    if acid.last_txn_version(store.corpus, app_id) >= batch_id:
        # partial crash after the corpus commit: finish the chain from
        # the durable record of what was admitted
        admitted = _recover_committed_batch(
            spark, store.corpus, app_id, batch_id
        ).localCheckpoint(eager=True)
        _commit_admitted(spark, store, admitted, batch_id, app_id)
        return {"recovered_replay": True, "admitted": admitted.count()}

    hashed = _hashed(batch, text_col, id_col)
    n_batch = hashed.count()
    # in-batch dedup: smallest id wins per content hash
    first = hashed.groupBy("content_hash").agg(
        F.min_by(F.struct(*hashed.columns), F.col(id_col)).alias("r")
    ).select("r.*")

    try:
        words = acid.read_atomic(spark, store.bloom)
    except FileNotFoundError:
        words = None

    if words is None:
        definitely_new, maybe = first, first.limit(0)
    else:
        flags = bloom_ops.bloom_probe(
            first, words, "content_hash", m_bits=store.m_bits, k=store.k
        )
        with_flag = first.join(flags, "content_hash")
        definitely_new = with_flag.where(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = with_flag.where(F.col("maybe_seen")).drop("maybe_seen")

    # exact check ONLY for the maybe-seen sliver
    try:
        seen = acid.read_atomic(spark, store.hashes)
    except FileNotFoundError:
        confirmed_new = maybe
    else:
        confirmed_new = maybe.join(seen, "content_hash", "left_anti")

    admitted = definitely_new.unionByName(confirmed_new).localCheckpoint(eager=True)
    n_first = first.count()
    n_maybe = maybe.count()
    n_admitted = admitted.count()

    _commit_admitted(spark, store, admitted, batch_id, app_id)
    return {
        "batch": n_batch,
        "in_batch_dups": n_batch - n_first,
        "definitely_new": n_first - n_maybe,
        "maybe_seen": n_maybe,
        "admitted": n_admitted,
    }


def forget(
    spark: SparkSession,
    store: IngestStore,
    doc_ids: DataFrame,
    batch_id: int,
    id_col: str = "doc_id",
    app_id: str = "forget",
) -> dict:
    """Right-to-be-forgotten over the ingest store: remove the given
    documents from ``corpus`` and ``hashes`` and REBUILD the bloom
    bitmap from the surviving hashes.

    The bitmap cannot subtract (bits are shared), but the hash table
    holds exactly ONE short row per admitted document — so the rebuild
    costs O(#documents) hash rows, never a corpus-body scan.  Because
    ingest admits one doc per content hash, a removed doc's hash has
    no other owner and must go too (otherwise a re-ingest of the same
    content would be wrongly rejected — the forgotten content becomes
    admissible again, which is exactly what deletion means).

    Exactly-once per (app_id, batch_id) like ingest_batch; replays
    are whole-batch no-ops.  Returns {'removed': n}.

    Crash consistency: the whole-batch replay check is against the
    LAST table in the commit chain (bloom).  Unlike ingest_batch, a
    partial-crash replay needs no change-feed recovery — re-deriving
    from live state is naturally idempotent here (anti-joining keys
    already removed from the corpus removes nothing more, and the
    bloom rebuild is a pure function of the surviving hashes), and the
    per-table commits skip themselves where already landed.
    """
    if acid.last_txn_version(store.bloom, app_id) >= batch_id:
        return {"replay_skipped": True}
    keys = F.broadcast(doc_ids.select(id_col).distinct())
    corpus = acid.read_atomic(spark, store.corpus)
    removed = corpus.join(keys, id_col, "left_semi").localCheckpoint(eager=True)
    n_removed = removed.count()
    keep = corpus.join(keys, id_col, "left_anti").localCheckpoint(eager=True)
    acid.atomic_overwrite_partitions(
        keep, store.corpus, txn_app=app_id, txn_version=batch_id
    )
    kept_hashes = keep.select("content_hash")
    acid.atomic_overwrite_partitions(
        kept_hashes, store.hashes, txn_app=app_id, txn_version=batch_id
    )
    rebuilt = bloom_ops.bloom_build(
        kept_hashes, "content_hash", m_bits=store.m_bits, k=store.k
    )
    acid.atomic_overwrite_partitions(
        rebuilt, store.bloom, txn_app=app_id, txn_version=batch_id
    )
    return {"removed": n_removed}
