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

Round 11 adds QUALITY GATING at admission: a store constructed with
``quality_mode`` ("gopher" or "logreg") scores every content-new row
with the same verified operators the batch surface exposes and
commits the failures to a ``quarantine`` table — BEFORE the corpus
chain, because quarantined rows never reach the corpus and so can
never be healed from its change feed.  Rejected-for-quality and
rejected-as-duplicate stay separate audit categories;
``readmit_quarantine`` is the threshold-change path (re-score, admit
the now-passing through the normal dedup screen, rewrite quarantine
last); ``forget`` scrubs quarantined text like corpus text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark import acid
from tiki_e_commerce_analytics_etl_spark.operators import bloom as bloom_ops


class IngestStore:
    """Paths of the acid tables backing one corpus (``bands`` is only
    materialized by the near-dup variant).  The LSH configuration
    lives HERE, not per-call: the band index is only probe-able with
    the exact hash family that built it, and chain healing / forget
    must be able to recompute band rows without the original call's
    arguments."""

    def __init__(
        self,
        root: str,
        m_bits: int = 1 << 20,
        k: int = 4,
        lsh_num_hashes: int = 32,
        lsh_bands: int = 8,
        lsh_shingle_k: int = 5,
        lsh_jaccard: float = 0.5,
        substring_k: int = 6,
        ivf_clusters: int = 8,
        ivf_iters: int = 3,
        sem_threshold: float = 0.95,
        quality_mode: str | None = None,
        quality_weights: dict[int, int] | None = None,
        quality_bias: int = 0,
        quality_dim: int = 512,
        quality_min_margin: int = 0,
    ) -> None:
        self.corpus = f"{root}/corpus"
        self.hashes = f"{root}/hashes"
        self.bloom = f"{root}/bloom"
        self.bands = f"{root}/bands"
        self.anchors = f"{root}/anchors"
        self.ngrams = f"{root}/ngrams"
        self.vectors = f"{root}/vectors"
        self.centroids = f"{root}/centroids"
        self.quarantine = f"{root}/quarantine"
        # Derived (rebuildable) ANN sidecar: PQ codebooks + codes over
        # the vectors table at one pinned version — NOT part of the
        # ingest txn chain; see build_vector_pq_sidecar.
        self.pq_books = f"{root}/pq_books"
        self.pq_codes = f"{root}/pq_codes"
        self.m_bits = m_bits
        self.k = k
        self.lsh_num_hashes = lsh_num_hashes
        self.lsh_bands = lsh_bands
        self.lsh_shingle_k = lsh_shingle_k
        self.lsh_jaccard = lsh_jaccard
        self.substring_k = substring_k
        self.ivf_clusters = ivf_clusters
        self.ivf_iters = ivf_iters
        self.sem_threshold = sem_threshold
        # Quality admission gate (round 11): like the LSH family, the
        # scoring config lives on the STORE — a quarantine table is
        # only interpretable under the scorer that filled it, and
        # readmission must be able to re-score without the original
        # call's arguments.  quality_mode: None (no gate), "gopher"
        # (text.gopher_quality pass_gopher), or "logreg" (exact
        # integer margin under quality_weights/quality_bias hashed to
        # quality_dim, admitted when >= quality_min_margin).
        if quality_mode not in (None, "gopher", "logreg"):
            raise ValueError(
                f"quality_mode must be None|gopher|logreg, got {quality_mode!r}"
            )
        if quality_mode == "logreg" and quality_weights is None:
            raise ValueError("quality_mode='logreg' requires quality_weights")
        self.quality_mode = quality_mode
        self.quality_weights = quality_weights
        self.quality_bias = quality_bias
        self.quality_dim = quality_dim
        self.quality_min_margin = quality_min_margin

    def quality_floor(self) -> int:
        """The admission cutoff on ``q_score``: pass_gopher is 0/1 so
        the gopher floor is 1; logreg admits at the configured
        micro-unit margin."""
        return 1 if self.quality_mode == "gopher" else self.quality_min_margin


def _has_table(path: str) -> bool:
    return acid.latest_version(path) is not None


def _hashed(batch: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return batch.withColumn(
        "content_hash",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))),
    )


def _commit_rows(
    spark: SparkSession, path: str, prev: int | None, version: int
) -> DataFrame:
    """The EXACT row set one corpus commit appended: the file-level
    change feed between the snapshot and its predecessor.  The corpus
    commit is the durable record of what a crashed chain admitted —
    recomputing the batch from live state would derive a DIFFERENT set
    (the already-committed tables have moved)."""
    feed = acid.changes_between(spark, path, prev, version, row_level=False)
    return feed.filter(F.col("_change_type") == "insert").drop("_change_type")


def _durable_commit_count(
    spark: SparkSession, path: str, app_id: str, batch_id: int
) -> int | None:
    """Row count of the append commit ``(app_id, batch_id)`` landed on
    ``path`` — for honest replay reporting (a crashed-then-replayed
    batch DID admit these rows; reporting 0 would make audit sums
    undercount).  Metadata-only when manifests carry row stats (the
    n_rows delta vs the predecessor), falling back to a change-feed
    count.  Returns None when vacuum has pruned the commit's manifest
    or its predecessor (retained versions are a contiguous suffix, so
    a cursor already at/above ``batch_id`` on the OLDEST retained
    manifest means the diff base is gone) — the exact count is then
    genuinely unrecoverable."""
    hist = sorted(acid.table_history(path), key=lambda h: h["version"])
    prev: dict | None = None
    for h in hist:
        cur = h["app_versions"].get(app_id, -1)
        if cur >= batch_id:
            if cur > batch_id:
                return None  # commit manifest pruned
            if prev is None and h["version"] > 0:
                return None  # predecessor manifest pruned
            if h["n_rows"] is not None and (
                prev is None or prev["n_rows"] is not None
            ):
                return h["n_rows"] - (prev["n_rows"] if prev else 0)
            return _commit_rows(
                spark, path, prev["version"] if prev else None, h["version"]
            ).count()
        prev = h
    return None


def _anchor_rows(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """The window-anchor index rows for one batch's admitted docs:
    (__id, __off, __h) per sliding k-word window — a pure function of
    the admitted rows, so chain healing can reconstruct them from the
    corpus commit's change feed."""
    from tiki_e_commerce_analytics_etl_spark.operators.dedup import window_anchors

    _tok, wins = window_anchors(df, text_col, id_col, k)
    return wins.select("__id", "__off", "__h")


def _ngram_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document bigram count rows (__id, w1, w2, tf) for one
    batch's admitted docs — the incremental LM-count index.  A pure
    function of the admitted rows (chain healing reconstructs them
    from the corpus change feed), and keyed by document so ``forget``
    can subtract exactly one document's contribution.  Uses the SAME
    ``text.words`` normalization as ``kn_bigram_lm``, so the chain
    aggregate and the one-shot trainer see identical counts."""
    from tiki_e_commerce_analytics_etl_spark.operators.text import words

    toks = df.select(
        F.col(id_col).alias("__id"), words(F.col(text_col)).alias("__ws")
    ).filter((F.size("__ws") >= 2) & (F.element_at("__ws", 1) != ""))
    return (
        toks.select(
            "__id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__ws) - 1),"
                    " i -> struct(__ws[i-1] AS w1, __ws[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select("__id", "bg.w1", "bg.w2")
        .groupBy("__id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _chain_tail(
    store: IngestStore,
    with_bands: bool,
    with_anchors: bool,
    with_ngrams: bool = False,
    with_vectors: bool = False,
) -> str:
    """The LAST table of the commit chain — the replay cursor / heal
    tail.  Commit order is corpus → hashes → bloom → bands → anchors
    → ngrams → vectors, so the tail is the furthest-downstream table
    in play."""
    if with_vectors:
        return store.vectors
    if with_ngrams:
        return store.ngrams
    if with_anchors:
        return store.anchors
    if with_bands:
        return store.bands
    return store.bloom


def _stored_centroids(spark: SparkSession, store: IngestStore) -> list[list[int]]:
    """Reconstruct the k × dim integer centroid list from the
    persisted long-format rows — the only driver traffic the vector
    index ever needs (bounded by k × dim, never by corpus size).
    Raises a clear error when the basis was never bootstrapped (e.g.
    querying a store whose only vector batches were empty) instead of
    an opaque read/``min()`` failure downstream."""
    if not _has_table(store.centroids):
        raise ValueError(
            f"vector index has no centroid basis ({store.centroids}): "
            "no vector batch with content-new rows has been ingested "
            "yet, so there is nothing to probe — ingest a non-empty "
            "batch through ingest_batch_vectors first"
        )
    rows = acid.read_atomic(spark, store.centroids).collect()
    if not rows:
        raise ValueError(
            f"centroid basis table is empty ({store.centroids}); the "
            "vector index cannot be probed — re-bootstrap by ingesting "
            "a non-empty vector batch"
        )
    by_c: dict[int, dict[int, int]] = {}
    for r in rows:
        by_c.setdefault(r["cluster"], {})[r["pos"]] = r["val"]
    dim = max(by_c[min(by_c)]) + 1
    return [[by_c[c][p] for p in range(dim)] for c in sorted(by_c)]


def _probe_cells(
    df: DataFrame,
    cents: list[list[int]],
    id_col: str,
    vec_col: str,
    nprobe: int,
) -> DataFrame:
    """(id, cluster) rows for the ``nprobe`` nearest centroid cells of
    every input vector — the multi-probe candidate fan-out of IVF
    search/admission.  Tie-break (distance, cluster) matches
    ``assign_exact``'s argmin-first rule, so probe cell #1 is always
    the assigned cell.  Narrow: k codegen distance expressions + one
    bounded array sort per row, no join."""
    from tiki_e_commerce_analytics_etl_spark.operators import clustering

    q = clustering.quantize_vectors(df, id_col, vec_col)
    dists = F.array(
        *[clustering._dist_to(F.col("qv"), c) for c in cents]  # noqa: SLF001
    )
    return (
        q.withColumn("__ds", dists)
        .select(
            "id",
            F.explode(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.transform(
                                F.col("__ds"),
                                lambda d, i: F.struct(
                                    d.alias("d"), i.cast("int").alias("c")
                                ),
                            )
                        ),
                        lambda s: s["c"],
                    ),
                    1,
                    nprobe,
                )
            ).alias("cluster"),
        )
    )


def _vector_rows(
    spark: SparkSession,
    store: IngestStore,
    df: DataFrame,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """The vector-index rows for one batch's admitted docs:
    (__id, cluster, __vec) with cluster the exact integer-L2
    assignment against the PERSISTED centroid basis — a pure function
    of the admitted rows plus the centroids table (which commits
    before any corpus commit that needs it), so chain healing can
    reconstruct them from the corpus change feed."""
    from tiki_e_commerce_analytics_etl_spark.operators import clustering

    cents = _stored_centroids(spark, store)
    assigned = clustering.assign_exact(
        clustering.quantize_vectors(df, id_col, vec_col), cents
    ).select("id", "cluster")
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__vec"),
    )
    return assigned.join(vecs, "id").select(
        F.col("id").alias("__id"), "cluster", "__vec"
    )


def _semantic_screen(
    spark: SparkSession,
    store: IngestStore,
    content_new: DataFrame,
    vec_col: str,
    id_col: str,
    nprobe: int,
) -> tuple[DataFrame, DataFrame, int, int]:
    """The incremental-SemDeDup admission screen, shared verbatim by
    ``ingest_batch_vectors`` and the vector path of
    ``readmit_quarantine`` so readmission cannot drift from ingest:
    cluster-assign the content-new rows against the persisted basis,
    generate history candidates by cell equi-join against the vector
    index (``nprobe`` fans out the NEW side only), exact-cosine-rerank
    the cell sliver, and reject history matches plus the larger id of
    each verified in-batch same-cell pair.  Returns
    ``(new_vrows, admitted, n_rej_hist, n_rej_batch)`` — ``new_vrows``
    are the index rows for ALL content-new docs (the caller appends
    the admitted subset to ``store.vectors``)."""
    from tiki_e_commerce_analytics_etl_spark.operators.similarity import cosine

    if _has_table(store.centroids):
        new_vrows = _vector_rows(
            spark, store, content_new, vec_col, id_col
        ).localCheckpoint(eager=True)
    else:  # nothing new and no basis yet: empty, schema-correct
        new_vrows = content_new.select(
            F.col(id_col).alias("__id"),
            F.lit(0).cast("int").alias("cluster"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__vec"),
        ).limit(0)

    # Candidate-generation rows: at nprobe=1 exactly the index rows;
    # at nprobe>1 the NEW side fans out to its n nearest cells (the
    # persisted index keeps one row per vector either way).
    if nprobe > 1 and _has_table(store.centroids):
        probes = _probe_cells(
            content_new, _stored_centroids(spark, store), id_col, vec_col, nprobe
        )
        vecs_new = content_new.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__vec"),
        )
        cand_rows = (
            probes.join(vecs_new, "id")
            .select(F.col("id").alias("__id"), "cluster", "__vec")
            .localCheckpoint(eager=True)
        )
    else:
        cand_rows = new_vrows

    # history candidates -> exact cosine rerank on the cell sliver
    rejected_hist = content_new.select(F.col(id_col)).limit(0)
    n_rej_hist = 0
    if _has_table(store.vectors):
        hist = acid.read_atomic(spark, store.vectors).select(
            F.col("__id").alias("__oid"), "cluster", F.col("__vec").alias("__ov")
        )
        verified = (
            cand_rows.join(hist, "cluster")
            .withColumn("__cos", cosine(F.col("__vec"), F.col("__ov")))
            .filter(F.col("__cos") >= F.lit(store.sem_threshold))
        )
        rejected_hist = verified.select(F.col("__id").alias(id_col)).distinct()
        n_rej_hist = rejected_hist.count()

    # in-batch candidates: same-cell pairs among the new rows only
    # (both sides probe-fanned at nprobe>1; pair duplicates collapse
    # in the id-level distinct)
    x = cand_rows.select(
        F.col("__id").alias("__ida"), "cluster", F.col("__vec").alias("__va")
    )
    y = cand_rows.select(
        F.col("__id").alias("__idb"), "cluster", F.col("__vec").alias("__vb")
    )
    verified_b = (
        x.join(y, "cluster")
        .filter(F.col("__ida") < F.col("__idb"))
        .withColumn("__cos", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("__cos") >= F.lit(store.sem_threshold))
    )
    rejected_batch = verified_b.select(F.col("__idb").alias(id_col)).distinct()
    n_rej_batch = rejected_batch.count()

    rejected = rejected_hist.unionByName(rejected_batch).distinct()
    admitted = content_new.join(rejected, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    return new_vrows, admitted, n_rej_hist, n_rej_batch


def _heal_chain(
    spark: SparkSession,
    store: IngestStore,
    app_id: str,
    band_params: tuple | None = None,  # (text_col, id_col) when the band index is in play
    anchor_params: tuple | None = None,  # (text_col, id_col) when the anchor index is in play
    ngram_params: tuple | None = None,  # (text_col, id_col) when the LM-count index is in play
    vector_params: tuple | None = None,  # (vec_col, id_col) when the vector index is in play
) -> int:
    """Bring the downstream tables level with the corpus cursor: for
    every corpus commit whose (app) txn version exceeds the LAST table
    in the chain, recover its exact row set from the change feed and
    re-run the idempotent per-table commits.  Covers both the
    redelivered-batch replay AND the out-of-order case where the next
    batch arrives before a crashed one is retried — without healing,
    the normal path would screen against hashes/bloom that are missing
    committed content and silently re-admit it.  Returns the number of
    commits healed.

    VACUUM ORDERING CONSTRAINT: recovery reads the crashed commit's
    corpus data files by manifest reference, so ``acid.vacuum`` must
    never prune a corpus version newer than the minimum un-healed app
    cursor — a forget/compaction rewrite followed by an aggressive
    vacuum would delete the files an older un-healed commit still
    needs.  Every entry point here heals BEFORE it rewrites (the
    heal-before-forget invariant), and ``vacuum_store`` makes the
    ordering structural for maintenance: heal every app chain, THEN
    prune.  Do not call ``acid.vacuum`` directly on a store with
    possibly-unhealed chains."""
    tail = _chain_tail(
        store,
        band_params is not None,
        anchor_params is not None,
        ngram_params is not None,
        vector_params is not None,
    )
    tail_v = acid.last_txn_version(tail, app_id)
    corpus_v = acid.last_txn_version(store.corpus, app_id)
    if corpus_v <= tail_v:
        return 0
    healed = 0
    hist = sorted(acid.table_history(store.corpus), key=lambda h: h["version"])
    prev_version: int | None = None
    prev_cursor = -1
    for h in hist:
        cur = h["app_versions"].get(app_id, -1)
        if cur > prev_cursor and cur > tail_v:
            admitted = _commit_rows(
                spark, store.corpus, prev_version, h["version"]
            ).localCheckpoint(eager=True)
            _commit_admitted(spark, store, admitted, cur, app_id)
            if band_params is not None:
                text_col, id_col = band_params
                acid.atomic_overwrite_partitions(
                    _band_rows(
                        admitted,
                        text_col,
                        id_col,
                        store.lsh_num_hashes,
                        store.lsh_bands,
                        store.lsh_shingle_k,
                    ),
                    store.bands,
                    mode="append",
                    txn_app=app_id,
                    txn_version=cur,
                )
            if anchor_params is not None:
                text_col, id_col = anchor_params
                acid.atomic_overwrite_partitions(
                    _anchor_rows(admitted, text_col, id_col, store.substring_k),
                    store.anchors,
                    mode="append",
                    txn_app=app_id,
                    txn_version=cur,
                )
            if ngram_params is not None:
                text_col, id_col = ngram_params
                acid.atomic_overwrite_partitions(
                    _ngram_rows(admitted, text_col, id_col),
                    store.ngrams,
                    mode="append",
                    txn_app=app_id,
                    txn_version=cur,
                )
            if vector_params is not None:
                vec_col, id_col = vector_params
                acid.atomic_overwrite_partitions(
                    _vector_rows(spark, store, admitted, vec_col, id_col),
                    store.vectors,
                    mode="append",
                    txn_app=app_id,
                    txn_version=cur,
                )
            healed += 1
        prev_cursor = max(prev_cursor, cur)
        prev_version = h["version"]
    return healed


def _first_per_hash(hashed: DataFrame, id_col: str) -> DataFrame:
    """In-batch dedup: smallest id wins per content hash."""
    return (
        hashed.groupBy("content_hash")
        .agg(F.min_by(F.struct(*hashed.columns), F.col(id_col)).alias("r"))
        .select("r.*")
    )


def _exact_new(
    spark: SparkSession, store: IngestStore, first: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split in-batch-deduped rows into (definitely_new, maybe_seen,
    confirmed_new): bloom-negative rows skip the exact check entirely
    (no false negatives), only the maybe-seen sliver joins the hash
    table."""
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

    try:
        seen = acid.read_atomic(spark, store.hashes)
    except FileNotFoundError:
        confirmed_new = maybe
    else:
        confirmed_new = maybe.join(seen, "content_hash", "left_anti")
    return definitely_new, maybe, confirmed_new


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


def _quality_scores(store: IngestStore, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id_col, q_score long) under the store's quality config — the
    SAME verified operators the batch surface exposes, so incremental
    scoring ≡ one-shot scoring by shared code, not by parallel
    implementation: ``gopher`` delegates to ``text.gopher_quality``
    (q_score = pass_gopher as 0/1), ``logreg`` to
    ``features.logreg_margins`` over the identical md5_48-hashed
    unigram features ``logreg_train`` uses (q_score = exact
    micro-unit margin).  Deterministic in (text, store config), so a
    crash-redelivered batch re-derives the identical quarantine set."""
    if store.quality_mode == "gopher":
        from tiki_e_commerce_analytics_etl_spark.operators.text import (
            gopher_quality,
        )

        return gopher_quality(df, text_col=text_col, id_col=id_col).select(
            F.col("id").alias(id_col),
            F.col("pass_gopher").cast("long").alias("q_score"),
        )
    from tiki_e_commerce_analytics_etl_spark.operators.bloom import md5_48
    from tiki_e_commerce_analytics_etl_spark.operators.features import (
        logreg_margins,
    )
    from tiki_e_commerce_analytics_etl_spark.operators.text import words

    lab = df.select(F.col(id_col).alias("id"), F.lit(0).alias("y"))
    feats = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(words(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
        .select(
            "id", (md5_48(F.col("term")) % F.lit(store.quality_dim)).alias("f")
        )
        .groupBy("id", "f")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return logreg_margins(
        lab, feats, store.quality_weights, store.quality_bias
    ).select(F.col("id").alias(id_col), F.col("m").alias("q_score"))


def _quality_split(
    spark: SparkSession,
    store: IngestStore,
    content_new: DataFrame,
    text_col: str,
    id_col: str,
    batch_id: int,
    app_id: str,
) -> tuple[DataFrame, int]:
    """The quality admission gate: score the content-new rows, commit
    the failing ones to the QUARANTINE table (full row + q_score —
    rejected-for-quality is a different audit category than
    rejected-as-duplicate, and readmission needs the text), and return
    (passing rows, n_quarantined).  No-op passthrough when the store
    has no quality config.

    COMMIT ORDER: quarantine commits BEFORE the corpus chain.
    Quarantined rows are NOT a function of any corpus commit (they
    never reach the corpus), so ``_heal_chain`` cannot reconstruct
    them — committing them first means a crash anywhere downstream
    leaves the quarantine rows durable, and the redelivered batch's
    recomputation (deterministic scoring) replays the quarantine
    append as an idempotent no-op under its (app, batch) txn id."""
    if store.quality_mode is None:
        return content_new, 0
    scored = _quality_scores(store, content_new, text_col, id_col)
    joined = content_new.join(scored, id_col)
    floor = store.quality_floor()
    failing = joined.filter(F.col("q_score") < F.lit(floor)).localCheckpoint(
        eager=True
    )
    passing = (
        joined.filter(F.col("q_score") >= F.lit(floor))
        .drop("q_score")
        .localCheckpoint(eager=True)
    )
    n_quarantined = failing.count()
    acid.atomic_overwrite_partitions(
        failing,
        store.quarantine,
        mode="append",
        txn_app=app_id,
        txn_version=batch_id,
    )
    return passing, n_quarantined


READMIT_APP_ID = "readmit"
"""Default app id of ``readmit_quarantine`` commits.  Batch entry
points heal this chain alongside their own (and
``unhealed_floor``/``vacuum_store`` default to protecting it): a crash
mid-readmit leaves heal-requiring APPEND commits under this app, and
without healing it (a) a later default vacuum could prune the corpus
change-feed files its recovery needs, and (b) interleaved batch
ingests would screen against band/anchor/ngram indexes missing the
readmitted docs until readmit is next invoked."""


def _heal_apps(spark: SparkSession, store: IngestStore, apps, **params) -> int:
    """Heal every app chain in ``apps`` (deduped, in order)."""
    healed = 0
    for app in dict.fromkeys(apps):
        healed += _heal_chain(spark, store, app, **params)
    return healed


def _require_no_vector_index(store: IngestStore, entry: str) -> None:
    """A text-only batch cannot be healed into vector rows, so a store
    that has a vector index must route every batch through
    ``ingest_batch_vectors`` (or ``forget``).  Failing LOUD here is the
    difference between an exception and an index that silently misses
    rows and re-admits semantic duplicates forever — the same
    only-probe-able-with-the-family-that-built-it discipline as the
    band index, enforced instead of documented."""
    if _has_table(store.vectors):
        raise ValueError(
            f"{entry}: store has a vector index ({store.vectors}); "
            "ingest through ingest_batch_vectors so the index stays "
            "complete (text-only commits cannot be healed into vector rows)"
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

    Variant mixing: when a ``bands`` near-dup index and/or an
    ``anchors`` substring index exists on this store (some batches
    went through ``ingest_batch_neardup`` / ``ingest_batch_substring``),
    this plain path MAINTAINS them — appends band/anchor rows for its
    admitted docs, extends the commit chain (and the replay cursor /
    heal tail) downstream — so the indexes never silently miss this
    batch's rows and later screens stay complete.  It still performs
    no near-dup rejection or substring detection of its own.
    """
    _require_no_vector_index(store, "ingest_batch")
    with_bands = _has_table(store.bands)
    with_anchors = _has_table(store.anchors)
    with_ngrams = _has_table(store.ngrams)
    band_params = (text_col, id_col) if with_bands else None
    anchor_params = (text_col, id_col) if with_anchors else None
    ngram_params = (text_col, id_col) if with_ngrams else None
    tail = _chain_tail(store, with_bands, with_anchors, with_ngrams)
    if acid.last_txn_version(tail, app_id) >= batch_id:
        return {"replay_skipped": True}
    # finish any commit chain a crash left behind BEFORE screening:
    # covers the redelivered batch (we return below) and the
    # out-of-order case (an earlier batch crashed, this is a NEWER one
    # — its screen must see the healed hashes/bloom or it re-admits
    # committed content)
    healed = _heal_apps(
        spark,
        store,
        (app_id, READMIT_APP_ID),
        band_params=band_params,
        anchor_params=anchor_params,
        ngram_params=ngram_params,
    )
    if acid.last_txn_version(store.corpus, app_id) >= batch_id:
        return {"recovered_replay": True, "healed_commits": healed}

    hashed = _hashed(batch, text_col, id_col)
    n_batch = hashed.count()
    first = _first_per_hash(hashed, id_col)
    definitely_new, maybe, confirmed_new = _exact_new(spark, store, first)

    content_new = definitely_new.unionByName(confirmed_new).localCheckpoint(eager=True)
    admitted, n_quarantined = _quality_split(
        spark, store, content_new, text_col, id_col, batch_id, app_id
    )
    n_first = first.count()
    n_maybe = maybe.count()
    n_admitted = admitted.count()

    _commit_admitted(spark, store, admitted, batch_id, app_id)
    if with_bands:
        acid.atomic_overwrite_partitions(
            _band_rows(
                admitted,
                text_col,
                id_col,
                store.lsh_num_hashes,
                store.lsh_bands,
                store.lsh_shingle_k,
            ),
            store.bands,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    if with_anchors:
        acid.atomic_overwrite_partitions(
            _anchor_rows(admitted, text_col, id_col, store.substring_k),
            store.anchors,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    if with_ngrams:
        acid.atomic_overwrite_partitions(
            _ngram_rows(admitted, text_col, id_col),
            store.ngrams,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    return {
        "batch": n_batch,
        "in_batch_dups": n_batch - n_first,
        "definitely_new": n_first - n_maybe,
        "maybe_seen": n_maybe,
        "admitted": n_admitted,
        "quarantined": n_quarantined,
    }


def forget(
    spark: SparkSession,
    store: IngestStore,
    doc_ids: DataFrame,
    batch_id: int,
    id_col: str = "doc_id",
    app_id: str = "forget",
    text_col: str = "text",
    ingest_app_id: str = "ingest",
    vec_col: str = "embedding",
) -> dict:
    """Right-to-be-forgotten over the ingest store: remove the given
    documents from ``corpus``, ``hashes``, and (when the near-dup
    index exists) ``bands``, and REBUILD the bloom bitmap from the
    surviving hashes.

    The bitmap cannot subtract (bits are shared), but the hash table
    holds exactly ONE short row per admitted document — so the rebuild
    costs O(#documents) hash rows, never a corpus-body scan.  Because
    ingest admits one doc per content hash, a removed doc's hash has
    no other owner and must go too (otherwise a re-ingest of the same
    content would be wrongly rejected — the forgotten content becomes
    admissible again, which is exactly what deletion means).  Band
    rows and window-anchor rows are content-derived data and leave
    with their documents.

    Exactly-once per (app_id, batch_id) like ingest_batch; replays
    are whole-batch no-ops.  Returns {'removed': n}.

    Crash consistency: forget FIRST heals any ingest chain a crash
    left behind (``ingest_app_id``) — healing replays corpus change
    feeds into hashes/bloom/bands/anchors, so it must never run AFTER
    a forget rewrote them (it would resurrect the forgotten content's
    hash, bits, and anchors from the old corpus files).  The
    whole-batch replay check is against the LAST table in forget's own
    chain (anchors, else bands, else bloom).  A partial-crash replay
    needs no change-feed recovery — re-deriving from live state is
    naturally idempotent here (anti-joining keys already removed
    removes nothing more, the bloom rebuild is a pure function of the
    surviving hashes), and the per-table commits skip themselves where
    already landed.
    """
    with_bands = _has_table(store.bands)
    with_anchors = _has_table(store.anchors)
    with_ngrams = _has_table(store.ngrams)
    with_vectors = _has_table(store.vectors)
    band_params = (text_col, id_col) if with_bands else None
    anchor_params = (text_col, id_col) if with_anchors else None
    ngram_params = (text_col, id_col) if with_ngrams else None
    vector_params = (vec_col, id_col) if with_vectors else None
    tail = _chain_tail(store, with_bands, with_anchors, with_ngrams, with_vectors)
    if acid.last_txn_version(tail, app_id) >= batch_id:
        return {"replay_skipped": True}
    _heal_chain(
        spark,
        store,
        ingest_app_id,
        band_params=band_params,
        anchor_params=anchor_params,
        ngram_params=ngram_params,
        vector_params=vector_params,
    )
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
    if with_bands:
        kept_bands = acid.read_atomic(spark, store.bands).join(
            keys.withColumnRenamed(id_col, "__id"), "__id", "left_anti"
        )
        acid.atomic_overwrite_partitions(
            kept_bands, store.bands, txn_app=app_id, txn_version=batch_id
        )
    if with_anchors:
        kept_anchors = acid.read_atomic(spark, store.anchors).join(
            keys.withColumnRenamed(id_col, "__id"), "__id", "left_anti"
        )
        acid.atomic_overwrite_partitions(
            kept_anchors, store.anchors, txn_app=app_id, txn_version=batch_id
        )
    if with_ngrams:
        kept_ngrams = acid.read_atomic(spark, store.ngrams).join(
            keys.withColumnRenamed(id_col, "__id"), "__id", "left_anti"
        )
        acid.atomic_overwrite_partitions(
            kept_ngrams, store.ngrams, txn_app=app_id, txn_version=batch_id
        )
    if with_vectors:
        # Vector rows are content-derived and leave with their docs;
        # the centroid BASIS stays — it is a coordinate system, not
        # document content, and the index stays probe-able under it.
        kept_vectors = acid.read_atomic(spark, store.vectors).join(
            keys.withColumnRenamed(id_col, "__id"), "__id", "left_anti"
        )
        acid.atomic_overwrite_partitions(
            kept_vectors, store.vectors, txn_app=app_id, txn_version=batch_id
        )
    # The PQ serving sidecar holds content-derived codes of possibly-
    # forgotten docs; it is a rebuildable cache, so forget DELETES it
    # outright rather than leaving the data to linger stale (the
    # vectors rewrite above already made it unservable by version).
    if _has_table(store.pq_codes) or _has_table(store.pq_books):
        import shutil

        shutil.rmtree(store.pq_codes, ignore_errors=True)
        shutil.rmtree(store.pq_books, ignore_errors=True)
    n_removed_q = 0
    if _has_table(store.quarantine):
        # Right-to-be-forgotten reaches the quarantine too: it stores
        # the full document text, so forgotten ids must leave it the
        # same way they leave the corpus.
        qrows = acid.read_atomic(spark, store.quarantine)
        n_removed_q = qrows.join(keys, id_col, "left_semi").count()
        acid.atomic_overwrite_partitions(
            qrows.join(keys, id_col, "left_anti"),
            store.quarantine,
            txn_app=app_id,
            txn_version=batch_id,
        )
    return {"removed": n_removed, "removed_quarantined": n_removed_q}


def readmit_quarantine(
    spark: SparkSession,
    store: IngestStore,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    app_id: str = "readmit",
    ingest_app_id: str = "ingest",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> dict:
    """Re-screen the quarantine under the store's CURRENT quality
    config and admit the rows that now pass — the threshold-change
    path: a curator who lowers ``quality_min_margin`` (or swaps the
    trained weights) calls this once instead of re-ingesting history.

    Semantics: every now-passing quarantine row LEAVES quarantine;
    those whose content is not already in the corpus (it can be — an
    equal-content doc may have been admitted from a later batch) go
    through the normal exact-dedup screen and the corpus commit
    chain, with band/anchor/ngram index rows maintained like plain
    ``ingest_batch`` variant mixing.  Rows still failing stay put;
    their stored ``q_score`` is deliberately NOT refreshed — scores
    are recomputed on every readmission pass anyway, and the stored
    one is the score at quarantine time (an audit fact, not a cache).

    Raising the threshold never reaches back into the corpus: already
    admitted docs stay (removal is ``forget`` territory, an explicit
    curator action, not a side effect of a config edit).

    Exactly-once per (app_id, batch_id); the replay cursor is the
    QUARANTINE table because its rewrite is the LAST commit: a crash
    after the corpus chain but before the quarantine rewrite replays
    via ``_heal_chain`` on this app's corpus commit (finishing
    hashes/bloom/indexes), then re-derives the same now-passing set
    (scoring is deterministic) and finishes the rewrite; the
    admission itself is cursor-skipped.

    Stores with a VECTOR index readmit through the same semantic
    screen that ingests: quarantine rows on such a store carry the
    embedding column (they were quarantined out of a vector batch's
    content-new set, full row), so readmission cluster-assigns the
    now-passing rows against the persisted centroid basis, rejects
    verified semantic near-dups of history (and the larger id of each
    verified in-readmit pair) via the SHARED ``_semantic_screen``, and
    appends the admitted docs' vector rows in the same txn — the
    index never misses a readmitted doc.  A quarantine predating the
    vector index (rows without ``vec_col``) is refused loudly: those
    rows cannot be healed into vector rows.

    Every non-replay path returns the same key set
    (rescored / readmitted / left_quarantine / still_quarantined /
    sem_rejected / readmitted_durable_in_prior_attempt); the crash
    -replay branch reports the DURABLE admitted count recovered from
    the corpus commit's change feed, flagged with
    ``readmitted_durable_in_prior_attempt=True`` so audit consumers
    summing ``readmitted`` stay exact.
    """
    if store.quality_mode is None:
        raise ValueError(
            "readmit_quarantine: store has no quality config "
            "(quality_mode is None) — nothing to re-score against"
        )
    if acid.last_txn_version(store.quarantine, app_id) >= batch_id:
        return {"replay_skipped": True}
    with_bands = _has_table(store.bands)
    with_anchors = _has_table(store.anchors)
    with_ngrams = _has_table(store.ngrams)
    with_vectors = _has_table(store.vectors)
    band_params = (text_col, id_col) if with_bands else None
    anchor_params = (text_col, id_col) if with_anchors else None
    ngram_params = (text_col, id_col) if with_ngrams else None
    vector_params = (vec_col, id_col) if with_vectors else None
    for app in (ingest_app_id, app_id):
        _heal_chain(
            spark,
            store,
            app,
            band_params=band_params,
            anchor_params=anchor_params,
            ngram_params=ngram_params,
            vector_params=vector_params,
        )
    empty_result = {
        "rescored": 0,
        "readmitted": 0,
        "left_quarantine": 0,
        "still_quarantined": 0,
        "sem_rejected": 0,
        "readmitted_durable_in_prior_attempt": False,
    }
    if not _has_table(store.quarantine):
        return empty_result

    qrows = acid.read_atomic(spark, store.quarantine).drop("q_score")
    rescored = _quality_scores(store, qrows, text_col, id_col)
    floor = store.quality_floor()
    passing_ids = rescored.filter(F.col("q_score") >= F.lit(floor)).select(
        F.col(id_col)
    )
    passing = qrows.join(passing_ids, id_col, "left_semi").localCheckpoint(
        eager=True
    )
    n_passing = passing.count()
    n_total = qrows.count()

    if with_vectors:
        # Rows quarantined BEFORE the vector index existed carry no
        # embedding (missing column, or NULL after the quarantine's
        # schema widened).  A now-PASSING such row cannot be admitted
        # — there is nothing to assign, screen, or append to the
        # index — so refuse LOUDLY rather than silently hole it.
        # Still-failing embedding-less rows are harmless: they stay
        # quarantined.
        n_no_vec = (
            n_passing
            if vec_col not in passing.columns
            else passing.filter(F.col(vec_col).isNull()).count()
        )
        if n_no_vec:
            raise ValueError(
                f"readmit_quarantine: store has a vector index "
                f"({store.vectors}) but {n_no_vec} now-passing "
                f"quarantine row(s) carry no {vec_col!r} — rows "
                "quarantined before the index existed cannot be "
                "healed into vector rows; forget them or re-ingest "
                "their content through ingest_batch_vectors"
            )

    n_sem_rejected = 0
    durable_replay = False
    if acid.last_txn_version(store.corpus, app_id) < batch_id:
        # Normal path: exact screen against live hashes/bloom (the
        # content may have been admitted since), then the standard
        # commit chain.  Quarantine rows already carry content_hash;
        # in-quarantine same-content dups collapse first-id-wins.
        first = _first_per_hash(passing, id_col)
        definitely_new, _maybe, confirmed_new = _exact_new(spark, store, first)
        content_new = definitely_new.unionByName(confirmed_new).localCheckpoint(
            eager=True
        )
        if with_vectors:
            new_vrows, admitted, n_rej_hist, n_rej_batch = _semantic_screen(
                spark, store, content_new, vec_col, id_col, nprobe
            )
            n_sem_rejected = n_rej_hist + n_rej_batch
        else:
            new_vrows, admitted = None, content_new
        n_admitted = admitted.count()
        _commit_admitted(spark, store, admitted, batch_id, app_id)
        if with_bands:
            acid.atomic_overwrite_partitions(
                _band_rows(
                    admitted,
                    text_col,
                    id_col,
                    store.lsh_num_hashes,
                    store.lsh_bands,
                    store.lsh_shingle_k,
                ),
                store.bands,
                mode="append",
                txn_app=app_id,
                txn_version=batch_id,
            )
        if with_anchors:
            acid.atomic_overwrite_partitions(
                _anchor_rows(admitted, text_col, id_col, store.substring_k),
                store.anchors,
                mode="append",
                txn_app=app_id,
                txn_version=batch_id,
            )
        if with_ngrams:
            acid.atomic_overwrite_partitions(
                _ngram_rows(admitted, text_col, id_col),
                store.ngrams,
                mode="append",
                txn_app=app_id,
                txn_version=batch_id,
            )
        if with_vectors:
            acid.atomic_overwrite_partitions(
                new_vrows.join(
                    admitted.select(F.col(id_col).alias("__id")),
                    "__id",
                    "left_semi",
                ),
                store.vectors,
                mode="append",
                txn_app=app_id,
                txn_version=batch_id,
            )
    else:
        # Admission landed durably in a crashed prior attempt (the
        # heal above finished its downstream chain); report the
        # DURABLE count from the corpus commit instead of a
        # misleading 0 — audit consumers sum `readmitted`.  When
        # vacuum has since pruned the manifests the count needs, it is
        # unrecoverable: 0 with the durable flag set is the honest
        # remainder (the flag tells the consumer the sum is a floor).
        n_durable = _durable_commit_count(spark, store.corpus, app_id, batch_id)
        n_admitted = 0 if n_durable is None else n_durable
        durable_replay = True

    keep = acid.read_atomic(spark, store.quarantine).join(
        passing.select(id_col), id_col, "left_anti"
    )
    acid.atomic_overwrite_partitions(
        keep, store.quarantine, txn_app=app_id, txn_version=batch_id
    )
    return {
        "rescored": n_total,
        "readmitted": n_admitted,
        "left_quarantine": n_passing,
        "still_quarantined": n_total - n_passing,
        "sem_rejected": n_sem_rejected,
        "readmitted_durable_in_prior_attempt": durable_replay,
    }


def unhealed_floor(
    store: IngestStore, app_ids: tuple = ("ingest", READMIT_APP_ID)
) -> int | None:
    """Minimum corpus TABLE version that ``acid.vacuum`` must retain
    for every app chain to stay recoverable, or None when all chains
    are healed (no constraint).

    Healing replays the change feed of each un-healed corpus commit —
    a diff of that commit's manifest against its PREDECESSOR — so the
    floor is the predecessor version of the oldest un-healed commit
    (the commit's own version when it is the first).  Metadata-only:
    reads manifests, no Spark jobs.  Pass the result as
    ``acid.vacuum(..., min_retain_version=...)`` when vacuuming a
    store table directly; ``vacuum_store`` heals first and passes it
    automatically as belt and braces.
    """
    if not _has_table(store.corpus):
        return None
    tail = _chain_tail(
        store,
        _has_table(store.bands),
        _has_table(store.anchors),
        _has_table(store.ngrams),
        _has_table(store.vectors),
    )
    hist = sorted(acid.table_history(store.corpus), key=lambda h: h["version"])
    floor: int | None = None
    for app in app_ids:
        tail_v = acid.last_txn_version(tail, app)
        prev_version: int | None = None
        prev_cursor = -1
        for h in hist:
            cur = h["app_versions"].get(app, -1)
            if cur > prev_cursor and cur > tail_v:
                need = prev_version if prev_version is not None else h["version"]
                floor = need if floor is None else min(floor, need)
                break
            prev_cursor = max(prev_cursor, cur)
            prev_version = h["version"]
    return floor


def vacuum_store(
    spark: SparkSession,
    store: IngestStore,
    app_ids: tuple = ("ingest", READMIT_APP_ID),
    keep_versions: int = 2,
    grace_seconds: float = 86400.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> list[str]:
    """Maintenance vacuum over ALL of a store's tables that enforces
    the heal-before-vacuum ordering: chain healing recovers crashed
    commits from corpus change feeds (``_heal_chain``), which reads
    old corpus data files by manifest reference — pruning those files
    while a chain is un-healed would make the crash unrecoverable.
    Healing every ``app_ids`` chain FIRST means no un-healed cursor
    can exist when pruning starts, so any retention policy is safe.
    The default covers both APPEND-commit apps ('ingest' and
    'readmit'); 'forget' is deliberately absent — its commits are full
    overwrites whose crash recovery re-derives from LIVE state (the
    caller retries forget with the same batch_id), never from old
    change-feed files, so it imposes no retention floor and must NOT
    be change-feed-healed (replaying an overwrite's feed as appends
    would duplicate the kept rows downstream).

    Returns the list of removed paths across tables.
    """
    with_bands = _has_table(store.bands)
    with_anchors = _has_table(store.anchors)
    with_ngrams = _has_table(store.ngrams)
    with_vectors = _has_table(store.vectors)
    band_params = (text_col, id_col) if with_bands else None
    anchor_params = (text_col, id_col) if with_anchors else None
    ngram_params = (text_col, id_col) if with_ngrams else None
    vector_params = (vec_col, id_col) if with_vectors else None
    for app in app_ids:
        _heal_chain(
            spark,
            store,
            app,
            band_params=band_params,
            anchor_params=anchor_params,
            ngram_params=ngram_params,
            vector_params=vector_params,
        )
    # Post-heal the floor is None; passing it anyway makes the
    # invariant structural — if a heal ever fails silently (or a new
    # chain commits between heal and prune), the floor still protects
    # the manifests recovery needs.
    floor = unhealed_floor(store, app_ids)
    removed: list[str] = []
    tables = (
        [store.corpus, store.hashes, store.bloom]
        + ([store.bands] if with_bands else [])
        + ([store.anchors] if with_anchors else [])
        + ([store.ngrams] if with_ngrams else [])
        + ([store.vectors, store.centroids] if with_vectors else [])
        + ([store.quarantine] if _has_table(store.quarantine) else [])
        # derived PQ sidecar: plain acid tables, no heal constraint
        + ([store.pq_books] if _has_table(store.pq_books) else [])
        + ([store.pq_codes] if _has_table(store.pq_codes) else [])
    )
    for path in tables:
        if _has_table(path):
            removed += acid.vacuum(
                path,
                keep_versions=keep_versions,
                grace_seconds=grace_seconds,
                min_retain_version=floor if path == store.corpus else None,
            )
    return removed


def _pair_jaccard(df: DataFrame, a_text: str, b_text: str, shingle_k: int) -> DataFrame:
    """Adds ``__j`` = word-shingle Jaccard of two text columns.  The
    shingle arrays are materialized as columns FIRST — referencing
    them inline in intersect+union would re-tokenize each side twice
    per row (the higher-order-function re-evaluation trap)."""
    from tiki_e_commerce_analytics_etl_spark.operators.dedup import shingles

    return (
        df.withColumn("__sa", F.array_distinct(shingles(F.col(a_text), shingle_k)))
        .withColumn("__sb", F.array_distinct(shingles(F.col(b_text), shingle_k)))
        .withColumn(
            "__j",
            F.size(F.array_intersect("__sa", "__sb"))
            / F.size(F.array_union("__sa", "__sb")),
        )
    )


def _band_rows(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, bands: int, shingle_k: int
) -> DataFrame:
    from tiki_e_commerce_analytics_etl_spark.operators.dedup import minhash_band_rows

    return minhash_band_rows(df, text_col, id_col, num_hashes, bands, shingle_k)


def ingest_batch_neardup(
    spark: SparkSession,
    store: IngestStore,
    batch: DataFrame,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    app_id: str = "ingest",
) -> dict:
    """``ingest_batch`` extended with history-wide NEAR-duplicate
    rejection at index cost: a persistent MinHash band table (one
    ``bands`` rows per admitted doc) is the LSH index of everything
    ever admitted.  Per batch, after the exact content screen:

    1. band rows for the content-new docs (one vectorized Arrow stage);
    2. candidates = equi-join of those rows against the band index on
       (band, band_hash) — O(batch × bucket occupancy), NEVER a scan
       of corpus text; plus the in-batch bucket pairs;
    3. exact shingle-Jaccard rerank of the candidate sliver only (the
       corpus body is touched only for candidate old-ids — a point
       lookup join);
    4. rejected: any new doc with a verified history match, and the
       LARGER id of each verified in-batch pair (greedy —
       conservative: a doc whose only match was itself dropped is
       still dropped, the standard first-wins LSH-dedup compromise);
    5. survivors append to corpus/hashes/bloom AND their band rows to
       the index.

    Commit chain corpus → hashes → bloom → bands (→ anchors when the
    substring index exists on this store — variant mixing maintains
    it); whole-batch replay cursor on the LAST table; a partial crash
    after the corpus commit replays via the change-feed recovery (band
    and anchor rows are pure functions of the recovered rows, so the
    index commits are reconstructible).

    The LSH family (num_hashes / bands / shingle_k) and the Jaccard
    threshold come from the ``store`` — the persisted index is only
    probe-able with the family that built it.
    """
    num_hashes, bands, shingle_k = (
        store.lsh_num_hashes,
        store.lsh_bands,
        store.lsh_shingle_k,
    )
    jaccard_threshold = store.lsh_jaccard
    _require_no_vector_index(store, "ingest_batch_neardup")
    with_anchors = _has_table(store.anchors)
    with_ngrams = _has_table(store.ngrams)
    anchor_params = (text_col, id_col) if with_anchors else None
    ngram_params = (text_col, id_col) if with_ngrams else None
    tail = _chain_tail(store, True, with_anchors, with_ngrams)
    if acid.last_txn_version(tail, app_id) >= batch_id:
        return {"replay_skipped": True}
    healed = _heal_apps(
        spark,
        store,
        (app_id, READMIT_APP_ID),
        band_params=(text_col, id_col),
        anchor_params=anchor_params,
        ngram_params=ngram_params,
    )
    if acid.last_txn_version(store.corpus, app_id) >= batch_id:
        return {"recovered_replay": True, "healed_commits": healed}

    hashed = _hashed(batch, text_col, id_col)
    n_batch = hashed.count()
    first = _first_per_hash(hashed, id_col)
    definitely_new, maybe, confirmed_new = _exact_new(spark, store, first)
    content_new = definitely_new.unionByName(confirmed_new).localCheckpoint(eager=True)
    content_new, n_quarantined = _quality_split(
        spark, store, content_new, text_col, id_col, batch_id, app_id
    )

    new_bands = _band_rows(
        content_new, text_col, id_col, num_hashes, bands, shingle_k
    ).localCheckpoint(eager=True)
    texts_new = content_new.select(
        F.col(id_col).alias("__nid"), F.col(text_col).alias("__new_text")
    )

    # history candidates -> exact rerank on the sliver
    try:
        hist = acid.read_atomic(spark, store.bands)
    except FileNotFoundError:
        hist = None
    rejected_hist = content_new.select(F.col(id_col)).limit(0)
    n_rej_hist = 0
    if hist is not None:
        cand = (
            new_bands.join(
                hist.withColumnRenamed("__id", "__oid"), ["band", "band_hash"]
            )
            .select(F.col("__id").alias("__nid"), "__oid")
            .distinct()
        )
        old_texts = acid.read_atomic(spark, store.corpus).select(
            F.col(id_col).alias("__oid"), F.col(text_col).alias("__old_text")
        )
        verified = _pair_jaccard(
            cand.join(texts_new, "__nid").join(old_texts, "__oid"),
            "__new_text",
            "__old_text",
            shingle_k,
        ).filter(F.col("__j") >= jaccard_threshold)
        rejected_hist = verified.select(F.col("__nid").alias(id_col)).distinct()
        n_rej_hist = rejected_hist.count()

    # in-batch candidates: bucket pairs among the new rows only
    cand_b = (
        new_bands.alias("x")
        .join(new_bands.alias("y"), ["band", "band_hash"])
        .filter(F.col("x.__id") < F.col("y.__id"))
        .select(F.col("x.__id").alias("__ida"), F.col("y.__id").alias("__idb"))
        .distinct()
    )
    verified_b = _pair_jaccard(
        cand_b.join(texts_new.withColumnRenamed("__nid", "__ida").withColumnRenamed("__new_text", "__ta"), "__ida")
        .join(texts_new.withColumnRenamed("__nid", "__idb").withColumnRenamed("__new_text", "__tb"), "__idb"),
        "__ta",
        "__tb",
        shingle_k,
    ).filter(F.col("__j") >= jaccard_threshold)
    rejected_batch = verified_b.select(F.col("__idb").alias(id_col)).distinct()
    n_rej_batch = rejected_batch.count()

    rejected = rejected_hist.unionByName(rejected_batch).distinct()
    admitted = content_new.join(rejected, id_col, "left_anti").localCheckpoint(eager=True)

    n_first = first.count()
    n_content_new = content_new.count()
    n_admitted = admitted.count()

    _commit_admitted(spark, store, admitted, batch_id, app_id)
    acid.atomic_overwrite_partitions(
        new_bands.join(
            admitted.select(F.col(id_col).alias("__id")), "__id", "left_semi"
        ),
        store.bands,
        mode="append",
        txn_app=app_id,
        txn_version=batch_id,
    )
    if with_anchors:
        acid.atomic_overwrite_partitions(
            _anchor_rows(admitted, text_col, id_col, store.substring_k),
            store.anchors,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    if with_ngrams:
        acid.atomic_overwrite_partitions(
            _ngram_rows(admitted, text_col, id_col),
            store.ngrams,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    return {
        "batch": n_batch,
        "in_batch_dups": n_batch - n_first,
        "content_new": n_content_new,
        "near_dup_rejected_history": n_rej_hist,
        "near_dup_rejected_in_batch": n_rej_batch,
        "admitted": n_admitted,
        "quarantined": n_quarantined,
    }


def ingest_batch_substring(
    spark: SparkSession,
    store: IngestStore,
    batch: DataFrame,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    app_id: str = "ingest",
) -> dict:
    """``ingest_batch`` extended with INCREMENTAL exact-substring
    dedup (Lee et al. 2022) at index cost: a persistent window-anchor
    table (``anchors`` — one (id, off, xxhash64) row per sliding
    ``store.substring_k``-word window of every admitted doc) is the
    substring index of everything ever admitted.  Per batch, after
    the exact content screen:

    1. anchor rows for the content-new docs (the
       ``dedup.window_anchors`` front-end, computed ONCE — probe,
       in-batch pairs, and the index commit all read the same
       checkpoint);
    2. history candidates = equi-join of those anchors against the
       INDEX on the 64-bit hash — O(batch anchors × bucket occupancy),
       NEVER a re-anchoring of history text;
    3. slice verification touches only candidate partner docs (a
       point-lookup semi-join into ``corpus`` for the old sides —
       the only corpus-body access, proportional to candidates);
    4. in-batch candidates from the batch-anchor self-join;
    5. verified matches from both sources score through the SAME
       ``dedup._pair_scores`` as the one-shot operator, so
       batch-incremental pair output ≡ ``exact_substring_pairs`` on
       the union by construction (pytest-proven);
    6. the batch's docs append to corpus/hashes/bloom and their
       anchors to the index.

    This variant DETECTS (it returns the batch's new duplicate-span
    pairs under ``pairs_df`` — id_a < id_b, shared_windows,
    max_run_words — for the caller's curation policy); admission
    itself stays exact-content dedup, matching Lee et al.'s
    span-level framing where removal is a separate pass.

    Commit chain corpus → hashes → bloom (→ bands when the near-dup
    index exists — variant mixing maintains it) → anchors; whole-batch
    replay cursor on the LAST table (anchors); a partial crash after
    the corpus commit replays via the change-feed recovery (anchor
    rows are a pure function of the recovered rows).  Replayed
    batches return no pairs_df — pair detection belongs to the first
    successful pass; ``substring_pairs_from_index`` recomputes any
    pair set from the healed index.
    """
    from tiki_e_commerce_analytics_etl_spark.operators import dedup as dedup_ops

    k = store.substring_k
    _require_no_vector_index(store, "ingest_batch_substring")
    with_bands = _has_table(store.bands)
    with_ngrams = _has_table(store.ngrams)
    band_params = (text_col, id_col) if with_bands else None
    ngram_params = (text_col, id_col) if with_ngrams else None
    tail = store.ngrams if with_ngrams else store.anchors
    if acid.last_txn_version(tail, app_id) >= batch_id:
        return {"replay_skipped": True}
    healed = _heal_apps(
        spark,
        store,
        (app_id, READMIT_APP_ID),
        band_params=band_params,
        anchor_params=(text_col, id_col),
        ngram_params=ngram_params,
    )
    if acid.last_txn_version(store.corpus, app_id) >= batch_id:
        return {"recovered_replay": True, "healed_commits": healed}

    hashed = _hashed(batch, text_col, id_col)
    n_batch = hashed.count()
    first = _first_per_hash(hashed, id_col)
    definitely_new, maybe, confirmed_new = _exact_new(spark, store, first)
    admitted = definitely_new.unionByName(confirmed_new).localCheckpoint(eager=True)
    admitted, n_quarantined = _quality_split(
        spark, store, admitted, text_col, id_col, batch_id, app_id
    )

    tok_new, wins_new = dedup_ops.window_anchors(admitted, text_col, id_col, k)
    wins_new = wins_new.localCheckpoint(eager=True)

    # history candidates: batch anchors probe the persisted index —
    # id order decides (a, b) so scoring matches the one-shot operator
    try:
        hist = acid.read_atomic(spark, store.anchors)
    except FileNotFoundError:
        hist = None
    verified_parts = []
    tok_frames = [tok_new]
    if hist is not None:
        cand_h = wins_new.select(
            F.col("__id").alias("__nid"), F.col("__off").alias("__noff"), "__h"
        ).join(
            hist.select(
                F.col("__id").alias("__oid"), F.col("__off").alias("__ooff"), "__h"
            ),
            "__h",
        )
        new_first = F.col("__nid") < F.col("__oid")
        cand_h = cand_h.where(F.col("__nid") != F.col("__oid")).select(
            F.least("__nid", "__oid").alias("id_a"),
            F.greatest("__nid", "__oid").alias("id_b"),
            F.when(new_first, F.col("__noff")).otherwise(F.col("__ooff")).alias("off_a"),
            F.when(new_first, F.col("__ooff")).otherwise(F.col("__noff")).alias("off_b"),
            "__h",
        )
        old_ids = cand_h.select(F.col("id_a").alias(id_col)).unionByName(
            cand_h.select(F.col("id_b").alias(id_col))
        ).distinct()
        old_docs = (
            acid.read_atomic(spark, store.corpus)
            .join(old_ids, id_col, "left_semi")
            .select(id_col, text_col)
        )
        tok_old, _ = dedup_ops.window_anchors(old_docs, text_col, id_col, k)
        tok_frames.append(tok_old)
        verified_parts.append(cand_h)

    # in-batch candidates: the batch-anchor self-join
    cand_b = (
        wins_new.select(
            F.col("__id").alias("id_a"), F.col("__off").alias("off_a"), "__h"
        )
        .join(
            wins_new.select(
                F.col("__id").alias("id_b"), F.col("__off").alias("off_b"), "__h"
            ),
            "__h",
        )
        .where(F.col("id_a") < F.col("id_b"))
    )
    verified_parts.append(cand_b)

    # the old-side tokens only hold candidate ids, so dropDuplicates
    # keeps the relation minimal when a doc is both batch- and
    # candidate-side (cannot happen with unique ids, but cheap safety)
    toks = tok_frames[0]
    for extra in tok_frames[1:]:
        toks = toks.unionByName(extra)
    toks = toks.dropDuplicates(["__id"])
    ta = toks.select(F.col("__id").alias("id_a"), F.col("__w").alias("__wa"))
    tb = toks.select(F.col("__id").alias("id_b"), F.col("__w").alias("__wb"))
    cand_all = verified_parts[0]
    for extra in verified_parts[1:]:
        cand_all = cand_all.unionByName(extra)
    verified = dedup_ops._verify_window_candidates(cand_all, ta, tb, k)
    pairs = dedup_ops._pair_scores(verified, k).localCheckpoint(eager=True)

    n_first = first.count()
    n_maybe = maybe.count()
    n_admitted = admitted.count()
    n_pairs = pairs.count()

    _commit_admitted(spark, store, admitted, batch_id, app_id)
    if with_bands:
        acid.atomic_overwrite_partitions(
            _band_rows(
                admitted,
                text_col,
                id_col,
                store.lsh_num_hashes,
                store.lsh_bands,
                store.lsh_shingle_k,
            ),
            store.bands,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    acid.atomic_overwrite_partitions(
        wins_new.select("__id", "__off", "__h"),
        store.anchors,
        mode="append",
        txn_app=app_id,
        txn_version=batch_id,
    )
    if with_ngrams:
        acid.atomic_overwrite_partitions(
            _ngram_rows(admitted, text_col, id_col),
            store.ngrams,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    return {
        "batch": n_batch,
        "in_batch_dups": n_batch - n_first,
        "definitely_new": n_first - n_maybe,
        "maybe_seen": n_maybe,
        "admitted": n_admitted,
        "quarantined": n_quarantined,
        "substring_pairs": n_pairs,
        "pairs_df": pairs,
    }


def substring_pairs_from_index(
    spark: SparkSession,
    store: IngestStore,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The store's FULL exact-substring pair set computed from the
    persisted anchor index: candidates from the index self-join on
    the 64-bit anchor hash, slice verification against only the
    candidate docs' corpus text (a point-lookup semi-join — the
    tokenize→hash→explode of the whole corpus is exactly what the
    index already paid for), scored through the same
    ``dedup._pair_scores`` as the one-shot operator.  ≡
    ``exact_substring_pairs(corpus, min_words=store.substring_k)``
    by construction (pytest-proven), at O(candidates) cost per call
    instead of O(corpus words)."""
    from tiki_e_commerce_analytics_etl_spark.operators import dedup as dedup_ops

    k = store.substring_k
    anchors = acid.read_atomic(spark, store.anchors)
    cand = (
        anchors.select(
            F.col("__id").alias("id_a"), F.col("__off").alias("off_a"), "__h"
        )
        .join(
            anchors.select(
                F.col("__id").alias("id_b"), F.col("__off").alias("off_b"), "__h"
            ),
            "__h",
        )
        .where(F.col("id_a") < F.col("id_b"))
    )
    cids = cand.select(F.col("id_a").alias(id_col)).unionByName(
        cand.select(F.col("id_b").alias(id_col))
    ).distinct()
    docs = (
        acid.read_atomic(spark, store.corpus)
        .join(cids, id_col, "left_semi")
        .select(id_col, text_col)
    )
    toks, _ = dedup_ops.window_anchors(docs, text_col, id_col, k)
    ta = toks.select(F.col("__id").alias("id_a"), F.col("__w").alias("__wa"))
    tb = toks.select(F.col("__id").alias("id_b"), F.col("__w").alias("__wb"))
    verified = dedup_ops._verify_window_candidates(cand, ta, tb, k)
    return dedup_ops._pair_scores(verified, k)


def ingest_batch_lm(
    spark: SparkSession,
    store: IngestStore,
    batch: DataFrame,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    app_id: str = "ingest",
) -> dict:
    """``ingest_batch`` extended with an INCREMENTAL language-model
    count index: per-document bigram counts (``ngrams`` — (__id, w1,
    w2, tf), the LAST chain table: corpus → hashes → bloom [→ bands]
    [→ anchors] → ngrams) persist with each admitted batch, so the
    corpus LM refreshes at batch cost — ``kn_lm_from_chain`` folds the
    count rows into the SAME Kneser-Ney model the one-shot
    ``text.kn_bigram_lm`` trains (shared ``kn_bigram_lm_from_counts``
    back half, so batch-incremental ≡ one-shot by construction;
    pytest-proven), and a CCNet-style perplexity screen of the NEXT
    batch can score against the current corpus model without ever
    re-reading history text.

    Counts are a monoid, so incrementality is exact — no recall trade
    anywhere: heal reconstructs a crashed batch's rows from the corpus
    change feed (`_ngram_rows` is a pure function of admitted rows),
    ``forget`` subtracts exactly the forgotten documents' rows (the
    table is doc-keyed for this reason), and replayed batches are
    whole-batch no-ops off the ngrams cursor.
    """
    _require_no_vector_index(store, "ingest_batch_lm")
    with_bands = _has_table(store.bands)
    with_anchors = _has_table(store.anchors)
    band_params = (text_col, id_col) if with_bands else None
    anchor_params = (text_col, id_col) if with_anchors else None
    if acid.last_txn_version(store.ngrams, app_id) >= batch_id:
        return {"replay_skipped": True}
    healed = _heal_apps(
        spark,
        store,
        (app_id, READMIT_APP_ID),
        band_params=band_params,
        anchor_params=anchor_params,
        ngram_params=(text_col, id_col),
    )
    if acid.last_txn_version(store.corpus, app_id) >= batch_id:
        return {"recovered_replay": True, "healed_commits": healed}

    hashed = _hashed(batch, text_col, id_col)
    n_batch = hashed.count()
    first = _first_per_hash(hashed, id_col)
    definitely_new, maybe, confirmed_new = _exact_new(spark, store, first)
    admitted = definitely_new.unionByName(confirmed_new).localCheckpoint(eager=True)
    admitted, n_quarantined = _quality_split(
        spark, store, admitted, text_col, id_col, batch_id, app_id
    )
    n_first = first.count()
    n_maybe = maybe.count()
    n_admitted = admitted.count()

    _commit_admitted(spark, store, admitted, batch_id, app_id)
    if with_bands:
        acid.atomic_overwrite_partitions(
            _band_rows(
                admitted,
                text_col,
                id_col,
                store.lsh_num_hashes,
                store.lsh_bands,
                store.lsh_shingle_k,
            ),
            store.bands,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    if with_anchors:
        acid.atomic_overwrite_partitions(
            _anchor_rows(admitted, text_col, id_col, store.substring_k),
            store.anchors,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    acid.atomic_overwrite_partitions(
        _ngram_rows(admitted, text_col, id_col),
        store.ngrams,
        mode="append",
        txn_app=app_id,
        txn_version=batch_id,
    )
    return {
        "batch": n_batch,
        "in_batch_dups": n_batch - n_first,
        "definitely_new": n_first - n_maybe,
        "maybe_seen": n_maybe,
        "admitted": n_admitted,
        "quarantined": n_quarantined,
    }


def kn_lm_from_chain(spark: SparkSession, store: IngestStore) -> DataFrame:
    """The CURRENT corpus Kneser-Ney bigram LM from the persisted
    count index: fold the doc-keyed rows to (w1, w2, cbg) — counts are
    a monoid, so the fold over any batch partitioning equals the
    one-shot count — and build the model through the SAME
    ``text.kn_bigram_lm_from_counts`` back half as the one-shot
    trainer.  O(index rows), never touches corpus text."""
    from tiki_e_commerce_analytics_etl_spark.operators.text import (
        kn_bigram_lm_from_counts,
    )

    rows = acid.read_atomic(spark, store.ngrams)
    cbg = rows.groupBy("w1", "w2").agg(F.sum("tf").alias("cbg"))
    return kn_bigram_lm_from_counts(cbg)


def ingest_batch_vectors(
    spark: SparkSession,
    store: IngestStore,
    batch: DataFrame,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    app_id: str = "ingest",
    nprobe: int = 1,
) -> dict:
    """``ingest_batch`` extended with history-wide SEMANTIC (embedding
    cosine) near-duplicate rejection at index cost — the incremental
    face of SemDeDup: a persistent IVF vector table (``vectors`` —
    one (id, cluster, vec) row per admitted doc, clustered against a
    FIXED centroid basis) is the ANN index of everything ever
    admitted.  Per batch, after the exact content screen:

    1. centroid bootstrap (first vector batch only): exact
       integer-Lloyd k-means over the batch, committed to
       ``centroids`` BEFORE the corpus commit — deterministic, so a
       crash between the two replays to identical centroids;
    2. cluster assignment of the content-new docs (narrow projection
       against the bounded centroid literal — no join, no shuffle);
    3. history candidates = equi-join on ``cluster`` against the
       vector index — O(batch × nprobe × cell occupancy), NEVER a
       corpus scan; recall trade: a near-dup pair straddling a cell
       boundary is missed at the default ``nprobe=1`` (the standard
       IVF compromise, same class as the band index's LSH recall) —
       raising ``nprobe`` fans the NEW side out to its n nearest
       cells for candidate generation only (index rows stay one per
       vector), the multi-probe recall lever.  The ADMISSION screen
       keeps ``nprobe=1`` by default because its in-batch candidate
       self-join fans out on BOTH sides: the round-11 ladder
       (SCALING.md, 10× corpus, 16 cells) measured batch cost
       18 → 29 → 63 → 124 s at nprobe 1/2/4/8 while the catch rate
       saturated (1674/1935/1998/2006 rejected) — nprobe=2 buys
       +15.6% caught dups for 1.6× batch wall, the knee if recall
       matters more than admission latency;
    4. exact cosine rerank of the candidate sliver only; reject new
       docs with a verified history match at ``store.sem_threshold``,
       and the LARGER id of each verified in-batch same-cell pair;
    5. survivors append to corpus/hashes/bloom AND their vector rows
       to the index.

    Commit chain corpus → hashes → bloom (→ bands/anchors/ngrams when
    those indexes exist — variant mixing maintains them) → vectors;
    whole-batch replay cursor on the LAST table; a partial crash after
    the corpus commit replays via the change-feed recovery (vector
    rows are a pure function of the recovered rows plus the persisted
    centroid basis, which always commits first).

    CONTRACT: once a store has a vector index, every batch must carry
    ``vec_col`` and go through THIS entry point (or ``forget``) — a
    text-only corpus commit could not be healed into vector rows, the
    same way the band index is only probe-able with the LSH family
    that built it.
    """
    from tiki_e_commerce_analytics_etl_spark.operators import clustering

    with_bands = _has_table(store.bands)
    with_anchors = _has_table(store.anchors)
    with_ngrams = _has_table(store.ngrams)
    band_params = (text_col, id_col) if with_bands else None
    anchor_params = (text_col, id_col) if with_anchors else None
    ngram_params = (text_col, id_col) if with_ngrams else None
    tail = _chain_tail(store, with_bands, with_anchors, with_ngrams, True)
    if acid.last_txn_version(tail, app_id) >= batch_id:
        return {"replay_skipped": True}
    healed = _heal_apps(
        spark,
        store,
        (app_id, READMIT_APP_ID),
        band_params=band_params,
        anchor_params=anchor_params,
        ngram_params=ngram_params,
        vector_params=(vec_col, id_col) if _has_table(store.centroids) else None,
    )
    if acid.last_txn_version(store.corpus, app_id) >= batch_id:
        return {"recovered_replay": True, "healed_commits": healed}

    hashed = _hashed(batch, text_col, id_col)
    n_batch = hashed.count()
    first = _first_per_hash(hashed, id_col)
    definitely_new, maybe, confirmed_new = _exact_new(spark, store, first)
    content_new = definitely_new.unionByName(confirmed_new).localCheckpoint(eager=True)
    content_new, n_quarantined = _quality_split(
        spark, store, content_new, text_col, id_col, batch_id, app_id
    )
    n_content_new = content_new.count()

    # Centroid bootstrap precedes every other commit: the basis must
    # exist before any corpus commit whose heal needs it.
    if not _has_table(store.centroids) and n_content_new > 0:
        k = min(store.ivf_clusters, n_content_new)
        cents, _ = clustering.kmeans_lloyd(
            content_new, k, store.ivf_iters, id_col, vec_col
        )
        acid.atomic_overwrite_partitions(
            clustering.centroid_rows(spark, cents),
            store.centroids,
            txn_app=app_id,
            txn_version=batch_id,
        )

    new_vrows, admitted, n_rej_hist, n_rej_batch = _semantic_screen(
        spark, store, content_new, vec_col, id_col, nprobe
    )
    n_admitted = admitted.count()

    _commit_admitted(spark, store, admitted, batch_id, app_id)
    if with_bands:
        acid.atomic_overwrite_partitions(
            _band_rows(
                admitted,
                text_col,
                id_col,
                store.lsh_num_hashes,
                store.lsh_bands,
                store.lsh_shingle_k,
            ),
            store.bands,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    if with_anchors:
        acid.atomic_overwrite_partitions(
            _anchor_rows(admitted, text_col, id_col, store.substring_k),
            store.anchors,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    if with_ngrams:
        acid.atomic_overwrite_partitions(
            _ngram_rows(admitted, text_col, id_col),
            store.ngrams,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    # Only materialize the vectors table once a centroid basis exists:
    # a first batch with zero content-new rows must NOT create an
    # empty index (it would block text variants via
    # _require_no_vector_index and break _stored_centroids) — the next
    # non-empty batch bootstraps normally instead.
    if _has_table(store.centroids):
        acid.atomic_overwrite_partitions(
            new_vrows.join(
                admitted.select(F.col(id_col).alias("__id")), "__id", "left_semi"
            ),
            store.vectors,
            mode="append",
            txn_app=app_id,
            txn_version=batch_id,
        )
    return {
        "batch": n_batch,
        "in_batch_dups": n_batch - first.count(),
        "content_new": n_content_new,
        "sem_rejected_history": n_rej_hist,
        "sem_rejected_in_batch": n_rej_batch,
        "admitted": n_admitted,
        "quarantined": n_quarantined,
    }


def bootstrap_vector_index(
    spark: SparkSession,
    store: IngestStore,
    corpus: DataFrame,
    batch_id: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    app_id: str = "ingest",
) -> dict:
    """BULK-seed a fresh store's vector index from an ALREADY-CURATED
    corpus — the initial-load path ``ingest_batch_vectors`` is not:
    that entry point runs the semantic screen (an in-cell candidate
    self-join) over the whole input, which is the right admission
    screen for a BATCH but quadratic-per-cell waste for a 100 TB
    initial corpus that was already deduplicated offline (measured:
    seeding 475k synthetic docs through the batch path extrapolates
    to hours; this path is one k-means + two narrow passes).

    Semantics: exact content dedup only (first-id-wins in-batch, no
    history — the store must be EMPTY); NO semantic rejection — every
    content-distinct doc is admitted and indexed.  Centroids come
    from the same integer-Lloyd bootstrap, committed first; then the
    standard corpus → hashes → bloom → vectors chain, all under one
    (app_id, batch_id) txn, so subsequent ``ingest_batch_vectors``
    batches replay/heal/forget exactly as if the seed had been
    ingested batch-wise.

    Sizing note (the 100 TB knob): set ``store.ivf_clusters`` ∝ √N
    for the seed corpus (FAISS guidance) — cell occupancy and batch
    screening cost are N/cells, so a fixed small cell count makes
    every later batch's candidate join linear in corpus size instead
    of N/√N.

    The store's quality policy (when configured) applies to bulk
    seeds too — failures land in quarantine exactly as on the batch
    path.  Exactly-once per (app_id, batch_id); returns
    {'seeded', 'in_batch_dups', 'quarantined'}.
    """
    from tiki_e_commerce_analytics_etl_spark.operators import clustering

    if acid.last_txn_version(store.vectors, app_id) >= batch_id:
        return {"replay_skipped": True}
    if acid.last_txn_version(store.corpus, app_id) >= batch_id:
        # crash landed the corpus commit but not the rest: finish the
        # chain from the change feed (centroids always commit first,
        # so the vector heal has its basis)
        healed = _heal_chain(
            spark, store, app_id, vector_params=(vec_col, id_col)
        )
        return {"recovered_replay": True, "healed_commits": healed}
    if _has_table(store.corpus) or _has_table(store.vectors):
        raise ValueError(
            "bootstrap_vector_index requires an EMPTY store: it performs "
            "no history screening — seed first, then ingest batches "
            "through ingest_batch_vectors"
        )

    hashed = _hashed(corpus, text_col, id_col)
    n_batch = hashed.count()
    first = _first_per_hash(hashed, id_col).localCheckpoint(eager=True)
    n_dups = n_batch - first.count()
    # the store's quality policy applies to bulk seeds too (quarantine
    # commits first, exactly like the batch entry points)
    first, n_quarantined = _quality_split(
        spark, store, first, text_col, id_col, batch_id, app_id
    )
    n_first = first.count()
    if n_first == 0:
        return {"seeded": 0, "in_batch_dups": n_dups, "quarantined": n_quarantined}

    k = min(store.ivf_clusters, n_first)
    cents, _ = clustering.kmeans_lloyd(first, k, store.ivf_iters, id_col, vec_col)
    acid.atomic_overwrite_partitions(
        clustering.centroid_rows(spark, cents),
        store.centroids,
        txn_app=app_id,
        txn_version=batch_id,
    )
    _commit_admitted(spark, store, first, batch_id, app_id)
    acid.atomic_overwrite_partitions(
        _vector_rows(spark, store, first, vec_col, id_col),
        store.vectors,
        mode="append",
        txn_app=app_id,
        txn_version=batch_id,
    )
    return {
        "seeded": n_first,
        "in_batch_dups": n_dups,
        "quarantined": n_quarantined,
    }


def vector_index_topk(
    spark: SparkSession,
    store: IngestStore,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
    route: str = "exact",
    refine: int = 8,
) -> DataFrame:
    """ANN query against the INCREMENTAL vector index — the payoff of
    maintaining it: (query_id, neighbor_id, score, rank) by exact
    cosine over only the ``nprobe`` nearest index cells per query,
    without re-clustering history.  Candidates come from an equi-join
    on the cell id (never a corpus scan); the centroid basis is the
    bounded persisted table.  Recall trade is the IVF one, measured
    for the one-shot twin in GATE_MARGINS (ivf_recall).

    The ``nprobe=2`` default is pinned from the round-11 measured
    ladder (SCALING.md / nprobe_ladder.json — 10× corpus, 16 cells,
    recall@10 vs exact): nprobe 1 → 0.68, 2 → 0.88, 4 → 0.99,
    8 → 1.00 at FLAT warm wall (1.6-1.9 s — the query is
    scan-dominated; candidate growth disappears into idle cores at
    this scale).  Asymptotically candidates grow ∝ nprobe/n_cells of
    the corpus, so 2 is the knee choice; raise to ~n_cells/4 when the
    caller needs ≥0.99.

    ``route``:

    * ``"exact"`` (default) — probed cells scanned as full vectors
      (the plan above); right while the probed slice fits scan
      bandwidth.
    * ``"pq"`` — probed cells scanned as PQ codes from the
      ``build_vector_pq_sidecar`` tables (ADC lookup-table scoring,
      exact-cosine rerank of the top ``refine``·k sliver — the IVFADC
      store-serving shape: ~code bytes instead of dim doubles per
      scanned row).  REFUSES loudly when the sidecar is missing or
      stale (pinned to an older vectors-table version) — serving a
      stale sidecar would silently miss newer docs and resurrect
      forgotten ones.
    * ``"auto"`` — ``pq`` when a fresh sidecar exists, else exact.
    """
    from tiki_e_commerce_analytics_etl_spark.operators.similarity import cosine

    if route not in ("exact", "pq", "auto"):
        raise ValueError(f"route must be exact|pq|auto, got {route!r}")
    if route == "auto":
        route = "pq" if _pq_sidecar_fresh(store) else "exact"
    if route == "pq":
        return _vector_index_topk_pq(
            spark, store, queries, k, id_col, vec_col, nprobe, refine
        )
    cents = _stored_centroids(spark, store)
    probe = _probe_cells(queries, cents, id_col, vec_col, nprobe).select(
        F.col("id").alias("query_id"), "cluster"
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__qv"),
    )
    hist = acid.read_atomic(spark, store.vectors).select(
        F.col("__id").alias("neighbor_id"), "cluster", F.col("__vec").alias("__ov")
    )
    scored = (
        probe.join(hist, "cluster")
        .join(qvecs, "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__ov")).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


_PQ_SIDECAR_APP = "pq_sidecar"


def _pq_sidecar_fresh(store: IngestStore) -> bool:
    """True when the PQ sidecar exists AND is pinned to the vectors
    table's CURRENT version.  Any vectors commit (ingest batch,
    readmit, forget rewrite, compaction) bumps the version and makes
    the sidecar stale — staleness is the version mismatch itself, no
    separate bookkeeping to corrupt.  The cursor lives on the CODES
    table because it commits LAST (a crash between books and codes
    leaves the sidecar stale, and the rebuild's idempotent per-table
    commits finish it)."""
    if not _has_table(store.vectors) or not _has_table(store.pq_codes):
        return False
    v = acid.latest_version(store.vectors)
    return acid.last_txn_version(store.pq_codes, _PQ_SIDECAR_APP) == v


def build_vector_pq_sidecar(
    spark: SparkSession,
    store: IngestStore,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 5,
    sample_size: int = 4096,
    seed: int = 42,
) -> dict:
    """Materialize the IVFADC serving sidecar for the incremental
    vector index: per-subspace PQ codebooks trained on the RESIDUALS
    of the stored vectors against their assigned cells (the persisted
    integer centroid basis scaled back to doubles), plus one
    (__id, cluster, codes, __norm) row per index row — the compressed
    scan set ``vector_index_topk(route="pq")`` reads inside probed
    cells.  Same training contract as ``similarity.train_ivfpq``:
    bounded hash-ordered sample, deterministic inits and ties.

    DERIVED DATA, not chain state: the sidecar is a pure function of
    the vectors table at one version and is rebuildable at any time,
    so it takes no part in heal/replay — both tables commit under
    (``pq_sidecar``, <vectors version>), books first, codes last (the
    freshness cursor).  After ANY vectors commit the sidecar is stale
    and the pq route refuses until this is re-run — the maintenance
    task that compacts the store is the natural place.  ``forget``
    deletes the sidecar outright (its codes are content-derived data
    of possibly-forgotten docs; a stale cache is not an acceptable
    place for them to linger).

    Returns {'rows', 'vectors_version', 'rebuilt'}.
    """
    import numpy as np
    import pandas as pd

    from tiki_e_commerce_analytics_etl_spark.operators.clustering import (
        KMEANS_SCALE,
    )

    if not _has_table(store.vectors):
        raise ValueError(
            f"build_vector_pq_sidecar: no vector index at {store.vectors}"
        )
    v = acid.latest_version(store.vectors)
    if acid.last_txn_version(store.pq_codes, _PQ_SIDECAR_APP) >= v:
        return {"rebuilt": False, "vectors_version": v, "rows": 0}

    cents = _stored_centroids(spark, store)
    C = np.asarray(cents, dtype=np.float64) / float(KMEANS_SCALE)
    dim = C.shape[1]
    if dim % m:
        raise ValueError(f"embedding dim {dim} not divisible by m={m}")
    sub = dim // m

    vrows = acid.read_atomic(spark, store.vectors)
    sample = (
        vrows.select(
            "cluster",
            F.col("__vec").alias("v"),
            F.xxhash64(F.col("__id"), F.lit(seed)).alias("h"),
        )
        .orderBy("h")
        .limit(sample_size)
        .collect()
    )
    if len(sample) < n_codes:
        raise ValueError(
            f"PQ sidecar training needs >= n_codes ({n_codes}) index "
            f"rows, got {len(sample)}"
        )
    X = np.stack([np.asarray(r["v"], dtype=np.float64) for r in sample])
    R = X - C[[r["cluster"] for r in sample]]
    books = np.empty((m, n_codes, sub), dtype=np.float64)
    for j in range(m):
        Rj = R[:, j * sub : (j + 1) * sub]
        B = Rj[:n_codes].copy()
        for _ in range(iters):
            d2 = -2.0 * (Rj @ B.T) + (B * B).sum(axis=1)[None, :]
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = Rj[assign == c]
                if len(members):
                    B[c] = members.mean(axis=0)
        books[j] = B

    book_rows = spark.createDataFrame(
        [
            (j, c, p, float(books[j, c, p]))
            for j in range(m)
            for c in range(n_codes)
            for p in range(sub)
        ],
        "j int, c int, pos int, val double",
    )
    acid.atomic_overwrite_partitions(
        book_rows, store.pq_books, txn_app=_PQ_SIDECAR_APP, txn_version=v
    )

    Bt = [books[j].T for j in range(m)]
    b2 = [(books[j] * books[j]).sum(axis=1) for j in range(m)]

    def encode(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["__vec"]])
            Rr = V - C[pdf["cluster"].to_numpy()]
            codes = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                Rj = Rr[:, j * sub : (j + 1) * sub]
                codes[:, j] = (-2.0 * (Rj @ Bt[j]) + b2[j][None, :]).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"].to_numpy(),
                    "cluster": pdf["cluster"].to_numpy(),
                    "codes": list(codes),
                    "__norm": np.sqrt((V * V).sum(axis=1)),
                }
            )

    id_type = vrows.schema["__id"].dataType.simpleString()
    enc = vrows.select("__id", "cluster", "__vec").mapInPandas(
        encode,
        f"__id {id_type}, cluster int, codes array<int>, __norm double",
    ).localCheckpoint(eager=True)
    n_rows = enc.count()
    acid.atomic_overwrite_partitions(
        enc, store.pq_codes, txn_app=_PQ_SIDECAR_APP, txn_version=v
    )
    return {"rebuilt": True, "vectors_version": v, "rows": n_rows}


def _vector_index_topk_pq(
    spark: SparkSession,
    store: IngestStore,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    nprobe: int,
    refine: int,
) -> DataFrame:
    """The pq route of ``vector_index_topk``: ADC scan of the probed
    cells' code rows (offset ⟨q, C[cell]⟩ + residual-LUT sum,
    normalized by the stored true norm), top ``refine``·k per query,
    exact-cosine rerank against the TRUE vectors (identical score
    expression to the exact route, so probe-all + total-refine ⇒ the
    two routes agree bit-for-bit — tested law)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    from tiki_e_commerce_analytics_etl_spark.operators.clustering import (
        KMEANS_SCALE,
    )
    from tiki_e_commerce_analytics_etl_spark.operators.similarity import cosine

    if not _pq_sidecar_fresh(store):
        raise ValueError(
            f"vector_index_topk(route='pq'): PQ sidecar at "
            f"{store.pq_codes} is missing or stale vs the vectors "
            "table — run build_vector_pq_sidecar(spark, store) after "
            "the last ingest/forget/compaction (a stale sidecar would "
            "silently miss newer docs and resurrect forgotten ones)"
        )
    cents = _stored_centroids(spark, store)
    C = np.asarray(cents, dtype=np.float64) / float(KMEANS_SCALE)
    brows = acid.read_atomic(spark, store.pq_books).collect()
    mm_ = max(r["j"] for r in brows) + 1
    n_codes = max(r["c"] for r in brows) + 1
    sub = max(r["pos"] for r in brows) + 1
    books = np.empty((mm_, n_codes, sub), dtype=np.float64)
    for r in brows:
        books[r["j"], r["c"], r["pos"]] = r["val"]

    probe = _probe_cells(queries, cents, id_col, vec_col, nprobe).select(
        F.col("id").alias("query_id"), "cluster"
    )

    def qluts(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            luts = np.empty((n, mm_ * n_codes), dtype=np.float64)
            for j in range(mm_):
                Qj = V[:, j * sub : (j + 1) * sub]
                luts[:, j * n_codes : (j + 1) * n_codes] = Qj @ books[j].T
            yield pd.DataFrame(
                {
                    "query_id": pdf["id"].to_numpy(),
                    "__lut": list(luts),
                    "__offs": list(V @ C.T),
                    "__qv": [x for x in V],
                }
            )

    qid_type = queries.schema[id_col].dataType.simpleString()
    ql = queries.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).mapInPandas(
        qluts,
        f"query_id {qid_type}, __lut array<double>, __offs array<double>, "
        "__qv array<double>",
    )

    contrib = F.transform(
        F.col("codes"),
        lambda c, i: F.element_at(
            F.col("__lut"), (i * n_codes + c + 1).cast("int")
        ),
    )
    adc = F.aggregate(contrib, F.lit(0.0), lambda a, v: a + v)
    offset = F.element_at(F.col("__offs"), F.col("cluster") + 1)

    codes = acid.read_atomic(spark, store.pq_codes).select(
        F.col("__id").alias("neighbor_id"), "cluster", "codes", "__norm"
    )
    cand_w = Window.partitionBy("query_id").orderBy(
        F.desc("__adc"), F.asc("neighbor_id")
    )
    candidates = (
        codes.join(
            F.broadcast(probe.join(ql, "query_id").select(
                "query_id", "cluster", "__lut", "__offs"
            )),
            "cluster",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            ((offset + adc) / F.col("__norm")).alias("__adc"),
        )
        .withColumn("__r", F.row_number().over(cand_w))
        .filter(F.col("__r") <= refine * k)
        .select("query_id", "neighbor_id")
    )

    hist = acid.read_atomic(spark, store.vectors).select(
        F.col("__id").alias("neighbor_id"), F.col("__vec").alias("__ov")
    )
    qvecs = ql.select("query_id", F.col("__qv"))
    scored = (
        hist.join(F.broadcast(candidates), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__ov")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
