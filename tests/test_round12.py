"""Round-12 surface: multi-word PHRASE blocklist route, quarantine
readmission on vector-indexed stores, IVF×PQ (IVFADC) composed ANN,
self-healing bench canary, and the round-11 ADVICE fixes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


# ---------------------------------------------------------------------------
# Round 12 #1: multi-word phrase blocklist route
# ---------------------------------------------------------------------------


def test_blocklist_phrase_routes_are_equivalent(spark):
    """Literal and broadcast-join routes must agree on MIXED word +
    phrase lists — overlapping phrase occurrences, docs shorter than
    the longest phrase, case/whitespace-denormalized terms, duplicate
    terms post-normalization, empty and NULL text."""
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = _mk_docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown quick brown fox"),
            (3, None),
            (4, ""),
            (5, "fox"),
            (6, "  Quick   BROWN  fox  "),
        ],
    )
    terms = [
        "fox",
        "Quick  Brown",      # denormalized duplicate of "quick brown"
        "quick brown fox",
        "lazy",
        "the quick brown fox",
        "fox",               # duplicate single word
        "",                  # empty term drops
    ]
    lit = text_ops.blocklist_screen(docs, terms, max_hits=1, route="literal")
    join = text_ops.blocklist_screen(docs, terms, max_hits=1, route="join")
    assert lit.schema == join.schema
    a = sorted(tuple(r) for r in lit.collect())
    b = sorted(tuple(r) for r in join.collect())
    assert a == b
    by_id = dict((r[0], r[1:]) for r in a)
    # doc 1: fox, lazy, "quick brown", "quick brown fox",
    # "the quick brown fox" — one occurrence each
    assert by_id[1] == (5, 5, True)
    # doc 2: fox×1 + "quick brown"×2 (overlap counts per occurrence)
    # + "quick brown fox"×1; "the quick brown fox" absent
    assert by_id[2] == (4, 3, True)
    # NULL and empty text both normalize to zero-hit rows on BOTH
    # routes (round-11 ADVICE: no route-dependent size(NULL))
    assert by_id[3] == (0, 0, False)
    assert by_id[4] == (0, 0, False)
    assert by_id[5] == (1, 1, False)
    # doc 6 normalizes to "quick brown fox"
    assert by_id[6] == (3, 3, True)


def test_blocklist_single_word_lists_unchanged(spark):
    """A single-word list must behave exactly as the round-11 surface
    did (the phrase machinery is a no-op at size 1): per-occurrence
    counts, distinct terms, spine-complete output."""
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = _mk_docs(
        spark,
        [(1, "red fish blue fish RED fish"), (2, "nothing here"), (3, "")],
    )
    for route in ("literal", "join"):
        out = dict(
            (r["doc_id"], (r["n_hits"], r["distinct_hits"], r["flagged"]))
            for r in text_ops.blocklist_screen(
                docs, ["red", "fish", "absent"], max_hits=1, route=route
            ).collect()
        )
        assert out == {1: (5, 2, True), 2: (0, 0, False), 3: (0, 0, False)}


def test_blocklist_phrase_shorter_doc_than_phrase(spark):
    """Docs shorter than a phrase produce NO n-grams at that size
    (guards the F.sequence(1, 0) descending-range trap)."""
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = _mk_docs(spark, [(1, "brown fox"), (2, "fox")])
    terms = ["brown fox", "quick brown fox jumps"]
    for route in ("literal", "join"):
        out = dict(
            (r["doc_id"], r["n_hits"])
            for r in text_ops.blocklist_screen(docs, terms, route=route).collect()
        )
        assert out == {1: 1, 2: 0}


def test_blocklist_phrase_auto_route_plan(spark):
    """Phrase lists obey the same auto crossover: short mixed list →
    no join in the plan; >256 terms → broadcast join appears."""
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = _mk_docs(spark, [(1, "alpha beta gamma")])
    short = text_ops.blocklist_screen(docs, ["alpha beta"], route="auto")
    long_terms = ["alpha beta"] + [f"t{i} u{i}" for i in range(300)]
    long = text_ops.blocklist_screen(docs, long_terms, route="auto")
    assert "Join" not in short._jdf.queryExecution().executedPlan().toString()
    assert "Join" in long._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# Round 12 #5 + ADVICE: self-healing canary, both-direction solo ranking
# ---------------------------------------------------------------------------


def test_canary_self_heals_transient_spike():
    """A one-off >2x canary spike (the round-11 after_n=25 GC event)
    must be re-measured once; the retry's clean reading is recorded
    as `sec` with the spike preserved in `first_attempt`."""
    import bench

    readings = iter([7.385, 1.2])
    rec = bench.measure_canary(lambda: next(readings), 25, baseline=1.15)
    assert rec == {"after_n": 25, "sec": 1.2, "first_attempt": 7.385}


def test_canary_persistent_drift_survives_retry():
    """A move that REPRODUCES on the retry is real instrument drift
    and must be recorded at the retried value (with the first attempt
    kept as evidence)."""
    import bench

    readings = iter([5.0, 4.8])
    rec = bench.measure_canary(lambda: next(readings), 50, baseline=1.15)
    assert rec["sec"] == 4.8 and rec["first_attempt"] == 5.0


def test_canary_stable_reading_measures_once():
    """In-band readings (including the baseline itself) never pay a
    retry — the canary stays one execution per checkpoint."""
    import bench

    calls = []

    def measure():
        calls.append(1)
        return 1.3

    rec = bench.measure_canary(measure, 0, baseline=None)  # first reading
    assert rec == {"after_n": 0, "sec": 1.3} and len(calls) == 1
    rec = bench.measure_canary(measure, 25, baseline=1.2)
    assert rec == {"after_n": 25, "sec": 1.3} and len(calls) == 2


def test_solo_candidates_rank_both_drift_directions():
    """A 4x SPEEDUP must outrank a 3x slowdown for the re-measure cap
    (round-11 ADVICE: t/prior-only ranking dropped improvement-side
    outliers when the cap was tight)."""
    import bench

    prior = {"slow": 1.0, "fast": 4.0, "mild": 1.0}
    timings = {"slow": 3.0, "fast": 1.0, "mild": 2.1}
    out = bench.solo_candidates(["slow", "fast", "mild"], timings, prior, cap=2)
    assert out == ["fast", "slow"]


# ---------------------------------------------------------------------------
# Round 12 #2: quarantine readmission on vector-indexed stores
# ---------------------------------------------------------------------------

_VGOOD = (
    "the farmer walked slowly across the wide green field this morning and "
    "carried a heavy wooden bucket full of fresh water toward the barn where "
    "all of the other animals had been waiting since early light for their "
    "share of the winter supplies that finally arrived on the old cart"
)


def _mk_vdocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<float>"
    )


def _vstore(tmp_path, min_margin=1500):
    """logreg-gated vector store: 'good' terms score +1000 each,
    'bad' terms -1000 each (hashed unigram features)."""
    import hashlib

    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    dim = 512
    f_good = int(hashlib.md5(b"good").hexdigest()[:12], 16) % dim
    f_bad = int(hashlib.md5(b"bad").hexdigest()[:12], 16) % dim
    return ingest_mod.IngestStore(
        str(tmp_path / "root"),
        m_bits=1 << 12,
        ivf_clusters=2,
        sem_threshold=0.95,
        quality_mode="logreg",
        quality_weights={f_good: 1000, f_bad: -1000},
        quality_dim=dim,
        quality_min_margin=min_margin,
    )


_VB0 = [
    (1, "good good alpha", [1.0, 0.0]),     # +2000: admitted
    (2, "good beta words", [0.0, 1.0]),     # +1000: quarantined at 1500
    (3, "bad bad bad stuff", [0.98, 0.2]),  # -3000: quarantined; ~cos 0.98 to doc 1
]


def test_readmit_on_vector_indexed_store(spark, tmp_path):
    """Round-11 verdict #2: a vector-indexed store readmits through
    the SAME semantic screen as ingest — now-passing rows that are
    semantic near-dups of history leave quarantine but are rejected,
    genuinely new rows are admitted WITH their vector rows, and the
    ANN index serves them (a later semantic dup of a readmitted doc is
    caught)."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = _vstore(tmp_path, min_margin=1500)
    r0 = ingest_mod.ingest_batch_vectors(spark, store, _mk_vdocs(spark, _VB0), 0)
    assert r0["admitted"] == 1 and r0["quarantined"] == 2

    lenient = _vstore(tmp_path, min_margin=-5000)
    r = ingest_mod.readmit_quarantine(spark, lenient, 1)
    assert r == {
        "rescored": 2,
        "readmitted": 1,            # doc 2 (orthogonal to history)
        "left_quarantine": 2,       # both now pass quality
        "still_quarantined": 0,
        "sem_rejected": 1,          # doc 3 ~cos 0.98 to admitted doc 1
        "readmitted_durable_in_prior_attempt": False,
    }
    assert acid_mod.read_atomic(spark, lenient.quarantine).count() == 0
    assert sorted(
        x["doc_id"] for x in acid_mod.read_atomic(spark, lenient.corpus).collect()
    ) == [1, 2]
    assert sorted(
        x["__id"] for x in acid_mod.read_atomic(spark, lenient.vectors).collect()
    ) == [1, 2]
    # ANN serves the readmitted doc ...
    q = _mk_vdocs(spark, [(9, "q", [0.1, 1.0])]).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    got = ingest_mod.vector_index_topk(spark, lenient, q, k=1, nprobe=2).collect()
    assert [x["neighbor_id"] for x in got] == [2]
    # ... and the admission screen rejects a semantic dup of it
    b2 = _mk_vdocs(spark, [(7, "good fresh words", [0.02, 1.0])])
    r2 = ingest_mod.ingest_batch_vectors(spark, lenient, b2, 2)
    assert r2["sem_rejected_history"] == 1 and r2["admitted"] == 0
    # whole-batch replay is a no-op
    assert ingest_mod.readmit_quarantine(spark, lenient, 1) == {
        "replay_skipped": True
    }


def test_readmit_vector_crash_replay_reports_durable_count(
    spark, tmp_path, monkeypatch
):
    """Crash after readmit's corpus chain but before the vectors
    append: the retry heals the vector rows from the change feed,
    reports the DURABLE readmitted count (not 0) flagged as
    prior-attempt-durable, finishes the quarantine rewrite, and the
    index serves the readmitted doc."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = _vstore(tmp_path, min_margin=1500)
    ingest_mod.ingest_batch_vectors(spark, store, _mk_vdocs(spark, _VB0), 0)

    lenient = _vstore(tmp_path, min_margin=-5000)
    real_commit = acid_mod.atomic_overwrite_partitions
    state = {"calls": 0}

    def crashing(df, path, **kw):
        state["calls"] += 1
        if state["calls"] == 4:  # corpus=1 hashes=2 bloom=3 VECTORS=4
            raise RuntimeError("injected crash")
        return real_commit(df, path, **kw)

    monkeypatch.setattr(acid_mod, "atomic_overwrite_partitions", crashing)
    monkeypatch.setattr(ingest_mod.acid, "atomic_overwrite_partitions", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_mod.readmit_quarantine(spark, lenient, 1)
    monkeypatch.setattr(acid_mod, "atomic_overwrite_partitions", real_commit)
    monkeypatch.setattr(ingest_mod.acid, "atomic_overwrite_partitions", real_commit)

    r = ingest_mod.readmit_quarantine(spark, lenient, 1)
    assert r["readmitted"] == 1
    assert r["readmitted_durable_in_prior_attempt"] is True
    assert r["left_quarantine"] == 2 and r["still_quarantined"] == 0
    assert acid_mod.read_atomic(spark, lenient.quarantine).count() == 0
    assert sorted(
        x["__id"] for x in acid_mod.read_atomic(spark, lenient.vectors).collect()
    ) == [1, 2]
    q = _mk_vdocs(spark, [(9, "q", [0.1, 1.0])]).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    got = ingest_mod.vector_index_topk(spark, lenient, q, k=1, nprobe=2).collect()
    assert [x["neighbor_id"] for x in got] == [2]


def test_batch_ingest_heals_crashed_readmit_chain(spark, tmp_path, monkeypatch):
    """Round-11 ADVICE (medium): a crashed readmit leaves APPEND
    commits under the 'readmit' app; the next ingest_batch_vectors
    call must heal that chain BEFORE screening (else its semantic
    screen misses the readmitted docs), and the default
    unhealed_floor must protect the un-healed commit in between."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = _vstore(tmp_path, min_margin=1500)
    ingest_mod.ingest_batch_vectors(spark, store, _mk_vdocs(spark, _VB0), 0)

    lenient = _vstore(tmp_path, min_margin=-5000)
    real_commit = acid_mod.atomic_overwrite_partitions
    state = {"calls": 0}

    def crashing(df, path, **kw):
        state["calls"] += 1
        if state["calls"] == 4:
            raise RuntimeError("injected crash")
        return real_commit(df, path, **kw)

    monkeypatch.setattr(acid_mod, "atomic_overwrite_partitions", crashing)
    monkeypatch.setattr(ingest_mod.acid, "atomic_overwrite_partitions", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_mod.readmit_quarantine(spark, lenient, 1)
    monkeypatch.setattr(acid_mod, "atomic_overwrite_partitions", real_commit)
    monkeypatch.setattr(ingest_mod.acid, "atomic_overwrite_partitions", real_commit)

    # the un-healed 'readmit' commit constrains the DEFAULT vacuum floor
    assert ingest_mod.unhealed_floor(lenient) is not None

    # an interleaved ingest batch (NOT a readmit retry) heals the
    # readmit chain first, so its screen sees the readmitted doc 2
    b2 = _mk_vdocs(spark, [(7, "good fresh words", [0.02, 1.0])])
    r2 = ingest_mod.ingest_batch_vectors(spark, lenient, b2, 2)
    assert r2["sem_rejected_history"] == 1 and r2["admitted"] == 0
    assert sorted(
        x["__id"] for x in acid_mod.read_atomic(spark, lenient.vectors).collect()
    ) == [1, 2]
    # healed: no floor constraint remains, and vacuum_store defaults are safe
    assert ingest_mod.unhealed_floor(lenient) is None
    ingest_mod.vacuum_store(spark, lenient, grace_seconds=0.0)
    # the readmit retry replays the quarantine rewrite cleanly; the
    # aggressive vacuum pruned the manifests the durable count needs,
    # so it reports 0 WITH the durable flag (an honest floor, never a
    # fabricated number)
    r = ingest_mod.readmit_quarantine(spark, lenient, 1)
    assert r["readmitted_durable_in_prior_attempt"] is True
    assert r["readmitted"] == 0
    # the corpus itself, of course, still has the readmitted doc
    assert sorted(
        x["doc_id"] for x in acid_mod.read_atomic(spark, lenient.corpus).collect()
    ) == [1, 2]


def test_readmit_refuses_pre_index_quarantine_rows(spark, tmp_path):
    """A row quarantined BEFORE the vector index existed carries no
    embedding (NULL after the quarantine's schema widened); if it
    would now PASS, readmission must refuse loudly — admitting it
    would silently hole the index.  Still-failing embedding-less rows
    are harmless and stay put."""
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = _vstore(tmp_path, min_margin=1500)
    # text-only batch BEFORE any index: doc 2 (+1000) quarantines
    r0 = ingest_mod.ingest_batch(
        spark, store, spark.createDataFrame(
            [(1, "good good intro"), (2, "good beta words")],
            "doc_id long, text string",
        ), 0
    )
    assert r0["quarantined"] == 1
    # the index arrives later, from a vector batch that passes quality
    r1 = ingest_mod.ingest_batch_vectors(
        spark, store, _mk_vdocs(spark, [(3, "good good again", [1.0, 0.0])]), 1
    )
    assert r1["admitted"] == 1
    # floor unchanged: doc 2 still fails -> readmit is a clean no-admit
    r2 = ingest_mod.readmit_quarantine(spark, store, 2)
    assert r2["readmitted"] == 0 and r2["still_quarantined"] == 1
    # floor lowered: doc 2 would pass but has no embedding -> refuse
    lenient = _vstore(tmp_path, min_margin=-5000)
    with pytest.raises(ValueError, match="cannot be healed into vector rows"):
        ingest_mod.readmit_quarantine(spark, lenient, 3)


# ---------------------------------------------------------------------------
# Round 12 #3: IVF×PQ (IVFADC) composed ANN route
# ---------------------------------------------------------------------------


def _mk_embeddings(spark, n=64, dim=8, seed=7):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [round(rng.uniform(-1.0, 1.0), 3) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivfpq_total_candidate_law(spark):
    """Probing every cell with a total refine budget must EQUAL brute
    force bit-exactly (same score expressions in the rerank): the
    provable-correctness law every approximate knob relaxes from."""
    from tiki_e_commerce_analytics_etl_spark.operators import similarity

    emb = _mk_embeddings(spark)
    qs = emb.filter(F.col("vec_id") < 6)
    exact = similarity.brute_force_topk(emb, qs, k=5).collect()
    ann = similarity.ivfpq_topk(
        emb, qs, k=5, n_clusters=4, nprobe=4, m=4, n_codes=8, refine=13
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    exact_m = {key(r): (r["neighbor_id"], r["score"]) for r in exact}
    ann_m = {key(r): (r["neighbor_id"], r["score"]) for r in ann}
    assert ann_m == exact_m


def test_ivfpq_partial_probe_shape_and_determinism(spark):
    """At nprobe<n_clusters the result is a legal top-k (<=k rows per
    query, ranks contiguous from 1, no self pairs) and two runs are
    identical (seeded sample, first-index ties)."""
    from tiki_e_commerce_analytics_etl_spark.operators import similarity

    emb = _mk_embeddings(spark)
    qs = emb.filter(F.col("vec_id") < 6)
    kw = dict(k=5, n_clusters=4, nprobe=2, m=4, n_codes=8, refine=3)
    a = similarity.ivfpq_topk(emb, qs, **kw).collect()
    b = similarity.ivfpq_topk(emb, qs, **kw).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_q = {}
    for r in a:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_ivfpq_encode_is_compact_and_cell_consistent(spark):
    """Encoded rows carry (cluster, m codes, norm) only; the cluster
    matches the cosine-nearest coarse centroid; codes index within
    n_codes."""
    import math

    from tiki_e_commerce_analytics_etl_spark.operators import similarity

    emb = _mk_embeddings(spark, n=32)
    C, books = similarity.train_ivfpq(
        emb, n_clusters=4, m=4, n_codes=8
    )
    enc = {r["neighbor_id"]: r for r in similarity.ivfpq_encode(
        emb, C, books
    ).collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(enc) == 32
    for vid, r in enc.items():
        v = [float(x) for x in vecs[vid]]
        nrm = math.sqrt(sum(x * x for x in v))
        sims = [sum(a * b for a, b in zip(v, c)) / nrm for c in C.tolist()]
        assert r["cluster"] == max(range(4), key=lambda i: (sims[i], -i))
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])
        assert abs(r["__neighbor_id_norm"] - nrm) < 1e-9


def test_byte_bpe_corpus_oracle_twin_lockstep(spark, tmp_path):
    """The generated DuckDB twin (_byte_bpe_corpus_oracle) must equal
    the Spark trainer bit-for-bit on random clean corpora (the [a-z ]
    single-space inventory the specialization is valid for) — merge
    chains, tie-breaks, and the replace()-based rewrite all in
    lockstep, including repeated-letter words that exercise the
    overlapping-pair (resume-after) semantics."""
    import random

    import duckdb

    import __spark_entry__ as entry
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    rng = random.Random(12)
    vocab = ["aaa", "abab", "banana", "scan", "a", "loop", "pool", "zz"]
    for case in range(3):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
            for i in range(25)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = [
            tuple(r)
            for r in text_ops.byte_bpe_train(df, n_merges=6)
            .orderBy("merge_rank")
            .collect()
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
        want = con.execute(
            entry._byte_bpe_corpus_oracle(6, "TRUE")
        ).fetchall()
        assert got == [tuple(r) for r in want], f"case {case} diverged"


# ---------------------------------------------------------------------------
# Round 12 (beyond asks): PQ serving sidecar for the incremental vector index
# ---------------------------------------------------------------------------


def _seed_vector_store(spark, tmp_path, n=40, dim=8, cells=4):
    import random

    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    rng = random.Random(3)
    store = ingest_mod.IngestStore(
        str(tmp_path / "root"), m_bits=1 << 12, ivf_clusters=cells,
        sem_threshold=0.999,
    )
    rows = [
        (i, f"doc number {i} text", [round(rng.uniform(-1, 1), 3) for _ in range(dim)])
        for i in range(n)
    ]
    batch = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<float>"
    )
    r = ingest_mod.ingest_batch_vectors(spark, store, batch, 0)
    assert r["admitted"] == n
    return store, rows


def test_pq_sidecar_total_budget_equals_exact_route(spark, tmp_path):
    """route='pq' with probe-all + total refine must equal the exact
    route bit-for-bit (same rerank expressions) — the law every
    approximate knob relaxes from; and the build is idempotent at an
    unchanged vectors version."""
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store, rows = _seed_vector_store(spark, tmp_path)
    r = ingest_mod.build_vector_pq_sidecar(spark, store, m=4, n_codes=8)
    assert r["rebuilt"] is True and r["rows"] == 40
    assert ingest_mod.build_vector_pq_sidecar(spark, store)["rebuilt"] is False

    qs = spark.createDataFrame(
        [(i, v) for i, _t, v in rows[:5]], "vec_id long, embedding array<float>"
    )
    exact = ingest_mod.vector_index_topk(
        spark, store, qs, k=5, nprobe=4, route="exact"
    ).collect()
    pq = ingest_mod.vector_index_topk(
        spark, store, qs, k=5, nprobe=4, route="pq", refine=8
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert {key(r): (r["neighbor_id"], r["score"]) for r in pq} == {
        key(r): (r["neighbor_id"], r["score"]) for r in exact
    }


def test_pq_sidecar_staleness_and_auto_route(spark, tmp_path):
    """Any vectors commit makes the sidecar stale: the pq route
    refuses loudly, auto falls back to exact, the rebuild re-serves,
    and forget DELETES the sidecar (content-derived codes must not
    linger in a cache)."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store, rows = _seed_vector_store(spark, tmp_path)
    ingest_mod.build_vector_pq_sidecar(spark, store, m=4, n_codes=8)
    qs = spark.createDataFrame(
        [(0, rows[0][2])], "vec_id long, embedding array<float>"
    )
    assert ingest_mod.vector_index_topk(
        spark, store, qs, k=3, route="auto"
    ).count() == 3

    b1 = spark.createDataFrame(
        [(100, "a genuinely fresh doc", [0.9] * 8)],
        "doc_id long, text string, embedding array<float>",
    )
    ingest_mod.ingest_batch_vectors(spark, store, b1, 1)
    with pytest.raises(ValueError, match="missing or stale"):
        ingest_mod.vector_index_topk(spark, store, qs, k=3, route="pq")
    # auto serves EXACT (sees the new doc) instead of a stale cache
    got = ingest_mod.vector_index_topk(
        spark, store, qs, k=41, nprobe=4, route="auto"
    )
    assert any(r["neighbor_id"] == 100 for r in got.collect())
    # rebuild pins the new version and the pq route serves the new doc
    r = ingest_mod.build_vector_pq_sidecar(spark, store, m=4, n_codes=8)
    assert r["rebuilt"] is True and r["rows"] == 41
    got = ingest_mod.vector_index_topk(
        spark, store, qs, k=41, nprobe=4, route="pq", refine=11
    )
    assert any(r["neighbor_id"] == 100 for r in got.collect())

    # forget removes the sidecar entirely
    ids = spark.createDataFrame([(100,)], "doc_id long")
    ingest_mod.forget(spark, store, ids, 2)
    assert acid_mod.latest_version(store.pq_codes) is None
    assert acid_mod.latest_version(store.pq_books) is None
    with pytest.raises(ValueError, match="missing or stale"):
        ingest_mod.vector_index_topk(spark, store, qs, k=3, route="pq")


def test_merge_fold_expr_matches_merge_scan(spark):
    """Round-12 optimization guard: the JVM fold rewrite used inside
    the trainer loops must reproduce ``_merge_scan``'s
    resume-after-merge semantics bit-for-bit, including the l == r
    overlap regime (``a a a`` + (a,a) -> ``aa a``) and the
    cannot-merge-at-last-position edge."""
    import random

    from pyspark.sql import functions as F

    from tiki_e_commerce_analytics_etl_spark.operators.text import (
        _merge_fold_expr,
        _merge_scan,
    )

    rng = random.Random(1207)
    alphabet = ["a", "b", "c", "##a", "##b", "ab"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        for _ in range(600)
    ]
    cases += [[], ["a"], ["a", "b"], ["a", "a", "a"], ["b", "a", "b", "a"]]
    df = spark.createDataFrame([(c,) for c in cases], "syms: array<string>")
    for l, r, m in [("a", "b", "ab"), ("a", "a", "aa"), ("ab", "##a", "aba")]:
        got = [
            list(row["o"])
            for row in df.select(
                _merge_fold_expr(F.col("syms"), l, r, m).alias("o")
            ).collect()
        ]
        want = [_merge_scan(list(c), l, r, m) for c in cases]
        assert got == want


# ---------------------------------------------------------------------------
# Round 12 optimization: driver-local trainer route (guide §1.2) —
# below _trainer_local_rows the BPE / byte-BPE / WordPiece merge loops
# collect the unique word/piece table and train driver-side; the
# results must be BIT-IDENTICAL to the distributed loop.
# ---------------------------------------------------------------------------


def _random_trainer_corpus(spark):
    import random

    rng = random.Random(1207)
    vocab = [
        "low", "lower", "lowest", "newer", "wider", "wide", "new",
        "a", "ab", "abc", "aaa", "aaaa",      # l == r overlap regime
        "café", "naïve",                       # multi-byte UTF-8
        "x1", "42", "it's",                    # GPT-2 regex splits
    ]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 12))))
        for i in range(80)
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


@pytest.mark.parametrize("trainer", ["bpe_train", "byte_bpe_train", "wordpiece_train"])
def test_trainer_local_route_lockstep(spark, trainer):
    """local_rows=huge (forced driver-local) ≡ local_rows=0 (forced
    distributed) for every trainer, merge by merge, on a corpus
    covering the l == r overlap regime, multi-byte UTF-8, and
    GPT-2-regex punctuation splits."""
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = _random_trainer_corpus(spark)
    fn = getattr(text_ops, trainer)
    local = fn(docs, n_merges=8, local_rows=1_000_000_000).collect()
    dist = fn(docs, n_merges=8, local_rows=0).collect()
    assert [tuple(r) for r in local] == [tuple(r) for r in dist]
    assert len(local) == 8


def test_trainer_local_route_empty_corpus(spark):
    """Both routes return an empty merge table (same schema) when the
    corpus has no adjacent pairs at all."""
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    local = text_ops.bpe_train(docs, n_merges=3, local_rows=1_000_000_000)
    dist = text_ops.bpe_train(docs, n_merges=3, local_rows=0)
    assert local.schema == dist.schema
    assert local.count() == dist.count() == 0


def test_unigram_trainer_local_route_lockstep(spark):
    """unigram_train's driver-local route (seed count + every EM/prune
    round in the driver) ≡ the distributed route, rank by rank — the
    EM segmentation is the same _unigram_viterbi either way."""
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = _random_trainer_corpus(spark)
    local = text_ops.unigram_train(docs, vocab_size=25, local_rows=1_000_000_000).collect()
    dist = text_ops.unigram_train(docs, vocab_size=25, local_rows=0).collect()
    assert [tuple(r) for r in local] == [tuple(r) for r in dist]
    assert len(local) == 25
