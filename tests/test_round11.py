"""Round 11: regression tests for the round-10 ADVICE items plus the
new round-11 surface (blocklist broadcast-join route, byte-level BPE,
quality gating at ingest admission, scale-proportional shard default,
_auto_agree sidecar hint)."""

import pytest
from pyspark.sql import functions as F


def _mk_vdocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<float>"
    )


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# ADVICE (round 10) regressions
# ---------------------------------------------------------------------------


def test_empty_first_vector_batch_does_not_create_empty_index(spark, tmp_path):
    """ADVICE r10: a first vector batch with zero content-new rows must
    NOT create an empty vectors table (which would permanently block
    text variants via _require_no_vector_index and break
    _stored_centroids); the next non-empty batch bootstraps normally
    and probing before bootstrap raises a clear error."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = ingest_mod.IngestStore(
        str(tmp_path / "root"), m_bits=1 << 12, ivf_clusters=2, sem_threshold=0.95
    )
    empty = _mk_vdocs(spark, []).limit(0)
    r0 = ingest_mod.ingest_batch_vectors(spark, store, empty, 0)
    assert r0["admitted"] == 0
    # neither the index nor the basis exists yet
    assert acid_mod.latest_version(store.vectors) is None
    assert acid_mod.latest_version(store.centroids) is None

    # probing before bootstrap fails LOUD with an actionable message
    q = _mk_vdocs(spark, [(9, "q", [1.0, 0.0])]).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="no centroid basis"):
        ingest_mod.vector_index_topk(spark, store, q, k=1)

    # a plain text batch is NOT blocked (no vector index exists)
    ingest_mod.ingest_batch(
        spark, store, _mk_docs(spark, [(1, "plain text doc")]), 1
    )

    # the next non-empty vector batch bootstraps the basis normally
    b2 = _mk_vdocs(
        spark, [(2, "alpha doc", [1.0, 0.0]), (3, "beta doc", [0.0, 1.0])]
    )
    r2 = ingest_mod.ingest_batch_vectors(spark, store, b2, 2)
    assert r2["admitted"] == 2
    assert acid_mod.latest_version(store.centroids) is not None
    got = ingest_mod.vector_index_topk(spark, store, q, k=1, nprobe=2).collect()
    assert [r["neighbor_id"] for r in got] == [2]


def test_foreach_batch_ingest_passes_nprobe_through(spark, tmp_path, monkeypatch):
    """ADVICE r10: the streaming vectors mode must forward nprobe to
    ingest_batch_vectors so the multi-probe recall lever is reachable
    from streaming ingest."""
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod
    from tiki_e_commerce_analytics_etl_spark.streaming.incremental import (
        foreach_batch_ingest,
    )

    seen = {}

    def spy(spark_, store_, batch_, batch_id_, **kw):
        seen.update(kw)
        return {}

    monkeypatch.setattr(ingest_mod, "ingest_batch_vectors", spy)
    store = ingest_mod.IngestStore(str(tmp_path / "root"))
    apply_fn = foreach_batch_ingest(store, vectors=True, nprobe=4)
    apply_fn(_mk_vdocs(spark, [(1, "doc", [1.0, 0.0])]), 0)
    assert seen.get("nprobe") == 4


def test_shard_manifest_detects_pos_edit_not_physical_order(spark, tmp_path):
    """ADVICE r10 (docstring contract): the shard checksum detects an
    edit to the stored pos column (serving order IS pos), while
    loaders are required to sort by pos — verify the checksum flags a
    pos tamper."""
    import json

    from tiki_e_commerce_analytics_etl_spark import io as io_mod

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    io_mod.write_training_shards(df, path, n_shards=2, seed=3)
    ok = io_mod.verify_training_shards(spark, path)
    assert all(r["ok"] for r in ok.collect())

    # tamper: swap two pos values inside one shard (same rows, same ids)
    raw = spark.read.parquet(path)
    shard0 = [r.asDict() for r in raw.filter(F.col("shard") == 0).collect()]
    assert len(shard0) >= 2
    shard0[0]["pos"], shard0[1]["pos"] = shard0[1]["pos"], shard0[0]["pos"]
    rest = raw.filter(F.col("shard") != 0)
    tampered = spark.createDataFrame(shard0, raw.schema).unionByName(rest)
    path2 = str(tmp_path / "tampered")
    tampered.write.mode("overwrite").partitionBy("shard").parquet(path2)
    with open(f"{path}/_manifest.json") as f:
        manifest = json.load(f)
    with open(f"{path2}/_manifest.json", "w") as f:
        json.dump(manifest, f)
    bad = {r["shard"]: r["ok"] for r in
           io_mod.verify_training_shards(spark, path2).collect()}
    assert bad[0] is False and bad[1] is True


# ---------------------------------------------------------------------------
# Round 11 #1: blocklist broadcast-join route
# ---------------------------------------------------------------------------


def test_blocklist_routes_are_equivalent(spark):
    """The literal array_contains route and the broadcast-join route
    must produce identical (doc_id, n_hits, distinct_hits, flagged)
    rows on the same corpus — including zero-hit docs, repeated hits,
    duplicate input terms, and docs whose text is empty."""
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = _mk_docs(
        spark,
        [
            (1, "red fish blue fish RED fish"),
            (2, "nothing to see here"),
            (3, ""),
            (4, "fish red red red"),
        ],
    )
    terms = ["red", "fish", "red", "absent"]  # duplicate term on purpose
    lit = text_ops.blocklist_screen(docs, terms, max_hits=1, route="literal")
    join = text_ops.blocklist_screen(docs, terms, max_hits=1, route="join")
    assert lit.schema == join.schema
    a = sorted(tuple(r) for r in lit.collect())
    b = sorted(tuple(r) for r in join.collect())
    assert a == b
    by_id = dict((r[0], r[1:]) for r in a)
    assert by_id[1] == (5, 2, True)   # red×2 + fish×3, both terms, >1
    assert by_id[2] == (0, 0, False)
    assert by_id[3] == (0, 0, False)
    assert by_id[4] == (4, 2, True)


def test_blocklist_auto_route_picks_join_for_long_lists(spark):
    """route="auto" must stay on the literal path for short lists and
    switch to the broadcast-join path past join_threshold — visible as
    a join in the plan."""
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = _mk_docs(spark, [(1, "alpha beta")])
    short = text_ops.blocklist_screen(docs, ["alpha"], route="auto")
    long_terms = [f"t{i}" for i in range(300)]
    long = text_ops.blocklist_screen(docs, long_terms, route="auto")
    assert "Join" not in short._jdf.queryExecution().executedPlan().toString()
    assert "Join" in long._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="route"):
        text_ops.blocklist_screen(docs, ["x"], route="bogus")


# ---------------------------------------------------------------------------
# Round 11 #2: byte-level GPT-2 BPE — independent pure-Python reference
# (no engine imports: scanner pre-tokenizer with Java-regex semantics,
# re-derived byte table, Counter-based merge loop)
# ---------------------------------------------------------------------------

_ASCII_WS = set(" \t\n\x0b\f\r")
_CONTRACTIONS = ["'s", "'t", "'re", "'ve", "'m", "'ll", "'d"]


def _cat(c):
    import unicodedata

    return unicodedata.category(c)


def _ref_pieces(text):
    def is_l(c):
        return _cat(c).startswith("L")

    def is_n(c):
        return _cat(c).startswith("N")

    def is_ws(c):
        return c in _ASCII_WS

    out, i, n = [], 0, len(text)
    while i < n:
        m = None
        for c in _CONTRACTIONS:
            if text.startswith(c, i):
                m = c
                break
        if m is None:
            ch = text[i]
            if ch == " " and i + 1 < n and is_l(text[i + 1]):
                k = i + 1
                while k < n and is_l(text[k]):
                    k += 1
                m = text[i:k]
            elif is_l(ch):
                k = i
                while k < n and is_l(text[k]):
                    k += 1
                m = text[i:k]
            elif ch == " " and i + 1 < n and is_n(text[i + 1]):
                k = i + 1
                while k < n and is_n(text[k]):
                    k += 1
                m = text[i:k]
            elif is_n(ch):
                k = i
                while k < n and is_n(text[k]):
                    k += 1
                m = text[i:k]
            elif (ch == " " and i + 1 < n and not is_ws(text[i + 1])
                  and not is_l(text[i + 1]) and not is_n(text[i + 1])):
                k = i + 1
                while (k < n and not is_ws(text[k]) and not is_l(text[k])
                       and not is_n(text[k])):
                    k += 1
                m = text[i:k]
            elif not is_ws(ch):
                k = i
                while (k < n and not is_ws(text[k]) and not is_l(text[k])
                       and not is_n(text[k])):
                    k += 1
                m = text[i:k]
            else:
                k = i
                while k < n and is_ws(text[k]):
                    k += 1
                if k == n or k - i == 1:
                    m = text[i:k]
                else:
                    m = text[i:k - 1]
        out.append(m)
        i += len(m)
    return out


def _ref_b2u():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _ref_scan(s, l, r, m):
    res, i, n = [], 0, len(s)
    while i < n:
        if i + 1 < n and s[i] == l and s[i + 1] == r:
            res.append(m)
            i += 2
        else:
            res.append(s[i])
            i += 1
    return res


def _ref_byte_bpe(texts, n_merges):
    from collections import Counter

    b2u = _ref_b2u()
    pieces = Counter()
    for t in texts:
        pieces.update(_ref_pieces(t))
    state = {p: [b2u[b] for b in p.encode("utf-8")] for p in pieces}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for p, syms in state.items():
            w = pieces[p]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += w
        if not pc:
            break
        (l, r), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, l + r, cnt))
        state = {p: _ref_scan(s, l, r, l + r) for p, s in state.items()}
    return merges


_TRICKY_TEXTS = [
    "low low lower it's café 42",
    "I'll say we've done it'd work don't",
    "a  b   c\t\td\n\ne",          # multi-ws runs: lookahead trim
    "hello,world!!!  ...ok?",
    "x1y2z3 12ab 3.14 -42",
    " leading and trailing  ",
    "tabs\tand\nnewlines\r\nmixed",
    "naïve façade coöperate Ångström",
    "đường phố Hà Nội giá 5.000 ₫",   # Vietnamese + currency
    "emoji 🙂 mixed 🚀🚀 runs",
    "a'b c'd e's f'sx",               # contraction vs bare apostrophe
    "",
    "   ",
    " nbsp run",            # U+00A0 is NOT Java \s
]


def test_bytes_to_unicode_is_a_printable_bijection():
    """All 256 bytes map to 256 DISTINCT printable characters (no
    symbol collisions — a collision would silently merge different
    byte sequences), and the published anchor points hold."""
    from tiki_e_commerce_analytics_etl_spark.operators.text import bytes_to_unicode

    b2u = bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    assert all(c.isprintable() for c in b2u.values())
    assert b2u[ord(" ")] == "Ġ" and b2u[ord("\n")] == "Ċ"
    assert b2u[ord("a")] == "a" and b2u[ord("!")] == "!"  # printable: identity


def test_gpt2_pieces_matches_independent_reference(spark):
    """The JVM regex pre-tokenizer and the pure-Python scanner must
    agree piece-for-piece on contractions, space-prefixing, lookahead
    whitespace trimming, unicode letters/digits, and non-ASCII spaces
    — plus random corpora."""
    import random

    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    rng = random.Random(11)
    alphabet = list("ab 1!'é\t\n")
    randoms = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(60)
    ]
    texts = _TRICKY_TEXTS + randoms
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: list(r["p"])
        for r in df.select(
            "i", text_ops.gpt2_pieces(F.col("text")).alias("p")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _ref_pieces(t), (i, t, got[i], _ref_pieces(t))
    # pieces must reassemble the original text exactly (lossless)
    for t in texts:
        assert "".join(_ref_pieces(t)) == t


def test_byte_bpe_train_matches_independent_reference(spark):
    """Property: on random corpora the distributed trainer reproduces
    the independent reference's merge table exactly (ranks, symbols,
    counts) — argmax tiebreaks, resume-after-merge rewrites, byte
    mapping, and pre-tokenization all in lockstep."""
    import random

    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    rng = random.Random(42)
    vocab = ["low", "lower", "it's", "café", "42", "ab", "a", "xyz!"]
    for trial in range(3):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 15)))
            for _ in range(rng.randrange(2, 6))
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = [
            (r["merge_rank"], r["left"], r["right"], r["merged"],
             r["pair_count"])
            for r in text_ops.byte_bpe_train(df, n_merges=6)
            .orderBy("merge_rank").collect()
        ]
        want = _ref_byte_bpe(texts, 6)
        assert got == want, (trial, texts, got, want)


def test_byte_bpe_tokenize_out_of_training(spark):
    """Apply on words never seen in training still tokenizes (the
    no-<unk> guarantee) and matches the reference's replay — including
    a multi-byte word no merge covers."""
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    train = spark.createDataFrame(
        [(1, "low low lower newest newest widest")], "i long, text string"
    )
    merges_df = text_ops.byte_bpe_train(train, n_merges=6)
    merges = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], 0)
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    docs = [(1, "lowest đường 🙂"), (2, "it's 99 bottles")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_pieces"], r["n_bytes"], r["n_tokens"])
        for r in text_ops.byte_bpe_token_counts(df, merges_df).collect()
    }
    b2u = _ref_b2u()
    for did, t in docs:
        pieces = _ref_pieces(t)
        n_bytes = sum(len(p.encode("utf-8")) for p in pieces)
        n_tok = 0
        for p in pieces:
            syms = [b2u[b] for b in p.encode("utf-8")]
            for _, l, r, m, _ in merges:
                if len(syms) < 2:
                    break
                syms = _ref_scan(syms, l, r, m)
            n_tok += len(syms)
        assert got[did] == (len(pieces), n_bytes, n_tok)


# ---------------------------------------------------------------------------
# Round 11 #3: quality gating at ingest admission (quarantine chain table)
# ---------------------------------------------------------------------------

_GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back to "
    "the barn with all of the other animals that have been waiting there "
    "since early morning because they wanted to see what would happen "
    "when the farmer finally came home with the new supplies for winter"
)
_BAD = "xx yy zz"  # fails min_words and stop-word rules


def _logreg_store(tmp_path, min_margin=0):
    import hashlib

    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    dim = 512
    f_good = int(hashlib.md5(b"good").hexdigest()[:12], 16) % dim
    f_bad = int(hashlib.md5(b"bad").hexdigest()[:12], 16) % dim
    assert f_good != f_bad
    store = ingest_mod.IngestStore(
        str(tmp_path / "root"),
        m_bits=1 << 12,
        quality_mode="logreg",
        quality_weights={f_good: 1000, f_bad: -1000},
        quality_bias=0,
        quality_dim=dim,
        quality_min_margin=min_margin,
    )
    return store, f_good, f_bad


def test_quality_gate_gopher_matches_one_shot_and_separates_audit(
    spark, tmp_path
):
    """Incremental admission-time gating ≡ one-shot gopher_quality by
    shared code: across two batches, quarantine holds exactly the docs
    the batch operator fails, the corpus exactly the passes — and a
    DUPLICATE of a bad doc is rejected as a duplicate, never double-
    counted in quarantine (the two audit categories stay separate)."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = ingest_mod.IngestStore(
        str(tmp_path / "root"), m_bits=1 << 12, quality_mode="gopher"
    )
    b0 = _mk_docs(spark, [(1, _GOOD), (2, _BAD)])
    r0 = ingest_mod.ingest_batch(spark, store, b0, 0)
    assert r0["admitted"] == 1 and r0["quarantined"] == 1
    b1 = _mk_docs(spark, [(3, _BAD), (4, _GOOD + " again"), (5, _BAD)])
    r1 = ingest_mod.ingest_batch(spark, store, b1, 1)
    # doc 5 is an exact dup of doc 3 (in-batch): rejected as DUP, not
    # quarantined twice
    assert r1["admitted"] == 1 and r1["quarantined"] == 1
    assert r1["in_batch_dups"] == 1

    union = _mk_docs(spark, [(1, _GOOD), (2, _BAD), (3, _BAD), (4, _GOOD + " again")])
    want_fail = {
        r["id"]
        for r in text_ops.gopher_quality(union).collect()
        if not r["pass_gopher"]
    }
    got_q = {
        r["doc_id"]
        for r in acid_mod.read_atomic(spark, store.quarantine).collect()
    }
    assert got_q == want_fail == {2, 3}
    got_c = sorted(
        r["doc_id"] for r in acid_mod.read_atomic(spark, store.corpus).collect()
    )
    assert got_c == [1, 4]
    # quarantine rows carry the stored score and the full text (audits)
    qrow = acid_mod.read_atomic(spark, store.quarantine).filter(
        F.col("doc_id") == 2
    ).collect()[0]
    assert qrow["q_score"] == 0 and qrow["text"] == _BAD


def test_quality_gate_logreg_margin_matches_one_shot(spark, tmp_path):
    """logreg mode: the stored q_score is the exact micro-unit margin
    features.logreg_margins computes one-shot under the same weights."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store, _fg, _fb = _logreg_store(tmp_path)
    b0 = _mk_docs(
        spark,
        [
            (1, "good good content here"),   # margin +2000
            (2, "bad bad bad content"),      # margin -3000
            (3, "neutral words only"),       # margin 0 (>= floor 0: admit)
        ],
    )
    r0 = ingest_mod.ingest_batch(spark, store, b0, 0)
    assert r0["admitted"] == 2 and r0["quarantined"] == 1
    one_shot = {
        r[0]: r[1]
        for r in ingest_mod._quality_scores(store, b0, "text", "doc_id").collect()
    }
    assert one_shot == {1: 2000, 2: -3000, 3: 0}
    qrows = acid_mod.read_atomic(spark, store.quarantine).collect()
    assert [(r["doc_id"], r["q_score"]) for r in qrows] == [(2, -3000)]


@pytest.mark.parametrize("crash_at", [1, 2, 3, 4])
def test_quality_crash_matrix(spark, tmp_path, monkeypatch, crash_at):
    """Crash positions across the quality chain (quarantine=1,
    corpus=2, hashes=3, bloom=4): after redelivery the store converges
    to exactly one copy of each quarantine row and each corpus row —
    the quarantine-commits-FIRST ordering makes every position
    recoverable (quarantine rows are not reconstructible from corpus
    feeds, so they must be durable before anything downstream)."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = ingest_mod.IngestStore(
        str(tmp_path / "root"), m_bits=1 << 12, quality_mode="gopher"
    )
    ingest_mod.ingest_batch(
        spark, store, _mk_docs(spark, [(1, _GOOD), (2, _BAD)]), 0
    )

    real_commit = acid_mod.atomic_overwrite_partitions
    state = {"calls": 0}

    def crashing(df, path, **kw):
        state["calls"] += 1
        if state["calls"] == crash_at:
            raise RuntimeError("injected crash")
        return real_commit(df, path, **kw)

    monkeypatch.setattr(acid_mod, "atomic_overwrite_partitions", crashing)
    monkeypatch.setattr(ingest_mod.acid, "atomic_overwrite_partitions", crashing)
    b1 = _mk_docs(spark, [(3, _GOOD + " fresh"), (4, _BAD + " ww")])
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_mod.ingest_batch(spark, store, b1, 1)
    monkeypatch.setattr(acid_mod, "atomic_overwrite_partitions", real_commit)
    monkeypatch.setattr(ingest_mod.acid, "atomic_overwrite_partitions", real_commit)

    ingest_mod.ingest_batch(spark, store, b1, 1)  # redelivery
    q = sorted(
        r["doc_id"] for r in acid_mod.read_atomic(spark, store.quarantine).collect()
    )
    c = sorted(
        r["doc_id"] for r in acid_mod.read_atomic(spark, store.corpus).collect()
    )
    assert q == [2, 4] and c == [1, 3]
    # and a later dup of the crashed batch's doc is still rejected
    r2 = ingest_mod.ingest_batch(
        spark, store, _mk_docs(spark, [(9, _GOOD + " fresh")]), 2
    )
    assert r2["admitted"] == 0


def test_quarantine_readmission_on_threshold_change(spark, tmp_path):
    """Lowering the logreg floor and calling readmit_quarantine moves
    the now-passing rows into the corpus (through the exact-dedup
    screen), keeps still-failing rows quarantined, and is exactly-once;
    raising the floor never reaches back into the corpus."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store, _fg, _fb = _logreg_store(tmp_path, min_margin=1500)
    b0 = _mk_docs(
        spark,
        [
            (1, "good good content"),        # +2000: admitted
            (2, "good words here"),          # +1000: quarantined at 1500
            (3, "bad bad bad bad stuff"),    # -4000: quarantined
        ],
    )
    r0 = ingest_mod.ingest_batch(spark, store, b0, 0)
    assert r0["admitted"] == 1 and r0["quarantined"] == 2

    # equal content to doc 2 admitted later from another batch: on
    # readmission doc 2 must leave quarantine but NOT duplicate corpus
    lenient0 = ingest_mod.IngestStore(
        str(tmp_path / "root"),
        m_bits=1 << 12,
        quality_mode="logreg",
        quality_weights=store.quality_weights,
        quality_dim=store.quality_dim,
        quality_min_margin=500,
    )
    ingest_mod.ingest_batch(
        spark, lenient0, _mk_docs(spark, [(20, "good words here")]), 1
    )

    r = ingest_mod.readmit_quarantine(spark, lenient0, 2)
    assert r["rescored"] == 2
    assert r["left_quarantine"] == 1      # doc 2 passes at floor 500
    assert r["readmitted"] == 0           # but its content is already in
    assert r["still_quarantined"] == 1    # doc 3 stays
    q = sorted(
        r2["doc_id"]
        for r2 in acid_mod.read_atomic(spark, lenient0.quarantine).collect()
    )
    assert q == [3]
    c = sorted(
        r2["doc_id"] for r2 in acid_mod.read_atomic(spark, lenient0.corpus).collect()
    )
    assert c == [1, 20]

    # now drop the floor below doc 3's margin: genuine readmission
    lenient1 = ingest_mod.IngestStore(
        str(tmp_path / "root"),
        m_bits=1 << 12,
        quality_mode="logreg",
        quality_weights=store.quality_weights,
        quality_dim=store.quality_dim,
        quality_min_margin=-5000,
    )
    r = ingest_mod.readmit_quarantine(spark, lenient1, 3)
    assert r["readmitted"] == 1 and r["still_quarantined"] == 0
    assert acid_mod.read_atomic(spark, lenient1.quarantine).count() == 0
    c = sorted(
        r2["doc_id"] for r2 in acid_mod.read_atomic(spark, lenient1.corpus).collect()
    )
    assert c == [1, 3, 20]
    # replay is a whole-batch no-op
    assert ingest_mod.readmit_quarantine(spark, lenient1, 3) == {
        "replay_skipped": True
    }
    # raising the floor again removes nothing from the corpus
    strict = ingest_mod.IngestStore(
        str(tmp_path / "root"),
        m_bits=1 << 12,
        quality_mode="logreg",
        quality_weights=store.quality_weights,
        quality_dim=store.quality_dim,
        quality_min_margin=10_000,
    )
    ingest_mod.readmit_quarantine(spark, strict, 4)
    assert acid_mod.read_atomic(spark, strict.corpus).count() == 3


def test_forget_scrubs_quarantine(spark, tmp_path):
    """Right-to-be-forgotten reaches quarantined text too."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = ingest_mod.IngestStore(
        str(tmp_path / "root"), m_bits=1 << 12, quality_mode="gopher"
    )
    ingest_mod.ingest_batch(
        spark, store, _mk_docs(spark, [(1, _GOOD), (2, _BAD)]), 0
    )
    r = ingest_mod.forget(
        spark, store, spark.createDataFrame([(2,)], "doc_id long"), 1
    )
    assert r == {"removed": 0, "removed_quarantined": 1}
    assert acid_mod.read_atomic(spark, store.quarantine).count() == 0


def test_quality_gate_composes_with_neardup_screen(spark, tmp_path):
    """Quality gating is store config, orthogonal to the dedup
    variant: on a near-dup store, junk quarantines BEFORE the band
    screen and near-dups of admitted history are still rejected."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = ingest_mod.IngestStore(
        str(tmp_path / "root"), m_bits=1 << 12, quality_mode="gopher"
    )
    r0 = ingest_mod.ingest_batch_neardup(
        spark, store, _mk_docs(spark, [(1, _GOOD), (2, _BAD)]), 0
    )
    assert r0["admitted"] == 1 and r0["quarantined"] == 1
    r1 = ingest_mod.ingest_batch_neardup(
        spark, store, _mk_docs(spark, [(3, _GOOD + " tweak"), (4, _BAD + " qq")]), 1
    )
    assert r1["near_dup_rejected_history"] == 1
    assert r1["quarantined"] == 1 and r1["admitted"] == 0
    assert acid_mod.read_atomic(spark, store.corpus).count() == 1


# ---------------------------------------------------------------------------
# Round 11 #5: scale-proportional n_shards default
# ---------------------------------------------------------------------------


def test_auto_shards_scales_with_rows_and_respects_floor(spark, tmp_path):
    """auto_shards = clamp(ceil(rows / rows_per_shard), n_min, n_max):
    toy corpora stay at the floor (so fixed-corpus oracles never
    move), larger ones grow proportionally; parquet-backed plans use
    footer metadata, in-memory plans fall back to one count."""
    from tiki_e_commerce_analytics_etl_spark.operators import sampling

    small = spark.range(100).withColumnRenamed("id", "doc_id")
    assert sampling.auto_shards(small) == 8                       # floor
    assert sampling.auto_shards(small, rows_per_shard=10) == 10   # ceil(100/10)
    assert sampling.auto_shards(small, rows_per_shard=7) == 15    # ceil(100/7)
    assert sampling.auto_shards(small, rows_per_shard=1, n_max=32) == 32  # cap

    p = str(tmp_path / "docs.parquet")
    spark.range(1000).withColumnRenamed("id", "doc_id").write.parquet(p)
    pq = spark.read.parquet(p)
    assert sampling.auto_shards(pq, rows_per_shard=100) == 10     # footer route
    # shuffle_shards(n_shards=None) routes through the default
    out = sampling.shuffle_shards(pq, n_shards=None)
    assert out.select("shard").distinct().count() == 8            # floor at 1k rows


def test_streaming_quality_gate_quarantines_exactly_once(spark, tmp_path):
    """The quality gate rides the STORE config through the streaming
    face: foreachBatch micro-batches quarantine failing docs with the
    batch id as txn version, availableNow replays are no-ops, and the
    quarantine set equals the one-shot gopher verdicts."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines.ingest import IngestStore
    from tiki_e_commerce_analytics_etl_spark.streaming.incremental import (
        foreach_batch_ingest,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    store = IngestStore(
        str(tmp_path / "root"), m_bits=1 << 12, quality_mode="gopher"
    )
    schema = "doc_id long, text string"
    spark.createDataFrame([(1, _GOOD), (2, _BAD)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(foreach_batch_ingest(store))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    spark.createDataFrame(
        [(3, _GOOD + " more"), (4, _BAD + " zz")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    run_once()  # idempotent restart: nothing new, state unchanged
    assert sorted(
        r.doc_id for r in acid_mod.read_atomic(spark, store.corpus).collect()
    ) == [1, 3]
    assert sorted(
        r.doc_id for r in acid_mod.read_atomic(spark, store.quarantine).collect()
    ) == [2, 4]


def test_bootstrap_vector_index_bulk_seed(spark, tmp_path):
    """Bulk index bootstrap: exact-dedup-only seed of a fresh store
    (no semantic screen — the initial-load path for already-curated
    corpora); afterwards incremental batches screen against the bulk
    history exactly as if it had been ingested batch-wise, ANN serves
    it, replay is a no-op, and a non-empty store is refused."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = ingest_mod.IngestStore(
        str(tmp_path / "root"), m_bits=1 << 12, ivf_clusters=2, sem_threshold=0.95
    )
    seed = _mk_vdocs(
        spark,
        [
            (1, "alpha doc", [1.0, 0.0]),
            (2, "alpha doc", [1.0, 0.0]),     # exact dup: dropped
            (3, "near of one", [0.99, 0.14]), # semantic dup: KEPT (bulk)
            (4, "ortho doc", [0.0, 1.0]),
        ],
    )
    r = ingest_mod.bootstrap_vector_index(spark, store, seed, 0)
    assert r == {"seeded": 3, "in_batch_dups": 1, "quarantined": 0}
    assert sorted(
        x["doc_id"] for x in acid_mod.read_atomic(spark, store.corpus).collect()
    ) == [1, 3, 4]
    # incremental batch screens against the bulk history
    b1 = _mk_vdocs(
        spark, [(5, "close to four", [0.05, 1.0]), (6, "far away", [-1.0, 0.3])]
    )
    r1 = ingest_mod.ingest_batch_vectors(spark, store, b1, 1)
    assert r1["sem_rejected_history"] == 1 and r1["admitted"] == 1
    # ANN serves bulk + incremental rows
    q = _mk_vdocs(spark, [(9, "q", [0.0, 1.0])]).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    got = ingest_mod.vector_index_topk(spark, store, q, k=1, nprobe=2).collect()
    assert [x["neighbor_id"] for x in got] == [4]
    # replay no-op; non-empty store refused for a NEW seed
    assert ingest_mod.bootstrap_vector_index(spark, store, seed, 0) == {
        "replay_skipped": True
    }
    with pytest.raises(ValueError, match="EMPTY store"):
        ingest_mod.bootstrap_vector_index(spark, store, seed, 7)


def test_bootstrap_vector_index_crash_recovers(spark, tmp_path, monkeypatch):
    """Crash after the bootstrap's corpus commit: redelivery finishes
    hashes/bloom/vectors from the change feed against the
    already-committed centroid basis."""
    from tiki_e_commerce_analytics_etl_spark import acid as acid_mod
    from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

    store = ingest_mod.IngestStore(
        str(tmp_path / "root"), m_bits=1 << 12, ivf_clusters=2
    )
    seed = _mk_vdocs(
        spark, [(1, "one doc", [1.0, 0.0]), (2, "two doc", [0.0, 1.0])]
    )
    real_commit = acid_mod.atomic_overwrite_partitions
    state = {"calls": 0}

    def crashing(df, path, **kw):
        state["calls"] += 1
        if state["calls"] == 3:  # centroids=1, corpus=2, crash at hashes
            raise RuntimeError("injected crash")
        return real_commit(df, path, **kw)

    monkeypatch.setattr(acid_mod, "atomic_overwrite_partitions", crashing)
    monkeypatch.setattr(ingest_mod.acid, "atomic_overwrite_partitions", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_mod.bootstrap_vector_index(spark, store, seed, 0)
    monkeypatch.setattr(acid_mod, "atomic_overwrite_partitions", real_commit)
    monkeypatch.setattr(ingest_mod.acid, "atomic_overwrite_partitions", real_commit)
    r = ingest_mod.bootstrap_vector_index(spark, store, seed, 0)
    assert r["recovered_replay"] is True
    vrows = acid_mod.read_atomic(spark, store.vectors)
    assert sorted(x["__id"] for x in vrows.collect()) == [1, 2]
    # and the healed store keeps screening
    r1 = ingest_mod.ingest_batch_vectors(
        spark, store, _mk_vdocs(spark, [(3, "near one", [0.999, 0.01])]), 1
    )
    assert r1["sem_rejected_history"] == 1


def test_write_training_shards_auto_resolves_in_manifest(spark, tmp_path):
    """n_shards=None resolves through auto_shards BEFORE sharding so
    the manifest records the actual count a loader must expect, and
    verification passes on the auto-sharded export."""
    from tiki_e_commerce_analytics_etl_spark import io as io_mod

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    path = str(tmp_path / "auto_shards")
    manifest = io_mod.write_training_shards(df, path, n_shards=None)
    assert manifest["n_shards"] == 8  # the floor at toy scale
    assert len(manifest["shards"]) <= 8 and manifest["total_rows"] == 50
    ok = io_mod.verify_training_shards(spark, path)
    assert all(r["ok"] for r in ok.collect())


def test_bench_prior_medians_tolerates_missing_and_corrupt(tmp_path):
    """The --full drift compare must never break the bench on a
    missing or corrupt prior artifact (first run, interrupted write)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    assert bench._prior_medians(str(tmp_path / "nope.json")) == {}
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert bench._prior_medians(str(bad)) == {}
    good = tmp_path / "good.json"
    good.write_text('{"medians": {"q": 1.5}}')
    assert bench._prior_medians(str(good)) == {"q": 1.5}


# ---------------------------------------------------------------------------
# Round 11 #6: sig_count_hint / stats-sidecar route for agree="auto"
# ---------------------------------------------------------------------------


def _sig_table(spark, n=40, diverse=True):
    rows = [
        (i, f"{(i * 2654435761 % (1 << 64)) if diverse else (i % 3):016x}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "img_id long, sig string")


def test_auto_agree_hint_skips_probe_and_matches_probe_route(
    spark, monkeypatch
):
    """With sig_count_hint the auto route resolves at plan time: the
    approx_count_distinct probe never runs (patched to explode), and
    the chosen route matches what the probe would have chosen — pair
    output identical both above and below the crossover."""
    from tiki_e_commerce_analytics_etl_spark.operators import dedup

    sigs = _sig_table(spark)
    want_diverse = dedup.hex_hamming_pairs(
        sigs, "img_id", "sig", radius=2, agree="auto", auto_threshold=10
    ).collect()
    want_dupy = dedup.hex_hamming_pairs(
        sigs, "img_id", "sig", radius=2, agree=1
    ).collect()

    def boom(*a, **k):
        raise AssertionError("counting probe must not run with a hint")

    monkeypatch.setattr(dedup, "_auto_agree", boom)
    got_diverse = dedup.hex_hamming_pairs(
        sigs, "img_id", "sig", radius=2, agree="auto",
        auto_threshold=10, sig_count_hint=40,
    ).collect()
    got_dupy = dedup.hex_hamming_pairs(
        sigs, "img_id", "sig", radius=2, agree="auto",
        auto_threshold=10, sig_count_hint=3,
    ).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(got_diverse) == key(want_diverse)
    assert key(got_dupy) == key(want_dupy)


def test_auto_agree_stats_sidecar_route(spark, tmp_path, monkeypatch):
    """An engine-written signature table (io.write_partitioned with
    key_cols) publishes distinct_<sig>; hex_hamming_pairs consumes it
    via stats_path with zero counting jobs.  A path without the stat
    falls back to the probe."""
    from tiki_e_commerce_analytics_etl_spark import io as io_mod
    from tiki_e_commerce_analytics_etl_spark.operators import dedup

    sigs = _sig_table(spark)
    p = str(tmp_path / "sigs")
    io_mod.write_partitioned(sigs, p, key_cols=["sig"])

    def boom(*a, **k):
        raise AssertionError("counting probe must not run with a sidecar")

    monkeypatch.setattr(dedup, "_auto_agree", boom)
    stored = spark.read.parquet(p)
    got = dedup.hex_hamming_pairs(
        stored, "img_id", "sig", radius=2, agree="auto",
        auto_threshold=10, stats_path=p,
    )
    assert got.count() >= 0  # plan resolves and runs, no probe
    # no sidecar stat -> the probe fallback fires (and here, explodes)
    with pytest.raises(AssertionError, match="probe"):
        dedup.hex_hamming_pairs(
            sigs, "img_id", "sig", radius=2, agree="auto",
            auto_threshold=10, stats_path=str(tmp_path / "nope"),
        )
