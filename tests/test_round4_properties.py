"""Property-based coverage of the round-4 operators against
independent Python models: chunk-level dedup stats, funnel counts,
incremental aggregate maintenance, z-order keys, and shuffle-shard
permutation invariants.  One Spark job per example set (small
max_examples — each example is a distributed run)."""

from __future__ import annotations

import hashlib
import re

import hypothesis.strategies as st
from hypothesis import given, settings
from pyspark.sql import functions as F

# -- models ----------------------------------------------------------------


def _norm_words(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower(), flags=re.ASCII).strip(" ").split(" ")


def _chunks(text: str, k: int, stride: int) -> list[str]:
    ws = _norm_words(text)
    if len(ws) < k:
        return [" ".join(ws)]
    return [" ".join(ws[i : i + k]) for i in range(0, len(ws) - k + 1, stride)]


def _model_chunk_stats(docs: list[tuple[int, str]], k: int, stride: int):
    from collections import Counter, defaultdict

    owners = defaultdict(set)
    per_doc = {}
    for i, t in docs:
        cs = _chunks(t, k, stride)
        per_doc[i] = Counter(cs)
        for c in cs:
            owners[c].add(i)
    out = {}
    for i, cnt in per_doc.items():
        n = sum(cnt.values())
        dup = sum(c for ch, c in cnt.items() if len(owners[ch]) >= 2)
        out[i] = (n, dup)
    return out


_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "yy"])
_doc = st.lists(_word, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=12, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=12), st.integers(2, 5), st.integers(1, 5))
def test_chunk_stats_matches_model(spark, docs, k, stride):
    from tiki_e_commerce_analytics_etl_spark.operators.dedup import duplicate_chunk_stats

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_chunks, r.dup_chunks)
        for r in duplicate_chunk_stats(df, "text", "doc_id", chunk=k, stride=stride).collect()
    }
    assert got == _model_chunk_stats(rows, k, stride)


def _model_funnel(events: list[tuple[int, str, int]], steps: list[str]) -> list[int]:
    """events: (user, type, ts).  Returns per-step user counts."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, e, t in events:
        by_user[u].append((t, e))
    counts = [0] * len(steps)
    for u, evs in by_user.items():
        evs.sort()
        last = None
        for i, s in enumerate(steps):
            cand = [t for t, e in evs if e == s and (last is None or t > last)]
            if not cand:
                break
            last = min(cand)
            counts[i] += 1
    return counts


_event = st.tuples(st.integers(0, 5), st.sampled_from(["a", "b", "c", "z"]), st.integers(0, 50))


@settings(max_examples=12, deadline=None)
@given(st.lists(_event, min_size=1, max_size=40))
def test_funnel_matches_model(spark, events):
    from tiki_e_commerce_analytics_etl_spark.operators.funnel import funnel_counts

    df = spark.createDataFrame(
        [(u, e, t) for u, e, t in events], "user_id int, event_type string, ts long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    steps = ["a", "b", "c"]
    got = {r.step_index: r.users for r in funnel_counts(df, steps).collect()}
    model = _model_funnel(events, steps)
    assert [got[i] for i in range(3)] == model


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(-50, 50)), min_size=1, max_size=40),
    st.integers(1, 39),
)
def test_combine_aggregates_split_invariance(spark, rows, cut):
    """Folding any prefix/suffix split equals the one-shot aggregate."""
    from tiki_e_commerce_analytics_etl_spark.operators.merge import combine_aggregates

    cut = min(cut, len(rows))
    df = spark.createDataFrame(rows, "k int, v long")
    a = spark.createDataFrame(rows[:cut] or [(99, 0)], "k int, v long")
    b = spark.createDataFrame(rows[cut:] or [(99, 0)], "k int, v long")
    kw = dict(sums=["v"], counts=["v"], mins=["v"], maxs=["v"])
    if not rows[:cut]:
        a = a.filter("k < -1000")
    if not rows[cut:]:
        b = b.filter("k < -1000")
    folded = combine_aggregates(combine_aggregates(None, a, ["k"], **kw), b, ["k"], **kw)
    full = combine_aggregates(None, df, ["k"], **kw)
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, full.collect()))


def _model_zorder(vals: list[tuple[int, int]], bits: int) -> list[int]:
    out = []
    mask = (1 << bits) - 1
    for x, y in vals:
        x, y = x & mask, y & mask
        z = 0
        for j in range(bits):
            z |= ((x >> j) & 1) << (2 * j) | ((y >> j) & 1) << (2 * j + 1)
        out.append(z)
    return out


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1 << 20), st.integers(0, 1 << 20)), min_size=1, max_size=50), st.integers(1, 16))
def test_zorder_key_matches_model(spark, vals, bits):
    from tiki_e_commerce_analytics_etl_spark.functions.layout import zorder_key

    df = spark.createDataFrame(vals, "x long, y long")
    got = [r.z for r in df.select(zorder_key(["x", "y"], bits).alias("z")).collect()]
    assert got == _model_zorder(vals, bits)


@settings(max_examples=8, deadline=None)
@given(st.sets(st.integers(0, 10000), min_size=1, max_size=60), st.integers(1, 8))
def test_shuffle_shards_is_a_permutation(spark, ids, n_shards):
    """(shard, pos) is a bijection onto contiguous per-shard ranges and
    matches the md5 model exactly."""
    from tiki_e_commerce_analytics_etl_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = shuffle_shards(df, "doc_id", n_shards=n_shards, seed=3).collect()
    assert len(rows) == len(ids)
    model = {}
    for i in ids:
        h = hashlib.md5(f"3|{i}".encode()).hexdigest()
        model[i] = (int(h[:4], 16) % n_shards, h)
    for r in rows:
        assert r.shard == model[r.doc_id][0]
    # pos order within a shard == md5 order
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append((r.pos, model[r.doc_id][1]))
    for ps in by_shard.values():
        ps.sort()
        hashes = [h for _, h in ps]
        assert hashes == sorted(hashes)
        assert [p for p, _ in ps] == list(range(1, len(ps) + 1))


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 3),
)
@settings(max_examples=8, deadline=None)
def test_pagerank_integer_matches_model(spark, edges, iters):
    from tiki_e_commerce_analytics_etl_spark.operators.graph import pagerank_integer

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.mass for r in pagerank_integer(df, iters=iters).collect()}

    # independent Python model of the integer recurrence
    nodes = {n for e in edges for n in e}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    init, base = 10**12, (10**12 * 15) // 100
    mass = {n: init for n in nodes}
    for _ in range(iters):
        nxt = {n: base for n in nodes}
        for s, d in edges:
            nxt[d] += (85 * mass[s]) // (100 * outdeg[s])
        mass = nxt
    assert got == mass


@given(st.lists(st.integers(0, (1 << 48) - 1), min_size=2, max_size=25, unique=True))
@settings(max_examples=8, deadline=None)
def test_simhash_hamming_pairs_complete_and_exact(spark, sigs):
    """Pigeonhole completeness: EVERY pair within the radius is found
    (no false negatives), distances are exact, nothing above the
    radius leaks through."""
    from tiki_e_commerce_analytics_etl_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    radius = 3
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, simhash48 long"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_hamming_pairs(df, radius=radius).collect()
    }
    want = {}
    for i, a in enumerate(sigs):
        for j in range(i + 1, len(sigs)):
            d = bin(a ^ sigs[j]).count("1")
            if d <= radius:
                want[(i, j)] = d
    assert got == want
