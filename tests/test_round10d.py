"""Round-10 fourth-wave operators: cluster representative selection,
hard-negative mining, and int8 scalar-quantized embedding search.

Each test plants a hand-computable input and checks EXACT values; the
oracle gate (tools/check.py) separately proves bit-exactness against
DuckDB at three SFs for the query-level compositions.
"""

import pytest
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import graph


# ---------------------------------------------------------------------------
# cluster_best_members — keep the best copy, not the min id
# ---------------------------------------------------------------------------


def test_cluster_best_members_picks_max_quality(spark):
    # Component {1,2,3} via edges 1-2, 2-3; component {7,8}.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    # Doc 3 has the best quality in its cluster — min-id (1) must NOT win.
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.5), (3, 0.9), (7, 0.4), (8, 0.1), (99, 1.0)],
        "doc_id long, quality double",
    )
    out = graph.cluster_best_members(scores, pairs, "doc_id", "quality")
    rows = {r["doc_id"]: r for r in out.collect()}
    # Singleton 99 has no edges: not emitted (connected_components contract).
    assert set(rows) == {1, 2, 3, 7, 8}
    assert rows[3]["is_keeper"] and not rows[1]["is_keeper"] and not rows[2]["is_keeper"]
    assert rows[7]["is_keeper"] and not rows[8]["is_keeper"]
    assert all(rows[i]["component"] == 1 for i in (1, 2, 3))
    assert all(rows[i]["component"] == 7 for i in (7, 8))
    # Quality rides through unchanged.
    assert rows[3]["quality"] == 0.9


def test_cluster_best_members_tie_breaks_to_min_id(spark):
    pairs = spark.createDataFrame([(10, 11), (11, 12)], "id_a long, id_b long")
    scores = spark.createDataFrame(
        [(10, 0.7), (11, 0.7), (12, 0.3)], "doc_id long, quality double"
    )
    out = graph.cluster_best_members(scores, pairs, "doc_id", "quality")
    keepers = [r["doc_id"] for r in out.collect() if r["is_keeper"]]
    assert keepers == [10]


def test_cluster_best_members_exactly_one_keeper_per_component(spark):
    # A denser random-ish graph: chain 0..19 plus a few chords.
    edges = [(i, i + 1) for i in range(19)] + [(0, 5), (7, 15)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    scores = spark.createDataFrame(
        [(i, float((i * 37) % 11)) for i in range(20)],
        "doc_id long, quality double",
    )
    out = graph.cluster_best_members(scores, pairs, "doc_id", "quality").collect()
    comps = {}
    for r in out:
        comps.setdefault(r["component"], []).append(r)
    for comp, members in comps.items():
        ks = [m for m in members if m["is_keeper"]]
        assert len(ks) == 1
        best = max(members, key=lambda m: (m["quality"], -m["doc_id"]))
        assert ks[0]["doc_id"] == best["doc_id"]


# ---------------------------------------------------------------------------
# hard_negatives — mined negatives exclude self and same-label rows
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_hard_negatives_excludes_same_label_and_ranks(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import similarity

    # Query 0 (label 1) points along +x.  Same-label vec 1 is the
    # nearest overall but must be excluded; among different labels,
    # vec 2 (cos=1 direction) beats vec 3 (orthogonal-ish).
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.99, 0.1], 1),   # same label: excluded
        (2, [2.0, 0.0], 2),    # cos = 1.0
        (3, [0.0, 1.0], 2),    # cos = 0.0
        (4, [-1.0, 0.0], 3),   # cos = -1.0
    ]
    emb = _emb(spark, rows)
    out = similarity.hard_negatives(
        emb, emb.filter(F.col("vec_id") == 0), k=3
    ).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(2, 1), (3, 2), (4, 3)]
    assert all(r["neighbor_label"] != r["query_label"] for r in out)


# ---------------------------------------------------------------------------
# int8 scalar quantization
# ---------------------------------------------------------------------------


def test_sq_encode_codes_and_zero_scale_dim(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import similarity

    # Dim 0 max-abs = 4.0, dim 1 max-abs = 2.0, dim 2 all-zero.
    rows = [
        (0, [4.0, -2.0, 0.0], 0),
        (1, [-4.0, 1.0, 0.0], 0),
        (2, [2.0, 0.5, 0.0], 0),
    ]
    emb = _emb(spark, rows)
    scales = similarity.sq_corpus_scales(emb)
    assert scales.collect()[0]["scales"] == [4.0, 2.0, 0.0]
    enc = {r["vec_id"]: r["qvec"] for r in similarity.sq_encode(emb, scales).collect()}
    # floor semantics: 4/4*127 = 127; -2/2*127 = -127; zero-scale dim -> 0
    assert enc[0] == [127, -127, 0]
    assert enc[1] == [-127, 63, 0]     # floor(1.0/2*127) = floor(63.5) = 63
    assert enc[2] == [63, 31, 0]       # floor(63.5)=63, floor(31.75)=31
    # Codes never escape int8 range.
    for q in enc.values():
        assert all(-127 <= v <= 127 for v in q)


def test_sq_topk_matches_exact_on_well_separated_corpus(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import similarity

    # Well-separated directions: quantization cannot flip the ranking.
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 0),
        (3, [0.0, 0.0, 1.0], 0),
        (4, [-1.0, 0.0, 0.0], 0),
    ]
    emb = _emb(spark, rows)
    qs = emb.filter(F.col("vec_id") == 0)
    sq = [r["neighbor_id"] for r in similarity.sq_topk(emb, qs, k=2)
          .orderBy("rank").collect()]
    exact = [r["neighbor_id"] for r in similarity.brute_force_topk(emb, qs, k=2)
             .orderBy("rank").collect()]
    assert sq == exact == [1, 2]


# ---------------------------------------------------------------------------
# training-shard export: deterministic order + verifiable manifest
# ---------------------------------------------------------------------------


def test_write_training_shards_roundtrip_and_verify(spark, tmp_path):
    from tiki_e_commerce_analytics_etl_spark import io as io_mod
    from tiki_e_commerce_analytics_etl_spark.operators.sampling import (
        shuffle_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}", (i % 7) + 1) for i in range(50)],
        "doc_id long, text string, tokens int",
    )
    path = str(tmp_path / "export")
    m1 = io_mod.write_training_shards(
        docs, path, token_col="tokens", n_shards=4, seed=7
    )
    assert m1["total_rows"] == 50 and len(m1["shards"]) <= 4
    assert sum(s["rows"] for s in m1["shards"].values()) == 50
    assert sum(s["tokens"] for s in m1["shards"].values()) == sum(
        (i % 7) + 1 for i in range(50)
    )

    # loader-side verification: every shard ok
    v = io_mod.verify_training_shards(spark, path).collect()
    assert v and all(r["ok"] for r in v)

    # determinism: re-export reproduces the manifest exactly
    m2 = io_mod.write_training_shards(
        docs, str(tmp_path / "export2"), token_col="tokens", n_shards=4, seed=7
    )
    assert m1["shards"] == m2["shards"]
    # a different seed is a different permutation
    m3 = io_mod.write_training_shards(
        docs, str(tmp_path / "export3"), token_col="tokens", n_shards=4, seed=8
    )
    assert m1["shards"] != m3["shards"]

    # the files really are in serving order (pos ascending per shard),
    # and (shard, pos) agrees with shuffle_shards' logical permutation
    got = spark.read.parquet(path)
    want = shuffle_shards(docs, n_shards=4, seed=7)
    assert (
        got.select("doc_id", "shard", "pos")
        .exceptAll(want.select("doc_id", "shard", "pos"))
        .count()
        == 0
    )
    import pandas as pd  # noqa: F401

    for shard in set(r["shard"] for r in v):
        pos_list = [
            r["pos"]
            for r in got.filter(F.col("shard") == shard)
            .orderBy("pos")
            .collect()
        ]
        assert pos_list == list(range(1, len(pos_list) + 1))


def test_verify_training_shards_detects_tamper(spark, tmp_path):
    from tiki_e_commerce_analytics_etl_spark import io as io_mod

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(30)], "doc_id long, text string"
    )
    path = str(tmp_path / "export")
    io_mod.write_training_shards(docs, path, n_shards=2, seed=7)

    # tamper: drop one shard's files entirely
    import glob
    import os
    import shutil

    shard_dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    assert len(shard_dirs) == 2
    shutil.rmtree(shard_dirs[1])
    v = {r["shard"]: r["ok"] for r in io_mod.verify_training_shards(spark, path).collect()}
    assert len(v) == 2
    assert sum(1 for ok in v.values() if not ok) == 1


# ---------------------------------------------------------------------------
# stratified_quota_sample — exact counts, deterministic membership
# ---------------------------------------------------------------------------


def test_stratified_quota_exact_counts_and_determinism(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import sampling

    rows = [(i, "en" if i % 3 else "es") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_quota_sample(df, "doc_id", "lang", {"en": 7, "es": 5})
    got = out.groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in got} == {"en": 7, "es": 5}
    # deterministic: same inputs -> same membership and ranks
    a = sorted((r["doc_id"], r["sample_rank"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in sampling.stratified_quota_sample(
            df, "doc_id", "lang", {"en": 7, "es": 5}
        ).collect()
    )
    assert a == b
    # ranks are 1..quota within each stratum
    per = {}
    for r in out.collect():
        per.setdefault(r["lang"], []).append(r["sample_rank"])
    assert sorted(per["en"]) == list(range(1, 8))
    assert sorted(per["es"]) == list(range(1, 6))


def test_stratified_quota_default_and_oversize_quota(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import sampling

    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr")], "doc_id long, lang string"
    )
    # unlisted stratum drops entirely at default_quota=0
    out = sampling.stratified_quota_sample(df, "doc_id", "lang", {"en": 10})
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]
    # quota above the stratum size keeps the whole stratum
    out2 = sampling.stratified_quota_sample(
        df, "doc_id", "lang", {"fr": 99}, default_quota=1
    )
    got = {r["lang"]: r["doc_id"] for r in out2.collect()}
    assert got["fr"] == 3 and "en" in got


# ---------------------------------------------------------------------------
# collapse_word_stutter / vocab_growth
# ---------------------------------------------------------------------------


def test_collapse_word_stutter_hand_computed(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "batch batch batch stream stream spark"),
            (2, "a a b a a a c"),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text_ops.collapse_word_stutter(df).collect()}
    assert out[1]["clean_text"] == "batch stream spark"
    assert (out[1]["n_words"], out[1]["kept_words"]) == (6, 3)
    # non-adjacent repeats survive (this is stutter removal, not dedup)
    assert out[2]["clean_text"] == "a b a c"
    assert out[3]["clean_text"] == "solo" and out[3]["kept_words"] == 1


def test_vocab_growth_monotone_and_exact_on_planted_corpus(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    # 10 docs: doc i introduces exactly one new word and repeats word 0.
    rows = [(i, f"w{i} w0") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r["decile"], r["cum_vocab"], r["cum_tokens"])
        for r in text_ops.vocab_growth(df, deciles=5).collect()
    )
    assert len(out) == 5
    # monotone non-decreasing in both cumulative measures
    for a, b in zip(out, out[1:]):
        assert b[1] >= a[1] and b[2] >= a[2]
    # final checkpoint covers the whole corpus exactly
    assert out[-1][1] == 10  # w0..w9 (w0 introduced by doc 0)
    assert out[-1][2] == 20  # 2 tokens per doc


def test_training_export_plan_invariants(spark):
    """The composed release plan: no near-dup pair straddles a split,
    every surviving cluster kept exactly its best member, train rows
    carry dense (shard, pos) serving order, val/test ride shard -1."""
    import __spark_entry__ as entry

    out = entry.q_training_export_plan(spark, "/root/testdata/sf0.001").collect()
    assert out
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values()), "split leaked a cluster"
    # one surviving member per multi-doc component at most
    from collections import Counter

    comp_counts = Counter(r["component"] for r in out)
    # components that had near-dups were reduced to their keeper; a
    # component id can appear once only (plus unrelated singletons
    # keyed by their own id, which are distinct ids by construction)
    assert max(comp_counts.values()) == 1
    for r in out:
        if r["split"] == "train":
            assert 0 <= r["shard"] < 8
        else:
            assert r["shard"] == -1
    pos_per = {}
    for r in out:
        pos_per.setdefault((r["split"], r["shard"]), []).append(r["pos"])
    for key, ps in pos_per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), key
    assert all(r["quality"] >= 0.3 for r in out)


# ---------------------------------------------------------------------------
# randomized cross-checks against pure-Python references
# ---------------------------------------------------------------------------


def test_cluster_best_members_matches_python_reference_on_random_graphs(spark):
    """Seeded random graphs: pointer-jumping CC + max_by argmax must
    agree with a brute-force union-find + python argmax."""
    import random

    rng = random.Random(421)
    for trial in range(4):
        n = rng.randint(5, 25)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(1, 2 * n))
            }
        )
        quality = {i: rng.randint(0, 5) / 4.0 for i in range(n)}

        parent = list(range(n))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp = {}
        for i in range(n):
            comp.setdefault(find(i), []).append(i)
        want = {}
        for members in comp.values():
            if len(members) < 2:
                continue
            label = min(members)
            keeper = max(members, key=lambda m: (quality[m], -m))
            for m in members:
                want[m] = (label, keeper == m)

        from tiki_e_commerce_analytics_etl_spark.operators import graph

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        scores = spark.createDataFrame(
            [(i, quality[i]) for i in range(n)], "doc_id long, quality double"
        )
        got = {
            r["doc_id"]: (r["component"], r["is_keeper"])
            for r in graph.cluster_best_members(scores, pairs).collect()
        }
        assert got == want, f"trial {trial}: {edges}"


def test_sq_encode_matches_numpy_reference_on_random_vectors(spark):
    import math
    import random

    rng = random.Random(99)
    dim = 6
    rows = [
        (i, [rng.uniform(-3, 3) for _ in range(dim)], 0) for i in range(30)
    ]
    # float32 narrowing happens at createDataFrame; mirror it
    import numpy as np

    from tiki_e_commerce_analytics_etl_spark.operators import similarity

    emb = _emb(spark, rows)
    vecs = {r[0]: np.array(r[1], dtype=np.float32).astype(np.float64) for r in rows}
    scales = np.max(
        np.abs(np.stack(list(vecs.values()))), axis=0
    )
    got = {
        r["vec_id"]: list(r["qvec"])
        for r in similarity.sq_encode(
            emb, similarity.sq_corpus_scales(emb)
        ).collect()
    }
    for vid, v in vecs.items():
        want = [
            0 if s == 0.0 else math.floor(x * 127.0 / s)
            for x, s in zip(v, scales)
        ]
        assert got[vid] == want, vid


def test_collapse_word_stutter_matches_python_reference(spark):
    import random

    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    rng = random.Random(7)
    vocab = ["a", "bb", "ccc"]
    rows = []
    for i in range(20):
        n = rng.randint(1, 12)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in text_ops.collapse_word_stutter(df).collect()
    }
    for i, t in rows:
        ws = t.split(" ")
        want = [w for j, w in enumerate(ws) if j == 0 or w != ws[j - 1]]
        assert got[i] == " ".join(want), (i, t)
