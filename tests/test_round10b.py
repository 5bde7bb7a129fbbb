"""Round-10 second-wave operators: Kneser-Ney bigram LM + CCNet
perplexity buckets, the full Gopher repetition suite, DSIR importance
weights, substring-level decontamination.

Each test plants a hand-computable corpus and checks EXACT values or
published invariants — the oracle gate (tools/check.py) separately
proves bit-exactness against DuckDB at three SFs.
"""

import math

import pytest
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import dedup as dedup_ops
from tiki_e_commerce_analytics_etl_spark.operators import features as feat_ops
from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops


def _docs(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM
# ---------------------------------------------------------------------------


def _py_kn(texts):
    """Independent pure-Python interpolated-KN reference (d = 3/4)."""
    from collections import Counter

    bigrams = Counter()
    for t in texts:
        ws = t.lower().split()
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] += 1
    cpre = Counter()
    n1p = Counter()
    ncont = Counter()
    for (a, b), c in bigrams.items():
        cpre[a] += c
        n1p[a] += 1
        ncont[b] += 1
    D = len(bigrams)
    out = {}
    for (a, b), c in bigrams.items():
        p = (max(4 * c - 3, 0) * D + 3 * n1p[a] * ncont[b]) / (
            4.0 * cpre[a] * D
        )
        out[(a, b)] = (c, cpre[a], n1p[a], ncont[b], math.floor(1e9 * p))
    return out


def test_kn_bigram_lm_matches_independent_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog and a bird",
        "the bird sat on the cat",
    ]
    lm = {
        (r["w1"], r["w2"]): (
            r["cbg"],
            r["cpre"],
            r["n1p"],
            r["ncont"],
            r["prob_ppb"],
        )
        for r in text_ops.kn_bigram_lm(_docs(spark, texts)).collect()
    }
    assert lm == _py_kn(texts)


def test_kn_probabilities_sum_to_one_per_prefix(spark):
    """Interpolated KN is a proper distribution: summed over the FULL
    vocabulary (seen continuations from the table + the unseen-w2
    continuation mass 3·n1p·ncont(w2)/(4·cpre·D) for every other
    vocab word), each prefix's probabilities total 1."""
    texts = [
        "alpha beta gamma alpha beta delta",
        "beta gamma delta alpha gamma gamma",
        "delta alpha beta beta gamma alpha",
    ]
    rows = text_ops.kn_bigram_lm(_docs(spark, texts)).collect()
    vocab = {r["w1"] for r in rows} | {r["w2"] for r in rows}
    ncont = {r["w2"]: r["ncont"] for r in rows}
    D = sum(n for _, n in {(r["w2"], r["ncont"]) for r in rows})
    by_pre = {}
    for r in rows:
        by_pre.setdefault(r["w1"], []).append(r)
    for w1, rs in by_pre.items():
        cpre, n1p = rs[0]["cpre"], rs[0]["n1p"]
        seen = {r["w2"] for r in rs}
        total = sum(
            (max(4 * r["cbg"] - 3, 0) * D + 3 * n1p * r["ncont"])
            / (4.0 * cpre * D)
            for r in rs
        )
        total += sum(
            3 * n1p * ncont.get(w2, 0) / (4.0 * cpre * D)
            for w2 in vocab - seen
        )
        assert total == pytest.approx(1.0, abs=1e-12)


def test_kn_doc_logprob_ranks_fluent_above_scrambled(spark):
    """A held-out doc written in the training distribution must score
    a strictly higher mean logprob than a doc of never-seen words, and
    every logprob is finite (the add-one continuation floor)."""
    train_texts = [
        "the cat sat on the mat and the dog sat on the log",
        "the dog ran to the cat and the cat ran to the mat",
    ] * 3
    train = _docs(spark, train_texts)
    score = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),
            (101, "zq xv qj zz vv xx"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r["logprob_unats"]
        for r in text_ops.kn_doc_logprob(train, score).collect()
    }
    assert set(out) == {100, 101}
    assert out[100] > out[101]
    assert all(v is not None and v < 0 for v in out.values())


def test_kn_doc_logprob_unseen_prefix_backs_off(spark):
    """One scored bigram whose prefix never appears in training: the
    probability must be the smoothed continuation mass
    (ncont+1)/(D+V+1) — checked to the exact micro-nat."""
    train = _docs(spark, ["a b a b a c"])
    # training bigrams: (a,b)x2, (b,a)x2, (a,c) -> D=3, V=3
    # scored doc: "zz b" -> prefix zz unseen, ncont(b)=1
    score = spark.createDataFrame([(10, "zz b")], "doc_id long, text string")
    [r] = text_ops.kn_doc_logprob(train, score).collect()
    p = (1 + 1) / (3 + 3 + 1)
    assert r["n_bigrams"] == 1
    assert r["logprob_unats"] == math.floor(1e6 * math.log(p))


# ---------------------------------------------------------------------------
# Gopher repetition suite
# ---------------------------------------------------------------------------


def test_gopher_repetition_planted_values(spark):
    docs = _docs(
        spark,
        [
            "ab cd ab cd ab cd",  # "ab cd" 2-gram repeats
            "one two three four five six seven",  # all unique
            "p q r s t p q r s t x y",  # repeated 5-gram
        ],
    )
    out = {r["id"]: r.asDict() for r in text_ops.gopher_repetition(docs).collect()}

    # doc 0: n_chars=17; 2-grams: "ab cd" x3 (len 5), "cd ab" x2 (len 5)
    d0 = out[0]
    assert d0["n_words"] == 6 and d0["n_chars"] == 17
    assert d0["top_2_ppm"] == (1_000_000 * 3 * 5) // 17
    # 3-grams: "ab cd ab" x2 (len 8), "cd ab cd" x2 (len 8) -> top 16
    assert d0["top_3_ppm"] == (1_000_000 * 2 * 8) // 17
    # no 5-word-or-longer repeats
    assert d0["dup_5_ppm"] == 0

    # doc 1: nothing repeats at any n
    d1 = out[1]
    assert all(
        d1[k] == 0
        for k in d1
        if k.startswith(("top_", "dup_"))
    )

    # doc 2: "p q r s t" (len 9) occurs twice -> dup_5 covers 2*9 chars
    d2 = out[2]
    assert d2["n_chars"] == 23
    assert d2["dup_5_ppm"] == (1_000_000 * 2 * 9) // 23
    assert d2["dup_6_ppm"] == 0  # no 6-gram repeats


def test_gopher_repetition_short_docs_zero_not_missing(spark):
    """A 1-word document emits a row (all n-gram metrics 0), not a
    missing row — filters consume the suite as a per-doc join."""
    docs = _docs(spark, ["single", "pair pair"])
    out = {r["id"]: r.asDict() for r in text_ops.gopher_repetition(docs).collect()}
    assert out[0]["n_words"] == 1
    assert out[0]["top_2_ppm"] == 0
    assert out[1]["top_2_ppm"] == 0  # "pair pair" has ONE 2-gram (no repeat)


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def test_dsir_weights_tilt_toward_target(spark):
    """Docs made of the target domain's marker vocabulary score higher
    importance weights than off-domain docs; weights match the
    independent Python formula exactly at the micro-nat."""
    texts = (
        ["medical patient dosage trial clinical"] * 4
        + ["football referee goal penalty stadium"] * 4
        + ["medical trial patient outcome", "football goal crowd cheer"]
    )
    raw = _docs(spark, texts)
    target = raw.filter(F.col("doc_id") < 4)  # the medical slice
    out = {
        r["id"]: r["dsir_unats"]
        for r in feat_ops.dsir_weights(raw, target, dim=256).collect()
    }
    assert out[8] > out[9]  # medical-ish doc beats football-ish doc
    assert min(out[i] for i in range(4)) > max(out[i] for i in range(4, 8))


def test_dsir_weights_independent_reference(spark):
    """Exact micro-nat equality with a pure-Python reimplementation
    (same md5-mod hashing, same Laplace smoothing, same bucket-ascending
    summation order)."""
    import hashlib
    from collections import Counter

    texts = ["alpha beta gamma", "beta beta delta", "alpha delta delta epsilon"]
    dim = 64

    def f(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:12], 16) % dim

    raw_toks = [[f(w) for w in t.lower().split()] for t in texts]
    tgt_toks = raw_toks[:1]
    cr = Counter(x for ts in raw_toks for x in ts)
    ct = Counter(x for ts in tgt_toks for x in ts)
    tr = sum(cr.values())
    tt = sum(ct.values())
    expected = {}
    for i, ts in enumerate(raw_toks):
        tf = Counter(ts)
        tot = 0.0
        for b in sorted(tf):
            term = tf[b] * (
                math.log((ct[b] + 1) / (tt + dim))
                - math.log((cr[b] + 1) / (tr + dim))
            )
            tot += term
        expected[i] = math.floor(1e6 * tot)

    raw = _docs(spark, texts)
    out = {
        r["id"]: r["dsir_unats"]
        for r in feat_ops.dsir_weights(
            raw, raw.filter(F.col("doc_id") == 0), dim=dim
        ).collect()
    }
    assert out == expected


# ---------------------------------------------------------------------------
# Substring decontamination
# ---------------------------------------------------------------------------


def test_substring_decontam_planted_span(spark):
    leak = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 words
    corpus = spark.createDataFrame(
        [
            (1, f"intro words then {leak} and a tail"),
            (2, "completely unrelated text with no overlap at all here"),
            (3, f"{leak} right at the start"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"eval question mentioning {leak} verbatim")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: (r["n_eval_partners"], r["max_shared_run_words"])
        for r in dedup_ops.substring_decontaminate(
            corpus, ev, min_words=6
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[1] == (1, 8)
    assert out[3] == (1, 8)


def test_substring_decontam_run_is_exact_not_window_count(spark):
    """A 10-word shared span must report max_shared_run_words == 10
    (streak extension), not the window size or the window count."""
    span = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    corpus = spark.createDataFrame(
        [(1, f"pad {span} pad2")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(2, f"other {span} thing")], "doc_id long, text string"
    )
    [r] = dedup_ops.substring_decontaminate(corpus, ev, min_words=6).collect()
    assert r["max_shared_run_words"] == 10


# ---------------------------------------------------------------------------
# Trigram Kneser-Ney
# ---------------------------------------------------------------------------


def _py_kn3(texts):
    """Independent pure-Python interpolated trigram-KN reference."""
    from collections import Counter

    c123 = Counter()
    for t in texts:
        ws = t.lower().split()
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            c123[(a, b, c)] += 1
    c12 = Counter()
    n1p12 = Counter()
    nc = Counter()
    for (a, b, c), n in c123.items():
        c12[(a, b)] += n
        n1p12[(a, b)] += 1
        nc[(b, c)] += 1
    ncmid = Counter()
    n1p2 = Counter()
    ncont3 = Counter()
    for (b, c), n in nc.items():
        ncmid[b] += n
        n1p2[b] += 1
        ncont3[c] += 1
    d2 = len(nc)
    out = {}
    for (a, b, c), n in c123.items():
        p_mid = (max(4 * nc[(b, c)] - 3, 0) * d2 + 3 * n1p2[b] * ncont3[c]) / (
            4.0 * ncmid[b] * d2
        )
        p = (max(4 * n - 3, 0) + 3.0 * n1p12[(a, b)] * p_mid) / (
            4.0 * c12[(a, b)]
        )
        out[(a, b, c)] = math.floor(1e9 * p)
    return out


def test_kn_trigram_lm_matches_independent_reference(spark):
    texts = [
        "the cat sat on the mat and the cat ran",
        "the dog sat on the log and the dog ran",
        "a cat and a dog sat on a mat",
    ]
    lm = {
        (r["w1"], r["w2"], r["w3"]): r["prob_ppb"]
        for r in text_ops.kn_trigram_lm(_docs(spark, texts)).collect()
    }
    assert lm == _py_kn3(texts)


def test_kn_trigram_probabilities_sum_to_one_per_context(spark):
    """Summed over the full vocabulary (seen trigrams + the backoff
    mass for unseen w3), each (w1, w2) context's probabilities total 1
    — the property that proves both interpolation levels normalize."""
    texts = [
        "x y z x y w x y z q y z",
        "y z x w x y q z y x w q",
    ]
    rows = text_ops.kn_trigram_lm(_docs(spark, texts)).collect()
    vocab = {r["w1"] for r in rows} | {r["w2"] for r in rows} | {r["w3"] for r in rows}
    # reconstruct the middle-model stats from the output columns
    nc = {}
    ncont3 = {}
    n1p2 = {}
    ncmid = {}
    for r in rows:
        nc[(r["w2"], r["w3"])] = r["nc123"]
        ncont3[r["w3"]] = r["ncont3"]
        n1p2[r["w2"]] = r["n1p2"]
        ncmid[r["w2"]] = r["ncmid"]
    d2 = sum(c for _, c in {(w3, ncont3[w3]) for (_, w3) in nc})
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault((r["w1"], r["w2"]), []).append(r)
    for (w1, w2), rs in by_ctx.items():
        c12, n1p12 = rs[0]["c12"], rs[0]["n1p12"]
        seen = {r["w3"] for r in rs}

        def p_mid(w3):
            ncv = nc.get((w2, w3), 0)
            return (
                max(4 * ncv - 3, 0) * d2
                + 3 * n1p2[w2] * ncont3.get(w3, 0)
            ) / (4.0 * ncmid[w2] * d2)

        total = sum(
            (max(4 * r["c123"] - 3, 0) + 3.0 * n1p12 * p_mid(r["w3"]))
            / (4.0 * c12)
            for r in rs
        )
        total += sum(
            3.0 * n1p12 * p_mid(w3) / (4.0 * c12) for w3 in vocab - seen
        )
        assert total == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# Temperature mixing
# ---------------------------------------------------------------------------


def test_temperature_mix_hand_values(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import sampling

    per_source = spark.createDataFrame(
        [("a", 10, 1000), ("b", 5, 8000), ("c", 2, 100)],
        "source string, n_docs long, n_tokens long",
    )
    out = {
        r["source"]: r.asDict()
        for r in sampling.temperature_mix_report(
            per_source, alpha=0.3, budget_tokens=1_000_000
        ).collect()
    }
    ms = {s: n**0.3 for s, n in [("a", 1000), ("b", 8000), ("c", 100)]}
    z = ms["a"] + ms["b"] + ms["c"]  # source-ASC fold order
    for s in ms:
        assert out[s]["q_ppm"] == math.floor(1e6 * ms[s] / z)
        assert out[s]["alloc_tokens"] == math.floor(1e6 * ms[s] / z)
    # alpha < 1 upweights the small source vs proportional mixing
    assert out["c"]["q_ppm"] / 1e6 > 100 / 9100
    assert out["b"]["q_ppm"] / 1e6 < 8000 / 9100
    # the tiny source over-epochs: allocation exceeds its own tokens
    assert out["c"]["epochs_ppm"] > 1_000_000
    # budget conservation (floors may drop a few tokens, never add)
    assert sum(o["alloc_tokens"] for o in out.values()) <= 1_000_000


def test_temperature_mix_alpha_one_is_proportional(spark):
    from tiki_e_commerce_analytics_etl_spark.operators import sampling

    per_source = spark.createDataFrame(
        [("a", 1, 3000), ("b", 1, 1000)],
        "source string, n_docs long, n_tokens long",
    )
    out = {
        r["source"]: r["q_ppm"]
        for r in sampling.temperature_mix_report(
            per_source, alpha=1.0, budget_tokens=100
        ).collect()
    }
    assert out["a"] == 750_000 and out["b"] == 250_000


def test_kn3_doc_logprob_backoff_branches_exact(spark):
    """Each backoff branch checked to the exact micro-nat on a tiny
    hand corpus: seen context, unseen context with seen middle word,
    and fully-unseen middle word (continuation floor)."""
    train = _docs(spark, ["a b c a b c a b d"])
    # trigrams: (a,b,c)x2, (b,c,a)x2, (c,a,b)x2, (a,b,d)
    # c123 table -> nc table: (b,c):1 (only w1=a), (c,a):1, (a,b):1, (b,d):1
    # D2 = 4 distinct (w2,w3); V = 4 (a,b,c,d); dv2 = 9
    # mid: ncmid[b]=2 (nc (b,c)+(b,d)), n1p2[b]=2; ncmid[c]=1, n1p2[c]=1;
    #      ncmid[a]=1, n1p2[a]=1
    # cont3: ncont3[c]=1, ncont3[a]=1, ncont3[b]=1, ncont3[d]=1
    def mid_p(nc0, n1p2, ncont30, ncmid, dv2=9):
        return (max(4 * nc0 - 3, 0) * dv2 + 3 * n1p2 * (ncont30 + 1)) / (
            4.0 * ncmid * dv2
        )

    score = spark.createDataFrame(
        [
            (1, "a b c"),   # seen context (a,b): c12=3, n1p12=2, c123=2
            (2, "x b c"),   # unseen context (x,b), seen middle b
            (3, "x y z"),   # fully unseen -> floor (ncont3[z]=0+1)/9
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r["logprob_unats"]
        for r in text_ops.kn3_doc_logprob(train, score).collect()
    }
    p1 = (max(4 * 2 - 3, 0) + 3.0 * 2 * mid_p(1, 2, 1, 2)) / (4.0 * 3)
    p2 = mid_p(1, 2, 1, 2)
    p3 = 1 / 9
    assert out[1] == math.floor(1e6 * math.log(p1))
    assert out[2] == math.floor(1e6 * math.log(p2))
    assert out[3] == math.floor(1e6 * math.log(p3))


def test_kn3_doc_logprob_ranks_fluent_above_scrambled(spark):
    train_texts = [
        "the cat sat on the mat and the dog sat on the log",
        "the dog ran to the cat and the cat ran to the mat",
    ] * 3
    score = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "zq xv qj zz vv xx")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r["logprob_unats"]
        for r in text_ops.kn3_doc_logprob(_docs(spark, train_texts), score).collect()
    }
    assert out[100] > out[101]
    assert all(v < 0 for v in out.values())
