"""Model-based coverage for the subword tokenizer: vocabulary
training (top-k grams, deterministic tiebreak) and greedy
longest-match application."""

from __future__ import annotations

from collections import Counter


from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops


def _model_vocab(docs, min_len=2, max_len=6, k=200):
    wf = Counter()
    for _, t in docs:
        for w in t.lower().split():
            wf[w] += 1
    grams = Counter()
    for w, c in wf.items():
        for length in range(min_len, max_len + 1):
            for s in range(0, len(w) - length + 1):
                grams[w[s : s + length]] += c
    return sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _greedy(w, vocab, max_len=6):
    pos, n = 0, 0
    while pos < len(w):
        adv = 1
        for ln in range(min(max_len, len(w) - pos), 1, -1):
            if w[pos : pos + ln] in vocab:
                adv = ln
                break
        pos += adv
        n += 1
    return n


def test_subword_vocab_model(spark):
    docs = [(1, "banana bandana"), (2, "banana ban")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["tok"], r["cnt"]) for r in text_ops.subword_vocab(df, k=10).collect()]
    assert got == [(t, c) for t, c in _model_vocab(docs, k=10)]


def test_subword_tokenize_model(spark):
    docs = [(1, "banana bandana banana"), (2, "xyz q banana")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    vocab_df = text_ops.subword_vocab(df, k=5)
    vocab = frozenset(r["tok"] for r in vocab_df.collect())
    got = {
        r["id"]: (r["n_words"], r["n_subwords"])
        for r in text_ops.subword_token_counts(df, vocab_df).collect()
    }
    wf = {1: Counter(["banana", "bandana", "banana"]), 2: Counter(["xyz", "q", "banana"])}
    expect = {
        i: (
            sum(c.values()),
            sum(n * _greedy(w, vocab) for w, n in c.items()),
        )
        for i, c in wf.items()
    }
    assert got == expect


def test_subword_tokenize_single_char_fallback(spark):
    # vocab built elsewhere; word made of unknown chars still counts
    # one token per char (no <unk> loss)
    df = spark.createDataFrame([(1, "qq zz")], "doc_id long, text string")
    vocab_df = spark.createDataFrame([("ab",)], "tok string")
    got = text_ops.subword_token_counts(df, vocab_df).collect()[0]
    assert (got["n_words"], got["n_subwords"]) == (2, 4)


def test_subword_longest_match_wins(spark):
    # "abc" in vocab beats "ab": one token, not two
    df = spark.createDataFrame([(1, "abcd")], "doc_id long, text string")
    vocab_df = spark.createDataFrame([("ab",), ("abc",)], "tok string")
    got = text_ops.subword_token_counts(df, vocab_df).collect()[0]
    assert got["n_subwords"] == 2  # 'abc' + 'd'
