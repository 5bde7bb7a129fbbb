"""Lexical retrieval scoring (BM25) — the text twin of the embedding
top-k: score documents against small keyword queries and return the
top-k per query.  Training-data pipelines use this shape for targeted
corpus slicing ("pull the docs about X") and for hybrid dedup/quality
heuristics.

Scale shape: the inverted statistics (term frequency, document
frequency, document length) are plain hash aggregates over the
exploded token stream; the query set is tiny and BROADCAST, so the
(doc, term) stream is filtered map-side to query terms before anything
shuffles.  The per-(query, doc) score sum goes through fixed-scale
DECIMAL so the unordered aggregation is order-free and engine-exact
(float + is non-associative), and the final top-k is a per-query
ranking window over the scored (tiny) candidate set.

Determinism note: idf uses the RATIONAL Robertson–Sparck-Jones odds
(N - df + 0.5) / (df + 0.5) WITHOUT the logarithm.  ln() is not
required to be correctly rounded and differs across libm
implementations, which would break bit-exact cross-engine checks; the
rational form preserves the ranking direction (it is monotone in the
log's argument), stays positive, and is exactly reproducible
everywhere.  Rankings differ from textbook BM25 only when scores mix
extreme idf magnitudes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 (rational-idf variant).

    ``query_terms``: (query_id, term) rows — one row per query term;
    duplicate terms within a query count once (set semantics, the
    standard bag-of-query simplification).

    Returns (query_id, doc_id, score, rank), ties broken by doc_id.
    """
    from tiki_e_commerce_analytics_etl_spark.operators.text import words

    qt = query_terms.select("query_id", "term").distinct()

    tok = docs.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # Document length re-aggregates tf rather than re-scanning the raw
    # token stream: one fewer explode+shuffle over the corpus, and the
    # (doc, term) partitioning already co-locates each doc's terms.
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )

    # Document frequency ONLY for query terms: semi-join the per-term
    # doc counts against the broadcast query vocabulary, then the
    # result (|query vocab| rows) broadcasts onward.
    dfreq = (
        tf.join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    matched = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )

    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    contribution = idf * (tf_d * F.lit(k1 + 1.0)) / denom

    scored = (
        matched.select(
            "query_id",
            F.col(id_col),
            contribution.cast("decimal(28,10)").alias("__c"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("__c").cast("double").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    )
