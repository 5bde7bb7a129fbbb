"""Vocabulary-free text featurization: the hashing trick + TF-IDF,
computed with pure DataFrame expressions.

The feature side of a trainable corpus-quality classifier (CCNet /
fastText-style filtering): each token maps to a fixed-width feature
index through the portable 48-bit md5 hash (no vocabulary build, no
driver state, new tokens never change the schema), weighted by
tf × rational-idf.  Output is SPARSE (doc, feature, weight) triples —
the relational form that joins, aggregates, and feeds
``ml.assemble_sparse_vectors`` for pyspark.ml estimators.

Determinism: idf uses the RATIONAL form (n_docs + 1) / (df + 1) — no
transcendental log whose libm rounding could differ across engines —
computed in IEEE double (exact-rounded, engine-identical) and cast to
DECIMAL(28,10) per (doc, term) BEFORE the hash-bucket sum, so tokens
colliding into one feature accumulate in order-free decimal exactly as
``ranking.bm25_topk`` does.  The ``hashed_tfidf`` query's DuckDB twin
reproduces every weight bit-for-bit.

Scale shape: one explode over the corpus, tf as one (doc, term) hash
agg, df as one (term) hash agg (bounded by vocabulary, uniform md5
keys), a broadcast of the df table only if the caller prunes it —
here df flows through an ordinary hash join on term since the
vocabulary is unbounded; the final (doc, feature) agg reuses the
(doc,) co-location.  No driver collection at any point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import md5_48


def hashed_tfidf(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
) -> DataFrame:
    """Sparse hashed TF-IDF triples ``(id_col, feature, weight)``.

    feature = md5_48(token) mod dim; weight = Σ_{tokens→feature}
    decimal(tf · (n_docs+1)/(df+1)), cast to double at the end.
    """
    from .text import words

    tok = docs.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(id_col).agg(F.count(F.lit(1)).alias("n_docs"))
    idf = (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            (md5_48(F.col("term")) % F.lit(dim)).alias("feature"),
            (F.col("tf").cast("double") * idf).cast("decimal(28,10)").alias("__w"),
        )
        .groupBy(id_col, "feature")
        .agg(F.sum("__w").cast("double").alias("weight"))
    )
