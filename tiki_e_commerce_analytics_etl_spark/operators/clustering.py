"""Distributed exact k-means (integer-quantized Lloyd) and
cluster-balanced sampling.

``similarity.train_ivf_centroids`` is the THROUGHPUT k-means: it fits
centroids driver-side over a bounded hash-ordered sample (constant
memory at any corpus size) and is the right coarse quantizer for ANN.
This module is the EXACT k-means: every vector votes in every Lloyd
update, all arithmetic is exact int64 over micro-unit-quantized
embeddings, so the result is bit-identical on any engine, any
partitioning, any reduction order — which makes the full iterative
trainer strictly oracle-checkable (DuckDB replays the unrolled
iterations) and reproducible enough to version a 100 TB curation run
on.

Scale shape per Lloyd iteration: assignment is a narrow projection
(k zip_with/aggregate expressions against a BROADCAST one-row
centroid relation — no shuffle of the corpus); the update is one posexplode
(bounded dim fan-out) into a (cluster, pos) hash aggregate whose
output is k x dim rows.  The only driver traffic is that bounded
k x dim centroid table between iterations (the classic Lloyd-on-Spark
shape — MLlib does the same); nothing unbounded collects.

Determinism contract:
- quantization: floor(scale * double(x)) — float32 widens exactly,
  one IEEE multiply, floor;
- init: the quantized vectors of the k smallest ids (deterministic in
  any engine; a quality-first deployment would swap in k-means|| —
  the update machinery is unchanged);
- assignment tie-break: smallest cluster id (array_position of the
  array_min = first occurrence);
- centroid division: bigint `div` (truncation toward zero — matches
  DuckDB's integer `//`);
- empty cluster: keeps its previous centroid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KMEANS_SCALE = 1_000_000


def quantize_vectors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
) -> DataFrame:
    """(id, qv) with qv = floor(scale * double(x)) per dimension — the
    exact-integer form every operator here computes over."""
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(F.lit(float(scale)) * x.cast("double")).cast("long"),
        ).alias("qv"),
    )


def _dist_to(qv, centroid) -> F.Column:
    """Exact int64 squared L2 between the qv column and one centroid —
    an array Column (the broadcast-relation path) or a bounded Python
    list (wrapped as a literal array; fine for nprobe-sized probe
    expressions, NOT for per-iteration trainer plans — see
    assign_exact).  Micro-unit diffs are ~1e6, squared 1e12, x dim 64
    — well inside int64."""
    if not isinstance(centroid, Column):
        centroid = F.array(
            *[F.lit(int(v)).cast("long") for v in centroid]
        )
    return F.aggregate(
        F.zip_with(qv, centroid, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign_exact(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, qv, cluster, dist) against the centroid table: the k
    distance expressions + argmin with first-occurrence (= smallest
    cluster) tie-break, evaluated against a BROADCAST one-row k x dim
    relation rather than k inline literal arrays.  No shuffle of ``q``.

    Why a relation and not literals (guide §7.2/§1.2): the iterative
    trainer calls this with NEW centroid values every round, and k·dim
    inline literals made every round's plan a fresh ~512-literal
    expression tree — measured ~1.2 s of single-threaded DRIVER
    analysis/optimization per Lloyd iteration at k=8, dim=64 (the
    stage itself runs in milliseconds; partition count was irrelevant,
    the wall was planning).  With the values in a broadcast
    LocalRelation the plan is structurally IDENTICAL across rounds —
    constant-size analysis, one codegen source, cache hits all the
    way down.  The argmin arithmetic is unchanged and exact."""
    spark = q.sparkSession
    cdf = spark.createDataFrame(
        [([[int(v) for v in c] for c in centroids],)],
        "__cents: array<array<bigint>>",
    )
    ds = F.transform(F.col("__cents"), lambda c: _dist_to(F.col("qv"), c))
    return (
        q.crossJoin(F.broadcast(cdf))
        .withColumn("__ds", ds)
        .select(
            "id",
            "qv",
            (F.array_position("__ds", F.array_min("__ds")) - 1)
            .cast("int")
            .alias("cluster"),
            F.array_min("__ds").alias("dist"),
        )
    )


def kmeans_lloyd(
    df: DataFrame,
    n_clusters: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
) -> tuple[list[list[int]], DataFrame]:
    """Exact distributed Lloyd: returns (centroids, quantized corpus).
    Centroids are the Python k x dim int list after ``iters``
    iterations; callers build the final assignment with
    ``assign_exact`` (one more narrow pass) and long-format centroid
    rows with ``centroid_rows``.
    """
    q = quantize_vectors(df, id_col, vec_col, scale)
    # Scale-adaptive spread (guide §2.5 input skew): a small corpus
    # arrives as one single-row-group parquet split, so every Lloyd
    # pass — k interpreted zip_with/aggregate distance expressions per
    # row plus the dim-fan-out update — runs on ONE task (measured
    # ~1.6 s/iteration at sf0.1 with 31 cores idle).  Spread it to
    # the session's parallelism ONCE, before the checkpoint, so the
    # one tiny shuffle is amortized over every iteration and the
    # final assignment pass (measured: kmeans_assign 6.6 -> ~1.8 s).
    # At scale the scan already has >= parallelism splits and this is
    # a no-op — never a forced repartition of a big corpus.
    from tiki_e_commerce_analytics_etl_spark.io import spread_small_scan

    q = spread_small_scan(q)
    q = q.localCheckpoint(eager=False)
    init_rows = q.orderBy("id").limit(n_clusters).collect()
    if len(init_rows) < n_clusters:
        raise ValueError(
            f"need at least {n_clusters} vectors, got {len(init_rows)}"
        )
    centroids = [list(r["qv"]) for r in init_rows]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = assign_exact(q, centroids)
        # update: bounded dim fan-out, (cluster, pos) hash aggregate,
        # k x dim rows back to the driver (the only driver traffic)
        stats = (
            assigned.select("cluster", F.posexplode("qv").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("sm"), F.count(F.lit(1)).alias("cnt"))
            .select("cluster", "pos", F.expr("sm div cnt").alias("v"))
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in stats:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["v"]
        centroids = [
            [by_cluster[c][p] for p in range(dim)] if c in by_cluster else centroids[c]
            for c in range(n_clusters)
        ]
    return centroids, q


def centroid_rows(spark, centroids: list[list[int]]) -> DataFrame:
    """Long-format (cluster, pos, val) rows of a centroid table."""
    data = [
        (c, p, int(v))
        for c, row in enumerate(centroids)
        for p, v in enumerate(row)
    ]
    return spark.createDataFrame(data, "cluster int, pos int, val long")


def cluster_balanced_sample(
    assigned: DataFrame,
    per_cluster: int,
    id_col: str = "id",
) -> DataFrame:
    """Deterministic cluster-balanced subset: the ``per_cluster``
    smallest md5-bucket ids of each cluster — the topic-balancing
    pass that keeps a 100 TB corpus from being 90% one mode.  One
    window over the cluster key (cluster cardinality is bounded, and
    members of one cluster hash-spread across partitions only at the
    exchange the window needs anyway).  Ties inside a bucket break on
    the id.  Returns (id, cluster, rk)."""
    from .sampling import hash_bucket
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy(
        hash_bucket(F.col(id_col)), F.col(id_col)
    )
    return (
        assigned.select(F.col(id_col), "cluster")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_cluster)
    )
