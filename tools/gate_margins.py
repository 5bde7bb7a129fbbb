"""Measure the data-dependent gate margins against the CURRENT
testdata generation.

The driver regenerates /root/testdata each round, and several
registered queries are boolean GATES whose thresholds were calibrated
against a specific generation: ANN recall (LSH >= 0.5, IVF >= 0.3 at
nprobe=8), SemDeDup coverage (>= 0.15), and the sketch relative-error
bounds (HLL 10%, approx-percentile 2%).  A regeneration could move a
measured quantity toward its threshold without any code change.  Run
this at round start (and before relying on CHECK_LOCAL artifacts):
it prints each gate's MEASURED value, its threshold, and the margin,
and exits non-zero when any margin falls under the safety floor.

Usage: python tools/gate_margins.py [sf_dir ...]
       (default: sf0.001 and sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tiki_e_commerce_analytics_etl_spark.io import read_table  # noqa: E402
from tiki_e_commerce_analytics_etl_spark.session import get_session  # noqa: E402

# require measured >= threshold * (1 + floor) — i.e. at least 20%
# relative headroom before we call a gate "at risk"
MARGIN_FLOOR = 0.2


def _recall(exact, ann) -> float:
    hits = (
        exact.join(F.broadcast(ann), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))
    row = (
        base.join(hits, "query_id", "left")
        .agg(F.min(F.coalesce(F.col("hits"), F.lit(0)) / F.col("n")).alias("r"))
        .collect()[0]
    )
    return float(row["r"])


def measure(spark, sf_dir: str) -> list[tuple[str, float, float, float]]:
    """[(gate, measured, threshold, margin)] — margin is the relative
    headroom between the measured quantity and the value that flips
    the gate boolean (direction-aware: recall/coverage must stay
    ABOVE, sketch errors must stay BELOW)."""
    from tiki_e_commerce_analytics_etl_spark.operators import similarity

    out = []
    exact = entrymod.q_similarity_topk(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = entrymod.q_similarity_topk_lsh(spark, sf_dir).select("query_id", "neighbor_id")
    r = _recall(exact, lsh)
    thr = entrymod.LSH_RECALL_THRESHOLD
    out.append(("lsh_recall@10 (worst query)", r, thr, (r - thr) / thr))

    emb = read_table(spark, sf_dir, "embeddings")
    ivf = similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_clusters=16, nprobe=8
    ).select("query_id", "neighbor_id")
    r = _recall(exact, ivf)
    thr = entrymod.IVF_RECALL_THRESHOLD
    out.append(("ivf_recall@10 (worst query)", r, thr, (r - thr) / thr))

    pq = similarity.pq_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, refine=16
    ).select("query_id", "neighbor_id")
    r = _recall(exact, pq)
    thr = entrymod.PQ_RECALL_THRESHOLD
    out.append(("pq_recall@10 (worst query)", r, thr, (r - thr) / thr))

    # IVFADC (round 12): the composed route at the GATE's knobs
    # (nprobe=8, refine=32, n_codes=64 — q_similarity_ivfpq_recall).
    ivfpq = similarity.ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        n_clusters=16,
        nprobe=8,
        refine=32,
        n_codes=64,
    ).select("query_id", "neighbor_id")
    r = _recall(exact, ivfpq)
    thr = entrymod.IVFPQ_RECALL_THRESHOLD
    out.append(("ivfpq_recall@10 (worst query)", r, thr, (r - thr) / thr))

    # SQ8 int8 quantization: worst-query overlap of the integer-dot
    # top-10 vs the exact float top-10 (the sq_recall query measures
    # the same quantity bit-exactly; this row tracks its headroom).
    # Random vectors are the adversarial case — top-10 score gaps are
    # tiny, so 0.7/10 measured; semantic embeddings sit far higher.
    sq = similarity.sq_topk(emb, emb.filter(F.col("vec_id") < 5), k=10).select(
        "query_id", "neighbor_id"
    )
    r = _recall(exact, sq)
    out.append(("sq_recall@10 (worst query)", r, 0.5, (r - 0.5) / 0.5))

    # semdedup: raw hit ratio behind the coverage_ok boolean
    exact_pairs = similarity.cosine_neardup_pairs(emb, threshold=0.4, method="exact").select("id_a", "id_b")
    sd = similarity.semdedup_pairs(emb, threshold=0.4, n_clusters=16).select("id_a", "id_b")
    n_hit = exact_pairs.join(sd, ["id_a", "id_b"], "left_semi").count()
    n_exact = exact_pairs.count()
    ratio = n_hit / n_exact if n_exact else float("nan")
    out.append(("semdedup_coverage", ratio, 0.15, (ratio - 0.15) / 0.15))

    # sketch gates: actual relative errors vs their bounds
    li = read_table(spark, sf_dir, "lineitem")
    vals = li.agg(
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.approx_count_distinct("l_orderkey").alias("ao"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("p50a"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 1000)").alias("p95a"),
        F.countDistinct("l_partkey").alias("ep"),
        F.countDistinct("l_orderkey").alias("eo"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50e"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95e"),
    ).collect()[0]
    for label, a, e, bound in (
        ("sketch.parts_hll", vals["ap"], vals["ep"], 0.10),
        ("sketch.orders_hll", vals["ao"], vals["eo"], 0.10),
        ("sketch.p50", vals["p50a"], vals["p50e"], 0.02),
        ("sketch.p95", vals["p95a"], vals["p95e"], 0.02),
    ):
        err = abs(float(a) - float(e)) / float(e)
        out.append((label, err, bound, (bound - err) / bound))

    # heavy_hitters: the MG retention guarantee covers every gram with
    # tf > total/(cap+1); the oracle comparison is bit-exact only while
    # the k-th gram's frequency clears that bound.  margin = how far
    # the k-th frequency sits above it.
    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = read_table(spark, sf_dir, "documents")
    exact_top = text_ops.top_ngrams(docs, "text", "doc_id", n=2, k=20)
    row = exact_top.agg(F.min("tf").alias("kth"), F.sum(F.lit(0)).alias("z")).collect()[0]
    total = (
        docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
        .count()
        - docs.count()  # bigrams per doc = words - 1
    )
    bound = total / (4096 + 1)
    kth = float(row["kth"])
    out.append(("heavy_hitters.kth_vs_mg_bound", kth, bound, (kth - bound) / bound))

    # classifier_eval: held-out accuracy on the structural teacher
    # boundary must clear 0.7 (chance 0.5).  The boundary is a
    # property of the construction, not of a particular generation,
    # but regenerated embeddings could in principle concentrate near
    # the separating hyperplane — measure the actual margin (the gate
    # query returns only the boolean, so recompute the raw accuracy).
    from pyspark.ml.functions import array_to_vector

    from tiki_e_commerce_analytics_etl_spark.operators import ml as ml_ops

    emb = read_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    signs = F.transform(
        F.sequence(F.lit(0), F.size(vec) - 1),
        lambda i: F.when(i % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0)),
    )
    teacher = (
        F.aggregate(F.zip_with(vec, signs, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x)
        > 0
    ).cast("double")
    df = emb.select("vec_id", array_to_vector(vec).alias("features"), teacher.alias("label"))
    _, pred = ml_ops.train_eval_classifier(df, "features", "label", split_key="vec_id")
    s = ml_ops.accuracy_summary(pred, "label", threshold=0.7).collect()[0]
    acc = s.n_correct / s.n_test
    out.append(("classifier_eval.accuracy", acc, 0.7, (acc - 0.7) / 0.7))

    # rolling_actives_sketch: worst per-day relative error of the HLL
    # window union vs the exact path, bound 10% (HLL rsd ~1.6%)
    from tiki_e_commerce_analytics_etl_spark.operators import engagement

    ev = read_table(spark, sf_dir, "events")
    exact_w = engagement.rolling_active_users(ev, "user_id", "ts", window_days=7)
    approx_w = engagement.rolling_active_users_hll(ev, "user_id", "ts", window_days=7)
    row = (
        exact_w.join(approx_w, "day")
        .agg(
            F.max(
                F.abs(F.col("approx_7d") - F.col("active_7d")) / F.col("active_7d")
            ).alias("e")
        )
        .collect()[0]
    )
    err = float(row["e"])
    out.append(("rolling_actives_hll.err", err, 0.10, (0.10 - err) / 0.10))

    # hll_overlap: relative error of the inclusion-exclusion
    # intersection estimate vs exact, bound 10% (3 compounded HLLs)
    from tiki_e_commerce_analytics_etl_spark.operators import sketch as sketch_ops

    va = ev.filter(F.col("event_type") == "view").select(F.col("user_id").alias("u"))
    vb = ev.filter(F.col("event_type") == "purchase").select(F.col("user_id").alias("u"))
    est_i = sketch_ops.hll_overlap(va, vb, "u").collect()[0]["n_intersection"]
    exact_i = va.intersect(vb).count()
    err = abs(float(est_i) - exact_i) / max(exact_i, 1)
    out.append(("hll_overlap.err", err, 0.10, (0.10 - err) / 0.10))

    # approx-boundary agreement gates (round 5): the gate flips when
    # any row's approx bin sits >1 bin from its exact bin, which
    # requires an approx boundary whose RANK is off by a full bin
    # depth.  The continuous margin is therefore the worst boundary's
    # rank error measured in bin depths (bound 1.0) — approx accuracy
    # 10000 keeps it ~n/10000 / (n/k).
    def worst_boundary_rank_err(df, col: str, k: int, accuracy: int = 10000) -> float:
        # |rank(approx bound) - rank(exact bound)| in bin depths —
        # NOT distance from the theoretical rank q*n, which a tie run
        # spanning the quantile would inflate even for a perfect
        # boundary (ties move BOTH bounds' ranks identically, and tied
        # rows all land in one bin either way).
        from tiki_e_commerce_analytics_etl_spark.operators.quality import (
            exact_percentiles,
        )

        vals = df.filter(F.col(col).isNotNull()).select(F.col(col).alias("v"))
        n = vals.count()
        if n == 0:
            return 0.0
        qs = [i / k for i in range(1, k)]
        arr = "array(" + ", ".join(repr(q) for q in qs) + ")"
        approx_b = (
            vals.agg(F.expr(f"approx_percentile(v, {arr}, {accuracy})").alias("bs"))
            .collect()[0]["bs"]
            or []
        )
        exact_b = exact_percentiles(vals, "v", qs)
        aggs = []
        for i, b in enumerate(approx_b):
            aggs.append(
                F.sum((F.col("v") <= F.lit(float(b))).cast("long")).alias(f"a{i}")
            )
        for i, b in enumerate(exact_b):
            aggs.append(
                F.sum((F.col("v") <= F.lit(float(b))).cast("long")).alias(f"e{i}")
            )
        ranks = vals.agg(*aggs).collect()[0]
        depth = n / k
        worst = 0.0
        for i in range(len(qs)):
            worst = max(
                worst, abs(float(ranks[f"a{i}"]) - float(ranks[f"e{i}"])) / depth
            )
        return worst

    li = read_table(spark, sf_dir, "lineitem")
    e = worst_boundary_rank_err(li, "l_extendedprice", 10)
    out.append(("equidepth_approx.rank_err", e, 1.0, (1.0 - e) / 1.0))

    orders = read_table(spark, sf_dir, "orders")
    per = orders.groupBy(F.col("o_custkey").alias("usr")).agg(
        F.datediff(
            F.max(F.col("o_orderdate")).cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("monetary"),
    )
    e = max(
        worst_boundary_rank_err(per, c, 5)
        for c in ("last_day", "frequency", "monetary")
    )
    out.append(("rfm_approx.rank_err", e, 1.0, (1.0 - e) / 1.0))

    from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

    docs = read_table(spark, sf_dir, "documents")
    r = text_ops.rarity_score(docs, "text", "doc_id")
    e = worst_boundary_rank_err(r, "rarity_scaled", 4)
    out.append(("curriculum_approx.rank_err", e, 1.0, (1.0 - e) / 1.0))

    # embedding_pca eigen-law gate (round 8): the laws hold exactly in
    # real arithmetic; the only slack consumed is float accumulation in
    # the distributed Gram pass, so the margin is |sum(explained)-1|
    # against the 1e-6 bound (must stay BELOW)
    from tiki_e_commerce_analytics_etl_spark.operators import ml as ml_ops

    emb = read_table(spark, sf_dir, "embeddings")
    _, model = ml_ops.embedding_pca(emb, k=64)
    drift = abs(sum(float(v) for v in model.explainedVariance) - 1.0)
    out.append(("pca_spectrum.total_drift", drift, 1e-6, (1e-6 - drift) / 1e-6))
    return out


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_session("gate-margins")
    bad = 0
    for sf_dir in sf_dirs:
        print(f"== {sf_dir}")
        for gate, measured, threshold, margin in measure(spark, sf_dir):
            flag = "" if margin >= MARGIN_FLOOR else "  <-- AT RISK"
            if margin < MARGIN_FLOOR:
                bad += 1
            print(
                f"  {gate:28s} measured={measured:8.4f} bound={threshold:6.3f} "
                f"headroom={margin:+.0%}{flag}"
            )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
