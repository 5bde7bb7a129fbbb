"""Hierarchy traversal — resolve each node's root ancestor over a
parent-pointer table (the category-tree / org-chart shape the
warehouse's ``parent_id`` column implies; reference
bigquery_schema.sql:11 stores the pointer but never traverses it).

Spark has no recursive CTE, so traversal is iterative **pointer
jumping** (path halving): each round replaces every node's ancestor
pointer with its ancestor's ancestor, doubling the resolved path
length — ⌈log₂(depth)⌉ self-joins total, not depth.  Each join
shuffles on the ancestor key; the frame never grows (one row per
node).

Rounds stop at the fixed point: every round materializes its result
(``localCheckpoint`` — truncated lineage, so round N+1 reads cached
rows instead of replaying N joins) and probes whether any pointer
moved.  A depth-3 tree therefore costs 3 join rounds even with
``max_iters=8``; the probe itself is a ``limit(1)`` scan of the
just-cached frame, not a recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_roots(
    edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_iters: int = 8,
    _stats: dict | None = None,
) -> DataFrame:
    """(node, parent|null) → (node, root).  ``max_iters`` bounds
    resolvable depth at 2^max_iters; unresolved cycles would keep a
    non-root ancestor (acyclic input is the caller's contract).
    ``_stats`` (tests): gets ``{"iterations": n}`` filled in."""
    cur = edges.select(
        F.col(node_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(node_col)).alias("anc"),
    )
    iterations = 0
    for _ in range(max_iters):
        a = cur.alias("a")
        b = cur.select(
            F.col("node").alias("b_node"), F.col("anc").alias("b_anc")
        ).alias("b")
        nxt = (
            a.join(b, F.col("a.anc") == F.col("b.b_node"), "left")
            .select(
                F.col("a.node").alias("node"),
                F.coalesce(F.col("b.b_anc"), F.col("a.anc")).alias("anc"),
                (
                    F.col("b.b_anc").isNotNull()
                    & (F.col("b.b_anc") != F.col("a.anc"))
                ).alias("__moved"),
            )
            .localCheckpoint(eager=False)
        )
        iterations += 1
        moved = nxt.filter(F.col("__moved")).limit(1).count() > 0
        cur = nxt.drop("__moved")
        if not moved:
            break
    if _stats is not None:
        _stats["iterations"] = iterations
    return cur.select("node", F.col("anc").alias("root"))
