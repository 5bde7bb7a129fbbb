"""Hierarchy traversal — resolve each node's root ancestor over a
parent-pointer table (the category-tree / org-chart shape the
warehouse's ``parent_id`` column implies; reference
bigquery_schema.sql:11 stores the pointer but never traverses it).

Spark has no recursive CTE, so traversal is iterative **pointer
jumping** (path halving): each round replaces every node's ancestor
pointer with its ancestor's ancestor, doubling the resolved path
length — ⌈log₂(depth)⌉ self-joins total, not depth.  For a 20-level
hierarchy that is 5 shuffles; a naive parent-at-a-time loop would take
20.  Each join shuffles on the ancestor key; the frame never grows
(one row per node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_roots(edges: DataFrame, node_col: str = "node", parent_col: str = "parent", max_iters: int = 8) -> DataFrame:
    """(node, parent|null) → (node, root).  ``max_iters`` bounds
    resolvable depth at 2^max_iters; unresolved cycles would keep a
    non-root ancestor (acyclic input is the caller's contract)."""
    cur = edges.select(
        F.col(node_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(node_col)).alias("anc"),
    )
    for _ in range(max_iters):
        a = cur.alias("a")
        b = cur.select(
            F.col("node").alias("b_node"), F.col("anc").alias("b_anc")
        ).alias("b")
        cur = (
            a.join(b, F.col("a.anc") == F.col("b.b_node"), "left")
            .select(
                F.col("a.node").alias("node"),
                F.coalesce(F.col("b.b_anc"), F.col("a.anc")).alias("anc"),
            )
        )
    return cur.select("node", F.col("anc").alias("root"))
