"""Data-layout clustering: z-order (Morton) interleaving.

Zone maps (``acid`` ``stat_cols``/``ranges``) skip a file iff the
queried column's [min, max] misses the predicate — which is only
selective if the write CLUSTERED that column.  A plain sort clusters
one column perfectly and leaves every other column's per-file range
spanning the whole domain; interleaving the bits of several columns
(Morton order) gives each of them locality, so range predicates on ANY
of the z-columns skip most files.  Same public design as Delta
``OPTIMIZE ZORDER BY`` / the classic UB-tree literature.

Pure Column expressions (bit ops inside whole-stage codegen, no UDF),
bit-for-bit reproducible in any engine with integer shifts — which is
how the zorder_key query is oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_layout", "zorder_key_sql"]


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton code interleaving the low ``bits`` bits of each column
    (non-negative integers; values are masked to ``bits`` width).
    Result fits a long for ``len(cols) * bits <= 63``.

    Bit j of column i lands at position ``j * n_cols + i`` — unrolled
    into ``n_cols × bits`` codegen-friendly shift/mask terms (32 for
    the common 2×16 case).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    mask = (1 << bits) - 1
    masked = [(c.cast("long").bitwiseAND(F.lit(mask))) for c in cs]
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(masked):
            z = z + F.shiftleft(F.shiftright(c, j).bitwiseAND(F.lit(1)), j * n + i)
    return z


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Morton code as an ANSI/DuckDB SQL expression —
    the oracle twin of :func:`zorder_key`."""
    n = len(cols)
    mask = (1 << bits) - 1
    # Each term fully parenthesized: SQL gives '+' tighter precedence
    # than '<<', so an unwrapped 'x << 1 + y << 2' cascades the shifts.
    terms = [
        f"(((({c} & {mask}) >> {j}) & 1) << {j * n + i})"
        for j in range(bits)
        for i, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    zcols: list[str],
    bits: int = 16,
    n_files: int = 32,
) -> DataFrame:
    """Re-layout ``df`` in z-order across ``n_files`` output partitions:
    range-partition on the Morton key (equi-depth via Spark's range
    sampler), sort within partitions, drop the key.

    Write the result with ``acid.atomic_overwrite_partitions(...,
    stat_cols=zcols)`` and every z-column's per-file [min, max] is
    tight, so ``read_atomic(ranges=...)`` skips most files for range
    predicates on ANY z-column.  One shuffle (the range exchange); the
    in-partition sort feeds parquet row-group stats too.
    """
    keyed = df.withColumn("__z", zorder_key(zcols, bits))
    return (
        keyed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
