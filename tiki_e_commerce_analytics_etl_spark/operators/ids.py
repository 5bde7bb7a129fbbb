"""Distributed contiguous id assignment — global ROW_NUMBER semantics
without a global sort.

Training pipelines need stable dense indices (sample ids, shard
manifests, length-sorted batch order) over corpora far too large for
``Window.orderBy(...)`` with no partition spec (which Spark executes
on ONE task).  The classic two-pass recipe, DataFrame-native:

1. ``repartitionByRange`` on the ordering key (one exchange; the range
   partitioner keeps partition index aligned with key order) + a
   per-partition sort (no shuffle);
2. count rows per partition (a tiny aggregate), prefix-sum the counts
   on the driver (#partitions scalars, not data);
3. a narrow Arrow ``mapInPandas`` pass stamps ``offset + position`` —
   no further shuffle, no JVM<->Python per-row cost.

The assigned ids equal the global rank under the given total order —
independent of partition count or boundary sampling — so the
``contiguous_ids`` query has a bit-exact ``ROW_NUMBER() OVER (ORDER
BY ...)`` oracle.  Give a TOTAL order (include a unique tiebreaker
column); under ties the ids would be stable only per physical layout.

The intermediate is pinned with an eager ``localCheckpoint`` so the
count pass and the stamping pass see the identical partition layout
(a re-computed range exchange could re-sample boundaries between the
two actions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def assign_contiguous_ids(
    df: DataFrame,
    order_exprs: list[Column],
    n_shards: int = 64,
    id_col: str = "row_id",
) -> DataFrame:
    """Add ``id_col`` = 0..N-1 following the total order given by
    ``order_exprs`` (Column expressions, may carry .desc()/.asc())."""
    ranged = (
        df.repartitionByRange(n_shards, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(
        [f for f in ranged.schema.fields if f.name != "__pid"]
        + [StructField(id_col, LongType(), False)]
    )
    data_cols = [f.name for f in out_schema.fields if f.name != id_col]

    def stamp(batches):
        cursor = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if cursor is None:
                cursor = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            out = pdf[data_cols].copy()
            out[id_col] = range(cursor, cursor + len(pdf))
            cursor += len(pdf)
            yield out

    return ranged.mapInPandas(stamp, out_schema)
