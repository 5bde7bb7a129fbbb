"""Grouped-map operators (``applyInPandas``): per-key pandas logic over
Arrow-batched groups — the third Python-integration shape next to
mapInPandas (multimodal) and applyInPandasWithState (streaming).

``resample_ffill_daily`` is the time-series gap repair a snapshot
pipeline needs: the crawler misses days, but the mart wants one row per
(product, day) with the last known value carried forward (the reference
keeps gaps; training pipelines usually can't).

Scale: one shuffle on the key; each group is a single product's
history (small, bounded by the date range), so group skew is bounded.
The pandas step is O(days) per key with vectorized reindex/ffill.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def resample_ffill_daily(
    df: DataFrame,
    key_col: str = "product_id",
    date_col: str = "snapshot_date",
    value_cols: tuple[str, ...] = ("current_price",),
) -> DataFrame:
    """One row per (key, day) from the key's min to max date; missing
    days take the most recent earlier value.  Adds ``is_observed``
    (False on filled rows).  Duplicate (key, day) rows keep the last
    value after a stable date sort — feed deduped data for full
    determinism.
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(date_col, T.DateType()),
            *[T.StructField(c, T.DoubleType()) for c in value_cols],
            T.StructField("is_observed", T.BooleanType()),
        ]
    )

    cols = [key_col, date_col, *value_cols]

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        s = (
            pdf[[date_col, *value_cols]]
            .assign(**{date_col: pd.to_datetime(pdf[date_col])})
            .sort_values(date_col, kind="stable")
            .drop_duplicates(subset=[date_col], keep="last")
            .set_index(date_col)
        )
        idx = pd.date_range(s.index.min(), s.index.max(), freq="D")
        out = s.reindex(idx).ffill()
        out.index.name = date_col
        out = out.reset_index()
        out[key_col] = key
        out["is_observed"] = out[date_col].isin(s.index)
        out[date_col] = out[date_col].dt.date
        return out[[key_col, date_col, *value_cols, "is_observed"]]

    return df.select(*cols).groupBy(key_col).applyInPandas(fill, out_schema)
