"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the given scale factor, compare row count, column names, and
order-insensitive values.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from tiki_e_commerce_analytics_etl_spark.schemas import TESTDATA_TABLES  # noqa: E402
from tiki_e_commerce_analytics_etl_spark.session import get_session  # noqa: E402


def _norm(v):
    """Canonical comparable form for a cell value."""
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (int,)) and not isinstance(v, bool):
        return int(v)
    if hasattr(v, "item") and not isinstance(v, (list, tuple)):
        v = v.item()
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.apply(lambda col: col.map(_norm))
    sort_key = out.apply(lambda col: col.map(lambda v: "" if v is None else str(v)))
    order = sort_key.sort_values(by=list(sort_key.columns)).index
    return out.loc[order].reset_index(drop=True)


STRICT = False  # --strict: floats must be bit-identical (no isclose)
# and numeric KINDS must match: the driver's value hash is dtype-
# sensitive (int64 5 != float64 5.0 — e.g. DuckDB SUM(BIGINT) yields
# HUGEINT which pandas renders as float64), so strict mode refuses
# int-vs-float agreement that the lenient float() compare would accept.


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    a_nan = isinstance(a, float) and math.isnan(a)
    b_nan = isinstance(b, float) and math.isnan(b)
    if a_nan or b_nan or a is None or b is None:
        # NaN re-emerges from pandas float columns even after None
        # normalization; treat NaN and None as the same missing value.
        return (a_nan or a is None) and (b_nan or b is None)
    if isinstance(a, float) and isinstance(b, float):
        if STRICT:
            return a == b
        return a == b or math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) and not isinstance(a, bool) and not isinstance(b, bool):
        if STRICT and isinstance(a, float) != isinstance(b, float):
            return False
        return float(a) == float(b)
    return a == b


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    # Array/list cells crash pandas-side canonicalizers (unhashable in
    # sort_values) — exactly how the driver scored sketch_summary as an
    # err in round 1.  Flag them regardless of value agreement.
    for pdf, side in ((spark_pdf, "spark"), (oracle_pdf, "oracle")):
        if len(pdf):
            for col in pdf.columns:
                v = pdf[col].iloc[0]
                if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                    problems.append(f"array-typed cell in {side}.{col} (driver canonicalizer crashes on these)")
    if problems:
        return problems
    s = canon(spark_pdf)
    o = canon(oracle_pdf)
    mismatches = 0
    first = None
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            if not values_equal(x, y):
                mismatches += 1
                if first is None:
                    first = f"col={col} row={i}: spark={x!r} oracle={y!r}"
                break
    if mismatches:
        problems.append(f"value mismatch in {mismatches} column(s); first: {first}")
    return problems


def main() -> int:
    global STRICT
    args = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = "--strict" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_session("check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            # count-shaped probe: the driver's row-count gate runs
            # df.count(), whose column pruning can make a plan ILLEGAL
            # that this gate's full-row toPandas accepts (e.g. a
            # branch pruned down to the json reader's internal
            # corrupt-record column raises
            # UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).
            # A limit(0) variant does NOT trigger the check — it must
            # be a genuine count, which costs one extra (cheaper,
            # aggregate-only) execution per query.
            df.count()
            spark_pdf = df.toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        try:
            oracle_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"pass {name}: {len(spark_pdf)} rows match")
    ran = len(only & set(qs)) if only else len(qs)
    print(f"\n{ran - len(failed)}/{ran} queries pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
