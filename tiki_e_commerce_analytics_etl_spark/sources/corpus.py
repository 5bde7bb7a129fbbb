"""Raw-zone JSONL corpus ingestion with corrupt-record quarantine.

A crawl's raw zone is never clean: truncated writes, encoding damage,
schema drift, stray non-JSON lines.  Dropping those silently
(DROPMALFORMED) destroys the audit trail; failing the batch
(FAILFAST) lets one bad line poison terabytes.  The production answer
is PERMISSIVE scan + quarantine: good rows flow on, malformed raw
lines land in a quarantine output for repair/inspection — the same
split the reference's raw-zone JSON scan gets implicitly from its
pandas error handling (transform_tiki.py raw read), made explicit and
distributed.

Semantics (pinned by tests against Spark's PERMISSIVE mode):
- syntactically broken JSON / non-object rows / garbage lines →
  every schema field NULL, raw line in the corrupt column;
- a TYPE-mismatched field → corrupt column set, but the OTHER fields
  keep their parsed values (the row appears in quarantine WITH its
  salvageable fields — callers can repair rather than re-crawl);
- a merely MISSING field → NULL field, NOT corrupt (schema drift is
  not corruption).

Scale: one scan, no shuffle — both outputs are narrow filters over
the same PERMISSIVE read, so Catalyst shares the scan when both are
consumed in one job (or re-scans cheaply — the filter is codegen).
The corrupt column must be part of the read schema; Spark refuses
plans that reference ONLY the corrupt column (internal restriction),
which the quarantine output avoids by carrying the parsed fields
alongside the raw line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSONL scan split into (good, quarantine).

    ``good`` carries exactly ``schema``'s columns for rows with no
    parse damage.  ``quarantine`` carries ``schema``'s columns (any
    salvageable parsed values) plus ``corrupt_col`` holding the raw
    line.  ``schema`` must not already contain ``corrupt_col``.
    """
    if corrupt_col in schema.fieldNames():
        raise ValueError(f"schema must not contain {corrupt_col!r}")
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = df.filter(F.col(corrupt_col).isNotNull())
    return good, quarantine
