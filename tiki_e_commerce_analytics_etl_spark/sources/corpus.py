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

Scale: one text scan, no shuffle — both outputs are narrow codegen
filters over the same ``text``-source read + ``from_json``
projection.  Deliberately NOT the json reader's internal
``columnNameOfCorruptRecord`` column: Spark refuses any plan whose
projection prunes down to only that internal column (SQLSTATE 0A000
— a plain ``quarantine.count()`` dies), so the raw line is carried
as an ordinary column from the text source instead, and the corrupt
marker comes from ``from_json``'s own corrupt field.  Every
downstream shape (count, select-one-column, cache) is legal.
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
    # The internal marker field must not collide with a caller column
    # (from_json would reject a non-string corrupt column, or shadow a
    # legitimate string one) — append '_' until the name is free.
    marker = "__is_corrupt"
    while marker in schema.fieldNames():
        marker += "_"
    full = T.StructType(
        list(schema.fields) + [T.StructField(marker, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.col("value").alias(corrupt_col),
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": marker},
        ).alias("__p"),
    )
    # from_json returns a NULL struct (not a corrupt record) for
    # empty/whitespace-only input — without the __p IS NOT NULL arm
    # those lines would leak into `good` as phantom all-NULL rows
    # instead of quarantining as the garbage they are.
    #
    # A well-formed object that happens to CONTAIN a key named like the
    # marker would have that key's value parsed into the marker field;
    # requiring marker == raw line disambiguates, because Spark always
    # stores the ENTIRE malformed input in the corrupt column and no
    # JSON string value can equal the quoted line enclosing it.
    ok = F.col("__p").isNotNull() & (
        F.col(f"__p.{marker}").isNull()
        | (F.col(f"__p.{marker}") != F.col(corrupt_col))
    )
    good = parsed.filter(ok).select(
        [F.col(f"__p.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(~ok).select(
        [F.col(f"__p.{f.name}").alias(f.name) for f in schema.fields]
        + [F.col(corrupt_col)]
    )
    return good, quarantine
