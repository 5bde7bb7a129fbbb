"""Scalar parsing functions (SURVEY.md §2.4, F1-F14) as pure Column
expressions.

The reference implements these as row-at-a-time pandas ``.apply``
functions (transform_tiki.py:191-365) — the moral equivalent of scalar
Python UDFs.  Here every one is a native Column expression, so they run
inside whole-stage codegen on the JVM with zero Python round-trips:
at 100 TB this is the difference between an expression pipeline and a
serialization bottleneck.

Edge-case semantics are pinned by the reference's own unit corpus
(reference tests/test_transform_logic.py) and re-tested in
tests/test_parsing.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _try_cast(c: Column, t: str) -> Column:
    """Cast that yields NULL on failure regardless of ANSI mode."""
    return c.try_cast(t)

# Vietnamese magnitude-suffix grammar (transform_tiki.py:212-235):
# "1.5k" -> 1500, "2,5k" -> 2500, "1tr"/"1m"/"1.5 triệu" -> millions.
_SUFFIX_RE = r"(\d+(?:[.,]\d+)?)\s*(k|tr|m|trieu|triệu)"
# VN thousand-separator grammar: groups of exactly 3 digits after dots.
_THOUSAND_SEP_RE = r"(\d{1,3}(?:\.\d{3})+)"
# clean_price's anchored variant with optional currency marker
# (transform_tiki.py:328, case-insensitive).
_PRICE_ANCHORED_RE = r"(?i)^\s*(\d{1,3}(?:\.\d{3})+)(?:\s*(?:đ|vnd|₫))?\s*$"


def parse_sales_volume(col: Column | str) -> Column:
    """F1 — "Đã bán 1.5k" → 1500 (transform_tiki.py:191-258).

    Order of precedence (mirrors the reference exactly):
      1. magnitude suffix (k=1e3; tr/trieu/triệu/m=1e6), ','→'.' decimal
      2. VN thousand separator ("10.000" → 10000)
      3. first bare digit run
      4. otherwise (incl. NULL/empty/no-digit) → 0
    """
    s = F.lower(F.trim(F.col(col).cast("string") if isinstance(col, str) else col.cast("string")))
    num = F.regexp_extract(s, _SUFFIX_RE, 1)
    unit = F.regexp_extract(s, _SUFFIX_RE, 2)
    from_suffix = (
        _try_cast(F.regexp_replace(num, ",", "."), "double")
        * F.when(unit == "k", F.lit(1000.0)).otherwise(F.lit(1000000.0))
    ).cast("long")
    thousand = F.regexp_extract(s, _THOUSAND_SEP_RE, 1)
    from_thousand = _try_cast(F.regexp_replace(thousand, r"\.", ""), "long")
    simple = _try_cast(F.regexp_extract(s, r"(\d+)", 1), "long")
    is_sci = s.rlike(r"^-?\d+(\.\d+)?e[+-]?\d+$")
    return (
        F.when(s.isNull(), F.lit(0))
        .when(is_sci, F.coalesce(_try_cast(s, "double").cast("long"), F.lit(0)))
        .when(unit != "", F.coalesce(from_suffix, F.lit(0)))
        .when(thousand != "", F.coalesce(from_thousand, F.lit(0)))
        .when(simple.isNotNull(), simple)
        .otherwise(F.lit(0))
    )


def parse_discount_rate(col: Column | str) -> Column:
    """F2 — "-41%" → 41, -25 → 25, NULL → 0 (transform_tiki.py:261-283).

    First digit run wins; sign is discarded (the numeric branch of the
    reference applies ``abs``, the string branch's regex has no sign).
    """
    s = F.trim(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    first_digits = _try_cast(F.regexp_extract(s, r"(\d+)", 1), "long")
    return F.coalesce(first_digits, F.lit(0))


def extract_category_id(col: Column | str) -> Column:
    """F3 — ".../c1789?page=2" → 1789 via ``/c(\\d+)``; NULL → NULL
    (transform_tiki.py:286-305; JS twin api_crawler.js:17-20)."""
    c = F.col(col) if isinstance(col, str) else col
    return _try_cast(F.nullif(F.regexp_extract(c.cast("string"), r"/c(\d+)", 1), F.lit("")), "long")


def clean_price(col: Column | str) -> Column:
    """F4 — price cleaner (transform_tiki.py:308-347; JS twin utils.js:151-166).

    "1.000.000 VND" → 1000000 via the anchored VN pattern; otherwise
    strip non-``[\\d.]`` and truncate-to-int; empty/unparseable → NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string"))
    # A numeric column cast to string may render scientific notation
    # ("3.725E7") — that is the reference's numeric-passthrough branch.
    is_sci = s.rlike(r"(?i)^-?\d+(\.\d+)?e[+-]?\d+$")
    anchored = F.regexp_extract(s, _PRICE_ANCHORED_RE, 1)
    from_anchored = _try_cast(F.regexp_replace(anchored, r"\.", ""), "long")
    cleaned = F.regexp_replace(s, r"[^\d.]", "")
    # int(float(x)) truncation ≡ double→long cast (both truncate toward 0).
    from_fallback = _try_cast(cleaned, "double").cast("long")
    return (
        F.when(s.isNull() | (s == ""), F.lit(None).cast("long"))
        .when(is_sci, _try_cast(s, "double").cast("long"))
        .when(anchored != "", from_anchored)
        .otherwise(from_fallback)
    )


# cleanReviewCount's strip class (utils.js:216, /[()đánh giá\s]/gi):
# individual characters, unicode-case-insensitive — note it removes the
# letters of "đánh giá" anywhere, not the phrase.
_REVIEW_STRIP_RE = r"(?iu)[()đánh giá\s]"
# JS parseFloat/parseInt parse a LEADING numeric prefix and ignore the
# rest ("1,2" → 1; "1rvews" → 1) — anchored prefix extracts mirror that.
_JS_FLOAT_PREFIX_RE = r"^([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
_JS_INT_PREFIX_RE = r"^([+-]?\d+)"
_PRODUCT_ID_RE = r"(?i)/p(\d+)|spid=(\d+)|product/(\d+)"


def clean_review_count(col: Column | str) -> Column:
    """F20 — review-count cleaner, JS twin of
    TikiCrawler/puppeteer/src/utils.js:210-229 (cleanReviewCount).

    "(1.234 đánh giá)" → 1234 (dot thousands); "(1.5k …)" → 1500
    (k-suffix, JS Math.round = floor(x+0.5)); unparseable/empty → NULL.
    Bug-compatible with the JS: the strip class removes the *letters*
    of "đánh giá", parseFloat/parseInt take the leading numeric prefix,
    and only the FIRST 'k' is removed before parseFloat.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    cleaned = F.regexp_replace(s, _REVIEW_STRIP_RE, "")
    has_k = F.lower(cleaned).contains("k")
    # ^(.*?)k — anchored, so exactly the first k/K is dropped.
    dek = F.regexp_replace(cleaned, r"(?i)^(.*?)k", "$1")
    from_k = F.floor(
        _try_cast(F.regexp_extract(dek, _JS_FLOAT_PREFIX_RE, 1), "double") * 1000
        + F.lit(0.5)
    ).cast("long")
    from_int = _try_cast(
        F.nullif(
            F.regexp_extract(F.regexp_replace(cleaned, r"\.", ""), _JS_INT_PREFIX_RE, 1),
            F.lit(""),
        ),
        "long",
    )
    return (
        F.when(s.isNull() | (s == ""), F.lit(None).cast("long"))
        .when(has_k, from_k)
        .otherwise(from_int)
    )


def extract_product_id(col: Column | str) -> Column:
    """F20 — product-id extractor, JS twin of
    TikiCrawler/puppeteer/src/utils.js:236-255 (extractProductId).

    All-digit input passes through; otherwise the first match of
    ``/p(\\d+)|spid=(\\d+)|product/(\\d+)`` (case-insensitive, leftmost
    position wins across alternatives, like the JS regex) supplies the
    id; no match/empty → NULL.  Returns STRING like the JS (ids such as
    "0042" keep their leading zeros).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    groups = [
        F.nullif(F.regexp_extract(s, _PRODUCT_ID_RE, i), F.lit("")) for i in (1, 2, 3)
    ]
    return (
        F.when(s.isNull() | (s == ""), F.lit(None).cast("string"))
        .when(s.rlike(r"^\d+$"), s)
        .otherwise(F.coalesce(*groups))
    )


def parse_snapshot_date(col: Column | str) -> Column:
    """F5 — ISO timestamp string → DATE; invalid → NULL
    (transform_tiki.py:350-365).

    The reference strips the zone and takes the *literal* date in the
    string (``fromisoformat(s.split('+')[0]).date()``), so midnight
    +07:00 data keeps its local-notation date.  The first 10 chars of a
    valid ISO-8601 string are exactly that date.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    # Validate the full prefix shape before trusting substring(1,10).
    is_iso = s.rlike(r"^\d{4}-\d{2}-\d{2}([T ].*)?$")
    return F.when(is_iso, _try_cast(F.substring(s, 1, 10), "date")).otherwise(F.lit(None).cast("date"))


def parse_category_path(col: Column | str) -> Column:
    """F6 — "1815 > 28670 > 4593" → array<long> (transform_tiki.py:477-506).

    Empty / NULL / non-numeric-token paths yield NULL (not empty array)
    so downstream coalesce-style fills behave like the reference's
    fill-null-only semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string"))
    arr = F.transform(F.split(s, r"\s*>\s*"), lambda x: _try_cast(x, "long"))
    ok = s.isNotNull() & (s != "") & ~F.exists(arr, lambda x: x.isNull())
    return F.when(ok, arr).otherwise(F.lit(None).cast("array<long>"))


def category_leaf(path_array: Column) -> Column:
    """F6 — leaf = last element of the parsed path."""
    return F.element_at(path_array, -1)


def category_root(path_array: Column) -> Column:
    """F6 — root = first element of the parsed path."""
    return F.element_at(path_array, 1)


def category_depth(path_array: Column) -> Column:
    """F6 — depth = number of path levels; NULL path → NULL."""
    return F.when(path_array.isNotNull(), F.size(path_array)).otherwise(F.lit(None).cast("int"))


def extract_url_key(col: Column | str) -> Column:
    """F7 — "/dien-thoai…/c1789" → "dien-thoai…"
    (transform_tiki.py:663-671; JS twin api_crawler.js:26-29)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.regexp_extract(c.cast("string"), r"/([^/]+)/c\d+", 1), F.lit(""))


def has_tiki_now(badges: Column | str) -> Column:
    """F8 — 'tiki_now' ∈ badges array; NULL/error → False
    (transform_tiki.py:556-572)."""
    c = F.col(badges) if isinstance(badges, str) else badges
    return F.coalesce(F.array_contains(c, "tiki_now"), F.lit(False))


def build_full_path(root: Column, leaf: Column) -> Column:
    """F9 — "<root> > <leaf>" when root differs from leaf, else str(leaf)
    (transform_tiki.py:683-695)."""
    return F.when(
        root.isNotNull() & leaf.isNotNull() & (root != leaf),
        F.concat_ws(" > ", root.cast("string"), leaf.cast("string")),
    ).otherwise(leaf.cast("string"))


def derive_parent_id(root: Column, depth: Column) -> Column:
    """F10 — parent = root when depth > 1 and root non-null, else NULL
    (transform_tiki.py:697-704)."""
    return F.when((depth > 1) & root.isNotNull(), root).otherwise(F.lit(None).cast("long"))


def category_level(depth: Column) -> Column:
    """F11 — min(depth, 3), NULL → 1 (transform_tiki.py:677-681).

    NULL must short-circuit to 1 *before* least(): Spark's least()
    skips NULL operands (returns 3), unlike Python's min.
    """
    return F.when(depth.isNull(), F.lit(1)).otherwise(F.least(depth, F.lit(3))).cast("long")


def coerce_long(col: Column | str) -> Column:
    """F12 — ``pd.to_numeric(errors='coerce').astype('Int64')`` ≡ try_cast
    through double (so "3.0" → 3 like pandas) then to long."""
    c = F.col(col) if isinstance(col, str) else col
    return _try_cast(_try_cast(c.cast("string"), "double"), "long")


def coerce_double(col: Column | str) -> Column:
    """F12 — coercing float cast; unparseable → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return _try_cast(c.cast("string"), "double")


def clean_trends_score(col: Column | str) -> Column:
    """F13 — Google Trends score cleanup: "<1" → 0, other non-numerics →
    NULL → 0 (transform_google_trends.py:85-104)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string"))
    return (
        F.when(s == "<1", F.lit(0))
        .otherwise(F.coalesce(_try_cast(_try_cast(s, "double"), "long"), F.lit(0)))
    )


def clean_rating(col: Column | str) -> Column:
    """F20 — rating bound-check: keep 0 ≤ r ≤ 5 else NULL
    (JS twin utils.js:190-203)."""
    r = coerce_double(col)
    return F.when((r >= 0) & (r <= 5), r).otherwise(F.lit(None).cast("double"))


def usd_price(price_vnd: Column, rate: Column, fallback_rate: float = 25400.0) -> Column:
    """F17 — ROUND(price / COALESCE(rate, 25400.0), 2)
    (analytics_dag.py:113-114, fallback const :57).

    Rounding is spelled out as floor(x*100 + 0.5)/100 rather than
    Spark's ``round``: Spark rounds on the double's shortest *decimal
    string* (2.405 → 2.41 even though the binary value is 2.40499…),
    which diverges from engines that round the binary value (BigQuery,
    DuckDB → 2.40).  The explicit formula is pure double math, so every
    engine computes the identical result.  Prices are non-negative, so
    floor(+0.5) is exactly half-up.
    """
    x = price_vnd / F.coalesce(rate, F.lit(fallback_rate))
    return F.floor(x * 100 + F.lit(0.5)) / 100


def trend_signal_status(mapping_key: Column, score: Column) -> Column:
    """F18 — CASE: mapping NULL → 'Unmapped'; score NULL → 'No Trend Data';
    else 'Full Data' (analytics_dag.py:121-125)."""
    return (
        F.when(mapping_key.isNull(), F.lit("Unmapped"))
        .when(score.isNull(), F.lit("No Trend Data"))
        .otherwise(F.lit("Full Data"))
    )


def inventory_in_stock(price: Column) -> Column:
    """P8 — in-stock := price non-null AND > 0 (transform_tiki.py:551-553)."""
    return price.isNotNull() & (price > 0)
