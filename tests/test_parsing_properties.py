"""Property-based coverage of the VN parsing grammar (F1/F2/F4): the
golden corpus pins the reference's exact cases; these generate the
grammar's whole input space against an independent Python model of
transform_tiki.py's semantics, batched through one Spark job per
example set."""

import hypothesis.strategies as st
from hypothesis import given, settings
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.functions.parsing import (
    clean_price,
    parse_discount_rate,
    parse_sales_volume,
)


def _vn_thousands(n: int) -> str:
    return f"{n:,}".replace(",", ".")


# (rendered string, expected parse_sales_volume value)
_sales_case = st.one_of(
    # suffix grammar: k / triệu with . or , decimal
    st.tuples(st.integers(1, 9999), st.sampled_from([".", ","]), st.sampled_from(["k", "tr", "triệu", "m"])).map(
        lambda t: (
            f"Đã bán {t[0] // 10}{t[1]}{t[0] % 10}{t[2]}",
            int(float(f"{t[0] // 10}.{t[0] % 10}") * (1000.0 if t[2] == "k" else 1000000.0)),
        )
    ),
    # VN thousand separator
    st.integers(1000, 999_999_999).map(lambda n: (f"Đã bán {_vn_thousands(n)}", n)),
    # bare digit run
    st.integers(0, 10**12).map(lambda n: (f"sold {n} units", n)),
    # no digits at all
    st.sampled_from(["No sales", "", "   ", "chưa bán", None]).map(lambda s: (s, 0)),
)

_discount_case = st.one_of(
    st.integers(0, 100).map(lambda n: (f"-{n}%", n)),
    st.integers(0, 100).map(lambda n: (f"{n}%", n)),
    st.integers(-100, 100).map(lambda n: (str(n), abs(n))),
    st.sampled_from(["N/A", "", None]).map(lambda s: (s, 0)),
)

_price_case = st.one_of(
    st.tuples(st.integers(1000, 10**9), st.sampled_from(["", " đ", " VND", " ₫", "₫"])).map(
        lambda t: (_vn_thousands(t[0]) + t[1], t[0])
    ),
    st.integers(0, 10**12).map(lambda n: (str(n), n)),
    # decimal fallback truncates toward zero
    st.tuples(st.integers(0, 10**6), st.integers(0, 99)).map(
        lambda t: (f"{t[0]}.{t[1]:02d}", int(float(f"{t[0]}.{t[1]:02d}")))
    ),
    st.sampled_from(["free", "", None]).map(lambda s: (s, None)),
)


def _run(spark, cases, fn):
    df = spark.createDataFrame([(i, c) for i, (c, _) in enumerate(cases)], "i: long, raw: string")
    got = {r.i: r.v for r in df.select("i", fn(F.col("raw")).alias("v")).collect()}
    for i, (raw, expected) in enumerate(cases):
        assert got[i] == expected, f"case {raw!r}: got {got[i]}, want {expected}"


@settings(max_examples=8, deadline=None)
@given(st.lists(_sales_case, min_size=1, max_size=60))
def test_parse_sales_volume_properties(spark, cases):
    _run(spark, cases, parse_sales_volume)


@settings(max_examples=8, deadline=None)
@given(st.lists(_discount_case, min_size=1, max_size=60))
def test_parse_discount_rate_properties(spark, cases):
    _run(spark, cases, parse_discount_rate)


@settings(max_examples=8, deadline=None)
@given(st.lists(_price_case, min_size=1, max_size=60))
def test_clean_price_properties(spark, cases):
    _run(spark, cases, clean_price)
