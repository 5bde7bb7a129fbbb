"""Unit coverage for operators/engagement.py against brute-force
Python models: rolling distinct actives, cohort retention, RFM
scoring (boundary convention incl. ties), and basket co-occurrence
(exact integer support/lift)."""

from __future__ import annotations

import datetime as dt
import itertools
from collections import Counter, defaultdict

import numpy as np
from pyspark.sql import functions as F

from tiki_e_commerce_analytics_etl_spark.operators import engagement

D0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, D0 + dt.timedelta(days=d, hours=h)) for u, d, h in rows],
        "user_id long, ts timestamp",
    )


def test_rolling_active_users_model(spark):
    # user 1 active days 0,1,8; user 2 active day 1 (twice); user 3 day 9
    ev = _events(
        spark, [(1, 0, 1), (1, 1, 2), (1, 8, 3), (2, 1, 4), (2, 1, 5), (3, 9, 6)]
    )
    got = {
        r["day"]: (r["dau"], r["active_3d"])
        for r in engagement.rolling_active_users(ev, window_days=3).collect()
    }
    active = defaultdict(set)
    for u, d, _ in [(1, 0, 0), (1, 1, 0), (1, 8, 0), (2, 1, 0), (3, 9, 0)]:
        active[d].add(u)
    expect = {}
    for d in active:  # observed days only
        win = set().union(*[active.get(x, set()) for x in range(d - 2, d + 1)])
        expect[(D0 + dt.timedelta(days=d)).date()] = (len(active[d]), len(win))
    assert got == expect


def test_rolling_active_users_no_extrapolated_days(spark):
    ev = _events(spark, [(1, 0, 1)])
    days = [r["day"] for r in engagement.rolling_active_users(ev, window_days=7).collect()]
    # day 0 is the only observed day; days 1..6 would only hold
    # carried-forward actives and must not be reported
    assert days == [D0.date()]


def test_cohort_retention_model(spark):
    rows = [
        (1, dt.datetime(2024, 1, 5)),
        (1, dt.datetime(2024, 3, 2)),
        (2, dt.datetime(2024, 1, 20)),
        (2, dt.datetime(2024, 1, 25)),  # same month: one distinct at age 0
        (3, dt.datetime(2024, 2, 1)),
        (3, dt.datetime(2025, 2, 28)),  # age 12 across the year boundary
    ]
    df = spark.createDataFrame(rows, "cust long, d timestamp")
    got = {
        (r["cohort_month"], r["month_age"]): r["n_customers"]
        for r in engagement.cohort_retention(df, "cust", "d").collect()
    }
    assert got == {
        (dt.date(2024, 1, 1), 0): 2,
        (dt.date(2024, 1, 1), 2): 1,
        (dt.date(2024, 2, 1), 0): 1,
        (dt.date(2024, 2, 1), 12): 1,
    }


def test_rfm_scores_model_and_ties(spark):
    rows = []
    # 10 customers: customer i has i+1 orders of 100*(i+1) each, last
    # order on day i — strictly increasing R, F, M by construction.
    for i in range(10):
        for j in range(i + 1):
            rows.append((i, D0 + dt.timedelta(days=i - j), 100.0 * (i + 1)))
    df = spark.createDataFrame(rows, "cust long, d timestamp, amt double")
    out = {r["usr"]: r for r in engagement.rfm_scores(df, "cust", "d", "amt").collect()}

    last_day = {i: (D0 + dt.timedelta(days=i) - dt.datetime(1970, 1, 1)).days for i in range(10)}
    freq = {i: i + 1 for i in range(10)}
    mon = {i: (i + 1) * 100.0 * (i + 1) for i in range(10)}
    qs = [20, 40, 60, 80]

    def model_score(vals, v):
        bounds = np.percentile(np.array(list(vals)), qs)  # linear ≡ quantile_cont
        return 1 + sum(v > b for b in bounds)

    for i in range(10):
        r = out[i]
        assert r["recency_days"] == last_day[9] - last_day[i]
        assert r["frequency"] == freq[i]
        assert r["monetary"] == mon[i]
        assert r["r_score"] == model_score(last_day.values(), last_day[i])
        assert r["f_score"] == model_score(freq.values(), freq[i])
        assert r["m_score"] == model_score(mon.values(), mon[i])
        assert r["rfm_segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"

    # ties score equal: two customers with identical metrics
    tied = spark.createDataFrame(
        [(1, D0, 50.0), (2, D0, 50.0), (3, D0 + dt.timedelta(days=3), 999.0)],
        "cust long, d timestamp, amt double",
    )
    t = {r["usr"]: r for r in engagement.rfm_scores(tied, "cust", "d", "amt").collect()}
    assert (t[1]["r_score"], t[1]["f_score"], t[1]["m_score"]) == (
        t[2]["r_score"],
        t[2]["f_score"],
        t[2]["m_score"],
    )


def test_basket_pairs_model(spark):
    baskets = {
        10: [1, 2, 3],
        11: [1, 2],
        12: [2, 3, 3],  # duplicate line: item counted once per basket
        13: [4],
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r["item_a"], r["item_b"]): (r["pair_count"], r["support_ppm"], r["lift_ppm"])
        for r in engagement.basket_pairs(df, "basket", "item", min_pair_count=1).collect()
    }
    sets = {b: set(i) for b, i in baskets.items()}
    n_b = len(sets)
    item_n = Counter(i for s in sets.values() for i in s)
    pc = Counter()
    for s in sets.values():
        for a, b in itertools.combinations(sorted(s), 2):
            pc[(a, b)] += 1
    expect = {
        p: (c, c * 1_000_000 // n_b, c * n_b * 1_000_000 // (item_n[p[0]] * item_n[p[1]]))
        for p, c in pc.items()
    }
    assert got == expect
    # sanity on the lift semantics: (1,2) co-occur in 2 of 4 baskets
    # with item counts 2 and 3 -> lift = 2*4/(2*3) = 1.33x > 1
    assert got[(1, 2)][2] == 2 * 4 * 1_000_000 // (2 * 3)


def test_basket_pairs_min_count_filter(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)], "basket long, item long"
    )
    got = engagement.basket_pairs(df, "basket", "item", min_pair_count=2).collect()
    assert [(r["item_a"], r["item_b"], r["pair_count"]) for r in got] == [(1, 2, 2)]


def test_rolling_active_users_hll_tracks_exact(spark):
    rows = [(u, d, u % 24) for u in range(200) for d in range(10) if (u + d) % 3]
    ev = _events(spark, rows)
    exact = {
        r["day"]: r["active_7d"]
        for r in engagement.rolling_active_users(ev, window_days=7).collect()
    }
    approx = {
        r["day"]: r["approx_7d"]
        for r in engagement.rolling_active_users_hll(ev, window_days=7).collect()
    }
    assert set(approx) == set(exact)  # same observed-day reporting set
    for d, e in exact.items():
        assert abs(approx[d] - e) / e <= 0.10


def test_ab_conversion_model(spark):
    import math

    # variant 0: users 0,2,4,6 exposed, 0,2 converted (50%)
    # variant 1: users 1,3,5 exposed, 1 converted (33%); user 7
    # converted but never exposed -> excluded from both sides
    rows = []
    for u in [0, 1, 2, 3, 4, 5, 6]:
        rows.append((u, u % 2, "view"))
    for u in [0, 2, 1, 7]:
        rows.append((u, u % 2, "purchase"))
    df = spark.createDataFrame(rows, "user_id long, variant long, event_type string")
    r = engagement.ab_conversion(
        df, "user_id", "variant", "event_type", "view", "purchase"
    ).collect()[0]
    assert (r["n_a"], r["c_a"], r["n_b"], r["c_b"]) == (4, 2, 3, 1)
    p_a, p_b = 2 / 4, 1 / 3
    pool = 3 / 7
    se = math.sqrt(pool * (1 - pool) * (1 / 4 + 1 / 3))
    assert r["z_stat"] == (p_b - p_a) / se
    assert not r["significant"]
    assert r["valid_test"]


def test_ab_conversion_degenerate_arms(spark):
    # variant 1 has NO exposed users -> valid_test false, significant
    # an explicit false (not NULL), z/rate_b NULL
    rows = [(u, 0, "view") for u in [0, 2, 4]] + [(0, 0, "purchase")]
    df = spark.createDataFrame(rows, "user_id long, variant long, event_type string")
    r = engagement.ab_conversion(
        df, "user_id", "variant", "event_type", "view", "purchase"
    ).collect()[0]
    assert r["n_b"] == 0
    assert r["valid_test"] is False
    assert r["significant"] is False
    assert r["rate_b"] is None and r["z_stat"] is None

    # all exposed users converted in both arms -> pooled rate 1, se=0
    rows2 = [(u, u % 2, "view") for u in range(4)] + [
        (u, u % 2, "purchase") for u in range(4)
    ]
    df2 = spark.createDataFrame(rows2, "user_id long, variant long, event_type string")
    r2 = engagement.ab_conversion(
        df2, "user_id", "variant", "event_type", "view", "purchase"
    ).collect()[0]
    assert r2["valid_test"] is False
    assert r2["significant"] is False


def test_item_neighbors_model(spark):
    import math

    baskets = {1: [10, 20, 30], 2: [10, 20], 3: [10, 20, 40], 4: [30, 40]}
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r["item"], r["neighbor"]): (r["pair_count"], r["score"], r["rank"])
        for r in engagement.item_neighbors(df, "basket", "item", k=2, min_pair_count=1).collect()
    }
    n = Counter(i for s in baskets.values() for i in set(s))
    pc = Counter()
    for s in baskets.values():
        for a, b in itertools.combinations(sorted(set(s)), 2):
            pc[(a, b)] += 1
    # (10,20) co-occur 3x of n10=3, n20=3 -> cosine 1.0, mutual rank 1
    assert got[(10, 20)][1] == 3 / math.sqrt(3 * 3) == 1.0
    assert got[(10, 20)][2] == 1 and got[(20, 10)][2] == 1
    # every emitted score matches the model and k bounds hold per item
    for (a, b), (c, s, rk) in got.items():
        key = (min(a, b), max(a, b))
        assert c == pc[key]
        assert s == c / math.sqrt(n[a] * n[b])
        assert rk <= 2


def test_rfm_scores_empty_input_returns_empty(spark):
    df = spark.createDataFrame([], "cust long, d timestamp, amt double")
    out = engagement.rfm_scores(df, "cust", "d", "amt")
    assert out.count() == 0
    assert "rfm_segment" in out.columns  # schema intact


def test_frequent_triples_model(spark):
    baskets = {
        1: [1, 2, 3],
        2: [1, 2, 3, 4],
        3: [1, 2, 4],
        4: [2, 3, 4],
        5: [1, 3],
    }
    rows = [(b, i) for b, its in baskets.items() for i in its]
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r["item_a"], r["item_b"], r["item_c"]): r["triple_count"]
        for r in engagement.frequent_triples(df, "basket", "item", min_support=2).collect()
    }
    sets = [set(v) for v in baskets.values()]
    expect = {}
    for t in itertools.combinations(sorted({i for s in sets for i in s}), 3):
        n = sum(1 for s in sets if set(t) <= s)
        if n >= 2:
            expect[t] = n
    assert got == expect
    # sanity: (1,2,3) in baskets 1,2 -> 2; all its sub-pairs frequent
    assert got[(1, 2, 3)] == 2


def test_frequent_triples_prune_excludes_infrequent_pairs(spark):
    # triple (1,2,3) occurs twice but pair (1,3) appears... construct:
    # make (2,3) frequent, (1,3) frequent, (1,2) NOT frequent -> the
    # triple can never reach min_support by downward closure, and the
    # prune must not emit it regardless
    df = spark.createDataFrame(
        [(1, 1), (1, 3), (2, 2), (2, 3), (3, 1), (3, 3), (4, 2), (4, 3)],
        "basket long, item long",
    )
    assert engagement.frequent_triples(df, "basket", "item", min_support=2).count() == 0


def test_returning_users_model(spark):
    # user 1: days 0, 2 (returning on 2); user 2: days 0, 9 (gap > 7,
    # NOT returning on 9); user 3: day 2 only (new)
    ev = _events(spark, [(1, 0, 1), (1, 2, 2), (2, 0, 3), (2, 9, 4), (3, 2, 5)])
    got = {
        r["day"]: (r["dau"], r["n_returning"])
        for r in engagement.returning_users(ev, window_days=7).collect()
    }
    d = lambda i: (D0 + __import__("datetime").timedelta(days=i)).date()
    assert got == {d(0): (2, 0), d(2): (2, 1), d(9): (1, 0)}
