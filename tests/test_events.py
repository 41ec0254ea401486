"""Temporal operators: as-of, range join, sessionization — naive-Python
ground truth on small fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators import events as E


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # (event_id, user_id, minute, type, value)
        (1, 1, 0, "signup", 10.0),
        (2, 1, 5, "click", 1.0),
        (3, 1, 40, "signup", 20.0),
        (4, 1, 41, "click", 2.0),
        (5, 2, 10, "click", 3.0),      # click with no prior signup
        (6, 2, 12, "signup", 30.0),
        (7, 2, 12, "click", 4.0),      # same-ts click: <= semantics
    ]
    return spark.createDataFrame(
        [(i, u, _ts(m), t, v) for i, u, m, t, v in rows],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    ).cache()


def test_asof_join(ev):
    clicks = ev.filter(F.col("event_type") == "click")
    signups = ev.filter(F.col("event_type") == "signup")
    out = {r["event_id"]: r for r in E.asof_join(clicks, signups).collect()}
    assert out[2]["asof_value"] == 10.0
    assert out[4]["asof_value"] == 20.0   # latest prior, not first
    assert out[5]["asof_value"] is None   # no prior signup
    assert out[7]["asof_value"] == 30.0   # same-timestamp counts (<=)


def test_asof_join_tolerance(ev):
    clicks = ev.filter(F.col("event_type") == "click")
    signups = ev.filter(F.col("event_type") == "signup")
    out = {
        r["event_id"]: r
        for r in E.asof_join(clicks, signups, tolerance_minutes=3).collect()
    }
    assert out[2]["asof_value"] is None   # 5 min > 3 min tolerance
    assert out[4]["asof_value"] == 20.0   # 1 min within tolerance


def test_range_join(ev):
    signups = ev.filter(F.col("event_type") == "signup")
    clicks = ev.filter(F.col("event_type") == "click")
    pairs = E.range_join(signups, clicks, window_minutes=10).collect()
    got = {(r["l_event_id"], r["r_event_id"]) for r in pairs}
    assert got == {(1, 2), (3, 4)}  # same-ts click NOT in (strict >)


def test_sessionize(spark):
    rows = [(1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(60)), (4, 2, _ts(0))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = E.sessionize(df, gap_minutes=30)
    sess = [(r["user_id"], r["n_events"]) for r in out.orderBy("user_id", "session_id").collect()]
    assert sess == [(1, 2), (1, 1), (2, 1)]


def test_windowed_agg_buckets(spark):
    rows = [(1, _ts(0), "a", 1.0), (2, _ts(14), "a", 2.0), (3, _ts(16), "a", 4.0)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = E.windowed_agg(df, "15 minutes").orderBy("window_start").collect()
    assert [r["n_events"] for r in out] == [2, 1]
    assert out[0]["sum_value"] == 3.0


def test_salted_agg_equals_plain(spark, sf_dir):
    from hnsw_vector_db_spark.operators.relational import salted_agg
    from hnsw_vector_db_spark.sources.parquet import load_events

    ev = load_events(spark, sf_dir)
    plain = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in salted_agg(ev, "event_type", salt_buckets=8, salt_on="event_id").collect()
    }
    assert salted == plain
    # the partial phase must actually spread the hot key across buckets
    from hnsw_vector_db_spark.plans.explain import shuffle_count

    assert shuffle_count(salted_agg(ev, "event_type", salt_on="event_id")) >= 2


def test_sketch_accuracy_within_bound(spark, sf_dir):
    from hnsw_vector_db_spark.operators.stats import sketch_accuracy
    from hnsw_vector_db_spark.sources.parquet import load_events

    rows = sketch_accuracy(load_events(spark, sf_dir)).collect()
    assert rows and all(r["ok"] for r in rows)
    # sketches must be real approximations of the exact values, not copies
    assert all(r["users_rel_err"] <= 0.05 and r["p50_rel_err"] <= 0.05 for r in rows)


def test_funnel_steps_known_answer(spark):
    """Hand-built event streams covering: full funnel in window, full
    funnel out of window, strict-ordering tie rejection, partial
    funnels, and no-step-1 users (excluded)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1: view@0 click@5 purchase@10 -> completed (600 s)
        (1, ts(0), "view"), (1, ts(5), "click"), (1, ts(10), "purchase"),
        # u2: completes but purchase lands after the 60-min window
        (2, ts(0), "view"), (2, ts(5), "click"), (2, ts(90), "purchase"),
        # u3: click at the SAME instant as view -> strict > rejects it
        (3, ts(0), "view"), (3, ts(0), "click"), (3, ts(10), "purchase"),
        # u4: click before any view -> step 1 only
        (4, ts(5), "view"), (4, ts(0), "click"),
        # u5: no view at all -> excluded
        (5, ts(0), "click"), (5, ts(1), "purchase"),
    ]
    ev = spark.createDataFrame(
        [(u, t, et) for u, t, et in rows],
        "user_id long, ts timestamp, event_type string",
    )
    out = {r["user_id"]: r for r in E.funnel_steps(ev, within_minutes=60).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["step_reached"] == 3 and out[1]["completed"]
    assert out[1]["funnel_seconds"] == 600
    assert out[2]["step_reached"] == 3 and not out[2]["completed"]
    assert out[3]["step_reached"] == 1  # tie not a valid successor
    assert out[4]["step_reached"] == 1
    assert out[4]["funnel_seconds"] is None


def test_funnel_steps_single_shuffle(spark, sf_dir):
    """The chained window minima + per-key collapse must share ONE
    exchange on the key — the whole point of the window formulation."""
    from hnsw_vector_db_spark.plans.explain import shuffle_count
    from hnsw_vector_db_spark.sources.parquet import load_events

    out = E.funnel_steps(load_events(spark, sf_dir))
    assert shuffle_count(out) == 1, out._jdf.queryExecution().executedPlan().toString()


def test_cohort_retention_known_answer(spark):
    """u1 signs up week of Mon 2024-01-01 and is active weeks 0 and 2;
    u2 signs up the next week, active week 0 only; u3 never signs up
    (excluded); pre-signup activity doesn't count."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 2, 10, 0), "signup"),
        (1, dt.datetime(2024, 1, 3, 9, 0), "click"),       # offset 0
        (1, dt.datetime(2024, 1, 17, 9, 0), "view"),       # offset 2
        (2, dt.datetime(2024, 1, 9, 8, 0), "signup"),      # next cohort
        (2, dt.datetime(2024, 1, 8, 8, 0), "click"),       # BEFORE signup
        (3, dt.datetime(2024, 1, 2, 8, 0), "click"),       # never signs up
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in E.cohort_retention(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,  # u1 signup+click week 0
        ("2024-01-01", 2): 1,  # u1 view week 2
        ("2024-01-08", 0): 1,  # u2 signup itself counts at offset 0
    }


def test_resample_ffill_known_values(spark):
    """Grid spans [first, last] bucket per key; gaps forward-fill the
    last observed value; within-bucket last-writer wins with (ts, id)
    tiebreak; keys never bleed into each other."""
    import datetime as dt

    from hnsw_vector_db_spark.operators.events import resample_ffill

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def h(hours, minutes=0):
        return t0 + dt.timedelta(hours=hours, minutes=minutes)

    rows = [
        # user 1: values at hours 0 and 3, gap at 1-2
        (10, h(0, 5), 1, 1.0),
        (11, h(0, 50), 1, 2.0),   # same bucket, later ts -> wins
        (12, h(3, 0), 1, 9.0),
        # same-ts tiebreak: higher event_id wins
        (13, h(3, 0), 1, 7.0),
        # user 2: single event -> single-bucket grid
        (20, h(5), 2, 4.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        (r["user_id"], r["bucket_start"].hour): (r["value_ffill"], r["is_gap"])
        for r in resample_ffill(ev, every="1 hour").collect()
    }
    assert got == {
        (1, 0): (2.0, False),
        (1, 1): (2.0, True),
        (1, 2): (2.0, True),
        (1, 3): (7.0, False),   # event_id 13 beats 12 at the same ts
        (2, 5): (4.0, False),
    }


def test_anomaly_zscore_known_answer(spark):
    """A spike against a varied 6-event baseline flags; the spike's own
    value is excluded from its baseline (exclusive frame end); users
    with fewer than min_prior baseline events never flag; a constant
    baseline (sd == 0) never divides by zero."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1: alternating 10/11 baseline, then a 100.0 spike
        (1, m(0), 1, 10.0), (2, m(10), 1, 11.0), (3, m(20), 1, 10.0),
        (4, m(30), 1, 11.0), (5, m(40), 1, 10.0), (6, m(50), 1, 11.0),
        (7, m(60), 1, 100.0),
        # u2: only 3 prior events before its spike -> min_prior gate
        (10, m(0), 2, 1.0), (11, m(1), 2, 2.0), (12, m(2), 2, 1.0),
        (13, m(3), 2, 50.0),
        # u3: constant baseline (sd = 0) then a spike -> sd > 0 gate
        (20, m(0), 3, 5.0), (21, m(1), 3, 5.0), (22, m(2), 3, 5.0),
        (23, m(3), 3, 5.0), (24, m(4), 3, 5.0), (25, m(5), 3, 99.0),
    ]
    ev = spark.createDataFrame(
        [(i, t, u, v) for i, t, u, v in rows],
        "event_id long, ts timestamp, user_id long, value double",
    )
    out = E.anomaly_zscore(ev, window_s=3600 * 6, min_prior=5, z_cut=3.0)
    got = {r["event_id"]: r for r in out.collect()}
    assert set(got) == {7}
    r = got[7]
    assert r["n_prior"] == 6
    # baseline mean 10.5, sample sd of [10,11]*3 = sqrt(0.3)
    import math

    expect_z = round((100.0 - 10.5) / math.sqrt(0.3), 4)
    assert r["z"] == pytest.approx(expect_z)


def test_anomaly_zscore_single_shuffle(spark, sf_dir):
    from hnsw_vector_db_spark.plans.explain import shuffle_count
    from hnsw_vector_db_spark.sources.parquet import load_events

    out = E.anomaly_zscore(load_events(spark, sf_dir))
    assert shuffle_count(out) == 1


def test_scd2_history_known_answer(spark):
    """Consecutive same-state events fold into one version; valid_to
    chains to the next CHANGE (not the next event); the last version is
    open-ended and current; same-ts ties order by event_id."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, m(0), 1, "free"), (2, m(10), 1, "free"),   # fold
        (3, m(20), 1, "pro"),
        (4, m(30), 1, "pro"), (5, m(40), 1, "free"),
        # u2: two different states at the SAME ts -> event_id orders them
        (10, m(0), 2, "b"), (11, m(0), 2, "a"),
    ]
    ev = spark.createDataFrame(
        [(i, t, u, s) for i, t, u, s in rows],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = E.scd2_history(ev).collect()
    u1 = sorted(
        [(r["state"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in out if r["user_id"] == 1]
    )
    assert u1 == [
        ("free", "2024-01-01 00:00:00", "2024-01-01 00:20:00", False),
        ("free", "2024-01-01 00:40:00", "9999-12-31 00:00:00", True),
        ("pro", "2024-01-01 00:20:00", "2024-01-01 00:40:00", False),
    ]
    u2 = {r["state"]: r for r in out if r["user_id"] == 2}
    # event_id 10 ("b") precedes 11 ("a") at the same ts
    assert not u2["b"]["is_current"] and u2["a"]["is_current"]


def test_scd2_single_shuffle(spark, sf_dir):
    from hnsw_vector_db_spark.plans.explain import shuffle_count
    from hnsw_vector_db_spark.sources.parquet import load_events

    out = E.scd2_history(load_events(spark, sf_dir))
    assert shuffle_count(out) == 1


def test_ab_welch_matches_numpy(spark):
    """Welch t and df against a straight numpy computation on the same
    fixture (arms = user_id parity)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (int(i), "m", float(v + (i % 2) * 0.5))
        for i, v in enumerate(rng.normal(10.0, 2.0, 400))
    ]
    ev = spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1), u, t, v) for u, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = E.ab_welch(ev).collect()[0]
    a = np.array([v for u, _, v in rows if u % 2 == 0])
    b = np.array([v for u, _, v in rows if u % 2 == 1])
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    df = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert r["mean_a"] == pytest.approx(round(float(a.mean()), 6))
    assert r["t_stat"] == pytest.approx(round(float(t), 4))
    assert r["df"] == pytest.approx(round(float(df), 2))


def test_value_histogram_known_answer(spark):
    """Bucket edges: floor mapping, top-bucket clamp, out-of-range rows
    dropped, per-bucket min/max/sum exact."""
    from hnsw_vector_db_spark.operators.relational import value_histogram

    vals = [0.0, 9.9, 10.0, 15.0, 95.0, 99.9, 100.0, -1.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {
        r["bucket"]: r
        for r in value_histogram(df, "x", lo=0.0, hi=100.0, n_buckets=10).collect()
    }
    assert set(out) == {0, 1, 9}
    assert out[0]["n"] == 2 and out[0]["min_value"] == 0.0 and out[0]["max_value"] == 9.9
    assert out[1]["n"] == 2 and out[1]["sum_value"] == 25.0
    # 95.0, 99.9 in bucket 9; 100.0 passes the < hi+1e-9 guard and the
    # least() clamp folds it into the top bucket; -1.0 is dropped
    assert out[9]["n"] == 3 and out[9]["max_value"] == 100.0
    assert out[9]["bucket_lo"] == 90.0


# ---- rolling actives -------------------------------------------------------

def test_rolling_actives_hand_fixture(spark):
    import datetime as dt

    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.events import rolling_actives

    def t(day, h=0):
        return dt.datetime(2024, 1, day, h)

    ev = spark.createDataFrame([
        Row(ts=t(1), user_id=1), Row(ts=t(1, 5), user_id=1),  # dup same day
        Row(ts=t(1), user_id=2),
        Row(ts=t(2), user_id=2),
        Row(ts=t(5), user_id=3),
    ])
    out = {r["day"]: r for r in rolling_actives(ev, window_days=3).collect()}
    assert out["2024-01-01"]["dau"] == 2
    assert out["2024-01-01"]["rolling_actives"] == 2
    assert out["2024-01-02"]["dau"] == 1
    assert out["2024-01-02"]["rolling_actives"] == 2  # users 1,2 in d1-d2
    # day 5: 3-day window [3,5] only contains user 3; days 3-4 emit no
    # row (grid is observed days only — documented)
    assert out["2024-01-05"]["dau"] == 1
    assert out["2024-01-05"]["rolling_actives"] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rolling_actives(ev, window_days=0)
