"""Kaplan-Meier survival_curve + ohlc_downsample (operators/temporal.py)."""

from __future__ import annotations

import pytest

from pyspark_data_drift_detector_spark.operators.temporal import (
    ohlc_downsample,
    survival_curve,
)
from pyspark_data_drift_detector_spark.plans.inspect import count_shuffles


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_survival_curve_product_limit(spark):
    from datetime import datetime

    day = lambda d: datetime(2024, 1, 1 + d)  # noqa: E731
    rows = [
        # user 1: active day 0..2, silent after -> churned at duration 2
        (1, day(0), 1, 1.0),
        (2, day(2), 1, 1.0),
        # user 2: active through the end -> censored at duration 29
        (3, day(0), 2, 1.0),
        (4, day(29), 2, 1.0),
        # user 3: one event day 5 -> churned at duration 0
        (5, day(5), 3, 1.0),
    ]
    out = {
        r["duration_days"]: r
        for r in survival_curve(
            _events(spark, rows), censor_days=7
        ).collect()
    }
    assert set(out) == {0, 2, 29}
    # duration 0: 3 at risk, 1 churn -> S = 2/3
    assert out[0]["at_risk"] == 3 and out[0]["n_churned"] == 1
    assert out[0]["survival"] == pytest.approx(2 / 3)
    # duration 2: 2 at risk, 1 churn -> S = 2/3 * 1/2 = 1/3
    assert out[2]["at_risk"] == 2 and out[2]["n_churned"] == 1
    assert out[2]["survival"] == pytest.approx(1 / 3)
    # duration 29: censoring only -> survival unchanged
    assert out[29]["n_churned"] == 0 and out[29]["n_censored"] == 1
    assert out[29]["survival"] == pytest.approx(1 / 3)


def test_survival_curve_all_censored_is_flat_one(spark):
    from datetime import datetime

    rows = [
        (i, datetime(2024, 1, 1 + i), 100 + i, 1.0) for i in range(5)
    ]
    # every user's single event is within the censor window of obs_end
    out = survival_curve(_events(spark, rows), censor_days=10).collect()
    assert all(r["survival"] == pytest.approx(1.0) for r in out)
    assert sum(r["n_censored"] for r in out) == 5


def test_survival_curve_terminal_full_churn_hits_zero(spark):
    # when the entire remaining risk set churns at one duration the KM
    # factor is 0: Spark's ln(0) is NULL and a windowed SUM would SKIP
    # it, silently reporting the previous survival — the -inf guard must
    # drive survival to exactly 0.0 (and the state path must agree)
    from datetime import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        survival_from_state,
        survival_state,
    )

    day = lambda d: datetime(2024, 1, 1 + d)  # noqa: E731
    rows = [
        # user 1: active day 0..3 then silent -> churned at duration 3
        (1, day(0), 1, 1.0),
        (2, day(3), 1, 1.0),
        # user 2: single event day 20 (defines obs_end) -> censored, dur 0
        (3, day(20), 2, 1.0),
    ]
    ev = _events(spark, rows)
    out = {
        r["duration_days"]: r
        for r in survival_curve(ev, censor_days=2).collect()
    }
    assert out[3]["at_risk"] == 1 and out[3]["n_churned"] == 1
    assert out[3]["survival"] == 0.0
    assert out[0]["survival"] == pytest.approx(1.0)
    via_state = {
        r["duration_days"]: r["survival"]
        for r in survival_from_state(
            survival_state(ev), censor_days=2
        ).collect()
    }
    assert via_state[3] == 0.0


def test_survival_curve_null_users_dropped(spark):
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1), 1, 1.0),
        (2, datetime(2024, 1, 20), None, 1.0),
    ]
    out = survival_curve(_events(spark, rows), censor_days=2).collect()
    assert sum(r["at_risk"] for r in out if r["duration_days"] == 0) == 1


def _ohlc_rows(spark):
    from datetime import datetime

    t = lambda h, m, s: datetime(2024, 1, 1, h, m, s)  # noqa: E731
    return spark.createDataFrame(
        [
            # hour 0, key 'a': ordered values 10 (open), 99 (high), 5
            (1, t(0, 5, 0), "a", 10.0),
            (2, t(0, 10, 0), "a", 99.0),
            (3, t(0, 50, 0), "a", 5.0),
            # timestamp TIE at the open of hour 1: id 4 < id 5 wins
            (4, t(1, 0, 0), "a", 7.0),
            (5, t(1, 0, 0), "a", 8.0),
            # other key
            (6, t(0, 30, 0), "b", 1.0),
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )


def test_ohlc_downsample_semantics(spark):
    out = {
        (r["event_type"], r["bucket_start"]): r
        for r in ohlc_downsample(_ohlc_rows(spark), bucket="hour").collect()
    }
    a0 = out[("a", "2024-01-01 00:00:00")]
    assert (a0["open"], a0["high"], a0["low"], a0["close"]) == (
        10.0, 99.0, 5.0, 5.0,
    )
    assert a0["n_events"] == 3
    a1 = out[("a", "2024-01-01 01:00:00")]
    # deterministic tie-break on event_id: open is id 4, close id 5
    assert (a1["open"], a1["close"]) == (7.0, 8.0)
    assert out[("b", "2024-01-01 00:00:00")]["n_events"] == 1


def test_ohlc_downsample_rejects_bad_bucket(spark):
    with pytest.raises(ValueError, match="unsupported bucket"):
        ohlc_downsample(_ohlc_rows(spark), bucket="fortnight")


def test_ohlc_single_exchange(spark, sf_dir):
    # the window partition keys equal the groupBy keys: Spark must plan
    # exactly ONE hash exchange (plus nothing else) for the whole op
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert count_shuffles(ohlc_downsample(ev, bucket="hour")) == 1


def test_survival_shuffle_budget(spark, sf_dir):
    # the CORPUS crosses an exchange exactly once (groupBy user); the
    # remaining exchanges — the 1-row obs_end aggregate, the O(users)
    # duration groupBy, and the O(days) panel windows — move scalar or
    # tiny frames only. Budget pins the total so a plan regression
    # (e.g. the corpus re-shuffling for the window) fails loudly.
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert count_shuffles(survival_curve(ev)) <= 5


def test_survival_state_merge_equals_recompute(spark, sf_dir):
    # min/max state is additive: KM from merged day-batch states must
    # equal KM from one pass over the union — bit for bit
    from pyspark_data_drift_detector_spark.operators.temporal import (
        merge_survival_states,
        survival_from_state,
        survival_state,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = survival_state(ev.filter("ts < TIMESTAMP '2024-01-15'"))
    b = survival_state(ev.filter("ts >= TIMESTAMP '2024-01-15'"))
    merged = survival_from_state(
        merge_survival_states(a, b), censor_days=3
    ).collect()
    full = survival_from_state(survival_state(ev), censor_days=3).collect()
    assert sorted(map(tuple, merged), key=lambda t: t[0]) == sorted(
        map(tuple, full), key=lambda t: t[0]
    )


def test_ohlc_rollup_matches_direct_day_pass(spark, sf_dir):
    # hour -> day cascade must agree with a direct day-level pass on
    # everything order-exact (open/high/low/close/n); the weighted mean
    # agrees to float tolerance — INCLUDING under NULL values (every
    # 7th event's value nulled): the rollup mean weights by n_values
    # (non-null count), so mean*weight reproduces each fine cell's true
    # value sum; weighting by n_events would diverge here
    from pyspark.sql import functions as F

    from pyspark_data_drift_detector_spark.operators.temporal import (
        ohlc_rollup,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value")),
    )
    rolled = {
        (r["event_type"], r["bucket_start"]): r
        for r in ohlc_rollup(
            ohlc_downsample(ev, bucket="hour"), to_bucket="day"
        ).collect()
    }
    direct = {
        (r["event_type"], r["bucket_start"]): r
        for r in ohlc_downsample(ev, bucket="day").collect()
    }
    assert set(rolled) == set(direct)
    for k, d in direct.items():
        r = rolled[k]
        assert (r["open"], r["high"], r["low"], r["close"]) == (
            d["open"], d["high"], d["low"], d["close"],
        )
        assert r["n_events"] == d["n_events"]
        assert r["n_values"] == d["n_values"]
        if d["mean"] is None:
            assert r["mean"] is None
        else:
            assert r["mean"] == pytest.approx(d["mean"], rel=1e-9)


def test_ohlc_rollup_all_null_cell_yields_null_mean(spark):
    from datetime import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        ohlc_rollup,
    )

    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 5), "a", None),
            (2, datetime(2024, 1, 1, 1, 5), "a", None),
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    out = ohlc_rollup(
        ohlc_downsample(df, bucket="hour"), to_bucket="day"
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_events"] == 2 and row["n_values"] == 0
    assert row["mean"] is None and row["high"] is None


def test_ohlc_rollup_rejects_bad_bucket(spark):
    from pyspark_data_drift_detector_spark.operators.temporal import (
        ohlc_rollup,
    )

    with pytest.raises(ValueError, match="unsupported rollup bucket"):
        ohlc_rollup(ohlc_downsample(_ohlc_rows(spark)), to_bucket="minute")


def test_bucket_gaps_finds_zero_row_buckets(spark):
    from datetime import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        bucket_gaps,
    )

    t = lambda h: datetime(2024, 1, 1, h)  # noqa: E731
    df = spark.createDataFrame(
        [
            # key 'a': hours 0,1,4,5 observed -> 2,3 missing (gap run 2)
            (1, t(0), "a", 1.0), (2, t(1), "a", 1.0),
            (3, t(4), "a", 1.0), (4, t(5), "a", 1.0),
            # key 'b': complete 0..2
            (5, t(0), "b", 1.0), (6, t(1), "b", 1.0), (7, t(2), "b", 1.0),
            # NULL ts dropped
            (8, None, "a", 1.0),
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    out = {
        r["key"]: r
        for r in bucket_gaps(df, "ts", "event_type", "hour").collect()
    }
    a, b = out["a"], out["b"]
    assert (a["n_expected"], a["n_observed"], a["n_missing"],
            a["longest_gap"]) == (6, 4, 2, 2)
    assert (b["n_expected"], b["n_missing"], b["longest_gap"]) == (3, 0, 0)


def test_bucket_gaps_own_lifespan_not_global(spark):
    from datetime import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        bucket_gaps,
    )

    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0), "old", 1.0),
            (2, datetime(2024, 1, 1, 23), "old", 1.0),
            # 'late' starts at hour 20 — must NOT be missing 0..19
            (3, datetime(2024, 1, 1, 20), "late", 1.0),
            (4, datetime(2024, 1, 1, 21), "late", 1.0),
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    out = {
        r["key"]: r
        for r in bucket_gaps(df, "ts", "event_type", "hour").collect()
    }
    assert out["late"]["n_expected"] == 2 and out["late"]["n_missing"] == 0
    assert out["old"]["n_expected"] == 24 and out["old"]["n_missing"] == 22


def test_bucket_gaps_global_series_and_bad_grain(spark):
    import pytest as _pytest
    from datetime import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        bucket_gaps,
    )

    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), "x", 1.0),
            (2, datetime(2024, 1, 3), "y", 1.0),
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    rows = bucket_gaps(df, "ts", None, "day").collect()
    assert len(rows) == 1
    assert rows[0]["n_expected"] == 3 and rows[0]["n_missing"] == 1
    with _pytest.raises(ValueError, match="granularity"):
        bucket_gaps(df, "ts", None, "fortnight")


def test_survival_grouped_each_cohort_matches_filtered_users(spark, sf_dir):
    # a cohort's grouped curve must equal the ungrouped curve computed
    # over ONLY that cohort's users — with the observation end pinned
    # globally, which "filter the events then run ungrouped" would NOT
    # preserve; so the check recomputes per-cohort risk tables in
    # Python from per-user (first, last, first-type) tuples
    import math

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r["event_type"], r["duration_days"]): (
            r["at_risk"], r["n_churned"], r["n_censored"], r["survival"]
        )
        for r in survival_curve(
            ev, censor_days=2, group_col="event_type"
        ).collect()
    }
    rows = ev.selectExpr(
        "user_id", "CAST(unix_timestamp(ts) AS LONG) AS e", "event_type"
    ).filter("user_id IS NOT NULL AND ts IS NOT NULL").collect()
    users = {}
    for r in rows:
        u = r["user_id"]
        cur = users.get(u)
        pair = (r["e"], r["event_type"])
        if cur is None:
            users[u] = [pair, r["e"]]
        else:
            if pair < cur[0]:
                cur[0] = pair
            if r["e"] > cur[1]:
                cur[1] = r["e"]
    obs_end = max(v[1] for v in users.values())
    cohorts = {}
    for (e0, g), e1 in users.values():
        churned = e1 < obs_end - 2 * 86400
        dur = (e1 - e0) // 86400 if churned else (obs_end - e0) // 86400
        cohorts.setdefault(g, []).append((dur, churned))
    expect = {}
    for g, lifetimes in cohorts.items():
        days = sorted({d for d, _ in lifetimes})
        surv = 1.0
        for d in days:
            at_risk = sum(1 for dd, _ in lifetimes if dd >= d)
            n_ch = sum(1 for dd, c in lifetimes if dd == d and c)
            n_ce = sum(1 for dd, c in lifetimes if dd == d and not c)
            surv = 0.0 if n_ch >= at_risk else surv * math.exp(
                math.log(1.0 - n_ch / at_risk)
            )
            expect[(g, d)] = (at_risk, n_ch, n_ce, surv)
    assert set(got) == set(expect)
    for k, (ar, nch, nce, s) in expect.items():
        assert got[k][:3] == (ar, nch, nce), k
        assert got[k][3] == pytest.approx(s, abs=1e-9), k


def test_survival_grouped_state_merge_equals_recompute(spark, sf_dir):
    # grouped state stays additive: (e0, g) merges lexicographically,
    # so per-cohort KM from merged day-batch states equals one pass
    from pyspark_data_drift_detector_spark.operators.temporal import (
        merge_survival_states,
        survival_from_state,
        survival_state,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = survival_state(
        ev.filter("ts < TIMESTAMP '2024-01-15'"), group_col="event_type"
    )
    b = survival_state(
        ev.filter("ts >= TIMESTAMP '2024-01-15'"), group_col="event_type"
    )
    merged = survival_from_state(
        merge_survival_states(a, b), censor_days=3, group_col="cohort"
    ).collect()
    full = survival_from_state(
        survival_state(ev, group_col="event_type"),
        censor_days=3,
        group_col="cohort",
    ).collect()
    key = lambda t: (t[0], t[1])  # noqa: E731
    assert sorted(map(tuple, merged), key=key) == sorted(
        map(tuple, full), key=key
    )


def test_survival_grouped_matches_curve_from_state(spark, sf_dir):
    # the batch operator and the state path draw identical cohort
    # curves over the same corpus and censoring horizon
    from pyspark_data_drift_detector_spark.operators.temporal import (
        survival_from_state,
        survival_state,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = survival_curve(
        ev, censor_days=2, group_col="event_type"
    ).collect()
    stated = survival_from_state(
        survival_state(ev, group_col="event_type"),
        censor_days=2,
        group_col="event_type",
    ).collect()
    key = lambda t: (t[0], t[1])  # noqa: E731
    assert sorted(map(tuple, direct), key=key) == sorted(
        map(tuple, stated), key=key
    )


def test_survival_report_panel(spark):
    from datetime import datetime, timedelta

    from pyspark_data_drift_detector_spark.operators.temporal import (
        survival_report,
    )

    base = datetime(2024, 1, 1)
    rows = []
    # users 1-6 churn at increasing lifetimes (0,2,4,8,10,40 days);
    # user 7 stays active to the end (censored)
    for uid, life in [(1, 0), (2, 2), (3, 4), (4, 8), (5, 10), (6, 40)]:
        rows += [(uid, base), (uid, base + timedelta(days=life))]
    rows += [(7, base), (7, base + timedelta(days=60))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    curve = survival_curve(ev, censor_days=7)
    out = {
        r["metric"]: r["value"] for r in survival_report(curve).collect()
    }
    assert out["n_users"] == 7.0 and out["n_churned"] == 6.0
    assert out["churn_rate"] == pytest.approx(6 / 7)
    assert out["censoring_rate"] == pytest.approx(1 / 7)
    # survival: d0 6/7, d2 5/7, d4 4/7, d8 3/7 (<=0.5 first here)
    assert out["median_survival_days"] == 8.0
    assert out["survival_7d"] == pytest.approx(4 / 7)
    assert out["survival_30d"] == pytest.approx(2 / 7)


def test_survival_report_no_crossing_is_null_median(spark):
    from datetime import datetime, timedelta

    from pyspark_data_drift_detector_spark.operators.temporal import (
        survival_report,
    )

    base = datetime(2024, 1, 1)
    rows = []
    for uid in range(10):  # everyone censored: survival stays 1.0
        rows += [(uid, base), (uid, base + timedelta(days=30))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["metric"]: r["value"]
        for r in survival_report(survival_curve(ev, censor_days=7)).collect()
    }
    assert out["median_survival_days"] is None
    assert out["censoring_rate"] == 1.0
    assert out["survival_7d"] == 1.0
