"""Semantic invariants for round-4 pipeline operators: quality_filter,
chunk_documents, weighted_sample, sessionize (beyond the DuckDB parity
checks in test_oracle_parity.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pyspark_data_drift_detector_spark.operators.quality import quality_filter
from pyspark_data_drift_detector_spark.operators.sampling import weighted_sample
from pyspark_data_drift_detector_spark.operators.temporal import sessionize
from pyspark_data_drift_detector_spark.operators.text import chunk_documents


# ---------------------------------------------------------------- quality


def test_quality_filter_reasons(spark):
    df = spark.createDataFrame(
        [
            (1, "too short"),  # < 5 tokens
            (2, "the spark engine is running in the cluster today fine"),
            (3, "spam spam spam spam spam spam spam spam spam spam"),  # low diversity
            (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # no stopwords
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_filter(df).collect()}
    assert rows[1]["fail_reasons"] == ["too_short", "low_stopword"]
    assert not rows[1]["passes"]
    assert rows[2]["fail_reasons"] == [] and rows[2]["passes"]
    assert "low_diversity" in rows[3]["fail_reasons"]
    assert "low_stopword" in rows[4]["fail_reasons"]


# ---------------------------------------------------------------- chunking


def test_chunk_documents_covers_every_token(spark):
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = chunk_documents(df, chunk_size=32, stride=24).orderBy("chunk_id").collect()
    # ceil((100-32)/24)+1 = 4 chunks
    assert [c["chunk_id"] for c in chunks] == [0, 1, 2, 3]
    # chunk i starts at token i*stride; consecutive chunks overlap by 8
    for c in chunks:
        toks = c["chunk_text"].split(" ")
        assert toks[0] == f"t{c['chunk_id'] * 24}"
        assert len(toks) == c["n_chunk_tokens"]
    covered = {t for c in chunks for t in c["chunk_text"].split(" ")}
    assert covered == {f"t{i}" for i in range(100)}
    # last chunk is the short tail
    assert chunks[-1]["n_chunk_tokens"] == 100 - 3 * 24


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    chunks = chunk_documents(df, chunk_size=32, stride=24).collect()
    assert len(chunks) == 1
    assert chunks[0]["chunk_text"] == "a b c"
    assert chunks[0]["n_chunk_tokens"] == 3


# ---------------------------------------------------------------- sampling


def test_weighted_sample_deterministic_and_biased(spark):
    # weights 1 vs 1000: the heavy half must dominate any fixed-size sample
    rows = [(i, 1000 if i < 200 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    s1 = {r["doc_id"] for r in weighted_sample(df, 100, "w").collect()}
    s2 = {r["doc_id"] for r in weighted_sample(df, 100, "w").collect()}
    assert s1 == s2  # hash-derived, layout-independent
    heavy = sum(1 for d in s1 if d < 200)
    assert heavy >= 90  # P[heavy item beats light item] = 1000/1001
    assert len(s1) == 100
    # different salt → different (but still deterministic) sample
    s3 = {r["doc_id"] for r in weighted_sample(df, 100, "w", salt="other").collect()}
    assert s3 != s1


# ---------------------------------------------------------------- sessions


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_sessionize_gap_boundary_semantics(spark):
    """Pins Spark session_window's merge rule: events EXACTLY gap apart
    merge (windows [t, t+gap) must strictly overlap to merge ⇔ a new
    session starts only when the gap is strictly greater). The DuckDB
    oracle in __spark_entry__ replays this with `> INTERVAL`."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 1.0),
        (1, t0 + datetime.timedelta(hours=1), 1.0),  # exactly gap → merges
        (1, t0 + datetime.timedelta(hours=2, seconds=1), 1.0),  # > gap → new
    ]
    out = sessionize(_ev(spark, rows), gap="1 hour").orderBy("session_start").collect()
    assert [r["n_events"] for r in out] == [2, 1]
    assert out[0]["duration_sec"] == 3600.0


def test_sessionize_per_user_isolation(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 2.0),
        (2, t0 + datetime.timedelta(minutes=5), 3.0),  # other user, same time region
        (1, t0 + datetime.timedelta(minutes=10), 4.0),
    ]
    out = sessionize(_ev(spark, rows), gap="1 hour").collect()
    by_user = {r["user_id"]: r for r in out}
    assert len(out) == 2
    assert by_user[1]["n_events"] == 2 and by_user[1]["total_value"] == 6.0
    assert by_user[2]["n_events"] == 1 and by_user[2]["total_value"] == 3.0


# ---------------------------------------------------------------- corpus


def test_vocab_drift_oov_accounting(spark):
    from pyspark_data_drift_detector_spark.operators.corpus import vocab_drift

    ref = spark.createDataFrame([(1, "a b c a")], "doc_id long, text string")
    curr = spark.createDataFrame([(2, "a b x x y")], "doc_id long, text string")
    row = vocab_drift(ref, curr).collect()[0]
    assert row["ref_types"] == 3 and row["curr_types"] == 4
    assert row["new_types"] == 2  # x, y
    assert row["lost_types"] == 1  # c
    assert row["ref_tokens"] == 4 and row["curr_tokens"] == 5
    assert abs(row["oov_token_rate"] - 3 / 5) < 1e-12  # x,x,y of 5
    assert row["drift_detected"]


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    from pyspark_data_drift_detector_spark.operators.corpus import tfidf_keywords

    df = spark.createDataFrame(
        [
            (1, "common common apple apple apple"),
            (2, "common common banana"),
            (3, "common cherry cherry"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["rank"]): r["token"]
        for r in tfidf_keywords(df, k=1).collect()
    }
    # the corpus-wide term never wins; each doc's distinctive term does
    assert out[(1, 1)] == "apple"
    assert out[(2, 1)] == "banana"
    assert out[(3, 1)] == "cherry"


def test_unigram_logprob_rare_tokens_score_lower(spark):
    from pyspark_data_drift_detector_spark.operators.corpus import unigram_logprob

    df = spark.createDataFrame(
        [(1, "the the the the the"), (2, "zyzzyva qwerty xylyl")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert rows[1]["avg_logprob"] > rows[2]["avg_logprob"]
    assert rows[2]["perplexity"] > rows[1]["perplexity"]
    assert rows[1]["n_tokens"] == 5


# ------------------------------------------------------------ semi-structured


def test_json_fields_null_safety_and_inference(spark):
    from pyspark_data_drift_detector_spark.operators.semistructured import (
        infer_json_fields,
        json_fields,
    )

    df = spark.createDataFrame(
        [
            (1, '{"k": 5, "tag": "a"}'),
            (2, '{"k": "not-a-number"}'),  # wrong type -> NULL via try_cast
            (3, "not json at all"),  # malformed -> NULL
            (4, None),  # null payload -> NULL
        ],
        "id long, props string",
    )
    out = {
        r["id"]: (r["k"], r["tag"])
        for r in json_fields(df, "props", {"k": "bigint", "tag": "string"}).collect()
    }
    assert out[1] == (5, "a")
    assert out[2][0] is None
    assert out[3] == (None, None)
    assert out[4] == (None, None)

    inferred = infer_json_fields(df.filter(F.col("id") == 1), "props")
    assert inferred.get("k", "").upper() == "BIGINT"
    assert inferred.get("tag", "").upper() == "STRING"


# ------------------------------------------------------------ mergeable


def test_incremental_profile_window_matches_direct(spark, sf_dir):
    """Merging a SUBSET of partition summaries equals profiling that
    subset directly — the no-rescan window query the summary table
    exists for."""
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        incremental_profile,
        merge_profiles,
        partitioned_profile,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_discount"]
    parts = partitioned_profile(li, cols, "pmod(l_orderkey, 4)")
    assert parts.count() == 4 * len(cols)

    window = merge_profiles(parts.where(F.col("partition_id").isin(["0", "1"])))
    direct = merge_profiles(
        partitioned_profile(
            li.filter(F.expr("pmod(l_orderkey, 4)") <= 1), cols, F.lit("all")
        )
    )
    w = {r["column_name"]: r for r in window.collect()}
    d = {r["column_name"]: r for r in direct.collect()}
    for c in cols:
        assert w[c]["n"] == d[c]["n"]
        assert w[c]["min"] == d[c]["min"] and w[c]["max"] == d[c]["max"]
        assert abs(w[c]["mean"] - d[c]["mean"]) < 1e-9
        assert abs(w[c]["stddev"] - d[c]["stddev"]) < 1e-9
    # convenience wrapper = the same thing
    inc = {
        r["column_name"]: r
        for r in incremental_profile(
            li, cols, "pmod(l_orderkey, 4)", partitions=["0", "1"]
        ).collect()
    }
    for c in cols:
        assert inc[c]["n"] == w[c]["n"]


def test_json_fields_nested_path(spark):
    from pyspark_data_drift_detector_spark.operators.semistructured import json_fields

    df = spark.createDataFrame(
        [(1, '{"a": {"b": 7}, "c": 1}')], "id long, props string"
    )
    row = json_fields(df, "props", {"a.b": "bigint", "c": "bigint"}).collect()[0]
    assert row["a_b"] == 7 and row["c"] == 1


def test_detect_drift_json_fields_config(spark, sf_dir):
    """cfg['json_fields'] extracts payload fields on both sides and runs
    them through the full pipeline (here: inferred from a ref sample)."""
    import json as _json

    from pyspark_data_drift_detector_spark import detect_drift
    from pyspark_data_drift_detector_spark.sources.snapshot import load_events

    ev = load_events(spark, sf_dir)
    ref = ev.filter(F.col("event_id") % 2 == 0)
    curr = ev.filter(F.col("event_id") % 2 == 1)
    out = detect_drift(
        ref,
        curr,
        {"json_fields": {"props": None}, "analyze_groups": False,
         "analyze_correlations": False},
    ).collect()
    k_rows = [r for r in out if r["column_name"] == "k"]
    assert k_rows, "extracted JSON field k missing from results"
    numeric = [r for r in k_rows if r["column_type"] == "numerical"]
    assert numeric
    metrics = _json.loads(numeric[0]["metrics"])
    assert metrics["ref_n"] > 0 and metrics["curr_n"] > 0
    # the raw JSON string column itself is not analyzed
    assert not [r for r in out if r["column_name"] == "props"]


def test_json_fields_alias_collision_raises(spark):
    from pyspark_data_drift_detector_spark.operators.semistructured import json_fields

    df = spark.createDataFrame([(1, '{"k": 2}', 9)], "id long, props string, k long")
    with pytest.raises(ValueError, match="already exists"):
        json_fields(df, "props", {"k": "bigint"})


def test_hash_split_rejects_bad_fractions(spark):
    from pyspark_data_drift_detector_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="exceeds 1"):
        hash_split(df, {"a": 0.8, "b": 0.4})
    with pytest.raises(ValueError, match="negative"):
        hash_split(df, {"a": -0.1, "b": 0.5})


def test_unsafe_column_names_rejected(spark):
    """SQL-string plan assembly interpolates column names; hostile names
    must be rejected with a clear error at the funnels, not misparse."""
    from pyspark_data_drift_detector_spark import detect_drift
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
        qi,
        qs,
    )
    from pyspark_data_drift_detector_spark.operators.frequency import unpivot_values
    from pyspark_data_drift_detector_spark.operators.profile import numeric_profile

    assert qi("a`b") == "`a``b`"
    assert qs("it's") == r"'it\'s'"
    ensure_safe_columns(["plain", "with space", "ünïcode"])  # fine

    bad = spark.range(3).withColumnRenamed("id", "x'--")
    with pytest.raises(ValueError, match="unsupported"):
        numeric_profile(bad, columns=["x'--"], quantiles=())
    with pytest.raises(ValueError, match="unsupported"):
        unpivot_values(bad, ["x'--"])
    with pytest.raises(ValueError, match="unsupported"):
        detect_drift(bad, bad).collect()


def test_categorical_merge_algebra(spark, sf_dir):
    """The categorical twin of the numeric merge property: merging a
    subset of category-count states equals counting that subset directly,
    and merged_categorical_drift equals categorical_drift over the same
    two windows of raw data."""
    from pyspark_data_drift_detector_spark.operators.categorical_drift import (
        categorical_drift,
    )
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        merge_categories,
        merged_categorical_drift,
        partitioned_categories,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_orderstatus", "o_orderpriority"]
    parts = partitioned_categories(orders, cols, "pmod(o_orderkey, 4)")

    # window merge == direct frequency table over the window's rows
    window = merge_categories(parts.where(F.col("partition_id").isin(["0", "1"])))
    from pyspark_data_drift_detector_spark.operators.frequency import frequency_table

    direct = frequency_table(
        orders.filter(F.expr("pmod(o_orderkey, 4)") <= 1), cols
    )
    w = {(r["column_name"], r["value"]): r["cnt"] for r in window.collect()}
    d = {(r["column_name"], r["value"]): r["cnt"] for r in direct.collect()}
    assert w == d

    # state-table drift == scan-time drift over the same windows
    merged = merged_categorical_drift(parts, ["0", "1"], ["2", "3"])
    scan = categorical_drift(
        orders.filter(F.expr("pmod(o_orderkey, 4)") <= 1),
        orders.filter(F.expr("pmod(o_orderkey, 4)") >= 2),
        cols,
    )
    m = {r["column_name"]: r for r in merged.collect()}
    s = {r["column_name"]: r for r in scan.collect()}
    assert set(m) == set(s)
    for c in cols:
        for field in ("js_distance", "chi_square", "p_value", "drift_score"):
            assert abs((m[c][field] or 0) - (s[c][field] or 0)) < 1e-9, (c, field)
        assert m[c]["drift_detected"] == s[c]["drift_detected"]
        assert m[c]["new_categories"] == s[c]["new_categories"]


def test_asof_join_semantics(spark):
    """Backward inclusive, forward, tolerance, and left-join-null rules of
    the union+running-window as-of join."""
    from pyspark_data_drift_detector_spark.operators.temporal import asof_join

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(5)), (1, t(10)), (1, t(2)), (2, t(7))],
        "lid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(3), 30.0), (1, t(10), 100.0), (3, t(1), 1.0)],
        "user_id long, ts timestamp, price double",
    )
    left = left.withColumnRenamed("lid", "user_id")

    back = {
        (r["user_id"], r["ts"].second): r["price_asof"]
        for r in asof_join(left, right, by="user_id").collect()
    }
    assert back[(1, 5)] == 30.0       # latest at-or-before
    assert back[(1, 10)] == 100.0     # inclusive: equal ts matches
    assert back[(1, 2)] is None       # nothing before → NULL
    assert back[(2, 7)] is None       # key with no right rows → NULL

    fwd = {
        (r["user_id"], r["ts"].second): r["price_asof"]
        for r in asof_join(left, right, by="user_id", direction="forward").collect()
    }
    assert fwd[(1, 5)] == 100.0       # earliest at-or-after
    assert fwd[(1, 2)] == 30.0
    assert fwd[(1, 10)] == 100.0      # inclusive

    tol = {
        (r["user_id"], r["ts"].second): r["price_asof"]
        for r in asof_join(left, right, by="user_id", tolerance_sec=1.5).collect()
    }
    assert tol[(1, 5)] is None        # 2s gap > 1.5s tolerance
    assert tol[(1, 10)] == 100.0      # 0s gap


def test_asof_join_single_shuffle(spark, sf_dir):
    """Plan contract: union + one running window — exactly one exchange,
    no join operator, no row explosion."""
    from pyspark_data_drift_detector_spark.operators.temporal import asof_join
    from pyspark_data_drift_detector_spark.plans.inspect import (
        count_shuffles,
        simple_plan,
    )
    from pyspark_data_drift_detector_spark.sources.snapshot import load_events

    ev = load_events(spark, sf_dir)
    left = ev.filter(F.col("event_type") != "error").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = asof_join(left, right, by="user_id")
    assert count_shuffles(out) == 1
    assert "Join" not in simple_plan(out)


def test_hll_distinct_merge_property(spark, sf_dir):
    """Unioning a window's HLL sketches gives the SAME estimate as
    sketching the window's rows directly (sketch merge is lossless for
    the estimator), and the estimate lands within the lg_k=12 error band
    of the exact count."""
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        merged_distinct,
        partitioned_distinct,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_custkey", "o_orderpriority"]
    parts = partitioned_distinct(orders, cols, "pmod(o_orderkey, 4)")
    window = merged_distinct(parts.where(F.col("partition_id").isin(["0", "1"])))
    direct = merged_distinct(
        partitioned_distinct(
            orders.filter(F.expr("pmod(o_orderkey, 4)") <= 1), cols, F.lit("all")
        )
    )
    w = {r["column_name"]: r["distinct_estimate"] for r in window.collect()}
    d = {r["column_name"]: r["distinct_estimate"] for r in direct.collect()}
    assert w == d
    exact = {
        c: orders.filter(F.expr("pmod(o_orderkey, 4) <= 1"))
        .select(F.countDistinct(F.col(c).cast("string")))
        .collect()[0][0]
        for c in cols
    }
    for c in cols:
        assert abs(w[c] - exact[c]) / max(exact[c], 1) <= 0.05, (c, w[c], exact[c])


def test_interval_join_semantics(spark):
    """Containment is inclusive on both ends, per-key, and bucket
    boundaries don't drop matches (events near bucket edges)."""
    from pyspark_data_drift_detector_spark.operators.temporal import interval_join

    t = lambda h, m=0, s=0: datetime.datetime(2024, 1, 1, h, m, s)
    ev = spark.createDataFrame(
        [
            (1, t(1), "start_edge"),     # == session_start
            (1, t(2), "end_edge"),       # == session_end
            (1, t(2, 0, 1), "outside"),  # 1s past end
            (2, t(1, 30), "other_key"),  # key with no interval
        ],
        "user_id long, ts timestamp, tag string",
    )
    iv = spark.createDataFrame(
        [(1, t(1), t(2), 7)],
        "user_id long, session_start timestamp, session_end timestamp, sid long",
    )
    got = {r["tag"] for r in interval_join(ev, iv, bucket="15 minutes").collect()}
    assert got == {"start_edge", "end_edge"}
    # an interval spanning many buckets still matches an event mid-way
    iv2 = spark.createDataFrame(
        [(1, t(1), t(23), 8)],
        "user_id long, session_start timestamp, session_end timestamp, sid long",
    )
    mid = spark.createDataFrame(
        [(1, t(12, 34), "mid")], "user_id long, ts timestamp, tag string"
    )
    assert [r["sid"] for r in interval_join(mid, iv2, bucket="1 hour").collect()] == [8]


def test_pii_scrub_classes_and_order(spark):
    """Each class redacts with its own token; specific classes (ssn, ipv4)
    are never consumed by the broader phone pattern; clean text is
    untouched with zero counts."""
    from pyspark_data_drift_detector_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "bob@x.co +1 555-123-4567 10.0.0.1 123-45-6789"),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["scrubbed"] == "[EMAIL] [PHONE] [IPV4] [SSN]"
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ipv4"], rows[1]["n_ssn"]) == (1, 1, 1, 1)
    assert rows[1]["n_pii_total"] == 4
    assert rows[2]["scrubbed"] == "no pii here at all"
    assert rows[2]["n_pii_total"] == 0


def test_pii_scrub_is_narrow_map(spark, sf_dir):
    from pyspark_data_drift_detector_spark.operators.text import pii_scrub
    from pyspark_data_drift_detector_spark.plans.inspect import count_shuffles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert count_shuffles(pii_scrub(docs)) == 0


def test_cusum_detects_mean_shift_not_noise(spark):
    from pyspark_data_drift_detector_spark.operators.temporal import cusum_changepoint

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for i in range(80):
        ts = base + datetime.timedelta(minutes=i)
        rows.append((1, ts, 10.0 + (0.2 if i % 2 else -0.2)))          # stable
        rows.append((2, ts, (10.0 if i < 40 else 14.0) + (0.2 if i % 2 else -0.2)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["user_id"]: r for r in cusum_changepoint(df).collect()}
    assert out[1]["alarm"] is False and out[1]["first_alarm_ts"] is None
    assert out[2]["alarm"] is True and out[2]["first_alarm_ts"] is not None
    assert out[2]["max_cusum_pos"] > 5.0


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check: the union+running-window as-of join equals
    pandas.merge_asof (backward, inclusive) on every row."""
    import random as _random

    import pandas as pd

    from pyspark_data_drift_detector_spark.operators.temporal import asof_join

    rng = _random.Random(3)
    base = datetime.datetime(2024, 1, 1)
    lrows, rrows = [], []
    for key in (1, 2, 3):
        used = set()
        for _ in range(40):
            lrows.append((key, base + datetime.timedelta(seconds=rng.randrange(0, 5000))))
        for _ in range(12):
            s = rng.randrange(0, 5000)
            if (key, s) in used:          # right side must be unique per (key, ts)
                continue
            used.add((key, s))
            rrows.append((key, base + datetime.timedelta(seconds=s), float(s)))
    left = spark.createDataFrame(lrows, "k long, ts timestamp")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, px double")

    got = {
        (r["k"], r["ts"]): r["px_asof"]
        for r in asof_join(left, right, ts_col="ts", by="k").collect()
    }
    lp = pd.DataFrame(lrows, columns=["k", "ts"]).sort_values("ts").reset_index(drop=True)
    rp = pd.DataFrame(rrows, columns=["k", "ts", "px"]).sort_values("ts").reset_index(drop=True)
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in exp.iterrows():
        want = None if pd.isna(row["px"]) else float(row["px"])
        assert got[(row["k"], row["ts"].to_pydatetime())] == want


def test_cusum_closed_form_matches_recursion(spark):
    """The running-sum − running-min closed form equals the textbook
    S_t = max(0, S_{t-1} + z_t − k) recursion on random series."""
    import random as _random

    from pyspark_data_drift_detector_spark.operators.temporal import cusum_changepoint

    rng = _random.Random(5)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    series = {}
    for key in (1, 2):
        vals = [rng.gauss(0, 1) + (2.0 if key == 2 and i > 50 else 0.0) for i in range(90)]
        series[key] = vals
        rows += [
            (key, base + datetime.timedelta(minutes=i), v) for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["user_id"]: r for r in cusum_changepoint(df, k=0.5, h=4.0).collect()}

    import statistics

    for key, vals in series.items():
        mu = statistics.fmean(vals)
        sigma = statistics.pstdev(vals)
        sp = sn = mx_p = mx_n = 0.0
        alarm_i = None
        for i, v in enumerate(vals):
            z = (v - mu) / sigma if sigma > 0 else 0.0
            sp = max(0.0, sp + z - 0.5)
            sn = max(0.0, sn - z - 0.5)
            mx_p, mx_n = max(mx_p, sp), max(mx_n, sn)
            if alarm_i is None and (sp > 4.0 or sn > 4.0):
                alarm_i = i
        assert abs(out[key]["max_cusum_pos"] - mx_p) < 1e-9, key
        assert abs(out[key]["max_cusum_neg"] - mx_n) < 1e-9, key
        assert out[key]["alarm"] == (alarm_i is not None)
        if alarm_i is not None:
            assert out[key]["first_alarm_ts"] == base + datetime.timedelta(minutes=alarm_i)


def test_kll_quantile_merge_property(spark, sf_dir):
    """Merged-sketch estimates stay inside the exact rank band. NOTE:
    unlike HLL (where union == direct sketch), KLL merge compacts
    differently than single-stream updates, so window-merge and
    direct-sketch estimates legitimately differ — the CONTRACT is the
    rank-error bound, which both paths must honor."""
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        merged_quantiles,
        partitioned_quantiles,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice"]
    parts = partitioned_quantiles(li, cols, "pmod(l_orderkey, 4)")
    window = merged_quantiles(parts.where(F.col("partition_id").isin(["0", "1"])))
    direct = merged_quantiles(
        partitioned_quantiles(
            li.filter(F.expr("pmod(l_orderkey, 4)") <= 1), cols, F.lit("all")
        )
    )
    w = {(r["column_name"], r["p"]): r["value"] for r in window.collect()}
    d = {(r["column_name"], r["p"]): r["value"] for r in direct.collect()}
    assert set(w) == set(d)
    win_rows = li.filter(F.expr("pmod(l_orderkey, 4)") <= 1)
    for (c, p) in w:
        lo, hi = win_rows.selectExpr(
            f"percentile(CAST(`{c}` AS DOUBLE), {max(p - 0.02, 0.0)}D) AS lo",
            f"percentile(CAST(`{c}` AS DOUBLE), {min(p + 0.02, 1.0)}D) AS hi",
        ).collect()[0]
        assert lo <= w[(c, p)] <= hi, ("merged", c, p, w[(c, p)], lo, hi)
        assert lo <= d[(c, p)] <= hi, ("direct", c, p, d[(c, p)], lo, hi)


def test_merged_drift_quantile_state_wiring(spark, sf_dir):
    """merged_drift with a KLL state table reports the quantile metrics;
    without it they are NULL and the weighted score renormalizes over the
    remaining weight mass (deterministic metrics identical either way)."""
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        merged_drift,
        partitioned_profile,
        partitioned_quantiles,
    )
    from pyspark_data_drift_detector_spark.operators.numeric_drift import (
        SCORE_WEIGHTS,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice"]
    prof = partitioned_profile(li, cols, "pmod(l_orderkey, 4)")
    qparts = partitioned_quantiles(li, cols, "pmod(l_orderkey, 4)")

    with_q = {
        r["column_name"]: r
        for r in merged_drift(prof, ["0", "1"], ["2", "3"], quantile_parts=qparts)
        .collect()
    }
    without_q = {
        r["column_name"]: r
        for r in merged_drift(prof, ["0", "1"], ["2", "3"]).collect()
    }
    assert set(with_q) == set(without_q) == set(cols)
    quantile_metrics = ["median_relative_diff", "iqr_relative_diff"]
    other_metrics = [m for m in SCORE_WEIGHTS if m not in quantile_metrics]
    for c in cols:
        for m in quantile_metrics:
            assert with_q[c][m] is not None, (c, m)
            assert without_q[c][m] is None, (c, m)
        # deterministic metrics identical across modes
        for m in other_metrics:
            assert with_q[c][m] == without_q[c][m], (c, m)
        # weight-mass renormalization: reconstruct each score from its
        # non-null metrics and the published weights
        for row in (with_q[c], without_q[c]):
            contrib = sum(
                abs(row[m]) * w
                for m, w in SCORE_WEIGHTS.items()
                if row[m] is not None
            )
            mass = sum(w for m, w in SCORE_WEIGHTS.items() if row[m] is not None)
            expected = min(contrib / mass, 1.0) if mass > 0 else 0.0
            assert row["drift_score"] == pytest.approx(expected, abs=1e-9), c


def test_asof_join_null_values_stay_null(spark):
    """A matched right row's NULL value column must stay NULL (pandas/
    DuckDB merge_asof semantics) — not be back-filled from an older right
    row (the torn-row hazard of carrying columns independently)."""
    import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import asof_join

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    right = spark.createDataFrame(
        [("u", ts(0), 1.0, "a"), ("u", ts(10), None, "b")],
        "user_id string, ts timestamp, px double, tag string",
    )
    left = spark.createDataFrame(
        [("u", ts(5)), ("u", ts(15))], "user_id string, ts timestamp"
    )
    rows = {
        r["ts"]: r
        for r in asof_join(left, right, value_cols=["px", "tag"]).collect()
    }
    first, second = rows[ts(5)], rows[ts(15)]
    # ts(5) matches the ts(0) row: px=1.0, tag='a'
    assert first["ts_asof"] == ts(0)
    assert first["px_asof"] == 1.0 and first["tag_asof"] == "a"
    # ts(15) matches the ts(10) row whose px is NULL — it must STAY null
    assert second["ts_asof"] == ts(10)
    assert second["px_asof"] is None, "NULL back-filled from an older right row"
    assert second["tag_asof"] == "b"


def test_incremental_pipeline_matches_scan_time_detect_drift(spark, sf_dir):
    """E2E state-table parity: detect_drift_incremental over numeric +
    categorical + KLL quantile + HLL distinct state must agree with
    scan-time detect_drift on the same window — decisions and severities
    exactly, scores within the sketch tolerance, distinct estimates
    within the HLL error band."""
    from pyspark_data_drift_detector_spark import detect_drift
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        merged_distinct,
        partitioned_categories,
        partitioned_distinct,
        partitioned_profile,
        partitioned_quantiles,
    )
    from pyspark_data_drift_detector_spark.pipeline import detect_drift_incremental

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # (l_discount is excluded: scan-time inference classifies its tiny
    # value domain as a 'group' column, which the numeric state table
    # deliberately does not model)
    num_cols = ["l_quantity", "l_extendedprice"]
    cat_cols = ["l_returnflag", "l_linestatus"]
    pid = "pmod(l_orderkey, 4)"

    inc = {
        r["column_name"]: r
        for r in detect_drift_incremental(
            partitioned_profile(li, num_cols, pid),
            partitioned_categories(li, cat_cols, pid),
            ["0", "1"],
            ["2", "3"],
            quantile_state=partitioned_quantiles(li, num_cols, pid),
        ).collect()
    }

    ref = li.filter(F.expr(pid) <= 1)
    curr = li.filter(F.expr(pid) >= 2)
    # keep the core numerical/categorical rows (other analyzer families —
    # group/dimension — emit extra rows per column)
    scan = {
        r["column_name"]: r
        for r in detect_drift(
            ref,
            curr,
            {
                "include_columns": num_cols + cat_cols,
                # pin the semantic types the state tables model (inference
                # would route l_extendedprice to the distribution analyzer)
                "custom_column_types": {
                    **{c: "numerical" for c in num_cols},
                    **{c: "categorical" for c in cat_cols},
                },
                # the state tables model the core numeric/categorical rows;
                # distribution-family rows have no incremental counterpart
                "analyze_distributions": False,
            },
        ).collect()
        if r["column_type"] in ("numerical", "categorical")
    }

    assert set(inc) == set(num_cols + cat_cols)
    for c in inc:
        assert c in scan, c
        assert inc[c]["column_type"] == scan[c]["column_type"], c
        assert inc[c]["drift_detected"] == scan[c]["drift_detected"], c
        assert inc[c]["drift_severity"] == scan[c]["drift_severity"], c
        # categorical counts are exact state — scores match to float noise;
        # numeric scores carry KLL-estimated median/IQR (0.35 weight mass)
        # against the scan path's percentiles — allow the sketch band
        tol = 1e-6 if inc[c]["column_type"] == "categorical" else 0.02
        assert inc[c]["drift_score"] == pytest.approx(
            scan[c]["drift_score"], abs=tol
        ), c

    # distinct state: merged HLL window estimate vs exact window distinct
    dist = {
        r["column_name"]: r["distinct_estimate"]
        for r in merged_distinct(
            partitioned_distinct(li, cat_cols + ["l_quantity"], pid).where(
                F.col("partition_id").isin(["0", "1"])
            )
        ).collect()
    }
    for c in cat_cols + ["l_quantity"]:
        exact = ref.select(c).where(F.col(c).isNotNull()).distinct().count()
        assert abs(dist[c] - exact) / max(exact, 1) <= 0.05, (c, dist[c], exact)


def test_rollup_cascade_matches_direct(spark, sf_dir):
    """Day-level rollup derived FROM hour states equals aggregating raw
    events at day granularity directly (additive re-association), and at
    runtime the day branch reuses the hour shuffle — raw scanned once."""
    from pyspark_data_drift_detector_spark.operators.temporal import (
        rollup_timeseries,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = rollup_timeseries(ev, granularities=("hour", "day"))
    rows = out.collect()
    day = {
        (r["bucket_start"], r["event_type"]): r
        for r in rows
        if r["granularity"] == "day"
    }
    direct = {
        (r["bucket_start"], r["event_type"]): r
        for r in ev.selectExpr(
            "date_trunc('day', ts) AS bucket_start", "event_type", "value"
        )
        .groupBy("bucket_start", "event_type")
        .agg(
            F.expr("count(1) AS n_rows"),
            F.expr("avg(value) AS mean"),
            F.expr("min(value) AS min"),
            F.expr("max(value) AS max"),
        )
        .collect()
    }
    assert set(day) == set(direct)
    for k in day:
        assert day[k]["n_rows"] == direct[k]["n_rows"], k
        assert day[k]["min"] == direct[k]["min"], k
        assert day[k]["max"] == direct[k]["max"], k
        assert day[k]["mean"] == pytest.approx(direct[k]["mean"], rel=1e-12), k
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, (
        "day level must reuse the hour-level shuffle, not rescan raw events"
    )

    with pytest.raises(ValueError, match="coarsening"):
        rollup_timeseries(ev, granularities=("day", "hour"))
    with pytest.raises(ValueError, match="nest"):
        rollup_timeseries(ev, granularities=("week", "month"))


def test_rollup_cascade_bit_exact_across_partitioning(spark, sf_dir):
    """The r6 driver red: float partial sums flip ROUND(x,5) at 32 CPUs.
    The DECIMAL(38,10) carry makes the cascade bit-exact regardless of
    partition count — a hour->day->month cascade over a 32-way-shuffled
    frame must equal the 1-partition cascade double-for-double (no
    approx), including the deepest (month) re-aggregation level."""
    from pyspark_data_drift_detector_spark.operators.temporal import (
        rollup_timeseries,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def keyed(df):
        return {
            (r["granularity"], r["bucket_start"], r["event_type"]): (
                r["n_rows"], r["n"], r["mean"], r["stddev"], r["min"], r["max"]
            )
            for r in rollup_timeseries(
                df, granularities=("hour", "day", "month")
            ).collect()
        }

    wide = keyed(ev.repartition(32))
    narrow = keyed(ev.coalesce(1))
    assert set(wide) == set(narrow)
    assert any(k[0] == "month" for k in wide)
    for k in wide:
        assert wide[k] == narrow[k], (k, wide[k], narrow[k])


def test_key_skew_profile_detects_hot_key(spark):
    """A 90%-hot key must dominate every concentration stat; NULL keys
    count as a real (hot) key; a uniform key column stays flat."""
    from pyspark_data_drift_detector_spark.operators.parallelism import (
        key_skew_profile,
    )

    rows = [("hot" if i < 90 else f"k{i}", str(i % 10), None if i < 50 else "x")
            for i in range(100)]
    df = spark.createDataFrame(rows, "skewed string, uniform string, nullkey string")
    out = {r["column_name"]: r for r in
           key_skew_profile(df, ["skewed", "uniform", "nullkey"], top_k=2).collect()}

    s = out["skewed"]
    assert s["n_rows"] == 100 and s["n_keys"] == 11
    assert s["max_count"] == 90 and s["max_share"] == pytest.approx(0.9)
    assert s["hhi"] == pytest.approx((90 / 100) ** 2 + 10 * (1 / 100) ** 2)
    assert s["effective_keys"] == pytest.approx(1 / s["hhi"])
    assert s["skew_factor"] == pytest.approx(90 / (100 / 11))

    u = out["uniform"]
    assert u["n_keys"] == 10 and u["max_share"] == pytest.approx(0.1)
    assert u["skew_factor"] == pytest.approx(1.0)

    n = out["nullkey"]  # NULL is a 50-row hot key
    assert n["n_keys"] == 2 and n["max_count"] == 50


def test_heavy_hitters_merge_property(spark, sf_dir):
    """Window-merged sketches equal a direct sketch of the window's rows
    in the exact regime (budget > distinct), and under a tight budget the
    true hot key survives with its count never under-estimated."""
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        merged_heavy_hitters,
        partitioned_heavy_hitters,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_orderstatus", "o_orderpriority"]
    parts = partitioned_heavy_hitters(orders, cols, "pmod(o_orderkey, 4)")
    window = merged_heavy_hitters(
        parts.where(F.col("partition_id").isin(["0", "1"])), k=10
    )
    got = {(r["column_name"], r["item"]): r["count_estimate"] for r in window.collect()}
    exact = {
        (c, r["v"]): r["cnt"]
        for c in cols
        for r in orders.filter(F.expr("pmod(o_orderkey, 4)") <= 1)
        .selectExpr(f"CAST({c} AS STRING) AS v")
        .where("v IS NOT NULL")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == exact  # no purge -> merged counts exact

    # tight budget on a skewed synthetic: hot key present, not undercounted
    rows = [("hot",)] * 500 + [(f"k{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string")
    hh = merged_heavy_hitters(
        partitioned_heavy_hitters(df, ["v"], "length(v) % 2", max_items_tracked=8),
        k=3,
        max_items_tracked=8,
    ).collect()
    top = {r["item"]: r["count_estimate"] for r in hh}
    assert "hot" in top and top["hot"] >= 500


def test_bigram_logprob_sequence_sensitivity(spark):
    """Scrambled word order must score worse than fluent text even when
    unigram stats are identical — the signal bigrams exist for."""
    from pyspark_data_drift_detector_spark.operators.corpus import bigram_logprob

    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(20)] + [(100, "mat the on cat sat the")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert out[0]["n_bigrams"] == 5
    assert out[100]["avg_logprob"] < out[0]["avg_logprob"]
    assert out[100]["perplexity"] > out[0]["perplexity"]
    # single-token docs emit no row
    one = spark.createDataFrame([(1, "solo"), (2, "a b")], "doc_id long, text string")
    assert {r["doc_id"] for r in bigram_logprob(one).collect()} == {2}


def test_constraint_checks_each_rule(spark):
    """Each constraint type passes and fails on constructed data, with
    correct violation counts; FK orphans are counted exactly."""
    from pyspark_data_drift_detector_spark.operators.constraints import (
        check_constraints,
        check_referential_integrity,
    )

    df = spark.createDataFrame(
        [
            (1, "A", 10.0),
            (2, "B", -5.0),      # range violation
            (2, "Z", 20.0),      # duplicate id + domain violation
            (4, None, 30.0),     # null cat
        ],
        "id long, cat string, v double",
    )
    out = {r["constraint"]: r for r in check_constraints(
        df,
        [
            {"type": "completeness", "column": "cat", "min_ratio": 0.9},
            {"type": "unique", "column": "id"},
            {"type": "in_set", "column": "cat", "values": ["A", "B"]},
            {"type": "range", "column": "v", "min": 0.0, "max": 25.0},
            {"type": "min_rows", "count": 3},
        ],
    ).collect()}
    assert not out["completeness"]["passed"]  # 3/4 = 0.75 < 0.9
    assert out["completeness"]["violations"] == 1
    assert not out["unique"]["passed"] and out["unique"]["violations"] == 1
    assert not out["in_set"]["passed"] and out["in_set"]["violations"] == 1
    assert not out["range"]["passed"] and out["range"]["violations"] == 2
    assert out["min_rows"]["passed"] and out["min_rows"]["metric"] == 4.0

    parent = spark.createDataFrame([(1,), (2,)], "k long")
    child = spark.createDataFrame([(1,), (1,), (3,), (None,)], "k long")
    fk = check_referential_integrity(child, parent, "k", "k").collect()[0]
    assert fk["violations"] == 1 and not fk["passed"]  # only the 3; NULL exempt

    ok = check_referential_integrity(
        child.where("k = 1"), parent, "k", "k"
    ).collect()[0]
    assert ok["passed"] and ok["violations"] == 0

    with pytest.raises(ValueError, match="unknown constraint"):
        check_constraints(df, [{"type": "nope"}])


def test_round6_operators_degenerate_inputs(spark):
    """All-NULL columns, empty benchmarks, and empty frames must degrade
    gracefully (no crashes, sensible empty/zero outputs)."""
    from pyspark_data_drift_detector_spark.operators.distribution import (
        equidepth_histogram,
    )
    from pyspark_data_drift_detector_spark.operators.parallelism import (
        key_skew_profile,
    )
    from pyspark_data_drift_detector_spark.operators.profile import robust_profile
    from pyspark_data_drift_detector_spark.operators.quality import ngram_overlap

    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, v double"
    )
    assert equidepth_histogram(nulls, ["v"], bins=4).count() == 0
    rp = robust_profile(nulls, ["v"]).collect()
    assert len(rp) == 1 and rp[0]["n"] == 0 and rp[0]["median"] is None

    empty = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    out = ngram_overlap(docs, empty, n=2).collect()
    assert len(out) == 1 and out[0]["n_matched"] == 0 and not out[0]["contaminated"]

    ks = key_skew_profile(empty.selectExpr("CAST(doc_id AS STRING) AS k"), ["k"])
    assert ks.count() == 0


def test_quantile_mode_knob_parity(spark, sf_dir):
    """The 100TB scale path must agree with the oracle path: counts-mode
    (value-histogram) rank statistics equal exact-mode values EXACTLY for
    both robust_profile (bounds and MAD) and equidepth_histogram edges;
    kll mode lands inside the sketch's rank-error band."""
    from pyspark_data_drift_detector_spark.operators.distribution import (
        equidepth_histogram,
    )
    from pyspark_data_drift_detector_spark.operators.profile import robust_profile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice"]

    def rp_key(rows):
        return {
            r["column_name"]: (
                r["n"], r["lo"], r["median"], r["hi"], r["mad"],
                r["trimmed_mean"], r["winsorized_mean"], r["n_trimmed"],
            )
            for r in rows
        }

    exact = rp_key(robust_profile(li, cols).collect())
    counts = rp_key(robust_profile(li, cols, quantile_mode="counts").collect())
    assert exact == counts
    for k in (200, 800):  # the kll_k accuracy knob must thread through
        kll = {
            r["column_name"]: r
            for r in robust_profile(
                li, cols, quantile_mode="kll", kll_k=k
            ).collect()
        }
        for c in cols:
            # KLL returns stream values at bounded rank error — a loose
            # value band (5% of the column's exact spread) catches
            # estimator breaks at either k
            spread = exact[c][3] - exact[c][1]
            assert abs(kll[c]["median"] - exact[c][2]) <= 0.05 * spread + 1e-9, (c, k)

    def eh_key(rows):
        # ROUND(x, 5) is the driver-oracle contract; the two engines'
        # interpolation orders differ by 1 ulp on some edges
        return {
            (r["column_name"], r["bin"]): (round(r["lo"], 5), round(r["hi"], 5), r["cnt"])
            for r in rows
        }

    eh_exact = eh_key(equidepth_histogram(li, cols, bins=8).collect())
    eh_counts = eh_key(
        equidepth_histogram(li, cols, bins=8, quantile_mode="counts").collect()
    )
    assert eh_exact == eh_counts
    # kll edges: every bin still present-ish and counts sum to n, at
    # both the default and a tightened sketch size
    n = li.where(F.col("l_quantity").isNotNull()).count()
    for k in (400, 800):
        eh_kll = equidepth_histogram(
            li, cols, bins=8, quantile_mode="kll", kll_k=k
        ).collect()
        got = sum(r["cnt"] for r in eh_kll if r["column_name"] == "l_quantity")
        assert got == n, k

    with pytest.raises(ValueError, match="quantile_mode"):
        robust_profile(li, cols, quantile_mode="nope")


def test_counts_mode_materialize_releases_caches(spark, sf_dir):
    """ADVICE r8: counts-mode robust_profile / equidepth_histogram
    persisted their value-histogram cells but never unpersisted them —
    the cache leaked into long-lived sessions. With the default
    ``materialize=True`` the result is checkpointed eagerly and every
    intermediate cache is released; ``materialize=False`` (plan
    inspection) leaves lifetime to the caller and must agree on values."""
    from pyspark_data_drift_detector_spark.operators.distribution import (
        equidepth_histogram,
    )
    from pyspark_data_drift_detector_spark.operators.profile import robust_profile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity"]
    def lingering(before):
        # fresh snapshot each call — getPersistentRDDs() is not a live
        # view. The localCheckpoint RDD itself legitimately stays
        # registered (it IS the result's data, released when the result
        # is GC'd) — only non-checkpoint caches count as leaks.
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return [
            rid
            for rid in set(jmap.keySet().toArray()) - before
            if "localCheckpoint" not in jmap.get(rid).rdd().toDebugString()
        ]

    before = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    mat = robust_profile(li, cols, quantile_mode="counts").collect()
    assert not lingering(before), "robust_profile leaked a cache"
    eh = equidepth_histogram(li, cols, bins=4, quantile_mode="counts").collect()
    assert not lingering(before), "equidepth leaked a cache"

    lazy = robust_profile(
        li, cols, quantile_mode="counts", materialize=False
    ).collect()
    assert {tuple(r) for r in lazy} == {tuple(r) for r in mat}
    eh_lazy = equidepth_histogram(
        li, cols, bins=4, quantile_mode="counts", materialize=False
    ).collect()
    assert {tuple(r) for r in eh_lazy} == {tuple(r) for r in eh}
    # release only the caches the lazy calls created — other fixtures'
    # caches in this shared session must survive
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in set(jmap.keySet().toArray()) - before:
        jmap.get(rid).unpersist()


def test_merged_group_drift_window_matches_direct(spark, sf_dir):
    """Group-sliced state merged over a window equals profiling that
    window's group slices directly, and identical windows score zero."""
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        merge_profiles,
        merged_group_drift,
        partitioned_group_profile,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parts = partitioned_group_profile(
        li, ["l_quantity"], "pmod(l_orderkey, 4)", "l_returnflag"
    )
    window = {
        (r["group_value"], r["column_name"]): r
        for r in merge_profiles(
            parts.where(F.col("partition_id").isin(["0", "1"])),
            keys=("group_value", "column_name"),
        ).collect()
    }
    direct = {
        (r["group_value"], r["column_name"]): r
        for r in merge_profiles(
            partitioned_group_profile(
                li.filter(F.expr("pmod(l_orderkey, 4)") <= 1),
                ["l_quantity"],
                F.lit("all"),
                "l_returnflag",
            ),
            keys=("group_value", "column_name"),
        ).collect()
    }
    assert set(window) == set(direct) and len(window) >= 3
    for k in window:
        assert window[k]["n"] == direct[k]["n"], k
        assert window[k]["mean"] == pytest.approx(direct[k]["mean"], rel=1e-12), k

    same = merged_group_drift(parts, ["0", "1"], ["0", "1"]).collect()
    assert all(r["drift_score"] == 0.0 and not r["drift_detected"] for r in same)


def test_session_drift_detects_engagement_shift(spark):
    """Session-grain drift fires when sessions get shorter/smaller even
    though each event looks normal; identical sides score zero."""
    import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import session_drift

    t0 = datetime.datetime(2024, 1, 1)

    def burst(uid, start_min, n, step_min=10):
        return [
            (uid, t0 + datetime.timedelta(minutes=start_min + i * step_min), 1.0)
            for i in range(n)
        ]

    # ref: 6-event sessions; curr: 2-event sessions (same event values)
    ref_rows = [r for u in range(20) for r in burst(u, 0, 6)]
    curr_rows = [r for u in range(20, 40) for r in burst(u, 0, 2)]
    schema = "user_id long, ts timestamp, value double"
    ref = spark.createDataFrame(ref_rows, schema)
    curr = spark.createDataFrame(curr_rows, schema)
    out = {r["column_name"]: r for r in session_drift(ref, curr).collect()}
    assert out["n_events"]["drift_detected"]
    assert out["duration_sec"]["drift_detected"]
    assert out["n_events"]["curr_mean"] < out["n_events"]["ref_mean"]

    same = session_drift(ref, ref).collect()
    assert all(r["drift_score"] == 0.0 for r in same)


def test_functional_dependencies(spark):
    """FD verdicts with exact group/row counts: a holding FD, a fan-out
    violation, composite determinants, NULL determinant components as
    real keys, NULL dependents ignored."""
    from pyspark_data_drift_detector_spark.operators.constraints import (
        check_constraints,
        check_functional_dependencies,
    )

    df = spark.createDataFrame(
        [
            # g -> y: group A maps to two y values (3 rows), B holds
            ("A", "x", 1, 10),
            ("A", "x", 2, 10),
            ("A", "y", 1, 10),
            ("B", "x", 5, 20),
            ("B", None, 5, 20),   # NULL determinant component: its own key
            ("C", "z", None, 30), # NULL dependent ignored: C never violates
        ],
        "g string, h string, y int, z int",
    )
    out = {
        r["column"]: r
        for r in check_functional_dependencies(
            df, [("g", "y"), (["g", "h"], "y"), ("g", "z")]
        ).collect()
    }
    fd = out["(g) -> y"]
    assert not fd["passed"]
    assert fd["violations"] == 3  # the three A rows with non-null y
    assert fd["metric"] == pytest.approx(1 / 3)  # 1 of 3 groups (A, B, C)
    # composite determinant: (A,x) still maps to {1,2} — violating; the
    # NULL h row is key (B, <null>), distinct from (B, x)
    comp = out["(g, h) -> y"]
    assert not comp["passed"]
    assert comp["violations"] == 2 and comp["metric"] == pytest.approx(1 / 5)
    assert out["(g) -> z"]["passed"] and out["(g) -> z"]["violations"] == 0

    # all-NULL determinant: one sentinel key
    nul = spark.createDataFrame(
        [(None, 1), (None, 2)], "k string, y int"
    )
    r = check_functional_dependencies(nul, [("k", "y")]).collect()[0]
    assert not r["passed"] and r["metric"] == 1.0 and r["violations"] == 2

    with pytest.raises(ValueError, match="no dependencies"):
        check_functional_dependencies(df, [])

    # suite integration: FD rows union into check_constraints output
    suite = {
        r["constraint"]: r
        for r in check_constraints(
            df,
            [
                {"type": "min_rows", "count": 3},
                {
                    "type": "functional_dependency",
                    "determinant": ["g", "h"],
                    "dependent": "y",
                },
            ],
        ).collect()
    }
    assert suite["min_rows"]["passed"]
    assert suite["functional_dependency"]["column"] == "(g, h) -> y"
    assert not suite["functional_dependency"]["passed"]
    # an all-FD suite works without the wide aggregate
    only = check_constraints(
        df,
        [{"type": "functional_dependency", "determinant": "g", "dependent": "z"}],
    ).collect()
    assert len(only) == 1 and only[0]["passed"]


def test_benford_deviation_digits_across_magnitudes(spark):
    """The first digit must be exact at EVERY finite magnitude — the
    round-7 BIGINT path saturated to digit 9 for |x| > ~9.2e13. For a
    single-value column, tvd = 1 - p(digit) identifies the extracted
    digit uniquely."""
    import math

    from pyspark_data_drift_detector_spark.operators.distribution import (
        benford_deviation,
    )

    cases = {
        "c1": (1.23e20, 1),   # the judge's saturation repro
        "c2": (2.5e14, 2),    # ditto
        "c3": (123.0, 1),
        "c4": (0.00012, 1),
        "c5": (9.5e-8, 9),    # below the old 1e-5 floor: now a real digit
        "c6": (-456.0, 4),    # sign ignored
        "c7": (9.2e13, 9),
        # (createDataFrame's Python->JVM path delivers 7e308 as +Inf, so
        # the extreme-magnitude case stops at 1e100 — the extraction
        # itself is representation-based and has no upper bound)
        "c8": (7.0e100, 7),
    }
    schema = ", ".join(f"{c} double" for c in cases)
    df = spark.createDataFrame([tuple(v for v, _ in cases.values())], schema)
    out = {r["column_name"]: r for r in
           benford_deviation(df, list(cases)).collect()}
    for c, (_, digit) in cases.items():
        expected_tvd = 1.0 - math.log10(1.0 + 1.0 / digit)
        assert out[c]["n"] == 1 and out[c]["n_skipped"] == 0
        assert out[c]["tvd"] == pytest.approx(expected_tvd), (
            f"{c}: wrong first digit extracted"
        )


def test_benford_deviation_skips_and_conformance(spark):
    """Zeros/NaN/±Inf are counted in n_skipped (no first digit); NULLs in
    neither; a Benford-conforming column scores far below a uniform-digit
    column on every deviation stat."""
    import math

    from pyspark_data_drift_detector_spark.operators.distribution import (
        benford_deviation,
    )

    rows = [(0.0,), (float("nan"),), (float("inf",),), (None,), (42.0,)]
    df = spark.createDataFrame(rows, "v double")
    r = benford_deviation(df, ["v"]).collect()[0]
    assert r["n"] == 1 and r["n_skipped"] == 3

    # counts proportional to log10(1 + 1/d) vs uniform digit counts
    benford_rows = []
    for d in range(1, 10):
        benford_rows += [(float(d),)] * round(1000 * math.log10(1 + 1 / d))
    uniform_rows = [(float(d),) for d in range(1, 10)] * 100
    good = benford_deviation(
        spark.createDataFrame(benford_rows, "v double"), ["v"]
    ).collect()[0]
    bad = benford_deviation(
        spark.createDataFrame(uniform_rows, "v double"), ["v"]
    ).collect()[0]
    assert good["tvd"] < 0.01 < bad["tvd"]
    assert good["max_dev"] < 0.01 < bad["max_dev"]
    assert good["chi2_stat"] < bad["chi2_stat"]


def test_completeness_timeseries(spark):
    """Per-bucket null accounting: a day with injected NULLs reports its
    exact null count and ratio; clean buckets report zero."""
    from datetime import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        completeness_timeseries,
    )

    d1, d2 = datetime(2024, 3, 1, 5), datetime(2024, 3, 2, 7)
    df = spark.createDataFrame(
        [
            (d1, 1, "a"),
            (d1, None, "b"),
            (d1, None, None),
            (d2, 4, "d"),
        ],
        "ts timestamp, uid int, cat string",
    )
    out = {
        (r["bucket_start"].day, r["column_name"]): r
        for r in completeness_timeseries(df, "ts", ["uid", "cat"]).collect()
    }
    assert out[(1, "uid")]["n_rows"] == 3 and out[(1, "uid")]["n_null"] == 2
    assert out[(1, "uid")]["null_ratio"] == pytest.approx(2 / 3)
    assert out[(1, "cat")]["n_null"] == 1
    assert out[(2, "uid")]["n_null"] == 0 and out[(2, "uid")]["null_ratio"] == 0.0
    assert out[(2, "cat")]["n_rows"] == 1

    with pytest.raises(ValueError, match="unknown date_trunc unit"):
        completeness_timeseries(df, "ts", ["uid"], granularity="fortnight")
    with pytest.raises(ValueError, match="no columns"):
        completeness_timeseries(df, "ts", [])


def test_benford_digit_matches_decimal_ground_truth(spark):
    """The production digit expression equals the exact decimal
    expansion's first significant digit (Decimal ground truth) on a
    seeded sweep of random mantissas across 10^±200 — the regression
    test for the repr-based extraction."""
    from decimal import Decimal

    import numpy as np

    from pyspark_data_drift_detector_spark.operators.distribution import (
        FIRST_DIGIT_SQL,
    )

    rng = np.random.default_rng(7)
    vals = (
        rng.uniform(1.0, 10.0, 400) * 10.0 ** rng.integers(-200, 201, 400)
    ).tolist()
    vals += [-v for v in vals[:100]]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = {
        r["v"]: r["d"]
        for r in df.selectExpr(
            "v", FIRST_DIGIT_SQL.format(v="abs(v)") + " AS d"
        ).collect()
    }
    for v in vals:
        true = next(ch for ch in str(Decimal(abs(v))) if ch in "123456789")
        assert got[float(v)] == int(true), (v, got[float(v)], true)


def test_constraint_implication_and_composite_unique(spark):
    """Conditional completeness (A -> B present) and composite-key
    uniqueness with exact violation counts; NULL components excluded
    from the composite, matching the single-column convention."""
    from pyspark_data_drift_detector_spark.operators.constraints import (
        check_constraints,
    )

    df = spark.createDataFrame(
        [
            (1, "addr1", "US", "x"),
            (2, "addr2", None, "x"),   # implication violation
            (3, None, None, "y"),      # vacuous: no address
            (1, "addr1", "US", "x"),   # composite (id, tag) duplicate
            (4, None, "DE", None),     # NULL component: excluded from unique
        ],
        "id long, addr string, country string, tag string",
    )
    out = {
        r["constraint"]: r
        for r in check_constraints(
            df,
            [
                {"type": "implication", "if_column": "addr",
                 "then_column": "country"},
                {"type": "unique", "column": ["id", "tag"]},
            ],
        ).collect()
    }
    imp = out["implication"]
    assert imp["column"] == "addr -> country"
    assert imp["violations"] == 1 and not imp["passed"]
    uq = out["unique"]
    assert uq["column"] == "(id, tag)"
    # tuples: (1,x) x2, (2,x), (3,y) -> one duplicate; (4, NULL) excluded
    assert uq["violations"] == 1 and not uq["passed"]

    ok = check_constraints(
        df.dropDuplicates(["id", "tag"]),
        [{"type": "unique", "column": ["id", "tag"]}],
    ).collect()[0]
    assert ok["passed"]


def test_join_explosion_profile(spark):
    """Exact inner-join output accounting without running the join:
    per-key products, amplification, hottest-key share, many-to-many
    detection, NULL keys excluded."""
    from pyspark_data_drift_detector_spark.operators.parallelism import (
        join_explosion_profile,
    )

    left = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("c",), (None,)], "k string"
    )
    right = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("d",), (None,)], "k string"
    )
    r = join_explosion_profile(left, right, ["k"]).collect()[0]
    assert r["left_rows"] == 5 and r["right_rows"] == 4  # NULLs excluded
    assert r["matched_keys"] == 2                         # a, b
    assert r["output_rows"] == 3 * 2 + 1 * 1              # 7
    # ground truth: the actual inner join emits the same count
    assert left.join(right, "k").count() == 7
    assert r["max_key_output"] == 6
    assert r["max_key_share"] == pytest.approx(6 / 7)
    assert r["many_to_many_keys"] == 1                    # only 'a'
    assert r["amplification"] == pytest.approx(7 / 5)

    # disjoint keys: zero output, no crash
    z = join_explosion_profile(
        left, right.where("k = 'd'"), ["k"]
    ).collect()[0]
    assert z["output_rows"] == 0 and z["matched_keys"] == 0

    with pytest.raises(ValueError, match="no key columns"):
        join_explosion_profile(left, right, [])


def test_benford_pair_null_on_digitless_side(spark):
    """Review fix: a side with zero extractable digits (constant 0.0 /
    all-NULL column) reports NULL tvd in the pair panel, and the
    pipeline family must not flag it."""
    from pyspark_data_drift_detector_spark import detect_drift
    from pyspark_data_drift_detector_spark.operators.distribution import (
        benford_deviation_pair,
    )

    ref = spark.createDataFrame(
        [(float(i % 9 + 1) * (1 + i * 1e-7), 0.0) for i in range(60)],
        "v double, dead double",
    )
    pair = {
        r["column_name"]: r
        for r in benford_deviation_pair(ref, ref, ["v", "dead"]).collect()
    }
    assert pair["dead"]["ref_n"] == 0 and pair["dead"]["ref_tvd"] is None
    assert pair["dead"]["curr_tvd"] is None
    assert pair["v"]["ref_tvd"] == pytest.approx(pair["v"]["curr_tvd"])

    # in the pipeline the constant column never even reaches the family
    # (type inference routes constants to categorical) — and the NULL-tvd
    # gating above protects any numeric column that still lands digitless
    ref2 = ref.selectExpr("monotonically_increasing_id() AS id", "v", "dead")
    out = detect_drift(ref2, ref2, {"analyze_benford": True})
    rows = {
        r["column_name"]: r
        for r in out.collect()
        if r["column_type"] == "benford"
    }
    assert "dead" not in rows
    # identical sides: zero shift (score 0) — but the uniform-digit
    # column is genuinely non-conforming, which is its own cause
    assert rows["v"]["drift_score"] == 0.0
    assert rows["v"]["drift_causes"] == ["benford_nonconforming"]


def test_benford_all_null_column_scores_zero(spark):
    """ADVICE r8: ``least()`` SKIPS NULL operands, so an un-guarded
    ``least(1.0, NULL_shift * 5)`` returned 1.0 — an all-NULL numeric
    column (type inference keeps n=0 columns numerical) read as
    'maximally non-Benford on no data' with severity Critical. The score
    must guard the NULL shift BEFORE least() and report 0."""
    from pyspark_data_drift_detector_spark import detect_drift

    ref = spark.createDataFrame(
        [(float(i % 9 + 1) * (1 + i * 1e-7), None) for i in range(60)],
        "v double, all_null double",
    )
    out = detect_drift(ref, ref, {"analyze_benford": True})
    rows = {
        r["column_name"]: r
        for r in out.collect()
        if r["column_type"] == "benford"
    }
    dead = rows["all_null"]
    assert dead["drift_score"] == 0.0
    assert dead["drift_severity"] != "Critical"
    assert dead["drift_detected"] is False
    assert dead["drift_causes"] == []


def test_logprob_incremental_matches_manual_model(spark, tmp_path):
    """Incremental LM scoring: add-k probabilities under the STATE model
    verified against a hand-computed model; OOV counted and smoothed;
    additive state across appends == one-shot state; streaming sink twin
    feeds the same scores."""
    import math

    from pyspark_data_drift_detector_spark.operators.corpus import (
        logprob_incremental,
        unigram_state,
    )

    prior = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # model: a=2, b=2, c=1 ; total=5, V=3
    batch = spark.createDataFrame(
        [(10, "a b z"), (11, "c c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in logprob_incremental(batch, unigram_state(prior), k=0.5).collect()
    }
    denom = 5 + 0.5 * 4
    lp = lambda c: math.log((c + 0.5) / denom)
    exp10 = (lp(2) + lp(2) + lp(0)) / 3
    assert abs(out[10]["avg_logprob"] - exp10) < 1e-12
    assert out[10]["n_oov"] == 1 and out[10]["n_tokens"] == 3
    assert abs(out[10]["oov_rate"] - 1 / 3) < 1e-12
    assert abs(out[10]["perplexity"] - math.exp(-exp10)) < 1e-9
    assert out[11]["n_oov"] == 0
    assert abs(out[11]["avg_logprob"] - lp(1)) < 1e-12

    # additive appends: state written in two pieces equals one-shot
    unigram_state(prior.filter("doc_id = 1")).write.mode("append").parquet(
        str(tmp_path / "lm_state")
    )
    unigram_state(prior.filter("doc_id = 2")).write.mode("append").parquet(
        str(tmp_path / "lm_state")
    )
    appended = spark.read.parquet(str(tmp_path / "lm_state"))
    out2 = {
        r["doc_id"]: r["avg_logprob"]
        for r in logprob_incremental(batch, appended, k=0.5).collect()
    }
    assert out2 == {d: r["avg_logprob"] for d, r in out.items()}

    # streaming sink twin
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        unigram_state_sink,
    )

    ingest = tmp_path / "lm_ingest"
    prior.repartition(2).write.parquet(str(ingest))
    stream = (
        spark.readStream.schema(prior.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ingest))
    )
    q = (
        stream.writeStream.foreachBatch(unigram_state_sink(str(tmp_path / "lm_s2")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(str(tmp_path / "lm_s2"))
    out3 = {
        r["doc_id"]: r["avg_logprob"]
        for r in logprob_incremental(batch, streamed, k=0.5).collect()
    }
    assert out3 == out2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="smoothing k"):
        logprob_incremental(batch, appended, k=0.0)


def test_logprob_incremental_empty_state_fails_fast(spark):
    """Review r9: an empty/missing-path state must raise, not emit NULL
    avg_logprob that a `> cutoff` gate silently admits."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.corpus import (
        logprob_incremental,
    )

    batch = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    empty = spark.createDataFrame([], "token string, cnt long")
    with _pytest.raises(ValueError, match="unigram state is empty"):
        logprob_incremental(batch, empty)


def test_token_share_drift(spark):
    """Token-share mix drift: doc mix stable but one source's docs grew —
    token share drifts; NULL/blank text counts zero; a one-sided group
    reports zero docs/tokens/share on its missing side and its full
    current share as the diff."""
    from pyspark_data_drift_detector_spark.operators.corpus import (
        token_share_drift,
    )

    ref = spark.createDataFrame(
        [(1, "a b c d", "web"), (2, "x y z w", "books"), (3, None, "web")],
        "doc_id long, text string, source string",
    )
    curr = spark.createDataFrame(
        [(10, "a b c d e f g h i j k l", "web"), (11, "x y z w", "books"),
         (12, "m n", "code")],
        "doc_id long, text string, source string",
    )
    out = {r["group_key"]: r for r in token_share_drift(ref, curr, "source").collect()}
    web, books, code = out["web"], out["books"], out["code"]
    assert (web["ref_docs"], web["curr_docs"]) == (2, 1)
    assert (web["ref_tokens"], web["curr_tokens"]) == (4, 12)
    assert abs(web["ref_share"] - 0.5) < 1e-12
    assert abs(web["curr_share"] - 12 / 18) < 1e-12
    assert web["drift_detected"]
    assert abs(books["share_abs_diff"] - (0.5 - 4 / 18)) < 1e-12
    # one-sided group: zero ref share, diff = its full current share
    assert code["ref_share"] == 0.0 and code["ref_docs"] == 0
    assert abs(code["share_abs_diff"] - 2 / 18) < 1e-12
    # identical snapshots → zero drift everywhere
    same = token_share_drift(ref, ref, "source").collect()
    assert all(not r["drift_detected"] and r["share_abs_diff"] == 0.0 for r in same)


def test_corpus_drift_report(spark):
    """The corpus flagship composes text-quality / vocabulary /
    token-share families into one long-format frame; planted drift
    (longer docs + novel vocabulary + source-mix rotation) flags the
    right rows and identical snapshots flag nothing."""
    from pyspark_data_drift_detector_spark.corpus_pipeline import (
        corpus_drift_report,
    )

    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat", "web"),
         (2, "a dog ran in the park", "web"),
         (3, "short text here", "books")],
        "doc_id long, text string, source string",
    )
    curr = spark.createDataFrame(
        [(10, "qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh", "books"),
         (11, "zz xx cc vv bb nn mm ll kk jj", "books")],
        "doc_id long, text string, source string",
    )
    out = corpus_drift_report(ref, curr)
    rows = {(r["family"], r["key"], r["metric"]): r for r in out.collect()}
    assert rows[("text_quality", "", "mean_tokens")]["drift_detected"]
    assert rows[("vocabulary", "", "oov_token_rate")]["diff"] == 1.0
    assert rows[("vocabulary", "", "oov_token_rate")]["drift_detected"]
    assert rows[("token_share", "web", "token_share")]["drift_detected"]
    assert rows[("token_share", "web", "token_share")]["curr_value"] == 0.0
    assert rows[("vocabulary", "", "new_types")]["drift_detected"] is False

    same = corpus_drift_report(ref, ref).collect()
    assert all(not r["drift_detected"] for r in same)
    assert {r["family"] for r in same} == {
        "text_quality", "vocabulary", "token_share",
    }


def test_token_share_incremental(spark, tmp_path):
    """Batch-vs-corpus mix tripwire: a batch matching the state mix is
    quiet; a rotated batch flags; additive appends == one-shot state;
    the streaming sink twin agrees; empty state fails fast."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.corpus import (
        token_share_incremental,
        token_share_state,
    )

    prior = spark.createDataFrame(
        [(1, "a b c d e f", "web"), (2, "g h i j k l", "books")],
        "doc_id long, text string, source string",
    )
    state = token_share_state(prior)

    balanced = spark.createDataFrame(
        [(10, "m n o", "web"), (11, "p q r", "books")],
        "doc_id long, text string, source string",
    )
    quiet = token_share_incremental(balanced, state)
    assert all(not r["drift_detected"] for r in quiet.collect())

    rotated = spark.createDataFrame(
        [(20, "s t u v w x y z aa bb", "web")],
        "doc_id long, text string, source string",
    )
    out = {r["group_key"]: r for r in token_share_incremental(rotated, state).collect()}
    assert out["web"]["drift_detected"] and out["books"]["drift_detected"]
    assert out["web"]["curr_share"] == 1.0
    assert out["books"]["curr_tokens"] == 0

    # additive appends == one-shot
    token_share_state(prior.filter("doc_id = 1")).write.mode("append").parquet(
        str(tmp_path / "mix_state")
    )
    token_share_state(prior.filter("doc_id = 2")).write.mode("append").parquet(
        str(tmp_path / "mix_state")
    )
    appended = spark.read.parquet(str(tmp_path / "mix_state"))
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(token_share_incremental(rotated, appended)) == key(
        token_share_incremental(rotated, state)
    )

    # streaming sink twin
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        token_share_state_sink,
    )

    ingest = tmp_path / "mix_ingest"
    prior.repartition(2).write.parquet(str(ingest))
    stream = (
        spark.readStream.schema(prior.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ingest))
    )
    q = (
        stream.writeStream.foreachBatch(
            token_share_state_sink(str(tmp_path / "mix_s2"))
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(str(tmp_path / "mix_s2"))
    assert key(token_share_incremental(rotated, streamed)) == key(
        token_share_incremental(rotated, state)
    )

    with _pytest.raises(ValueError, match="token-share state is empty"):
        token_share_incremental(
            rotated, spark.createDataFrame([], "group_key string, n_docs long, n_tokens long")
        )


def test_token_share_incremental_null_group_both_sides(spark):
    """A NULL group present in BOTH the state and the batch must land in
    ONE panel row (null-safe join), matching the batch-mode sibling's
    single-groupBy collapse — not two half-rows each flagging drift."""
    from pyspark_data_drift_detector_spark.operators.corpus import (
        token_share_drift,
        token_share_incremental,
        token_share_state,
    )

    prior = spark.createDataFrame(
        [(1, "a b c d e f", "web"), (2, "g h i j k l", None)],
        "doc_id long, text string, source string",
    )
    batch = spark.createDataFrame(
        [(10, "m n o", "web"), (11, "p q r", None)],
        "doc_id long, text string, source string",
    )
    out = token_share_incremental(batch, token_share_state(prior)).collect()
    assert len(out) == 2  # one row per group incl. the single NULL row
    by_key = {r["group_key"]: r for r in out}
    null_row = by_key[None]
    assert null_row["ref_tokens"] == 6 and null_row["curr_tokens"] == 3
    assert not null_row["drift_detected"]
    # parity with the batch-mode sibling on the same populations
    sib = {r["group_key"]: r for r in token_share_drift(prior, batch).collect()}
    assert sib[None]["share_abs_diff"] == null_row["share_abs_diff"]


def test_token_share_zero_total_side(spark):
    """A side with ZERO total tokens (all-blank batch) yields NULL shares
    — never an ANSI divide-by-zero job failure; the diff coalesces to the
    other side's full share."""
    from pyspark_data_drift_detector_spark.operators.corpus import (
        token_share_drift,
        token_share_incremental,
        token_share_state,
    )

    ref = spark.createDataFrame(
        [(1, "a b c", "web")], "doc_id long, text string, source string"
    )
    blank = spark.createDataFrame(
        [(10, "", "web"), (11, None, "books")],
        "doc_id long, text string, source string",
    )
    out = {r["group_key"]: r for r in token_share_drift(ref, blank, "source").collect()}
    assert out["web"]["curr_share"] is None
    assert out["web"]["share_abs_diff"] == 1.0 and out["web"]["drift_detected"]
    inc = {
        r["group_key"]: r
        for r in token_share_incremental(blank, token_share_state(ref)).collect()
    }
    assert inc["web"]["curr_share"] is None
    assert inc["web"]["drift_detected"]


def test_corpus_report_incremental_two_batches(spark, tmp_path):
    """The composed ingest-vetting flagship, run as a real nightly would:
    states built from batch1, report for batch2, states ADVANCED with
    batch2 (fingerprints via a two-trigger foreachBatch stream), report
    for batch3 — a doc duplicating a batch2 doc flags dup_of_state ONLY
    after the state advanced."""
    from pyspark_data_drift_detector_spark.corpus_pipeline import (
        corpus_report_incremental,
    )
    from pyspark_data_drift_detector_spark.operators.corpus import (
        token_share_state,
        unigram_state,
    )
    from pyspark_data_drift_detector_spark.operators.dedup import (
        minhash_signatures,
        passage_state,
    )
    from pyspark_data_drift_detector_spark.operators.text import fingerprint
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        fingerprint_state_sink,
    )

    schema = "doc_id long, text string, source string"
    batch1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "web"),
            (2, "one two three four five six seven", "books"),
            (3, "red orange yellow green blue indigo", "web"),
        ],
        schema,
    )
    batch2 = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta", "web"),  # dup of 1
            (11, "completely fresh unseen text body here", "books"),
            (12, "completely fresh unseen text body here", "books"),  # dup in batch
        ],
        schema,
    )
    batch3 = spark.createDataFrame(
        [(20, "completely fresh unseen text body here", "web")],  # dup of 11
        schema,
    )

    paths = {n: str(tmp_path / n) for n in ("fp", "pas", "mh", "ug", "ts")}

    def states():
        return dict(
            fingerprint_state=spark.read.parquet(paths["fp"]),
            passage_state=spark.read.parquet(paths["pas"]),
            minhash_state=spark.read.parquet(paths["mh"]),
            unigram_state=spark.read.parquet(paths["ug"]),
            token_share_state=spark.read.parquet(paths["ts"]),
        )

    kw = dict(window=3, est_threshold=0.2, hash_family="md5")

    def append_states(df):
        fingerprint(df).write.mode("append").parquet(paths["fp"])
        passage_state(df, window=3).write.mode("append").parquet(paths["pas"])
        minhash_signatures(df, hash_family="md5").write.mode("append").parquet(paths["mh"])
        unigram_state(df).write.mode("append").parquet(paths["ug"])
        token_share_state(df).write.mode("append").parquet(paths["ts"])

    append_states(batch1)
    rep_a = {
        (r["family"], r["key"], r["metric"]): r
        for r in corpus_report_incremental(batch2, **states(), **kw).collect()
    }
    # report values are 5-dp-rounded by design (comparison artifact)
    assert rep_a[("exact_dedup", "", "dup_of_state_rate")]["curr_value"] == 0.33333
    assert rep_a[("exact_dedup", "", "dup_in_batch_rate")]["curr_value"] == 0.33333
    assert rep_a[("exact_dedup", "", "keep_rate")]["curr_value"] == 0.33333
    assert {k[0] for k in rep_a} == {
        "exact_dedup", "passage", "neardup", "lm_quality", "token_share",
    }
    # batch2 is 2/3 books by docs — the books token share jumps vs state
    assert rep_a[("token_share", "books", "token_share")]["drift_detected"]

    # advance the fingerprint state through the STREAMING sink, one file
    # per trigger (two micro-batches), as the nightly pipeline would
    ingest = tmp_path / "ingest"
    batch2.filter("doc_id < 12").coalesce(1).write.parquet(str(ingest / "a"))
    batch2.filter("doc_id = 12").coalesce(1).write.parquet(str(ingest / "b"))
    stream = (
        spark.readStream.schema(batch2.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ingest / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(fingerprint_state_sink(paths["fp"]))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the other four states advance by batch append (same additive tables)
    passage_state(batch2, window=3).write.mode("append").parquet(paths["pas"])
    minhash_signatures(batch2, hash_family="md5").write.mode("append").parquet(paths["mh"])
    unigram_state(batch2).write.mode("append").parquet(paths["ug"])
    token_share_state(batch2).write.mode("append").parquet(paths["ts"])

    rep_b = {
        (r["family"], r["key"], r["metric"]): r
        for r in corpus_report_incremental(batch3, **states(), **kw).collect()
    }
    # doc 20 duplicates doc 11 — known ONLY because the state advanced
    assert rep_b[("exact_dedup", "", "dup_of_state_rate")]["curr_value"] == 1.0
    assert rep_b[("exact_dedup", "", "dup_of_state_rate")]["drift_detected"]
    assert rep_b[("exact_dedup", "", "keep_rate")]["curr_value"] == 0.0
    assert rep_b[("passage", "", "dup_passage_doc_rate")]["curr_value"] == 1.0
    assert rep_b[("neardup", "", "neardup_doc_rate")]["curr_value"] == 1.0
    # every batch3 token is in-vocab after the state advance
    assert rep_b[("lm_quality", "", "oov_token_rate")]["curr_value"] == 0.0


def test_ingest_vetting_sink(spark, tmp_path):
    """The nightly automation as one foreachBatch sink: batch 0
    bootstraps (states seeded, no report — nothing to vet against);
    batch 1, arriving through a SECOND availableNow run sharing the
    checkpoint, is vetted against batch 0's states BEFORE advancing
    them; a direct third call sees the advanced state."""
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        ingest_vetting_sink,
    )

    schema = "doc_id long, text string, source string"
    batch1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "web"),
            (2, "one two three four five six seven", "books"),
        ],
        schema,
    )
    batch2 = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta", "web"),  # dup of 1
            (11, "completely fresh unseen text body here", "books"),
        ],
        schema,
    )
    p = {n: str(tmp_path / n) for n in ("fp", "pas", "mh", "ug", "ts", "rep")}
    sink = ingest_vetting_sink(
        p["fp"], p["pas"], p["mh"], p["ug"], p["ts"], p["rep"],
        window=3, est_threshold=0.2, hash_family="md5",
    )

    ingest = tmp_path / "ingest"
    ckpt = str(tmp_path / "ckpt")
    batch1.coalesce(1).write.parquet(str(ingest / "a"))

    def run_stream():
        q = (
            spark.readStream.schema(batch1.schema)
            .parquet(str(ingest / "*"))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()  # bootstrap: states seeded, NO report
    assert spark.read.parquet(p["ug"]).count() > 0
    import os

    assert not os.path.exists(p["rep"])

    batch2.coalesce(1).write.parquet(str(ingest / "b"))
    run_stream()  # second run, same checkpoint: only file b is new
    rep = spark.read.parquet(p["rep"])
    rows = {
        (r["family"], r["key"], r["metric"]): r
        for r in rep.collect()
    }
    assert rep.select("batch_id").distinct().count() == 1
    # doc 10 duplicates state doc 1 — vetted BEFORE the state advanced
    # (were states advanced first, every doc would flag itself: rate 1.0)
    assert rows[("exact_dedup", "", "dup_of_state_rate")]["curr_value"] == 0.5
    assert {k[0] for k in rows} == {
        "exact_dedup", "passage", "neardup", "lm_quality", "token_share",
    }

    # direct call: the state now includes batch2, so a copy of doc 11 flags
    batch3 = spark.createDataFrame(
        [(20, "completely fresh unseen text body here", "web")], schema
    )
    sink(batch3, 99)
    rep2 = spark.read.parquet(p["rep"]).filter("batch_id = 99").collect()
    by_key = {(r["family"], r["metric"]): r for r in rep2}
    assert by_key[("exact_dedup", "dup_of_state_rate")]["curr_value"] == 1.0


def test_compact_state(spark, tmp_path):
    """State compaction is lossless: the incremental verdicts are
    IDENTICAL against the raw multi-append state and its compacted form,
    while the stored row count collapses; both in-place swap and
    target_path modes work; unknown kinds fail fast."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.corpus import (
        token_share_incremental,
        token_share_state,
        unigram_state,
    )
    from pyspark_data_drift_detector_spark.operators.dedup import (
        dedup_incremental,
        passage_state,
    )
    from pyspark_data_drift_detector_spark.operators.text import fingerprint
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        compact_state,
    )

    schema = "doc_id long, text string, source string"
    prior = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "web"),
            (2, "alpha beta gamma delta", "web"),  # same fp as 1
            (3, "one two three four five", "books"),
        ],
        schema,
    )
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta", "web"), (11, "novel text here", "books")],
        schema,
    )
    p = {n: str(tmp_path / n) for n in ("fp", "pas", "ts")}
    # three appends each → duplicate raw rows
    for f in ("doc_id = 1", "doc_id = 2", "doc_id = 3"):
        part = prior.filter(f)
        fingerprint(part).write.mode("append").parquet(p["fp"])
        passage_state(part, window=3).write.mode("append").parquet(p["pas"])
        token_share_state(part).write.mode("append").parquet(p["ts"])

    key = lambda df: sorted(
        tuple(-1 if v is None else v for v in r) for r in df.collect()
    )
    before_ded = key(dedup_incremental(batch, spark.read.parquet(p["fp"])))
    before_ts = key(
        token_share_incremental(batch, spark.read.parquet(p["ts"]))
    )

    r = compact_state(spark, p["fp"], "fingerprint")
    assert r["rows_before"] == 3 and r["rows_after"] == 2  # docs 1+2 collide
    r = compact_state(spark, p["ts"], "token_share")
    assert r["rows_before"] == 3 and r["rows_after"] == 2  # one row per source
    compact_state(spark, p["pas"], "passage")

    assert key(dedup_incremental(batch, spark.read.parquet(p["fp"]))) == before_ded
    assert (
        key(token_share_incremental(batch, spark.read.parquet(p["ts"])))
        == before_ts
    )

    # target_path mode (object-store pattern) for an additive kind
    ug = str(tmp_path / "ug")
    unigram_state(prior.filter("doc_id = 1")).write.mode("append").parquet(ug)
    unigram_state(prior.filter("doc_id = 2")).write.mode("append").parquet(ug)
    out = str(tmp_path / "ug_compact")
    r = compact_state(spark, ug, "unigram", target_path=out)
    assert r["rows_after"] == 4  # alpha beta gamma delta, counts summed
    got = {x["token"]: x["cnt"] for x in spark.read.parquet(out).collect()}
    assert got == {"alpha": 2, "beta": 2, "gamma": 2, "delta": 2}

    with _pytest.raises(ValueError, match="unknown state kind"):
        compact_state(spark, ug, "minhash")


def test_clean_corpus_funnel(spark):
    """Annotate-once cleaning: first-failing-stage attribution across all
    five gates, dedup survivors chosen among quality survivors, optional
    members (no classifier / no benchmark) degrade gracefully."""
    from pyspark_data_drift_detector_spark.corpus_pipeline import (
        clean_corpus,
        corpus_funnel,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs", "a"),
        (2, "the quick brown fox jumps over the lazy dog and runs  ", "a"),
        (3, "", "a"),
        (4, None, "a"),
        (5, "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx", "a"),
        (6, "this document is perfectly fine and long enough to pass the gate", "a"),
        (7, "eval question text appears here in the benchmark set exactly", "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = docs.filter("doc_id = 7")
    ann = clean_corpus(docs, benchmark=bench, decontaminate_n=4)
    got = {r["doc_id"]: r["drop_stage"] for r in ann.collect()}
    assert got == {
        1: None,            # kept; its trailing-space twin is the duplicate
        2: "duplicate",     # normalized dedup, min-id survivor wins
        3: "empty",
        4: "empty",
        5: "quality",       # one 38-char word: avg_word_len gate
        6: None,
        7: "contaminated",  # benchmark member flags itself
    }
    # original columns survive annotation
    assert set(ann.columns) == {"doc_id", "text", "source", "drop_stage"}
    funnel = {r["stage"]: r["n_docs"] for r in corpus_funnel(ann).collect()}
    assert funnel == {
        "kept": 2, "duplicate": 1, "empty": 2, "quality": 1, "contaminated": 1,
    }

    # a learned classifier gate slots between quality and dedup: weights
    # that veto one specific kept doc (bucket-targeted negative weights)
    from pyspark_data_drift_detector_spark.operators.quality import (
        fit_quality_classifier,
    )

    labeled = docs.filter("doc_id IN (1, 6)").selectExpr(
        "doc_id", "text", "CAST(doc_id = 1 AS INT) AS y"
    )
    w, b = fit_quality_classifier(labeled, "y", weights_dim=32, iters=8, lr=2.0)
    ann2 = clean_corpus(
        docs, benchmark=bench, weights=w, bias=b, decontaminate_n=4
    )
    got2 = {r["doc_id"]: r["drop_stage"] for r in ann2.collect()}
    assert got2[6] == "classifier" and got2[1] is None

    # no benchmark, no classifier: only the structural gates fire
    ann3 = clean_corpus(docs)
    got3 = {r["doc_id"]: r["drop_stage"] for r in ann3.collect()}
    assert got3[7] is None and got3[2] == "duplicate"


def test_compact_state_wrong_kind_and_group_funnel(spark, tmp_path):
    """compact_state fails fast with a clear message on a kind/path
    mismatch; corpus_funnel(group_col=) attributes loss per group."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.corpus_pipeline import (
        clean_corpus,
        corpus_funnel,
    )
    from pyspark_data_drift_detector_spark.operators.corpus import unigram_state
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        compact_state,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "web"),
            (2, "alpha beta gamma delta", "web"),
            (3, "one two three four five", "books"),
            (4, None, "books"),
        ],
        "doc_id long, text string, source string",
    )
    ug = str(tmp_path / "ug")
    unigram_state(docs).write.parquet(ug)
    with _pytest.raises(ValueError, match="does not look like a 'passage'"):
        compact_state(spark, ug, "passage")

    # relax the stopword/length gates: these tiny texts have no English
    # stopwords and the test targets the funnel shape, not the gate
    ann = clean_corpus(
        docs, quality_kwargs=dict(min_tokens=1, min_stopword_ratio=0.0)
    )
    funnel = {
        (r["stage"], r["source"]): r["n_docs"]
        for r in corpus_funnel(ann, "source").collect()
    }
    assert funnel == {
        ("kept", "web"): 1,
        ("duplicate", "web"): 1,
        ("kept", "books"): 1,
        ("empty", "books"): 1,
    }


def test_k_anonymity_profile(spark):
    """Hand-checked class-size histogram + at-risk summary; NULL QI
    values form their own disclosure class; validation fails fast."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.constraints import (
        k_anonymity_profile,
    )

    rows = (
        [(i, 30, "NY") for i in range(8)]        # class of 8
        + [(100, 40, "LA"), (101, 40, "LA"), (102, 40, "LA")]  # class of 3
        + [(200, 50, "SF")]                      # singleton
        + [(300, None, "SF")]                    # NULL age: its own class
    )
    df = spark.createDataFrame(rows, "id long, age int, city string")
    out = k_anonymity_profile(df, ["age", "city"], k=5).collect()
    buckets = {
        r["class_size_lo"]: r for r in out if r["class_size_lo"] is not None
    }
    assert buckets[1]["n_classes"] == 2 and buckets[1]["n_rows"] == 2
    assert buckets[2]["n_classes"] == 1 and buckets[2]["n_rows"] == 3
    assert buckets[2]["class_size_hi"] == 3
    assert buckets[8]["n_rows"] == 8
    assert buckets[8]["row_share"] == pytest.approx(8 / 13)
    risk = [r for r in out if r["class_size_lo"] is None][0]
    assert risk["class_size_hi"] == 4  # k - 1
    assert risk["n_classes"] == 3 and risk["n_rows"] == 5
    assert risk["row_share"] == pytest.approx(5 / 13)

    with _pytest.raises(ValueError, match="non-empty"):
        k_anonymity_profile(df, [])
    with _pytest.raises(ValueError, match="k must be"):
        k_anonymity_profile(df, ["age"], k=1)


def test_l_diversity_profile(spark):
    """Homogeneity risk: classes bucketed by distinct sensitive values;
    a k-anonymous but single-diagnosis class lands below l; NULL
    sensitive counts as one value."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.constraints import (
        l_diversity_profile,
    )

    rows = (
        [(i, "10001", "flu") for i in range(6)]          # 6 rows, 1 value
        + [(10, "10002", "flu"), (11, "10002", "cold"),
           (12, "10002", "covid")]                        # 3 values
        + [(20, "10003", None), (21, "10003", "flu")]     # NULL + flu = 2
    )
    df = spark.createDataFrame(rows, "id long, zip string, diagnosis string")
    out = l_diversity_profile(df, ["zip"], "diagnosis", l=2).collect()
    by_d = {r["diversity"]: r for r in out if r["diversity"] is not None}
    assert by_d[1]["n_classes"] == 1 and by_d[1]["n_rows"] == 6
    assert by_d[3]["n_classes"] == 1 and by_d[3]["n_rows"] == 3
    assert by_d[2]["n_classes"] == 1 and by_d[2]["n_rows"] == 2
    risk = [r for r in out if r["diversity"] is None][0]
    # only the homogeneous zip is at risk: 6 of 11 rows
    assert risk["n_classes"] == 1 and risk["n_rows"] == 6
    assert risk["row_share"] == pytest.approx(6 / 11)

    with _pytest.raises(ValueError, match="l must be"):
        l_diversity_profile(df, ["zip"], "diagnosis", l=1)


def test_t_closeness_profile(spark):
    """Hand-checked per-class TVD buckets + at-risk summary: NULL QI and
    NULL sensitive values form real classes/values (the eqNullSafe panel
    rule); exact integer bucketing; validation fails fast."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.constraints import (
        t_closeness_profile,
    )

    # global: x:3, NULL:2, y:1 (G=6)
    rows = [(None, "x"), (None, "x"), (None, None),
            (1, "x"), (1, None), (2, "y")]
    df = spark.createDataFrame(rows, "q int, s string")
    out = t_closeness_profile(df, ["q"], "s", t=0.25, n_buckets=4).collect()
    by_lo = {r["tvd_lo"]: r for r in out}
    # q=NULL {x:2/3, NULL:1/3} and q=1 {x:1/2, NULL:1/2} both have
    # tvd = 1/6 -> bucket [0, 0.25); q=2 {y:1} has tvd = 5/6 -> [0.75, 1)
    assert by_lo[0.0]["n_classes"] == 2 and by_lo[0.0]["n_rows"] == 5
    assert by_lo[0.75]["n_classes"] == 1 and by_lo[0.75]["n_rows"] == 1
    assert by_lo[0.75]["row_share"] == pytest.approx(1 / 6)
    risk = by_lo[None]
    assert risk["tvd_hi"] == pytest.approx(0.25)
    assert risk["n_classes"] == 1 and risk["n_rows"] == 1

    # homogeneous table: every class matches the global distribution
    uni = spark.createDataFrame(
        [(i % 3, "a") for i in range(9)], "q int, s string"
    )
    uout = t_closeness_profile(uni, ["q"], "s", t=0.25, n_buckets=4).collect()
    ubl = {r["tvd_lo"]: r for r in uout}
    assert ubl[0.0]["n_classes"] == 3 and ubl[None]["n_classes"] == 0

    with _pytest.raises(ValueError, match="non-empty"):
        t_closeness_profile(df, [], "s")
    with _pytest.raises(ValueError, match="multiple of"):
        t_closeness_profile(df, ["q"], "s", t=0.13, n_buckets=4)
    with _pytest.raises(ValueError, match="t must be in"):
        t_closeness_profile(df, ["q"], "s", t=0.0)


def test_fit_bpe_canonical_merges(spark):
    """The Sennrich walk-through: merges come out in count-desc /
    left-asc / right-asc order and merge application is the canonical
    greedy sweep (self-pair runs fuse left-to-right, fused symbols
    never re-merge within a sweep)."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.corpus import fit_bpe

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                    + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = [tuple(r) for r in fit_bpe(df, n_merges=5).collect()]
    assert out == [
        (1, "e", "s", "es", 9),   # ties (e,s)/(s,t) at 9 -> left asc
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),   # ties (l,o)/(o,w) at 7 -> left asc
        (4, "lo", "w", "low", 7),
        (5, "e", "w", "ew", 6),
    ]

    # self-pair run: 'aaaa' x3 -> (a,a) fuses greedily into aa aa,
    # then (aa,aa) is the next-best pair
    runs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    rout = [tuple(r) for r in fit_bpe(runs, n_merges=2).collect()]
    assert rout == [(1, "a", "a", "aa", 9), (2, "aa", "aa", "aaaa", 3)]

    # early stop: all pairs below min_pair_count
    tiny = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    assert fit_bpe(tiny, n_merges=4, min_pair_count=2).count() == 0
    assert fit_bpe(tiny, n_merges=1, min_pair_count=1).count() == 1

    with _pytest.raises(ValueError, match="n_merges"):
        fit_bpe(df, n_merges=0)
    with _pytest.raises(ValueError, match="min_pair_count"):
        fit_bpe(df, min_pair_count=0)
    with _pytest.raises(ValueError, match="fit_mode"):
        fit_bpe(df, fit_mode="mapreduce")


def test_fit_bpe_driver_mode_matches_dataframe(spark, sf_dir):
    """fit_mode='driver' (the heap trainer over the collected word
    table) must be merge-for-merge IDENTICAL to the DataFrame oracle
    path — same counts, same tie-breaks, same early stop — on the real
    documents corpus and on the hand-checked Sennrich fixture."""
    from pyspark_data_drift_detector_spark.operators.corpus import fit_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = [tuple(r) for r in fit_bpe(docs, n_merges=12).collect()]
    got = [
        tuple(r) for r in fit_bpe(docs, n_merges=12, fit_mode="driver").collect()
    ]
    assert got == want and len(got) == 12

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                    + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assert (
        [tuple(r) for r in fit_bpe(df, n_merges=5, fit_mode="driver").collect()]
        == [tuple(r) for r in fit_bpe(df, n_merges=5).collect()]
    )
    # early stop applies in driver mode too
    tiny = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    assert fit_bpe(tiny, n_merges=4, min_pair_count=2,
                   fit_mode="driver").count() == 0

    # a vocabulary exceeding max_vocab_rows warns (the dropped tail can
    # shift pair counts, so the exact-replay claim no longer holds);
    # a vocabulary exactly AT the cap stays silent
    import warnings as _warnings

    import pytest as _pytest

    caps = spark.createDataFrame(
        [(1, "aa bb cc dd")], "doc_id long, text string"
    )
    with _pytest.warns(UserWarning, match="max_vocab_rows"):
        fit_bpe(caps, n_merges=1, min_pair_count=1, fit_mode="driver",
                max_vocab_rows=3)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        fit_bpe(caps, n_merges=1, min_pair_count=1, fit_mode="driver",
                max_vocab_rows=4).collect()


def test_fit_bpe_driver_mode_thousand_merges_no_spark_jobs(spark):
    """The r11 verdict's scale criterion: >=1,000 merges WITHOUT
    per-merge Spark jobs. The heap trainer is a pure function — 1,000
    merges over a 1,100-symbol chain run with no SparkSession at all —
    and the Spark-facing fit_mode='driver' wrapper issues only the
    word-count collect (job count pinned via a job group), not one job
    per merge."""
    from pyspark_data_drift_detector_spark.operators.corpus import (
        _bpe_train_driver,
        fit_bpe,
    )

    # 1,100 distinct symbols, every adjacent pair count 5: each merge
    # fuses the lexicographically-smallest pair and re-creates exactly
    # one new pair, so the chain supports 1,099 merges
    chain = [chr(0x4E00 + i) for i in range(1100)]
    merges = _bpe_train_driver([(chain, 5)], 1000, 2)
    assert len(merges) == 1000
    assert all(c == 5 for _, _, _, _, c in merges)
    # every merge fuses the current lexicographic minimum: rank 1 is
    # the first two chain symbols fused
    assert merges[0][:3] == (1, chain[0], chain[1])
    # replaying the merge table greedily on the chain must telescope:
    # rank k's merged symbol is the chain prefix of length k+1
    assert merges[999][3] == "".join(chain[:1001])

    sc = spark.sparkContext
    sc.setJobGroup("fit_bpe_driver_probe", "job-count pin")
    try:
        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog " * 3)],
            "doc_id long, text string",
        )
        out = fit_bpe(df, n_merges=40, min_pair_count=1, fit_mode="driver")
        n = out.count()
        jobs = sc.statusTracker().getJobIdsForGroup("fit_bpe_driver_probe")
    finally:
        sc.setJobGroup("", "")
    # the pangram exhausts at 24 merges (32 chars across 8 distinct
    # words): training runs to exhaustion, not to the n_merges cap
    assert n == 24
    # word-count collect + result count: a handful of jobs, NOT one per
    # merge (the DataFrame path would issue >= 24 here)
    assert len(jobs) < 10, jobs


def test_bpe_segment_counts(spark):
    """Segmentation with an explicit merge list: per-doc char/BPE-token
    counts and compression; merges apply in rank order (later merges
    see earlier fusions); NULL/empty docs are absent."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.corpus import bpe_segment

    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "west"), (3, None), (4, "  ")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bpe_segment(df, [("l", "o"), ("lo", "w")]).collect()
    }
    assert set(out) == {1, 2}  # NULL and blank docs absent
    # doc 1: low->[low] (1), low->[low], lower->[low,e,r] (3)
    assert out[1]["n_tokens"] == 3
    assert out[1]["n_chars"] == 3 + 3 + 5
    assert out[1]["n_bpe_tokens"] == 1 + 1 + 3
    assert out[1]["compression"] == pytest.approx(11 / 5)
    # doc 2: west untouched -> 4 chars, 4 symbols
    assert out[2]["n_bpe_tokens"] == 4 and out[2]["compression"] == 1.0

    # fit output DataFrame is accepted directly
    from pyspark_data_drift_detector_spark.operators.corpus import fit_bpe

    fitted = fit_bpe(df.filter("text IS NOT NULL"), n_merges=2)
    out2 = bpe_segment(df, fitted)
    assert out2.count() == 2

    with _pytest.raises(ValueError, match="non-empty"):
        bpe_segment(df, [])


def _bpe_brute_force(word: str, merges: list) -> list:
    """Spec replay: every merge in rank order, one canonical
    left-to-right sweep each — the semantics of the fold chain."""
    sym = list(word)
    for left, right in merges:
        out = []
        for x in sym:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        sym = out
    return sym


def test_apply_bpe_merges_py_matches_spec():
    """The monotone min-rank segmenter equals the rank-order sweep spec,
    including recurring pairs (same pair at two ranks) and merges whose
    pair only becomes adjacent after later fusions never firing
    retroactively."""
    from pyspark_data_drift_detector_spark.operators.corpus import (
        _apply_bpe_merges_py,
    )

    cases = [
        ("low", [("l", "o"), ("lo", "w")]),
        ("aaaa", [("a", "a"), ("aa", "aa")]),
        ("ababab", [("a", "b"), ("ab", "ab"), ("a", "b")]),
        # pair (b,c) becomes adjacent only AFTER rank-2 fuses (a,b) away:
        # rank-0 (b,c) must NOT fire retroactively
        ("abc", [("b", "c"), ("x", "y"), ("a", "b")]),
        ("mississippi", [("s", "s"), ("i", "ss"), ("p", "p"), ("i", "p")]),
        ("", [("a", "b")]),
        ("q", [("a", "b")]),
    ]
    for word, merges in cases:
        ranks: dict = {}
        for rk, pr in enumerate(merges):
            ranks.setdefault(pr, []).append(rk)
        frozen = {p: tuple(r) for p, r in ranks.items()}
        assert _apply_bpe_merges_py(list(word), merges, frozen) == \
            _bpe_brute_force(word, merges), (word, merges)


def test_bpe_segment_arrow_matches_fold(spark):
    """apply_mode='arrow' is bit-identical to the fold chain on a
    fitted merge table (the oracle-parity guarantee for the scale
    path)."""
    from pyspark_data_drift_detector_spark.operators.corpus import (
        bpe_segment,
        fit_bpe,
    )

    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest widest west"), (3, "low west"),
         (4, None), (5, "aaaa abab mississippi")],
        "doc_id long, text string",
    )
    fitted = fit_bpe(df, n_merges=6, min_pair_count=1)
    fold = sorted(map(tuple, bpe_segment(df, fitted).collect()))
    arrow = sorted(map(tuple, bpe_segment(
        df, fitted, apply_mode="arrow").collect()))
    assert fold == arrow and len(fold) == 4

    import pytest as _pytest
    with _pytest.raises(ValueError, match="apply_mode"):
        bpe_segment(df, fitted, apply_mode="heap")


def test_bpe_segment_arrow_thousand_merges(spark):
    """The VERDICT r10 scale criterion: a >=1,000-merge table segments
    without plan blowup (constant-size plan — the fold chain would be a
    1,000-deep expression tree), and every per-word BPE count matches
    the pure rank-order-sweep spec."""
    import itertools

    from pyspark_data_drift_detector_spark.operators.corpus import bpe_segment

    # 676 letter-pair merges + a doubling chain + inert filler = 1,200
    merges = [(a, b) for a, b in itertools.product("abcdefghijklm", repeat=2)]
    chain = "ab"
    for _ in range(8):
        merges.append((chain, chain))
        chain += chain
    merges += [(f"z{i}", "q") for i in range(1200 - len(merges))]
    assert len(merges) == 1200

    words = ["abab" * 8, "mississippi", "deadbeef", "cabbage", "lkjhgf",
             "aaaabbbb", "abcdefgh", "hello"]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           bpe_segment(df, merges, apply_mode="arrow").collect()}
    assert len(out) == len(words)
    for i, w in enumerate(words):
        assert out[i]["n_bpe_tokens"] == len(_bpe_brute_force(w, merges)), w
        assert out[i]["n_chars"] == len(w)


def test_semantic_dedup_blockwise_matches_full_matrix(spark):
    """The strip-wise earlier-neighbor scan must equal the full n^2
    lower-triangle scan across block boundaries: one cluster with more
    than 1024 members, verdicts pinned against a brute-force numpy
    replay of the same ordering."""
    import numpy as np

    from pyspark_data_drift_detector_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(7)
    n, dim, thr = 1500, 8, 0.97
    base = rng.normal(size=(n, dim))
    # plant near-dups across the 1024 boundary so the strip join matters
    base[1100] = base[5] + rng.normal(scale=1e-3, size=dim)
    base[1301] = base[900] + rng.normal(scale=1e-3, size=dim)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = [(0, [1.0] + [0.0] * (dim - 1))]  # k=1: one giant cluster
    got = {r["vec_id"]: r["is_kept"]
           for r in semantic_dedup(df, cent, threshold=thr,
                                   scoring="expr").collect()}

    # brute force with the SAME keep order (centroid cosine asc, id asc)
    E = base / np.linalg.norm(base, axis=1, keepdims=True)
    cc = E[:, 0]
    order = np.lexsort((np.arange(n), cc))
    Eo = E[order]
    sim = Eo @ Eo.T
    dup = (np.tril(sim >= thr, -1)).any(axis=1)
    want = dict(zip(order.tolist(), (~dup).tolist()))
    assert got == want
    assert sum(1 for v in got.values() if not v) >= 2  # planted dups died


def test_training_mix_report_invariants(spark, sf_dir):
    """Structural invariants of the mix flagship: the three families are
    present; achieved token shares sum to 1 over the sampled groups;
    funnel counts sum to the corpus size; packed total tokens equal the
    mix's sampled tokens; mean_fill matches total/(packs*budget)."""
    from pyspark_data_drift_detector_spark.corpus_pipeline import (
        training_mix_report,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = training_mix_report(
        docs, {"en": 0.5, "de": 0.3, "fr": 0.2}, budget=64
    ).collect()
    fams = {r["family"] for r in out}
    assert fams == {"mix", "funnel", "packing"}
    shares = [r for r in out if r["family"] == "mix"
              and r["metric"] == "token_share"]
    assert shares and sum(r["curr_value"] for r in shares) == pytest.approx(1.0)
    assert all(r["ref_value"] in (0.5, 0.3, 0.2) for r in shares)
    funnel_n = sum(r["curr_value"] for r in out
                   if r["family"] == "funnel")
    assert funnel_n == docs.count()
    mix_tokens = sum(r["curr_value"] for r in out if r["family"] == "mix"
                     and r["metric"] == "tokens")
    packing = {r["metric"]: r for r in out if r["family"] == "packing"}
    assert packing["total_tokens"]["curr_value"] == mix_tokens
    assert packing["mean_fill"]["ref_value"] == 1.0
    assert packing["n_packs"]["curr_value"] >= 1
    # every group kept at most what was available
    toks = [r for r in out if r["family"] == "mix" and r["metric"] == "tokens"]
    assert all(r["curr_value"] <= r["ref_value"] for r in toks)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="budget"):
        training_mix_report(docs, {"en": 1.0}, budget=0)


def test_semantic_dedup_hand_checked(spark):
    """SemDeDup on hand-placed 2D vectors: cluster assignment, the
    farthest-from-centroid-first keep order, greedy (non-transitive)
    duplicate marking, NULL-vector passthrough, and the hot-cluster
    cap."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.similarity import (
        semantic_dedup,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),       # cluster 0, prototypical
            (2, [0.999, 0.01]),    # cluster 0, ~dup of 1
            (3, [0.9, 0.3]),       # cluster 0, far from centroid
            (4, [0.0, 1.0]),       # cluster 1, prototypical
            (5, [0.1, 0.95]),      # cluster 1, ~dup of 4
            (6, None),             # invalid: NULL cluster, kept
        ],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, cents, threshold=0.98, scoring="expr"
        ).collect()
    }
    assert len(out) == 6
    assert {i: out[i]["cluster_id"] for i in (1, 2, 3, 4, 5)} == \
        {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}
    assert out[6]["cluster_id"] is None and out[6]["is_kept"]
    # cluster 0 keep order: 3 (cc .949), 2 (cc .99995), 1 (cc 1.0);
    # only sim(1,2) >= .98, so 1 (later than 2) is the duplicate
    assert [out[i]["is_kept"] for i in (1, 2, 3)] == [False, True, True]
    # cluster 1: 5 is farther, 4 is its prototypical duplicate
    assert not out[4]["is_kept"] and out[5]["is_kept"]
    assert out[1]["cluster_n"] == 3 and out[4]["cluster_n"] == 2
    assert out[1]["centroid_cosine"] == pytest.approx(1.0)
    assert out[3]["centroid_cosine"] == pytest.approx(0.9 / (0.9**2 + 0.3**2) ** 0.5)

    # hot-cluster cap: cluster 0 (n=3) exceeds cap=2 -> no pairs, all
    # kept and still reported with the true cluster_n; cluster 1 dedups
    capped = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, cents, threshold=0.98, scoring="expr", max_cluster_size=2
        ).collect()
    }
    assert [capped[i]["is_kept"] for i in (1, 2, 3)] == [True, True, True]
    assert capped[1]["cluster_n"] == 3
    assert not capped[4]["is_kept"]

    with _pytest.raises(ValueError, match="threshold"):
        semantic_dedup(df, cents, threshold=1.5)
    with _pytest.raises(ValueError, match="max_cluster_size"):
        semantic_dedup(df, cents, max_cluster_size=1)


def test_snapshot_diff_reconciliation(spark):
    """Hand-checked added/removed/changed/unchanged split with NULL-key
    matching and IS-DISTINCT-FROM value semantics; per-column
    attribution counts only matched pairs; validation fails fast."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.schema_drift import (
        snapshot_diff,
    )

    ref = spark.createDataFrame(
        [(None, "x", 1), (1, "x", 1), (2, None, 2), (4, "k", 4)],
        "id int, v string, w int",
    )
    curr = spark.createDataFrame(
        [(None, "x", 1), (1, None, 9), (3, "y", 3), (4, "k", 4)],
        "id int, v string, w int",
    )
    out = {(r["scope"], r["key"]): r for r in
           snapshot_diff(ref, curr, ["id"]).collect()}
    # ids: NULL matched-unchanged, 1 matched-changed (v and w), 2
    # removed, 3 added, 4 matched-unchanged -> total 5 distinct ids
    assert out[("rows", "added")]["n_rows"] == 1
    assert out[("rows", "removed")]["n_rows"] == 1
    assert out[("rows", "changed")]["n_rows"] == 1
    assert out[("rows", "unchanged")]["n_rows"] == 2
    assert out[("rows", "added")]["share"] == pytest.approx(1 / 5)
    assert out[("column", "v")]["n_rows"] == 1   # x -> NULL counts
    assert out[("column", "w")]["n_rows"] == 1
    assert out[("column", "v")]["share"] == pytest.approx(1 / 3)

    # compare_cols defaults to shared-minus-key; explicit subset works
    sub = {(r["scope"], r["key"]): r for r in
           snapshot_diff(ref, curr, ["id"], ["w"]).collect()}
    assert ("column", "v") not in sub
    assert sub[("rows", "changed")]["n_rows"] == 1  # w differs for id 1

    # empty inputs -> counts 0, shares NULL (no division blowup)
    empty = spark.createDataFrame([], "id int, v string, w int")
    eout = {(r["scope"], r["key"]): r for r in
            snapshot_diff(empty, empty, ["id"]).collect()}
    assert eout[("rows", "added")]["n_rows"] == 0
    assert eout[("rows", "added")]["share"] is None

    with _pytest.raises(ValueError, match="id_cols"):
        snapshot_diff(ref, curr, [])
    with _pytest.raises(ValueError, match="missing"):
        snapshot_diff(ref, curr, ["id"], ["nope"])
    with _pytest.raises(ValueError, match="no columns"):
        snapshot_diff(ref.select("id"), curr.select("id"), ["id"])


def test_funnel_conversion_ordering(spark):
    """Strict temporal ordering: only users whose step events occur in
    funnel order (strictly increasing ts) advance; first qualifying
    event counts; shares NULL on an empty entry step."""
    import datetime as dt

    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.temporal import (
        funnel_conversion,
    )

    T = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, "view", T(1)), (1, "click", T(2)), (1, "buy", T(3)),
        (2, "view", T(1)), (2, "click", T(5)),        # no buy
        (3, "click", T(1)), (3, "view", T(2)),        # wrong order
        (4, "view", T(1)), (4, "click", T(1)),        # same ts: no advance
        (5, "buy", T(1)),                             # never entered
        (1, "click", T(9)),                           # later dup ignored
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp"
    )
    out = {r["step_index"]: r for r in
           funnel_conversion(df, ["view", "click", "buy"]).collect()}
    assert out[0]["n_users"] == 4 and out[0]["share_of_first"] == 1.0
    assert out[1]["n_users"] == 2           # users 1 and 2
    assert out[1]["share_of_first"] == pytest.approx(0.5)
    assert out[2]["n_users"] == 1           # user 1 only
    assert out[2]["share_of_prev"] == pytest.approx(0.5)

    # no entry events at all -> zero counts, NULL shares
    none = funnel_conversion(
        df.filter("event_type = 'buy'"), ["view", "click"]
    ).collect()
    by = {r["step_index"]: r for r in none}
    assert by[0]["n_users"] == 0 and by[0]["share_of_first"] is None

    with _pytest.raises(ValueError, match="at least 2"):
        funnel_conversion(df, ["view"])


def test_transition_drift_panel(spark):
    """Hand-checked transition shares: per-user lag pairs with
    deterministic tie-break, full-outer pair alignment, share-0 for a
    side missing the pair, empty-side handling, threshold validation."""
    import datetime as dt

    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.temporal import (
        transition_drift,
    )

    T = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    # ref: u1 a->b->c (a:b 1, b:c 1); u2 a->b  => a->b 2/3, b->c 1/3
    ref = spark.createDataFrame(
        [(1, 1, "a", T(1)), (2, 1, "b", T(2)), (3, 1, "c", T(3)),
         (4, 2, "a", T(1)), (5, 2, "b", T(2))],
        "event_id int, user_id int, event_type string, ts timestamp",
    )
    # curr: u1 a->b; u3 b->a  => a->b 1/2, b->a 1/2
    curr = spark.createDataFrame(
        [(6, 1, "a", T(1)), (7, 1, "b", T(2)),
         (8, 3, "b", T(1)), (9, 3, "a", T(2))],
        "event_id int, user_id int, event_type string, ts timestamp",
    )
    out = {(r["prev_type"], r["next_type"]): r
           for r in transition_drift(ref, curr, threshold=0.2).collect()}
    assert out[("a", "b")]["ref_share"] == pytest.approx(2 / 3)
    assert out[("a", "b")]["curr_share"] == pytest.approx(1 / 2)
    assert out[("a", "b")]["drift_detected"] is False
    assert out[("b", "c")]["curr_n"] == 0
    assert out[("b", "c")]["curr_share"] == 0.0
    assert out[("b", "c")]["drift_detected"] is True   # 1/3 > 0.2
    assert out[("b", "a")]["ref_n"] == 0
    assert out[("b", "a")]["drift_detected"] is True   # 1/2 > 0.2

    # same-ts events: order_col breaks the tie deterministically
    tie = spark.createDataFrame(
        [(1, 1, "x", T(1)), (2, 1, "y", T(1))],
        "event_id int, user_id int, event_type string, ts timestamp",
    )
    t2 = {(r["prev_type"], r["next_type"]): r["ref_n"]
          for r in transition_drift(tie, curr, threshold=0.9).collect()
          if r["ref_n"] > 0}
    assert t2 == {("x", "y"): 1}

    # empty ref -> curr pairs appear with ref_share 0
    empty = ref.filter("event_id < 0")
    eout = transition_drift(empty, curr, threshold=0.2).collect()
    assert all(r["ref_share"] == 0.0 for r in eout) and len(eout) == 2

    with _pytest.raises(ValueError, match="threshold"):
        transition_drift(ref, curr, threshold=1.5)


def test_bpe_vocab_coverage(spark):
    """Vocabulary after merges: occurrence-weighted symbol counts,
    distinct-word coverage (a symbol twice in one word counts that word
    once), merged-symbol flag, tie-broken top-k."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.corpus import bpe_vocab

    df = spark.createDataFrame(
        [(1, "papa papa mama")], "doc_id long, text string"
    )
    out = {r["symbol"]: r for r in
           bpe_vocab(df, [("p", "a")], top_k=10).collect()}
    # papa -> [pa, pa] (wc 2), mama -> [m, a, m, a] (wc 1)
    assert out["pa"]["token_count"] == 4  # 2 per word * wc 2
    assert out["pa"]["n_words"] == 1      # distinct words, not slots
    assert out["pa"]["is_merged"] is True
    assert out["m"]["token_count"] == 2 and out["m"]["n_words"] == 1
    assert out["a"]["token_count"] == 2   # only mama retains bare 'a'
    assert out["a"]["is_merged"] is False

    # top_k cuts deterministically (count desc, symbol asc)
    top1 = bpe_vocab(df, [("p", "a")], top_k=1).collect()
    assert [r["symbol"] for r in top1] == ["pa"]

    with _pytest.raises(ValueError, match="top_k"):
        bpe_vocab(df, [("p", "a")], top_k=0)
    with _pytest.raises(ValueError, match="non-empty"):
        bpe_vocab(df, [])


def test_cluster_silhouette_geometry(spark):
    """Hand-checked simplified silhouette on orthogonal centroids:
    on-centroid vectors score 1, boundary (equidistant) vectors score 0
    and tie to the smaller centroid id; invalid vectors are excluded;
    validation fails fast."""
    import math

    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.similarity import (
        cluster_silhouette,
    )

    r = 1 / math.sqrt(2)
    rows = [
        (1, [1.0, 0.0]),     # exactly c0 -> s = 1
        (2, [0.6, 0.8]),     # cos: c0 .6, c1 .8 -> c1, s = .2/.4 = .5
        (3, [r, r]),         # equidistant -> tie to c0, s = 0
        (4, None),           # invalid: excluded
        (5, [1.0, 0.0, 0.0]),  # ragged: excluded
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {r["cluster_id"]: r for r in
           cluster_silhouette(df, cents).collect()}
    assert out[0]["n_vectors"] == 2            # vec 1 and the tie vec 3
    assert out[0]["mean_silhouette"] == pytest.approx(0.5)  # (1 + 0) / 2
    assert out[1]["n_vectors"] == 1
    assert out[1]["mean_silhouette"] == pytest.approx(0.5)
    assert out[None]["n_vectors"] == 3
    assert out[None]["mean_silhouette"] == pytest.approx(0.5)

    with _pytest.raises(ValueError, match="at least 2"):
        cluster_silhouette(df, [(0, [1.0, 0.0])])
    with _pytest.raises(ValueError, match="max_cells"):
        cluster_silhouette(df, cents, max_cells=3)


def test_retention_cohorts_matrix(spark):
    """Hand-checked weekly retention: cohorts by first-seen week,
    offsets count whole buckets, cohort_size is the offset-0 count,
    day-bucket mode and validation."""
    import datetime as dt

    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.temporal import (
        retention_cohorts,
    )

    # week of 2026-01-05 (Mon): users 1,2; week of 01-12: user 3
    # user 1 active weeks 0 and 1; user 2 only week 0; user 3 week 0
    rows = [
        (1, dt.datetime(2026, 1, 5, 10)), (1, dt.datetime(2026, 1, 6, 9)),
        (1, dt.datetime(2026, 1, 14, 9)),
        (2, dt.datetime(2026, 1, 7, 8)),
        (3, dt.datetime(2026, 1, 13, 8)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {(r["cohort"], r["offset"]): r for r in
           retention_cohorts(df).collect()}
    assert out[("2026-01-05", 0)]["n_active"] == 2
    assert out[("2026-01-05", 0)]["cohort_size"] == 2
    assert out[("2026-01-05", 0)]["retention"] == 1.0
    assert out[("2026-01-05", 1)]["n_active"] == 1
    assert out[("2026-01-05", 1)]["retention"] == pytest.approx(0.5)
    assert out[("2026-01-12", 0)]["n_active"] == 1
    assert len(out) == 3

    # day buckets: user 1 active Jan 5, 6, 14 -> offsets 0, 1, 9
    dout = {(r["cohort"], r["offset"]) for r in
            retention_cohorts(df, bucket="day").collect()
            if r["cohort"] == "2026-01-05"}
    assert dout == {("2026-01-05", 0), ("2026-01-05", 1),
                    ("2026-01-05", 9)}

    with _pytest.raises(ValueError, match="bucket"):
        retention_cohorts(df, bucket="month")


def test_group_keywords_ctfidf(spark):
    """c-TF-IDF hand-check: a token concentrated in one group outranks
    uniformly-spread tokens there; shared-vocabulary corpora still get
    informative rankings (the plain-IDF zero case); NULL group is a
    real group; k validation."""
    import math

    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.corpus import (
        group_keywords,
    )

    rows = [
        (1, "g1", "common common special"),
        (2, "g2", "common common common"),
        (3, None, "common anon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    out = {(r["group_key"], r["rank"]): r for r in
           group_keywords(df, "grp", k=2).collect()}
    # g1: special tf=1 share 1/3, common tf=2 share 2/3; global common=6,
    # special=1, anon=1; avg class tokens = 8/3
    a = 8 / 3
    s_special = (1 / 3) * math.log(1 + a / 1)
    s_common_g1 = (2 / 3) * math.log(1 + a / 6)
    assert s_special > s_common_g1
    assert out[("g1", 1)]["token"] == "special"
    assert out[("g1", 1)]["score"] == pytest.approx(s_special, rel=1e-6)
    assert out[("g1", 2)]["token"] == "common"
    assert out[("g2", 1)]["token"] == "common"
    assert (None, 1) in out and out[(None, 1)]["token"] == "anon"

    with _pytest.raises(ValueError, match="k must be"):
        group_keywords(df, "grp", k=0)


def test_event_paths_mining(spark):
    """Hand-checked n-gram paths: windows never span users, tie-break
    order, distinct-user support, share denominator, validation."""
    import datetime as dt

    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.temporal import (
        event_paths,
    )

    T = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, 1, "a", T(1)), (2, 1, "b", T(2)), (3, 1, "c", T(3)),
        (4, 1, "b", T(4)), (5, 1, "c", T(5)),
        (6, 2, "a", T(1)), (7, 2, "b", T(2)), (8, 2, "c", T(3)),
        (9, 3, "x", T(1)),  # too short for any window
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, event_type string, ts timestamp"
    )
    out = {r["path"]: r for r in event_paths(df, n=3, top_k=10).collect()}
    # u1 windows: a>b>c, b>c>b, c>b>c; u2: a>b>c; u3: none -> 4 total
    assert out["a>b>c"]["n_occurrences"] == 2
    assert out["a>b>c"]["n_users"] == 2
    assert out["a>b>c"]["share"] == pytest.approx(2 / 4)
    assert out["b>c>b"]["n_occurrences"] == 1
    assert len(out) == 3

    # top_k=1 picks the most common path
    top = event_paths(df, n=3, top_k=1).collect()
    assert [r["path"] for r in top] == ["a>b>c"]

    # n=2 reduces to transitions
    pairs = {r["path"] for r in event_paths(df, n=2, top_k=10).collect()}
    assert pairs == {"a>b", "b>c", "c>b"}

    with _pytest.raises(ValueError, match="n must be"):
        event_paths(df, n=1)
    with _pytest.raises(ValueError, match="top_k"):
        event_paths(df, top_k=0)


def test_transition_incremental_stitch(spark):
    """The events-side increment vet: cross-batch transitions stitch
    from the prior last-event state, and prior counts + increment
    counts EXACTLY equal the full stream's transition counts (the
    additive-state invariant of the family)."""
    import datetime as dt

    from pyspark_data_drift_detector_spark.operators.temporal import (
        transition_drift,
        transition_incremental,
        transition_last_state,
        transition_pair_state,
    )

    T = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # prior: u1 a->b, u2 a; batch: u1 c (stitch b->c), u2 b then c,
        # u3 x->y (new user, no stitch)
        (1, 1, "a", T(1)), (2, 1, "b", T(2)),
        (3, 2, "a", T(3)),
        (4, 1, "c", T(10)),
        (5, 2, "b", T(11)), (6, 2, "c", T(12)),
        (7, 3, "x", T(10)), (8, 3, "y", T(11)),
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, event_type string, ts timestamp"
    )
    prior = df.filter("ts < TIMESTAMP '2026-01-01 00:00:05'")
    batch = df.filter("ts >= TIMESTAMP '2026-01-01 00:00:05'")
    pairs = transition_pair_state(prior)
    last = transition_last_state(prior)
    assert {(r["user_key"], r["last_type"]) for r in last.collect()} == {
        (1, "b"), (2, "a")
    }
    out = {(r["prev_type"], r["next_type"]): r for r in
           transition_incremental(batch, pairs, last,
                                  threshold=0.5).collect()}
    # batch pairs: stitched b->c (u1), stitched a->b (u2),
    # within b->c (u2), within x->y (u3)
    assert out[("b", "c")]["curr_n"] == 2
    assert out[("a", "b")]["curr_n"] == 1
    assert out[("x", "y")]["curr_n"] == 1
    assert out[("a", "b")]["ref_n"] == 1   # the one prior transition
    assert out[("a", "b")]["ref_share"] == 1.0
    assert out[("b", "c")]["curr_share"] == pytest.approx(0.5)
    assert out[("b", "c")]["drift_detected"] is False  # 0.5 - 0 = 0.5

    # invariant: prior state + increment == full-stream transitions
    whole = transition_drift(df, df.filter("1=0"), threshold=0.5)
    whole_counts = {(r["prev_type"], r["next_type"]): r["ref_n"]
                    for r in whole.collect() if r["ref_n"] > 0}
    merged: dict = {}
    for r in pairs.collect():
        k = (r["prev_type"], r["next_type"])
        merged[k] = merged.get(k, 0) + r["n"]
    for k, r in out.items():
        if r["curr_n"]:
            merged[k] = merged.get(k, 0) + r["curr_n"]
    assert merged == whole_counts


def test_transition_vetting_sink(spark, tmp_path):
    """Two time-ordered batches through the events vetting sink: batch 1
    bootstraps silently (states only), batch 2 produces the panel with
    the cross-batch stitch, and the rolled-up pair state after both
    batches EXACTLY equals the full stream's transition counts."""
    import datetime as dt

    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        transition_vetting_sink,
    )
    from pyspark_data_drift_detector_spark.operators.temporal import (
        transition_pair_state,
    )

    T = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    schema = "event_id int, user_id int, event_type string, ts timestamp"
    b1 = spark.createDataFrame(
        [(1, 1, "a", T(1)), (2, 1, "b", T(2)), (3, 2, "a", T(3))], schema
    )
    b2 = spark.createDataFrame(
        [(4, 1, "c", T(10)), (5, 2, "b", T(11)), (6, 2, "c", T(12))], schema
    )
    pair_p = str(tmp_path / "pairs")
    last_p = str(tmp_path / "last")
    report_p = str(tmp_path / "report")
    sink = transition_vetting_sink(pair_p, last_p, report_p, threshold=0.5)

    sink(b1, 0)
    import os

    assert not os.path.exists(report_p)  # bootstrap: no report
    assert {(r["prev_type"], r["next_type"], r["n"]) for r in
            spark.read.parquet(pair_p).collect()} == {("a", "b", 1)}

    sink(b2, 1)
    rep = spark.read.parquet(report_p)
    out = {(r["prev_type"], r["next_type"]): r for r in rep.collect()}
    # batch 2 pairs: stitched b->c (u1), stitched a->b (u2), within b->c
    assert out[("b", "c")]["curr_n"] == 2
    assert out[("a", "b")]["curr_n"] == 1
    assert out[("a", "b")]["ref_n"] == 1
    assert all(r["batch_id"] == 1 for r in rep.collect())

    # invariant: rolled-up pair state == full-stream transition counts
    rolled = {}
    for r in spark.read.parquet(pair_p).collect():
        k = (r["prev_type"], r["next_type"])
        rolled[k] = rolled.get(k, 0) + r["n"]
    full = {(r["prev_type"], r["next_type"]): r["n"] for r in
            transition_pair_state(b1.unionByName(b2)).collect()}
    assert rolled == full

    # last-event state re-aggregates to the true latest per user
    last = spark.read.parquet(last_p)
    latest = {}
    for r in last.orderBy("last_ts", "last_order").collect():
        latest[r["user_key"]] = r["last_type"]
    assert latest == {1: "c", 2: "c"}


def test_review_fix_regressions(spark):
    """Round-10 review fixes, pinned: NULL event types align in the
    transition panel; zero-norm vectors/centroids don't crash the
    silhouette; a zero-mass target group doesn't crash (or constrain)
    the mix sampler; NULL timestamps produce no phantom retention row;
    the funnel result is step-linear (eagerly computed literals)."""
    import datetime as dt

    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.sampling import mix_sample
    from pyspark_data_drift_detector_spark.operators.similarity import (
        cluster_silhouette,
    )
    from pyspark_data_drift_detector_spark.operators.temporal import (
        funnel_conversion,
        retention_cohorts,
        transition_drift,
    )

    T = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    schema = "event_id int, user_id int, event_type string, ts timestamp"

    # 1. NULL event_type transitions align into ONE matched panel row
    side = [(1, 1, "a", T(1)), (2, 1, None, T(2))]
    ref = spark.createDataFrame(side, schema)
    curr = spark.createDataFrame(
        [(3, 2, "a", T(1)), (4, 2, None, T(2))], schema
    )
    rows = transition_drift(ref, curr, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["prev_type"] == "a" and r["next_type"] is None
    assert r["ref_n"] == 1 and r["curr_n"] == 1
    assert r["share_abs_diff"] == 0.0 and r["drift_detected"] is False

    # 2. zero-norm vectors are excluded, zero-norm centroids rejected
    vdf = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {r["cluster_id"]: r for r in
           cluster_silhouette(vdf, cents).collect()}
    assert out[None]["n_vectors"] == 1  # the zero vector is excluded
    with _pytest.raises(ValueError, match="zero norm"):
        cluster_silhouette(vdf, [(0, [0.0, 0.0]), (1, [0.0, 1.0])])

    # 3. a targeted group with zero mass neither crashes nor caps N_max
    wdf = spark.createDataFrame(
        [(1, "a", 0.0), (2, "b", 100.0), (3, "b", 100.0)],
        "doc_id long, lang string, tok double",
    )
    wout = mix_sample(wdf, "lang", {"a": 0.5, "b": 0.5}, weight_col="tok")
    got = {r["lang"]: r["sample_rate"] for r in
           wout.select("lang", "sample_rate").distinct().collect()}
    assert got == {"b": 1.0}  # a contributes nothing; b unconstrained

    # 4. NULL timestamps are not activity: no phantom offset row
    rdf = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 5, 10)), (1, None),
         (2, dt.datetime(2026, 1, 5, 11))],
        "user_id int, ts timestamp",
    )
    rows = retention_cohorts(rdf).collect()
    assert all(r["offset"] is not None for r in rows)
    assert len(rows) == 1 and rows[0]["n_active"] == 2

    # 5. funnel is eager literals now: its plan re-scans nothing
    from pyspark_data_drift_detector_spark.plans.inspect import (
        count_scans,
        count_shuffles,
    )

    ev = spark.createDataFrame(
        [(1, 1, "a", T(1)), (2, 1, "b", T(2)), (3, 1, "c", T(3)),
         (4, 1, "d", T(4))], schema
    )
    fc = funnel_conversion(ev, ["a", "b", "c", "d"])
    assert count_scans(fc) == 0 and count_shuffles(fc) == 0
    out = {r["step_index"]: r["n_users"] for r in fc.collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 1}


def test_review_fix_regressions_session1_ops(spark, tmp_path):
    """Second review batch, pinned: massless embedding batches yield a
    NULL centroid cosine instead of an ANSI abort (and the vetting sink
    keeps bootstrapping until real mass arrives); zero-norm vectors are
    excluded from k-means fits and spread seeding picks distinct ids;
    unlabeled documents are not false positives in the sweep."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.similarity import (
        embedding_incremental,
        embedding_state,
        fit_kmeans,
    )

    # 1. batch with zero valid vectors: panel emitted, cosine NULL
    good = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    state = embedding_state(good, dim=2, n_features=4)
    bad_batch = spark.createDataFrame(
        [(3, None), (4, [1.0])], "vec_id long, embedding array<double>"
    )
    panel = {r["metric"]: r for r in embedding_incremental(
        bad_batch, state, dim=2, n_features=4
    ).collect()}
    assert panel["centroid_cosine"]["curr_value"] is None
    assert panel["n_vectors"]["curr_value"] == 0.0

    # 2. zero-norm vectors excluded from the fit; spread seeds distinct
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0]),
         (4, [0.7, 0.7])],
        "vec_id long, embedding array<double>",
    )
    cents = dict(fit_kmeans(vecs, k=2, iters=1, id_col="vec_id"))
    assert len(cents) == 2
    ties = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    tied = fit_kmeans(ties, k=2, iters=1, id_col="vec_id", init="spread")
    assert len(tied) == 2  # distinct seed ids even when all cosines tie
    with _pytest.raises(ValueError, match="fewer than"):
        fit_kmeans(ties.limit(1), k=2, iters=1, id_col="vec_id",
                   init="spread")

    # 3. the vetting sink does not wedge on a degenerate first batch
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        embedding_vetting_sink,
    )

    sink = embedding_vetting_sink(
        str(tmp_path / "geo"), str(tmp_path / "mix"),
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], str(tmp_path / "rep"),
        dim=2, n_features=4,
    )
    sink(bad_batch, 0)          # massless: seeds state, no report
    sink(good, 1)               # still bootstrap (no prior mass)
    import os
    assert not os.path.exists(str(tmp_path / "rep"))
    sink(good, 2)               # now vets against real mass
    assert spark.read.parquet(str(tmp_path / "rep")).count() > 0

    # 3b. semantic_decontaminate's expression path: zero-norm corpus
    # vectors get the NULL verdict (like NULL/ragged), not an ANSI abort
    from pyspark_data_drift_detector_spark.operators.similarity import (
        semantic_decontaminate,
    )

    sd = {r["vec_id"]: r for r in semantic_decontaminate(
        vecs, good.filter("vec_id = 1"), threshold=0.9
    ).collect()}
    assert sd[2]["contaminated"] is None      # the zero-norm vector
    assert sd[1]["contaminated"] is True

    # 4. NULL labels are excluded from the sweep's precision/fp
    from pyspark_data_drift_detector_spark.operators.quality import (
        classifier_threshold_sweep,
        fit_quality_classifier,
    )

    docs = spark.createDataFrame(
        [(1, "good good text", 1.0), (2, "bad stuff", 0.0),
         (3, "unlabeled words", None)],
        "doc_id long, text string, y double",
    )
    w, b = fit_quality_classifier(docs, "y", weights_dim=16, iters=1)
    rows = classifier_threshold_sweep(
        docs, w, bias=b, label_col="y", thresholds=[0.0]
    ).collect()
    r = rows[0]
    assert r["n_keep"] == 3            # volume counts all scored docs
    assert r["tp"] + r["fp"] == 2      # label metrics: labeled rows only


def test_funnel_latency_hand_checked(spark):
    """Hand-placed event times: per-step deltas use each user's FIRST
    qualifying strictly-after event (the funnel_conversion semantics);
    exact mean/median; a step nobody reaches keeps a NULL-stat row."""
    import datetime as dt

    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.temporal import (
        funnel_latency,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(uid, et, sec):
        return (uid, et, t0 + dt.timedelta(seconds=sec))

    rows = [
        # user 1: view@0 -> click@10 (an earlier click@-5 must not count)
        ev(1, "click", -5), ev(1, "view", 0), ev(1, "click", 10),
        ev(1, "signup", 10),   # equal ts: does NOT advance
        # user 2: view@0 -> click@30 -> signup@90
        ev(2, "view", 0), ev(2, "click", 30), ev(2, "signup", 90),
        # user 3: view only
        ev(3, "view", 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz"
    )
    out = {r["step_index"]: r
           for r in funnel_latency(df, ["view", "click", "signup"]).collect()}
    assert set(out) == {1, 2}
    c = out[1]
    assert c["step"] == "click" and c["n_users"] == 2
    assert c["mean_seconds"] == pytest.approx(20.0)   # (10 + 30) / 2
    assert c["p50_seconds"] == pytest.approx(20.0)
    assert c["min_seconds"] == 10.0 and c["max_seconds"] == 30.0
    s = out[2]
    assert s["step"] == "signup" and s["n_users"] == 1
    assert s["mean_seconds"] == pytest.approx(60.0)   # 90 - 30

    # nobody purchases: the row survives with NULL stats
    out4 = {r["step_index"]: r for r in funnel_latency(
        df, ["view", "click", "signup", "purchase"]).collect()}
    p = out4[3]
    assert p["n_users"] == 0 and p["mean_seconds"] is None

    with _pytest.raises(ValueError, match="at least 2"):
        funnel_latency(df, ["view"])


def test_rollup_consistency_hand_checked(spark):
    """Parent/child reconciliation: in-tolerance match, out-of-tolerance
    mismatch with magnitudes, NULL parent value = mismatch without
    magnitude, and both orphan directions."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.constraints import (
        check_rollup_consistency,
    )

    parent = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, None), (4, 5.0)],
        "k long, total double",
    )
    child = spark.createDataFrame(
        [(1, 4.0), (1, 6.005), (2, 50.0), (3, 1.0), (5, 7.0)],
        "k long, v double",
    )
    r = check_rollup_consistency(
        parent, child, "k", "k", "total", "sum(v)", tolerance=0.01
    ).collect()[0]
    # key 1: 10 vs 10.005 -> match (|diff|=0.005 <= 0.01)
    # key 2: 99 vs 50 -> mismatch, diff 49
    # key 3: NULL vs 1 -> mismatch, no magnitude
    # key 4: parent-only; key 5: child-only
    assert r["n_parent"] == 4 and r["n_child_keys"] == 4
    assert r["n_matched"] == 1 and r["n_mismatched"] == 2
    assert r["n_parent_only"] == 1 and r["n_child_only"] == 1
    assert r["max_abs_diff"] == pytest.approx(49.0)
    assert r["mean_abs_diff"] == pytest.approx(49.0)  # NULL pair adds none
    assert r["consistent"] is False

    ok = check_rollup_consistency(
        parent.filter("k = 1"), child.filter("k = 1"),
        "k", "k", "total", "sum(v)", tolerance=0.01,
    ).collect()[0]
    assert ok["consistent"] is True and ok["max_abs_diff"] is None

    with _pytest.raises(ValueError, match="tolerance"):
        check_rollup_consistency(
            parent, child, "k", "k", "total", "sum(v)", tolerance=-1
        )


def test_format_profile_ladder(spark):
    """First-match classification: every ladder class, NULL/empty
    handling, shares summing to 1 per column over ALL rows."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.text import (
        format_profile,
    )

    df = spark.createDataFrame(
        [("42",), ("-7",), ("3.14",), ("2024-01-02",),
         ("2024-01-02 10:30:00",), ("a@b.co",), ("https://x.io/p",),
         ("Customer#001",), ("550e8400-e29b-41d4-a716-446655440000",),
         ("plain words",), ("",), (None,),
         # regex-backslash adversaries: '12a34' matched the DECIMAL class
         # and any URL containing 's' missed URL when the patterns were
         # round-tripped through a SQL string literal (r11 review find)
         ("12a34",), ("https://s.example.com/stuff",)],
        "v string",
    )
    out = {(r["format"]): r for r in format_profile(df, ["v"]).collect()}
    assert {k for k in out} == {
        "integer", "decimal", "date", "datetime", "email", "url",
        "tagged_id", "uuid", "other", "empty", "null",
    }
    assert out["integer"]["n"] == 2  # 42 and -7
    assert out["decimal"]["n"] == 1  # 3.14 only — NOT 12a34
    assert out["url"]["n"] == 2      # incl. the 's'-bearing URL
    assert out["other"]["n"] == 2    # plain words, 12a34
    assert sum(r["n"] for r in out.values()) == 14
    assert sum(r["share"] for r in out.values()) == pytest.approx(1.0)

    with _pytest.raises(ValueError, match="non-empty"):
        format_profile(df, [])


def test_cluster_label_purity_hand_checked(spark):
    """Purity/entropy arithmetic on a hand-assigned clustering: majority
    with smallest-label tie-break, NULL labels as their own class."""
    import math

    from pyspark_data_drift_detector_spark.operators.similarity import (
        cluster_label_purity,
    )

    # 2D: cluster 0 = x-axis, cluster 1 = y-axis
    rows = [
        (1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "a"), (3, [0.95, 0.05], "b"),
        (4, [0.0, 1.0], "c"), (5, [0.1, 0.9], "d"),  # tie: c vs d -> c
        (6, [0.05, 0.95], None),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {r["cluster_id"]: r
           for r in cluster_label_purity(df, cents, scoring="expr").collect()}
    c0 = out[0]
    assert c0["n_members"] == 3 and c0["n_labels"] == 2
    assert c0["majority_label"] == "a"
    assert c0["purity"] == pytest.approx(2 / 3)
    assert c0["label_entropy"] == pytest.approx(
        -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    )
    c1 = out[1]
    # three singleton labels (c, d, NULL): tie -> NULL's '' key sorts
    # first, so the NULL class wins the majority slot
    assert c1["n_members"] == 3 and c1["n_labels"] == 3
    assert c1["majority_label"] is None
    assert c1["purity"] == pytest.approx(1 / 3)


def test_format_drift_incremental_vetting(spark):
    """The format member of the vet-the-increment family: additive
    state rollup, one-side-only format alignment, share flags on the
    rounded diff, empty-state rejection."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.text import (
        format_drift_incremental,
        format_state,
    )

    prior1 = spark.createDataFrame([("1",), ("2",)], "v string")
    prior2 = spark.createDataFrame([("3",), ("2024-01-01",)], "v string")
    state = format_state(prior1, ["v"]).unionByName(
        format_state(prior2, ["v"])
    )
    # batch: all dates -> 'integer' vanished (ref 3/4), 'date' exploded
    batch = spark.createDataFrame(
        [("2024-02-02",), ("2024-03-03",)], "v string"
    )
    out = {r["format"]: r
           for r in format_drift_incremental(batch, state, ["v"]).collect()}
    assert out["integer"]["ref_n"] == 3 and out["integer"]["curr_n"] == 0
    assert out["integer"]["ref_share"] == pytest.approx(0.75)
    assert out["integer"]["curr_share"] == 0.0
    assert out["integer"]["share_abs_diff"] == pytest.approx(0.75)
    assert out["integer"]["drift_detected"]
    assert out["date"]["curr_share"] == 1.0 and out["date"]["drift_detected"]

    with _pytest.raises(ValueError, match="empty"):
        format_drift_incremental(batch, state.filter("1 = 0"), ["v"])


def test_rollup_mismatch_topk_ordering(spark):
    """Worst offenders first, smallest-key tie-break, in-tolerance and
    orphan keys excluded, k-bound respected."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.constraints import (
        rollup_mismatch_topk,
    )

    parent = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 7.0), (4, 100.0), (5, 1.0)],
        "k long, total double",
    )
    child = spark.createDataFrame(
        [(1, 10.005), (2, 10.0), (3, 27.0), (4, 80.0), (9, 1.0)],
        "k long, v double",
    )
    rows = rollup_mismatch_topk(
        parent, child, "k", "k", "total", "sum(v)", k=2
    ).collect()
    # keys 2, 3, 4 all diverge by exactly 20; k=2 plus the ascending-key
    # tie-break selects [2, 3]
    assert [r["key"] for r in rows] == [2, 3]
    assert all(r["abs_diff"] == pytest.approx(20.0) for r in rows)

    with _pytest.raises(ValueError, match="k must"):
        rollup_mismatch_topk(parent, child, "k", "k", "total", "sum(v)", k=0)


def test_format_vetting_sink(spark, tmp_path):
    """Vet-before-advance for the format member: batch 0 bootstraps
    silently; batch 1 is vetted against batch 0 ONLY (its own rows not
    in the reference); state accumulates additively; compaction is
    verdict-identical."""
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        compact_state,
        format_vetting_sink,
    )

    state_p = str(tmp_path / "fmt_state")
    report_p = str(tmp_path / "fmt_report")
    sink = format_vetting_sink(state_p, report_p, ["v"], threshold=0.1)

    b0 = spark.createDataFrame([("1",), ("2",), ("3",)], "v string")
    sink(b0, 0)
    import os
    assert not os.path.exists(report_p)  # bootstrap: no report
    assert spark.read.parquet(state_p).count() == 1  # one (v, integer)

    b1 = spark.createDataFrame([("2024-01-01",), ("7",)], "v string")
    sink(b1, 1)
    rep = {r["format"]: r for r in spark.read.parquet(report_p).collect()}
    # vetted against batch 0 only: ref integer share 1.0, curr 0.5
    assert rep["integer"]["ref_n"] == 3 and rep["integer"]["curr_n"] == 1
    assert rep["integer"]["share_abs_diff"] == pytest.approx(0.5)
    assert rep["integer"]["drift_detected"]
    assert rep["date"]["ref_n"] == 0 and rep["date"]["drift_detected"]
    assert all(r["batch_id"] == 1 for r in rep.values())

    # state now holds both batches additively
    state = spark.read.parquet(state_p)
    assert state.groupBy().agg(F.expr("sum(n)")).collect()[0][0] == 5

    # compaction: row count shrinks, rolled-up counts identical
    before = {(r["column_name"], r["format"]): r["n"]
              for r in state.groupBy("column_name", "format")
              .agg(F.expr("CAST(sum(n) AS BIGINT) AS n")).collect()}
    res = compact_state(spark, state_p, "format")
    assert res["rows_after"] <= res["rows_before"]
    after = {(r["column_name"], r["format"]): r["n"]
             for r in spark.read.parquet(state_p).collect()}
    assert before == after


def test_funnel_conversion_window(spark):
    """max_lag_seconds: a step landing outside the window does not
    convert even when a later out-of-window event exists; within-window
    conversions use the first qualifying event; validation."""
    import datetime as dt

    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.temporal import (
        funnel_conversion,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, et, sec):
        return (uid, et, t0 + dt.timedelta(seconds=sec))

    rows = [
        ev(1, "view", 0), ev(1, "click", 50),          # inside 60s
        ev(2, "view", 0), ev(2, "click", 100),          # outside
        ev(3, "view", 0), ev(3, "click", 60),           # boundary: inside
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz"
    )
    out = {r["step_index"]: r["n_users"] for r in funnel_conversion(
        df, ["view", "click"], max_lag_seconds=60).collect()}
    assert out == {0: 3, 1: 2}
    # unbounded still converts everyone
    out2 = {r["step_index"]: r["n_users"]
            for r in funnel_conversion(df, ["view", "click"]).collect()}
    assert out2 == {0: 3, 1: 3}

    with _pytest.raises(ValueError, match="max_lag_seconds"):
        funnel_conversion(df, ["view", "click"], max_lag_seconds=0)


def test_watermark_planner_hand_checked(spark):
    """Running-max lateness on a hand-ordered stream, cross-checking the
    two-phase prefix max against known per-event lateness; per-delay
    drop counts; validation."""
    import datetime as dt

    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.temporal import (
        watermark_planner,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(order, sec):
        return (order, t0 + dt.timedelta(seconds=sec))

    # arrival order vs event time: lateness = runmax - own
    rows = [
        ev(1, 100),   # runmax 100, late 0
        ev(2, 50),    # late 50
        ev(3, 200),   # late 0
        ev(4, 120),   # late 80
        ev(5, 199),   # late 1
        # tied arrival: simultaneous events both see the max over ALL
        # ties (RANGE frame) — deterministic regardless of row order
        ev(7, 300),   # late 0
        ev(7, 250),   # late 50 (vs the tied 300, not order-dependent)
        (8, None),    # excluded
        (None, t0),   # excluded
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    out = {r["delay_seconds"]: r for r in watermark_planner(
        df, [0, 10, 60, 100], ts_col="ts", order_col="event_id",
        num_buckets=2,
    ).collect()}
    assert all(r["n_events"] == 7 for r in out.values())
    assert out[0]["n_late"] == 4      # 50, 80, 1, 50
    assert out[10]["n_late"] == 3     # 50, 80, 50
    assert out[60]["n_late"] == 1     # 80
    assert out[100]["n_late"] == 0
    assert out[0]["late_share"] == pytest.approx(4 / 7)
    assert out[0]["max_lateness"] == 80.0
    assert out[0]["p50_lateness"] == 1.0  # median of [0,0,0,1,50,50,80]

    with _pytest.raises(ValueError, match="non-empty"):
        watermark_planner(df, [])
    with _pytest.raises(ValueError, match=">= 0"):
        watermark_planner(df, [-5])


def test_doc_novelty_hand_checked(spark):
    """Known gram overlaps: full novelty for an unseen doc, zero for a
    verbatim re-crawl, fractional for a partial match; the hot-gram cap
    treats boilerplate as seen; empty docs absent."""
    import pytest as _pytest

    from pyspark_data_drift_detector_spark.operators.quality import (
        doc_novelty,
    )

    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),     # verbatim: novelty 0
            (2, "totally unseen text here now"),  # novelty 1
            # 4 distinct 3-grams, first 2 seen: novelty 0.5
            (3, "quick brown fox jumps high today"),
            (4, None),
            (5, "  "),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in doc_novelty(batch, ref).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0
    assert out[3]["n_grams"] == 4 and out[3]["unseen_grams"] == 2
    assert out[3]["novelty"] == pytest.approx(0.5)

    # hot-gram cap: a gram in >1 batch docs counts as seen, not novel
    boiler = spark.createDataFrame(
        [(10, "subscribe to our newsletter"), (11, "subscribe to our newsletter")],
        "doc_id long, text string",
    )
    capped = {r["doc_id"]: r
              for r in doc_novelty(boiler, ref, max_gram_df=1).collect()}
    assert all(r["novelty"] == 0.0 for r in capped.values())

    with _pytest.raises(ValueError, match="n must"):
        doc_novelty(batch, ref, n=0)


def test_embedding_constraints_gate(spark):
    """Each vector-gate rule fires on a crafted violation and passes on
    a clean batch; the output rows union with the scalar suite shape."""
    from pyspark_data_drift_detector_spark.operators.constraints import (
        check_embedding_constraints,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),        # clean
            (2, None),                    # null vector
            (3, [1.0, 0.0]),              # bad dim
            (4, [1.0, None, 0.0]),        # element null
            (5, [0.0, 0.0, 0.0]),         # zero norm
            (6, [3.0, 4.0, 0.0]),         # norm 5: out of range
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["constraint"]: r for r in check_embedding_constraints(
        df, dim=3, norm_min=0.5, norm_max=2.0).collect()}
    assert set(out) == {
        "embedding_completeness", "embedding_dim",
        "embedding_element_nulls", "embedding_zero_norm",
        "embedding_norm_range",
    }
    assert not out["embedding_completeness"]["passed"]  # 1/6 > 0.0
    assert out["embedding_dim"]["violations"] == 1
    assert out["embedding_element_nulls"]["violations"] == 1
    assert out["embedding_zero_norm"]["violations"] == 1
    assert out["embedding_norm_range"]["violations"] == 1
    assert all(not r["passed"] for r in out.values())

    clean = check_embedding_constraints(
        df.filter("vec_id = 1"), dim=3, norm_min=0.5, norm_max=2.0
    ).collect()
    assert all(r["passed"] for r in clean)


def test_pack_documents_grouped(spark):
    """Per-group packing: pack_id restarts per group, NULL groups pack
    together, overfill stays within a group, ungrouped behavior is
    unchanged."""
    from pyspark_data_drift_detector_spark.operators.text import (
        pack_documents,
    )

    # a doc starts in the pack where its exclusive prefix lands (budget 4)
    df = spark.createDataFrame(
        [
            (1, "a", "w1 w2 w3 w4 w5"),   # a: prefix 0 -> pack 0
            (2, "a", "w1"),               # a: prefix 5 -> pack 1
            (3, "b", "w1"),               # b: prefix 0 -> pack 0 (restart)
            (4, None, "w1 w2 w3 w4 w5"),  # NULL group: prefix 0 -> pack 0
            (5, None, "w1"),              # NULL: prefix 5 -> pack 1
        ],
        "doc_id long, grp string, text string",
    )
    out = {r["doc_id"]: r for r in pack_documents(
        df, budget=4, group_col="grp").collect()}
    assert out[1]["pack_id"] == 0 and out[2]["pack_id"] == 1
    assert out[3]["pack_id"] == 0 and out[3]["grp"] == "b"
    assert out[4]["grp"] is None and out[4]["pack_id"] == 0
    assert out[5]["grp"] is None and out[5]["pack_id"] == 1

    ungrouped = {r["doc_id"]: r["pack_id"]
                 for r in pack_documents(df, budget=4).collect()}
    # global contiguous fill: prefixes 0,5,6,7,12 -> packs 0,1,1,1,3
    assert ungrouped == {1: 0, 2: 1, 3: 1, 4: 1, 5: 3}


# ------------------------------------------------- round-11 wave-4 ops


def test_fuzzy_pairs_hand_checked(spark):
    from pyspark_data_drift_detector_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "The quick brown fox jumps over the lazy dot"),  # 1 edit
            (3, "Xhe quick brown fox jumps over the lazy dog"),  # prefix edit
            (4, "completely different text about spark engines"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.id1, r.id2): r for r in fuzzy_pairs(df).collect()}
    # the typo twin pairs with its source at distance 1
    assert (1, 2) in rows and rows[(1, 2)].distance == 1
    # documented blocking recall caveat: an edit inside the prefix moves
    # the doc to another block, so (1,3) is NOT a candidate
    assert (1, 3) not in rows
    # unrelated text never pairs
    assert not any(4 in k for k in rows)


def test_fuzzy_pairs_block_cap_and_window(spark):
    from pyspark_data_drift_detector_spark.operators.dedup import fuzzy_pairs

    base = "same prefix here with body variant number %d and padding"
    df = spark.createDataFrame(
        [(i, base % i) for i in range(3)], "doc_id long, text string"
    )
    # all three share the block; uncapped they all pair up
    assert fuzzy_pairs(df, max_distance=2).count() == 3
    # a hot-block cap of 2 drops the whole 3-doc block (bounded recall,
    # same semantics as max_shingle_df)
    assert fuzzy_pairs(df, max_distance=2, max_block_size=2).count() == 0
    # the comparison window bounds cost: distances beyond compare_len
    # chars are invisible by design
    long_a = "prefix00 " + "x" * 300
    long_b = "prefix00 " + "x" * 290 + "yyyyyyyyyy"
    df2 = spark.createDataFrame(
        [(10, long_a), (11, long_b)], "doc_id long, text string"
    )
    got = fuzzy_pairs(df2, compare_len=200, band_width=1000).collect()
    assert len(got) == 1 and got[0].distance == 0


def test_cube_profile_hand_checked(spark):
    from pyspark_data_drift_detector_spark.operators.groups import cube_profile

    df = spark.createDataFrame(
        [
            ("a", "x", 1.0),
            ("a", "y", 2.0),
            ("b", "x", 4.0),
            ("b", None, 8.0),
        ],
        "d1 string, d2 string, v double",
    )
    out = cube_profile(df, ["d1", "d2"], "v")
    rows = {(r.d1, r.d2, r.level): r for r in out.collect()}
    # grand total: both dims aggregated away, bitmask 0b11
    gt = rows[("(all)", "(all)", 3)]
    assert gt.n == 4 and gt.sum_value == 15.0
    # one dim aggregated: level bit order is (d1 msb, d2 lsb)
    assert rows[("a", "(all)", 1)].sum_value == 3.0
    assert rows[("(all)", "x", 2)].sum_value == 5.0
    # a real NULL category at the finest level stays NULL, not "(all)"
    assert rows[("b", None, 0)].sum_value == 8.0
    # 2^2 grouping sets over this data: 4 finest + 2 d1 values + 3 d2
    # values (x, y, and the real NULL category) + 1 grand total
    assert out.count() == 10


def test_ewma_control_matches_recurrence(spark):
    import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import ewma_control

    # a stable base then a sustained +3σ-ish level shift; Phase-I μ₀/σ₀
    # come from the WHOLE series (contaminated), so the shift must be
    # large and sustained to clear the inflated band — which it does at
    # the last point (verified against the recurrence offline)
    vals = [
        10.0, 10.2, 9.9, 10.1, 10.0, 9.8, 10.2, 10.1,
        9.9, 10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.0,
    ] + [13.0] * 6
    rows = [
        (datetime.datetime(2024, 1, 1 + i, 12, 0, 0), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = ewma_control(df, lam=0.2, limit_sigma=3.0)
    got = sorted(out.collect(), key=lambda r: r.t)
    assert [r.x for r in got] == vals

    mu0 = sum(vals) / len(vals)
    z = mu0
    for r, x in zip(got, vals):
        z = 0.2 * x + 0.8 * z
        assert abs(r.z - z) < 1e-9, (r.t, r.z, z)
        # the flag is exactly the band comparison
        assert r.out_of_control == (r.z > r.ucl or r.z < r.lcl)
    # the sustained level shift at t=5..7 must push the EWMA out of band
    assert any(r.out_of_control for r in got)


def test_ewma_control_long_series_no_overflow(spark):
    """The re-anchored chunked prefix sum (ADVICE r11): at λ=0.5 the
    naive r^{-t} rescaling overflows doubles near t≈1000; a 4000-day
    series must still match the sequential recursion everywhere — the
    chunk-boundary carry (k = ⌈400/−ln r⌉ = 577 rows at λ=0.5, so this
    crosses 6 boundaries) is exercised, and no z/ucl is NaN/Inf."""
    import datetime
    import math as _math

    from pyspark_data_drift_detector_spark.operators.temporal import ewma_control

    n = 4000
    vals = [10.0 + 0.5 * _math.sin(i / 7.0) for i in range(n)]
    base = datetime.datetime(2000, 1, 1, 12, 0, 0)
    rows = [
        (base + datetime.timedelta(days=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = sorted(
        ewma_control(df, lam=0.5, limit_sigma=3.0).collect(),
        key=lambda r: r.t,
    )
    assert len(got) == n
    mu0 = sum(vals) / n
    z = mu0
    for r, x in zip(got, vals):
        z = 0.5 * x + 0.5 * z
        assert _math.isfinite(r.z) and _math.isfinite(r.ucl), r.t
        assert abs(r.z - z) < 1e-9 * max(1.0, abs(z)), (r.t, r.z, z)


def test_chi2_cell_residuals_hand_checked(spark):
    import math

    from pyspark_data_drift_detector_spark.operators.categorical_drift import (
        chi2_cell_residuals,
    )

    ref = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 10, "cat string"
    )
    curr = spark.createDataFrame(
        [("a",)] * 18 + [("b",)] * 2, "cat string"
    )
    rows = {r.value: r for r in chi2_cell_residuals(ref, curr, ["cat"]).collect()}
    # hand computation: N=40, curr row total 20, col totals a=28 b=12
    # e(a,curr) = 20*28/40 = 14; denom = sqrt(14 * (1-0.5) * (1-0.7))
    e_a = 14.0
    denom_a = math.sqrt(e_a * 0.5 * (1 - 28 / 40))
    assert abs(rows["a"].std_residual - (18 - e_a) / denom_a) < 1e-9
    # the 2-row table's residuals are symmetric: b's is a's negation
    assert abs(rows["a"].std_residual + rows["b"].std_residual) < 1e-9
    assert rows["a"].significant and rows["b"].significant
    # a single-category column has an undefined residual, not a crash
    one = spark.createDataFrame([("only",)] * 5, "solo string")
    solo = chi2_cell_residuals(one, one, ["solo"]).collect()
    assert solo[0].std_residual is None and solo[0].significant is False


def test_seasonality_drift_hand_checked(spark):
    import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        seasonality_drift,
    )

    # 2024-01-07 was a Sunday
    sun = datetime.datetime(2024, 1, 7, 9, 0, 0)
    mon = datetime.datetime(2024, 1, 8, 22, 0, 0)
    ref = spark.createDataFrame([(sun,), (mon,)], "ts timestamp")
    curr = spark.createDataFrame([(mon,), (mon,)], "ts timestamp")
    rows = {(r.grain, r.bucket): r for r in seasonality_drift(ref, curr).collect()}
    assert rows[("dow", 0)].ref_cnt == 1  # Sunday is bucket 0
    assert rows[("dow", 1)].curr_cnt == 2
    assert rows[("hour", 9)].curr_cnt == 0
    assert rows[("hour", 22)].curr_freq == 1.0
    # identical sides → every psi_term is exactly 0
    same = seasonality_drift(ref, ref)
    assert all(r.psi_term == 0.0 for r in same.collect())


def test_dedup_savings_attribution(spark):
    from pyspark_data_drift_detector_spark.operators.dedup import dedup_savings

    df = spark.createDataFrame(
        [
            (1, "origin", "alpha beta gamma"),
            (2, "origin", "alpha beta gamma"),   # in-source dup (3 tokens)
            (3, "mirror", "alpha beta gamma"),   # cross-source dup
            (4, "mirror", "unique text here now"),
        ],
        "doc_id long, source string, text string",
    )
    rows = {r.source: r for r in dedup_savings(df).collect()}
    o, m = rows["origin"], rows["mirror"]
    # survivor is min doc_id (1, in origin); copies attributed to holders
    assert (o.n_docs, o.docs_dropped, o.tokens_total, o.tokens_dropped) == (2, 1, 6, 3)
    assert (m.n_docs, m.docs_dropped, m.tokens_total, m.tokens_dropped) == (2, 1, 7, 3)
    assert abs(m.dropped_token_share - 3 / 7) < 1e-12


def test_events_drift_report_families_and_flags(spark):
    import datetime

    from pyspark_data_drift_detector_spark.events_pipeline import (
        events_drift_report,
    )

    rows = [
        (datetime.datetime(2024, 1, 1 + d, h, 0, 0), u, t, v)
        for d in range(3)
        for h, u, t, v in [
            (9, 1, "click", 1.0),
            (14, 2, "view", 2.0),
            (20, 3, "click", None),
        ]
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string, value double"
    )
    # identical sides → every drift flag false, diffs zero
    out = events_drift_report(ev, ev).collect()
    fams = {r.family for r in out}
    assert fams == {"volume", "event_mix", "seasonality"}
    assert not any(r.drift_detected for r in out)
    vol = {r.metric: r for r in out if r.family == "volume"}
    assert vol["events_per_day"].ref_value == 3.0
    assert vol["active_users"].ref_value == 3.0
    assert abs(vol["value_null_rate"].ref_value - 1 / 3) < 1e-4  # 5-dp rounded
    shares = {r.key: r for r in out if r.metric == "share"}
    assert abs(shares["click"].ref_value - 2 / 3) < 1e-4  # 5-dp rounded
    # a divergent current side must flag the mix family
    curr = ev.withColumn("event_type", F.lit("purchase"))
    out2 = events_drift_report(ev, curr).collect()
    js = [r for r in out2 if r.metric == "js_distance"][0]
    assert js.drift_detected and js.diff == 1.0


def test_seasonality_incremental_equals_batch(spark, tmp_path):
    import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        seasonality_drift,
        seasonality_incremental,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        read_seasonality_state,
        seasonality_state_sink,
    )

    rows = [
        (datetime.datetime(2024, 1, 1 + (i % 9), (7 * i) % 24, 0, 0), i)
        for i in range(60)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_id long")
    prior = ev.filter("event_id % 3 != 0")
    batch = ev.filter("event_id % 3 = 0")

    # state maintained across two micro-batch appends (the sink path)
    path = str(tmp_path / "season_state")
    sink = seasonality_state_sink(path)
    sink(prior.filter("event_id % 2 = 0"), 0)
    sink(prior.filter("event_id % 2 = 1"), 1)
    state = read_seasonality_state(spark, path)

    inc = seasonality_incremental(batch, state)
    full = seasonality_drift(prior, batch)
    key = lambda r: (r.grain, r.bucket)
    inc_rows = sorted(inc.collect(), key=key)
    full_rows = sorted(full.collect(), key=key)
    # additive counts are the sufficient statistic: EXACT equality
    assert [tuple(r) for r in inc_rows] == [tuple(r) for r in full_rows]
    assert len(inc_rows) > 0


def test_transition_stationary_matches_recurrence(spark):
    import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        transition_stationary,
    )

    # single user, sequence a a b a b a → P(a→a)=1/3, P(a→b)=2/3, P(b→a)=1
    seq = ["a", "a", "b", "a", "b", "a"]
    rows = [
        (datetime.datetime(2024, 1, 1, 0, i, 0), 1, i, t)
        for i, t in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_id long, event_type string"
    )
    got = {r.state: r for r in transition_stationary(ev, n_iter=8).collect()}

    pmat = {("a", "a"): 1 / 3, ("a", "b"): 2 / 3, ("b", "a"): 1.0}
    pi = {"a": 0.5, "b": 0.5}
    for _ in range(8):
        flow = {s: 0.0 for s in pi}
        for (p_, n_), prob in sorted(pmat.items()):
            flow[n_] += pi[p_] * prob
        tot = sum(flow.values())
        pi = {s: v / tot for s, v in flow.items()}
    assert abs(got["a"].stationary_share - pi["a"]) < 1e-12
    assert abs(got["b"].stationary_share - pi["b"]) < 1e-12
    # theoretical stationary of this chain is (3/5, 2/5); 8 renormalized
    # iterations land within |λ2|^8 of it
    assert abs(got["a"].stationary_share - 0.6) < 0.01
    assert abs(got["a"].observed_share - 4 / 6) < 1e-12
    assert abs(
        got["a"].divergence
        - abs(got["a"].stationary_share - got["a"].observed_share)
    ) < 1e-12


def test_touch_attribution_hand_checked(spark):
    import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        touch_attribution,
    )

    def ev(i, u, t):
        return (datetime.datetime(2024, 1, 1, 0, i, 0), u, i, t)

    rows = [
        ev(0, 1, "view"),
        ev(1, 1, "click"),
        ev(2, 1, "purchase"),
        ev(3, 1, "purchase"),   # prior conversions never count as touches
        ev(4, 2, "purchase"),   # no prior touch → <none>
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_id long, event_type string"
    )
    got = {
        (r.model, r.touch_type): r
        for r in touch_attribution(df, "purchase").collect()
    }
    assert got[("first_touch", "view")].conversions == 2
    assert got[("last_touch", "click")].conversions == 2
    assert got[("first_touch", "<none>")].conversions == 1
    assert got[("last_touch", "<none>")].conversions == 1
    assert abs(got[("last_touch", "click")].share - 2 / 3) < 1e-12


def test_events_vetting_sink_roundtrip(spark, tmp_path):
    import datetime

    from pyspark_data_drift_detector_spark.events_pipeline import (
        event_type_state,
        events_report_incremental,
        events_volume_state,
    )
    from pyspark_data_drift_detector_spark.operators.temporal import (
        seasonality_state,
        transition_last_state,
        transition_pair_state,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        events_vetting_sink,
    )

    types = ["view", "click", "purchase"]
    rows = [
        (
            datetime.datetime(2024, 1, 1 + i // 8, (3 * i) % 24, i % 60, 0),
            i % 7,
            i,
            types[i % 3],
        )
        for i in range(80)
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_id long, event_type string"
    )
    b1 = ev.filter("event_id < 40")
    b2 = ev.filter("event_id >= 40")

    paths = {k: str(tmp_path / k) for k in
             ("vol", "typ", "sea", "pairs", "last", "report")}
    sink = events_vetting_sink(
        paths["vol"], paths["typ"], paths["sea"],
        paths["pairs"], paths["last"], paths["report"],
    )
    sink(b1, 0)
    # bootstrap: states seeded, NO report yet
    import pytest as _pytest
    from pyspark.sql.utils import AnalysisException

    with _pytest.raises(AnalysisException):
        spark.read.parquet(paths["report"])

    sink(b2, 1)
    report = spark.read.parquet(paths["report"])
    assert set(r.family for r in report.collect()) == {
        "volume", "event_mix", "seasonality", "transitions"
    }
    assert report.filter("batch_id = 1").count() == report.count()

    # the sink's report equals the directly composed increment report
    direct = events_report_incremental(
        b2,
        events_volume_state(b1),
        event_type_state(b1),
        seasonality_state(b1),
        transition_pair_state(b1),
        transition_last_state(b1),
    )
    key = lambda r: (r.family, r.key, r.metric)
    got = sorted(report.drop("batch_id").collect(), key=key)
    want = sorted(direct.collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # state invariant: rolled pair counts == full-stream transition counts
    rolled = {
        (r.prev_type, r.next_type): r.n
        for r in spark.read.parquet(paths["pairs"])
        .groupBy("prev_type", "next_type")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    full = {
        (r.prev_type, r.next_type): r.n
        for r in transition_pair_state(ev).collect()
    }
    assert rolled == full


def test_wave46_invariants_randomized(spark):
    """Seeded randomized invariants for the round-11 wave-4/5/6 ops —
    the Spark-side complement of test_properties.py (hypothesis over
    Spark jobs is too slow; one seeded sweep pins the same algebra)."""
    import datetime
    import random

    from pyspark_data_drift_detector_spark.operators.dedup import dedup_savings
    from pyspark_data_drift_detector_spark.operators.groups import cube_profile
    from pyspark_data_drift_detector_spark.operators.temporal import (
        ewma_control,
        touch_attribution,
    )

    rng = random.Random(61)

    # cube_profile: every aggregation level must total the grand total
    rows = [
        (rng.choice(["a", "b", "c"]), rng.choice(["x", "y"]),
         rng.uniform(0, 100))
        for _ in range(200)
    ]
    cp = cube_profile(
        spark.createDataFrame(rows, "d1 string, d2 string, v double"),
        ["d1", "d2"],
        "v",
    ).collect()
    by_level = {}
    for r in cp:
        by_level.setdefault(r.level, []).append(r)
    grand = by_level[3][0]
    assert grand.n == 200
    for lvl in (0, 1, 2):
        assert sum(r.n for r in by_level[lvl]) == grand.n, lvl
        assert abs(sum(r.sum_value for r in by_level[lvl])
                   - grand.sum_value) < 1e-6, lvl

    # ewma_control: z is a convex combination of {mu0} ∪ series → bounded
    vals = [rng.uniform(-50, 50) for _ in range(40)]
    ev = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1) +
          datetime.timedelta(days=i), v) for i, v in enumerate(vals)],
        "ts timestamp, value double",
    )
    ew = ewma_control(ev).collect()
    mu0 = sum(vals) / len(vals)
    lo, hi = min(vals + [mu0]), max(vals + [mu0])
    assert all(lo - 1e-9 <= r.z <= hi + 1e-9 for r in ew)

    # dedup_savings: dropped mass is total minus distinct content keys
    texts = [rng.choice(["t one", "t two", "t three", "t four"])
             for _ in range(120)]
    docs = spark.createDataFrame(
        [(i, rng.choice(["s1", "s2", "s3"]), t)
         for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    sav = dedup_savings(docs).collect()
    assert sum(r.docs_dropped for r in sav) == 120 - len(set(texts))
    assert all(0 <= r.tokens_dropped <= r.tokens_total for r in sav)

    # touch_attribution: each model's conversions total the conversion count
    evs = [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
         rng.randrange(9), i, rng.choice(["view", "click", "buy"]))
        for i in range(150)
    ]
    edf = spark.createDataFrame(
        evs, "ts timestamp, user_id long, event_id long, event_type string"
    )
    n_conv = sum(1 for e in evs if e[3] == "buy")
    ta = touch_attribution(edf, "buy").collect()
    for model in ("first_touch", "last_touch"):
        assert sum(r.conversions for r in ta if r.model == model) == n_conv
        assert abs(sum(r.share for r in ta if r.model == model) - 1.0) < 1e-9


def test_events_vetting_sink_via_real_stream(spark, tmp_path):
    """The sink through ACTUAL Structured Streaming machinery
    (readStream → foreachBatch, availableNow) — not just direct calls:
    per-file micro-batches must bootstrap on the first and vet every
    subsequent one against the rolled state."""
    import datetime

    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        events_vetting_sink,
    )

    types = ["view", "click", "purchase"]
    rows = [
        (
            datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
            i % 5,
            i,
            types[i % 3],
        )
        for i in range(60)
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_id long, event_type string"
    )
    ingest = tmp_path / "ev_ingest"
    # two files → two deterministic time-ordered micro-batches
    ev.filter("event_id < 30").coalesce(1).write.parquet(
        str(ingest), mode="append"
    )
    ev.filter("event_id >= 30").coalesce(1).write.parquet(
        str(ingest), mode="append"
    )
    paths = {k: str(tmp_path / k) for k in
             ("vol", "typ", "sea", "pairs", "last", "report")}
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ingest))
        .writeStream.foreachBatch(
            events_vetting_sink(
                paths["vol"], paths["typ"], paths["sea"],
                paths["pairs"], paths["last"], paths["report"],
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    report = spark.read.parquet(paths["report"])
    # exactly one vetted (non-bootstrap) batch produced report rows
    assert report.select("batch_id").distinct().count() == 1
    assert {r.family for r in report.collect()} == {
        "volume", "event_mix", "seasonality", "transitions"
    }
    # states carry the whole stream after both batches
    vol = spark.read.parquet(paths["vol"])
    assert vol.groupBy().sum("n").collect()[0][0] == 60


def test_transition_stationary_absorbing_and_null_types(spark):
    """Review-fix pins: a pure funnel (absorbing chain) must not divide
    by zero — terminal states get the implicit self-loop and absorb all
    mass; NULL event types are valid states (null-safe joins, null-safe
    sort)."""
    import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        transition_stationary,
    )

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "ts timestamp, user_id long, event_id long, event_type string",
        )

    t0 = datetime.datetime(2024, 1, 1)

    # plain A→B→C funnel for three users: C is terminal
    funnel = mk([
        (t0 + datetime.timedelta(minutes=3 * u + i), u, 3 * u + i, t)
        for u in range(3)
        for i, t in enumerate(["view", "cart", "purchase"])
    ])
    got = {r.state: r for r in transition_stationary(funnel, n_iter=20).collect()}
    assert set(got) == {"view", "cart", "purchase"}
    # all mass absorbs into the terminal state
    assert got["purchase"].stationary_share > 0.99
    assert abs(sum(r.stationary_share for r in got.values()) - 1.0) < 1e-9

    # NULL event type participates as a real state, no crash
    withnull = mk([
        (t0 + datetime.timedelta(minutes=i), 1, i, t)
        for i, t in enumerate(["a", None, "a", None, "a"])
    ])
    got2 = {r.state: r for r in transition_stationary(withnull).collect()}
    assert set(got2) == {"a", None}
    assert abs(got2[None].observed_share - 2 / 5) < 1e-9
    assert abs(sum(r.stationary_share for r in got2.values()) - 1.0) < 1e-9


def test_events_report_null_type_and_null_ts_alignment(spark):
    """Review-fix pins: NULL event types align into ONE '<null>' mix row
    (null-safe panel join), NULL timestamps into one NULL seasonal
    bucket — identical sides must show zero drift everywhere."""
    import datetime

    from pyspark_data_drift_detector_spark.events_pipeline import (
        events_drift_report,
    )

    t0 = datetime.datetime(2024, 1, 1, 9, 0, 0)
    ev = spark.createDataFrame(
        [
            (t0, 1, "click", 1.0),
            (t0, 2, None, 2.0),
            (None, 3, None, 3.0),
        ],
        "ts timestamp, user_id long, event_type string, value double",
    )
    out = events_drift_report(ev, ev).collect()
    assert not any(r.drift_detected for r in out)
    null_rows = [r for r in out if r.metric == "share" and r.key == "<null>"]
    assert len(null_rows) == 1, "NULL type must be ONE aligned panel row"
    assert abs(null_rows[0].ref_value - 2 / 3) < 1e-4
    js = [r for r in out if r.metric == "js_distance"][0]
    assert js.diff == 0.0


def test_events_vetting_sink_migration_keeps_stitch(spark, tmp_path):
    """Review-fix pin: when transition state already exists but another
    state is missing (migration from transition_vetting_sink), the pair
    advance must still route through the stitched panel — the exact
    full-stream count invariant survives, and no report is written."""
    import datetime

    import pytest as _pytest
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.temporal import (
        transition_last_state,
        transition_pair_state,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        events_vetting_sink,
    )

    types = ["a", "b", "c"]
    rows = [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
         i % 4, i, types[i % 3])
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_id long, event_type string"
    )
    b1, b2 = ev.filter("event_id < 20"), ev.filter("event_id >= 20")
    paths = {k: str(tmp_path / k) for k in
             ("vol", "typ", "sea", "pairs", "last", "report")}
    # migration scenario: ONLY the transition states exist (seeded by a
    # prior transition_vetting_sink deployment)
    transition_pair_state(b1).write.parquet(paths["pairs"])
    transition_last_state(b1).write.parquet(paths["last"])

    sink = events_vetting_sink(
        paths["vol"], paths["typ"], paths["sea"],
        paths["pairs"], paths["last"], paths["report"],
    )
    sink(b2, 7)
    # no report (volume/type/season states were absent)...
    with _pytest.raises(AnalysisException):
        spark.read.parquet(paths["report"])
    # ...but the stitched pairs were NOT lost
    rolled = {
        (r.prev_type, r.next_type): r.n
        for r in spark.read.parquet(paths["pairs"])
        .groupBy("prev_type", "next_type").agg(F.sum("n").alias("n"))
        .collect()
    }
    full = {
        (r.prev_type, r.next_type): r.n
        for r in transition_pair_state(ev).collect()
    }
    assert rolled == full


def test_alignment_cosines_guards_and_values(spark):
    """Hand-checked per-pair cosines plus every guard: NULL vector,
    zero-norm vector, and a dimension mismatch (zip_with NULL-pads) all
    yield NULL — never NaN or an ANSI error."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        alignment_cosines,
    )

    rows = [
        (1, [1.0, 0.0], [1.0, 0.0]),     # identical -> 1.0
        (2, [1.0, 0.0], [0.0, 1.0]),     # orthogonal -> 0.0
        (3, [1.0, 0.0], [-1.0, 0.0]),    # opposite -> -1.0
        (4, None, [1.0, 0.0]),           # NULL image -> NULL
        (5, [0.0, 0.0], [1.0, 0.0]),     # zero norm -> NULL
        (6, [1.0, 0.0, 0.0], [1.0, 0.0]),  # dim mismatch -> NULL
    ]
    df = spark.createDataFrame(
        rows,
        "pair_id long, image_embedding array<double>,"
        " text_embedding array<double>",
    )
    got = [
        r.alignment_cosine
        for r in alignment_cosines(df.orderBy("pair_id")).collect()
    ]
    assert got[0] == 1.0 and got[1] == 0.0 and got[2] == -1.0
    assert got[3] is None and got[4] is None and got[5] is None


def test_alignment_drift_detects_encoder_swap(spark):
    """A curr side whose image embeddings decorrelate from the text
    embeddings must trip drift_detected on the alignment_cosine row;
    identical sides must not."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        alignment_drift,
    )

    import math as _math

    def mk(n, w_self):
        rows = []
        for i in range(n):
            t = [_math.sin(i + j / 7.0) for j in range(8)]
            img = [w_self * a + (1 - w_self) * b
                   for a, b in zip(t, reversed(t))]
            rows.append((t, img))
        return spark.createDataFrame(
            rows, "text_embedding array<double>, image_embedding array<double>"
        )

    out = alignment_drift(mk(64, 0.95), mk(64, 0.3)).collect()
    assert len(out) == 1 and out[0].column_name == "alignment_cosine"
    assert out[0].drift_detected and out[0].drift_score > 0.1
    same = alignment_drift(mk(64, 0.95), mk(64, 0.95)).collect()
    assert not same[0].drift_detected and same[0].drift_score == 0.0
