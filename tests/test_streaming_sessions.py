"""Streaming sessionization + ingest-dedup end-to-end tests (memory sink,
availableNow trigger), mirroring test_similarity_streaming's pattern:
every finalized streaming row must match the batch twin."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from pyspark_data_drift_detector_spark.operators.temporal import sessionize
from pyspark_data_drift_detector_spark.sources.snapshot import load_events
from pyspark_data_drift_detector_spark.streaming.sessions import (
    stream_dedup,
    stream_sessionize,
)


def _stage_stream_dir(sf_dir, tmp_path, copies=1):
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    for i in range(copies):
        shutil.copy(f"{sf_dir}/events.parquet", stream_dir / f"part-{i}.parquet")
    return str(stream_dir)


def test_stream_sessionize_matches_batch(spark, sf_dir, tmp_path):
    path = _stage_stream_dir(sf_dir, tmp_path)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    sdf = stream_sessionize(spark, path, schema=schema, gap="4 hours")
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["duration_sec"])
        for r in spark.sql("SELECT * FROM sessions_test").collect()
    }
    assert len(stream_rows) > 0
    batch_rows = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["duration_sec"])
        for r in sessionize(load_events(spark, sf_dir), gap="4 hours").collect()
    }
    # append mode holds back sessions the watermark hasn't closed — the
    # final (still-open) sessions are legitimately absent; everything
    # emitted must match the batch twin exactly
    assert set(stream_rows).issubset(set(batch_rows))
    assert len(stream_rows) >= len(batch_rows) * 0.5
    for key, vals in stream_rows.items():
        assert batch_rows[key] == vals


def test_stream_dedup_drops_redeliveries(spark, sf_dir, tmp_path):
    # the same file staged twice = an at-least-once source re-delivering
    # every event; the 30-day watermark covers the full event range, so
    # nothing is evicted or late-dropped mid-run
    path = _stage_stream_dir(sf_dir, tmp_path, copies=2)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    sdf = stream_dedup(spark, path, schema=schema, watermark="30 days")
    q = (
        sdf.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT event_id FROM dedup_test")
    n_distinct_out = out.distinct().count()
    n_out = out.count()
    n_src = load_events(spark, sf_dir).select("event_id").distinct().count()
    assert n_out == n_distinct_out  # no duplicate survived
    assert n_out == n_src  # every unique event survived


def test_streaming_cusum_matches_batch(spark, sf_dir, tmp_path):
    """Streaming CUSUM over the events file (availableNow, one batch)
    equals the batch cusum_changepoint scan with the SAME baseline —
    per-key maxima, alarm flags, and first-alarm timestamps."""
    import shutil

    from pyspark.sql import functions as F

    from pyspark_data_drift_detector_spark.operators.temporal import cusum_changepoint
    from pyspark_data_drift_detector_spark.sources.snapshot import load_events
    from pyspark_data_drift_detector_spark.streaming.profiles import stateful_cusum

    ev = load_events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    baseline = ev.groupBy("user_id").agg(
        F.mean("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    batch = {
        r["user_id"]: r
        for r in cusum_changepoint(
            ev, tiebreak_col="event_id", k=0.5, h=3.0, baseline=baseline
        ).collect()
    }

    stream_dir = tmp_path / "cusum_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-0.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(stream_dir))
        .select("event_id", "user_id", "ts", "value")
    )
    out = stateful_cusum(stream, baseline, k=0.5, h=3.0)
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r for r in spark.sql("SELECT * FROM cusum_test").collect()}

    assert set(got) == set(batch)
    for uid, b in batch.items():
        s = got[uid]
        assert s["n"] == b["n"], uid
        assert abs(s["max_cusum_pos"] - b["max_cusum_pos"]) < 1e-9, uid
        assert abs(s["max_cusum_neg"] - b["max_cusum_neg"]) < 1e-9, uid
        assert s["alarm"] == b["alarm"], uid
        assert s["first_alarm_ts"] == b["first_alarm_ts"], uid


def test_streaming_heavy_hitters_matches_batch(spark, sf_dir, tmp_path):
    """windowed_heavy_hitters over a readStream (availableNow) equals the
    batch run on the same events — the sketch aggregate merges across
    micro-batch partials like any windowed agg."""
    import shutil

    from pyspark_data_drift_detector_spark.sources.snapshot import load_events
    from pyspark_data_drift_detector_spark.streaming.profiles import (
        windowed_heavy_hitters,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch = {
        (r["window_start"], r["item"]): r["count_estimate"]
        for r in windowed_heavy_hitters(load_events(spark, sf_dir), k=10).collect()
    }

    stream_dir = tmp_path / "hh_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-0.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(str(stream_dir))
    out = windowed_heavy_hitters(stream, k=10)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["item"]): r["count_estimate"]
        for r in spark.sql("SELECT * FROM hh_test").collect()
    }
    assert got == batch and len(got) > 0


def test_streaming_windowed_distinct_matches_batch(spark, sf_dir, tmp_path):
    """windowed_distinct on a readStream equals the batch run — HLL++
    registers merge order-independently across micro-batches."""
    import shutil

    from pyspark_data_drift_detector_spark.sources.snapshot import load_events
    from pyspark_data_drift_detector_spark.streaming.profiles import windowed_distinct

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch = {
        r["window_start"]: (r["n_events"], r["distinct_estimate"])
        for r in windowed_distinct(load_events(spark, sf_dir)).collect()
    }
    stream_dir = tmp_path / "wd_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-0.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(str(stream_dir))
    q = (
        windowed_distinct(stream)
        .writeStream.format("memory")
        .queryName("wd_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: (r["n_events"], r["distinct_estimate"])
        for r in spark.sql("SELECT * FROM wd_test").collect()
    }
    assert got == batch and len(got) > 0


def test_state_table_sink_end_to_end(spark, sf_dir, tmp_path):
    """Streaming ingest -> appended state tables -> windowed drift with
    no re-scan: the streamed states must equal batch-built states, and
    detect_drift_incremental over them must run green, including the
    multi-append-per-partition case."""
    import shutil

    from pyspark_data_drift_detector_spark.operators.mergeable import (
        merge_profiles,
        partitioned_profile,
    )
    from pyspark_data_drift_detector_spark.pipeline import detect_drift_incremental
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        read_state_tables,
        state_table_sink,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream_dir = tmp_path / "ingest"
    stream_dir.mkdir()
    # two files -> (with maxFilesPerTrigger=1) two micro-batches, so one
    # partition_id accumulates MULTIPLE appended state rows
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "b.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    sink = state_table_sink(
        ["value"],
        ["event_type"],
        "pmod(dayofmonth(ts), 2)",
        str(tmp_path / "prof"),
        str(tmp_path / "cats"),
        quantile_path=str(tmp_path / "quants"),
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)

    prof, cats, quants = read_state_tables(
        spark, str(tmp_path / "prof"), str(tmp_path / "cats"),
        str(tmp_path / "quants"),
    )
    # doubled ingest == batch states over the doubled frame
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    doubled = ev.unionByName(ev)
    want = {
        r["column_name"]: r
        for r in merge_profiles(
            partitioned_profile(doubled, ["value"], "pmod(dayofmonth(ts), 2)")
        ).collect()
    }
    got = {r["column_name"]: r for r in merge_profiles(prof).collect()}
    assert got.keys() == want.keys()
    for c in got:
        assert got[c]["n"] == want[c]["n"]
        assert got[c]["mean"] == pytest.approx(want[c]["mean"], rel=1e-12)
        assert got[c]["stddev"] == pytest.approx(want[c]["stddev"], rel=1e-9)

    out = detect_drift_incremental(
        prof, cats, ["0"], ["1"], quantile_state=quants
    ).collect()
    assert {r["column_name"] for r in out} == {"value", "event_type"}
    for r in out:
        assert r["drift_score"] is not None


def test_rollup_state_sink_matches_batch_rollup(spark, sf_dir, tmp_path):
    """Continuous-aggregate twin of rollup_timeseries: micro-batches
    append hour-level additive state (DECIMAL-exact sums); merging the
    appended table and cascading hour->day must equal the batch
    rollup_timeseries over the full stream history ROW-FOR-ROW — means
    and stddevs bit-equal, because the state algebra is identical and
    decimal sums are associative."""
    import shutil

    from pyspark_data_drift_detector_spark.operators.temporal import (
        rollup_timeseries,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        read_rollup_state,
        rollup_state_sink,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream_dir = tmp_path / "rollup_ingest"
    stream_dir.mkdir()
    # two identical files -> two micro-batches, so every hour bucket
    # accumulates TWO appended state rows that must merge exactly
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "b.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    sink = rollup_state_sink(str(tmp_path / "rollup_state"))
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)

    def keyed(rows):
        return {
            (r["granularity"], r["bucket_start"], r["event_type"]): (
                r["n_rows"], r["n"], r["mean"], r["stddev"], r["min"], r["max"]
            )
            for r in rows
        }

    streamed = keyed(
        read_rollup_state(
            spark, str(tmp_path / "rollup_state"),
            granularities=("hour", "day"),
        ).collect()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = keyed(
        rollup_timeseries(
            ev.unionByName(ev), granularities=("hour", "day")
        ).collect()
    )
    assert streamed.keys() == batch.keys() and len(streamed) > 0
    for k in streamed:
        assert streamed[k] == batch[k], (k, streamed[k], batch[k])

    with pytest.raises(ValueError, match="coarsening"):
        read_rollup_state(
            spark, str(tmp_path / "rollup_state"), granularities=("day", "hour")
        )


def test_completeness_state_sink_matches_batch(spark, sf_dir, tmp_path):
    """Streaming twin of completeness_timeseries: micro-batches append
    additive (n_rows, n_null) state; merging the appended table must
    equal the batch panel over the full stream history ROW-FOR-ROW."""
    import shutil

    from pyspark_data_drift_detector_spark.operators.temporal import (
        completeness_timeseries,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        completeness_state_sink,
        read_completeness_state,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream_dir = tmp_path / "completeness_ingest"
    stream_dir.mkdir()
    # two identical files -> two micro-batches: every day bucket gets TWO
    # state rows that must merge to doubled counts
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "b.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    cols = ["user_id", "event_type", "value"]
    sink = completeness_state_sink(
        str(tmp_path / "completeness_state"), "ts", cols
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)

    def keyed(rows):
        return {
            (r["bucket_start"], r["column_name"]): (
                r["n_rows"], r["n_null"], r["null_ratio"]
            )
            for r in rows
        }

    streamed = keyed(
        read_completeness_state(
            spark, str(tmp_path / "completeness_state")
        ).collect()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = keyed(
        completeness_timeseries(ev.unionByName(ev), "ts", cols).collect()
    )
    assert streamed == batch and len(streamed) > 0


def test_rollup_state_overflow_and_grain_guards(spark, tmp_path):
    """The DECIMAL(38,10) carry's magnitude envelope must fail LOUD:
    a value with v*v outside the decimal range raises instead of being
    silently dropped from the sums. Reading state coarser than the
    requested first granularity raises; state finer than requested is
    re-truncated and merges to the exact coarser answer."""
    from datetime import datetime

    from pyspark_data_drift_detector_spark.operators.temporal import (
        rollup_state,
        rollup_timeseries,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        read_rollup_state,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    big = spark.createDataFrame(
        [
            (datetime(2024, 5, 1, 3), "a", 2.5e14),  # v*v = 6.25e28 > 1e28
            (datetime(2024, 5, 1, 3), "a", 1.0),
        ],
        "ts timestamp, event_type string, value double",
    )
    with pytest.raises(Exception, match="DECIMAL\\(38,10\\) envelope"):
        rollup_timeseries(big, granularities=("hour",)).collect()
    st = rollup_state(big, "ts", ["event_type"], "value", "hour").collect()
    assert st[0]["n_overflow"] == 1 and st[0]["state_granularity"] == "hour"

    ok = spark.createDataFrame(
        [
            (datetime(2024, 5, 1, 3), "a", 10.0),
            (datetime(2024, 5, 1, 9), "a", 30.0),
            (datetime(2024, 5, 2, 3), "b", 5.0),
        ],
        "ts timestamp, event_type string, value double",
    )
    path = str(tmp_path / "grain_state")
    rollup_state(ok, "ts", ["event_type"], "value", "hour").write.parquet(path)

    # finer-than-requested state re-truncates: day panel from hour state
    # equals the direct day rollup
    def keyed(rows):
        return {
            (r["granularity"], r["bucket_start"], r["event_type"]): (
                r["n_rows"], r["n"], r["mean"], r["stddev"], r["min"], r["max"]
            )
            for r in rows
        }

    from_hour_state = keyed(
        read_rollup_state(spark, path, granularities=("day", "month")).collect()
    )
    direct = keyed(
        rollup_timeseries(ok, granularities=("day", "month")).collect()
    )
    assert from_hour_state == direct and len(from_hour_state) > 0

    # coarser-than-requested state raises instead of mislabeling
    day_path = str(tmp_path / "day_state")
    rollup_state(ok, "ts", ["event_type"], "value", "day").write.parquet(day_path)
    with pytest.raises(Exception, match="coarser than the requested"):
        read_rollup_state(spark, day_path, granularities=("hour", "day")).collect()


def test_benford_state_sink_matches_batch(spark, sf_dir, tmp_path):
    """Streaming twin of benford_deviation: micro-batch digit states
    merge to the batch panel row-for-row."""
    from pyspark_data_drift_detector_spark.operators.distribution import (
        benford_deviation,
    )
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        benford_state_sink,
        read_benford_state,
    )

    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    stream_dir = tmp_path / "benford_ingest"
    src.repartition(3).write.parquet(str(stream_dir))  # several micro-batches
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    cols = ["l_quantity", "l_extendedprice", "l_tax"]
    sink = benford_state_sink(str(tmp_path / "benford_state"), cols)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)

    def keyed(rows):
        return {
            r["column_name"]: (
                r["n"], r["n_skipped"],
                round(r["tvd"], 9), round(r["max_dev"], 9),
                round(r["chi2_stat"], 6),
            )
            for r in rows
        }

    streamed = keyed(
        read_benford_state(spark, str(tmp_path / "benford_state")).collect()
    )
    batch = keyed(benford_deviation(src, cols).collect())
    assert streamed == batch and len(streamed) == 3


def test_seasonal_anomalies_dow_baseline(spark):
    """Same-dow scoring: a weekend-dip pattern present in both periods is
    NOT an anomaly; a Monday that breaks its own Mondays' baseline is.
    Degenerate baselines (one bucket / zero spread) yield NULL z."""
    from datetime import datetime, timedelta

    from pyspark_data_drift_detector_spark.operators.temporal import (
        seasonal_anomalies,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = datetime(2024, 1, 1)  # a Monday
    rows_ref, rows_curr = [], []
    # 4 ref weeks + 2 curr weeks: weekdays ~100 (jittered), weekends ~20
    for w in range(6):
        for d in range(7):
            day = base + timedelta(days=w * 7 + d)
            level = 20.0 if d >= 5 else 100.0
            jitter = 1.0 * ((w + d) % 3)  # spread so stddev > 0
            target = rows_ref if w < 4 else rows_curr
            for i in range(5):
                target.append((day + timedelta(hours=i), level + jitter))
    # week 6 Monday breaks its baseline hard
    rows_curr = [
        (ts, 500.0) if ts.date() == (base + timedelta(days=35)).date() else (ts, v)
        for ts, v in rows_curr
    ]
    ref = spark.createDataFrame(rows_ref, "ts timestamp, value double")
    curr = spark.createDataFrame(rows_curr, "ts timestamp, value double")
    out = {
        r["bucket_start"].date(): r
        for r in seasonal_anomalies(ref, curr).collect()
    }
    broken_monday = (base + timedelta(days=35)).date()
    normal_saturday = (base + timedelta(days=33)).date()
    assert out[broken_monday]["anomaly"]
    assert out[broken_monday]["dow"] == 1  # Monday, 0=Sunday
    # the weekend dip matches its own baseline: no anomaly
    assert not out[normal_saturday]["anomaly"]
    assert abs(out[normal_saturday]["z_score"]) < 3.0
    assert out[normal_saturday]["expected_mean"] < 25.0

    # one-bucket baseline -> NULL z, NULL anomaly (flagged, not faked)
    tiny_ref = spark.createDataFrame(rows_ref[:5], "ts timestamp, value double")
    tiny = seasonal_anomalies(tiny_ref, curr).collect()
    mondays = [r for r in tiny if r["dow"] == 1]
    assert mondays and all(r["z_score"] is None and r["anomaly"] is None
                           for r in mondays)

    with pytest.raises(ValueError, match="unknown date_trunc"):
        seasonal_anomalies(ref, curr, granularity="fortnight")


def test_seasonal_anomalies_from_state_parity(spark, sf_dir, tmp_path):
    """The state-fed seasonal monitor equals the raw-event monitor
    row-for-row when the state was maintained by micro-batch appends and
    the split is a time boundary."""
    from pyspark_data_drift_detector_spark.operators.temporal import (
        rollup_state,
        seasonal_anomalies,
        seasonal_anomalies_from_state,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "ts", "value", "event_type"
    )
    split = ev.selectExpr(
        "date_format(date_trunc('day', min(ts)) + INTERVAL 14 DAYS,"
        " 'yyyy-MM-dd HH:mm:ss') AS s"
    ).collect()[0]["s"]
    # two appends (full table twice) -> duplicate state rows must merge
    path = str(tmp_path / "seasonal_state")
    st = rollup_state(ev, "ts", ["event_type"], "value", "hour")
    st.write.parquet(path)
    st.write.mode("append").parquet(path)

    def keyed(rows):
        return {
            r["bucket_start"]: (
                r["dow"], r["n_rows"],
                None if r["bucket_mean"] is None else round(r["bucket_mean"], 9),
                r["n_baseline_buckets"],
                None if r["z_score"] is None else round(r["z_score"], 9),
                r["anomaly"],
            )
            for r in rows
        }

    from_state = keyed(
        seasonal_anomalies_from_state(
            spark.read.parquet(path), split
        ).collect()
    )
    # doubled ingest doubles n_rows but not the means: compare against the
    # doubled raw events
    ev2 = ev.unionByName(ev)
    raw = keyed(
        seasonal_anomalies(
            ev2.where(f"ts < TIMESTAMP '{split}'"),
            ev2.where(f"ts >= TIMESTAMP '{split}'"),
        ).collect()
    )
    assert from_state == raw and len(from_state) > 0
