"""Structured Streaming profiles: windowed per-key statistics with late data.

Beyond the reference's surface (it has NO streaming — SURVEY §2.10); this
feeds the same profile schema from an unbounded source. The transformation
is a pure function of a DataFrame, so the SAME code path serves batch
(oracle-checkable) and streaming (``readStream`` + watermark) inputs —
the recommended Spark pattern for testable streaming logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def windowed_profile(
    df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    keys: list[str] | None = None,
    value_col: str = "value",
    slide_duration: str | None = None,
) -> DataFrame:
    """Tumbling- or sliding-window stats per key: count, nulls, mean,
    stddev, min, max.

    Works unchanged on batch or streaming input. Window starts are
    epoch-aligned (Spark ``window()`` semantics), matching
    ``date_trunc('hour', ts)`` for 1-hour windows in the DuckDB oracle.
    ``slide_duration`` < ``window_duration`` gives overlapping windows —
    each event lands in ``window/slide`` of them (Spark replicates rows
    before the aggregate; state is O(active windows × keys) either way).
    """
    keys = keys if keys is not None else ["event_type"]
    v = F.col(value_col)
    if slide_duration is not None:
        w = F.window(F.col(ts_col), window_duration, slide_duration)
    else:
        w = F.window(F.col(ts_col), window_duration)
    grouped = df.groupBy(w.alias("w"), *keys)
    return grouped.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.isNull().cast("long")).alias("null_count"),
        F.avg(v).alias("mean"),
        F.stddev(v).alias("stddev"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        "n",
        "null_count",
        "mean",
        "stddev",
        "min",
        "max",
    )


def stream_windowed_profile(
    spark: SparkSession,
    source_path: str,
    schema: str | None = None,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    value_col: str = "value",
    slide_duration: str | None = None,
) -> DataFrame:
    """Streaming variant: parquet file source → watermark → windowed agg.

    The watermark bounds state: windows older than (max event time −
    watermark) are finalized and evicted, so state size is O(active windows
    × keys) regardless of stream length. Returns the streaming DataFrame —
    callers attach a sink, e.g.::

        q = (stream_windowed_profile(spark, path)
             .writeStream.format("memory").queryName("profiles")
             .outputMode("append")
             .trigger(availableNow=True).start())
    """
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.parquet(source_path)
    ts_type = dict(stream.dtypes).get(ts_col)
    if ts_type == "bigint":
        # older harness events carry nanosecond-epoch longs (see sources.load_events)
        stream = stream.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    elif ts_type is not None and ts_type != "timestamp":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    stream = stream.withWatermark(ts_col, watermark)
    return windowed_profile(stream, ts_col, window_duration, keys, value_col, slide_duration)


RUNNING_PROFILE_OUTPUT_SCHEMA = (
    "event_type string, n long, null_count long, mean double, stddev double, "
    "min double, max double, batches long"
)
_RUNNING_PROFILE_STATE_SCHEMA = (
    "n long, null_count long, mean double, m2 double, min double, max double, batches long"
)


def _running_profile_update(key, pdfs, state):
    """applyInPandasWithState update function: merge each micro-batch into the
    per-key running profile with Chan's parallel variance formula (exact —
    the merged (n, mean, M2) equals a single-pass computation over all rows
    ever seen, so the streaming answer converges to the batch answer)."""
    import pandas as pd

    (event_type,) = key
    n, null_count, mean, m2, vmin, vmax, batches = (
        state.get if state.exists else (0, 0, 0.0, 0.0, None, None, 0)
    )
    for pdf in pdfs:
        null_count += int(pdf["value"].isna().sum())
        vals = pdf["value"].dropna().to_numpy(dtype="float64")
        bn = len(vals)
        if bn:
            bmean = float(vals.mean())
            bm2 = float(((vals - bmean) ** 2).sum())
            delta = bmean - mean
            tot = n + bn
            m2 = m2 + bm2 + delta * delta * n * bn / tot
            mean = mean + delta * bn / tot
            n = tot
            bmin, bmax = float(vals.min()), float(vals.max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
    batches += 1
    state.update((n, null_count, mean, m2, vmin, vmax, batches))
    stddev = (m2 / (n - 1)) ** 0.5 if n > 1 else None
    yield pd.DataFrame(
        [
            {
                "event_type": event_type,
                "n": n,
                "null_count": null_count,
                "mean": mean if n else None,
                "stddev": stddev,
                "min": vmin,
                "max": vmax,
                "batches": batches,
            }
        ]
    )


def stateful_running_profile(
    df: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Custom stateful operator: per-key running profile across micro-batches.

    ``applyInPandasWithState`` keeps (n, null_count, mean, M2, min, max) per
    key in the state store; each micro-batch Arrow-merges its rows into the
    state (Welford/Chan — numerically stable, exact) and emits the updated
    cumulative profile. This is the unbounded-baseline counterpart to
    ``windowed_profile``: no window boundary ever evicts the baseline, yet
    state stays O(keys) — the shape ``groupBy().agg()`` cannot express on a
    stream without unbounded buffering.

    Beyond the reference's surface (SURVEY §2.10: it has no streaming at
    all). Works on a streaming DataFrame; per-key output after each batch.
    """
    keys = keys if keys is not None else ["event_type"]
    return df.groupBy(*keys).applyInPandasWithState(
        _running_profile_update,
        outputStructType=RUNNING_PROFILE_OUTPUT_SCHEMA,
        stateStructType=_RUNNING_PROFILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def running_profile_batch(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
    bucket: str = "day",
) -> DataFrame:
    """Batch twin of ``stateful_running_profile``: the cumulative per-key
    profile after each event-time bucket, in closed form.

    One row per (key, bucket) holding the stats over ALL rows up to and
    including that bucket — exactly the state the streaming operator would
    emit after a micro-batch covering the bucket. Shape: one groupBy to
    per-bucket partials (n, Σv, Σv², min, max), then cumulative window sums;
    the full history is never re-scanned, so the plan is one shuffle on the
    keys plus an O(buckets·keys) window — scale-safe.

    This is the oracle-checkable face of the stateful family (the
    streaming/batch equivalence of the merge itself is unit-tested in
    ``tests/test_similarity_streaming.py::test_stateful_running_profile``).
    """
    keys = keys if keys is not None else ["event_type"]
    v = F.col(value_col)
    per = df.groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"), *keys).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(v.isNull().cast("long")).alias("nulls"),
        F.count(v).alias("nv"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_n = F.sum("nv").over(w)
    mean = F.when(cum_n > 0, F.sum("s").over(w) / cum_n)
    var = (F.sum("ss").over(w) - cum_n * mean * mean) / (cum_n - 1)
    return per.select(
        "bucket_ts",
        *keys,
        F.sum("rows").over(w).alias("n"),
        F.sum("nulls").over(w).alias("null_count"),
        mean.alias("mean"),
        F.when(cum_n > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).alias("stddev"),
        F.min("mn").over(w).alias("min"),
        F.max("mx").over(w).alias("max"),
    )


def streaming_drift_alerts(
    profile_stream: DataFrame,
    baseline: DataFrame,
    keys: list[str] | None = None,
    mean_threshold: float = 0.1,
) -> DataFrame:
    """Join a live windowed profile stream against a static baseline profile
    and flag windows whose mean drifts beyond the threshold.

    ``baseline`` is a small static DataFrame (key → ref_mean, ref_stddev) —
    a stream-static broadcast join, the standard low-latency drift pattern.
    """
    keys = keys if keys is not None else ["event_type"]
    ref = baseline.select(
        *keys,
        F.col("mean").alias("ref_mean"),
        F.col("stddev").alias("ref_stddev"),
    )
    joined = profile_stream.join(F.broadcast(ref), keys, "left")
    rel = F.when(
        F.col("ref_mean") != 0, F.abs((F.col("mean") - F.col("ref_mean")) / F.col("ref_mean"))
    ).otherwise(F.when(F.col("mean") != 0, F.lit(1.0)).otherwise(F.lit(0.0)))
    return joined.withColumn("mean_rel_diff", rel).withColumn(
        "drift_alert", F.coalesce(rel > mean_threshold, F.lit(False))
    )


def windowed_drift(
    df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 day",
    keys: list[str] | None = None,
    value_col: str = "value",
    mean_threshold: float = 0.1,
    volume_threshold: float = 0.5,
    eps: float = 1e-9,
) -> DataFrame:
    """Drift between CONSECUTIVE time windows, per key: each window's
    profile versus the immediately preceding window's (``lag`` over the
    per-window aggregates).

    The windowed aggregation does the 100 TB work (one shuffle, map-side
    combined); the lag comparison runs over the O(windows × keys) profile
    table — each key's partition holds time-range/window rows, never raw
    events. A key's first window has no predecessor and is omitted.

    Output per (window, key): current + previous mean/n, ``mean_shift``
    (relative), ``volume_shift`` (relative row-count change),
    ``drift_detected``. The standard "did this hour look like last hour"
    monitor a streaming pipeline runs behind its alerting.
    """
    keys = keys if keys is not None else ["event_type"]
    prof = windowed_profile(
        df, ts_col=ts_col, window_duration=window_duration, keys=keys, value_col=value_col
    )
    w = Window.partitionBy(*keys).orderBy("window_start")
    lagged = prof.select(
        "window_start",
        *keys,
        "n",
        "mean",
        F.lag("n").over(w).alias("prev_n"),
        F.lag("mean").over(w).alias("prev_mean"),
    ).where(F.col("prev_n").isNotNull())
    mean_shift = F.abs(F.col("mean") - F.col("prev_mean")) / F.greatest(
        F.abs(F.col("prev_mean")), F.lit(eps)
    )
    volume_shift = F.abs(F.col("n") - F.col("prev_n")) / F.col("prev_n")
    return lagged.select(
        "window_start",
        *keys,
        F.col("n").cast("long").alias("n"),
        F.col("prev_n").cast("long").alias("prev_n"),
        "mean",
        "prev_mean",
        mean_shift.alias("mean_shift"),
        volume_shift.alias("volume_shift"),
        ((mean_shift > mean_threshold) | (volume_shift > volume_threshold)).alias(
            "drift_detected"
        ),
    )


CUSUM_OUTPUT_SCHEMA = (
    "user_id long, n long, sp double, sn double, max_cusum_pos double,"
    " max_cusum_neg double, alarm boolean, first_alarm_ts timestamp"
)
_CUSUM_STATE_SCHEMA = (
    "n long, sp double, sn double, mx_p double, mx_n double,"
    " first_alarm_us long"
)


def make_cusum_update(k: float = 0.5, h: float = 5.0):
    """Build the applyInPandasWithState update function for the streaming
    CUSUM. Parameters are captured by closure so the function ships to the
    workers as a plain pickled callable."""

    def _update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        n, sp, sn, mx_p, mx_n, first_us = (
            state.get if state.exists else (0, 0.0, 0.0, 0.0, 0.0, None)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"] if "event_id" in pdf else ["ts"])
            for _, row in pdf.iterrows():
                if pd.isna(row["value"]) or pd.isna(row["sigma"]):
                    continue
                z = (
                    (float(row["value"]) - float(row["mu"])) / float(row["sigma"])
                    if float(row["sigma"]) > 0
                    else 0.0
                )
                sp = max(0.0, sp + z - k)
                sn = max(0.0, sn - z - k)
                mx_p, mx_n = max(mx_p, sp), max(mx_n, sn)
                n += 1
                if first_us is None and (sp > h or sn > h):
                    first_us = int(row["ts"].value // 1000)  # ns → µs
        state.update((n, sp, sn, mx_p, mx_n, first_us))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n": n,
                    "sp": sp,
                    "sn": sn,
                    "max_cusum_pos": mx_p,
                    "max_cusum_neg": mx_n,
                    "alarm": first_us is not None,
                    "first_alarm_ts": (
                        pd.Timestamp(first_us, unit="us") if first_us is not None else pd.NaT
                    ),
                }
            ]
        )

    return _update


def stateful_cusum(
    df: DataFrame,
    baseline: DataFrame,
    by: str = "user_id",
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Streaming two-sided CUSUM drift alarm — the second custom stateful
    operator (after ``stateful_running_profile``) and the streaming twin
    of ``operators.temporal.cusum_changepoint(baseline=...)``.

    ``baseline`` is a STATIC ``(by, mu, sigma)`` frame (the trusted
    reference window's statistics); the stream joins it (stream-static
    broadcast join), and ``applyInPandasWithState`` carries ``(S⁺, S⁻,
    maxima, first alarm)`` per key — O(keys) state, each micro-batch
    folds its rows in event-time order. Output after every batch: the
    key's cumulative CUSUM summary (same columns as the batch operator,
    so finalized streams compare row-for-row — pinned by
    ``test_streaming_cusum_matches_batch``).

    Ordering caveat shared by every stateful streaming fold: rows are
    ordered within a micro-batch, not across batches — feed the stream
    through a watermark + sorted source (or accept per-batch granularity
    of the alarm position) when batches can interleave event time.
    """
    joined = df.join(F.broadcast(baseline), by)
    return joined.groupBy(by).applyInPandasWithState(
        make_cusum_update(k, h),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def windowed_heavy_hitters(
    df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 day",
    item_col: str = "event_type",
    k: int = 10,
    max_items_tracked: int = 10000,
) -> DataFrame:
    """Per-window top-k items via the mergeable frequent-items sketch
    (``approx_top_k``) — "what dominated each window" over an unbounded
    item domain with FIXED per-window state, where an exact
    ``groupBy(window, item)`` count table grows with the domain.

    Works unchanged on batch or streaming input (the sketch is a
    mergeable aggregate, so micro-batches combine partial states like
    any windowed agg). When ``max_items_tracked`` exceeds the window's
    distinct items the counts are exact (the ``merged_heavy_hitters``
    contract). Output: one row per ``(window_start, item)`` with
    ``count_estimate``, at most ``k`` rows per window.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    ensure_safe_columns([ts_col, item_col])
    w = F.window(F.col(ts_col), window_duration)
    out = (
        df.where(F.col(item_col).isNotNull())
        .groupBy(w.alias("w"))
        .agg(
            F.expr(
                f"approx_top_k(CAST(`{item_col}` AS STRING), {int(k)},"
                f" {int(max_items_tracked)})"
            ).alias("__top")
        )
    )
    return out.select(
        F.col("w.start").alias("window_start"), F.explode("__top").alias("z")
    ).selectExpr(
        "window_start",
        "z.item AS item",
        "CAST(z.count AS BIGINT) AS count_estimate",
    )


def windowed_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 day",
    value_col: str = "user_id",
    rsd: float = 0.01,
) -> DataFrame:
    """Per-window approximate distinct count (``approx_count_distinct``,
    HyperLogLog++) — "how many unique users per day" with fixed
    per-window state, streaming-legal where an exact windowed
    ``COUNT(DISTINCT)`` is not (the exact form needs the full value set
    per window; the sketch merges across micro-batches like any agg).

    ``rsd``: target relative standard deviation (state grows as
    1/rsd²; 0.01 ≈ 1% typical error). Output: ``window_start,
    n_events, distinct_estimate``.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    ensure_safe_columns([ts_col, value_col])
    w = F.window(F.col(ts_col), window_duration)
    return (
        df.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct(value_col, rsd).alias("distinct_estimate"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("distinct_estimate").cast("long").alias("distinct_estimate"),
        )
    )
