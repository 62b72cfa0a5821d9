"""Structured Streaming sessionization and ingest dedup.

Both wrap the batch operators' expressions in a ``readStream`` +
watermark pipeline, the same batch/streaming-shared-code pattern as
``streaming/profiles.py``:

- ``stream_sessionize`` — gap-based session windows over an unbounded
  event stream. ``F.session_window`` is the one Spark aggregation whose
  *grouping key* merges as data arrives; with a watermark, a session
  closes (and is emitted, in append mode) once the watermark passes its
  ``last_event + gap`` end, so state is O(open sessions), not O(events).
- ``stream_dedup`` — exactly-once ingest dedup via
  ``dropDuplicatesWithinWatermark``: the streaming twin of
  ``operators/dedup.exact_duplicates``. State holds one entry per key
  seen within the watermark horizon and is evicted beyond it — the
  standard at-least-once-source → exactly-once-sink repair.

At 100 TB/day scale both are shuffle-on-key stateful aggregations whose
state is bounded by the watermark horizon, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_data_drift_detector_spark.operators.temporal import (
    DEFAULT_SESSION_GAP,
    sessionize,
)


def _read_stream(
    spark: SparkSession, source_path: str, schema: str | None, ts_col: str
) -> DataFrame:
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
    return stream


def stream_sessionize(
    spark: SparkSession,
    source_path: str,
    schema: str | None = None,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = DEFAULT_SESSION_GAP,
    watermark: str = "8 hours",
    value_col: str = "value",
) -> DataFrame:
    """Streaming gap-based sessionization: file source → watermark →
    ``session_window`` aggregation — the exact expressions of the batch
    ``operators.temporal.sessionize``, so every FINALIZED session matches
    the batch result row-for-row (pinned by the streaming test).

    Returns the streaming DataFrame; callers attach a sink (append mode —
    a session row is emitted once, when the watermark closes it).
    """
    stream = _read_stream(spark, source_path, schema, ts_col).withWatermark(
        ts_col, watermark
    )
    return sessionize(stream, ts_col=ts_col, key_col=key_col, gap=gap, value_col=value_col)


def stream_dedup(
    spark: SparkSession,
    source_path: str,
    schema: str | None = None,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "30 days",
) -> DataFrame:
    """Watermark-bounded streaming exact dedup: emit each key's FIRST
    arrival, drop re-deliveries seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per distinct
    key and evicts entries older than the watermark — the state bound
    that makes exact dedup feasible on an unbounded stream (a plain
    ``dropDuplicates`` on a stream grows state forever).
    """
    id_cols = id_cols if id_cols is not None else ["event_id"]
    stream = _read_stream(spark, source_path, schema, ts_col).withWatermark(
        ts_col, watermark
    )
    return stream.dropDuplicatesWithinWatermark(id_cols)
