"""Snapshot sources and result sinks.

Covers the reference's scan/sink surface (SURVEY.md §2.1, S1-S7):
Delta time-travel scans (``data_loader.py:8-40``), latest-version lookup
(``data_loader.py:42-65``), bounded seeded sampling (``data_loader.py:67-90``),
and Delta/Parquet append sinks (``result_handler.py:206-224``,
``data_drift_detector.py:246-281``).

Scale notes:
- The reference eagerly ``cache()`` + ``count()``s every snapshot
  (``data_loader.py:30-33``) — a full extra scan. Here caching is opt-in and
  nothing is materialized eagerly; Catalyst sees the whole plan and prunes
  columns/partitions down to the parquet scan.
- Sampling computes ``df.count()`` twice in the reference
  (``data_loader.py:79,83``); here the fraction comes from one count, and the
  sample is a pushed-down ``sample()`` (no ``limit`` barrier unless a hard
  cap is demanded, because ``limit`` funnels through a single task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _has_delta(spark: SparkSession) -> bool:
    try:
        spark._jvm.io.delta.tables.DeltaTable  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def load_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    fmt: str | None = None,
    cache: bool = False,
) -> DataFrame:
    """Load one table snapshot.

    ``fmt=None`` auto-detects: ``.parquet`` paths (the test harness data)
    read as parquet; a ``{path}/v=N/`` layout reads as the engine-native
    versioned parquet store (``fmt="vparquet"`` forces it); otherwise
    Delta with ``versionAsOf`` time travel when a version is requested
    (reference behavior, ``data_loader.py:24``). The vparquet fallback is
    what keeps the version-pair entry point execution-verified in
    environments without delta-spark — same config keys either way.
    """
    if fmt is None:
        if path.endswith(".parquet"):
            fmt = "parquet"
        elif _probe_versions(spark, path):
            fmt = "vparquet"
        else:
            fmt = "delta"
    if fmt == "vparquet":
        if version is None:
            versions = list_parquet_versions(spark, path)
            if not versions:
                raise ValueError(f"no versions under {path}")
            version = versions[-1]
        df = spark.read.parquet(f"{path.rstrip('/')}/{_VDIR}{int(version)}")
    else:
        reader = spark.read.format(fmt)
        if version is not None and fmt == "delta":
            reader = reader.option("versionAsOf", version)
        df = reader.load(path)
    if cache:
        df = df.cache()
    return df


#: subdirectory prefix of the engine-native versioned parquet store
_VDIR = "v="


def _fs_and_path(spark: SparkSession, table_path: str):
    jvm = spark._jvm  # type: ignore[union-attr]
    p = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    return fs, p, jvm


def list_parquet_versions(spark: SparkSession, table_path: str) -> list[int]:
    """Versions present in a versioned parquet store (``{path}/v=N/``
    parquet directories). Listing goes through the Hadoop ``FileSystem``
    abstraction, so it works on HDFS/S3/local alike and costs one
    O(versions) driver-side listing — no data is read."""
    fs, p, _ = _fs_and_path(spark, table_path)
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(_VDIR):
            try:
                out.append(int(name[len(_VDIR):]))
            except ValueError:
                continue
    return sorted(out)


def _probe_versions(spark: SparkSession, table_path: str) -> list[int]:
    """Best-effort vparquet AUTO-DETECTION probe: any failure to reach a
    Hadoop FileSystem (mocked sessions in unit tests, exotic schemes)
    means "not a versioned store" and the caller falls through to the
    Delta path, whose own error surfaces. Explicit ``fmt="vparquet"``
    calls use :func:`list_parquet_versions` directly so real FS errors
    are never swallowed."""
    try:
        return list_parquet_versions(spark, table_path)
    except Exception:
        return []


def write_versioned_snapshot(
    df: DataFrame, table_path: str, version: int | None = None
) -> int:
    """Write one snapshot into the engine-native VERSIONED PARQUET store:
    ``{table_path}/v=N/`` (N = ``version``, or 1 + the latest present).

    This is the Delta-less time-travel layout: each version is an
    immutable plain-parquet directory, so ``load_snapshot`` /
    ``runner.run`` get a fully execution-verified version-pair path in
    environments without delta-spark (the sandbox), and the SAME config
    (``table_path`` + ``reference_version``/``current_version``) moves
    unchanged to a real Delta table where one is available. Unlike Delta
    this store has no transaction log — concurrent writers of the SAME
    auto-assigned version race (assign versions explicitly from your
    orchestrator if batches can overlap), and there is no file-level
    dedup/compaction. Returns the version written.
    """
    spark = df.sparkSession
    if version is None:
        existing = list_parquet_versions(spark, table_path)
        version = (existing[-1] + 1) if existing else 0
    df.write.mode("errorifexists").parquet(
        f"{table_path.rstrip('/')}/{_VDIR}{int(version)}"
    )
    return int(version)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the harness parquet tables from a scale-factor dir."""
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the harness ``events`` table with ``ts`` normalized to a timestamp.

    The driver's testdata has shipped ``ts`` as three different physical
    types across rounds, so dispatch on the read schema:

    - ``timestamp``/``timestamp_ntz`` (current testdata): already usable;
      cast NTZ to session-zone timestamp for uniform downstream semantics.
    - INT64 nanos (older testdata): Spark rejects TIMESTAMP(NANOS) parquet
      unless ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case
      it reads as long nanos — converted via integer division (no float
      rounding) to a microsecond timestamp.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def latest_version(spark: SparkSession, table_path: str) -> int:
    """Most recent version of a table: ``DESCRIBE HISTORY`` → max for
    Delta (reference ``data_loader.py:42-65``; orderBy desc + first →
    here a single ``max`` aggregate), or the newest ``v=N`` directory of
    a versioned parquet store.
    """
    versions = _probe_versions(spark, table_path)
    if versions:
        return versions[-1]
    history = spark.sql(f"DESCRIBE HISTORY delta.`{table_path}`")
    row = history.agg(F.max("version").alias("v")).first()
    if row is None or row["v"] is None:
        raise ValueError(f"no history for {table_path}")
    return int(row["v"])


def sample_bounded(
    df: DataFrame,
    sample_size: int = 100_000,
    seed: int = 42,
    total_rows: int | None = None,
) -> DataFrame:
    """Seeded uniform sample targeting ~``sample_size`` rows.

    ``sample_size <= 0`` disables sampling (reference convention,
    ``README.md:138``). Uses a slightly inflated fraction instead of a hard
    ``limit`` so the sample stays fully parallel; statistical profiles don't
    need an exact row cap.
    """
    if sample_size is None or sample_size <= 0:
        return df
    n = total_rows if total_rows is not None else df.count()
    if n <= sample_size:
        return df
    fraction = min(1.0, (sample_size / n) * 1.02)
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def split_snapshot_pair(df: DataFrame, predicate: str) -> tuple[DataFrame, DataFrame]:
    """Derive a deterministic (ref, curr) pair from one table.

    ``ref`` rows satisfy ``predicate`` (a SQL boolean expression); ``curr``
    rows are the complement. Used by the harness fixtures (FIXTURES.md §B).
    """
    cond = F.expr(predicate)
    return df.filter(cond), df.filter(~cond)


def write_results(
    results_df: DataFrame,
    output_path: str,
    fmt: str = "parquet",
    mode: str = "append",
) -> None:
    """Append a result DataFrame to a Delta/Parquet sink.

    Reference: ``result_handler.py:206-224`` (long rows) and
    ``data_drift_detector.py:275-279`` (mergeSchema append).
    """
    writer = results_df.write.format(fmt).mode(mode)
    if fmt == "delta":
        writer = writer.option("mergeSchema", "true")
    writer.save(output_path)
