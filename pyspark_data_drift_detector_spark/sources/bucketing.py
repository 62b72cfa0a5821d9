"""Storage-level bucketing: pre-shuffle ONCE at write time, join free after.

At 100 TB the same big-big join (fact-to-fact on a shared key — lineitem
to orders, events to sessions, corpus to labels) runs daily; paying its
shuffle every run is the single largest avoidable cost in a recurring
pipeline. Spark's answer is bucketed tables: ``bucketBy(N, key)`` at write
time hash-partitions rows into N files per partition and records the
layout in the catalog, so a later join of two tables bucketed the same
way satisfies both sides' required distribution — the plan contains NO
Exchange for either input (pinned by ``test_bucketed_join_no_shuffle``).

Notes for real deployments:
- both sides must bucket on the JOIN key with the same bucket count
  (or an integer multiple — Spark 3.1+ coalesces compatible counts);
- ``sortBy`` on the same key additionally removes the join's Sort;
- bucketed tables require the session catalog (``saveAsTable``); plain
  ``parquet(path)`` writes lose the metadata. Pass ``path`` to keep the
  data outside the warehouse as an external table;
- size N so a bucket ≈ one healthy task (128-512 MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table."""
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = df.write.format("parquet").mode(mode).bucketBy(
        int(n_buckets), bucket_cols[0], *bucket_cols[1:]
    )
    if sort:
        writer = writer.sortBy(bucket_cols[0], *bucket_cols[1:])
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    Plain ``join`` — the co-location is a property of the tables, not the
    query; this helper only documents the contract and is the unit the
    no-shuffle plan test pins.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
