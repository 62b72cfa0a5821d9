"""Streaming maintenance of the mergeable state tables.

The batch-incremental pipeline (``mergeable.partitioned_profile`` →
persist → ``detect_drift_incremental``) assumes SOMETHING appends one
summary row-group per ingest batch. This module is that something for a
Structured Streaming ingest: a ``foreachBatch`` sink that reduces each
micro-batch to its additive profile / category-count states and APPENDS
them to parquet state tables, keyed by a caller-derived partition id
(typically an event-time bucket).

Why ``foreachBatch`` and not a streaming aggregate: the state tables are
persistent artifacts OUTSIDE the streaming checkpoint — any window of
partitions can be merged later (or by another engine) without replaying
the stream, which is the point of the mergeable family. Each batch is
reduced with the SAME batch operators (one wide aggregate per batch), so
batch and streaming state rows are indistinguishable by construction.

At 100 TB scale: a micro-batch writes O(buckets × columns) summary rows
— metadata-sized regardless of batch volume — and the drift check over
any window reads ONLY the state tables.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame


def state_table_sink(
    numeric_columns: list[str],
    categorical_columns: list[str],
    partition_by: Column | str,
    profile_path: str,
    category_path: str,
    quantile_path: str | None = None,
    kll_k: int = 800,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function that appends each micro-batch's
    additive states to parquet state tables.

    ``partition_by``: expression labeling each ROW's state partition
    (e.g. ``"date_trunc('day', ts)"``). A batch spanning two buckets
    writes two state rows per column — merges stay exact because the
    states are additive. ``quantile_path`` additionally maintains the
    KLL quantile state so windowed drift carries median/IQR.

    Usage::

        sink = state_table_sink(["value"], ["event_type"],
                                "date_trunc('day', ts)",
                                "/state/profile", "/state/categories",
                                quantile_path="/state/quantiles")
        stream.writeStream.foreachBatch(sink).start()
    """
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        partitioned_categories,
        partitioned_profile,
        partitioned_quantiles,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if numeric_columns:
            partitioned_profile(
                batch_df, numeric_columns, partition_by
            ).write.mode("append").parquet(profile_path)
            if quantile_path is not None:
                partitioned_quantiles(
                    batch_df, numeric_columns, partition_by, k=kll_k
                ).write.mode("append").parquet(quantile_path)
        if categorical_columns:
            partitioned_categories(
                batch_df, categorical_columns, partition_by
            ).write.mode("append").parquet(category_path)

    return write_batch


def read_state_tables(
    spark,
    profile_path: str,
    category_path: str,
    quantile_path: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Load the appended state tables back for a window query.

    Multiple appends for one ``partition_id`` (several micro-batches
    landing in one bucket) are fine as-is: ``merge_profiles`` /
    ``merge_categories`` / ``merged_quantiles`` treat every state ROW as
    mergeable input, so no compaction is required for correctness —
    compact with a periodic rewrite only when the row count itself gets
    large.
    """
    prof = spark.read.parquet(profile_path)
    cats = spark.read.parquet(category_path)
    quants = spark.read.parquet(quantile_path) if quantile_path else None
    return prof, cats, quants
