"""Input fan-out for row-explosion operators.

The shingle/n-gram/frame-sampling operators multiply their input ~10-1000×
inside the map stage (explode of per-row arrays). Parallelism of that map
stage is the INPUT's split count — and a small table (one parquet file, a
collected dimension, a sampled corpus slice) arrives as 1-2 splits, so the
most expensive part of the query runs on one core while the cluster idles;
the shuffle after the explode redistributes only the already-generated
rows.

``ensure_min_partitions`` repartitions UP (round-robin, no keys — rows are
about to be exploded and re-keyed anyway) only when the input has fewer
splits than the cluster's default parallelism. At production scale the
input arrives in thousands of file splits and this is an exact no-op — it
never repartitions DOWN and never touches an already-parallel input, so
100 TB scans are not reshuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition to ``target`` (default: defaultParallelism)
    iff the plan currently has fewer partitions; otherwise return ``df``
    unchanged."""
    sc = df.sparkSession.sparkContext
    goal = target if target is not None else sc.defaultParallelism
    if df.rdd.getNumPartitions() < goal:
        return df.repartition(goal)
    return df
