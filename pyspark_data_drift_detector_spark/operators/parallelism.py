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

Two guards keep the fan-out from costing more than it saves:

* **Streaming inputs pass through untouched** — ``df.rdd`` would throw on a
  streaming DataFrame, and micro-batch parallelism is the source's problem.
* **Wide binary columns are never shuffled up.** For payload-carrying
  frames (multimodal decode), a round-robin repartition moves every payload
  byte across the wire to win parallelism that a small local input doesn't
  need — and at scale the payload column is the widest thing in the table,
  so the shuffle dwarfs the decode it tries to parallelize. Callers with
  binary columns should instead lower ``spark.sql.files.maxPartitionBytes``
  at read time so the *scan* arrives pre-split; ``ensure_min_partitions``
  refuses binary-typed frames unless ``allow_binary=True`` is passed
  explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, BinaryType


def _has_binary_column(df: DataFrame) -> bool:
    for f in df.schema.fields:
        t = f.dataType
        if isinstance(t, BinaryType):
            return True
        if isinstance(t, ArrayType) and isinstance(t.elementType, BinaryType):
            return True
    return False


def ensure_min_partitions(
    df: DataFrame, target: int | None = None, allow_binary: bool = False
) -> DataFrame:
    """Round-robin repartition to ``target`` (default: defaultParallelism)
    iff the plan currently has fewer partitions; otherwise return ``df``
    unchanged. Streaming frames and frames carrying binary columns are
    returned unchanged (see module docstring)."""
    if df.isStreaming:
        return df
    if not allow_binary and _has_binary_column(df):
        return df
    sc = df.sparkSession.sparkContext
    goal = target if target is not None else sc.defaultParallelism
    if df.rdd.getNumPartitions() < goal:
        return df.repartition(goal)
    return df
