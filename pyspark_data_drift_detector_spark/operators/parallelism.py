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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_partitions: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting: the left (big, skewed) side scatters
    each row into one of ``salt_partitions`` salt slices; the right side
    replicates every row into ALL slices; the join runs on
    ``(keys..., salt)`` — a key whose rows would land in one reducer now
    spreads across ``salt_partitions`` tasks.

    Use when AQE's skew-join splitting can't help: AQE splits oversized
    SHUFFLE partitions of sort-merge joins, but a single monster key still
    meets all its right-side rows in one task when the right side is also
    large per key. Salting trades ``salt_partitions``× replication of the
    right side for even task sizes — so keep the right side the SMALLER
    input (flip the call for right-skew; for inner joins the result is
    symmetric). Results are identical to a plain join (each (left-row,
    right-row) key match meets in exactly one slice).

    ``how``: ``inner`` or ``left`` (left rows keep exactly one slice, so
    left-outer semantics survive salting; full/right outer would duplicate
    unmatched right rows across slices — rejected).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    if salt_partitions < 2:
        return left.join(right, on, how)
    from pyspark.sql import functions as F

    lsalt = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_partitions)).cast("int"),
    )
    rsalt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_partitions - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return lsalt.join(rsalt, [*on, "__salt"], how).drop("__salt")
