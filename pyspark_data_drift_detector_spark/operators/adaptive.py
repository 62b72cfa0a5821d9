"""Adaptive thresholds as a distributed table operator (SURVEY §2.9 M22).

``functions/thresholds.py`` holds the pure scalar form of each factor (unit
tested against the reference bands); this module evaluates the same band
ladders as Spark column expressions over ONE wide aggregate, so computing
adaptive thresholds for every column of a 100 TB table is a single job whose
shuffle payload is one row.

Band sources (all reference ``adaptive_threshold.py``): size ``:53-75``,
complexity ``:77-99``, CV volatility ``:197-219``, cardinality ``:252-286``,
nulls ``:289-322``, multiplicative composition ``:143-172``, CV→linear
interpolation ``:358-410``.

Scale note: ``exact_distinct=True`` (the reference's semantics and the
DuckDB-oracle mode) plans one Expand projection per distinct aggregate —
at 100 TB pass ``exact_distinct=False`` to use ``approx_count_distinct``
(single pass, no expand) since cardinality only selects a band.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _size_factor(n: Column) -> Column:
    return (
        F.when(n < 100, 2.0)
        .when(n < 1_000, 1.5)
        .when(n < 10_000, 1.2)
        .when(n < 100_000, 1.0)
        .when(n < 1_000_000, 0.8)
        .otherwise(0.6)
    )


def _complexity_factor(column_count: int) -> Column:
    if column_count < 10:
        v = 0.9
    elif column_count < 50:
        v = 1.0
    elif column_count < 100:
        v = 1.1
    else:
        v = 1.2
    return F.lit(v)


def _volatility_factor(cv: Column) -> Column:
    return (
        F.when(cv.isNull(), 1.5)
        .when(cv < 0.1, 0.8)
        .when(cv < 0.5, 1.0)
        .when(cv < 1.0, 1.2)
        .otherwise(1.5)
    )


def _cardinality_factor(ratio: Column) -> Column:
    return (
        F.when(ratio < 0.01, 0.8)
        .when(ratio < 0.1, 0.9)
        .when(ratio < 0.5, 1.0)
        .when(ratio < 0.9, 1.2)
        .otherwise(1.5)
    )


def _null_factor(null_ratio: Column) -> Column:
    return (
        F.when(null_ratio < 0.01, 0.9)
        .when(null_ratio < 0.1, 1.0)
        .when(null_ratio < 0.3, 1.1)
        .when(null_ratio < 0.5, 1.3)
        .otherwise(1.5)
    )


def adaptive_threshold_table(
    df: DataFrame,
    columns: list[str],
    base_threshold: float = 0.2,
    min_threshold: float = 0.05,
    max_threshold: float = 0.5,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column adaptive thresholds for numeric columns, one Spark job.

    Output schema::

        column_name string, n_rows long, distinct_count long, cv double,
        size_factor double, complexity_factor double, volatility_factor
        double, cardinality_factor double, null_factor double,
        composed_threshold double, adaptive_threshold double

    ``cv`` is NULL (and volatility defaults to its 1.5 band / interpolation
    to ``base_threshold``) when the column mean is 0 or undefined —
    the reference's guard at ``adaptive_threshold.py:203-205``.
    """
    if not columns:
        raise ValueError("no columns")
    # Exact distinct aggregates each live in their OWN aggregate subtree
    # (cross-joined 1-row aggregates — still one plan, one action): mixing
    # them with regular aggregates makes Spark's Expand duplicate every row
    # per distinct column WITH all the regular-agg columns attached (~2.3x
    # slower measured), and even a distinct-only aggregate with N distinct
    # columns pays an N-way Expand — N single-distinct subtrees each get the
    # efficient two-level plan, each scanning only its own column (~2.4x
    # measured). Approx (HLL) distincts are plain aggregates: one wide agg.
    basic: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in columns:
        dc = F.col(c).cast("double")
        basic += [
            F.avg(dc).alias(f"{c}__mean"),
            F.stddev(dc).alias(f"{c}__stddev"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
        ]
    if exact_distinct:
        from functools import reduce

        dist_parts = [
            df.agg(F.count_distinct(F.col(c)).alias(f"{c}__distinct")) for c in columns
        ]
        wide = reduce(lambda a, b: a.crossJoin(b), dist_parts, df.agg(*basic))
    else:
        basic += [F.approx_count_distinct(F.col(c)).alias(f"{c}__distinct") for c in columns]
        wide = df.agg(*basic)

    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__mean").alias("mean"),
            F.col(f"{c}__stddev").alias("stddev"),
            F.col(f"{c}__distinct").cast("long").alias("distinct_count"),
            F.col(f"{c}__nulls").cast("long").alias("null_count"),
        )
        for c in columns
    ]
    long = wide.select(
        F.col("__n_rows").cast("long").alias("n_rows"),
        F.explode(F.array(*structs)).alias("s"),
    ).select("n_rows", "s.*")

    n = F.col("n_rows")
    cv = F.when(
        F.col("mean").isNull() | (F.col("mean") == 0) | F.col("stddev").isNull(),
        F.lit(None).cast("double"),
    ).otherwise(F.abs(F.col("stddev") / F.col("mean")))

    size_f = _size_factor(n)
    cplx_f = _complexity_factor(len(df.columns))
    vol_f = _volatility_factor(cv)
    card_f = F.when(n == 0, 1.0).otherwise(
        _cardinality_factor(F.col("distinct_count") / n)
    )
    null_f = F.when(n == 0, 1.0).otherwise(
        _null_factor(F.col("null_count") / n)
    )
    composed = F.lit(base_threshold) * size_f * cplx_f * vol_f * card_f * null_f
    interp = (
        F.when(cv.isNull(), base_threshold)
        .when(cv < 0.1, min_threshold)
        .when(cv > 1.0, max_threshold)
        .otherwise(
            F.lit(min_threshold)
            + (max_threshold - min_threshold) * (cv - 0.1) / 0.9
        )
    )

    return long.select(
        "column_name",
        "n_rows",
        "distinct_count",
        cv.alias("cv"),
        size_f.alias("size_factor"),
        cplx_f.alias("complexity_factor"),
        vol_f.alias("volatility_factor"),
        card_f.alias("cardinality_factor"),
        null_f.alias("null_factor"),
        composed.alias("composed_threshold"),
        interp.alias("adaptive_threshold"),
    )
