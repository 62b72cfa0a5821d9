"""Numeric drift metrics: expression math over a join of two profiles.

The entire M16/M19/M23 family (SURVEY.md §2.9) re-expressed as a single
broadcast join of two O(columns)-row profile tables plus column expressions —
no driver math, no per-column jobs.

Semantics reproduced from the reference:
- relative-diff convention ``numerical_analyzer.py:214-219``
  (ref==0 → 1.0 if curr != 0 else 0.0; signed otherwise);
- weighted drift score ``numerical_analyzer.py:253-272`` (weights mean .25,
  median .2, std_dev .15, iqr .15, null .1, range .15; normalized by the
  weight mass of non-null metrics; capped at 1.0);
- drift decision + causes ``numerical_analyzer.py:68-91`` (six threshold
  comparisons). NOTE deliberate fix: the reference compares a key
  ``std_relative_diff`` that its own metrics dict never emits
  (it emits ``std_dev_relative_diff``), so its std check is dead code; we
  implement the intent and compare the actual std_dev relative diff
  (SURVEY §7.4 risk 3).
- severity bands ``result_handler.py:55-73``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

# (metric, weight) — numerical_analyzer.py:253-260
SCORE_WEIGHTS: dict[str, float] = {
    "mean_relative_diff": 0.25,
    "median_relative_diff": 0.2,
    "std_dev_relative_diff": 0.15,
    "iqr_relative_diff": 0.15,
    "null_diff": 0.1,
    "range_relative_diff": 0.15,
}

DEFAULT_NUM_THRESHOLDS: dict[str, float] = {
    "mean_threshold": 0.05,
    "median_threshold": 0.05,
    "std_threshold": 0.1,
    "iqr_threshold": 0.1,
    "null_threshold": 0.005,
    "range_threshold": 0.1,
}


def relative_diff_expr(ref: Column, curr: Column) -> Column:
    """ref==0 → 1.0 if curr!=0 else 0.0; else (curr-ref)/abs(ref)."""
    return (
        F.when(ref.isNull() | curr.isNull(), F.lit(None).cast("double"))
        .when(ref == 0, F.when(curr != 0, F.lit(1.0)).otherwise(F.lit(0.0)))
        .otherwise((curr - ref) / F.abs(ref))
    )


def severity_expr(score: Column) -> Column:
    """None < .1 ≤ Low < .25 ≤ Medium < .5 ≤ High < .75 ≤ Critical."""
    return (
        F.when(score < 0.1, "None")
        .when(score < 0.25, "Low")
        .when(score < 0.5, "Medium")
        .when(score < 0.75, "High")
        .otherwise("Critical")
    )


def _prefixed(profile: DataFrame, prefix: str) -> DataFrame:
    return profile.select(
        "column_name",
        *[F.col(c).alias(f"{prefix}{c}") for c in profile.columns if c != "column_name"],
    )


def numeric_drift(
    ref_profile: DataFrame,
    curr_profile: DataFrame,
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Join ref/curr numeric profiles and compute the full drift row per column.

    Inputs are ``operators.profile.numeric_profile`` outputs (must include
    p25/p50/p75 quantiles). The join is on ``column_name`` — both sides are
    O(columns) rows, so this is a broadcast hash join regardless of the
    source table size.
    """
    joined = _prefixed(ref_profile, "ref_").join(
        F.broadcast(_prefixed(curr_profile, "curr_")), on="column_name", how="full_outer"
    )
    return numeric_drift_from_joined(joined, thresholds)


def numeric_drift_pair(
    df_ref: DataFrame,
    df_curr: DataFrame,
    columns: list[str] | None = None,
    thresholds: dict[str, float] | None = None,
    **profile_kwargs,
) -> DataFrame:
    """Numeric drift from raw snapshots: ONE scan+agg job for both sides.

    Uses the side-tagged union profile (``numeric_profile_pair``), so no
    join is needed at all — the preferred entry at scale.
    """
    from pyspark_data_drift_detector_spark.operators.profile import numeric_profile_pair

    profile_kwargs.setdefault("quantiles", (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99))
    joined = numeric_profile_pair(df_ref, df_curr, columns=columns, **profile_kwargs)
    return numeric_drift_from_joined(joined, thresholds)


def numeric_drift_from_joined(
    joined: DataFrame,
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Drift expressions over a table with ``ref_*``/``curr_*`` stat columns."""
    th = dict(DEFAULT_NUM_THRESHOLDS)
    th.update(thresholds or {})

    # derived stats on each side
    for side in ("ref", "curr"):
        joined = (
            joined.withColumn(f"{side}_iqr", F.col(f"{side}_p75") - F.col(f"{side}_p25"))
            .withColumn(f"{side}_range", F.col(f"{side}_max") - F.col(f"{side}_min"))
            .withColumn(f"{side}_median", F.col(f"{side}_p50"))
        )

    stats = ["mean", "median", "stddev", "min", "max", "iqr", "range"]
    # the metrics dict uses "std_dev" as the stat key (numerical_analyzer.py:222)
    key_of = {s: ("std_dev" if s == "stddev" else s) for s in stats}
    for s in stats:
        k = key_of[s]
        joined = joined.withColumn(
            f"{k}_abs_diff", F.col(f"curr_{s}") - F.col(f"ref_{s}")
        ).withColumn(
            f"{k}_relative_diff", relative_diff_expr(F.col(f"ref_{s}"), F.col(f"curr_{s}"))
        )
    joined = joined.withColumn(
        "null_diff",
        F.coalesce(F.col("curr_null_ratio"), F.lit(0.0))
        - F.coalesce(F.col("ref_null_ratio"), F.lit(0.0)),
    )

    # weighted drift score, normalized by the weight mass of present metrics
    contrib = F.lit(0.0)
    weight_mass = F.lit(0.0)
    for metric, w in SCORE_WEIGHTS.items():
        m = F.col(metric)
        contrib = contrib + F.when(m.isNotNull(), F.abs(m) * F.lit(w)).otherwise(F.lit(0.0))
        weight_mass = weight_mass + F.when(m.isNotNull(), F.lit(w)).otherwise(F.lit(0.0))
    joined = joined.withColumn(
        "drift_score",
        F.when(weight_mass > 0, F.least(F.lit(1.0), contrib / weight_mass)).otherwise(F.lit(0.0)),
    )

    # drift decision + causes (numerical_analyzer.py:68-91)
    cause_checks = [
        ("mean", F.abs(F.coalesce(F.col("mean_relative_diff"), F.lit(0.0))) > th["mean_threshold"]),
        ("median", F.abs(F.coalesce(F.col("median_relative_diff"), F.lit(0.0))) > th["median_threshold"]),
        ("std_dev", F.abs(F.coalesce(F.col("std_dev_relative_diff"), F.lit(0.0))) > th["std_threshold"]),
        ("iqr", F.abs(F.coalesce(F.col("iqr_relative_diff"), F.lit(0.0))) > th["iqr_threshold"]),
        ("null_proportion", F.abs(F.coalesce(F.col("null_diff"), F.lit(0.0))) > th["null_threshold"]),
        ("range", F.abs(F.coalesce(F.col("range_relative_diff"), F.lit(0.0))) > th["range_threshold"]),
    ]
    drift_detected = F.lit(False)
    for _, cond in cause_checks:
        drift_detected = drift_detected | cond
    causes = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in cause_checks])
    )
    return (
        joined.withColumn("drift_detected", drift_detected)
        .withColumn("drift_causes", causes)
        .withColumn("drift_severity", severity_expr(F.col("drift_score")))
    )
