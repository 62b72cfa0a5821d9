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
- severity bands ``result_handler.py:55-73``;
- M17 row-path score ``numerical_analyzer.py:278-558`` (components at
  :331-413: null-fraction diff, σ-normalized mean/median shifts capped at 1,
  log₂-ratio σ/range/IQR terms, σ-normalized p95/p99 tail shifts; score =
  mean of the components that were actually appended) via
  ``score_mode="row_path"``. The reference computes it with two collect()s
  per column; here it is the same single profile aggregate plus expression
  math — the components become an array, absent ones compact away, and the
  mean is an ``aggregate`` lambda.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

#: epsilon guarding the row-path divisions (numerical_analyzer.py:343)
ROW_PATH_EPS = 1e-10

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


def row_path_score_expr() -> Column:
    """M17 drift score over ``ref_*``/``curr_*`` profile columns.

    Reproduces ``numerical_analyzer.py:331-413,499-502`` exactly, including
    its conditional component inclusion: a component that the reference's
    imperative code never appends (e.g. the σ log-ratio when curr σ ≤ ε)
    becomes NULL here and is compacted out before the mean, so the divisor
    matches the reference's ``len(drift_components)``.

    Notes pinned to the reference:
    - null fractions divide by the NON-null count (``F.count(col)`` at
      :303 is Spark's non-null count) — a quirk, reproduced as-is;
    - mean/σ/median are ``na.fill(0.0)``-ed (:309-313) so those components
      are always present;
    - tail shifts divide by the *unfloored* ref σ and require σ_ref > ε.
    """
    eps = F.lit(ROW_PATH_EPS)
    one = F.lit(1.0)
    ln2 = F.lit(math.log(2.0))

    mean_r = F.coalesce(F.col("ref_mean"), F.lit(0.0))
    mean_c = F.coalesce(F.col("curr_mean"), F.lit(0.0))
    std_r = F.coalesce(F.col("ref_stddev"), F.lit(0.0))
    std_c = F.coalesce(F.col("curr_stddev"), F.lit(0.0))
    med_r = F.coalesce(F.col("ref_p50"), F.lit(0.0))
    med_c = F.coalesce(F.col("curr_p50"), F.lit(0.0))
    std_safe = F.greatest(std_r, eps)

    def null_frac(side: str) -> Column:
        n = F.col(f"{side}_n")
        return F.when(n > 0, F.col(f"{side}_null_count") / n).otherwise(F.lit(0.0))

    c_null = F.abs(null_frac("curr") - null_frac("ref"))
    c_mean = F.least(F.abs(mean_c - mean_r) / std_safe, one)
    # appended only when curr σ > ε (:355-360)
    c_std = F.when(std_c > eps, F.least(F.abs(F.log(std_c / std_safe)) / ln2, one))
    c_med = F.least(F.abs(med_c - med_r) / std_safe, one)

    have_rng = (
        F.col("ref_min").isNotNull()
        & F.col("ref_max").isNotNull()
        & F.col("curr_min").isNotNull()
        & F.col("curr_max").isNotNull()
    )
    rng_r = F.col("ref_max") - F.col("ref_min")
    rng_c = F.col("curr_max") - F.col("curr_min")
    # :370-382 — NB when |ref_range| > ε but curr_range ≤ ε nothing is appended
    c_rng = F.when(
        have_rng & (F.abs(rng_r) > eps) & (rng_c > eps),
        F.least(F.abs(F.log((rng_c + eps) / (rng_r + eps))) / ln2, one),
    ).when(have_rng & (F.abs(rng_r) <= eps) & (F.abs(rng_c) > eps), one)

    have_iqr = (
        F.col("ref_p25").isNotNull()
        & F.col("ref_p75").isNotNull()
        & F.col("curr_p25").isNotNull()
        & F.col("curr_p75").isNotNull()
    )
    iqr_r = F.col("ref_p75") - F.col("ref_p25")
    iqr_c = F.col("curr_p75") - F.col("curr_p25")
    # :389-399 — when |ref_iqr| > ε the component is always appended
    # (log ratio, or 1.0 for a collapsed curr IQR)
    c_iqr = F.when(
        have_iqr & (F.abs(iqr_r) > eps),
        F.when(
            iqr_c > eps, F.least(F.abs(F.log((iqr_c + eps) / (iqr_r + eps))) / ln2, one)
        ).otherwise(one),
    )

    tails = [
        F.when(
            F.col(f"ref_{p}").isNotNull() & F.col(f"curr_{p}").isNotNull() & (std_r > eps),
            F.least(F.abs(F.col(f"curr_{p}") - F.col(f"ref_{p}")) / std_r, one),
        )
        for p in ("p95", "p99")
    ]

    comps = F.array_compact(F.array(c_null, c_mean, c_std, c_med, c_rng, c_iqr, *tails))
    mean_of = F.aggregate(comps, F.lit(0.0), lambda a, x: a + x) / F.size(comps)
    score = F.when(F.size(comps) > 0, mean_of).otherwise(F.lit(0.0))
    return F.greatest(F.lit(0.0), F.least(one, score))


def _prefixed(profile: DataFrame, prefix: str) -> DataFrame:
    return profile.select(
        "column_name",
        *[F.col(c).alias(f"{prefix}{c}") for c in profile.columns if c != "column_name"],
    )


def numeric_drift(
    ref_profile: DataFrame,
    curr_profile: DataFrame,
    thresholds: dict[str, float] | None = None,
    score_mode: str = "weighted",
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
    return numeric_drift_from_joined(joined, thresholds, score_mode=score_mode)


def numeric_drift_pair(
    df_ref: DataFrame,
    df_curr: DataFrame,
    columns: list[str] | None = None,
    thresholds: dict[str, float] | None = None,
    score_mode: str = "weighted",
    **profile_kwargs,
) -> DataFrame:
    """Numeric drift from raw snapshots: ONE scan+agg job for both sides.

    Uses the side-tagged union profile (``numeric_profile_pair``), so no
    join is needed at all — the preferred entry at scale.
    """
    from pyspark_data_drift_detector_spark.operators.profile import numeric_profile_pair

    profile_kwargs.setdefault("quantiles", (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99))
    joined = numeric_profile_pair(df_ref, df_curr, columns=columns, **profile_kwargs)
    return numeric_drift_from_joined(joined, thresholds, score_mode=score_mode)


def numeric_drift_from_joined(
    joined: DataFrame,
    thresholds: dict[str, float] | None = None,
    score_mode: str = "weighted",
) -> DataFrame:
    """Drift expressions over a table with ``ref_*``/``curr_*`` stat columns.

    ``score_mode``: ``"weighted"`` (dict-path, ``numerical_analyzer.py:253-272``,
    the default) or ``"row_path"`` (M17, mean-of-components — requires
    p95/p99 in the joined profile). Both reference scorers coexist; only
    ``drift_score`` (and the severity derived from it) changes.
    """
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
    if score_mode == "row_path":
        joined = joined.withColumn("drift_score", row_path_score_expr())
    else:
        joined = joined.withColumn(
            "drift_score",
            F.when(weight_mass > 0, F.least(F.lit(1.0), contrib / weight_mass)).otherwise(
                F.lit(0.0)
            ),
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
