"""Multivariate anomaly drift via PCA reconstruction error (SURVEY §2.9 M15).

Reference pipeline: assemble → StandardScaler (fit on ref) → PCA(k=min(10,n),
fit on ref) → reconstruction error via a per-row Python UDF → anomaly =
error > μ_ref + 3σ_ref → compare anomaly rates and mean errors
(``rare_event_analyzer.py:187-345``).

Execution shape here (same math, no ML library in the data path):

1. ONE wide aggregate over ref computes n, per-column mean/stddev and all
   p·(p−1)/2 pairwise Pearson correlations. Standardizing (the reference's
   ``StandardScaler(withMean=True, withStd=True)``) makes the covariance of
   the scaled data exactly this correlation matrix, so PCA-on-scaled ≡
   eigen-decomposition of the p×p correlation matrix — an O(p³) numpy
   ``eigh`` on the driver (p = number of columns, tiny; the DATA never
   leaves the JVM).
2. Reconstruction error per row is pure expression math with the fitted
   means/stds/components folded in as literals: because components are
   orthonormal, ``‖z − PPᵀz‖² = ‖z‖² − ‖Pᵀz‖²`` — a handful of fused
   multiply-adds inside whole-stage codegen. The reference's only Python
   UDF (``rare_event_analyzer.py:268-277``) has no runtime descendant here.

Total: 4 Spark jobs (fit agg, ref error stats, ref rates, curr rates), all
single-scan wide aggregates — the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _valid_rows(df: DataFrame, columns: list[str]) -> DataFrame:
    """handleInvalid='skip' semantics: drop rows with any null/NaN feature."""
    cond = F.lit(True)
    for c in columns:
        dc = F.col(c).cast("double")
        cond = cond & dc.isNotNull() & ~F.isnan(dc)
    return df.select(*[F.col(c).cast("double").alias(c) for c in columns]).filter(cond)


def _error_expr(
    columns: list[str], means: list[float], stds: list[float], components: list[list[float]]
) -> Column:
    """‖z‖² − ‖Pᵀz‖² with fitted constants folded into the expression tree."""
    zs: list[Column] = []
    for c, mu, sd in zip(columns, means, stds):
        # StandardScaler convention: zero-variance coordinate → 0
        zs.append((F.col(c) - F.lit(mu)) / F.lit(sd) if sd > 0 else F.lit(0.0))
    sq_norm = None
    for z in zs:
        sq_norm = z * z if sq_norm is None else sq_norm + z * z
    proj_sq = None
    for comp in components:  # k dot products Σ p_ij·z_i
        dot = None
        for w, z in zip(comp, zs):
            term = F.lit(float(w)) * z
            dot = term if dot is None else dot + term
        proj_sq = dot * dot if proj_sq is None else proj_sq + dot * dot
    return (sq_norm - proj_sq).alias("reconstruction_error")


def _fit_scaler_components(
    ref_valid: DataFrame,
    columns: list[str],
    k: int,
    components: list[list[float]] | None,
):
    """Shared ref-side fit: one wide aggregate for means/stds (plus the
    correlation matrix when ``components`` is not pre-supplied) and the
    driver-side eigen-decomposition. Returns ``(n, means, stds,
    components, explained)``; ``n < 2`` means not enough valid rows."""
    import numpy as np

    p = len(columns)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [F.avg(F.col(c)).alias(f"{c}__mu"), F.stddev(F.col(c)).alias(f"{c}__sd")]
    fit_corr = components is None
    if fit_corr:
        for i in range(p):
            for j in range(i + 1, p):
                aggs.append(F.corr(F.col(columns[i]), F.col(columns[j])).alias(f"__r_{i}_{j}"))
    fit = ref_valid.agg(*aggs).first()
    if fit["__n"] < 2:
        return fit["__n"], [], [], [], []
    means = [float(fit[f"{c}__mu"]) for c in columns]
    stds = [float(fit[f"{c}__sd"] or 0.0) for c in columns]
    if fit_corr:
        corr = np.eye(p)
        for i in range(p):
            for j in range(i + 1, p):
                r = fit[f"__r_{i}_{j}"]
                corr[i, j] = corr[j, i] = 0.0 if r is None or np.isnan(r) else float(r)
        eigvals, eigvecs = np.linalg.eigh(corr)
        order = np.argsort(eigvals)[::-1]
        eigvals = np.clip(eigvals[order], 0.0, None)
        components = [[float(w) for w in eigvecs[:, idx]] for idx in order[:k]][:k]
        total_var = float(eigvals.sum()) or 1.0
        explained = [float(v) / total_var for v in eigvals[:k]]
    else:
        components = [list(map(float, row)) for row in components[:k]]
        explained = []
    return int(fit["__n"]), means, stds, components, explained


def pca_error_contributions(
    df_ref: DataFrame,
    df_curr: DataFrame,
    columns: list[str],
    k: int | None = None,
    components: list[list[float]] | None = None,
) -> DataFrame:
    """Per-column EXPLANATION of the PCA reconstruction error: how much
    of the residual ``‖z − PPᵀz‖²`` each coordinate carries, per side,
    and how that mix shifted — "the anomaly score went up; WHICH
    column's relationship to the others broke?" (``pca_anomaly_drift``
    reports that it happened; this reports where).

    Per column and side: mean squared residual coordinate
    ``E[(z_i − (PPᵀz)_i)²]`` over valid rows and its share of the total
    residual. Scaler and components fit on ref only (the
    ``pca_anomaly_drift`` convention); pass pre-fitted ``components``
    to skip the eigen-fit and keep the whole path SQL-replayable.

    Shape: the fit aggregate, then ONE side-tagged wide aggregate over
    both snapshots (fitted constants folded in as literals — expression
    math inside whole-stage codegen, no UDF, no shuffle beyond the
    1-row aggregates). Output: ``column_name, ref_contrib,
    curr_contrib, ref_share, curr_share, share_abs_diff``.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    if len(columns) < 2:
        raise ValueError("need at least 2 columns")
    ensure_safe_columns(columns)
    p = len(columns)
    k = min(k if k is not None else min(10, p), p)
    ref_valid = _valid_rows(df_ref, columns)
    curr_valid = _valid_rows(df_curr, columns)
    n, means, stds, components, _ = _fit_scaler_components(
        ref_valid, columns, k, components
    )
    if n < 2:
        raise ValueError("not enough valid reference rows")

    def resid_sq(df: DataFrame, side: str) -> DataFrame:
        zs: list[Column] = []
        for c, mu, sd in zip(columns, means, stds):
            zs.append((F.col(c) - F.lit(mu)) / F.lit(sd) if sd > 0 else F.lit(0.0))
        dots = []
        for comp in components:
            dot = None
            for w, z in zip(comp, zs):
                term = F.lit(float(w)) * z
                dot = term if dot is None else dot + term
            dots.append(dot)
        outs = [F.lit(side).alias("side")]
        for i in range(p):
            recon = None
            for m, comp in enumerate(components):
                term = F.lit(float(comp[i])) * dots[m]
                recon = term if recon is None else recon + term
            r = zs[i] - recon
            outs.append((r * r).alias(f"__r2_{i}"))
        return df.select(*outs)

    wide = (
        resid_sq(ref_valid, "r")
        .unionByName(resid_sq(curr_valid, "c"))
        .groupBy("side")
        .agg(*[F.avg(f"__r2_{i}").alias(f"__m_{i}") for i in range(p)])
    )
    tot = " + ".join(f"coalesce(__m_{i}, 0.0D)" for i in range(p))
    long = wide.selectExpr(
        "side",
        f"({tot}) AS __tot",
        "inline(array("
        + ", ".join(
            f"named_struct('column_name', '{c}', 'contrib', __m_{i})"
            for i, c in enumerate(columns)
        )
        + "))",
    ).selectExpr(
        "side",
        "column_name",
        "contrib",
        "contrib / greatest(__tot, 1e-300D) AS share",
    )
    return (
        long.groupBy("column_name")
        .pivot("side", ["r", "c"])
        .agg(F.first("contrib").alias("contrib"), F.first("share").alias("share"))
        .selectExpr(
            "column_name",
            "r_contrib AS ref_contrib",
            "c_contrib AS curr_contrib",
            "r_share AS ref_share",
            "c_share AS curr_share",
            "abs(c_share - r_share) AS share_abs_diff",
        )
    )


def pca_anomaly_drift(
    df_ref: DataFrame,
    df_curr: DataFrame,
    columns: list[str],
    k: int | None = None,
    threshold: float = 3.0,
    components: list[list[float]] | None = None,
) -> dict:
    """Compare multivariate anomaly rates between snapshots.

    Returns the reference's result dict shape (status/is_significant/rates/
    changes/severity). Fit happens on ref only; curr is scored with ref's
    scaler, components, and anomaly threshold (deliberate semantics,
    ``rare_event_analyzer.py:151-153`` pattern).

    ``components``: optional pre-fitted orthonormal rows (k × p). When
    given, the eigen-fit is skipped and ONLY data-derived aggregates
    (means/stds/error stats/rates) are computed — every remaining step is
    plain SQL math, which is what makes the ``pca_anomaly`` driver query
    oracle-replayable in DuckDB with the same literal components.
    """
    if len(columns) < 2:
        return {"status": "skipped", "reason": "need at least 2 columns"}
    p = len(columns)
    k = min(k if k is not None else min(10, p), p)

    ref_valid = _valid_rows(df_ref, columns)
    curr_valid = _valid_rows(df_curr, columns)

    # --- fit: one wide aggregate (means, stds, correlations) ---
    n, means, stds, components, explained = _fit_scaler_components(
        ref_valid, columns, k, components
    )
    if n < 2:
        return {"status": "skipped", "reason": "not enough valid reference rows"}

    err = _error_expr(columns, means, stds, components)

    stats = ref_valid.select(err).agg(
        F.mean("reconstruction_error").alias("mu"),
        F.stddev("reconstruction_error").alias("sigma"),
    ).first()
    mu, sigma = stats["mu"], stats["sigma"]
    if sigma is None or sigma == 0:
        return {
            "status": "skipped",
            "reason": "Reference data has zero standard deviation in reconstruction error",
        }
    bound = mu + threshold * sigma

    def _counts(valid: DataFrame) -> tuple[int, int, float]:
        row = valid.select(err).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("reconstruction_error") > bound).cast("long")).alias("anom"),
            F.mean("reconstruction_error").alias("mean_err"),
        ).first()
        return row["n"], row["anom"] or 0, row["mean_err"] or 0.0

    ref_n, ref_anom, ref_mean_err = _counts(ref_valid)
    curr_n, curr_anom, curr_mean_err = _counts(curr_valid)
    ref_ratio = ref_anom / ref_n if ref_n else 0.0
    curr_ratio = curr_anom / curr_n if curr_n else 0.0

    error_change = (curr_mean_err - ref_mean_err) / ref_mean_err if ref_mean_err > 0 else 0.0
    if ref_ratio > 0:
        anomaly_change = (curr_ratio - ref_ratio) / ref_ratio
    elif curr_ratio > 0:
        anomaly_change = 1.0
    else:
        anomaly_change = 0.0
    is_significant = abs(error_change) >= 0.3 or abs(anomaly_change) >= 0.5

    return {
        "status": "success",
        "is_significant": is_significant,
        "columns_analyzed": columns,
        "ref_mean_error": float(ref_mean_err),
        "curr_mean_error": float(curr_mean_err),
        "error_change": float(error_change),
        "ref_anomaly_count": int(ref_anom),
        "curr_anomaly_count": int(curr_anom),
        "ref_anomaly_ratio": float(ref_ratio),
        "curr_anomaly_ratio": float(curr_ratio),
        "anomaly_change": float(anomaly_change),
        "explained_variance": explained,
        "severity": "high"
        if is_significant and (abs(error_change) >= 0.5 or abs(anomaly_change) >= 1.0)
        else "medium",
    }
