"""Multivariate anomaly drift via PCA reconstruction error (SURVEY §2.9 M15).

Pipeline: assemble → StandardScaler (fit on ref) → PCA(k=min(10, n), fit on
ref) → reconstruction error → anomaly = error > μ_ref + 3σ_ref → compare
anomaly rates and mean errors (``rare_event_analyzer.py:187-345``).

Key improvement over the reference: its only Python UDF (the per-row
reconstruction-error lambda, ``rare_event_analyzer.py:268-277``) is replaced
with JVM-side expression math. Because PCA components are orthonormal,
``‖o − PPᵀo‖² = ‖o‖² − ‖Pᵀo‖²`` — the error is just the squared-norm
difference between the scaled vector and its projection, computed with
``vector_to_array`` + ``F.aggregate``. No Python in the hot path at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _reconstruction_errors(df: DataFrame) -> DataFrame:
    from pyspark.ml.functions import vector_to_array

    sq_norm = lambda col: F.aggregate(  # noqa: E731
        vector_to_array(col), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return df.withColumn(
        "reconstruction_error", sq_norm(F.col("__scaled")) - sq_norm(F.col("__pca"))
    )


def pca_anomaly_drift(
    df_ref: DataFrame,
    df_curr: DataFrame,
    columns: list[str],
    k: int | None = None,
    threshold: float = 3.0,
) -> dict:
    """Compare multivariate anomaly rates between snapshots.

    Returns the reference's result dict shape (status/is_significant/rates/
    changes/severity). Fit happens on ref only; curr is scored with ref's
    scaler, components, and anomaly threshold (deliberate semantics).
    """
    from pyspark.ml.feature import PCA, StandardScaler, VectorAssembler

    if len(columns) < 2:
        return {"status": "skipped", "reason": "need at least 2 columns"}
    k = k if k is not None else min(10, len(columns))
    k = min(k, len(columns))

    assembler = VectorAssembler(inputCols=columns, outputCol="__features", handleInvalid="skip")
    ref_feat = assembler.transform(df_ref.select(*columns))
    curr_feat = assembler.transform(df_curr.select(*columns))

    scaler = StandardScaler(
        inputCol="__features", outputCol="__scaled", withMean=True, withStd=True
    ).fit(ref_feat)
    pca = PCA(k=k, inputCol="__scaled", outputCol="__pca").fit(scaler.transform(ref_feat))

    ref_err = _reconstruction_errors(pca.transform(scaler.transform(ref_feat)))
    curr_err = _reconstruction_errors(pca.transform(scaler.transform(curr_feat)))

    stats = ref_err.agg(
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

    def _counts(err_df: DataFrame) -> tuple[int, int, float]:
        row = err_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("reconstruction_error") > bound).cast("long")).alias("anom"),
            F.mean("reconstruction_error").alias("mean_err"),
        ).first()
        return row["n"], row["anom"], row["mean_err"]

    ref_n, ref_anom, ref_mean_err = _counts(ref_err)
    curr_n, curr_anom, curr_mean_err = _counts(curr_err)
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
        "explained_variance": [float(v) for v in pca.explainedVariance],
        "severity": "high"
        if is_significant and (abs(error_change) >= 0.5 or abs(anomaly_change) >= 1.0)
        else "medium",
    }
