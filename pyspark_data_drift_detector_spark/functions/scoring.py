"""Assessment, severity bands, and the recommendations engine.

Pure functions over the drift summary (SURVEY §2.9 M23-M24). Semantics from
``data_drift_detector.py:286-421`` and ``result_handler.py:55-73``.
"""

from __future__ import annotations

from typing import Any


def drift_severity(score: float) -> str:
    """Score bands: None < .1 ≤ Low < .25 ≤ Medium < .5 ≤ High < .75 ≤ Critical
    (``result_handler.py:55-73``)."""
    if score < 0.1:
        return "None"
    if score < 0.25:
        return "Low"
    if score < 0.5:
        return "Medium"
    if score < 0.75:
        return "High"
    return "Critical"


def drift_assessment(drift_summary: dict[str, Any]) -> str:
    """Count drift instances across families → low/5<medium/10<high message
    (``data_drift_detector.py:286-343``)."""
    drift_count = 0
    drift_count += drift_summary.get("numerical_drift_count", 0)
    drift_count += drift_summary.get("categorical_drift_count", 0)
    dist = drift_summary.get("distribution_drift", {})
    drift_count += dist.get("numerical_distribution_drift_count", 0)
    drift_count += dist.get("categorical_distribution_drift_count", 0)
    corr = drift_summary.get("correlation_drift", {})
    drift_count += corr.get("significant_correlation_shifts", 0)
    grp = drift_summary.get("group_drift", {})
    drift_count += grp.get("drift_dimension_count", 0)
    feat = drift_summary.get("feature_importance_drift", {})
    drift_count += feat.get("significant_shifts_count", 0)

    severity = "low"
    if drift_count > 10:
        severity = "high"
    elif drift_count > 5:
        severity = "medium"

    messages = {
        "high": "Significant data drift detected across multiple dimensions and metrics.",
        "medium": "Moderate data drift detected in several columns and relationships.",
        "low": "Minor data drift detected in a few columns or metrics.",
    }
    return f"{messages[severity]} Severity: {severity.upper()}"


def _truncated_list(cols: list[str], n: int = 3) -> str:
    return f"{', '.join(cols[:n])}{'...' if len(cols) > n else ''}"


def generate_recommendations(results: dict[str, Any]) -> list[str]:
    """Rule list over the drift summary (``data_drift_detector.py:345-421``)."""
    recommendations: list[str] = []
    drift_summary = results.get("drift_summary", {})

    schema_analysis = results.get("schema_analysis", {})
    if schema_analysis.get("added_columns") or schema_analysis.get("removed_columns"):
        recommendations.append(
            "Review schema changes. Schema evolution may require updates to downstream processes."
        )

    num_cols = drift_summary.get("numerical_drift_columns", [])
    if num_cols:
        recommendations.append(
            f"Investigate numerical drift in {len(num_cols)} columns: {_truncated_list(num_cols)}"
        )
    cat_cols = drift_summary.get("categorical_drift_columns", [])
    if cat_cols:
        recommendations.append(
            f"Investigate categorical drift in {len(cat_cols)} columns: {_truncated_list(cat_cols)}"
        )
    if drift_summary.get("distribution_drift"):
        recommendations.append(
            "Review distribution changes. Significant shifts may impact statistical models and assumptions."
        )
    corr = drift_summary.get("correlation_drift", {})
    if corr:
        if corr.get("new_correlations", 0) > 0:
            recommendations.append(
                "New strong correlations detected. Consider updating feature engineering processes."
            )
        if corr.get("disappeared_correlations", 0) > 0:
            recommendations.append(
                "Previously strong correlations have weakened. Validate feature importance in models."
            )
    grp = drift_summary.get("group_drift", {})
    if grp:
        dims = grp.get("drift_dimensions", [])
        if dims:
            recommendations.append(
                f"Significant group-level drift detected in dimensions: {_truncated_list(dims)}"
            )
    feat = drift_summary.get("feature_importance_drift", {})
    if feat and feat.get("significant_shifts_count", 0) > 0:
        recommendations.append(
            "Feature importance has changed significantly. Consider retraining models."
        )
    if results.get("drift_detected", False):
        recommendations.append(
            "Consider monitoring affected columns more frequently to establish trends."
        )
    return recommendations
