"""Result summarization: long-format rows → drift summary → nested report.

The reference maintains two competing result shapes (SURVEY §1.1): long
rows (``result_handler.py:14-21``) and a nested dict serialized to a JSON
blob (``data_drift_detector.py:261-272``). Here the long-format result
DataFrame from ``pipeline.detect_drift`` is canonical, and the nested
report derives FROM it — single source of truth.

Summary aggregations (severity counts, top drifted columns, per-dimension
averages — ``result_handler.py:93-161``) run as Spark jobs over the tiny
result table; only O(columns) rows are ever collected.
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_data_drift_detector_spark.functions.scoring import (
    drift_assessment,
    generate_recommendations,
)


def severity_counts(results_df: DataFrame, dimension_id: str = "all") -> dict[str, int]:
    """Counts by severity band (``result_handler.py:93-104``)."""
    rows = (
        results_df.filter(F.col("dimension_id") == dimension_id)
        .groupBy("drift_severity")
        .count()
        .collect()
    )
    return {r["drift_severity"]: r["count"] for r in rows}


def top_drifted_columns(results_df: DataFrame, n: int = 5, dimension_id: str = "all") -> list[dict]:
    """Top-N columns by drift score (``result_handler.py:107-109``)."""
    rows = (
        results_df.filter(F.col("dimension_id") == dimension_id)
        .orderBy(F.col("drift_score").desc(), F.col("column_name").asc())
        .limit(n)
        .collect()
    )
    return [
        {
            "column": r["column_name"],
            "drift_score": r["drift_score"],
            "severity": r["drift_severity"],
        }
        for r in rows
    ]


def dimension_summary(results_df: DataFrame, n: int = 5) -> list[dict]:
    """Avg drift + row count per dimension (``result_handler.py:155-161``)."""
    rows = (
        results_df.filter(F.col("dimension_id") != "all")
        .groupBy("dimension_id")
        .agg(F.avg("drift_score").alias("avg_drift"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("avg_drift").desc(), F.col("dimension_id").asc())
        .limit(n)
        .collect()
    )
    return [
        {"dimension_id": r["dimension_id"], "avg_drift_score": r["avg_drift"], "count": r["n"]}
        for r in rows
    ]


def build_report(
    results_df: DataFrame,
    schema_analysis: dict[str, Any] | None = None,
    execution_time_sec: float | None = None,
) -> dict[str, Any]:
    """Nested report dict in the shape of ``data_drift_detector.py:216-244``."""
    collected = results_df.collect()
    by_type: dict[str, list] = {}
    for row in collected:
        by_type.setdefault(row["column_type"], []).append(row)

    def _drift_cols(kind: str) -> list[str]:
        return sorted(
            {r["column_name"] for r in by_type.get(kind, []) if r["drift_detected"]}
        )

    num_cols = _drift_cols("numerical")
    cat_cols = _drift_cols("categorical")
    corr_rows = by_type.get("correlation", [])
    group_rows = by_type.get("group", [])
    drift_dimensions = sorted(
        {r["column_name"] for r in group_rows if r["drift_detected"]}
    )

    drift_summary: dict[str, Any] = {
        "numerical_drift_count": len(num_cols),
        "numerical_drift_columns": num_cols,
        "categorical_drift_count": len(cat_cols),
        "categorical_drift_columns": cat_cols,
        "correlation_drift": {
            "significant_correlation_shifts": sum(1 for r in corr_rows if r["drift_detected"]),
            "new_correlations": sum(
                1 for r in corr_rows if "new_strong_correlation" in (r["drift_causes"] or [])
            ),
            "disappeared_correlations": sum(
                1
                for r in corr_rows
                if "disappeared_strong_correlation" in (r["drift_causes"] or [])
            ),
        },
        "group_drift": {
            "drift_dimension_count": len(drift_dimensions),
            "drift_dimensions": drift_dimensions,
            "drifted_groups": sum(1 for r in group_rows if r["drift_detected"]),
        },
    }
    drift_detected = bool(num_cols or cat_cols or drift_dimensions)

    report: dict[str, Any] = {
        "drift_detected": drift_detected,
        "drift_summary": drift_summary,
        "schema_analysis": schema_analysis or {},
        "results": [row.asDict() for row in collected],
    }
    report["overall_assessment"] = drift_assessment(drift_summary)
    report["recommendations"] = generate_recommendations(report)
    if execution_time_sec is not None:
        report["execution_time_sec"] = execution_time_sec
    return report


def save_results_blob(
    spark,
    report: dict[str, Any],
    output_path: str,
    fmt: str = "parquet",
) -> None:
    """One-row JSON-blob append (S4 sink, ``data_drift_detector.py:246-281``)."""
    payload = {k: v for k, v in report.items() if k != "results"}
    row = [
        (
            time.strftime("%Y-%m-%d %H:%M:%S"),
            json.dumps(payload, default=str),
        )
    ]
    df = spark.createDataFrame(row, "run_timestamp string, results_json string")
    writer = df.write.format(fmt).mode("append")
    if fmt == "delta":
        writer = writer.option("mergeSchema", "true")
    writer.save(output_path)
