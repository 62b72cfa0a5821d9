"""End-to-end run lifecycle: config → snapshots → pipeline → report → sink.

Reimplements the reference's canonical entry point
``run_data_drift_detection(config_path)`` (``data_drift_detector.py:423-446``)
with the SURVEY §3 lifecycle collapsed to a constant number of Spark jobs.
Also restores the intent of the never-applied ``sample_size`` config
(SURVEY §4: ``DataLoader.sample_data`` has no callers in the reference).
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from pyspark_data_drift_detector_spark.config import DriftConfig, load_config
from pyspark_data_drift_detector_spark.operators.schema_drift import schema_diff
from pyspark_data_drift_detector_spark.pipeline import detect_drift
from pyspark_data_drift_detector_spark.report import build_report, save_results_blob
from pyspark_data_drift_detector_spark.sources.snapshot import (
    load_snapshot,
    sample_bounded,
    write_results,
)


def run_data_drift_detection(
    spark: SparkSession,
    config: DriftConfig | dict[str, Any] | str,
    df_ref: DataFrame | None = None,
    df_curr: DataFrame | None = None,
) -> dict[str, Any]:
    """Full drift-detection run. ``config`` may be a path, dict, or DriftConfig.

    Snapshots come from ``table_path`` + versions unless DataFrames are
    passed directly (the harness path). Returns the nested report dict;
    writes results to ``output_table``/``output_path`` when configured.
    """
    t0 = time.perf_counter()
    if isinstance(config, str):
        cfg = load_config(config)
    elif isinstance(config, DriftConfig):
        cfg = config
    else:
        cfg = DriftConfig(config)

    if df_ref is None or df_curr is None:
        table_path = cfg.get("table_path")
        if not table_path:
            raise ValueError("config.table_path required when DataFrames are not passed")
        df_ref = load_snapshot(spark, table_path, cfg.get("reference_version"))
        df_curr = load_snapshot(spark, table_path, cfg.get("current_version"))

    sample_size = int(cfg.get("sample_size") or 0)
    if sample_size > 0:
        df_ref = sample_bounded(df_ref, sample_size)
        df_curr = sample_bounded(df_curr, sample_size)

    schema_analysis = schema_diff(df_ref.schema, df_curr.schema)

    results_df = detect_drift(df_ref, df_curr, cfg)

    output = cfg.get("output_table") or cfg.get("output_path")
    if output:
        write_results(results_df, output, fmt=cfg.get("output_format", "parquet"))

    report = build_report(
        results_df,
        schema_analysis=schema_analysis,
        execution_time_sec=round(time.perf_counter() - t0, 3),
    )
    blob_path = cfg.get("results_blob_path")
    if blob_path:
        save_results_blob(spark, report, blob_path, fmt=cfg.get("output_format", "parquet"))
    return report


def main() -> None:
    """CLI: ``python -m pyspark_data_drift_detector_spark.runner <config.json>``."""
    import json
    import sys

    if len(sys.argv) != 2:
        print("usage: python -m pyspark_data_drift_detector_spark.runner <config.json>")
        raise SystemExit(2)
    spark = (
        SparkSession.builder.appName("drift-detection")
        .config("spark.sql.adaptive.enabled", "true")
        # the wide profile/correlation aggregates carry hundreds of buffer
        # fields; the default maxFields=100 silently drops them out of
        # whole-stage codegen into interpreted aggregation (measured ~3x on
        # the correlation family)
        .config("spark.sql.codegen.maxFields", "2000")
        .getOrCreate()
    )
    report = run_data_drift_detection(spark, sys.argv[1])
    printable = {k: v for k, v in report.items() if k != "results"}
    print(json.dumps(printable, indent=2, default=str))


if __name__ == "__main__":
    main()
