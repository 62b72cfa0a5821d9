"""Versioned parquet snapshot store: the Delta-less time-travel path.

The sandbox has no delta-spark, so the reference's version-pair entry
point (table_path + reference_version/current_version,
data_loader.py:24/:56) was unit-only; this store gives it a fully
EXECUTED round-trip — write v0/v1, load by version, latest-version
lookup, and the whole runner lifecycle — with the same config keys a
real Delta table would use."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_data_drift_detector_spark.sources.snapshot import (
    latest_version,
    list_parquet_versions,
    load_snapshot,
    write_versioned_snapshot,
)


def test_versioned_roundtrip(spark, tmp_path):
    path = str(tmp_path / "vtable")
    v0 = spark.range(10).withColumn("x", F.col("id") * 2.0)
    v1 = spark.range(20).withColumn("x", F.col("id") * 3.0)
    assert write_versioned_snapshot(v0, path) == 0
    assert write_versioned_snapshot(v1, path) == 1  # auto-increments
    assert list_parquet_versions(spark, path) == [0, 1]
    assert latest_version(spark, path) == 1

    # explicit-version load, latest-by-default, fmt auto-detection
    assert load_snapshot(spark, path, 0).count() == 10
    assert load_snapshot(spark, path, 1, fmt="vparquet").count() == 20
    assert load_snapshot(spark, path).count() == 20
    got = {r["id"]: r["x"] for r in load_snapshot(spark, path, 0).collect()}
    assert got[3] == 6.0

    # explicit version numbers may skip; rewriting one must refuse
    assert write_versioned_snapshot(v0, path, version=5) == 5
    assert latest_version(spark, path) == 5
    with pytest.raises(Exception):
        write_versioned_snapshot(v1, path, version=5)
    # the failed write must not have clobbered version 5
    assert load_snapshot(spark, path, 5).count() == 10


def test_versioned_runner_lifecycle(spark, tmp_path):
    """The reference's canonical entry point, executed end-to-end against
    the versioned store: config carries only table_path + versions."""
    from pyspark_data_drift_detector_spark.runner import run_data_drift_detection

    path = str(tmp_path / "vtable2")
    base = spark.range(300).selectExpr(
        "CAST(id AS DOUBLE) AS amount", "CAST(id % 3 AS STRING) AS cat"
    )
    write_versioned_snapshot(base, path)
    write_versioned_snapshot(
        base.withColumn("amount", F.col("amount") * 10), path
    )
    report = run_data_drift_detection(
        spark,
        {
            "table_path": path,
            "reference_version": 0,
            "current_version": 1,
            "sample_size": 0,
        },
    )
    assert report["drift_detected"] is True
    amount_rows = [
        r for r in report["results"]
        if r["column_name"] == "amount" and r["drift_detected"]
    ]
    assert amount_rows, report["drift_summary"]

    with pytest.raises(Exception):  # missing version surfaces, not silence
        run_data_drift_detection(
            spark,
            {"table_path": path, "reference_version": 7, "current_version": 1},
        )


def test_versioned_empty_store(spark, tmp_path):
    path = str(tmp_path / "empty_vtable")
    assert list_parquet_versions(spark, path) == []
    with pytest.raises(ValueError, match="no versions"):
        load_snapshot(spark, path, fmt="vparquet")
