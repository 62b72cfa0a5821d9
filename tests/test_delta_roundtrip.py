"""Real Delta Lake versionAsOf round-trip (S1/S2) — env-gated.

The sandbox image ships no delta-spark, so S1/S2 are otherwise verified
against mocks (test_snapshot_sources.py). This test upgrades them to a
real round-trip the day the image gains delta-spark: it writes a table,
overwrites it (version 1), and checks ``load_snapshot(version=0)`` /
``latest_version`` read both versions back exactly. Skipped-not-failed
while ``import delta`` is unavailable.
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip("delta")


@pytest.fixture(scope="module")
def delta_spark():
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-roundtrip")
        .config("spark.sql.shuffle.partitions", "4")
        .config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def test_version_as_of_roundtrip(delta_spark, tmp_path):
    from pyspark_data_drift_detector_spark.sources.snapshot import (
        latest_version,
        load_snapshot,
    )

    path = str(tmp_path / "tbl")
    delta_spark.range(5).write.format("delta").save(path)
    delta_spark.range(100, 103).write.format("delta").mode("overwrite").save(path)

    assert latest_version(delta_spark, path) == 1
    v0 = load_snapshot(delta_spark, path, version=0)
    v1 = load_snapshot(delta_spark, path, version=1)
    assert sorted(r["id"] for r in v0.collect()) == [0, 1, 2, 3, 4]
    assert sorted(r["id"] for r in v1.collect()) == [100, 101, 102]
