"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The workload is the BASELINE.md bench definition: the drift-detection
analyzer families over lineitem/orders at sf0.1, plus the full pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("drift-engine-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    # JVM/codegen/parquet-footer warmup (not timed): one tiny agg + shuffle
    warm = spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet")
    warm.groupBy("r_name").count().collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    # full pipeline (numeric + categorical families end-to-end)
    from pyspark.sql import functions as F

    from pyspark_data_drift_detector_spark import detect_drift

    t0 = time.perf_counter()
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet")
    ref = df.filter(F.col("l_orderkey") % 2 == 0)
    curr = df.filter(F.col("l_orderkey") % 2 == 1)
    detect_drift(ref, curr).collect()
    dt = time.perf_counter() - t0
    timings["full_pipeline"] = round(dt, 3)
    total += dt

    print(
        json.dumps(
            {
                "metric": "drift_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
