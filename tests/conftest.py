from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
# data-dependent oracle builders (e.g. _ann_pq_sql's codebook refit) must
# read the same scale factor the tests compare at
os.environ.setdefault("SPARK_GRAFT_SF_DIR_TEST", SF_DIR)


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("drift-engine-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        # the wide profile/correlation aggregates carry hundreds of buffer
        # fields; the default maxFields=100 silently drops them out of
        # whole-stage codegen into interpreted aggregation (measured ~3x on
        # the correlation family)
        .config("spark.sql.codegen.maxFields", "2000")
        .config("spark.driver.memory", "4g")
        # avoid JIT code-cache exhaustion across the many codegen-heavy tests
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").cache()


@pytest.fixture(scope="session")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").cache()
