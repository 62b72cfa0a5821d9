"""Correlation family, schema drift, adaptive thresholds, scoring, PCA anomaly."""

import random

import pytest
from pyspark.sql import types as T

from pyspark_data_drift_detector_spark.functions.scoring import (
    drift_assessment,
    drift_severity,
    generate_recommendations,
)
from pyspark_data_drift_detector_spark.functions.thresholds import (
    adaptive_categorical_threshold,
    adaptive_numerical_threshold,
    adjust_threshold_for_sample_size,
    compose_threshold,
    size_factor,
)
from pyspark_data_drift_detector_spark.operators.correlation import (
    correlation_group_changes,
    correlation_groups,
    correlation_pairs,
    correlation_shifts,
    feature_importance_drift,
)
from pyspark_data_drift_detector_spark.operators.schema_drift import (
    complex_column_profile,
    is_compatible_type_change,
    schema_diff,
)


@pytest.fixture(scope="module")
def corr_pair(spark):
    rng = random.Random(11)
    ref_rows, curr_rows = [], []
    for _ in range(2000):
        x = rng.gauss(0, 1)
        # ref: y strongly correlated with x; curr: decorrelated
        ref_rows.append((x, x * 2 + rng.gauss(0, 0.1), rng.gauss(0, 1)))
        x2 = rng.gauss(0, 1)
        curr_rows.append((x2, rng.gauss(0, 1), rng.gauss(0, 1)))
    schema = "x double, y double, z double"
    return (
        spark.createDataFrame(ref_rows, schema).cache(),
        spark.createDataFrame(curr_rows, schema).cache(),
    )


def test_correlation_pairs_and_shifts(corr_pair):
    ref, curr = corr_pair
    pairs = correlation_pairs(ref, curr, ["x", "y", "z"])
    rows = {(r["col1"], r["col2"]): r for r in correlation_shifts(pairs).collect()}
    assert len(rows) == 3
    xy = rows[("x", "y")]
    assert xy["ref_correlation"] > 0.95
    assert abs(xy["curr_correlation"]) < 0.1
    assert xy["significant_shift"]
    assert xy["change_type"] == "weaker"
    assert xy["disappeared_strong_correlation"]
    assert xy["correlation_type"] == "positive"
    assert not rows[("x", "z")]["significant_shift"]


def test_correlation_groups(corr_pair):
    ref, curr = corr_pair
    rows = correlation_pairs(ref, curr, ["x", "y", "z"]).collect()
    ref_groups = correlation_groups(rows, 0.7, "ref")
    assert ref_groups == [{"x", "y"}]
    assert correlation_groups(rows, 0.7, "curr") == []
    changes = correlation_group_changes(rows, 0.7)
    assert changes["ref_group_count"] == 1
    assert changes["group_changes"][0]["dissolved"]


def test_feature_importance(corr_pair):
    ref, curr = corr_pair
    rows = {r["column"]: r for r in feature_importance_drift(ref, curr, "y", ["x", "z"]).collect()}
    assert rows["x"]["ref_importance"] > 0.95
    assert rows["x"]["curr_importance"] < 0.1
    assert rows["x"]["change_type"] == "decreased"
    assert rows["x"]["ref_rank"] == 1


def test_schema_diff():
    ref = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
            T.StructField("gone", T.DoubleType()),
            T.StructField("narrowed", T.LongType()),
            T.StructField(
                "nested",
                T.StructType([T.StructField("f1", T.IntegerType()), T.StructField("f2", T.StringType())]),
            ),
        ]
    )
    curr = T.StructType(
        [
            T.StructField("a", T.LongType()),  # compatible widening
            T.StructField("b", T.StringType()),
            T.StructField("added", T.StringType()),
            T.StructField("narrowed", T.IntegerType()),  # incompatible
            T.StructField("nested", T.StructType([T.StructField("f1", T.IntegerType())])),
        ]
    )
    diff = schema_diff(ref, curr)
    assert diff["added_columns"] == ["added"]
    assert diff["removed_columns"] == ["gone"]
    tc = {c["column"]: c for c in diff["type_changes"]}
    assert tc["a"]["is_compatible"]
    assert not tc["narrowed"]["is_compatible"]
    nested = [d for d in diff["nested_differences"] if d["change_type"] == "field_removed"]
    assert nested[0]["column"] == "nested.f2"
    assert diff["schema_drift_risk"]["overall_risk"] == "high"
    assert diff["schema_version_compatibility"] == "incompatible"


def test_compat_matrix():
    assert is_compatible_type_change(T.IntegerType(), T.LongType())
    assert not is_compatible_type_change(T.LongType(), T.IntegerType())
    assert not is_compatible_type_change(T.StringType(), T.IntegerType())


def test_complex_column_profile(spark):
    rows_ref = [([1, 2], {"k": 1.0}) for _ in range(90)] + [(None, None) for _ in range(10)]
    rows_curr = [([1, 2, 3, 4], {"k": 1.0, "j": 2.0}) for _ in range(70)] + [
        (None, None) for _ in range(30)
    ]
    schema = "arr array<int>, m map<string,double>"
    ref = spark.createDataFrame(rows_ref, schema)
    curr = spark.createDataFrame(rows_curr, schema)
    out = {r["column_name"]: r for r in complex_column_profile(ref, curr).collect()}
    arr = out["arr"]
    assert arr["ref_avg_size"] == pytest.approx(2.0)
    assert arr["curr_avg_size"] == pytest.approx(4.0)
    assert arr["avg_size_rel_change"] == pytest.approx(1.0)
    assert arr["null_ratio_change"] == pytest.approx(0.2)
    assert arr["drift_detected"]


def test_threshold_functions():
    assert size_factor(50) == 2.0
    assert size_factor(5_000_000) == 0.6
    assert compose_threshold(0.1, 500, 5) == pytest.approx(0.1 * 1.5 * 0.9)
    # CV interp: cv=0.55 → min + (max-min)*(0.45/0.9)
    assert adaptive_numerical_threshold(10, 5.5) == pytest.approx(0.05 + 0.45 * 0.5)
    assert adaptive_numerical_threshold(0, 5) == 0.2  # mean=0 → base
    # uniform distribution → min threshold
    import math

    ent = math.log(4)
    assert adaptive_categorical_threshold(ent, 4) == 0.05
    assert adjust_threshold_for_sample_size(0.1, 100, 100) == 0.1
    assert adjust_threshold_for_sample_size(0.1, 1, 1000) == pytest.approx(0.2)


def test_scoring():
    assert drift_severity(0.05) == "None"
    assert drift_severity(0.3) == "Medium"
    assert drift_severity(0.9) == "Critical"
    assert "HIGH" in drift_assessment({"numerical_drift_count": 11})
    assert "LOW" in drift_assessment({"numerical_drift_count": 1})
    recs = generate_recommendations(
        {
            "schema_analysis": {"added_columns": ["x"]},
            "drift_summary": {"numerical_drift_columns": ["a", "b", "c", "d"]},
            "drift_detected": True,
        }
    )
    assert any("schema" in r.lower() for r in recs)
    assert any("a, b, c..." in r for r in recs)


def test_pca_anomaly(spark):
    from pyspark_data_drift_detector_spark.operators.anomaly import pca_anomaly_drift

    rng = random.Random(5)
    ref = spark.createDataFrame(
        [(rng.gauss(0, 1), rng.gauss(0, 1), rng.gauss(0, 1)) for _ in range(2000)],
        "a double, b double, c double",
    )
    # curr breaks the covariance structure for 10% of rows
    curr_rows = [(rng.gauss(0, 1), rng.gauss(0, 1), rng.gauss(0, 1)) for _ in range(1800)]
    curr_rows += [(rng.gauss(20, 1), rng.gauss(-20, 1), rng.gauss(20, 1)) for _ in range(200)]
    curr = spark.createDataFrame(curr_rows, "a double, b double, c double")
    res = pca_anomaly_drift(ref, curr, ["a", "b", "c"], k=2)
    assert res["status"] == "success"
    assert res["curr_anomaly_ratio"] > res["ref_anomaly_ratio"]
    assert res["is_significant"]
    assert res["severity"] == "high"


def test_mutual_information_dependency_extremes(spark):
    """NMI is 1 for a deterministic pair, ~0 for an independent pair; a
    ref→curr decoupling is flagged."""
    from pyspark.sql import functions as F

    from pyspark_data_drift_detector_spark.operators.correlation import (
        mutual_information_drift,
    )

    base = spark.range(400)
    # ref: y fully determined by x; curr: y independent of x
    ref = base.select((F.col("id") % 4).cast("string").alias("x")).withColumn(
        "y", F.col("x")
    )
    curr = base.select(
        (F.col("id") % 4).cast("string").alias("x"),
        (F.col("id") % 5).cast("string").alias("y"),
    )
    row = mutual_information_drift(ref, curr, [("x", "y")]).collect()[0]
    assert row["ref_nmi"] == pytest.approx(1.0, abs=1e-9)
    assert row["curr_nmi"] == pytest.approx(0.0, abs=1e-6)
    assert row["drift_detected"]

    # identical sides -> no drift
    same = mutual_information_drift(ref, ref, [("x", "y")]).collect()[0]
    assert same["nmi_abs_diff"] == pytest.approx(0.0, abs=1e-12)
    assert not same["drift_detected"]


def test_pca_error_contributions_localizes_break(spark):
    """When one column decouples from a previously tight 2D relationship,
    the residual-share panel must point at it: shares sum to 1 per side,
    and the decoupled coordinate's current share dominates."""
    import numpy as np

    from pyspark_data_drift_detector_spark.operators.anomaly import (
        pca_error_contributions,
    )

    rng = np.random.default_rng(3)
    n = 400
    x = rng.normal(size=n)
    noise = rng.normal(scale=0.05, size=n)
    # ref: y tracks x, z independent; k=1 captures the (x, y) line
    ref_rows = [
        (float(a), float(a + e), float(w))
        for a, e, w in zip(x, noise, rng.normal(size=n))
    ]
    # curr: y decouples from x entirely
    curr_rows = [
        (float(a), float(b), float(w))
        for a, b, w in zip(x, rng.normal(size=n), rng.normal(size=n))
    ]
    ref = spark.createDataFrame(ref_rows, "x double, y double, z double")
    curr = spark.createDataFrame(curr_rows, "x double, y double, z double")
    out = {
        r["column_name"]: r
        for r in pca_error_contributions(ref, curr, ["x", "y", "z"], k=1).collect()
    }
    for side in ("ref_share", "curr_share"):
        assert sum(r[side] for r in out.values()) == pytest.approx(1.0)
    # the first component is the x~y line; with y decoupled, x and y carry
    # the residual while z's share (which dominated on ref) collapses
    assert out["z"]["ref_share"] > 0.8
    assert out["z"]["curr_share"] < out["z"]["ref_share"]
    assert out["y"]["curr_share"] > out["y"]["ref_share"] + 0.2
    assert out["y"]["share_abs_diff"] > 0.2

    with pytest.raises(ValueError, match="at least 2"):
        pca_error_contributions(ref, curr, ["x"])
