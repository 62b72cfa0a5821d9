"""DP aggregate release (operators/constraints.py dp_release)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_dp_release_deterministic_and_bounded(spark, sf_dir):
    from pyspark_data_drift_detector_spark.operators.constraints import (
        dp_release,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    a = dp_release(cust, ["c_mktsegment"], epsilon=1.0).collect()
    b = dp_release(cust, ["c_mktsegment"], epsilon=1.0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # keyed PRF
    other = {
        r["c_mktsegment"]: r["noisy_count"]
        for r in dp_release(cust, ["c_mktsegment"], seed="dp2").collect()
    }
    exact = {
        r["c_mktsegment"]: r["n"]
        for r in cust.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    bound = (1.0 / 1.0) * math.log(1e6)  # |Lap| max under the 1e6 grid
    changed = 0
    for r in a:
        seg = r["c_mktsegment"]
        assert abs(r["noisy_count"] - exact[seg]) <= bound
        assert r["noisy_count"] != exact[seg]  # noise actually applied
        if other[seg] != r["noisy_count"]:
            changed += 1
    assert changed > 0  # the seed matters


def test_dp_release_clipped_sum_near_exact_at_huge_epsilon(spark):
    from pyspark_data_drift_detector_spark.operators.constraints import (
        dp_release,
    )

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.5), ("a", 99.0), ("b", 0.25), (None, 0.75)],
        "g string, v double",
    )
    out = {
        r["g"]: (r["noisy_count"], r["noisy_sum"])
        for r in dp_release(
            df, ["g"], epsilon=1e12, value_col="v", clip_lo=0.0,
            clip_hi=1.0,
        ).collect()
    }
    # clipping: -5 -> 0, 99 -> 1; noise ~ 1e-11 at eps 1e12
    assert out["a"][0] == pytest.approx(3.0, abs=1e-6)
    assert out["a"][1] == pytest.approx(1.5, abs=1e-6)
    assert out["b"][1] == pytest.approx(0.25, abs=1e-6)
    assert out[None][0] == pytest.approx(1.0, abs=1e-6)  # NULL group kept


def test_dp_release_threshold_and_validation(spark):
    from pyspark_data_drift_detector_spark.operators.constraints import (
        dp_release,
    )

    df = spark.createDataFrame(
        [("big",)] * 50 + [("tiny",)], "g string"
    )
    kept = {
        r["g"]
        for r in dp_release(
            df, ["g"], epsilon=1e12, min_noisy_count=10.0
        ).collect()
    }
    assert kept == {"big"}  # the rare group is suppressed
    with pytest.raises(ValueError, match="group_cols"):
        dp_release(df, [])
    with pytest.raises(ValueError, match="epsilon"):
        dp_release(df, ["g"], epsilon=0.0)
    with pytest.raises(ValueError, match="clip_hi"):
        dp_release(df, ["g"], value_col="g", clip_lo=1.0, clip_hi=1.0)
