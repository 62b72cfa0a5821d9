"""Unit tests for the pure statistical functions (no SparkSession)."""

import math

import pytest

from pyspark_data_drift_detector_spark.functions.stats import (
    chi2_p_value_ladder,
    chi2_sf,
    js_distance,
    percent_change,
    relative_diff,
)


class TestRelativeDiff:
    def test_zero_ref_nonzero_curr(self):
        # reference convention: numerical_analyzer.py:214-219
        assert relative_diff(0, 5) == 1.0

    def test_zero_ref_zero_curr(self):
        assert relative_diff(0, 0) == 0.0

    def test_signed(self):
        assert relative_diff(10, 5) == -0.5
        assert relative_diff(-10, -5) == 0.5

    def test_none(self):
        assert relative_diff(None, 5) is None


class TestPercentChange:
    def test_zero_conventions(self):
        # group_analyzer.py:516-532
        assert percent_change(0, 0) == 0.0
        assert percent_change(0, 3) == 1.0
        assert percent_change(None, 3) == 0.0


class TestJSDistance:
    def test_identical_is_zero(self):
        p = {"a": 0.5, "b": 0.5}
        assert js_distance(p, p) == 0.0

    def test_disjoint_is_one(self):
        # disjoint supports → JS divergence = 1 bit → distance 1
        assert js_distance({"a": 1.0}, {"b": 1.0}) == pytest.approx(1.0)

    def test_symmetric(self):
        p = {"a": 0.7, "b": 0.2, "c": 0.1}
        q = {"a": 0.4, "b": 0.4, "c": 0.2}
        assert js_distance(p, q) == pytest.approx(js_distance(q, p))

    def test_hand_computed(self):
        p = {"a": 1.0}
        q = {"a": 0.5, "b": 0.5}
        m_a, m_b = 0.75, 0.25
        kl_pm = 1.0 * math.log2(1.0 / m_a)
        kl_qm = 0.5 * math.log2(0.5 / m_a) + 0.5 * math.log2(0.5 / m_b)
        expected = math.sqrt((kl_pm + kl_qm) / 2)
        assert js_distance(p, q) == pytest.approx(expected)


class TestChi2:
    def test_ladder_steps(self):
        # df=1 → cv=3.84 (categorical_analyzer.py:410-437)
        assert chi2_p_value_ladder(0.0005, 1) == 1.0
        assert chi2_p_value_ladder(3.84 * 3 + 1, 1) == 0.001
        assert chi2_p_value_ladder(3.84 * 2 + 1, 1) == 0.01
        assert chi2_p_value_ladder(3.85, 1) == 0.05
        assert chi2_p_value_ladder(1.0, 1) == pytest.approx(
            min(1.0, max(0.05, 1.0 - (1.0 / 3.84) * 0.95))
        )

    def test_ladder_large_df(self):
        cv = 20 + math.sqrt(40)
        assert chi2_p_value_ladder(cv * 3 + 1, 20) == 0.001

    def test_exact_sf_known_values(self):
        # scipy.stats.chi2.sf reference values
        assert chi2_sf(3.841458820694124, 1) == pytest.approx(0.05, rel=1e-9)
        assert chi2_sf(5.991464547107979, 2) == pytest.approx(0.05, rel=1e-9)
        assert chi2_sf(18.307038053275146, 10) == pytest.approx(0.05, rel=1e-9)
        assert chi2_sf(0.0, 3) == 1.0
        assert chi2_sf(100.0, 1) < 1e-20
