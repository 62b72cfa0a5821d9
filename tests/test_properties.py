"""Property-based sanity tests (SURVEY §5 item 4) over the pure functions.

No SparkSession needed — these run in milliseconds and pin the invariants the
reference enforces implicitly (score ∈ [0,1], JS symmetry/bounds, zero
conventions) across randomized inputs via hypothesis.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_data_drift_detector_spark.functions.scoring import drift_severity
from pyspark_data_drift_detector_spark.functions.stats import (
    chi2_p_value_ladder,
    chi2_sf,
    js_distance,
    percent_change,
    relative_diff,
)
from pyspark_data_drift_detector_spark.functions.thresholds import (
    cardinality_factor,
    categorical_volatility_factor,
    complexity_factor,
    numerical_volatility_factor,
    size_factor,
)

finite = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
)
weights = st.floats(min_value=0.0, max_value=1e6, allow_nan=False, allow_infinity=False)


def _dist(raw: dict[str, float]) -> dict[str, float]:
    total = sum(raw.values())
    if total <= 0:
        return {}
    return {k: v / total for k, v in raw.items()}


dists = st.dictionaries(
    st.sampled_from(list("abcdefgh")), weights, min_size=1, max_size=8
).map(_dist)


class TestJSDistance:
    @given(dists, dists)
    @settings(max_examples=200)
    def test_symmetric(self, p, q):
        assert math.isclose(js_distance(p, q), js_distance(q, p), abs_tol=1e-12)

    @given(dists, dists)
    @settings(max_examples=200)
    def test_bounded(self, p, q):
        d = js_distance(p, q)
        # sqrt of log2-JS divergence lies in [0, 1]
        assert -1e-12 <= d <= 1.0 + 1e-12

    @given(dists)
    def test_identity_is_zero(self, p):
        assert js_distance(p, p) <= 1e-7

    @given(dists)
    def test_disjoint_is_one(self, p):
        if not p:
            return
        q = {k + "_disjoint": v for k, v in p.items()}
        assert math.isclose(js_distance(p, q), 1.0, abs_tol=1e-9)


class TestChiSquare:
    @given(
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
        st.integers(min_value=1, max_value=200),
    )
    @settings(max_examples=200)
    def test_sf_in_unit_interval(self, x, df):
        p = chi2_sf(x, df)
        assert 0.0 <= p <= 1.0

    @given(st.integers(min_value=1, max_value=200))
    def test_sf_monotone_decreasing(self, df):
        xs = [0.0, 0.5, 1.0, 2.0, 5.0, 10.0, 50.0, 200.0]
        ps = [chi2_sf(x, df) for x in xs]
        assert all(a >= b - 1e-12 for a, b in zip(ps, ps[1:]))

    def test_sf_known_values(self):
        # chi2.sf(3.841, 1) ≈ 0.05; chi2.sf(5.991, 2) ≈ 0.05
        assert math.isclose(chi2_sf(3.841459, 1), 0.05, rel_tol=1e-4)
        assert math.isclose(chi2_sf(5.991465, 2), 0.05, rel_tol=1e-4)
        assert math.isclose(chi2_sf(18.307, 10), 0.05, rel_tol=1e-3)

    @given(
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
        st.integers(min_value=1, max_value=200),
    )
    @settings(max_examples=200)
    def test_ladder_in_unit_interval(self, x, df):
        p = chi2_p_value_ladder(x, df)
        assert 0.0 < p <= 1.0


class TestZeroConventions:
    @given(finite, finite)
    def test_relative_diff_matches_reference(self, ref, curr):
        d = relative_diff(ref, curr)
        if ref == 0:
            assert d == (1.0 if curr != 0 else 0.0)
        else:
            assert math.isclose(d, (curr - ref) / abs(ref), rel_tol=1e-12)

    @given(finite, finite)
    def test_percent_change_matches_reference(self, ref, curr):
        d = percent_change(ref, curr)
        if ref == 0:
            assert d == (1.0 if curr != 0 else 0.0)
        else:
            assert math.isclose(d, (curr - ref) / abs(ref), rel_tol=1e-12)

    @given(finite)
    def test_none_propagation(self, x):
        assert relative_diff(None, x) is None
        assert relative_diff(x, None) is None
        assert percent_change(None, x) == 0.0
        assert percent_change(x, None) == 0.0


class TestSeverityBands:
    @given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
    def test_valid_band(self, score):
        assert drift_severity(score) in {"None", "Low", "Medium", "High", "Critical"}

    def test_band_edges(self):
        # edges are inclusive on the upper band (result_handler.py:55-73)
        assert drift_severity(0.1) == "Low"
        assert drift_severity(0.25) == "Medium"
        assert drift_severity(0.5) == "High"
        assert drift_severity(0.75) == "Critical"

    @given(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    )
    def test_monotone(self, a, b):
        order = ["None", "Low", "Medium", "High", "Critical"]
        lo, hi = min(a, b), max(a, b)
        assert order.index(drift_severity(lo)) <= order.index(drift_severity(hi))


class TestThresholdFactors:
    @given(st.integers(min_value=0, max_value=10**12))
    def test_size_factor_bounded_and_monotone(self, n):
        f = size_factor(n)
        assert 0.6 <= f <= 2.0
        assert size_factor(n + 1) <= f  # larger data → tighter threshold

    @given(st.integers(min_value=0, max_value=10**6))
    def test_complexity_factor_bounded(self, n):
        assert 0.9 <= complexity_factor(n) <= 1.2

    @given(finite, st.floats(min_value=0, max_value=1e12, allow_nan=False))
    def test_numerical_volatility_bounded(self, mean, stddev):
        assert 0.8 <= numerical_volatility_factor(mean, stddev) <= 1.5

    @given(
        st.floats(min_value=0, max_value=50, allow_nan=False),
        st.integers(min_value=0, max_value=10**9),
    )
    def test_categorical_volatility_bounded(self, entropy, distinct):
        assert 0.9 <= categorical_volatility_factor(entropy, distinct) <= 1.3

    @given(
        st.integers(min_value=0, max_value=10**9),
        st.integers(min_value=0, max_value=10**9),
    )
    def test_cardinality_factor_bounded(self, distinct, total):
        assert 0.8 <= cardinality_factor(distinct, total) <= 1.5


class TestBpeApplyEquivalence:
    """The monotone min-rank segmenter (`_apply_bpe_merges_py`, the
    Arrow apply path's core) must equal the rank-order one-sweep-each
    spec — the fold chain's semantics — on arbitrary words and merge
    tables, including recurring pairs and self-merges."""

    words = st.text(alphabet="abcd", min_size=0, max_size=24)
    pairs = st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=3),
            st.text(alphabet="abcd", min_size=1, max_size=3),
        ),
        min_size=0,
        max_size=12,
    )

    @staticmethod
    def _spec(word, merges):
        sym = list(word)
        for left, right in merges:
            out = []
            for x in sym:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            sym = out
        return sym

    @given(words, pairs)
    @settings(max_examples=500)
    def test_matches_rank_order_sweeps(self, word, merges):
        from pyspark_data_drift_detector_spark.operators.corpus import (
            _apply_bpe_merges_py,
        )

        ranks: dict = {}
        for rk, pr in enumerate(merges):
            ranks.setdefault(pr, []).append(rk)
        frozen = {p: tuple(r) for p, r in ranks.items()}
        assert _apply_bpe_merges_py(list(word), merges, frozen) == \
            self._spec(word, merges)
