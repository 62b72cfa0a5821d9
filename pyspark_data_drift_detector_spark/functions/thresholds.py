"""Adaptive thresholds (SURVEY §2.9 M22) — pure functions over profile stats.

The reference's ``adaptive_threshold.py`` recomputes every statistic with
its own Spark jobs (mean/stddev per column, distinct counts, entropy); here
every factor is a pure function of numbers the profile aggregate already
produced, so adaptive thresholding adds ZERO Spark jobs.

Deliberate fix (SURVEY §7.4 risk 3): the reference's categorical-volatility
path calls ``.log()`` on Python floats (``adaptive_threshold.py:233,237`` —
AttributeError, dead code); the intent is implemented with ``math.log``.
"""

from __future__ import annotations

import math


def size_factor(row_count: int) -> float:
    """6-band dataset-size multiplier (``adaptive_threshold.py:53-75``)."""
    if row_count < 100:
        return 2.0
    if row_count < 1_000:
        return 1.5
    if row_count < 10_000:
        return 1.2
    if row_count < 100_000:
        return 1.0
    if row_count < 1_000_000:
        return 0.8
    return 0.6


def complexity_factor(column_count: int) -> float:
    """Column-count multiplier (``adaptive_threshold.py:77-99``)."""
    if column_count < 10:
        return 0.9
    if column_count < 50:
        return 1.0
    if column_count < 100:
        return 1.1
    return 1.2


def numerical_volatility_factor(mean: float | None, stddev: float | None) -> float:
    """CV-band multiplier (``adaptive_threshold.py:197-219``)."""
    if mean is None or stddev is None or mean == 0:
        return 1.5
    cv = abs(stddev / mean)
    if cv < 0.1:
        return 0.8
    if cv < 0.5:
        return 1.0
    if cv < 1.0:
        return 1.2
    return 1.5


def categorical_volatility_factor(entropy: float | None, distinct_count: int) -> float:
    """Normalized-entropy band multiplier (intent of
    ``adaptive_threshold.py:220-246``; entropy in nats)."""
    if entropy is None or distinct_count <= 1:
        return 1.0
    max_entropy = math.log(distinct_count)
    if max_entropy <= 0:
        return 1.0
    normalized = entropy / max_entropy
    if normalized < 0.3:
        return 1.3
    if normalized < 0.7:
        return 1.0
    return 0.9


def cardinality_factor(distinct_count: int, total_count: int) -> float:
    """Cardinality-ratio band multiplier (``adaptive_threshold.py:252-286``)."""
    if total_count == 0:
        return 1.0
    ratio = distinct_count / total_count
    if ratio < 0.01:
        return 0.8
    if ratio < 0.1:
        return 0.9
    if ratio < 0.5:
        return 1.0
    if ratio < 0.9:
        return 1.2
    return 1.5


def null_factor(null_ratio: float, total_count: int = 1) -> float:
    """Null-ratio band multiplier (``adaptive_threshold.py:289-322``)."""
    if total_count == 0:
        return 1.0
    if null_ratio < 0.01:
        return 0.9
    if null_ratio < 0.1:
        return 1.0
    if null_ratio < 0.3:
        return 1.1
    if null_ratio < 0.5:
        return 1.3
    return 1.5


def compose_threshold(
    base_threshold: float,
    row_count: int,
    column_count: int,
    volatility: float = 1.0,
    cardinality: float = 1.0,
    nulls: float = 1.0,
) -> float:
    """Multiplicative composition (``adaptive_threshold.py:143-172``)."""
    return (
        base_threshold
        * size_factor(row_count)
        * complexity_factor(column_count)
        * volatility
        * cardinality
        * nulls
    )


def adaptive_numerical_threshold(
    mean: float | None,
    stddev: float | None,
    base_threshold: float = 0.2,
    min_threshold: float = 0.05,
    max_threshold: float = 0.5,
) -> float:
    """CV → linear-interpolated threshold (``adaptive_threshold.py:358-410``)."""
    if mean is None or stddev is None or mean == 0:
        return base_threshold
    cv = abs(stddev / mean)
    if cv < 0.1:
        return min_threshold
    if cv > 1.0:
        return max_threshold
    return min_threshold + (max_threshold - min_threshold) * (cv - 0.1) / 0.9


def adaptive_categorical_threshold(
    entropy: float | None,
    distinct_count: int,
    base_threshold: float = 0.2,
    min_threshold: float = 0.05,
    max_threshold: float = 0.5,
) -> float:
    """Normalized entropy (nats) → interpolated threshold
    (``adaptive_threshold.py:412-481``). Uniform → min; concentrated → max."""
    if entropy is None or distinct_count <= 0:
        return base_threshold
    max_entropy = math.log(distinct_count) if distinct_count > 0 else 0.0
    if max_entropy == 0:
        return base_threshold
    normalized = entropy / max_entropy
    if normalized > 0.8:
        return min_threshold
    if normalized < 0.3:
        return max_threshold
    return max_threshold - (max_threshold - min_threshold) * (normalized - 0.3) / 0.5


def adjust_threshold_for_sample_size(
    threshold: float,
    sample_size: int,
    full_size: int,
    min_factor: float = 0.5,
    max_factor: float = 2.0,
) -> float:
    """1/√ratio sampling compensation (``adaptive_threshold.py:523-556``)."""
    if full_size == 0 or sample_size >= full_size:
        return threshold
    ratio = sample_size / full_size
    if ratio <= 0.01:
        factor = max_factor
    elif ratio >= 0.5:
        factor = min_factor
    else:
        factor = min_factor + (max_factor - min_factor) * (1 - (ratio / 0.5) ** 0.5)
    return threshold * factor
