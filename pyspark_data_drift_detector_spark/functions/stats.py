"""Pure statistical functions (no SparkSession needed — unit-testable).

Implements the math the reference computes driver-side (SURVEY.md §2.9):
chi-square p-values (both the reference's step-ladder approximation and an
exact survival function), Jensen-Shannon distance, and the relative-diff /
percent-change conventions with their zero-handling edge cases.
"""

from __future__ import annotations

import math


def _valid_mask(arr, dim):
    """Mask of rows that are non-NULL and exactly ``dim`` long.

    ``np.stack`` raises on NULL or ragged rows, which would fail the whole
    job on inputs the expression paths handle gracefully (NULL result for
    NULL/malformed vectors) — so every GEMM UDF masks before stacking and
    emits NULL for the masked-out rows. When ``dim`` is None it is taken
    from the first non-NULL row, so uniform batches behave as before.

    Lives HERE (a module with no ``pandas_udf`` decorators) and not in
    ``udfs.py``: cloudpickle ships closure references to module globals
    by reference, so the worker imports the defining module — importing
    ``udfs.py`` on a worker trips its module-level ``@pandas_udf``
    (needs an active SparkSession) and kills the task.
    """
    import numpy as np

    if dim is None:
        for v in arr:
            if v is not None:
                dim = len(v)
                break
    return np.array(
        [v is not None and len(v) == dim for v in arr], dtype=bool
    )

# Critical values for p=0.05, df 1..10 — the reference's hardcoded table
# (categorical_analyzer.py:410-414). Above df=10 it uses df + sqrt(2·df).
_CHI2_CRITICAL_05 = {
    1: 3.84, 2: 5.99, 3: 7.81, 4: 9.49, 5: 11.07,
    6: 12.59, 7: 14.07, 8: 15.51, 9: 16.92, 10: 18.31,
}


def chi2_critical_value(df: int) -> float:
    """The reference's p=0.05 critical value for ``df`` degrees of freedom."""
    if df > 10:
        return df + math.sqrt(2 * df)
    return _CHI2_CRITICAL_05.get(df, 3.84)


def chi2_p_value_ladder(chi_square: float, df: int) -> float:
    """The reference's step-ladder p-value approximation.

    Observable behavior reproduced from
    ``categorical_analyzer.py:395-437``: returns one of
    {1.0, 0.001, 0.01, 0.05} or a linear interpolation clamped to
    [0.05, 1.0]. Kept for fidelity; ``chi2_sf`` is the exact alternative.
    """
    critical_value = chi2_critical_value(df)
    if chi_square < 0.001:
        return 1.0
    if chi_square > 3 * critical_value:
        return 0.001
    if chi_square > 2 * critical_value:
        return 0.01
    if chi_square > critical_value:
        return 0.05
    return min(1.0, max(0.05, 1.0 - (chi_square / critical_value) * 0.95))


def _lower_incomplete_gamma_regularized(s: float, x: float) -> float:
    """Regularized lower incomplete gamma P(s, x) via series / continued fraction."""
    if x < 0 or s <= 0:
        raise ValueError("invalid arguments")
    if x == 0:
        return 0.0
    if x < s + 1:
        # series expansion
        term = 1.0 / s
        total = term
        k = s
        for _ in range(10000):
            k += 1
            term *= x / k
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        return total * math.exp(-x + s * math.log(x) - math.lgamma(s))
    # continued fraction for Q(s, x), Lentz's algorithm
    tiny = 1e-300
    b = x + 1.0 - s
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 10000):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    q = math.exp(-x + s * math.log(x) - math.lgamma(s)) * h
    return 1.0 - q


def chi2_sf(chi_square: float, df: int) -> float:
    """Exact chi-square survival function (1 - CDF).

    The proper p-value the reference's ladder approximates — the engine's
    default (SURVEY §7.4 risk 2 records this as a deliberate, flagged
    deviation; set ``p_value_mode='ladder'`` for bit-faithful behavior).
    """
    if chi_square <= 0:
        return 1.0
    return max(0.0, min(1.0, 1.0 - _lower_incomplete_gamma_regularized(df / 2.0, chi_square / 2.0)))


def js_distance(p: dict[str, float], q: dict[str, float]) -> float:
    """Jensen-Shannon distance (sqrt of divergence), log2, midpoint form.

    Reference: ``categorical_analyzer.py:269-303``. Zero-probability
    categories contribute 0; result clamped ≥ 0 before sqrt (the
    distribution analyzer clamps at ``distribution_analyzer.py:512``).
    """
    cats = set(p) | set(q)
    kl_pm = kl_qm = 0.0
    for cat in cats:
        pi, qi = p.get(cat, 0.0), q.get(cat, 0.0)
        m = (pi + qi) / 2
        if pi > 0 and m > 0:
            kl_pm += pi * math.log2(pi / m)
        if qi > 0 and m > 0:
            kl_qm += qi * math.log2(qi / m)
    return math.sqrt(max(0.0, (kl_pm + kl_qm) / 2))


def relative_diff(ref_val: float | None, curr_val: float | None) -> float | None:
    """The reference's relative-diff convention.

    ``ref==0 → 1.0 if curr != 0 else 0.0``; signed otherwise
    (``numerical_analyzer.py:214-219``).
    """
    if ref_val is None or curr_val is None:
        return None
    if ref_val == 0:
        return 1.0 if curr_val != 0 else 0.0
    return (curr_val - ref_val) / abs(ref_val)


def percent_change(ref_val: float | None, curr_val: float | None) -> float:
    """The group analyzer's percent-change convention.

    ``ref==0 and curr==0 → 0``; ``ref==0 and curr!=0 → 1``
    (``group_analyzer.py:516-532``).
    """
    if ref_val is None or curr_val is None:
        return 0.0
    if ref_val == 0:
        return 1.0 if curr_val != 0 else 0.0
    return (curr_val - ref_val) / abs(ref_val)
