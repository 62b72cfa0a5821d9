"""Arrow-batched pandas UDFs (the only Python-side execution in the engine).

Kept in their own module WITHOUT ``from __future__ import annotations`` so
pyspark can resolve the pandas type hints. These run over O(columns)-sized
summary tables, never over raw data.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

from pyspark_data_drift_detector_spark.functions.stats import _valid_mask, chi2_sf


@pandas_udf("double")
def chi2_sf_udf(chi: pd.Series, dof: pd.Series) -> pd.Series:
    out = []
    for c, d in zip(chi, dof):
        if c is None or d is None or pd.isna(c) or pd.isna(d):
            out.append(None)
        else:
            out.append(chi2_sf(float(c), int(d)))
    return pd.Series(out, dtype="float64")


@pandas_udf("double")
def cosine_gemm_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine over Arrow batches — the wide-vector scoring path.

    At production dims (≳256) the expression-tree cosine
    (``operators.dedup.cosine_expr``: ``zip_with``/``aggregate`` lambdas)
    bloats whole-stage codegen; here each batch is two numpy GEMV-style
    reductions. Same math — dot / (‖a‖·‖b‖) — up to float summation
    order: numpy reassociates the reductions, so results can differ from
    the expression path in the last ulp (scores are compared rounded).
    """
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    # NULL rows and unequal-length pairs get NULL cosine (matching the
    # expression path's NULL-propagating zip_with) instead of crashing
    # np.stack. One GEMM per distinct pair length — NOT a dim inferred
    # from the first row, which would batch-order-dependently NULL every
    # other length in a mixed batch (the expression path scores ANY
    # equal-length pair, whatever other rows share the batch).
    arr_a, arr_b = a.to_numpy(), b.to_numpy()
    lens = np.array(
        [
            len(x) if x is not None and y is not None and len(x) == len(y) else -1
            for x, y in zip(arr_a, arr_b)
        ]
    )
    out = np.full(len(a), np.nan)
    for d in np.unique(lens):
        if d < 0:
            continue
        mask = lens == d
        A = np.stack(arr_a[mask]).astype(np.float64, copy=False)
        B = np.stack(arr_b[mask]).astype(np.float64, copy=False)
        num = np.einsum("ij,ij->i", A, B)
        den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        with np.errstate(invalid="ignore", divide="ignore"):
            out[mask] = num / den
    return pd.Series(out, dtype="float64")


def make_signature_udf(planes):
    """Pandas-UDF LSH signature: one (batch × dim) @ (dim × planes) GEMM.

    Same construction as ``operators.similarity._signature_expr`` (bit_i =
    (v · plane_i) > 0, packed little-endian into a long). Float caveat:
    numpy's GEMM reassociates the dot-product summation, so a projection
    within an ulp of zero could flip a sign bit versus the expression
    path's sequential fold — parity holds for generic (non-degenerate)
    inputs, as the test demonstrates, but is not a bit-level guarantee.
    Requires ``len(planes) <= 63`` so the packed value fits a signed
    long — the expression path has the same bound (it builds the signature
    by adding ``2**i`` literals).
    """
    P = np.asarray(planes, dtype=np.float64)
    if P.shape[0] > 63:
        raise ValueError("signature UDF supports at most 63 planes")
    weights = np.left_shift(np.int64(1), np.arange(P.shape[0], dtype=np.int64))

    @pandas_udf("long")
    def sig_udf(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="int64")
        arr = vec.to_numpy()
        mask = _valid_mask(arr, P.shape[1])
        # nullable Int64 (never float64 — signatures use up to 63 bits)
        # so NULL/ragged vectors yield NULL signatures (hash to no
        # bucket) instead of crashing np.stack
        out = pd.array([None] * len(arr), dtype="Int64")
        if mask.any():
            X = np.stack(arr[mask]).astype(np.float64, copy=False)
            bits = (X @ P.T) > 0
            out[mask] = (bits * weights).sum(axis=1).astype("int64")
        return pd.Series(out)

    return sig_udf


def make_matrix_topcos_udf(matrix, ids):
    """Pandas-UDF max-cosine against a FIXED matrix (benchmark vectors /
    cluster centroids): one ``(batch × dim) @ (dim × n)`` GEMM per Arrow
    batch — the wide-vector scoring path for ``semantic_decontaminate``
    and ``cluster_balance_drift`` (same rationale as ``cosine_gemm_udf``:
    past a few hundred dims the per-row expression tree outgrows codegen
    while BLAS amortizes). Returns ``struct<max_cosine, nearest_id>``
    with ties resolved to the first (lowest-index) matrix row — pass ids
    sorted ascending for the smallest-id tie-break, matching the
    expression path. Float caveat: numpy reassociates the reductions, so
    scores can differ from the expression path in the last ulp.
    """
    M = np.asarray(matrix, dtype=np.float64)
    idarr = np.asarray(ids, dtype=np.int64)
    if M.shape[0] != idarr.shape[0]:
        raise ValueError("matrix and ids length mismatch")
    norms = np.sqrt((M * M).sum(axis=1))

    @pandas_udf("struct<max_cosine: double, nearest_id: bigint>")
    def topcos_udf(vec: pd.Series) -> pd.DataFrame:
        if len(vec) == 0:
            return pd.DataFrame({"max_cosine": [], "nearest_id": []})
        arr = vec.to_numpy()
        mask = _valid_mask(arr, M.shape[1])
        # NULL / ragged rows → NULL max_cosine / nearest_id, matching the
        # expression path's NULL propagation instead of crashing np.stack
        max_cos = np.full(len(arr), np.nan)
        near = pd.array([None] * len(arr), dtype="Int64")
        if mask.any():
            X = np.stack(arr[mask]).astype(np.float64, copy=False)
            with np.errstate(invalid="ignore", divide="ignore"):
                xn = np.sqrt((X * X).sum(axis=1))
                cos = (X @ M.T) / (xn[:, None] * norms[None, :])
            # zero-norm rows/centroids produce NaN cosines; plain argmax
            # treats NaN as maximal and would "assign" to the first
            # centroid — mask NaN to -inf and NULL out rows with no
            # finite cosine, matching the expression path's nullif
            cosf = np.where(np.isnan(cos), -np.inf, cos)
            best = np.argmax(cosf, axis=1)
            bv = cosf[np.arange(len(best)), best]
            ok = np.isfinite(bv)
            idx = np.flatnonzero(mask)
            max_cos[idx[ok]] = bv[ok]
            near[idx[ok]] = idarr[best[ok]]
        return pd.DataFrame({"max_cosine": max_cos, "nearest_id": near})

    return topcos_udf
