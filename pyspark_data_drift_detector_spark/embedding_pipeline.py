"""Embedding-space drift flagship: one long-format report over a vector
pair — the embedding-side sibling of ``pipeline.detect_drift`` (tabular)
and ``corpus_pipeline.corpus_drift_report`` (documents). Every modality
the engine serves gets the same composed artifact shape.

``embedding_drift_report`` composes the embedding panels into one frame
with the shared report schema (``family, key, metric, ref_value,
curr_value, diff, drift_detected``):

- ``geometry``  — centroid cosine, mean-norm shift, max per-dimension
  shift (``operators.similarity.embedding_drift``): first-moment drift;
- ``mmd``       — random-Fourier-feature MMD² (``mmd_drift``): the
  higher-moment drift the centroid stats cannot see;
- ``topic_mix`` — per-cluster share shift against shared centroids
  (``cluster_balance_drift``; feed a :func:`operators.similarity.fit_kmeans`
  result through ``centroids=``): composition drift with every marginal
  unchanged.

Each member is an O(1)- or O(clusters)-row aggregate (each scans the
pair once with narrow-map vector math), so the report adds NO passes
beyond its members; the melt is expression-only. Flags evaluate on the
5-decimal-ROUNDED statistics — the report is the stored comparison
artifact, and rounding first makes every flag a pure function of the
numbers the report shows (the ``corpus_drift_report`` convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark_data_drift_detector_spark.corpus_pipeline import _ROUND, _melt


def embedding_drift_report(
    df_ref: DataFrame,
    df_curr: DataFrame,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.99,
    norm_threshold: float = 0.1,
    mmd_threshold: float = 0.01,
    n_clusters: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
    share_threshold: float = 0.05,
    dim: int = 64,
    n_features: int = 48,
    seed: int = 7,
    scoring: str = "auto",
) -> DataFrame:
    """One long-format embedding drift report — did the population's
    GEOMETRY (centroid direction, norm scale, any single dimension), its
    SHAPE (MMD² over RFF features), or its TOPIC MIX (per-cluster share)
    move between snapshots? Count metrics ride informational rows.
    """
    from pyspark_data_drift_detector_spark.operators.similarity import (
        cluster_balance_drift,
        embedding_drift,
        mmd_drift,
    )

    r = _ROUND
    cos_t, norm_t, mmd_t, sh_t = (
        float(cosine_threshold),
        float(norm_threshold),
        float(mmd_threshold),
        float(share_threshold),
    )

    geo = _melt(
        embedding_drift(
            df_ref, df_curr, embedding_col, cosine_threshold, norm_threshold
        ),
        [
            ("'geometry'", "''", "'n_vectors'", "ref_n", "curr_n", "NULL", "false"),
            ("'geometry'", "''", "'centroid_cosine'",
             "NULL", f"round(centroid_cosine, {r})",
             f"1.0D - round(centroid_cosine, {r})",
             f"round(centroid_cosine, {r}) < {cos_t!r}D"),
            ("'geometry'", "''", "'mean_norm'",
             f"round(ref_mean_norm, {r})", f"round(curr_mean_norm, {r})",
             f"round(norm_shift, {r})",
             f"round(norm_shift, {r}) > {norm_t!r}D"),
            ("'geometry'", "''", "'max_dim_shift'",
             "NULL", "NULL", f"round(max_dim_shift, {r})", "false"),
        ],
    )
    mm = _melt(
        mmd_drift(
            df_ref, df_curr, embedding_col, dim, n_features, None, seed, mmd_threshold
        ),
        [
            ("'mmd'", "''", "'mmd2'",
             "NULL", "NULL", f"round(mmd2, {r})",
             f"round(mmd2, {r}) > {mmd_t!r}D"),
            ("'mmd'", "''", "'mmd'",
             "NULL", "NULL", f"round(mmd, {r})", "false"),
        ],
    )
    tm = _melt(
        cluster_balance_drift(
            df_ref,
            df_curr,
            n_clusters,
            share_threshold,
            embedding_col,
            id_col,
            scoring,
            centroids,
        ),
        [
            # '<null>' sentinel: the NULL cluster (invalid vectors) is a
            # real population, distinct from any stringly-keyed cluster
            ("'topic_mix'",
             "CASE WHEN cluster_id IS NULL THEN '<null>'"
             " ELSE CAST(cluster_id AS STRING) END",
             "'cluster_share'",
             f"round(ref_share, {r})", f"round(curr_share, {r})",
             f"round(share_abs_diff, {r})",
             f"round(share_abs_diff, {r}) > {sh_t!r}D"),
        ],
    )
    out = geo.unionByName(mm).unionByName(tm)
    return out.selectExpr(
        "family",
        "key",
        "metric",
        f"round(ref_value, {r}) AS ref_value",
        f"round(curr_value, {r}) AS curr_value",
        f"round(diff, {r}) AS diff",
        "drift_detected",
    )


def embedding_report_incremental(
    new_vecs: DataFrame,
    embedding_state: DataFrame,
    cluster_state: DataFrame,
    centroids: list[tuple[int, list[float]]],
    embedding_col: str = "embedding",
    dim: int = 64,
    n_features: int = 48,
    seed: int = 7,
    sigma: float | None = None,
    cosine_threshold: float = 0.99,
    norm_threshold: float = 0.1,
    mmd_threshold: float = 0.01,
    share_threshold: float = 0.05,
    scoring: str = "auto",
) -> DataFrame:
    """Does THIS vector ingest batch match the corpus-so-far embedding
    distribution? The increment-vs-state sibling of
    :func:`embedding_drift_report`, composing both vector members of the
    vet-the-increment family against their additive states — prior
    embeddings are never re-read:

    - ``geometry`` / ``mmd`` rows from
      :func:`operators.similarity.embedding_incremental` (centroid
      cosine, mean-norm shift, exact incremental MMD² vs the rolled-up
      :func:`operators.similarity.embedding_state`);
    - ``topic_mix`` rows from
      :func:`operators.similarity.cluster_balance_incremental` (per
      fixed-centroid share vs the rolled-up cluster-share state),
      melted to the shared report schema ('<null>' key sentinel for the
      invalid-vector cluster).

    One long-format frame per batch — what
    ``streaming.state_tables.embedding_vetting_sink`` appends nightly.
    The SAME ``dim/n_features/seed/sigma`` and ``centroids`` must have
    built the states.
    """
    from pyspark_data_drift_detector_spark.operators.similarity import (
        cluster_balance_incremental,
        embedding_incremental,
    )

    r = _ROUND
    geo = embedding_incremental(
        new_vecs,
        embedding_state,
        embedding_col,
        dim,
        n_features,
        seed,
        sigma,
        cosine_threshold,
        norm_threshold,
        mmd_threshold,
    )
    mix = cluster_balance_incremental(
        new_vecs,
        cluster_state,
        centroids,
        threshold=share_threshold,
        embedding_col=embedding_col,
        scoring=scoring,
    ).selectExpr(
        "'topic_mix' AS family",
        "CASE WHEN cluster_id IS NULL THEN '<null>'"
        " ELSE CAST(cluster_id AS STRING) END AS key",
        "'cluster_share' AS metric",
        f"round(ref_share, {r}) AS ref_value",
        f"round(curr_share, {r}) AS curr_value",
        f"round(share_abs_diff, {r}) AS diff",
        "drift_detected",
    )
    return geo.unionByName(mix)
