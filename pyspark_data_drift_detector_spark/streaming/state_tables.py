"""Streaming maintenance of the mergeable state tables.

The batch-incremental pipeline (``mergeable.partitioned_profile`` →
persist → ``detect_drift_incremental``) assumes SOMETHING appends one
summary row-group per ingest batch. This module is that something for a
Structured Streaming ingest: a ``foreachBatch`` sink that reduces each
micro-batch to its additive profile / category-count states and APPENDS
them to parquet state tables, keyed by a caller-derived partition id
(typically an event-time bucket).

Why ``foreachBatch`` and not a streaming aggregate: the state tables are
persistent artifacts OUTSIDE the streaming checkpoint — any window of
partitions can be merged later (or by another engine) without replaying
the stream, which is the point of the mergeable family. Each batch is
reduced with the SAME batch operators (one wide aggregate per batch), so
batch and streaming state rows are indistinguishable by construction.

At 100 TB scale: a micro-batch writes O(buckets × columns) summary rows
— metadata-sized regardless of batch volume — and the drift check over
any window reads ONLY the state tables.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def state_table_sink(
    numeric_columns: list[str],
    categorical_columns: list[str],
    partition_by: Column | str,
    profile_path: str,
    category_path: str,
    quantile_path: str | None = None,
    kll_k: int = 800,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function that appends each micro-batch's
    additive states to parquet state tables.

    ``partition_by``: expression labeling each ROW's state partition
    (e.g. ``"date_trunc('day', ts)"``). A batch spanning two buckets
    writes two state rows per column — merges stay exact because the
    states are additive. ``quantile_path`` additionally maintains the
    KLL quantile state so windowed drift carries median/IQR.

    Usage::

        sink = state_table_sink(["value"], ["event_type"],
                                "date_trunc('day', ts)",
                                "/state/profile", "/state/categories",
                                quantile_path="/state/quantiles")
        stream.writeStream.foreachBatch(sink).start()
    """
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        partitioned_categories,
        partitioned_profile,
        partitioned_quantiles,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if numeric_columns:
            partitioned_profile(
                batch_df, numeric_columns, partition_by
            ).write.mode("append").parquet(profile_path)
            if quantile_path is not None:
                partitioned_quantiles(
                    batch_df, numeric_columns, partition_by, k=kll_k
                ).write.mode("append").parquet(quantile_path)
        if categorical_columns:
            partitioned_categories(
                batch_df, categorical_columns, partition_by
            ).write.mode("append").parquet(category_path)

    return write_batch


def read_state_tables(
    spark,
    profile_path: str,
    category_path: str,
    quantile_path: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Load the appended state tables back for a window query.

    Multiple appends for one ``partition_id`` (several micro-batches
    landing in one bucket) are fine as-is: ``merge_profiles`` /
    ``merge_categories`` / ``merged_quantiles`` treat every state ROW as
    mergeable input, so no compaction is required for correctness —
    compact with a periodic rewrite only when the row count itself gets
    large.
    """
    prof = spark.read.parquet(profile_path)
    cats = spark.read.parquet(category_path)
    quants = spark.read.parquet(quantile_path) if quantile_path else None
    return prof, cats, quants


def rollup_state_sink(
    rollup_path: str,
    ts_col: str = "ts",
    dims: list[str] | None = None,
    value_col: str = "value",
    granularity: str = "hour",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the hierarchical rollup's
    finest-level state (the continuous-aggregate pattern): each
    micro-batch appends its per-``(bucket_start, dims...)`` additive
    ``(n_rows, n, s, ss, mn, mx)`` rows — DECIMAL-exact sums, the same
    algebra ``operators.temporal.rollup_state`` produces for batch — so
    ``rollup_from_state`` over the appended table equals the batch
    ``rollup_timeseries`` over the full event history ROW-FOR-ROW, with
    no event replay.

    A micro-batch spanning several buckets writes several state rows;
    several batches landing in one bucket write several rows for it —
    both merge exactly because the states are additive.  At 100 TB the
    continuous aggregate reads only O(buckets × dims) state rows."""
    from pyspark_data_drift_detector_spark.operators.temporal import (
        rollup_state,
    )

    dim_cols = list(dims) if dims is not None else ["event_type"]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rollup_state(
            batch_df, ts_col, dim_cols, value_col, granularity
        ).write.mode("append").parquet(rollup_path)

    return write_batch


def read_rollup_state(
    spark,
    rollup_path: str,
    dims: list[str] | None = None,
    granularities: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Continuous-aggregate read path: merge the appended rollup state
    rows and cascade them to the requested granularities (validated and
    re-aggregated exactly like the batch ``rollup_timeseries``).

    The state table records the grain it was written at
    (``state_granularity``): reading state FINER than
    ``granularities[0]`` re-truncates and merges it up to the requested
    grain; reading state COARSER raises at execution instead of
    silently relabeling raw buckets (e.g. hour rows as 'day')."""
    from pyspark_data_drift_detector_spark.operators.temporal import (
        _TRUNC_ORDER,
        rollup_from_state,
    )

    units = [g.lower() for g in granularities]
    ranks = [_TRUNC_ORDER.index(g) for g in units]
    if ranks != sorted(ranks) or len(set(ranks)) != len(ranks):
        raise ValueError(f"granularities must be strictly coarsening: {units}")
    dim_cols = list(dims) if dims is not None else ["event_type"]
    return rollup_from_state(
        spark.read.parquet(rollup_path), dim_cols, tuple(units)
    )


def completeness_state_sink(
    state_path: str,
    ts_col: str,
    columns: list[str],
    granularity: str = "day",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the ingest-health panel's state
    (the ``completeness_timeseries`` streaming twin): each micro-batch
    appends its per-``(bucket_start, column)`` additive ``(n_rows,
    n_null)`` counts — the same cells the batch operator aggregates — so
    :func:`read_completeness_state` over the appended table equals the
    batch ``completeness_timeseries`` over the full event history
    ROW-FOR-ROW, with no event replay.

    A micro-batch spanning several buckets writes several state rows;
    several batches landing in one bucket write several rows that merge
    exactly (counts are additive). At 100 TB the panel reads only
    O(buckets × columns) state rows."""
    from pyspark_data_drift_detector_spark.operators.temporal import (
        completeness_timeseries,
    )

    cols = list(columns)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        completeness_timeseries(batch_df, ts_col, cols, granularity).select(
            "bucket_start", "column_name", "n_rows", "n_null"
        ).write.mode("append").parquet(state_path)

    return write_batch


def read_completeness_state(spark, state_path: str) -> DataFrame:
    """Merge appended completeness state rows back into the batch panel
    shape (``bucket_start, column_name, n_rows, n_null, null_ratio``) —
    one tiny groupBy over metadata-sized state, ratio recomputed from
    the merged counts."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(state_path)
        .groupBy("bucket_start", "column_name")
        .agg(
            F.expr("CAST(sum(n_rows) AS BIGINT) AS n_rows"),
            F.expr("CAST(sum(n_null) AS BIGINT) AS n_null"),
        )
        .selectExpr(
            "bucket_start",
            "column_name",
            "n_rows",
            "n_null",
            "CAST(n_null AS DOUBLE) / greatest(n_rows, 1) AS null_ratio",
        )
    )


def fingerprint_state_sink(
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the corpus fingerprint state that
    :func:`operators.dedup.dedup_incremental` checks new batches against:
    each micro-batch appends its documents' normalization fingerprints
    (32-char md5 keys — O(batch rows) metadata, never the text).
    Duplicate keys across appends are fine: the reader distincts."""
    from pyspark_data_drift_detector_spark.operators.text import fingerprint

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        fingerprint(batch_df, text_col=text_col, id_col=id_col).select(
            "fingerprint"
        ).write.mode("append").parquet(state_path)

    return write_batch


def benford_state_sink(
    state_path: str,
    columns: list[str],
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the Benford first-digit state
    (the ``benford_deviation`` streaming twin): each micro-batch appends
    its additive per-``(column, digit)`` counts, so
    :func:`read_benford_state` over the appended table equals the batch
    ``benford_deviation`` over the full stream history ROW-FOR-ROW —
    the continuously-maintained fabricated-feed tripwire. O(columns × 9)
    state rows per batch."""
    from pyspark_data_drift_detector_spark.operators.distribution import (
        benford_digit_state,
    )

    cols = list(columns)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        benford_digit_state(batch_df, cols).write.mode("append").parquet(
            state_path
        )

    return write_batch


def read_benford_state(spark, state_path: str) -> DataFrame:
    """Roll the appended Benford digit state up into the batch panel
    shape (``column_name, n, n_skipped, tvd, max_dev, chi2_stat``)."""
    from pyspark_data_drift_detector_spark.operators.distribution import (
        benford_from_state,
    )

    return benford_from_state(spark.read.parquet(state_path))


def passage_state_sink(
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 1,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the passage-fingerprint state
    that :func:`operators.dedup.passage_dedup_incremental` vets new
    batches against: each micro-batch appends its additive per-window-
    hash counts (``whash, n_docs, n_occ`` — O(distinct hashes) longs,
    never the text). Same append-only / one-batch-per-document contract
    as :func:`fingerprint_state_sink`; the reader re-aggregates, so raw
    appends with repeated keys across batches are fine."""
    from pyspark_data_drift_detector_spark.operators.dedup import passage_state

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        passage_state(
            batch_df,
            text_col=text_col,
            id_col=id_col,
            window=window,
            stride=stride,
        ).write.mode("append").parquet(state_path)

    return write_batch


def minhash_state_sink(
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    hash_family: str = "xxhash",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the MinHash-signature state that
    :func:`operators.dedup.neardup_incremental` vets new batches against:
    each micro-batch appends its documents' signatures (``id, h0..h{n-1}``
    — num_hashes longs per doc, never the text). NULL-text documents
    produce no shingles and hence no state row. Append-only,
    one-batch-per-document contract as the other state sinks."""
    from pyspark_data_drift_detector_spark.operators.dedup import minhash_signatures

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        minhash_signatures(
            batch_df,
            text_col=text_col,
            id_col=id_col,
            k=k,
            num_hashes=num_hashes,
            hash_family=hash_family,
        ).write.mode("append").parquet(state_path)

    return write_batch


def unigram_state_sink(
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the additive unigram-LM state
    (``token, cnt`` per micro-batch) that
    :func:`operators.corpus.logprob_incremental` scores new ingest
    against; the reader re-aggregates, so repeated tokens across appends
    simply sum."""
    from pyspark_data_drift_detector_spark.operators.corpus import unigram_state

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        unigram_state(
            batch_df, text_col=text_col, id_col=id_col
        ).write.mode("append").parquet(state_path)

    return write_batch


def token_share_state_sink(
    state_path: str,
    group_col: str = "source",
    text_col: str = "text",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the additive corpus-mix state
    (``group_key, n_docs, n_tokens`` per micro-batch) that
    :func:`operators.corpus.token_share_incremental` vets new ingest
    against; the reader re-aggregates, so repeated groups across appends
    simply sum."""
    from pyspark_data_drift_detector_spark.operators.corpus import (
        token_share_state,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        token_share_state(
            batch_df, group_col=group_col, text_col=text_col
        ).write.mode("append").parquet(state_path)

    return write_batch


def cluster_share_state_sink(
    state_path: str,
    centroids: list,
    embedding_col: str = "embedding",
    scoring: str = "auto",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the additive topic-mix state
    (``cluster_id, n`` per micro-batch against FIXED centroids) that
    :func:`operators.similarity.cluster_balance_incremental` vets new
    ingest against; the reader re-aggregates, so repeated cluster ids
    across appends simply sum. The same centroid set must build every
    append and the vetting call."""
    from pyspark_data_drift_detector_spark.operators.similarity import (
        cluster_share_state,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cluster_share_state(
            batch_df, centroids, embedding_col=embedding_col, scoring=scoring
        ).write.mode("append").parquet(state_path)

    return write_batch


def ivf_state_sink(
    state_path: str,
    centroids: list,
    embedding_col: str = "embedding",
    scoring: str = "auto",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the additive IVF-index health
    state (``list_id, n, sum_cosine`` per micro-batch against the FROZEN
    index centroids) that
    :func:`operators.similarity.ann_index_incremental` vets new ingest
    against; the reader re-aggregates, so repeated list ids across
    appends simply sum. The same frozen centroid set must build every
    append and the vetting call (a re-fit invalidates the whole state —
    start a new state path)."""
    from pyspark_data_drift_detector_spark.operators.similarity import (
        ivf_state,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        ivf_state(
            batch_df, centroids, embedding_col=embedding_col, scoring=scoring
        ).write.mode("append").parquet(state_path)

    return write_batch


def ann_vetting_sink(
    state_path: str,
    report_path: str,
    centroids: list,
    threshold: float = 0.05,
    embedding_col: str = "embedding",
    scoring: str = "auto",
) -> Callable[[DataFrame, int], None]:
    """The ANN index-health nightly automation as ONE ``foreachBatch``
    sink (the ``ingest_vetting_sink`` contract): each micro-batch of
    new vectors is first VETTED against the corpus-so-far inverted-file
    occupancy/tightness state
    (:func:`operators.similarity.ann_index_incremental`, stamped with
    ``batch_id`` and appended to ``report_path``), and only then does
    the state advance with the batch's own assignments.
    Vet-before-advance: a batch compared against a state containing
    itself would dilute every occupancy shift it introduced. The FIRST
    batch (state missing or massless) bootstraps silently — the state
    is seeded, no report row is written."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.similarity import (
        ann_index_incremental,
    )

    advance = ivf_state_sink(state_path, centroids, embedding_col, scoring)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # path absent — bootstrap batch
            state = None
        # mass, not row existence: a present-but-all-zero state is still
        # a bootstrap (the vetting-sink gate convention)
        if state is not None and not state.filter("n > 0").isEmpty():
            ann_index_incremental(
                batch_df, state, centroids, threshold=threshold,
                embedding_col=embedding_col, scoring=scoring,
            ).withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(report_path)
        advance(batch_df, batch_id)

    return write_batch


def alignment_state_sink(
    state_path: str,
    left_col: str = "image_embedding",
    right_col: str = "text_embedding",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the additive cross-modal
    alignment moments state (one ``partitioned_profile``-shape row per
    micro-batch) that
    :func:`operators.multimodal.alignment_incremental` vets new ingest
    against; the reader merges, so appended rows simply combine."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        alignment_state,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        alignment_state(batch_df, left_col, right_col).write.mode(
            "append"
        ).parquet(state_path)

    return write_batch


def alignment_vetting_sink(
    state_path: str,
    report_path: str,
    threshold: float = 0.05,
    left_col: str = "image_embedding",
    right_col: str = "text_embedding",
) -> Callable[[DataFrame, int], None]:
    """The cross-modal alignment nightly automation as ONE
    ``foreachBatch`` sink (the ``ingest_vetting_sink`` contract): each
    micro-batch of image/text pairs is first VETTED against the
    corpus-so-far alignment profile
    (:func:`operators.multimodal.alignment_incremental`, stamped with
    ``batch_id`` and appended to ``report_path``), and only then does
    the state advance. The FIRST batch (state missing or massless)
    bootstraps silently."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        alignment_incremental,
    )

    advance = alignment_state_sink(state_path, left_col, right_col)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # path absent — bootstrap batch
            state = None
        # mass, not row existence: a present-but-all-zero state is still
        # a bootstrap (the vetting-sink gate convention)
        if state is not None and not state.filter("n_rows > 0").isEmpty():
            alignment_incremental(
                batch_df, state, threshold=threshold,
                left_col=left_col, right_col=right_col,
            ).withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(report_path)
        advance(batch_df, batch_id)

    return write_batch


def image_ahash_state_sink(
    state_path: str,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "auto",
    grid: int = 8,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the 8-byte-per-image aHash
    signature state that
    :func:`operators.multimodal.image_neardup_incremental` blocks new
    ingest against. The grid/codec parameters are part of the state
    contract — every append and every probe must share one
    configuration."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        image_ahash_state,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        image_ahash_state(
            batch_df, payload_col, id_col, codec, grid
        ).write.mode("append").parquet(state_path)

    return write_batch


def image_dedup_vetting_sink(
    state_path: str,
    report_path: str,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "auto",
    grid: int = 8,
    max_distance: int = 3,
    bands: int = 4,
) -> Callable[[DataFrame, int], None]:
    """Incremental image dedup as ONE ``foreachBatch`` sink (the
    ``ingest_vetting_sink`` contract): each micro-batch of image
    payloads is VETTED against the corpus-so-far signature state
    (:func:`operators.multimodal.image_neardup_incremental` — per-image
    ``dup_of_state`` / ``dup_in_batch`` / ``keep`` verdicts, stamped
    with ``batch_id`` and appended to ``report_path``), and only then
    does the state advance with the batch's own signatures. The FIRST
    batch bootstraps: no prior state, so every image is vetted against
    an empty frame (within-batch dups still flagged) — unlike the
    drift-report sinks there IS a meaningful bootstrap report here."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        image_neardup_incremental,
    )

    advance = image_ahash_state_sink(
        state_path, payload_col, id_col, codec, grid
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # path absent — bootstrap batch
            state = spark.createDataFrame([], "ahash bigint")
        image_neardup_incremental(
            batch_df, state, payload_col, id_col, codec, grid,
            max_distance=max_distance, bands=bands,
        ).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(report_path)
        advance(batch_df, batch_id)

    return write_batch


def audio_ahash_state_sink(
    state_path: str,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the 8-byte-per-recording energy
    fingerprint state that
    :func:`operators.multimodal.audio_neardup_incremental` blocks new
    ingest against — the audio twin of :func:`image_ahash_state_sink`.
    ``grid`` is part of the state contract: every append and every
    probe must share one configuration."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        audio_ahash_state,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        audio_ahash_state(
            batch_df, payload_col, id_col, grid
        ).write.mode("append").parquet(state_path)

    return write_batch


def audio_dedup_vetting_sink(
    state_path: str,
    report_path: str,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
    max_distance: int = 3,
    bands: int = 4,
) -> Callable[[DataFrame, int], None]:
    """Incremental audio dedup as ONE ``foreachBatch`` sink (the
    ``ingest_vetting_sink`` contract, the audio twin of
    :func:`image_dedup_vetting_sink`): each micro-batch of WAV payloads
    is VETTED against the corpus-so-far fingerprint state
    (:func:`operators.multimodal.audio_neardup_incremental` — per-clip
    ``dup_of_state`` / ``dup_in_batch`` / ``keep`` verdicts, stamped
    with ``batch_id`` and appended to ``report_path``), and only then
    does the state advance with the batch's own fingerprints. The FIRST
    batch bootstraps against an empty frame — within-batch dups still
    flagged, so there IS a meaningful bootstrap report."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        audio_neardup_incremental,
    )

    advance = audio_ahash_state_sink(state_path, payload_col, id_col, grid)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # path absent — bootstrap batch
            state = spark.createDataFrame([], "ahash bigint")
        audio_neardup_incremental(
            batch_df, state, payload_col, id_col, grid,
            max_distance=max_distance, bands=bands,
        ).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(report_path)
        advance(batch_df, batch_id)

    return write_batch


def video_ahash_state_sink(
    state_path: str,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the 8-byte-per-clip temporal
    fingerprint state that
    :func:`operators.multimodal.video_neardup_incremental` blocks new
    ingest against — the video twin of :func:`image_ahash_state_sink`.
    ``grid`` is part of the state contract: every append and every
    probe must share one configuration."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        video_ahash_state,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        video_ahash_state(
            batch_df, payload_col, id_col, grid
        ).write.mode("append").parquet(state_path)

    return write_batch


def video_dedup_vetting_sink(
    state_path: str,
    report_path: str,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
    max_distance: int = 3,
    bands: int = 4,
) -> Callable[[DataFrame, int], None]:
    """Incremental video dedup as ONE ``foreachBatch`` sink (the
    ``ingest_vetting_sink`` contract, the video twin of
    :func:`image_dedup_vetting_sink`): each micro-batch of y4m payloads
    is VETTED against the corpus-so-far temporal-fingerprint state
    (:func:`operators.multimodal.video_neardup_incremental` — per-clip
    ``dup_of_state`` / ``dup_in_batch`` / ``keep`` verdicts, stamped
    with ``batch_id`` and appended to ``report_path``), and only then
    does the state advance with the batch's own fingerprints. The FIRST
    batch bootstraps against an empty frame — within-batch dups still
    flagged, so there IS a meaningful bootstrap report."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        video_neardup_incremental,
    )

    advance = video_ahash_state_sink(state_path, payload_col, id_col, grid)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # path absent — bootstrap batch
            state = spark.createDataFrame([], "ahash bigint")
        video_neardup_incremental(
            batch_df, state, payload_col, id_col, grid,
            max_distance=max_distance, bands=bands,
        ).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(report_path)
        advance(batch_df, batch_id)

    return write_batch


def multimodal_vetting_sink(
    state_path: str,
    report_path: str,
    error_rate_threshold: float = 0.02,
    stat_threshold: float = 0.05,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    modality_col: str = "modality",
) -> Callable[[DataFrame, int], None]:
    """The multimodal intake automation as ONE ``foreachBatch`` sink
    (the ``ingest_vetting_sink`` contract) over a MIXED payload stream:
    each micro-batch carries a ``modality_col`` ('image'/'audio'/
    'video') routing every payload to its decoder, is VETTED against
    the corpus-so-far intake state
    (:func:`operators.multimodal.multimodal_report_incremental`, stamped
    with ``batch_id``), and only then does the state advance. The FIRST
    batch (state missing or massless) bootstraps silently."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.multimodal import (
        multimodal_report_incremental,
        multimodal_state,
    )

    def split(batch_df: DataFrame):
        return (
            batch_df.filter(F.col(modality_col) == "image"),
            batch_df.filter(F.col(modality_col) == "audio"),
            batch_df.filter(F.col(modality_col) == "video"),
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        img, aud, vid = split(batch_df)
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # path absent — bootstrap batch
            state = None
        if state is not None and not state.filter("n > 0").isEmpty():
            multimodal_report_incremental(
                img, aud, vid, state,
                error_rate_threshold=error_rate_threshold,
                stat_threshold=stat_threshold,
                payload_col=payload_col, id_col=id_col,
            ).withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(report_path)
        multimodal_state(
            img, aud, vid, payload_col, id_col
        ).write.mode("append").parquet(state_path)

    return write_batch


def format_state_sink(
    state_path: str,
    columns: list[str],
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the additive format-mixture
    state (``column_name, format, n`` per micro-batch) that
    :func:`operators.text.format_drift_incremental` vets new ingest
    against; the reader re-aggregates, so repeated cells across appends
    simply sum. The SAME column list must build every append and the
    vetting call (a column added later would look like a brand-new
    all-drifted column)."""
    from pyspark_data_drift_detector_spark.operators.text import format_state

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        format_state(batch_df, columns).write.mode("append").parquet(
            state_path
        )

    return write_batch


def format_vetting_sink(
    state_path: str,
    report_path: str,
    columns: list[str],
    threshold: float = 0.02,
) -> Callable[[DataFrame, int], None]:
    """The format-quality nightly automation as ONE ``foreachBatch``
    sink (the ``ingest_vetting_sink`` contract): each micro-batch is
    first VETTED against the corpus-so-far format mixture
    (:func:`operators.text.format_drift_incremental`, stamped with
    ``batch_id`` and appended to ``report_path``), and only then does
    the state advance with the batch's own counts. Vet-before-advance:
    a batch compared against a state containing itself would dilute
    every shift it introduced. The FIRST batch (state missing or
    massless) bootstraps silently — states are seeded, no report row
    is written."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.text import (
        format_drift_incremental,
    )

    advance = format_state_sink(state_path, columns)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # path absent — bootstrap batch
            state = None
        # mass, not row existence: a present-but-all-zero state is still
        # a bootstrap (the vetting-sink gate convention)
        if state is not None and not state.filter("n > 0").isEmpty():
            format_drift_incremental(
                batch_df, state, columns, threshold=threshold
            ).withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(report_path)
        advance(batch_df, batch_id)

    return write_batch


def ingest_vetting_sink(
    fingerprint_path: str,
    passage_path: str,
    minhash_path: str,
    unigram_path: str,
    token_share_path: str,
    report_path: str,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 1,
    k_shingle: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    est_threshold: float = 0.5,
    hash_family: str = "xxhash",
    max_bucket_size: int | None = None,
    report_kwargs: dict | None = None,
) -> Callable[[DataFrame, int], None]:
    """The nightly ingest-vetting automation as ONE ``foreachBatch``
    sink: each micro-batch is first VETTED against the corpus-so-far
    states (``corpus_pipeline.corpus_report_incremental`` — one
    long-format report row set, stamped with ``batch_id``, appended to
    ``report_path``), and only then do all five states advance with the
    batch's own increments (composing the individual ``*_state_sink``
    writers). Vet-before-advance is the invariant: a batch must never be
    compared against a state that already contains it, or every document
    would flag as its own duplicate.

    The FIRST batch (no state yet — the unigram state is missing or
    empty) bootstraps: no report is written (there is no corpus to vet
    against), states are seeded. Downstream reads
    ``spark.read.parquet(report_path)`` and filters/alerts on
    ``drift_detected`` — O(families + groups) rows per batch.

    The member parameters (``window``/``k_shingle``/``num_hashes``/
    ``bands``/``hash_family``) are baked into the sink closure so every
    append and every vetting call share ONE configuration — the same
    contract the individual state sinks document. ``report_kwargs``
    forwards thresholds (``dup_threshold`` etc.) to the report."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.corpus_pipeline import (
        corpus_report_incremental,
    )

    advance = [
        fingerprint_state_sink(fingerprint_path, text_col, id_col),
        passage_state_sink(passage_path, text_col, id_col, window, stride),
        minhash_state_sink(
            minhash_path, text_col, id_col, k_shingle, num_hashes, hash_family
        ),
        unigram_state_sink(unigram_path, text_col, id_col),
        token_share_state_sink(token_share_path, group_col, text_col),
    ]
    kwargs = dict(report_kwargs or {})

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession

        def _read(path: str) -> DataFrame | None:
            try:
                return spark.read.parquet(path)
            except AnalysisException:  # path absent — bootstrap batch
                return None

        states = [
            _read(p)
            for p in (
                fingerprint_path,
                passage_path,
                minhash_path,
                unigram_path,
                token_share_path,
            )
        ]
        if all(s is not None for s in states) and not states[3].isEmpty():
            corpus_report_incremental(
                batch_df,
                *states,
                group_col=group_col,
                text_col=text_col,
                id_col=id_col,
                window=window,
                stride=stride,
                k_shingle=k_shingle,
                num_hashes=num_hashes,
                bands=bands,
                est_threshold=est_threshold,
                hash_family=hash_family,
                max_bucket_size=max_bucket_size,
                **kwargs,
            ).withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(report_path)
        for sink in advance:
            sink(batch_df, batch_id)

    return write_batch


def embedding_state_sink(
    state_path: str,
    embedding_col: str = "embedding",
    dim: int = 64,
    n_features: int = 48,
    seed: int = 7,
    sigma: float | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the additive geometric/shape
    embedding state (``kind, pos, val`` long rows per micro-batch) that
    :func:`operators.similarity.embedding_incremental` vets new vector
    ingest against; the reader re-aggregates, so repeated (kind, pos)
    keys across appends simply sum. The SAME
    ``dim/n_features/seed/sigma`` must build every append and the
    vetting call (the ``cluster_share_state_sink`` contract)."""
    from pyspark_data_drift_detector_spark.operators.similarity import (
        embedding_state,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        embedding_state(
            batch_df, embedding_col, dim, n_features, seed, sigma
        ).write.mode("append").parquet(state_path)

    return write_batch


#: state-kind → its lossless re-aggregation (exactly what the matching
#: incremental reader does on every load, materialized once)
_STATE_COMPACTORS = {
    "fingerprint": lambda df: df.where(
        "fingerprint IS NOT NULL"
    ).select("fingerprint").distinct(),
    "passage": lambda df: df.groupBy("whash").agg(
        F.expr("CAST(sum(n_docs) AS BIGINT) AS n_docs"),
        F.expr("CAST(sum(n_occ) AS BIGINT) AS n_occ"),
    ),
    "unigram": lambda df: df.groupBy("token").agg(
        F.expr("CAST(sum(cnt) AS BIGINT) AS cnt")
    ),
    "token_share": lambda df: df.groupBy("group_key").agg(
        F.expr("CAST(sum(n_docs) AS BIGINT) AS n_docs"),
        F.expr("CAST(sum(n_tokens) AS BIGINT) AS n_tokens"),
    ),
    "cluster_share": lambda df: df.groupBy("cluster_id").agg(
        F.expr("CAST(sum(n) AS BIGINT) AS n")
    ),
    "embedding": lambda df: df.groupBy("kind", "pos").agg(
        F.expr("sum(val) AS val")
    ),
    "format": lambda df: df.groupBy("column_name", "format").agg(
        F.expr("CAST(sum(n) AS BIGINT) AS n")
    ),
}


#: minimum column set per kind — validated BEFORE any aggregation so a
#: wrong kind/path fails with a clear message, not an AnalysisException
#: halfway through the rewrite
_STATE_COLUMNS = {
    "fingerprint": {"fingerprint"},
    "passage": {"whash", "n_docs", "n_occ"},
    "unigram": {"token", "cnt"},
    "token_share": {"group_key", "n_docs", "n_tokens"},
    "cluster_share": {"cluster_id", "n"},
    "embedding": {"kind", "pos", "val"},
    "format": {"column_name", "format", "n"},
}


def compact_state(
    spark,
    state_path: str,
    kind: str,
    target_path: str | None = None,
) -> dict:
    """Compact an append-only state table to its canonical aggregated
    form — every ``*_state_sink`` appends raw per-batch rows and every
    incremental reader re-aggregates on load, so after thousands of
    nightly batches the state is thousands of times larger than its
    information content. Compaction materializes that re-aggregation
    once; results are bit-identical before and after (pinned by test).

    ``kind``: ``fingerprint`` (distinct keys), ``passage`` / ``unigram``
    / ``token_share`` / ``cluster_share`` (summed additive counts).
    ``minhash`` state is deliberately absent: it is one signature row per
    document (the one-batch-per-document contract), so there is nothing
    to fold.

    With ``target_path`` the compacted table is written there (the
    object-store pattern: write new, repoint the pipeline). Without it,
    the table is swapped IN PLACE via a temp directory + atomic rename —
    local/POSIX filesystems only; on object stores pass ``target_path``.
    Returns ``{"rows_before", "rows_after"}``.
    """
    if kind not in _STATE_COMPACTORS:
        raise ValueError(
            f"unknown state kind {kind!r}; expected one of "
            f"{sorted(_STATE_COMPACTORS)}"
        )
    df = spark.read.parquet(state_path)
    missing = _STATE_COLUMNS[kind] - set(df.columns)
    if missing:
        raise ValueError(
            f"state at {state_path!r} does not look like a {kind!r} table: "
            f"missing column(s) {sorted(missing)} — wrong kind or wrong path"
        )
    before = df.count()
    compacted = _STATE_COMPACTORS[kind](df)
    if target_path is not None:
        compacted.write.mode("overwrite").parquet(target_path)
        after = spark.read.parquet(target_path).count()
        return {"rows_before": before, "rows_after": after}
    import os
    import shutil

    tmp = state_path.rstrip("/") + ".__compact_tmp"
    bak = state_path.rstrip("/") + ".__compact_bak"
    # Spark cannot overwrite a path it is reading from; stage, then swap
    # via a backup rename. Data is never LOST — a crash mid-swap leaves
    # the old table at .__compact_bak and/or the new one at
    # .__compact_tmp — but the two renames are not one atomic
    # operation: in the instant between them state_path itself is
    # absent, and a concurrently running vetting sink would read that
    # absence as a bootstrap. For live pipelines prefer target_path
    # (write new, repoint); run the in-place swap only with the sink
    # quiesced, and recover a crashed swap by renaming the
    # .__compact_bak/.__compact_tmp leftover back into place.
    compacted.write.mode("overwrite").parquet(tmp)
    if os.path.exists(bak):
        shutil.rmtree(bak)
    os.rename(state_path, bak)
    os.rename(tmp, state_path)
    shutil.rmtree(bak)
    after = spark.read.parquet(state_path).count()
    return {"rows_before": before, "rows_after": after}


def embedding_vetting_sink(
    embedding_state_path: str,
    cluster_state_path: str,
    centroids: list,
    report_path: str,
    embedding_col: str = "embedding",
    dim: int = 64,
    n_features: int = 48,
    seed: int = 7,
    sigma: float | None = None,
    scoring: str = "auto",
    report_kwargs: dict | None = None,
    share_threshold: float = 0.05,
) -> Callable[[DataFrame, int], None]:
    """The embedding-side nightly vetting automation — the vector twin of
    :func:`ingest_vetting_sink`: each micro-batch of vectors is VETTED
    against the corpus-so-far states (geometry/shape via
    ``embedding_incremental``, topic mix via
    ``cluster_balance_incremental`` melted to the same report schema),
    the stamped report appends to ``report_path``, and only then do both
    states advance. First batch bootstraps (states seeded, no report).
    ``centroids`` (e.g. a ``fit_kmeans`` result) is baked into the
    closure so every append and vetting call shares one set."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.embedding_pipeline import (
        embedding_report_incremental,
    )

    adv_geo = embedding_state_sink(
        embedding_state_path, embedding_col, dim, n_features, seed, sigma
    )
    adv_mix = cluster_share_state_sink(
        cluster_state_path, centroids, embedding_col, scoring
    )
    kwargs = dict(report_kwargs or {})

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            geo_state = spark.read.parquet(embedding_state_path)
            mix_state = spark.read.parquet(cluster_state_path)
            # gate on actual vector MASS, not row existence: an empty /
            # all-invalid first batch writes an 'n' row with val 0, and
            # vetting against a massless state raises before the states
            # advance — which would wedge the sink forever
            bootstrap = geo_state.filter(
                "kind = 'n' AND val > 0"
            ).isEmpty()
        except AnalysisException:
            bootstrap = True
        if not bootstrap:
            embedding_report_incremental(
                batch_df,
                geo_state,
                mix_state,
                centroids,
                embedding_col=embedding_col,
                dim=dim,
                n_features=n_features,
                seed=seed,
                sigma=sigma,
                share_threshold=share_threshold,
                scoring=scoring,
                **kwargs,
            ).withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(report_path)
        adv_geo(batch_df, batch_id)
        adv_mix(batch_df, batch_id)

    return write_batch


def transition_vetting_sink(
    pair_state_path: str,
    last_state_path: str,
    report_path: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    threshold: float = 0.02,
) -> Callable[[DataFrame, int], None]:
    """The events-side nightly vetting automation — the behavioral twin
    of :func:`ingest_vetting_sink`: each time-ordered micro-batch of
    events is VETTED against the corpus-so-far transition-pair state
    (``transition_incremental``: within-batch lags plus the cross-batch
    stitch from the last-event state), the stamped panel appends to
    ``report_path``, and only then do both states advance. First batch
    bootstraps silently (states seeded, no report).

    State maintenance is pure parquet APPEND on both tables: the pair
    delta appended is the increment's own ``curr_n`` rows (so stitched
    transitions are never lost and the rolled-up SUM stays exactly the
    full stream's counts), and the last-event fragments carry their
    ordering columns so every reader re-derives latest-per-user — no
    read-modify-write. Caveat (all sinks in this family): the three
    appends are not one atomic transaction — a crash between them, or a
    foreachBatch RETRY of a partially written batch, can double-append
    or skew the stitch; the report's ``batch_id`` column supports
    replay dedup downstream, and an exactly-once table format (Delta)
    is the upgrade path when it is available.
    """
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.temporal import (
        transition_incremental,
        transition_last_state,
        transition_pair_state,
    )

    cols = dict(
        user_col=user_col, type_col=type_col,
        ts_col=ts_col, order_col=order_col,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # bootstrap = the state paths don't exist yet (first batch); an
        # EXISTING state with zero transitions still vets — the batch is
        # then all-new behavior, shares 0 on the reference side
        try:
            pairs = spark.read.parquet(pair_state_path)
            last = spark.read.parquet(last_state_path)
            bootstrap = False
        except AnalysisException:
            bootstrap = True
        if bootstrap:
            transition_pair_state(batch_df, **cols).write.mode(
                "append"
            ).parquet(pair_state_path)
        else:
            panel = transition_incremental(
                batch_df, pairs, last, threshold=threshold, **cols
            ).localCheckpoint(eager=True)  # vet BEFORE states advance
            panel.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(report_path)
            panel.filter("curr_n > 0").selectExpr(
                "prev_type", "next_type", "curr_n AS n"
            ).write.mode("append").parquet(pair_state_path)
        transition_last_state(batch_df, **cols).write.mode(
            "append"
        ).parquet(last_state_path)

    return write_batch


def seasonality_state_sink(
    state_path: str,
    ts_col: str = "ts",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink maintaining the seasonal-mix state: each
    micro-batch appends its additive per-(grain, bucket) counts
    (O(31) rows per batch — the benford_state_sink shape), so
    :func:`operators.temporal.seasonality_incremental` over the rolled
    state vets the NEXT batch's day-of-week/hour shape against all
    history without re-reading it."""
    from pyspark_data_drift_detector_spark.operators.temporal import (
        seasonality_state,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        seasonality_state(batch_df, ts_col).write.mode("append").parquet(
            state_path
        )

    return write_batch


def read_seasonality_state(spark, state_path: str) -> DataFrame:
    """Merge the appended seasonal state back to one row per (grain,
    bucket) — counts are additive, so SUM is the exact merge."""
    return (
        spark.read.parquet(state_path)
        .groupBy("grain", "bucket")
        .agg(F.expr("CAST(sum(cnt) AS BIGINT) AS cnt"))
    )


def events_vetting_sink(
    volume_path: str,
    type_path: str,
    season_path: str,
    pair_state_path: str,
    last_state_path: str,
    report_path: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    report_kwargs: dict | None = None,
) -> Callable[[DataFrame, int], None]:
    """The full events-side nightly vetting automation — the flagship
    sibling of :func:`ingest_vetting_sink` (corpus) and
    :func:`embedding_vetting_sink` (vectors): each time-ordered
    micro-batch is VETTED against ALL the corpus-so-far event states
    (``events_pipeline.events_report_incremental`` — volume, type mix,
    seasonality, transitions in one long-format report, stamped with
    ``batch_id``), and only then do the five states advance. The
    transition panel is computed ONCE (checkpointed) and shared between
    the report and the pair-state advance, the
    ``transition_vetting_sink`` invariant — stitched pairs are never
    lost, so the rolled-up SUM stays exactly the full stream's counts.

    First batch bootstraps silently (states seeded, no report — there
    is no history to vet against). Same non-atomicity caveat as every
    sink in this family (``transition_vetting_sink`` docstring): the
    appends are not one transaction; ``batch_id`` supports replay dedup
    downstream.
    """
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.events_pipeline import (
        event_type_state,
        events_report_incremental,
        events_volume_state,
    )
    from pyspark_data_drift_detector_spark.operators.temporal import (
        seasonality_state,
        transition_incremental,
        transition_last_state,
        transition_pair_state,
    )

    cols = dict(
        user_col=user_col, type_col=type_col,
        ts_col=ts_col, order_col=order_col,
    )
    kwargs = dict(report_kwargs or {})

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession

        def _read(path: str) -> DataFrame | None:
            try:
                return spark.read.parquet(path)
            except AnalysisException:  # path absent — bootstrap batch
                return None

        vol = _read(volume_path)
        typ = _read(type_path)
        sea = _read(season_path)
        pairs = _read(pair_state_path)
        last = _read(last_state_path)
        # bootstrap is PER FAMILY: when the transition state exists but
        # another state is missing (migration from transition_vetting_sink,
        # crash between appends), the pair advance must STILL go through
        # the stitched panel — the within-batch-only path would lose the
        # prior-last→batch-first transitions and break the exact
        # full-stream count invariant; only the report needs all states.
        # A HALF-present transition state (crash between the pair-state
        # append and the last-state append, or vice versa) substitutes an
        # empty frame for the missing half: the stitch then contributes
        # nothing (LEFT JOIN against zero rows) but the pair advance stays
        # panel-derived, so no within-batch transition is double-counted
        # on replay and the count invariant holds for everything durably
        # appended. Only the both-absent case is a true bootstrap.
        if pairs is not None or last is not None:
            if pairs is None:
                pairs = transition_pair_state(batch_df.limit(0), **cols)
            if last is None:
                last = transition_last_state(batch_df.limit(0), **cols)
            panel = transition_incremental(
                batch_df, pairs, last,
                threshold=float(kwargs.get("transition_threshold", 0.02)),
                **cols,
            ).localCheckpoint(eager=True)  # vet BEFORE states advance
            if all(s is not None for s in (vol, typ, sea)):
                events_report_incremental(
                    batch_df, vol, typ, sea, pairs, last,
                    ts_col=ts_col, user_col=user_col, type_col=type_col,
                    order_col=order_col,
                    transition_panel=panel, **kwargs,
                ).withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(report_path)
            panel.filter("curr_n > 0").selectExpr(
                "prev_type", "next_type", "curr_n AS n"
            ).write.mode("append").parquet(pair_state_path)
        else:
            transition_pair_state(batch_df, **cols).write.mode(
                "append"
            ).parquet(pair_state_path)
        events_volume_state(batch_df, ts_col).write.mode("append").parquet(
            volume_path
        )
        event_type_state(batch_df, type_col).write.mode("append").parquet(
            type_path
        )
        seasonality_state(batch_df, ts_col).write.mode("append").parquet(
            season_path
        )
        transition_last_state(batch_df, **cols).write.mode("append").parquet(
            last_state_path
        )

    return write_batch


def linkage_state_sink(
    state_path: str,
    text_col: str = "name",
    id_col: str = "id",
    prefix_len: int = 6,
    suffix_len: int = 6,
    band_width: int = 8,
    compare_len: int = 64,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink appending master records' keyed linkage
    rows (:func:`operators.linkage.linkage_state`) — two
    ~``compare_len``-byte rows per record. The blocking parameters are
    part of the state contract: every append and every probe must
    share one configuration."""
    from pyspark_data_drift_detector_spark.operators.linkage import (
        linkage_state,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        linkage_state(
            batch_df, text_col, id_col, prefix_len, suffix_len,
            band_width, compare_len,
        ).write.mode("append").parquet(state_path)

    return write_batch


def components_state_sink(
    state_path: str,
    report_path: str,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> Callable[[DataFrame, int], None]:
    """Incremental connected components as ONE ``foreachBatch`` sink:
    each micro-batch of edges folds into the component-label state via
    the star-forest compression
    (:func:`operators.graph.components_incremental` — O(state + batch)
    input, the historical edge corpus is never re-read), the state is
    REPLACED (labels are a consolidated snapshot, not an append log —
    unlike the dedup/linkage sinks this state rewrites in place), and
    an O(1) verdict row appends to ``report_path``: ``batch_id,
    n_nodes, n_components, n_new_nodes, n_label_changes`` — a surging
    ``n_label_changes`` means the feed started bridging previously
    separate entities (the linkage-storm signal)."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.graph import (
        components_incremental,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from pyspark.sql.types import StructField, StructType

        src_type = batch_df.schema[src_col].dataType
        try:
            state = spark.read.parquet(state_path).select(
                "node", "component_id"
            )
        except AnalysisException:  # path absent — bootstrap batch
            state = spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField("node", src_type),
                        StructField("component_id", src_type),
                    ]
                ),
            )
        # checkpoint BEFORE the overwrite: the new state derives from a
        # read of the path it is about to replace
        new_state = components_incremental(
            batch_df, state, src_col, dst_col, max_iter
        ).localCheckpoint(eager=True)
        changed = (
            state.join(
                new_state.select(
                    "node", F.col("component_id").alias("__new_cid")
                ),
                "node",
            )
            .filter(F.col("component_id") != F.col("__new_cid"))
            .count()
        )
        n_prior = state.count()
        row = new_state.agg(
            F.lit(batch_id).alias("batch_id"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.countDistinct("component_id").cast("long").alias(
                "n_components"
            ),
            (F.count(F.lit(1)) - n_prior).cast("long").alias("n_new_nodes"),
            F.lit(changed).cast("long").alias("n_label_changes"),
        )
        row.write.mode("append").parquet(report_path)
        new_state.write.mode("overwrite").parquet(state_path)

    return write_batch


def linkage_vetting_sink(
    state_path: str,
    report_path: str,
    text_col: str = "name",
    id_col: str = "id",
    prefix_len: int = 6,
    suffix_len: int = 6,
    band_width: int = 8,
    max_distance: int = 2,
    compare_len: int = 64,
    max_block_pairs: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Incremental entity resolution as ONE ``foreachBatch`` sink — the
    master-data-management loop over a registration stream: each
    micro-batch is resolved against the master-so-far linkage state
    (:func:`operators.linkage.record_linkage_incremental` —
    ``matched_master`` / ``dup_in_batch`` / ``is_new`` verdicts,
    stamped with ``batch_id``, appended to ``report_path``), and then
    ONLY the ``is_new`` rows mint master identities: their keyed rows
    (under their probe ids) append to the state. Matched or
    batch-duplicate registrations never extend the master — that
    selective advance is what distinguishes linkage from the dedup
    vetting sinks, whose state absorbs every batch row.

    The first batch bootstraps against an empty state (everything
    unmatched; within-batch duplicate registrations still collapse to
    the smallest id, which then mints)."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from pyspark_data_drift_detector_spark.operators.linkage import (
        linkage_state,
        record_linkage_incremental,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:  # path absent — bootstrap batch
            # master_id's type comes from the feed's id column: a
            # hardcoded long with a string-id feed would write batch-0
            # report rows typed long and later batches typed string —
            # a mixed parquet schema that fails on read
            from pyspark.sql.types import (
                IntegerType,
                StringType,
                StructField,
                StructType,
            )

            state = spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField(
                            "master_id", batch_df.schema[id_col].dataType
                        ),
                        StructField("block", StringType()),
                        StructField("mprobe", StringType()),
                        StructField("mlen", IntegerType()),
                    ]
                ),
            )
        verdicts = record_linkage_incremental(
            batch_df, state, text_col, id_col, prefix_len, suffix_len,
            band_width, max_distance, compare_len, max_block_pairs,
        ).persist()
        verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(report_path)
        minted = batch_df.join(
            verdicts.filter("is_new").select(
                F.col("probe_id").alias(id_col)
            ),
            id_col,
            "left_semi",
        )
        linkage_state(
            minted, text_col, id_col, prefix_len, suffix_len,
            band_width, compare_len,
        ).write.mode("append").parquet(state_path)
        verdicts.unpersist(blocking=False)

    return write_batch
