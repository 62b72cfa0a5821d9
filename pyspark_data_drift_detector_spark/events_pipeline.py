"""Composed events-side drift flagship — the nightly artifact an event
pipeline ships, symmetric to ``corpus_pipeline.corpus_drift_report`` (text
corpora) and ``embedding_pipeline.embedding_drift_report`` (vector spaces):
one long-format frame answering "did the event stream's VOLUME, its
EVENT MIX, or its SEASONAL shape move between the reference and current
windows?".

Reference parity: the reference runs its numerical/categorical analyzers
over event-shaped tables one column at a time; this module is the composed
report those runs feed, with the temporal panels (seasonality) the
reference lacks.

Plan shape: every family reduces the two inputs to an O(types)/O(31)/O(1)
panel through grouped aggregates with map-side partials before a single
expression-only melt — the corpus is never sorted, windowed, or collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_data_drift_detector_spark.corpus_pipeline import _melt

_ROUND = 5


def _relchange(a: str, b: str) -> str:
    """Relative-change SQL fragment — the corpus_report convention shared
    by every report family (a==0 and b!=0 counts as 100% change)."""
    return (
        f"CASE WHEN {a} != 0 THEN abs(({b} - {a}) / CAST({a} AS DOUBLE))"
        f" WHEN {b} != 0 THEN 1.0D ELSE 0.0D END"
    )


def events_drift_report(
    df_ref: DataFrame,
    df_curr: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    rel_threshold: float = 0.1,
    share_threshold: float = 0.05,
    js_threshold: float = 0.1,
    psi_threshold: float = 0.1,
) -> DataFrame:
    """One long-format events drift report: ``family, key, metric,
    ref_value, curr_value, diff, drift_detected``.

    Families:

    - ``volume`` — events/day, active users, mean value, value null rate
      (relative-change flags, the corpus_report convention).
    - ``event_mix`` — per-type share rows (absolute-diff flag) plus one
      Jensen-Shannon distance row over the full type distribution.
    - ``seasonality`` — day-of-week and hour-of-day PSI rows from
      :func:`operators.temporal.seasonality_drift`.

    Thresholds compare against the ROUNDED diff (round-then-flag, the
    shared report convention so the oracle replays flags exactly).
    """
    r = _ROUND
    rel, sh, js, psi = (
        float(rel_threshold),
        float(share_threshold),
        float(js_threshold),
        float(psi_threshold),
    )

    # ---- volume: ONE side-tagged aggregate (map-side partials) --------
    tagged = df_ref.select(
        F.lit(0).alias("__side"),
        F.col(ts_col).alias("__ts"),
        F.col(user_col).alias("__user"),
        F.col(value_col).alias("__value"),
    ).unionByName(
        df_curr.select(
            F.lit(1).alias("__side"),
            F.col(ts_col).alias("__ts"),
            F.col(user_col).alias("__user"),
            F.col(value_col).alias("__value"),
        )
    )

    vol = tagged.groupBy().agg(
        *[
            e
            for s, tag in ((0, "ref"), (1, "curr"))
            for e in (
                F.count(F.when(F.col("__side") == s, F.lit(1))).alias(
                    f"{tag}_events"
                ),
                F.countDistinct(
                    F.when(
                        F.col("__side") == s, F.date_trunc("day", F.col("__ts"))
                    )
                ).alias(f"{tag}_days"),
                F.countDistinct(
                    F.when(F.col("__side") == s, F.col("__user"))
                ).alias(f"{tag}_users"),
                F.avg(F.when(F.col("__side") == s, F.col("__value"))).alias(
                    f"{tag}_mean_value"
                ),
                F.avg(
                    F.when(
                        F.col("__side") == s,
                        F.col("__value").isNull().cast("double"),
                    )
                ).alias(f"{tag}_null_rate"),
            )
        ]
    )
    vol_rows = []
    for metric, refe, cure in [
        (
            "events_per_day",
            "ref_events / CAST(greatest(ref_days, 1) AS DOUBLE)",
            "curr_events / CAST(greatest(curr_days, 1) AS DOUBLE)",
        ),
        ("active_users", "ref_users", "curr_users"),
        ("mean_value", "ref_mean_value", "curr_mean_value"),
        ("value_null_rate", "ref_null_rate", "curr_null_rate"),
    ]:
        diff = _relchange(f"({refe})", f"({cure})")
        vol_rows.append(
            (
                "'volume'",
                "''",
                f"'{metric}'",
                f"round({refe}, {r})",
                f"round({cure}, {r})",
                f"round({diff}, {r})",
                f"round({diff}, {r}) > {rel!r}D",
            )
        )
    volume = _melt(vol, vol_rows)

    # ---- event_mix: O(types) aligned share panel ----------------------
    ref_counts = (
        df_ref.select(F.col(type_col).alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("ref_cnt"))
    )
    curr_counts = (
        df_curr.select(F.col(type_col).alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("curr_cnt"))
    )
    per_type, js_row = _mix_rows(ref_counts, curr_counts, sh, js)

    # ---- seasonality: per-grain PSI from the O(31)-bucket panel -------
    from pyspark_data_drift_detector_spark.operators.temporal import (
        seasonality_drift,
    )

    season = (
        seasonality_drift(df_ref, df_curr, ts_col)
        .groupBy("grain")
        .agg(F.sum("psi_term").alias("psi"))
    )
    season_rows = _melt(
        season,
        [
            (
                "'seasonality'",
                "grain",
                "'psi'",
                "NULL",
                "NULL",
                f"round(psi, {r})",
                f"round(psi, {r}) > {psi!r}D",
            )
        ],
    )

    out = volume.unionByName(per_type).unionByName(js_row).unionByName(
        season_rows
    )
    return out.selectExpr(
        "family",
        "key",
        "metric",
        f"round(ref_value, {r}) AS ref_value",
        f"round(curr_value, {r}) AS curr_value",
        f"round(diff, {r}) AS diff",
        "drift_detected",
    )


def _mix_rows(
    ref_counts: DataFrame,
    curr_counts: DataFrame,
    share_threshold: float,
    js_threshold: float,
) -> tuple[DataFrame, DataFrame]:
    """Shared event-mix tail: align two O(types) count frames
    (``value, ref_cnt`` / ``value, curr_cnt``), emit per-type share rows
    plus the Jensen-Shannon distance row. The aligned panel feeds three
    consumers (per-type rows, totals, JS aggregate) — persisted so the
    inputs aren't recomputed per consumer (the dedup._reuse rationale;
    the panel is broadcast-sized)."""
    from pyspark_data_drift_detector_spark.operators.dedup import _reuse

    r = _ROUND
    # NULL-SAFE alignment: a NULL event type is one category and must
    # land in ONE panel row (the oracle's GROUP BY convention) — a plain
    # equi-join would split it into two half-rows and inflate the JS
    mix = _reuse(
        ref_counts.alias("rc")
        .join(
            curr_counts.alias("cc"),
            F.expr("rc.value <=> cc.value"),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("rc.value"), F.col("cc.value")).alias("value"),
            F.coalesce(F.col("ref_cnt"), F.lit(0)).alias("ref_cnt"),
            F.coalesce(F.col("curr_cnt"), F.lit(0)).alias("curr_cnt"),
        )
    )
    mix_tot = mix.groupBy().agg(
        F.sum("ref_cnt").alias("__rt"), F.sum("curr_cnt").alias("__ct")
    )
    shares = mix.crossJoin(F.broadcast(mix_tot)).selectExpr(
        "value",
        "ref_cnt / CAST(greatest(__rt, 1) AS DOUBLE) AS ref_share",
        "curr_cnt / CAST(greatest(__ct, 1) AS DOUBLE) AS curr_share",
    )
    per_type = _melt(
        shares,
        [
            (
                "'event_mix'",
                "CASE WHEN value IS NULL THEN '<null>'"
                " ELSE CAST(value AS STRING) END",
                "'share'",
                f"round(ref_share, {r})",
                f"round(curr_share, {r})",
                f"round(abs(curr_share - ref_share), {r})",
                f"round(abs(curr_share - ref_share), {r})"
                f" > {share_threshold!r}D",
            )
        ],
    )
    p, q = F.col("ref_share"), F.col("curr_share")
    m = (p + q) / 2
    kl_p = F.when((p > 0) & (m > 0), p * F.log2(p / m)).otherwise(F.lit(0.0))
    kl_q = F.when((q > 0) & (m > 0), q * F.log2(q / m)).otherwise(F.lit(0.0))
    js_panel = shares.groupBy().agg(
        F.sqrt(
            F.greatest(F.lit(0.0), (F.sum(kl_p) + F.sum(kl_q)) / 2)
        ).alias("js_distance")
    )
    js_row = _melt(
        js_panel,
        [
            (
                "'event_mix'",
                "''",
                "'js_distance'",
                "NULL",
                "NULL",
                f"round(js_distance, {r})",
                f"round(js_distance, {r}) > {js_threshold!r}D",
            )
        ],
    )
    return per_type, js_row


def events_volume_state(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Additive per-day event counts — the volume member's mergeable
    state (O(days) rows per append; SUM is the exact merge)."""
    return df.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def event_type_state(df: DataFrame, type_col: str = "event_type") -> DataFrame:
    """Additive per-type event counts — the mix member's mergeable
    state (O(types) rows per append; SUM is the exact merge)."""
    return df.groupBy(F.col(type_col).alias("value")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def events_report_incremental(
    batch: DataFrame,
    volume_state: DataFrame,
    type_state: DataFrame,
    season_state: DataFrame,
    transition_pairs_state: DataFrame,
    transition_last_state: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_col: str = "event_id",
    rel_threshold: float = 0.1,
    share_threshold: float = 0.05,
    js_threshold: float = 0.1,
    psi_threshold: float = 0.1,
    transition_threshold: float = 0.02,
    transition_panel: DataFrame | None = None,
) -> DataFrame:
    """The events-side nightly ingest-vetting flagship — the increment
    sibling of :func:`events_drift_report`, completing the trio with
    ``corpus_report_incremental`` and ``embedding_report_incremental``:
    ONE long-format report vetting an ingest batch's volume, event mix,
    seasonal shape, and transition behavior against the rolled-up states
    of ALL prior history, which is never re-read.

    States (each additive or latest-wins, maintainable by plain parquet
    appends / the ``streaming.state_tables`` sinks):
    :func:`events_volume_state` (per-day counts),
    :func:`event_type_state` (per-type counts),
    :func:`operators.temporal.seasonality_state` (per-bucket counts),
    :func:`operators.temporal.transition_pair_state` +
    ``transition_last_state`` (pair counts + latest event per user, for
    the cross-batch stitch).

    Report rows (``family, key, metric, ref_value, curr_value, diff,
    drift_detected`` — the shared flagship schema):

    - ``volume``      — events/day, batch vs history (relative-change flag).
    - ``event_mix``   — per-type share rows + one JS-distance row.
    - ``seasonality`` — per-grain PSI rows (dow / hour).
    - ``transitions`` — max per-pair share move (flagged) and the
      flagged-pair count (informational).

    Every member reduces the batch to an O(panel) aggregate; the melt is
    expression-only.
    """
    from pyspark_data_drift_detector_spark.operators.temporal import (
        seasonality_incremental,
        transition_incremental,
    )

    r = _ROUND
    rel = float(rel_threshold)

    # ---- volume: two 1-row aggregates over O(days) panels --------------
    ref_vol = (
        volume_state.groupBy("day")
        .agg(F.sum("n").alias("n"))
        .agg(
            F.sum("n").alias("__rn"),
            F.count(F.lit(1)).alias("__rd"),
        )
    )
    curr_vol = batch.agg(
        F.count(F.lit(1)).alias("__cn"),
        F.countDistinct(F.date_trunc("day", F.col(ts_col))).alias("__cd"),
    )
    epd_ref = "__rn / CAST(greatest(__rd, 1) AS DOUBLE)"
    epd_curr = "__cn / CAST(greatest(__cd, 1) AS DOUBLE)"
    epd_rc = _relchange(f"({epd_ref})", f"({epd_curr})")
    volume = _melt(
        ref_vol.crossJoin(F.broadcast(curr_vol)),
        [
            (
                "'volume'",
                "''",
                "'events_per_day'",
                f"round({epd_ref}, {r})",
                f"round({epd_curr}, {r})",
                f"round({epd_rc}, {r})",
                f"round({epd_rc}, {r}) > {rel!r}D",
            )
        ],
    )

    # ---- event_mix: rolled type state vs batch counts ------------------
    ref_counts = type_state.groupBy("value").agg(
        F.sum("n").alias("ref_cnt")
    )
    curr_counts = (
        batch.select(F.col(type_col).alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("curr_cnt"))
    )
    per_type, js_row = _mix_rows(
        ref_counts, curr_counts, float(share_threshold), float(js_threshold)
    )

    # ---- seasonality: the increment member, summed per grain -----------
    season = (
        seasonality_incremental(batch, season_state, ts_col)
        .groupBy("grain")
        .agg(F.sum("psi_term").alias("psi"))
    )
    season_rows = _melt(
        season,
        [
            (
                "'seasonality'",
                "grain",
                "'psi'",
                "NULL",
                "NULL",
                f"round(psi, {r})",
                f"round(psi, {r}) > {float(psi_threshold)!r}D",
            )
        ],
    )

    # ---- transitions: the increment member's panel, summarized ---------
    # a sink that already computed (and checkpointed) the panel for its
    # own state advance passes it in; the two consumers then share one
    # computation instead of re-running the lag window
    trans_panel = (
        transition_panel
        if transition_panel is not None
        else transition_incremental(
            batch,
            transition_pairs_state,
            transition_last_state,
            user_col=user_col,
            type_col=type_col,
            ts_col=ts_col,
            order_col=order_col,
            threshold=float(transition_threshold),
        )
    )
    trans_agg = trans_panel.agg(
        F.max("share_abs_diff").alias("__mx"),
        F.sum(F.col("drift_detected").cast("long")).alias("__nf"),
    )
    trans_rows = _melt(
        trans_agg,
        [
            (
                "'transitions'",
                "''",
                "'max_share_diff'",
                "NULL",
                "NULL",
                f"round(__mx, {r})",
                f"round(__mx, {r}) > {float(transition_threshold)!r}D",
            ),
            (
                "'transitions'",
                "''",
                "'flagged_pairs'",
                "NULL",
                "__nf",
                "__nf",
                "false",
            ),
        ],
    )

    out = (
        volume.unionByName(per_type)
        .unionByName(js_row)
        .unionByName(season_rows)
        .unionByName(trans_rows)
    )
    return out.selectExpr(
        "family",
        "key",
        "metric",
        f"round(ref_value, {r}) AS ref_value",
        f"round(curr_value, {r}) AS curr_value",
        f"round(diff, {r}) AS diff",
        "drift_detected",
    )
