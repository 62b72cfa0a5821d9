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

    def relchange(a: str, b: str) -> str:
        return (
            f"CASE WHEN {a} != 0 THEN abs(({b} - {a}) / CAST({a} AS DOUBLE))"
            f" WHEN {b} != 0 THEN 1.0D ELSE 0.0D END"
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
        diff = relchange(f"({refe})", f"({cure})")
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
    mix = (
        df_ref.select(F.col(type_col).alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("ref_cnt"))
        .join(
            df_curr.select(F.col(type_col).alias("value"))
            .groupBy("value")
            .agg(F.count(F.lit(1)).alias("curr_cnt")),
            "value",
            "full_outer",
        )
        .fillna({"ref_cnt": 0, "curr_cnt": 0})
    )
    # the O(types) panel feeds three consumers (per-type rows, totals,
    # JS aggregate) — persist it so the corpus isn't re-scanned per
    # consumer (the dedup._reuse rationale, panel is broadcast-sized)
    from pyspark_data_drift_detector_spark.operators.dedup import _reuse

    mix = _reuse(mix)
    mix_tot = mix.groupBy().agg(
        F.sum("ref_cnt").alias("__rt"), F.sum("curr_cnt").alias("__ct")
    )
    mix = mix.crossJoin(F.broadcast(mix_tot)).selectExpr(
        "value",
        "ref_cnt / CAST(greatest(__rt, 1) AS DOUBLE) AS ref_share",
        "curr_cnt / CAST(greatest(__ct, 1) AS DOUBLE) AS curr_share",
    )
    per_type = _melt(
        mix,
        [
            (
                "'event_mix'",
                "CASE WHEN value IS NULL THEN '<null>'"
                " ELSE CAST(value AS STRING) END",
                "'share'",
                f"round(ref_share, {r})",
                f"round(curr_share, {r})",
                f"round(abs(curr_share - ref_share), {r})",
                f"round(abs(curr_share - ref_share), {r}) > {sh!r}D",
            )
        ],
    )
    p, q = F.col("ref_share"), F.col("curr_share")
    m = (p + q) / 2
    kl_p = F.when((p > 0) & (m > 0), p * F.log2(p / m)).otherwise(F.lit(0.0))
    kl_q = F.when((q > 0) & (m > 0), q * F.log2(q / m)).otherwise(F.lit(0.0))
    js_panel = mix.groupBy().agg(
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
                f"round(js_distance, {r}) > {js!r}D",
            )
        ],
    )

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
