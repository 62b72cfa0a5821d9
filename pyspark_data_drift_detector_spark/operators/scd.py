"""Slowly-changing-dimension (SCD type 2) apply-changes.

The reference diffs snapshots (``schema_analyzer.py`` row diff; in-repo
``snapshot_diff``) but has nothing that MAINTAINS history: the
warehouse loop of "here is today's change feed, version the dimension"
— close the superseded row, open the new one, keep every prior version
queryable by validity interval. That operator is table stakes for any
engine feeding training pipelines with point-in-time-correct features
(an as-of join against an SCD2 dimension is how features avoid
leakage).

Shape (the 100 TB story):

- **One shuffle on the dimension key.** Current rows and the change
  feed union into per-key event sequences; lag/lead windows partition
  by key — the natural partitioning, no global sort, history rows
  pass through untouched.
- **Multi-change batches sequence correctly.** A batch may carry
  several changes for one key (late-arriving CDC); they chain in
  ``effective`` order, each closing its predecessor.
- **No-op changes vanish.** A change whose tracked attributes equal
  the preceding state (current row or earlier change in the same
  batch) creates no version — equality is transitive within a run,
  so one lag comparison removes whole no-op runs.
- **Deterministic.** Ordering key is ``(effective, origin)`` with the
  incumbent current row sorting first at equal timestamps; re-running
  the same batch yields byte-identical history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    effective_col: str = "effective_ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Apply a change feed to an SCD2 dimension table and return the
    new dimension (same schema: key, tracked columns, ``valid_from``,
    ``valid_to`` — NULL while open — and ``is_current``).

    Two changes for one key at one effective timestamp tie-break by
    the tracked-state fingerprint — arbitrary but DETERMINISTIC (the
    ambiguity is the CDC feed's, the resolution must at least be
    stable).

    Input contract: at most ONE open (``is_current``) row per key —
    the defining SCD2 invariant, which this operator also preserves on
    output (so applies compose; see the idempotence test). A malformed
    dimension with two open rows for one key would interleave both
    into one chain.

    ``dim`` rows with ``is_current = false`` are history and pass
    through untouched. For each key, the open row plus its (possibly
    multiple) changes re-chain: every superseded version closes at its
    successor's effective timestamp, the last version stays open. Keys
    absent from the feed are untouched; keys absent from the dimension
    insert fresh chains. Changes whose tracked values equal the
    in-effect state produce nothing.

    Change rows with a NULL key or NULL effective timestamp are
    dropped from sequencing: a NULL key names no chain and a NULL
    timestamp has no position in one — enforce the feed contract
    upstream (``constraint_suite`` covers exactly this shape).

    **Tombstones** (CDC delete events): pass ``op_col`` naming a
    column in ``changes`` whose value equals ``delete_op`` on delete
    rows (every other value — or NULL — is an upsert). A delete
    closes the version in effect at its effective timestamp and opens
    NOTHING: the chain ends fully closed (the shape
    :func:`scd2_validate`'s ``no_open`` check deems legal — it is
    reported as an audit signal, not corruption). A delete with no
    version in effect (unknown key, already-deleted key, or a delete
    preceding the key's first change in the batch) is a no-op. A later
    upsert RE-OPENS a fresh chain at its own timestamp — even when its
    tracked values equal the pre-delete state, because the entity was
    absent in between (the re-registration case); the absence interval
    stays uncovered, so point-in-time lookups inside it correctly
    return NULL (and ``scd2_validate`` reports it under ``gap`` — for
    tombstoned entities that gap is the truth, not a defect). Tracked
    values on delete rows are ignored (they never become a version) —
    the columns must merely exist in the schema. Re-applying a
    delete-only feed is a no-op (each delete finds nothing open).
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    ensure_safe_columns(
        [key_col, effective_col, from_col, to_col, current_col]
        + ([op_col] if op_col is not None else [])
        + list(tracked_cols)
    )
    if not tracked_cols:
        raise ValueError("tracked_cols must name at least one column")
    tracked = ", ".join(f"`{c}`" for c in tracked_cols)
    # null-safe tracked-state fingerprint for the no-op comparison:
    # struct equality in SQL treats NULL = NULL as NULL, so compare a
    # canonical string form with a NULL sentinel per field. State
    # fingerprints are prefixed 's' so the delete sentinel 'd' can
    # NEVER collide with any tracked state (exact disjointness, no
    # reserved-character caveat). 'd' < 's...' also makes a delete
    # sort before an upsert at the same effective timestamp — the
    # deterministic resolution of that CDC ambiguity (close, then
    # immediately re-open: a contiguous chain, not an empty version).
    fp = (
        "concat('s', concat_ws('\\u0001', "
        + ", ".join(
            f"coalesce(CAST(`{c}` AS STRING), '\\u0000')"
            for c in tracked_cols
        )
        + "))"
    )
    if op_col is None:
        feed_fp, feed_del = f"{fp} AS __fp", "false AS __del"
    else:
        esc = delete_op.replace("'", "''")
        is_del = f"coalesce(CAST(`{op_col}` AS STRING) = '{esc}', false)"
        feed_fp = f"CASE WHEN {is_del} THEN 'd' ELSE {fp} END AS __fp"
        feed_del = f"{is_del} AS __del"
    query = f"""
    WITH hist AS (
      SELECT `{key_col}`, {tracked}, `{from_col}`, `{to_col}`,
             `{current_col}`
      FROM {{dim}} WHERE NOT `{current_col}`),
    cur AS (
      SELECT `{key_col}`, {tracked}, `{from_col}` AS eff, 0 AS origin,
             {fp} AS __fp, false AS __del
      FROM {{dim}} WHERE `{current_col}`),
    feed AS (
      SELECT `{key_col}`, {tracked}, `{effective_col}` AS eff,
             1 AS origin, {feed_fp}, {feed_del}
      FROM {{changes}}
      WHERE `{key_col}` IS NOT NULL AND `{effective_col}` IS NOT NULL),
    seq AS (
      SELECT *,
        LAG(__fp) OVER (PARTITION BY `{key_col}`
                        ORDER BY eff, origin, __fp) AS __prev_fp
      FROM (SELECT * FROM cur UNION ALL SELECT * FROM feed)),
    kept AS (
      -- the incumbent always survives; an upsert survives only if it
      -- alters the tracked state in effect just before it (a 'd'
      -- predecessor always differs: re-registration after a delete is
      -- a real change even to identical values); a delete survives
      -- only if something is actually open to close (a NULL or 'd'
      -- predecessor means the entity is absent -> no-op)
      SELECT * FROM seq
      WHERE origin = 0
         OR (CASE WHEN __del
              THEN __prev_fp IS NOT NULL AND __prev_fp != 'd'
              ELSE __prev_fp IS NULL OR __fp != __prev_fp END)),
    chained AS (
      -- deletes participate as LEAD targets (closing their
      -- predecessor at the delete timestamp) but emit no version row
      SELECT `{key_col}`, {tracked}, eff AS `{from_col}`,
        LEAD(eff) OVER (PARTITION BY `{key_col}`
                        ORDER BY eff, origin, __fp) AS `{to_col}`,
        __del
      FROM kept)
    SELECT `{key_col}`, {tracked}, `{from_col}`, `{to_col}`,
           (`{to_col}` IS NULL) AS `{current_col}`
    FROM chained WHERE NOT __del
    UNION ALL
    SELECT `{key_col}`, {tracked}, `{from_col}`, `{to_col}`,
           `{current_col}`
    FROM hist"""
    return dim.sparkSession.sql(query, dim=dim, changes=changes)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    fact_key_col: str,
    fact_ts_col: str,
    dim_key_col: str,
    tracked_cols: list[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    suffix: str = "_at",
) -> DataFrame:
    """Point-in-time dimension lookup — the leakage-safe feature join:
    attach to every fact row the dimension version IN EFFECT at the
    fact's timestamp (not today's version, which would leak future
    attribute values into training features).

    Implementation: a backward as-of join (``temporal.asof_join``) of
    the facts against the versions keyed on ``valid_from`` — one
    shuffle on the key, no range-join row explosion. Correctness rests
    on the :func:`scd2_apply` invariant that a key's versions are
    CONTIGUOUS (each ``valid_to`` equals the successor's
    ``valid_from``): the latest version with ``valid_from <= ts``
    therefore always covers ``ts``. Facts before a key's first version
    (or with unknown keys) get NULL attributes — left-join semantics.
    Fully-CLOSED chains (soft-deleted entities — legal per
    :func:`scd2_validate`'s ``no_open`` convention, produced by
    :func:`scd2_apply` tombstones) are end-bounded too: a fact
    timestamped at or after the final ``valid_to`` attaches NULLs, not
    the last version's stale attributes — "the version in effect at
    ts" when nothing is in effect is nothing. Uncovered gaps between a
    delete and a re-registration behave the same way.

    Output: every fact column plus ``<tracked><suffix>`` and
    ``<fact_ts_col><suffix>`` (the matched version's start; NULL when
    no version covers the fact).
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )
    from pyspark_data_drift_detector_spark.operators.temporal import (
        asof_join,
    )

    ensure_safe_columns(
        [fact_key_col, fact_ts_col, dim_key_col, from_col, to_col]
        + list(tracked_cols)
    )
    vt = "__scd_vt"
    versions = dim.select(
        F.col(dim_key_col).alias(fact_key_col),
        F.col(from_col).alias(fact_ts_col),
        F.col(to_col).alias(vt),
        *[F.col(c) for c in tracked_cols],
    )
    joined = asof_join(
        facts,
        versions,
        ts_col=fact_ts_col,
        by=fact_key_col,
        value_cols=[vt, *tracked_cols],
        direction="backward",
        suffix=suffix,
    )
    # end-bound: contiguity makes every NON-final version's valid_to
    # equal its successor's valid_from, so the matched version can only
    # "expire" before the fact when it is a chain's LAST version (or
    # precedes an uncovered gap) — exactly the deleted-entity cases
    covered = F.col(f"{vt}{suffix}").isNull() | (
        F.col(fact_ts_col) < F.col(f"{vt}{suffix}")
    )
    out = joined
    for c in [*tracked_cols, fact_ts_col]:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(covered, F.col(f"{c}{suffix}")),
        )
    return out.drop(f"{vt}{suffix}")


def scd2_report(
    dim: DataFrame,
    key_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Dimension-history health panel — the O(1) ``(metric, value)``
    report member of the SCD family (:func:`scd2_validate` answers "is
    the shape legal"; this answers "what does the history LOOK like" —
    the numbers a warehouse owner watches batch over batch):

    - ``n_rows`` / ``n_keys`` — version volume vs entity count;
    - ``versions_per_key_mean`` / ``versions_per_key_max`` — change
      velocity (a max spike means one entity is thrashing);
    - ``single_version_share`` — entities that never changed;
    - ``open_share`` — keys with a live row; its complement is the
      soft-deleted population (:func:`scd2_apply` tombstones);
    - ``closed_rows_share`` — history depth of the table;
    - ``avg_closed_lifetime_days`` — mean validity span of CLOSED
      versions (NULL when none) — shrinking lifetimes mean attributes
      are churning faster.

    One per-key groupBy + one aggregate + an expression-only melt;
    O(keys) intermediate, O(metrics) output. Deterministic: no wall
    clock — open rows contribute no lifetime."""
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    ensure_safe_columns([key_col, from_col, to_col, current_col])
    per_key = dim.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("nv"),
        F.max(F.col(current_col).cast("int")).alias("has_open"),
    )
    agg = (
        dim.agg(
            F.count(F.lit(1)).cast("double").alias("n_rows"),
            F.sum((~F.col(current_col)).cast("int"))
            .cast("double")
            .alias("n_closed"),
            F.avg(
                F.when(
                    F.col(to_col).isNotNull(),
                    (
                        F.unix_timestamp(to_col)
                        - F.unix_timestamp(from_col)
                    )
                    / 86400.0,
                )
            ).alias("avg_closed_lifetime_days"),
        )
        .crossJoin(
            F.broadcast(
                per_key.agg(
                    F.count(F.lit(1)).cast("double").alias("n_keys"),
                    F.avg("nv").alias("versions_per_key_mean"),
                    F.max("nv").cast("double").alias("versions_per_key_max"),
                    F.avg((F.col("nv") == 1).cast("int")).alias(
                        "single_version_share"
                    ),
                    F.avg("has_open").alias("open_share"),
                )
            )
        )
    )
    metrics = [
        ("n_rows", F.col("n_rows")),
        ("n_keys", F.col("n_keys")),
        ("versions_per_key_mean", F.col("versions_per_key_mean")),
        ("versions_per_key_max", F.col("versions_per_key_max")),
        ("single_version_share", F.col("single_version_share")),
        ("open_share", F.col("open_share")),
        ("closed_rows_share", F.col("n_closed") / F.col("n_rows")),
        (
            "avg_closed_lifetime_days",
            F.col("avg_closed_lifetime_days"),
        ),
    ]
    melted = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("metric"), expr.alias("value")
                    )
                    for name, expr in metrics
                ]
            )
        ).alias("m")
    )
    return melted.select("m.metric", "m.value")


def scd2_validate(
    dim: DataFrame,
    key_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD2 invariant checker — the dimension-history member of the
    declarative-checks family (``constraint_suite`` covers row-level
    shapes; this covers the TEMPORAL shape a versioned dimension must
    hold before :func:`scd2_lookup` can be trusted):

    - ``multiple_open``: keys with more than one ``is_current`` row;
    - ``no_open``: keys whose chain has no open row (fully closed —
      legal for soft-deleted entities, so reported, not damned);
    - ``open_not_null_to``: rows flagged current but carrying a
      ``valid_to`` (or closed rows missing one) — flag/interval
      disagreement;
    - ``overlap``: consecutive versions of a key whose intervals
      overlap (``valid_from < previous valid_to`` is fine at equality;
      strictly inside is corruption);
    - ``gap``: consecutive versions with uncovered time between them
      (``valid_from > previous valid_to``) — lookups inside the hole
      return NULL;
    - ``inverted``: rows with ``valid_to <= valid_from``.

    Output: ``(check, n_violations)`` — all BIGINT, one row per check,
    always all six rows (0 = clean). One keyed window pass + one
    aggregate; O(checks) output.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    ensure_safe_columns([key_col, from_col, to_col, current_col])
    query = f"""
    WITH seq AS (
      SELECT `{key_col}` AS k, `{from_col}` AS vf, `{to_col}` AS vt,
        `{current_col}` AS cur,
        LAG(`{to_col}`) OVER (PARTITION BY `{key_col}`
                              ORDER BY `{from_col}`) AS pvt
      FROM {{src}}),
    per_key AS (
      SELECT k, CAST(SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS INT)
               AS n_open
      FROM seq GROUP BY k),
    agg AS (
      SELECT
        (SELECT COUNT(1) FROM per_key WHERE n_open > 1)
          AS multiple_open,
        (SELECT COUNT(1) FROM per_key WHERE n_open = 0) AS no_open,
        (SELECT COUNT(1) FROM seq
         WHERE (cur AND vt IS NOT NULL)
            OR (NOT cur AND vt IS NULL)) AS open_not_null_to,
        (SELECT COUNT(1) FROM seq
         WHERE pvt IS NOT NULL AND vf < pvt) AS overlap,
        (SELECT COUNT(1) FROM seq
         WHERE pvt IS NOT NULL AND vf > pvt) AS gap,
        (SELECT COUNT(1) FROM seq
         WHERE vt IS NOT NULL AND vt <= vf) AS inverted)
    SELECT t.check, CAST(t.n AS BIGINT) AS n_violations FROM agg
    LATERAL VIEW explode(map(
      'multiple_open', multiple_open,
      'no_open', no_open,
      'open_not_null_to', open_not_null_to,
      'overlap', overlap,
      'gap', gap,
      'inverted', inverted)) t AS `check`, n"""
    return dim.sparkSession.sql(query, src=dim)
