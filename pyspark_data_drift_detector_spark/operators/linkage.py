"""Cross-table record linkage (entity resolution).

The reference has no cross-table matcher: its categorical "new vs
known value" comparison (reference ``categorical_analyzer.py``) treats
any byte difference as a brand-new entity, and the in-repo fuzzy dedup
family (``operators/dedup.py:fuzzy_pairs``) resolves typo twins only
WITHIN one table. This module closes the remaining gap: probe records
(a new registration feed, a vendor list, an OCR batch) matched against
a MASTER table through multi-pass blocking + bounded edit-distance
verification + deterministic best-match selection — the classic
master-data-management loop, re-expressed as three Spark shuffles.

Scale shape (the 100 TB story):

- **Multi-pass blocking, never a cross join.** A candidate pair must
  share at least one of TWO blocking keys per record — the normalized
  *prefix* block and the normalized *suffix* block, each concatenated
  with a length band. Two passes are the standard recall fix for
  single-key blocking (an edit inside the prefix escapes the prefix
  pass but is caught by the suffix pass, and vice versa); both are
  emitted by one ``explode`` so the keyed projection stays a single
  narrow map.
- **Hot-block cap on the PAIR PRODUCT.** Real master tables have
  degenerate blocks ("customer#", "llc", ""). ``max_block_pairs``
  drops any block whose ``probe_count * master_count`` exceeds the
  cap — the quadratic guard is on the actual join-output size, not on
  one side's membership. Documented bounded-recall tradeoff, same
  contract as ``max_block_size`` in ``fuzzy_pairs`` /
  ``max_shingle_df`` in ``jaccard_pairs``.
- **Bounded verify.** Levenshtein runs on the first ``compare_len``
  normalized chars (constant per-pair cost) after a free
  length-difference prefilter (``|len1-len2| > max_distance`` cannot
  match). All JVM builtins — no Python in the path.
- **Deterministic winner.** Best match per probe is
  ``min(struct(distance, master_id))``: one shuffle on ``probe_id``,
  ties broken by smallest master id, so the same inputs always link
  the same way (required for engine-portable oracles and idempotent
  re-runs).
- **State, not re-reads.** :func:`linkage_state` is the compact keyed
  projection of the master (two ~``compare_len``-byte rows per master
  record). Incremental batches probe the state; the master table is
  never re-scanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(text_col: str):
    """Whitespace-collapsed lowercase normalization — byte-for-byte the
    ``fuzzy_pairs`` convention so linkage and dedup agree on what
    "the same string" means."""
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def linkage_keyed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    prefix_len: int = 6,
    suffix_len: int = 6,
    band_width: int = 8,
    compare_len: int = 64,
    band_slack: int = 0,
    token_block: bool = False,
) -> DataFrame:
    """Two-pass keyed projection: per record, one row per blocking key —
    the pass-tagged prefix key(s) (``p#<prefix>#<band>``) and the
    bandless suffix key (``s#<suffix>``), plus the capped comparison
    window and the normalized length.

    ``band_slack`` is the probe-side recall guarantee: with slack ``d``
    a record emits a prefix key for EVERY band its length could land in
    after up to ``d`` edits (``floor((len-d)/bw) .. floor((len+d)/bw)``
    — at most 2 bands when ``d < bw``). The master side keys with slack
    0, so any candidate whose prefix survived the edits is guaranteed
    to share a prefix key regardless of band crossings; the suffix key
    (deliberately unbanded for the same reason) is the backstop for
    edits INSIDE the prefix. Only an edit set touching both the prefix
    and the suffix escapes blocking — the documented recall bound.

    Empty/whitespace-only texts are dropped here — they all share one
    block at distance 0 (the O(n²) blank-rows blowup) and a blank
    probe has no linkable identity.

    ``token_block`` enables the THIRD pass: a banded prefix key over
    the SORTED-TOKEN normalized form (``t#<prefix>#<band>``) plus a
    carried ``tprobe`` comparison window of that form. Token reorders
    ("ACME Corp" vs "Corp ACME") defeat both the prefix and the suffix
    pass AND the plain Levenshtein verify; the sorted form is
    order-invariant, so reordered twins share a ``t#`` key and verify
    at the sorted-form edit distance (0 for a pure reorder — token
    sorting preserves total length, so the length band and prefilter
    apply unchanged)."""
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    # text_col is interpolated into a SQL expression (right() has no
    # Column-API form) — reject hostile names before they reach it
    ensure_safe_columns([text_col, id_col])
    norm = _normalized(text_col)
    prefix = F.substring(norm, 1, prefix_len)
    lo = F.floor((F.length(norm) - band_slack) / band_width)
    hi = F.floor((F.length(norm) + band_slack) / band_width)
    pkeys = F.transform(
        F.sequence(lo, hi),
        lambda b: F.concat_ws("#", F.lit("p"), prefix, b.cast("string")),
    )
    skey = F.concat_ws(
        "#", F.lit("s"),
        F.expr(f"right({_norm_sql_col(text_col)}, {suffix_len})"),
    )
    cols = [
        F.col(id_col).alias("id"),
        F.substring(norm, 1, compare_len).alias("probe"),
        F.length(norm).alias("len"),
    ]
    blocks = F.concat(pkeys, F.array(skey))
    if token_block:
        sorted_norm = F.array_join(F.sort_array(F.split(norm, " ")), " ")
        tprefix = F.substring(sorted_norm, 1, prefix_len)
        tkeys = F.transform(
            F.sequence(lo, hi),
            lambda b: F.concat_ws(
                "#", F.lit("t"), tprefix, b.cast("string")
            ),
        )
        cols.append(F.substring(sorted_norm, 1, compare_len).alias("tprobe"))
        blocks = F.concat(blocks, tkeys)
    keyed = df.select(*cols, blocks.alias("__blocks")).filter(
        F.col("len") > 0
    )
    out_cols = ["id", "probe", "len"] + (["tprobe"] if token_block else [])
    return keyed.select(
        *out_cols, F.explode("__blocks").alias("block")
    )


def _norm_sql_col(text_col: str) -> str:
    """SQL-string twin of :func:`_normalized` (for expressions like
    ``right()`` that the Column API lacks). The identifier is
    backtick-quoted (the scd/temporal SQL-builder convention):
    ``ensure_safe_columns`` rejects quote-context escapes, but a LEGAL
    name with spaces, hyphens or dots would otherwise misparse as
    arithmetic or resolve to the wrong column."""
    from pyspark_data_drift_detector_spark.functions.quoting import qi

    return (
        f"regexp_replace(lower(trim({qi(text_col)})), '\\\\s+', ' ')"
    )


def linkage_state(
    master: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    prefix_len: int = 6,
    suffix_len: int = 6,
    band_width: int = 8,
    compare_len: int = 64,
    token_block: bool = False,
) -> DataFrame:
    """Compact master-side state: ``(master_id, block, probe, mlen)``,
    two rows per master record (one per blocking pass; three with
    ``token_block``, which also adds the ``mtprobe`` sorted-form
    window). Append per master refresh;
    :func:`record_linkage_against_state` probes it without ever
    re-reading the master table. The blocking parameters — including
    ``token_block`` — are part of the state contract (every append and
    every probe must share one configuration), same rule as
    ``fuzzy_state``."""
    keyed = linkage_keyed(
        master, text_col, id_col, prefix_len, suffix_len, band_width,
        compare_len, token_block=token_block,
    )
    cols = [
        F.col("id").alias("master_id"),
        "block",
        F.col("probe").alias("mprobe"),
        F.col("len").alias("mlen"),
    ]
    if token_block:
        cols.append(F.col("tprobe").alias("mtprobe"))
    return keyed.select(*cols)


def record_linkage_against_state(
    probe: DataFrame,
    state: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    prefix_len: int = 6,
    suffix_len: int = 6,
    band_width: int = 8,
    max_distance: int = 2,
    compare_len: int = 64,
    max_block_pairs: int | None = None,
    token_block: bool = False,
) -> DataFrame:
    """Link every probe record to its best master match via the
    pre-keyed ``state``. Returns ONE row per non-blank probe record::

        probe_id, master_id, distance, n_candidates, matched

    ``master_id``/``distance`` are NULL when nothing in the master is
    within ``max_distance`` edits of the probe's comparison window;
    ``n_candidates`` counts the verified (distance-passing) masters —
    a match-ambiguity signal (n_candidates > 1 means blocking found
    several plausible identities and review may be warranted).

    Input contract: probe ids must be unique (the usual feed shape).
    Duplicate ids would pool their candidates into one best-match row
    — dedupe the feed first if ids can repeat.

    ``token_block`` (requires a state built with the same flag) adds
    the sorted-token third pass and verifies at ``min(lev(probe,
    mprobe), lev(sorted, msorted))`` — ONE distance domain, so the
    deterministic ``min(struct(distance, master_id))`` winner rule is
    unchanged: a pure token reorder scores 0 (exact), a reorder plus k
    typos scores k. (A token-set Jaccard verify was considered and
    rejected: it would introduce a second, incomparable score into the
    ranking; the sorted-form edit distance subsumes the reorder case
    inside the existing bounded-window machinery.)

    Shuffle inventory: block join (1), pair dedup across the two
    passes (2), best-match groupBy on probe_id (3) + the final
    probe-id equi-join. Each key is either the block key or an id —
    no full-text column ever crosses an exchange (only the capped
    ``compare_len`` windows travel; two of them with ``token_block``)."""
    keyed = linkage_keyed(
        probe, text_col, id_col, prefix_len, suffix_len, band_width,
        compare_len, band_slack=max_distance, token_block=token_block,
    )
    st = state
    if max_block_pairs is not None:
        pc = keyed.groupBy("block").agg(F.count(F.lit(1)).alias("__pc"))
        mc = st.groupBy("block").agg(F.count(F.lit(1)).alias("__mc"))
        ok = (
            pc.join(mc, "block")
            .filter(F.col("__pc") * F.col("__mc") <= max_block_pairs)
            .select("block")
        )
        keyed = keyed.join(ok, "block", "left_semi")
        st = st.join(ok, "block", "left_semi")
    dist = F.levenshtein("probe", "mprobe")
    if token_block:
        dist = F.least(dist, F.levenshtein("tprobe", "mtprobe"))
    candidates = (
        keyed.join(st, "block")
        # a pair found by several passes must verify once, not twice
        .dropDuplicates(["id", "master_id"])
        .filter(F.abs(F.col("len") - F.col("mlen")) <= max_distance)
        .withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
    )
    best = candidates.groupBy("id").agg(
        F.min(F.struct("distance", "master_id")).alias("__best"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    all_probes = probe.select(
        F.col(id_col).alias("id"),
    ).filter(F.length(_normalized(text_col)) > 0)
    return (
        all_probes.join(best, "id", "left")
        .select(
            F.col("id").alias("probe_id"),
            F.col("__best.master_id").alias("master_id"),
            F.col("__best.distance").cast("long").alias("distance"),
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias(
                "n_candidates"
            ),
            F.col("__best").isNotNull().alias("matched"),
        )
    )


def record_linkage(
    probe: DataFrame,
    master: DataFrame,
    probe_text: str = "name",
    probe_id: str = "id",
    master_text: str = "name",
    master_id: str = "id",
    prefix_len: int = 6,
    suffix_len: int = 6,
    band_width: int = 8,
    max_distance: int = 2,
    compare_len: int = 64,
    max_block_pairs: int | None = None,
    token_block: bool = False,
) -> DataFrame:
    """One-shot cross-table linkage: key the master in place and match
    the probe feed against it. See
    :func:`record_linkage_against_state` for the output contract (and
    for what ``token_block`` — the sorted-token reorder pass — adds)."""
    state = linkage_state(
        master, master_text, master_id, prefix_len, suffix_len,
        band_width, compare_len, token_block=token_block,
    )
    return record_linkage_against_state(
        probe, state, probe_text, probe_id, prefix_len, suffix_len,
        band_width, max_distance, compare_len, max_block_pairs,
        token_block=token_block,
    )


def record_linkage_incremental(
    batch: DataFrame,
    state: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    prefix_len: int = 6,
    suffix_len: int = 6,
    band_width: int = 8,
    max_distance: int = 2,
    compare_len: int = 64,
    max_block_pairs: int | None = None,
) -> DataFrame:
    """Vet-the-increment member for entity resolution: which records of
    a NEW batch resolve to an existing master identity, which are
    duplicate registrations WITHIN the batch (an earlier-id batch
    record within ``max_distance`` edits — the "same new entity signed
    up twice today" case), and which are genuinely new entities that
    should mint master rows?

    Output per non-blank batch record::

        probe_id, master_id, distance, matched_master, dup_in_batch,
        is_new

    ``is_new = NOT matched_master AND NOT dup_in_batch`` is the
    mint-a-master decision; ties inside the batch keep the smallest
    id, so re-running the same batch mints the same rows. The master
    table is never re-read — masters are represented solely by the
    O(state) keyed rows."""
    linked = record_linkage_against_state(
        batch, state, text_col, id_col, prefix_len, suffix_len,
        band_width, max_distance, compare_len, max_block_pairs,
    )
    keyed = linkage_keyed(
        batch, text_col, id_col, prefix_len, suffix_len, band_width,
        compare_len, band_slack=max_distance,
    )
    if max_block_pairs is not None:
        # the within-batch pass is a SELF-join: its hot-block guard is
        # the squared membership. Without it a batch whose records
        # share a degenerate prefix ("customer#...") runs
        # O(block²·compare_len²) Levenshtein cells in one partition —
        # the quadratic the cross-pass cap already prevents
        pc = keyed.groupBy("block").agg(F.count(F.lit(1)).alias("__pc"))
        ok = pc.filter(
            F.col("__pc") * F.col("__pc") <= max_block_pairs
        ).select("block")
        keyed = keyed.join(ok, "block", "left_semi")
    earlier = keyed.select(
        F.col("id").alias("__eid"),
        F.col("probe").alias("__ep"),
        F.col("len").alias("__el"),
        "block",
    )
    batch_hits = (
        keyed.join(earlier, "block")
        .filter(F.col("__eid") < F.col("id"))
        .filter(F.abs(F.col("len") - F.col("__el")) <= max_distance)
        .filter(F.levenshtein("probe", "__ep") <= max_distance)
        .select("id")
        .distinct()
        .withColumn("__in_batch", F.lit(True))
    )
    return (
        linked.join(
            batch_hits.select(F.col("id").alias("probe_id"), "__in_batch"),
            "probe_id",
            "left",
        )
        .select(
            "probe_id",
            "master_id",
            "distance",
            F.col("matched").alias("matched_master"),
            F.coalesce("__in_batch", F.lit(False)).alias("dup_in_batch"),
            (
                (~F.col("matched"))
                & F.col("__in_batch").isNull()
            ).alias("is_new"),
        )
    )


def blocking_report(
    probe: DataFrame,
    master: DataFrame,
    probe_text: str = "name",
    probe_id: str = "id",
    master_text: str = "name",
    master_id: str = "id",
    prefix_len: int = 6,
    suffix_len: int = 6,
    band_width: int = 8,
    max_distance: int = 2,
    compare_len: int = 64,
    max_block_pairs: int | None = None,
    token_block: bool = False,
) -> DataFrame:
    """Blocking-quality panel — the pre-flight audit for
    :func:`record_linkage`: BEFORE the candidate join runs, how much
    work will it do, where is that work concentrated, and what would
    the hot-block cap drop? Blocking decisions are the whole cost and
    recall story of linkage at scale, and they are invisible in the
    match output; this panel makes them a queryable O(1) report (the
    ``graph_report`` convention: one ``(metric, value)`` row each).

    Metrics:

    - ``n_probe_rows`` / ``n_master_rows`` — keyed rows per side
      (records × passes);
    - ``n_blocks_joinable`` — blocks present on BOTH sides (the only
      ones that generate candidates); ``n_blocks_probe_only`` /
      ``n_blocks_master_only`` — selectivity diagnostics (a collapsing
      master-only count means the feed stopped overlapping the
      master's key space);
    - ``total_pair_product`` — Σ probe_count·master_count over
      joinable blocks: the EXACT candidate-join output size, the cost
      predictor to watch round over round;
    - ``max_block_pair_product`` and ``top_block_share`` (max / total)
      — the hot-block skew signal;
    - with ``max_block_pairs`` set: ``n_capped_blocks`` (blocks the
      cap would drop) and ``capped_pair_share`` (the fraction of
      ``total_pair_product`` they carry — high share = the cap is
      doing real recall damage, retune the keys instead).

    Plan: the two keyed projections, one groupBy(block) count each, a
    full-outer join on the block key, ONE aggregate. O(blocks)
    intermediate frames, O(1) output. Uses the same keying as
    :func:`record_linkage` (including ``band_slack=max_distance`` on
    the probe side and ``token_block``), so the numbers describe
    exactly the join the matcher would run.
    """
    pk = linkage_keyed(
        probe, probe_text, probe_id, prefix_len, suffix_len, band_width,
        compare_len, band_slack=max_distance, token_block=token_block,
    )
    mk = linkage_keyed(
        master, master_text, master_id, prefix_len, suffix_len,
        band_width, compare_len, token_block=token_block,
    )
    pc = pk.groupBy("block").agg(F.count(F.lit(1)).alias("pc"))
    mc = mk.groupBy("block").agg(F.count(F.lit(1)).alias("mc"))
    both = pc.join(mc, "block", "full_outer").select(
        F.col("pc"), F.col("mc"),
        (F.col("pc") * F.col("mc")).alias("pp"),
    )
    agg = both.agg(
        F.sum("pc").cast("double").alias("n_probe_rows"),
        F.sum("mc").cast("double").alias("n_master_rows"),
        F.sum(
            (F.col("pc").isNotNull() & F.col("mc").isNotNull()).cast("int")
        ).cast("double").alias("n_blocks_joinable"),
        F.sum(F.col("mc").isNull().cast("int")).cast("double").alias(
            "n_blocks_probe_only"
        ),
        F.sum(F.col("pc").isNull().cast("int")).cast("double").alias(
            "n_blocks_master_only"
        ),
        F.coalesce(F.sum("pp"), F.lit(0)).cast("double").alias(
            "total_pair_product"
        ),
        F.coalesce(F.max("pp"), F.lit(0)).cast("double").alias(
            "max_block_pair_product"
        ),
        *(
            []
            if max_block_pairs is None
            else [
                F.sum(
                    (F.col("pp") > max_block_pairs).cast("int")
                ).cast("double").alias("n_capped_blocks"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("pp") > max_block_pairs, F.col("pp"))
                    ),
                    F.lit(0),
                ).cast("double").alias("capped_pair_product"),
            ]
        ),
    )
    metrics = [
        ("n_probe_rows", F.col("n_probe_rows")),
        ("n_master_rows", F.col("n_master_rows")),
        ("n_blocks_joinable", F.col("n_blocks_joinable")),
        ("n_blocks_probe_only", F.col("n_blocks_probe_only")),
        ("n_blocks_master_only", F.col("n_blocks_master_only")),
        ("total_pair_product", F.col("total_pair_product")),
        ("max_block_pair_product", F.col("max_block_pair_product")),
        (
            "top_block_share",
            F.when(
                F.col("total_pair_product") > 0,
                F.col("max_block_pair_product")
                / F.col("total_pair_product"),
            ),
        ),
    ]
    if max_block_pairs is not None:
        metrics += [
            ("n_capped_blocks", F.col("n_capped_blocks")),
            (
                "capped_pair_share",
                F.when(
                    F.col("total_pair_product") > 0,
                    F.col("capped_pair_product")
                    / F.col("total_pair_product"),
                ),
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


def linkage_report(linked: DataFrame) -> DataFrame:
    """Linkage-quality panel over a :func:`record_linkage` (or
    :func:`record_linkage_against_state`) result — the O(1) long-format
    health report every other family ships (``dedup_report``,
    ``embedding_report``): one ``(metric, value)`` row per metric, ONE
    aggregate over the match table.

    Metrics: ``n_probes``, ``n_matched``, ``match_rate``, ``n_exact``
    (distance 0), ``exact_rate``, ``n_ambiguous`` (more than one
    verified candidate — the review queue), ``ambiguity_rate``, and
    ``mean_distance`` over matched rows (NULL when nothing matched).
    """
    agg = linked.agg(
        F.count(F.lit(1)).cast("double").alias("n_probes"),
        F.sum(F.col("matched").cast("int")).cast("double").alias(
            "n_matched"
        ),
        F.sum((F.col("distance") == 0).cast("int")).cast("double").alias(
            "n_exact"
        ),
        F.sum((F.col("n_candidates") > 1).cast("int")).cast(
            "double"
        ).alias("n_ambiguous"),
        F.avg("distance").alias("mean_distance"),
    )
    melted = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("metric"), expr.alias("value")
                    )
                    for name, expr in [
                        ("n_probes", F.col("n_probes")),
                        ("n_matched", F.col("n_matched")),
                        (
                            "match_rate",
                            F.col("n_matched") / F.col("n_probes"),
                        ),
                        ("n_exact", F.coalesce("n_exact", F.lit(0.0))),
                        (
                            "exact_rate",
                            F.coalesce("n_exact", F.lit(0.0))
                            / F.col("n_probes"),
                        ),
                        ("n_ambiguous", F.col("n_ambiguous")),
                        (
                            "ambiguity_rate",
                            F.col("n_ambiguous") / F.col("n_probes"),
                        ),
                        ("mean_distance", F.col("mean_distance")),
                    ]
                ]
            )
        ).alias("m")
    )
    return melted.select("m.metric", "m.value")
