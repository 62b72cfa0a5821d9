"""Corpus-level drift flagship: one long-format report over a document
pair, the document-side sibling of ``pipeline.detect_drift`` (which
serves tabular snapshots).

``corpus_drift_report`` composes the corpus panels into one frame with a
single schema, the way detect_drift composes the tabular families:

- ``text_quality``  — mean token-count / quality-score relative shifts
  and the language-mix JS distance (``operators.text.text_quality_drift``)
- ``vocabulary``    — type/token counts, new/lost types, token-level OOV
  rate (``operators.corpus.vocab_drift``)
- ``token_share``   — per-group token-mass mix shift
  (``operators.corpus.token_share_drift``)

Each family is an O(1)- or O(groups)-row aggregate, so the report adds
NO passes over the corpus beyond what the members already do (two scans
per member family); the melt into long format is expression-only.

Flags are evaluated on the 5-decimal-ROUNDED diffs — the report is the
comparison artifact (stored, diffed, oracle-replayed), and rounding
first makes the flag a pure function of the numbers the report shows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROUND = 5


def _melt(df: DataFrame, rows: list[tuple[str, str, str, str, str, str, str]]) -> DataFrame:
    """Explode one wide row (or many) into long-format report rows; each
    spec is SQL text for (family, key, metric, ref, curr, diff, flag)."""
    structs = ", ".join(
        f"named_struct('family', {fam}, 'key', {key}, 'metric', {met},"
        f" 'ref_value', CAST({ref} AS DOUBLE),"
        f" 'curr_value', CAST({cur} AS DOUBLE),"
        f" 'diff', CAST({diff} AS DOUBLE),"
        f" 'drift_detected', CAST({flag} AS BOOLEAN))"
        for fam, key, met, ref, cur, diff, flag in rows
    )
    return df.selectExpr(f"inline(array({structs}))")


def corpus_drift_report(
    df_ref: DataFrame,
    df_curr: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    rel_threshold: float = 0.1,
    js_threshold: float = 0.1,
    share_threshold: float = 0.05,
    oov_threshold: float = 0.05,
) -> DataFrame:
    """One long-format corpus drift report: ``family, key, metric,
    ref_value, curr_value, diff, drift_detected`` — did the corpus MIX
    (token share per group), its VOCABULARY (types/OOV mass), or its
    per-document TEXT QUALITY (length, heuristic quality, language mix)
    move between snapshots? Count metrics (types/tokens) diff as
    relative change; informational rows (new/lost types) carry the count
    in ``diff`` and never flag on their own.
    """
    from pyspark_data_drift_detector_spark.operators.corpus import (
        token_share_drift,
        vocab_drift,
    )
    from pyspark_data_drift_detector_spark.operators.text import (
        text_quality_drift,
    )

    r = _ROUND
    rel, js, sh, oov = (
        float(rel_threshold),
        float(js_threshold),
        float(share_threshold),
        float(oov_threshold),
    )

    tq = _melt(
        text_quality_drift(
            df_ref, df_curr, text_col, id_col, rel_threshold, js_threshold
        ),
        [
            ("'text_quality'", "''", "'mean_tokens'",
             f"round(ref_mean_tokens, {r})", f"round(curr_mean_tokens, {r})",
             f"round(token_shift, {r})", f"round(token_shift, {r}) > {rel!r}D"),
            ("'text_quality'", "''", "'mean_quality'",
             f"round(ref_mean_quality, {r})", f"round(curr_mean_quality, {r})",
             f"round(quality_shift, {r})", f"round(quality_shift, {r}) > {rel!r}D"),
            ("'text_quality'", "''", "'language_mix_js'",
             "NULL", "NULL",
             f"round(lang_js, {r})", f"round(lang_js, {r}) > {js!r}D"),
        ],
    )

    # relative-change convention shared with text_quality_drift's shifts
    def relchange(a: str, b: str) -> str:
        return (
            f"CASE WHEN {a} != 0 THEN abs(({b} - {a}) / CAST({a} AS DOUBLE))"
            f" WHEN {b} != 0 THEN 1.0D ELSE 0.0D END"
        )

    vd = _melt(
        vocab_drift(df_ref, df_curr, text_col, id_col, oov_threshold),
        [
            ("'vocabulary'", "''", "'types'",
             "ref_types", "curr_types",
             f"round({relchange('ref_types', 'curr_types')}, {r})",
             f"round({relchange('ref_types', 'curr_types')}, {r}) > {rel!r}D"),
            ("'vocabulary'", "''", "'tokens'",
             "ref_tokens", "curr_tokens",
             f"round({relchange('ref_tokens', 'curr_tokens')}, {r})",
             f"round({relchange('ref_tokens', 'curr_tokens')}, {r}) > {rel!r}D"),
            ("'vocabulary'", "''", "'new_types'",
             "NULL", "new_types", "new_types", "false"),
            ("'vocabulary'", "''", "'lost_types'",
             "NULL", "lost_types", "lost_types", "false"),
            ("'vocabulary'", "''", "'oov_token_rate'",
             "NULL", "NULL",
             f"round(oov_token_rate, {r})",
             f"round(oov_token_rate, {r}) > {oov!r}D"),
        ],
    )

    ts = _melt(
        token_share_drift(df_ref, df_curr, group_col, text_col, share_threshold),
        [
            # '<null>' sentinel, NOT '': a NULL group and an
            # empty-string group are different populations and must not
            # collapse into one (family, key, metric) identity
            ("'token_share'",
             "CASE WHEN group_key IS NULL THEN '<null>'"
             " ELSE CAST(group_key AS STRING) END",
             "'token_share'",
             f"round(ref_share, {r})", f"round(curr_share, {r})",
             f"round(share_abs_diff, {r})",
             f"round(share_abs_diff, {r}) > {sh!r}D"),
        ],
    )

    out = tq.unionByName(vd).unionByName(ts)
    return out.selectExpr(
        "family",
        "key",
        "metric",
        f"round(ref_value, {_ROUND}) AS ref_value",
        f"round(curr_value, {_ROUND}) AS curr_value",
        f"round(diff, {_ROUND}) AS diff",
        "drift_detected",
    )


def corpus_report_incremental(
    new_docs: DataFrame,
    fingerprint_state: DataFrame,
    passage_state: DataFrame,
    minhash_state: DataFrame,
    unigram_state: DataFrame,
    token_share_state: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_threshold: float = 0.2,
    passage_threshold: float = 0.2,
    neardup_threshold: float = 0.2,
    oov_threshold: float = 0.3,
    share_threshold: float = 0.05,
    window: int = 20,
    stride: int = 1,
    k_shingle: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    est_threshold: float = 0.5,
    hash_family: str = "xxhash",
    max_bucket_size: int | None = None,
    smoothing_k: float = 0.5,
) -> DataFrame:
    """The nightly ingest-vetting flagship: ONE long-format report per
    ingest batch, composing all five vet-the-increment members against
    their compact states — the increment-vs-corpus sibling of
    :func:`corpus_drift_report`. The prior corpus is NEVER re-read; every
    family consumes only ``new_docs`` plus its rolled-up state
    (fingerprints, passage window hashes, MinHash signatures, unigram
    counts, token-share counts — each appended per batch or via the
    ``streaming.state_tables`` foreachBatch sinks).

    Report rows (schema identical to ``corpus_drift_report``: ``family,
    key, metric, ref_value, curr_value, diff, drift_detected``):

    - ``exact_dedup``  — dup-of-state / dup-in-batch rates (flag when
      above ``dup_threshold``), keep rate (informational).
    - ``passage``      — fraction of batch docs containing a duplicated
      passage span (flag > ``passage_threshold``), total duplicated span
      tokens (informational).
    - ``neardup``      — fraction of batch docs with a MinHash near-dup
      in state or batch (flag > ``neardup_threshold``), pair count
      (informational).
    - ``lm_quality``   — token-weighted OOV rate under the prior corpus
      LM (flag > ``oov_threshold``; an exact ratio of integer counts),
      mean per-doc avg_logprob (informational).
    - ``token_share``  — per-group batch-vs-corpus token-mix rows
      ('<null>' key sentinel), flagged by the member itself.

    Scale shape: each member family reduces to an O(1)- or O(groups)-row
    aggregate before the expression-only melt, so the report adds no
    pass over the batch beyond what the members already do, and the
    members themselves never touch the prior corpus. The batch is
    deliberately NOT persisted across the five members: they tokenize
    differently (fingerprint normalization, passage windows, shingles,
    unigrams, token counts), so the only shareable work is the scan —
    and caching the raw rows defeats each member's COLUMN PRUNING while
    a columnar parquet re-scan is nearly free (measured at sf0.1,
    local[32]: persist 8.7s vs re-scan 6.9s for the whole report). An
    empty batch yields NULL rates with NULL flags (0/0 — nothing to
    vet).
    """
    from pyspark_data_drift_detector_spark.operators.corpus import (
        logprob_incremental,
        token_share_incremental,
    )
    from pyspark_data_drift_detector_spark.operators.dedup import (
        dedup_incremental,
        neardup_incremental,
        passage_dedup_incremental,
    )

    r = _ROUND
    ded = dedup_incremental(new_docs, fingerprint_state, text_col, id_col)
    ded_agg = ded.agg(
        F.expr("CAST(count(1) AS DOUBLE) AS __n"),
        F.expr("avg(CAST(dup_of_state AS INT)) AS __dup_state_rate"),
        F.expr("avg(CAST(dup_in_batch AS INT)) AS __dup_batch_rate"),
        F.expr("avg(CAST(keep AS INT)) AS __keep_rate"),
    )
    pas = passage_dedup_incremental(
        new_docs, passage_state, text_col, id_col, window, stride
    )
    pas_agg = pas.agg(
        F.expr(f"CAST(count(DISTINCT `{id_col}`) AS DOUBLE) AS __pas_docs"),
        F.expr("coalesce(sum(span_tokens), 0L) AS __pas_tokens"),
    )
    near = neardup_incremental(
        new_docs,
        minhash_state,
        text_col,
        id_col,
        k_shingle,
        num_hashes,
        bands,
        est_threshold,
        hash_family,
        max_bucket_size,
    )
    near_agg = near.agg(
        F.expr(f"CAST(count(DISTINCT `{id_col}`) AS DOUBLE) AS __near_docs"),
        F.expr("CAST(count(1) AS BIGINT) AS __near_pairs"),
    )
    lm = logprob_incremental(new_docs, unigram_state, text_col, id_col, smoothing_k)
    lm_agg = lm.agg(
        F.expr("CAST(sum(n_oov) AS DOUBLE) / sum(n_tokens) AS __oov_rate"),
        F.expr("avg(avg_logprob) AS __mean_lp"),
    )
    wide = ded_agg.crossJoin(pas_agg).crossJoin(near_agg).crossJoin(lm_agg)

    dup, pth, nth, oth, sth = (
        float(dup_threshold),
        float(passage_threshold),
        float(neardup_threshold),
        float(oov_threshold),
        float(share_threshold),
    )
    panels = _melt(
        wide,
        [
            ("'exact_dedup'", "''", "'dup_of_state_rate'",
             "NULL", f"round(__dup_state_rate, {r})",
             f"round(__dup_state_rate, {r})",
             f"round(__dup_state_rate, {r}) > {dup!r}D"),
            ("'exact_dedup'", "''", "'dup_in_batch_rate'",
             "NULL", f"round(__dup_batch_rate, {r})",
             f"round(__dup_batch_rate, {r})",
             f"round(__dup_batch_rate, {r}) > {dup!r}D"),
            ("'exact_dedup'", "''", "'keep_rate'",
             "NULL", f"round(__keep_rate, {r})", "NULL", "false"),
            ("'passage'", "''", "'dup_passage_doc_rate'",
             "NULL", f"round(__pas_docs / nullif(__n, 0), {r})",
             f"round(__pas_docs / nullif(__n, 0), {r})",
             f"round(__pas_docs / nullif(__n, 0), {r}) > {pth!r}D"),
            ("'passage'", "''", "'dup_span_tokens'",
             "NULL", "__pas_tokens", "NULL", "false"),
            ("'neardup'", "''", "'neardup_doc_rate'",
             "NULL", f"round(__near_docs / nullif(__n, 0), {r})",
             f"round(__near_docs / nullif(__n, 0), {r})",
             f"round(__near_docs / nullif(__n, 0), {r}) > {nth!r}D"),
            ("'neardup'", "''", "'neardup_pairs'",
             "NULL", "__near_pairs", "NULL", "false"),
            ("'lm_quality'", "''", "'oov_token_rate'",
             "NULL", f"round(__oov_rate, {r})",
             f"round(__oov_rate, {r})",
             f"round(__oov_rate, {r}) > {oth!r}D"),
            ("'lm_quality'", "''", "'mean_doc_logprob'",
             "NULL", f"round(__mean_lp, {r})", "NULL", "false"),
        ],
    )
    ts = _melt(
        token_share_incremental(
            new_docs, token_share_state, group_col, text_col, sth
        ),
        [
            ("'token_share'",
             "CASE WHEN group_key IS NULL THEN '<null>'"
             " ELSE CAST(group_key AS STRING) END",
             "'token_share'",
             f"round(ref_share, {r})", f"round(curr_share, {r})",
             f"round(share_abs_diff, {r})", "drift_detected"),
        ],
    )
    out = panels.unionByName(ts)
    return out.selectExpr(
        "family",
        "key",
        "metric",
        f"round(ref_value, {r}) AS ref_value",
        f"round(curr_value, {r}) AS curr_value",
        f"round(diff, {r}) AS diff",
        "drift_detected",
    )


#: funnel stage order (first failing stage wins attribution)
CLEAN_STAGES = ("empty", "quality", "classifier", "duplicate", "contaminated")


def clean_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    weights: list[float] | None = None,
    bias: float = 0.0,
    classifier_threshold: float = 0.5,
    decontaminate_n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_kwargs: dict | None = None,
    classifier_hash_family: str = "xxhash",
    normalize: bool = True,
) -> DataFrame:
    """The end-to-end training-data cleaning run, annotate-once: every
    document gets a ``drop_stage`` column naming the FIRST gate it fails
    (``empty`` → ``quality`` → ``classifier`` → ``duplicate`` →
    ``contaminated``; NULL = kept). ``.where("drop_stage IS NULL")`` is
    the clean corpus; :func:`corpus_funnel` is the per-stage loss report
    — the two artifacts every pipeline run ships.

    Members are the existing operators (``quality_filter``, optional
    ``quality_classifier`` when ``weights`` is given,
    ``dedup_exact`` over ``normalize_text_expr`` canonical forms,
    ``decontaminate`` vs ``benchmark`` when given), so every gate keeps
    its own scale shape. Dedup survivors are chosen AMONG the documents
    that cleared the earlier narrow gates — a quality-dropped copy never
    shadows a keepable one; contamination is per-document independent,
    so its attribution order (after ``duplicate``) only decides the
    label when both apply.

    Annotation, not sequential filtering: the stages materialize as ONE
    plan (joins of per-doc verdict frames keyed by id), so the funnel
    and the clean corpus come from the same pass instead of one
    count-action per stage.
    """
    from pyspark_data_drift_detector_spark.operators.dedup import dedup_exact
    from pyspark_data_drift_detector_spark.operators.quality import (
        decontaminate,
        quality_classifier,
        quality_filter,
    )
    from pyspark_data_drift_detector_spark.operators.text import (
        normalize_text_expr,
    )

    qf = quality_filter(
        docs, text_col, id_col, **(quality_kwargs or {})
    ).select(F.col(id_col), F.col("passes").alias("__q_pass"))
    verdicts = docs.join(qf, id_col, "left")
    pre_cases = [
        f"WHEN `{text_col}` IS NULL OR trim(`{text_col}`) = '' THEN 'empty'",
        "WHEN NOT __q_pass THEN 'quality'",
    ]
    if weights is not None:
        clf = quality_classifier(
            docs,
            weights,
            bias=bias,
            threshold=classifier_threshold,
            text_col=text_col,
            id_col=id_col,
            hash_family=classifier_hash_family,
        ).select(F.col(id_col), F.col("keep").alias("__c_keep"))
        verdicts = verdicts.join(clf, id_col, "left")
        pre_cases.append("WHEN NOT __c_keep THEN 'classifier'")
    verdicts = verdicts.selectExpr(
        "*", f"CASE {' '.join(pre_cases)} END AS __pre_stage"
    )

    survivors = verdicts.filter("__pre_stage IS NULL").select(
        F.col(id_col), F.col(text_col)
    )
    ded_in = (
        survivors.withColumn(text_col, normalize_text_expr(F.col(text_col)))
        if normalize
        else survivors
    )
    dup = dedup_exact(ded_in, text_col, id_col).select(
        F.col(id_col), F.col("is_duplicate").alias("__dup")
    )
    out = verdicts.join(dup, id_col, "left")
    if benchmark is not None:
        con = decontaminate(
            survivors, benchmark, n=decontaminate_n, text_col=text_col, id_col=id_col
        ).select(F.col(id_col), F.lit(True).alias("__con"))
        out = out.join(con, id_col, "left")
        con_case = "WHEN __con THEN 'contaminated'"
    else:
        con_case = ""
    drop_cols = ["__q_pass", "__pre_stage", "__dup"] + (
        ["__c_keep"] if weights is not None else []
    ) + (["__con"] if benchmark is not None else [])
    return out.selectExpr(
        "*",
        f"coalesce(__pre_stage, CASE WHEN __dup THEN 'duplicate'"
        f" {con_case} END) AS drop_stage",
    ).drop(*drop_cols)


def training_mix_report(
    docs: DataFrame,
    target_shares: dict[str, float],
    budget: int,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    share_tolerance: float = 0.02,
    salt: str = "mix",
    clean_kwargs: dict | None = None,
) -> DataFrame:
    """The end-to-end "make me a pretraining mix" run — the artifact a
    data team ships next to a training corpus, composing the pipeline's
    stages the way :func:`corpus_funnel` composed cleaning:

    1. :func:`clean_corpus` annotates every document with its first
       failing gate (``clean_kwargs`` forwards the gate config);
    2. survivors are rebalanced to the EXPLICIT ``target_shares`` token
       mixture (``operators.sampling.mix_sample`` with whitespace-token
       weights — the token-budget spec an LM data recipe pins);
    3. the sampled mix is packed into ``budget``-token context windows
       (``operators.text.pack_documents``).

    Output: ONE long-format frame in the shared flagship report schema
    (``family, key, metric, ref_value, curr_value, diff,
    drift_detected``):

    - ``funnel``  rows — per-stage document counts of the cleaning run;
    - ``mix``     rows — per group: requested vs ACHIEVED token share
      (flagged when the rounded gap exceeds ``share_tolerance`` — a
      scarce group that capped the mix shows up here), available vs
      sampled tokens, the sample rate, sampled doc count;
    - ``packing`` rows — pack count, mean fill ratio vs the ideal 1.0,
      overflow share (boundary-straddling documents), total packed
      tokens.

    Scale shape: the annotated corpus and the sampled mix are the only
    corpus-scale frames; both are persisted once and released after the
    O(groups + stages + 1)-row report is eagerly checkpointed (the
    counts-mode convention — Spark would otherwise re-instantiate the
    cleaning plan for every branch that reads it). Everything reported
    is a keyed aggregate or an O(groups) panel window; the corpus is
    never globally sorted (packing is the two-phase bucketed prefix
    sum).
    """
    from pyspark_data_drift_detector_spark.operators.sampling import (
        mix_sample,
    )
    from pyspark_data_drift_detector_spark.operators.text import (
        pack_documents,
        packing_stats,
        tokens_expr,
    )

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ann = clean_corpus(
        docs, text_col=text_col, id_col=id_col, **(clean_kwargs or {})
    ).persist()
    mixed = None
    try:
        funnel = corpus_funnel(ann)
        surv = ann.filter("drop_stage IS NULL").select(
            F.col(id_col),
            F.col(group_col),
            F.col(text_col),
            F.size(tokens_expr(F.col(text_col))).cast("long").alias("__w"),
        )
        mixed = mix_sample(
            surv,
            group_col,
            target_shares,
            id_col=id_col,
            salt=salt,
            weight_col="__w",
        ).persist()
        shares = (
            mixed.groupBy(group_col)
            .agg(
                F.expr("CAST(sum(__w) AS BIGINT) AS __tok"),
                F.expr("CAST(count(1) AS BIGINT) AS __docs"),
                F.expr("first(target_share) AS __target"),
                F.expr("first(sample_rate) AS __rate"),
                F.expr("CAST(first(group_count) AS BIGINT) AS __avail"),
            )
            # O(groups) panel: the unpartitioned total window is bounded
            .selectExpr(
                "*", "__tok / nullif(sum(__tok) OVER (), 0.0D) AS __ach"
            )
        )
        tol = float(share_tolerance)
        mix_rows = _melt(
            shares,
            [
                ("'mix'", f"`{group_col}`", "'token_share'", "__target",
                 "__ach", f"round(abs(__ach - __target), {_ROUND})",
                 f"round(abs(__ach - __target), {_ROUND}) > {tol!r}D"),
                ("'mix'", f"`{group_col}`", "'tokens'", "__avail", "__tok",
                 "__tok - __avail", "false"),
                ("'mix'", f"`{group_col}`", "'sample_rate'", "NULL",
                 "__rate", "NULL", "false"),
                ("'mix'", f"`{group_col}`", "'n_docs'", "NULL", "__docs",
                 "NULL", "false"),
            ],
        )
        fun_rows = _melt(
            funnel,
            [("'funnel'", "stage", "'n_docs'", "NULL", "n_docs", "NULL",
              "false")],
        )
        psum = packing_stats(
            pack_documents(
                mixed, budget, text_col=text_col, id_col=id_col,
                token_col="__w",
            ),
            budget,
        ).agg(
            F.expr("CAST(count(1) AS BIGINT) AS __packs"),
            F.expr("avg(fill_ratio) AS __fill"),
            F.expr("avg(CAST(overflowed AS INT)) AS __over"),
            F.expr("CAST(sum(pack_tokens) AS BIGINT) AS __ptok"),
        )
        pack_rows = _melt(
            psum,
            [
                ("'packing'", "'all'", "'n_packs'", "NULL", "__packs",
                 "NULL", "false"),
                ("'packing'", "'all'", "'mean_fill'", "1.0D", "__fill",
                 f"round(1.0D - __fill, {_ROUND})", "false"),
                ("'packing'", "'all'", "'overflow_share'", "0.0D",
                 "__over", f"round(__over, {_ROUND})", "false"),
                ("'packing'", "'all'", "'total_tokens'", "NULL", "__ptok",
                 "NULL", "false"),
            ],
        )
        report = mix_rows.unionByName(fun_rows).unionByName(pack_rows)
        return report.localCheckpoint()  # eager: O(rows) tiny
    finally:
        if mixed is not None:
            mixed.unpersist()
        ann.unpersist()


def corpus_funnel(annotated: DataFrame, group_col: str | None = None) -> DataFrame:
    """Per-stage loss report over :func:`clean_corpus` output: one row
    per drop stage plus ``kept`` — the numbers a pipeline run records
    next to its output corpus. With ``group_col`` the funnel breaks out
    per group (per-source loss attribution: WHICH crawl is paying the
    dedup tax). O(stages [× groups]) rows."""
    keys = ["stage"] + ([group_col] if group_col else [])
    return annotated.selectExpr(
        "coalesce(drop_stage, 'kept') AS stage",
        *([f"`{group_col}`"] if group_col else []),
    ).groupBy(*keys).agg(F.expr("CAST(count(1) AS BIGINT) AS n_docs"))
