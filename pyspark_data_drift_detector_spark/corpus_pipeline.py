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
