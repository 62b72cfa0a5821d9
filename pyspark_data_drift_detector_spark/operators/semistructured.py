"""Semi-structured (JSON) column operators.

Event streams and crawled corpora carry JSON payload columns (the
harness's ``events.props``); profiling or drift-checking them requires
extracting typed fields first. Everything here stays JVM-side
(``get_json_object`` / ``schema_of_json`` — Jackson under codegen, no
Python in the hot path), so extraction is a narrow map that scales with
the scan.

- ``json_fields`` — project typed columns out of a JSON string column
  (``get_json_object`` + ``try_cast``: malformed documents or missing
  keys become NULL instead of failing under ANSI mode).
- ``json_field_stats`` — one wide aggregate profiling every requested
  field: counts, nulls, min/max/mean for numerics, distinct for strings.
- ``json_field_drift`` — drift between two snapshots' JSON payloads:
  extract on both sides, then reuse the numeric-drift pipeline
  (side-tagged pair profile → expression scoring) — JSON fields get the
  same M16-grade treatment as physical columns.
- ``infer_json_fields`` — driver probe (``schema_of_json`` over a small
  sample) returning the field → Spark-type map that the other operators
  consume; the same probe-then-plan pattern as
  ``functions.inference.infer_column_types``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"bigint", "int", "double", "float", "decimal", "long", "smallint", "tinyint"}


def json_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    keep: list[str] | None = None,
) -> DataFrame:
    """Project typed columns out of ``json_col``.

    ``fields`` maps field name → Spark SQL type (e.g. ``{"k": "bigint"}``);
    nested paths use dots (``"a.b"`` → ``$.a.b``). Missing keys and
    malformed JSON yield NULL (``try_cast``).
    """
    if not fields:
        raise ValueError("no fields requested")
    kept = keep if keep is not None else df.columns
    exprs = [f"`{c}`" for c in kept]
    for name, typ in fields.items():
        path = "$." + name
        alias = name.replace(".", "_")
        if alias in kept:
            raise ValueError(
                f"json field {name!r} would extract to column {alias!r}, "
                f"which already exists in the frame — rename the physical "
                f"column or exclude it via keep="
            )
        exprs.append(
            f"try_cast(get_json_object(`{json_col}`, '{path}') AS {typ}) AS `{alias}`"
        )
    return df.selectExpr(*exprs)


def json_field_stats(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
) -> DataFrame:
    """Per-field profile of a JSON column, ONE wide aggregate.

    Output (one row per field): ``field, type, n_rows, n, null_count,
    null_ratio, min, max, mean, distinct_count`` — numeric stats are NULL
    for string-typed fields and vice versa.
    """
    if not fields:
        raise ValueError("no fields requested")
    extracted = json_fields(df, json_col, fields, keep=[])
    aggs: list[str] = ["count(1) AS `__n_rows`"]
    for name, typ in fields.items():
        a = name.replace(".", "_")
        is_num = typ.split("(")[0].lower() in _NUMERIC
        aggs += [
            f"count(`{a}`) AS `{a}__n`",
            f"sum(CAST(`{a}` IS NULL AS BIGINT)) AS `{a}__nulls`",
        ]
        if is_num:
            aggs += [
                f"min(CAST(`{a}` AS DOUBLE)) AS `{a}__min`",
                f"max(CAST(`{a}` AS DOUBLE)) AS `{a}__max`",
                f"avg(CAST(`{a}` AS DOUBLE)) AS `{a}__mean`",
            ]
        aggs.append(f"count(DISTINCT `{a}`) AS `{a}__distinct`")
    wide = extracted.selectExpr(*aggs)
    structs = []
    for name, typ in fields.items():
        a = name.replace(".", "_")
        is_num = typ.split("(")[0].lower() in _NUMERIC
        mn = f"`{a}__min`" if is_num else "CAST(NULL AS DOUBLE)"
        mx = f"`{a}__max`" if is_num else "CAST(NULL AS DOUBLE)"
        mean = f"`{a}__mean`" if is_num else "CAST(NULL AS DOUBLE)"
        structs.append(
            "named_struct("
            f"'field', '{name}', 'type', '{typ}', "
            "'n_rows', `__n_rows`, "
            f"'n', `{a}__n`, 'null_count', `{a}__nulls`, "
            f"'null_ratio', `{a}__nulls` / `__n_rows`, "
            f"'min', {mn}, 'max', {mx}, 'mean', {mean}, "
            f"'distinct_count', CAST(`{a}__distinct` AS BIGINT))"
        )
    return wide.selectExpr("inline(array(" + ", ".join(structs) + "))")


def json_field_drift(
    df_ref: DataFrame,
    df_curr: DataFrame,
    json_col: str,
    fields: dict[str, str],
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Numeric drift over JSON payload fields: extract both sides, then the
    standard pair-profile → expression-scoring pipeline. Non-numeric
    fields are ignored (drift for those is the categorical family over
    ``json_fields`` output)."""
    num = {n: t for n, t in fields.items() if t.split("(")[0].lower() in _NUMERIC}
    if not num:
        raise ValueError("no numeric fields requested")
    from pyspark_data_drift_detector_spark.operators.numeric_drift import (
        numeric_drift_pair,
    )

    ref = json_fields(df_ref, json_col, num, keep=[])
    curr = json_fields(df_curr, json_col, num, keep=[])
    cols = [n.replace(".", "_") for n in num]
    return numeric_drift_pair(ref, curr, columns=cols, thresholds=thresholds)


def infer_json_fields(
    df: DataFrame, json_col: str, sample_rows: int = 100
) -> dict[str, str]:
    """Probe a JSON column's top-level fields from a sample (one job,
    O(sample) driver data) — the same probe-then-plan pattern as
    ``functions.inference.infer_column_types``.

    The sampled documents are parsed driver-side (``schema_of_json``
    only accepts literal arguments, and one call per sampled document
    would be one JOB per document); fields are unioned across the sample
    with int→double widening on conflict, non-scalar values map to
    ``string`` (extract then re-parse if needed).
    """
    import json

    rows = (
        df.select(F.col(json_col).alias("j"))
        .where(F.col("j").isNotNull())
        .limit(sample_rows)
        .collect()
    )
    fields: dict[str, str] = {}
    for r in rows:
        try:
            obj = json.loads(r["j"])
        except (ValueError, TypeError):
            continue
        if not isinstance(obj, dict):
            continue
        for k, v in obj.items():
            if isinstance(v, bool):
                t = "boolean"
            elif isinstance(v, int):
                t = "bigint"
            elif isinstance(v, float):
                t = "double"
            elif isinstance(v, str):
                t = "string"
            else:  # list / dict / null — extract as string, re-parse downstream
                t = "string"
            prev = fields.get(k)
            if prev is None:
                fields[k] = t
            elif {prev, t} == {"bigint", "double"}:
                fields[k] = "double"
            elif prev != t:
                fields[k] = "string"
    return fields
