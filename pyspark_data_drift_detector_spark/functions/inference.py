"""Semantic column-type inference: numerical / categorical / temporal / complex.

The reference has FOUR divergent inference implementations
(``column_analyzer.py:57-151``, ``config_generator.py:176-190``,
``adaptive_threshold.py:325-356``, ``group_analyzer.py:250-258`` — SURVEY
§1.2). This is the single canonical one, implementing the union of their
behaviors:

- per-column override via ``custom_column_types`` (``column_analyzer.py:47-48``);
- date/timestamp physical types → temporal (``column_analyzer.py:92-93``);
- boolean → categorical (``column_analyzer.py:114-115``);
- numeric physical type with non-null distinct ratio < 5% → categorical,
  else numerical (``column_analyzer.py:100-108``);
- string that casts to timestamp for >90% of a 100-row sample → temporal
  (``column_analyzer.py:121-131``); otherwise categorical — including the
  high-cardinality ID/free-text case the reference flags but still returns
  as categorical (``column_analyzer.py:137-148``);
- struct/array/map → ``complex`` (deliberate fix: the reference defaults
  these to categorical, where a later ``groupBy`` on a map column would
  throw — SURVEY §1.2; complex columns are handled by the schema analyzer).

Cost: ONE aggregate job for all cardinalities (``approx_count_distinct`` —
exact distinct per column is an avoidable full shuffle at 100 TB and only
gates a heuristic here) + one 100-row sample job for the timestamp probe.
The reference issues 2-3 jobs per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CARDINALITY_RATIO = 0.05
TIMESTAMP_PROBE_ROWS = 100
TIMESTAMP_PROBE_MIN_RATIO = 0.9


def infer_column_types(
    df: DataFrame,
    custom_column_types: dict[str, str] | None = None,
    exact_distinct: bool = False,
) -> dict[str, str]:
    """Map each column to 'numerical' | 'categorical' | 'temporal' | 'complex'."""
    overrides = custom_column_types or {}
    result: dict[str, str] = {}

    numeric_cols: list[str] = []
    string_cols: list[str] = []
    for field in df.schema.fields:
        name, dtype = field.name, field.dataType
        if name in overrides:
            result[name] = overrides[name]
        elif isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            result[name] = "temporal"
        elif isinstance(dtype, T.BooleanType):
            result[name] = "categorical"
        elif isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
            result[name] = "complex"
        elif isinstance(dtype, T.NumericType):
            numeric_cols.append(name)
        elif isinstance(dtype, (T.StringType, T.CharType, T.VarcharType)):
            string_cols.append(name)
        else:
            result[name] = "categorical"

    # The numeric cardinality aggregate and the string timestamp probe are
    # independent 1-row frames; cross-joined they cost ONE driver-blocking
    # action instead of two serial .first() jobs (detect_drift runs this
    # on its critical path before any analyzer is built). Names cannot
    # collide: the numeric side emits only `col__n`/`col__d`, the probe
    # side raw string-column names plus `__n`.
    probe_agg = None
    if string_cols:
        # try_cast: malformed strings probe to NULL instead of throwing under
        # ANSI mode (the reference predates ANSI-default Spark)
        probe = df.selectExpr(
            *[
                f"CAST(try_cast(`{c}` AS TIMESTAMP) IS NOT NULL AS INT) AS `{c}`"
                for c in string_cols
            ],
        ).limit(TIMESTAMP_PROBE_ROWS)
        probe_agg = probe.selectExpr(
            *[f"avg(`{c}`) AS `{c}`" for c in string_cols], "count(1) AS `__n`"
        )

    row = agg_row = None
    if numeric_cols:
        if exact_distinct:
            # Each exact-distinct aggregate lives in its OWN subtree
            # (cross-joined, still ONE action): a mixed aggregate makes the
            # Expand duplicate every row per distinct column (~2.3x slower
            # measured), and even a distinct-only aggregate with N distinct
            # columns pays an N-way Expand — N single-distinct subtrees each
            # get the efficient two-level plan and each scans only its own
            # column (columnar pruning: same total bytes as one scan).
            # Measured another ~2.4x over the combined-agg shape.
            from functools import reduce

            counts = df.agg(*[F.count(F.col(c)).alias(f"{c}__n") for c in numeric_cols])
            dist_parts = [
                df.agg(F.count_distinct(F.col(c)).alias(f"{c}__d")) for c in numeric_cols
            ]
            num_agg = reduce(lambda a, b: a.crossJoin(b), dist_parts, counts)
        else:
            # approx_count_distinct is a plain HLL aggregate (no Expand):
            # everything fits in ONE wide agg over one scan
            aggs = []
            for c in numeric_cols:
                aggs += [
                    f"count(`{c}`) AS `{c}__n`",
                    f"approx_count_distinct(`{c}`) AS `{c}__d`",
                ]
            num_agg = df.selectExpr(*aggs)
        if probe_agg is not None:
            row = agg_row = num_agg.crossJoin(probe_agg).first()
        else:
            row = num_agg.first()
    elif probe_agg is not None:
        agg_row = probe_agg.first()

    if numeric_cols:
        for c in numeric_cols:
            n = row[f"{c}__n"]
            try:
                ratio = (row[f"{c}__d"] / n) if n else 1.0
                result[c] = "categorical" if ratio < CARDINALITY_RATIO else "numerical"
            except Exception:
                # reference convention: inference error → numerical
                # (column_analyzer.py:109-111)
                result[c] = "numerical"

    if string_cols:
        for c in string_cols:
            ratio = agg_row[c] if agg_row["__n"] else None
            result[c] = (
                "temporal" if ratio is not None and ratio > TIMESTAMP_PROBE_MIN_RATIO else "categorical"
            )

    return result


def columns_by_type(types: dict[str, str]) -> dict[str, list[str]]:
    """Invert an inference result: semantic type → ordered column list."""
    out: dict[str, list[str]] = {"numerical": [], "categorical": [], "temporal": [], "complex": []}
    for col, t in types.items():
        out.setdefault(t, []).append(col)
    return out
