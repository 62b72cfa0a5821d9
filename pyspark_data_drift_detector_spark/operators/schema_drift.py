"""Schema drift: flat + recursive diff, compatibility matrix, risk scoring.

One canonical implementation replacing the reference's THREE near-duplicate
schema diffs (``main.py:179-227``, ``schema_analyzer.py:10-59``, ``:649-737``
— SURVEY §2.9 M25). All functions here are driver-side: schemas are
metadata, not data, so this is correct at any scale.

Data profiling of complex columns (struct field null ratios, array/map size
stats — ``schema_analyzer.py:157-345``) IS data work and runs as one
side-tagged Spark aggregate in ``complex_column_profile``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (narrow, wide) compatible numeric widenings — schema_analyzer.py:759-775
NUMERIC_WIDENING = [
    ("ByteType", "ShortType"), ("ByteType", "IntegerType"), ("ByteType", "LongType"),
    ("ByteType", "FloatType"), ("ByteType", "DoubleType"),
    ("ShortType", "IntegerType"), ("ShortType", "LongType"),
    ("ShortType", "FloatType"), ("ShortType", "DoubleType"),
    ("IntegerType", "LongType"), ("IntegerType", "FloatType"), ("IntegerType", "DoubleType"),
    ("LongType", "FloatType"), ("LongType", "DoubleType"),
    ("FloatType", "DoubleType"),
]


def is_compatible_type_change(ref_type: T.DataType, curr_type: T.DataType) -> bool:
    """Numeric widening is compatible; everything else is not
    (``schema_analyzer.py:739-787``)."""
    ref_str, curr_str = str(ref_type), str(curr_type)
    if ref_str == curr_str:
        return True
    for narrow, wide in NUMERIC_WIDENING:
        if ref_str.startswith(narrow) and curr_str.startswith(wide):
            return True
    return False


def _type_difference(
    ref_type: T.DataType, curr_type: T.DataType, path: str
) -> list[dict[str, Any]]:
    """Recursive complex-type diff (``schema_analyzer.py:456-539``)."""
    diffs: list[dict[str, Any]] = []
    if isinstance(ref_type, T.StructType) and isinstance(curr_type, T.StructType):
        ref_fields = {f.name: f for f in ref_type.fields}
        curr_fields = {f.name: f for f in curr_type.fields}
        for name in sorted(set(curr_fields) - set(ref_fields)):
            diffs.append(
                {"column": f"{path}.{name}", "change_type": "field_added",
                 "details": "Field added to struct", "severity": "medium"}
            )
        for name in sorted(set(ref_fields) - set(curr_fields)):
            diffs.append(
                {"column": f"{path}.{name}", "change_type": "field_removed",
                 "details": "Field removed from struct", "severity": "high"}
            )
        for name in sorted(set(ref_fields) & set(curr_fields)):
            rf, cf = ref_fields[name], curr_fields[name]
            diffs.extend(_type_difference(rf.dataType, cf.dataType, f"{path}.{name}"))
            if rf.nullable != cf.nullable:
                severity = "high" if rf.nullable and not cf.nullable else "medium"
                diffs.append(
                    {"column": f"{path}.{name}", "change_type": "nullable_change",
                     "details": f"Nullable changed from {rf.nullable} to {cf.nullable}",
                     "severity": severity}
                )
    elif isinstance(ref_type, T.ArrayType) and isinstance(curr_type, T.ArrayType):
        diffs.extend(_type_difference(ref_type.elementType, curr_type.elementType, f"{path}[]"))
        if ref_type.containsNull != curr_type.containsNull:
            severity = "high" if ref_type.containsNull and not curr_type.containsNull else "medium"
            diffs.append(
                {"column": path, "change_type": "array_nullability_change",
                 "details": f"containsNull changed from {ref_type.containsNull} to {curr_type.containsNull}",
                 "severity": severity}
            )
    elif isinstance(ref_type, T.MapType) and isinstance(curr_type, T.MapType):
        diffs.extend(_type_difference(ref_type.keyType, curr_type.keyType, f"{path}[key]"))
        diffs.extend(_type_difference(ref_type.valueType, curr_type.valueType, f"{path}[value]"))
        if ref_type.valueContainsNull != curr_type.valueContainsNull:
            severity = (
                "high" if ref_type.valueContainsNull and not curr_type.valueContainsNull else "medium"
            )
            diffs.append(
                {"column": path, "change_type": "map_nullability_change",
                 "details": f"valueContainsNull changed from {ref_type.valueContainsNull} to {curr_type.valueContainsNull}",
                 "severity": severity}
            )
    elif str(ref_type) != str(curr_type):
        compatible = is_compatible_type_change(ref_type, curr_type)
        diffs.append(
            {"column": path, "change_type": "type_change",
             "details": f"{ref_type} -> {curr_type}",
             "severity": "medium" if compatible else "high"}
        )
    return diffs


def schema_diff(ref_schema: T.StructType, curr_schema: T.StructType) -> dict[str, Any]:
    """Full schema comparison (``schema_analyzer.py:649-737``)."""
    ref_fields = {f.name: f for f in ref_schema.fields}
    curr_fields = {f.name: f for f in curr_schema.fields}
    added = sorted(set(curr_fields) - set(ref_fields))
    removed = sorted(set(ref_fields) - set(curr_fields))
    common = sorted(set(ref_fields) & set(curr_fields))

    type_changes = []
    nullable_changes = []
    metadata_changes = []
    nested_differences = []
    for col in common:
        rf, cf = ref_fields[col], curr_fields[col]
        if str(rf.dataType) != str(cf.dataType):
            type_changes.append(
                {"column": col, "ref_type": str(rf.dataType), "curr_type": str(cf.dataType),
                 "is_compatible": is_compatible_type_change(rf.dataType, cf.dataType)}
            )
        nested = _type_difference(rf.dataType, cf.dataType, col)
        nested_differences.extend(nested)
        if rf.nullable != cf.nullable:
            nullable_changes.append(
                {"column": col, "ref_nullable": rf.nullable, "curr_nullable": cf.nullable,
                 "risk": "high" if rf.nullable and not cf.nullable else "low"}
            )
        if dict(rf.metadata or {}) != dict(cf.metadata or {}):
            metadata_changes.append(
                {"column": col, "ref_metadata": dict(rf.metadata or {}),
                 "curr_metadata": dict(cf.metadata or {})}
            )

    # risk assessment — schema_analyzer.py:789-846
    high = len(removed)
    low = len(added)
    medium = 0
    for ch in type_changes:
        if ch["is_compatible"]:
            medium += 1
        else:
            high += 1
    for ch in nullable_changes:
        if ch["risk"] == "high":
            high += 1
        else:
            low += 1
    overall = "high" if high > 0 else ("medium" if medium > 0 else "low")

    incompatible = removed or [c for c in type_changes if not c["is_compatible"]]
    return {
        "added_columns": added,
        "removed_columns": removed,
        "type_changes": type_changes,
        "nullable_changes": nullable_changes,
        "metadata_changes": metadata_changes,
        "nested_differences": nested_differences,
        "schema_drift_risk": {
            "overall_risk": overall,
            "high_risk_count": high,
            "medium_risk_count": medium,
            "low_risk_count": low,
        },
        "schema_version_compatibility": "incompatible" if incompatible else "compatible",
    }


def schema_drift_rows(spark, diff: dict[str, Any]) -> DataFrame:
    """Flatten a schema diff into result-table rows."""
    rows = []
    for col in diff["added_columns"]:
        rows.append((col, "column_added", "", "low"))
    for col in diff["removed_columns"]:
        rows.append((col, "column_removed", "", "high"))
    for ch in diff["type_changes"]:
        rows.append(
            (ch["column"], "type_change", f"{ch['ref_type']} -> {ch['curr_type']}",
             "medium" if ch["is_compatible"] else "high")
        )
    for ch in diff["nullable_changes"]:
        rows.append(
            (ch["column"], "nullable_change",
             f"{ch['ref_nullable']} -> {ch['curr_nullable']}", ch["risk"])
        )
    for ch in diff["nested_differences"]:
        if ch["change_type"] != "type_change":  # top-level type changes already listed
            rows.append((ch["column"], ch["change_type"], ch["details"], ch["severity"]))
    schema = "column_name string, change_type string, details string, severity string"
    return spark.createDataFrame(rows, schema)


def complex_column_profile(
    df_ref: DataFrame,
    df_curr: DataFrame,
    columns: list[str] | None = None,
) -> DataFrame:
    """Null/empty/size drift for struct, array and map columns — one pass.

    Reference profiles each complex column with separate filter+count jobs
    (struct ``schema_analyzer.py:157-223``, array ``:226-284``, map
    ``:287-345``); here every metric for every complex column on both sides
    is one conditional aggregate. Size-change ≥ 20% and null/empty-ratio
    change ≥ 0.1 are the reference's significance bands.
    """
    schema = {f.name: f.dataType for f in df_ref.schema.fields}
    if columns is None:
        columns = [
            n for n, t in schema.items()
            if isinstance(t, (T.StructType, T.ArrayType, T.MapType))
            and n in set(df_curr.columns)
        ]
    if not columns:
        raise ValueError("no complex columns")
    tagged = df_ref.select(F.lit("r").alias("__side"), *columns).unionByName(
        df_curr.select(F.lit("c").alias("__side"), *columns)
    )
    aggs: list = []
    for c in columns:
        dtype = schema[c]
        sized = isinstance(dtype, (T.ArrayType, T.MapType))
        for pre, tag in (("ref", "r"), ("curr", "c")):
            cond = F.col("__side") == tag
            aggs.append(F.sum(cond.cast("long")).alias(f"{pre}__{c}__n"))
            aggs.append(F.sum((cond & F.col(c).isNull()).cast("long")).alias(f"{pre}__{c}__nulls"))
            if sized:
                size = F.size(F.col(c))
                aggs.append(
                    F.sum((cond & F.col(c).isNotNull() & (size == 0)).cast("long")).alias(
                        f"{pre}__{c}__empty"
                    )
                )
                aggs.append(F.avg(F.when(cond & F.col(c).isNotNull(), size)).alias(f"{pre}__{c}__avg_size"))
    wide = tagged.agg(*aggs)
    structs = []
    for c in columns:
        dtype = schema[c]
        sized = isinstance(dtype, (T.ArrayType, T.MapType))
        fields = [
            F.lit(c).alias("column_name"),
            F.lit(dtype.simpleString().split("<")[0]).alias("complex_kind"),
        ]
        for pre in ("ref", "curr"):
            n = F.greatest(F.col(f"{pre}__{c}__n"), F.lit(1))
            fields.append((F.col(f"{pre}__{c}__nulls") / n).alias(f"{pre}_null_ratio"))
            if sized:
                fields.append((F.col(f"{pre}__{c}__empty") / n).alias(f"{pre}_empty_ratio"))
                fields.append(F.col(f"{pre}__{c}__avg_size").alias(f"{pre}_avg_size"))
            else:
                fields.append(F.lit(None).cast("double").alias(f"{pre}_empty_ratio"))
                fields.append(F.lit(None).cast("double").alias(f"{pre}_avg_size"))
        structs.append(F.struct(*fields))
    out = wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    null_change = F.abs(F.col("curr_null_ratio") - F.col("ref_null_ratio"))
    empty_change = F.abs(F.col("curr_empty_ratio") - F.col("ref_empty_ratio"))
    size_change = F.when(
        F.col("ref_avg_size").isNotNull() & (F.col("ref_avg_size") != 0),
        F.abs(F.col("curr_avg_size") - F.col("ref_avg_size")) / F.abs(F.col("ref_avg_size")),
    )
    return (
        out.withColumn("null_ratio_change", null_change)
        .withColumn("empty_ratio_change", empty_change)
        .withColumn("avg_size_rel_change", size_change)
        .withColumn(
            "drift_detected",
            (null_change >= 0.1)
            | F.coalesce(empty_change >= 0.1, F.lit(False))
            | F.coalesce(size_change >= 0.2, F.lit(False)),
        )
    )


def snapshot_diff(
    ref: DataFrame,
    curr: DataFrame,
    id_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level reconciliation between two snapshot versions — the
    VALUE-level sibling of the schema diff above: which rows were
    added, removed, or changed between the reference and current
    version, and which columns drive the changes. This is the audit a
    pipeline runs when a corpus re-crawl or a backfill lands ("version
    N+1 touched 3% of rows, almost entirely the `text` column") before
    any distributional drift check makes sense.

    ``id_cols`` must uniquely key BOTH frames (enforce upstream with
    the ``unique`` constraint in :mod:`constraints`; duplicate keys
    would multiply join rows and overstate every count).
    ``compare_cols`` defaults to the columns the frames share, minus
    the key (in ``ref``'s column order). NULL ids are matched
    null-safely (a NULL-keyed row is a real row, the eqNullSafe panel
    rule); value changes use ``IS DISTINCT FROM``, so NULL -> value and
    value -> NULL count as changes while NULL -> NULL does not.

    Output (long format): ``scope='rows'`` — one row per change type
    (``added, removed, changed, unchanged``) with ``n_rows`` and
    ``share`` of all ids in either version; ``scope='column'`` — one
    row per compared column counting matched pairs where that column
    differs, with ``share`` of matched rows. Empty-input edge: shares
    are NULL when the denominator is 0.

    Plan: one hash shuffle of each side on the key, the full-outer
    join, then ONE wide conditional aggregate reduced to
    O(change types + columns) cells melted via ``stack`` — no second
    scan, no per-column jobs.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    if not id_cols:
        raise ValueError("id_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in ref.columns if c in set(curr.columns)]
        compare_cols = [c for c in shared if c not in set(id_cols)]
    if not compare_cols:
        raise ValueError("no columns to compare")
    ensure_safe_columns(list(id_cols) + list(compare_cols))
    missing = [
        c
        for c in list(id_cols) + list(compare_cols)
        if c not in ref.columns or c not in curr.columns
    ]
    if missing:
        raise ValueError(f"columns missing from a snapshot: {missing}")

    r = ref.selectExpr(
        *[f"`{c}` AS `__r_{c}`" for c in id_cols],
        *[f"`{c}` AS `__rv_{c}`" for c in compare_cols],
        "true AS __in_ref",
    )
    c_ = curr.selectExpr(
        *[f"`{c}` AS `__c_{c}`" for c in id_cols],
        *[f"`{c}` AS `__cv_{c}`" for c in compare_cols],
        "true AS __in_curr",
    )
    cond = None
    for k in id_cols:
        this = r[f"__r_{k}"].eqNullSafe(c_[f"__c_{k}"])
        cond = this if cond is None else (cond & this)
    joined = r.join(c_, cond, "full_outer")
    diff_flags = [
        f"(NOT (`__rv_{c}` <=> `__cv_{c}`)) AS `__d_{c}`"
        for c in compare_cols
    ]
    tagged = joined.selectExpr(
        "__in_ref IS NOT NULL AS __r_present",
        "__in_curr IS NOT NULL AS __c_present",
        *diff_flags,
    )
    any_diff = " OR ".join(f"`__d_{c}`" for c in compare_cols)
    wide = tagged.selectExpr(
        "CASE WHEN NOT __r_present THEN 'added'"
        " WHEN NOT __c_present THEN 'removed'"
        f" WHEN {any_diff} THEN 'changed'"
        " ELSE 'unchanged' END AS __ct",
        "__r_present AND __c_present AS __matched",
        *[f"`__d_{c}`" for c in compare_cols],
    ).agg(
        F.expr("CAST(count(1) AS BIGINT) AS __total"),
        F.expr("CAST(coalesce(sum(CASE WHEN __matched THEN 1 ELSE 0 END), 0) AS BIGINT)"
               " AS __n_matched"),
        *[
            F.expr(
                f"CAST(coalesce(sum(CASE WHEN __ct = '{t}' THEN 1 ELSE 0 END), 0)"
                f" AS BIGINT) AS __n_{t}"
            )
            for t in ("added", "removed", "changed", "unchanged")
        ],
        *[
            F.expr(
                f"CAST(coalesce(sum(CASE WHEN __matched AND `__d_{c}` THEN 1 ELSE 0"
                f" END), 0) AS BIGINT) AS `__nd_{c}`"
            )
            for c in compare_cols
        ],
    )
    row_cells = ", ".join(
        f"'rows', '{t}', __n_{t},"
        f" CASE WHEN __total > 0 THEN __n_{t} / CAST(__total AS DOUBLE) END"
        for t in ("added", "removed", "changed", "unchanged")
    )
    col_cells = ", ".join(
        f"'column', '{c}', `__nd_{c}`,"
        f" CASE WHEN __n_matched > 0"
        f" THEN `__nd_{c}` / CAST(__n_matched AS DOUBLE) END"
        for c in compare_cols
    )
    n = 4 + len(compare_cols)
    return wide.selectExpr(
        f"stack({n}, {row_cells}, {col_cells}) AS (scope, key, n_rows, share)"
    )
