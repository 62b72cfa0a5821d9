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
