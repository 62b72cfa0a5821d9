"""Scaffold generator for custom drift operators.

Counterpart to the reference's ``create_analyzer_template.py`` (a CLI that
writes a class template whose example logic is two ``collect()`` round-trips
per column, ``create_analyzer_template.py:31-143``). The generated template
here follows this engine's contract instead:

- a plain **function**, not a class — ``fn(df_ref, df_curr, by_type, cfg)
  -> DataFrame`` — pluggable via the ``custom_analyzers`` config entry
  (callable or ``"module:function"`` dotted path);
- the example metric is ONE side-tagged wide aggregate for ALL columns
  (single scan per side, one shuffled row), then pure expression math —
  the shape every built-in family uses, and the one that survives 100 TB;
- the returned DataFrame carries the standard scoring columns; extra
  columns land in the ``metrics`` JSON automatically.

Usage::

    from pyspark_data_drift_detector_spark.scaffold import create_operator_template
    path = create_operator_template("freshness", "/path/to/project")
    # edit the generated file, then:
    detect_drift(ref, curr, {"custom_analyzers": ["freshness_operator:freshness_drift"]})
"""

from __future__ import annotations

import os

_TEMPLATE = '''\
"""Custom drift operator: {name}.

Plug into the engine via config::

    detect_drift(df_ref, df_curr, {{"custom_analyzers": ["{module}:{func}"]}})

or pass the function object directly in ``custom_analyzers``.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def {func}(df_ref: DataFrame, df_curr: DataFrame, by_type: dict, cfg) -> DataFrame:
    """Return one row per analyzed column with the standard scoring columns
    (column_name, drift_score, drift_severity, drift_detected, drift_causes);
    any extra columns are folded into the result's metrics JSON.

    The example below compares per-column means with ONE side-tagged wide
    aggregate — a single scan of each snapshot and a one-row shuffle no
    matter how many columns. Keep that shape: per-column collect() loops
    do not survive large tables.
    """
    columns = by_type.get("numerical", [])
    if not columns:
        raise ValueError("{func}: no numerical columns to analyze")
    threshold = float(cfg.thresholds.get("{name}_threshold", 0.1))

    tagged = df_ref.select(F.lit("r").alias("__side"), *columns).unionByName(
        df_curr.select(F.lit("c").alias("__side"), *columns)
    )
    aggs = []
    for c in columns:
        v = F.col(c).cast("double")
        aggs.append(F.avg(F.when(F.col("__side") == "r", v)).alias(f"__ref__{{c}}"))
        aggs.append(F.avg(F.when(F.col("__side") == "c", v)).alias(f"__curr__{{c}}"))
    wide = tagged.agg(*aggs)

    # unpivot the 1-row aggregate into O(columns) rows, then score with
    # pure expression math (reference rel-change convention: ref==0 and
    # curr!=0 counts as a full-scale change)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"__ref__{{c}}").alias("ref_value"),
            F.col(f"__curr__{{c}}").alias("curr_value"),
        )
        for c in columns
    ]
    long = wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    r, c = F.col("ref_value"), F.col("curr_value")
    rel = (
        F.when(r != 0, F.abs((c - r) / r))
        .when(c != 0, F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    detected = rel > threshold
    return long.select(
        "column_name",
        F.least(F.lit(1.0), rel).alias("drift_score"),
        F.when(rel > 2 * threshold, "High")
        .when(detected, "Medium")
        .otherwise("None")
        .alias("drift_severity"),
        detected.alias("drift_detected"),
        F.array_compact(F.array(F.when(detected, F.lit("{name}_shift")))).alias(
            "drift_causes"
        ),
        "ref_value",
        "curr_value",
        rel.alias("relative_change"),
    )


# shown as the column_type of this family's result rows
{func}.analyzer_name = "{name}"
'''


def create_operator_template(name: str, output_path: str = ".") -> str:
    """Write ``<name>_operator.py`` into ``output_path`` and return its path.

    ``name`` becomes the analyzer family (the ``column_type`` of its rows)
    and the config threshold prefix (``<name>_threshold``).
    """
    name = name.removesuffix("_operator").removesuffix("_analyzer")
    if not name.isidentifier():
        raise ValueError(f"operator name must be a Python identifier, got {name!r}")
    module = f"{name}_operator"
    func = f"{name}_drift"
    path = os.path.join(output_path, f"{module}.py")
    with open(path, "w") as fh:
        fh.write(_TEMPLATE.format(name=name, module=module, func=func))
    return path
