"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator family from SURVEY.md §2,
and ``oracle_sql()`` carries its DuckDB twin over the same parquet tables.
Float outputs are rounded to 5 decimals ON BOTH SIDES so the value-hash
comparison is robust to engine-level last-ulp differences.

Drift queries derive a deterministic (ref, curr) pair from one table
(FIXTURES.md §B): ref = ``l_orderkey % 2 = 0``, curr = the complement.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROUND = 5

LINEITEM_NUMERIC = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
]
LINEITEM_CATEGORICAL = ["l_returnflag", "l_linestatus"]

PROFILE_STATS = ["n_rows", "n", "null_count", "min", "max", "mean", "stddev", "p25", "p50", "p75"]


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet")


def _split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    return df.filter(F.col("l_orderkey") % 2 == 0), df.filter(F.col("l_orderkey") % 2 == 1)


def _round_cols(df: DataFrame, cols: list[str], nd: int = ROUND) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, F.round(F.col(c).cast("double"), nd))
    return out


# --------------------------------------------------------------------------
# Spark-side queries
# --------------------------------------------------------------------------

def q_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4 + P2: full numeric profile of lineitem, one wide aggregate."""
    from pyspark_data_drift_detector_spark.operators.profile import numeric_profile

    prof = numeric_profile(
        _lineitem(spark, sf_dir), columns=LINEITEM_NUMERIC, quantiles=(0.25, 0.5, 0.75),
        with_shape=False,
    )
    keep = ["column_name"] + PROFILE_STATS
    return _round_cols(prof.select(*keep), ["min", "max", "mean", "stddev", "p25", "p50", "p75"])


def q_numeric_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M16+M19: numeric drift metrics over the even/odd lineitem split."""
    from pyspark_data_drift_detector_spark.operators.numeric_drift import numeric_drift
    from pyspark_data_drift_detector_spark.operators.profile import numeric_profile

    ref, curr = _split(_lineitem(spark, sf_dir))
    kwargs = dict(columns=LINEITEM_NUMERIC, quantiles=(0.25, 0.5, 0.75), with_shape=False)
    drift = numeric_drift(numeric_profile(ref, **kwargs), numeric_profile(curr, **kwargs))
    rounded = [
        "mean_relative_diff",
        "median_relative_diff",
        "std_dev_relative_diff",
        "iqr_relative_diff",
        "range_relative_diff",
        "null_diff",
        "drift_score",
    ]
    return _round_cols(drift.select("column_name", *rounded, "drift_detected"), rounded)


def q_freq_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+W1: per-column category counts and normalized frequencies."""
    from pyspark_data_drift_detector_spark.operators.frequency import frequency_table

    freq = frequency_table(_lineitem(spark, sf_dir), LINEITEM_CATEGORICAL)
    return _round_cols(
        freq.select("column_name", "value", F.col("cnt").cast("long").alias("cnt"), "freq"),
        ["freq"],
    )


def q_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6-M8+M18: JS distance, chi², category changes over the lineitem split."""
    from pyspark_data_drift_detector_spark.operators.categorical_drift import categorical_drift

    ref, curr = _split(_lineitem(spark, sf_dir))
    drift = categorical_drift(ref, curr, LINEITEM_CATEGORICAL, p_value_mode="ladder")
    rounded = ["js_distance", "chi_square", "p_value", "null_diff", "drift_score"]
    return _round_cols(
        drift.select(
            "column_name",
            *rounded,
            F.col("degrees_of_freedom").cast("int").alias("degrees_of_freedom"),
            F.col("new_categories").cast("long").alias("new_categories"),
            F.col("missing_categories").cast("long").alias("missing_categories"),
            "drift_detected",
        ),
        rounded,
    )


def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: Shannon entropy (log2) per categorical column."""
    from pyspark_data_drift_detector_spark.operators.frequency import entropy, frequency_table

    ent = entropy(frequency_table(_lineitem(spark, sf_dir), LINEITEM_CATEGORICAL))
    return _round_cols(ent.select("column_name", "entropy"), ["entropy"])


def q_group_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M26 (profile half): per-dimension numeric stats, single groupBy pass."""
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/orders.parquet")
    out = df.groupBy(F.col("o_orderpriority").alias("dimension_value")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("o_totalprice"), ROUND).alias("mean_totalprice"),
        F.round(F.stddev("o_totalprice"), ROUND).alias("std_totalprice"),
        F.round(F.min("o_totalprice"), ROUND).alias("min_totalprice"),
        F.round(F.max("o_totalprice"), ROUND).alias("max_totalprice"),
    )
    return out


def q_top_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2: top-3 categories per column with deterministic tie-break."""
    from pyspark_data_drift_detector_spark.operators.frequency import frequency_table

    freq = frequency_table(
        spark.read.parquet(f"{sf_dir.rstrip('/')}/orders.parquet"),
        ["o_orderstatus", "o_orderpriority"],
        top_k=3,
    )
    return _round_cols(
        freq.select("column_name", "value", F.col("cnt").cast("long").alias("cnt"), "freq"),
        ["freq"],
    )


# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------

def _profile_sql_one(col: str, table: str, where: str = "TRUE") -> str:
    return f"""
    SELECT '{col}' AS column_name,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT({col}) AS BIGINT) AS n,
      CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS null_count,
      ROUND(CAST(MIN({col}) AS DOUBLE), {ROUND}) AS min,
      ROUND(CAST(MAX({col}) AS DOUBLE), {ROUND}) AS max,
      ROUND(CAST(AVG({col}) AS DOUBLE), {ROUND}) AS mean,
      ROUND(CAST(STDDEV_SAMP({col}) AS DOUBLE), {ROUND}) AS stddev,
      ROUND(CAST(quantile_cont({col}, 0.25) AS DOUBLE), {ROUND}) AS p25,
      ROUND(CAST(quantile_cont({col}, 0.50) AS DOUBLE), {ROUND}) AS p50,
      ROUND(CAST(quantile_cont({col}, 0.75) AS DOUBLE), {ROUND}) AS p75
    FROM {table} WHERE {where}"""


def _profile_cte(name: str, where: str) -> str:
    """Un-rounded per-column profile CTE for drift math."""
    parts = [
        f"""SELECT '{c}' AS column_name,
          CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS null_count,
          CAST(MIN({c}) AS DOUBLE) AS mn,
          CAST(MAX({c}) AS DOUBLE) AS mx,
          CAST(AVG({c}) AS DOUBLE) AS mean,
          CAST(STDDEV_SAMP({c}) AS DOUBLE) AS stddev,
          CAST(quantile_cont({c}, 0.25) AS DOUBLE) AS p25,
          CAST(quantile_cont({c}, 0.50) AS DOUBLE) AS p50,
          CAST(quantile_cont({c}, 0.75) AS DOUBLE) AS p75
        FROM lineitem WHERE {where}"""
        for c in LINEITEM_NUMERIC
    ]
    return f"{name} AS ({' UNION ALL '.join(parts)})"


_REL = (
    "CASE WHEN r.{rv} = 0 THEN (CASE WHEN c.{cv} <> 0 THEN 1.0 ELSE 0.0 END) "
    "ELSE (c.{cv} - r.{rv}) / ABS(r.{rv}) END"
)


def _numeric_drift_sql() -> str:
    rel = {
        "mean": _REL.format(rv="mean", cv="mean"),
        "median": _REL.format(rv="p50", cv="p50"),
        "std": _REL.format(rv="stddev", cv="stddev"),
        "iqr": (
            "CASE WHEN (r.p75 - r.p25) = 0 THEN (CASE WHEN (c.p75 - c.p25) <> 0 THEN 1.0 ELSE 0.0 END) "
            "ELSE ((c.p75 - c.p25) - (r.p75 - r.p25)) / ABS(r.p75 - r.p25) END"
        ),
        "range": (
            "CASE WHEN (r.mx - r.mn) = 0 THEN (CASE WHEN (c.mx - c.mn) <> 0 THEN 1.0 ELSE 0.0 END) "
            "ELSE ((c.mx - c.mn) - (r.mx - r.mn)) / ABS(r.mx - r.mn) END"
        ),
    }
    null_diff = "(CAST(c.null_count AS DOUBLE)/c.n_rows - CAST(r.null_count AS DOUBLE)/r.n_rows)"
    score = (
        f"LEAST(1.0, 0.25*ABS({rel['mean']}) + 0.2*ABS({rel['median']}) + 0.15*ABS({rel['std']})"
        f" + 0.15*ABS({rel['iqr']}) + 0.1*ABS({null_diff}) + 0.15*ABS({rel['range']}))"
    )
    detected = (
        f"(ABS({rel['mean']}) > 0.05 OR ABS({rel['median']}) > 0.05 OR ABS({rel['std']}) > 0.1"
        f" OR ABS({rel['iqr']}) > 0.1 OR ABS({null_diff}) > 0.005 OR ABS({rel['range']}) > 0.1)"
    )
    return f"""
    WITH {_profile_cte('ref', 'l_orderkey % 2 = 0')},
         {_profile_cte('curr', 'l_orderkey % 2 = 1')}
    SELECT r.column_name,
      ROUND({rel['mean']}, {ROUND}) AS mean_relative_diff,
      ROUND({rel['median']}, {ROUND}) AS median_relative_diff,
      ROUND({rel['std']}, {ROUND}) AS std_dev_relative_diff,
      ROUND({rel['iqr']}, {ROUND}) AS iqr_relative_diff,
      ROUND({rel['range']}, {ROUND}) AS range_relative_diff,
      ROUND({null_diff}, {ROUND}) AS null_diff,
      ROUND({score}, {ROUND}) AS drift_score,
      {detected} AS drift_detected
    FROM ref r JOIN curr c USING (column_name)"""


def _melt_sql(cols: list[str], table: str, where: str = "TRUE") -> str:
    parts = [
        f"SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS value FROM {table} "
        f"WHERE ({where}) AND {c} IS NOT NULL"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def _freq_sql(cols: list[str], table: str, where: str = "TRUE") -> str:
    return f"""
    SELECT column_name, value, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY column_name) AS freq
    FROM ({_melt_sql(cols, table, where)}) GROUP BY column_name, value"""


def _categorical_drift_sql() -> str:
    # chi² critical value for p=0.05 (reference's hardcoded table + tail formula)
    cv = (
        "CASE WHEN dof > 10 THEN dof + SQRT(2.0*dof) "
        "WHEN dof = 1 THEN 3.84 WHEN dof = 2 THEN 5.99 WHEN dof = 3 THEN 7.81 "
        "WHEN dof = 4 THEN 9.49 WHEN dof = 5 THEN 11.07 WHEN dof = 6 THEN 12.59 "
        "WHEN dof = 7 THEN 14.07 WHEN dof = 8 THEN 15.51 WHEN dof = 9 THEN 16.92 "
        "WHEN dof = 10 THEN 18.31 ELSE 3.84 END"
    )
    p_ladder = (
        f"CASE WHEN chi < 0.001 THEN 1.0 WHEN chi > 3*({cv}) THEN 0.001 "
        f"WHEN chi > 2*({cv}) THEN 0.01 WHEN chi > ({cv}) THEN 0.05 "
        f"ELSE LEAST(1.0, GREATEST(0.05, 1.0 - (chi / ({cv})) * 0.95)) END"
    )
    chi_score = (
        "CASE WHEN pv.p <= 0.001 THEN 1.0 WHEN pv.p <= 0.01 THEN 0.8 WHEN pv.p <= 0.05 THEN 0.6 "
        "WHEN pv.p <= 0.1 THEN 0.3 ELSE 0.0 END"
    )
    null_parts = " UNION ALL ".join(
        f"""SELECT '{c}' AS column_name,
          CAST(SUM(CASE WHEN l_orderkey % 2 = 1 AND {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / SUM(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END)
          - CAST(SUM(CASE WHEN l_orderkey % 2 = 0 AND {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / SUM(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS null_diff
        FROM lineitem"""
        for c in LINEITEM_CATEGORICAL
    )
    return f"""
    WITH refc AS ({_freq_sql(LINEITEM_CATEGORICAL, 'lineitem', 'l_orderkey % 2 = 0')}),
         currc AS ({_freq_sql(LINEITEM_CATEGORICAL, 'lineitem', 'l_orderkey % 2 = 1')}),
         aligned AS (
           SELECT COALESCE(r.column_name, c.column_name) AS column_name,
                  COALESCE(r.value, c.value) AS value,
                  COALESCE(r.cnt, 0) AS ref_cnt, COALESCE(c.cnt, 0) AS curr_cnt,
                  COALESCE(r.freq, 0.0) AS p, COALESCE(c.freq, 0.0) AS q
           FROM refc r FULL OUTER JOIN currc c
             ON r.column_name = c.column_name AND r.value = c.value
         ),
         js AS (
           SELECT column_name,
             SQRT(GREATEST(0.0, (
               SUM(CASE WHEN p > 0 AND (p+q)/2 > 0 THEN p * LOG2(p / ((p+q)/2)) ELSE 0 END) +
               SUM(CASE WHEN q > 0 AND (p+q)/2 > 0 THEN q * LOG2(q / ((p+q)/2)) ELSE 0 END)
             ) / 2)) AS js_distance,
             CAST(SUM(CASE WHEN ref_cnt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS new_categories,
             CAST(SUM(CASE WHEN curr_cnt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS missing_categories,
             CAST(SUM(CASE WHEN ref_cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ref_categories
           FROM aligned GROUP BY column_name
         ),
         chi2 AS (
           SELECT column_name, SUM(contrib) AS chi, CAST(COUNT(*) - 1 AS INT) AS dof
           FROM (
             SELECT column_name,
               CASE WHEN exp_ref >= 5 AND exp_curr >= 5 THEN
                 POW(ref_cnt - exp_ref, 2)/exp_ref + POW(curr_cnt - exp_curr, 2)/exp_curr
               ELSE 0 END AS contrib
             FROM (
               SELECT column_name, ref_cnt, curr_cnt,
                 SUM(ref_cnt) OVER (PARTITION BY column_name) * (ref_cnt + curr_cnt)
                   / (SUM(ref_cnt) OVER (PARTITION BY column_name) + SUM(curr_cnt) OVER (PARTITION BY column_name)) AS exp_ref,
                 SUM(curr_cnt) OVER (PARTITION BY column_name) * (ref_cnt + curr_cnt)
                   / (SUM(ref_cnt) OVER (PARTITION BY column_name) + SUM(curr_cnt) OVER (PARTITION BY column_name)) AS exp_curr
               FROM aligned
             )
           ) GROUP BY column_name
         ),
         pv AS (SELECT column_name, chi, dof, {p_ladder} AS p FROM chi2),
         nulls AS ({null_parts})
    SELECT js.column_name,
      ROUND(js.js_distance, {ROUND}) AS js_distance,
      ROUND(pv.chi, {ROUND}) AS chi_square,
      ROUND(pv.p, {ROUND}) AS p_value,
      ROUND(nulls.null_diff, {ROUND}) AS null_diff,
      ROUND(LEAST(1.0,
        0.4 * LEAST(1.0, js.js_distance * 4)
        + 0.3 * ({chi_score})
        + 0.1 * LEAST(1.0, ABS(nulls.null_diff) * 10)
        + 0.2 * LEAST(1.0, GREATEST(
            CAST(js.new_categories AS DOUBLE)/GREATEST(js.ref_categories, 1),
            CAST(js.missing_categories AS DOUBLE)/GREATEST(js.ref_categories, 1)) * 2)
      ), {ROUND}) AS drift_score,
      pv.dof AS degrees_of_freedom,
      js.new_categories, js.missing_categories,
      (js.js_distance > 0.03 OR pv.p < 0.05 OR ABS(nulls.null_diff) > 0.005
       OR CAST(js.new_categories AS DOUBLE)/GREATEST(js.ref_categories,1) > 0.03
       OR CAST(js.missing_categories AS DOUBLE)/GREATEST(js.ref_categories,1) > 0.03) AS drift_detected
    FROM js JOIN pv USING (column_name) JOIN nulls USING (column_name)"""


def _oracle_queries() -> dict[str, str]:
    numeric_profile_sql = " UNION ALL ".join(
        _profile_sql_one(c, "lineitem") for c in LINEITEM_NUMERIC
    )
    entropy_sql = f"""
    SELECT column_name,
           ROUND(-SUM(freq * LOG2(freq)), {ROUND}) AS entropy
    FROM ({_freq_sql(LINEITEM_CATEGORICAL, 'lineitem')}) GROUP BY column_name"""
    freq_sql = f"""
    SELECT column_name, value, cnt, ROUND(freq, {ROUND}) AS freq
    FROM ({_freq_sql(LINEITEM_CATEGORICAL, 'lineitem')})"""
    group_profile_sql = f"""
    SELECT o_orderpriority AS dimension_value,
      CAST(COUNT(*) AS BIGINT) AS n,
      ROUND(AVG(o_totalprice), {ROUND}) AS mean_totalprice,
      ROUND(STDDEV_SAMP(o_totalprice), {ROUND}) AS std_totalprice,
      ROUND(MIN(o_totalprice), {ROUND}) AS min_totalprice,
      ROUND(MAX(o_totalprice), {ROUND}) AS max_totalprice
    FROM orders GROUP BY o_orderpriority"""
    top_categories_sql = f"""
    WITH freq AS (
      SELECT column_name, value, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(COUNT(*) AS DOUBLE)/SUM(COUNT(*)) OVER (PARTITION BY column_name) AS freq
      FROM ({_melt_sql(['o_orderstatus', 'o_orderpriority'], 'orders')})
      GROUP BY column_name, value
    )
    SELECT column_name, value, cnt, ROUND(freq, {ROUND}) AS freq FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY column_name ORDER BY cnt DESC, value ASC) AS rn
      FROM freq
    ) WHERE rn <= 3"""
    return {
        "numeric_profile": numeric_profile_sql,
        "numeric_drift": _numeric_drift_sql(),
        "freq_table": freq_sql,
        "categorical_drift": _categorical_drift_sql(),
        "entropy": entropy_sql,
        "group_profile": group_profile_sql,
        "top_categories": top_categories_sql,
    }


# --------------------------------------------------------------------------
# Contract functions
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full drift-detection pipeline on the sf0.001 lineitem
    even/odd split → long-format result rows (one per analyzed column)."""
    from pyspark_data_drift_detector_spark import detect_drift

    df = _lineitem(spark, "/root/testdata/sf0.001")
    ref, curr = _split(df)
    return detect_drift(ref, curr)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "numeric_profile": q_numeric_profile,
        "numeric_drift": q_numeric_drift,
        "freq_table": q_freq_table,
        "categorical_drift": q_categorical_drift,
        "entropy": q_entropy,
        "group_profile": q_group_profile,
        "top_categories": q_top_categories,
    }


def oracle_sql() -> dict[str, str]:
    return _oracle_queries()
