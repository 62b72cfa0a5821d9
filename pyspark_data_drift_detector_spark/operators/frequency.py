"""Frequency tables, top-k truncation, entropy — all columns in one pass.

The reference runs a ``groupBy(col).count()`` + ``orderBy().limit(20)`` +
``collect()`` *per column per side* (``categorical_analyzer.py:145-151``)
and normalizes frequencies driver-side. Here all categorical columns are
unpivoted into ``(column_name, value)`` pairs first, so ONE shuffle builds
every column's frequency table, and normalization / top-k / entropy are
window + aggregate expressions that never leave the cluster.

Scale notes:
- The unpivot is a narrow map (explode) — no extra shuffle; the single
  ``groupBy(column_name, value)`` benefits from map-side partial
  aggregation, so shuffle volume is O(total distinct categories), not rows.
- Top-k uses ``row_number`` over ``(column_name)`` partitions — the per-key
  state is bounded, never a driver collect (SURVEY §7.4 risk 5).

Covers SURVEY.md §2.4 A6-A8, §2.5 W1, §2.6 T1-T3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def unpivot_values(df: DataFrame, columns: list[str], keep_nulls: bool = False) -> DataFrame:
    """Melt selected columns to ``(column_name, value:string)`` rows."""
    if not columns:
        raise ValueError("no columns to unpivot")
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(c).cast("string").alias("value"),
            )
            for c in columns
        ]
    )
    out = df.select(F.explode(pairs).alias("kv")).select("kv.*")
    if not keep_nulls:
        out = out.filter(F.col("value").isNotNull())
    return out


def with_key_totals(
    cells: DataFrame,
    sums: dict[str, "F.Column"],
    keys: tuple[str, ...] = ("column_name",),
) -> DataFrame:
    """Attach per-key totals via ``groupBy`` + broadcast join.

    NOT an unpartitioned window: ``Window.partitionBy(key)`` buffers every
    cell of a key in ONE task, which for a high-cardinality categorical
    column at 100 TB is the same single-task cliff as the cumulative-sum
    windows (``operators.cumulative``). The totals table is O(keys) rows —
    always broadcastable — and the groupBy's partial aggregation is
    map-side, so the fix costs one tiny extra shuffle and removes the
    per-key buffering entirely. Results are bit-identical (integer sums).
    """
    key_list = list(keys)
    totals = cells.groupBy(*key_list).agg(
        *[expr.alias(name) for name, expr in sums.items()]
    )
    return cells.join(F.broadcast(totals), key_list)


def frequency_table(
    df: DataFrame,
    columns: list[str],
    top_k: int | None = None,
    keep_nulls: bool = False,
) -> DataFrame:
    """Per-column category counts and frequencies.

    Output: ``column_name, value, cnt, n_nonnull, freq`` where ``freq`` is
    ``cnt / n_nonnull`` — the reference's denominator is non-null rows of
    that column (``categorical_analyzer.py:161``).

    ``top_k`` keeps the k most frequent categories per column (deterministic
    tie-break on value) — the reference's top-20 truncation semantics
    (``categorical_analyzer.py:151``, SURVEY §2.6 T1). Note the truncation
    happens AFTER normalization, so frequencies stay relative to the full
    column as in the reference.
    """
    counts = (
        unpivot_values(df, columns, keep_nulls=keep_nulls)
        .groupBy("column_name", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = with_key_totals(counts, {"n_nonnull": F.sum("cnt")}).withColumn(
        "freq", F.col("cnt") / F.col("n_nonnull")
    )
    if top_k is not None:
        counts = top_k_filter(counts, top_k)
    return counts


def top_k_filter(freq: DataFrame, top_k: int, extra_keys: list[str] | None = None) -> DataFrame:
    """Keep the k most frequent categories per column (tie-break on value).

    Separate from ``frequency_table`` so a full table can be computed once
    and truncated as a second consumer — Spark reuses the shuffle exchange
    instead of rescanning the source.
    """
    keys = ["column_name", *(extra_keys or [])]
    rank_win = Window.partitionBy(*keys).orderBy(F.desc("cnt"), F.asc("value"))
    return (
        freq.withColumn("__rn", F.row_number().over(rank_win))
        .filter(F.col("__rn") <= top_k)
        .drop("__rn")
    )


def pair_frequency_cells(
    df_ref: DataFrame,
    df_curr: DataFrame,
    columns: list[str],
) -> DataFrame:
    """Aligned ref/curr category counts for all columns in ONE scan+shuffle.

    Side-tagged union → unpivot → ``groupBy(column_name, value)`` with
    conditional sums. This replaces the reference's per-side frequency
    collection + driver-side dict merge (``categorical_analyzer.py:334-347``)
    AND the full-outer alignment join — the groupBy aligns both sides for
    free. NULL category values are kept as rows so null counts derive from
    the same pass.

    Output: ``column_name, value (nullable), ref_cnt, curr_cnt`` — one row
    per distinct category, O(total distinct categories) after the shuffle's
    map-side partial aggregation.
    """
    if not columns:
        raise ValueError("no columns")
    tagged = df_ref.select(F.lit("r").alias("__side"), *columns).unionByName(
        df_curr.select(F.lit("c").alias("__side"), *columns)
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(c).cast("string").alias("value"),
            )
            for c in columns
        ]
    )
    melted = tagged.select("__side", F.explode(pairs).alias("kv")).select("__side", "kv.*")
    return melted.groupBy("column_name", "value").agg(
        F.sum((F.col("__side") == "r").cast("long")).alias("ref_cnt"),
        F.sum((F.col("__side") == "c").cast("long")).alias("curr_cnt"),
    )


def entropy(freq: DataFrame, base2: bool = True) -> DataFrame:
    """Shannon entropy per column from a frequency table.

    ``-Σ p·log(p)``; the reference's categorical path uses log2
    (``categorical_analyzer.py:163-167``) while the adaptive-threshold path
    uses ln (``adaptive_threshold.py:441-455``) — base is a knob.
    """
    log = F.log2 if base2 else F.log
    return freq.groupBy("column_name").agg(
        (-F.sum(F.col("freq") * log(F.col("freq")))).alias("entropy")
    )


def population_stability_index(
    df_ref: DataFrame,
    df_curr: DataFrame,
    columns: list[str],
    epsilon: float = 1e-4,
) -> DataFrame:
    """PSI per column: ``Σ (q−p)·ln(q/p)`` over the aligned category support.

    The industry-standard drift metric (banking/model-monitoring
    convention: <0.1 stable, 0.1–0.25 moderate, >0.25 significant) —
    beyond the reference's surface (it has JS/chi² only), added because a
    drift engine without PSI is incomplete for most monitoring users.
    Zero-frequency categories clamp to ``epsilon`` (the standard zero-bin
    treatment, keeping the sum finite). One ``pair_frequency_cells`` pass;
    frequencies are over each side's non-null total.
    """
    cells = pair_frequency_cells(df_ref, df_curr, columns)
    nn = ~F.col("value").isNull()
    enr = (
        with_key_totals(
            cells,
            {
                "ref_total": F.sum(F.when(nn, F.col("ref_cnt")).otherwise(F.lit(0))),
                "curr_total": F.sum(F.when(nn, F.col("curr_cnt")).otherwise(F.lit(0))),
            },
        )
        .filter(nn)
        .withColumn(
            "p",
            F.greatest(F.col("ref_cnt") / F.greatest(F.col("ref_total"), F.lit(1)), F.lit(epsilon)),
        )
        .withColumn(
            "q",
            F.greatest(F.col("curr_cnt") / F.greatest(F.col("curr_total"), F.lit(1)), F.lit(epsilon)),
        )
    )
    psi = F.sum((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p")))
    return enr.groupBy("column_name").agg(psi.alias("psi")).select(
        "column_name",
        "psi",
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "moderate_shift")
        .otherwise("significant_shift")
        .alias("stability"),
    )


def categorical_distances(
    df_ref: DataFrame,
    df_curr: DataFrame,
    columns: list[str],
    epsilon: float = 1e-4,
) -> DataFrame:
    """JS, PSI, total-variation and Hellinger distances per column — one pass.

    All four are sums over the aligned category frequencies, so they share
    ONE ``pair_frequency_cells`` aggregation (the reference computes its one
    metric per analyzer with separate collections; a monitoring user wants
    the full panel at the cost of one):

    - ``js``: sqrt of midpoint-KL divergence, log2 (same math as
      ``categorical_drift``'s full-support variant);
    - ``psi``: ε-clamped ``Σ (q−p)·ln(q/p)``;
    - ``tvd``: ``½·Σ|p−q|`` ∈ [0,1];
    - ``hellinger``: ``√(½·Σ(√p−√q)²)`` ∈ [0,1].
    """
    cells = pair_frequency_cells(df_ref, df_curr, columns)
    nn = ~F.col("value").isNull()
    enr = (
        with_key_totals(
            cells,
            {
                "ref_total": F.sum(F.when(nn, F.col("ref_cnt")).otherwise(F.lit(0))),
                "curr_total": F.sum(F.when(nn, F.col("curr_cnt")).otherwise(F.lit(0))),
            },
        )
        .filter(nn)
        .withColumn("p", F.col("ref_cnt") / F.greatest(F.col("ref_total"), F.lit(1)))
        .withColumn("q", F.col("curr_cnt") / F.greatest(F.col("curr_total"), F.lit(1)))
    )
    p, q = F.col("p"), F.col("q")
    m = (p + q) / 2
    kl_p = F.when((p > 0) & (m > 0), p * F.log2(p / m)).otherwise(F.lit(0.0))
    kl_q = F.when((q > 0) & (m > 0), q * F.log2(q / m)).otherwise(F.lit(0.0))
    pc = F.greatest(p, F.lit(epsilon))
    qc = F.greatest(q, F.lit(epsilon))
    return enr.groupBy("column_name").agg(
        F.sqrt(F.greatest(F.lit(0.0), (F.sum(kl_p) + F.sum(kl_q)) / 2)).alias("js"),
        F.sum((qc - pc) * F.log(qc / pc)).alias("psi"),
        (F.sum(F.abs(p - q)) / 2).alias("tvd"),
        F.sqrt(
            F.greatest(F.lit(0.0), F.sum(F.pow(F.sqrt(p) - F.sqrt(q), 2)) / 2)
        ).alias("hellinger"),
    )


def grouped_frequency_table(
    df: DataFrame,
    dimension: str,
    columns: list[str],
    top_k: int | None = None,
) -> DataFrame:
    """Frequency tables sliced by a dimension column, single pass.

    Replaces the reference's per-category ``filter()`` loop
    (``group_analyzer.py:66-102``) with one ``groupBy(dimension,
    column_name, value)`` aggregate. Output adds ``dimension_value``;
    ``top_k`` is per ``(dimension_value, column_name)``.
    """
    melted = df.select(
        F.col(dimension).cast("string").alias("dimension_value"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in columns
                ]
            )
        ).alias("kv"),
    ).select("dimension_value", "kv.*")
    counts = (
        melted.filter(F.col("value").isNotNull())
        .groupBy("dimension_value", "column_name", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = with_key_totals(
        counts, {"n_nonnull": F.sum("cnt")}, keys=("dimension_value", "column_name")
    ).withColumn("freq", F.col("cnt") / F.col("n_nonnull"))
    if top_k is not None:
        rank_win = Window.partitionBy("dimension_value", "column_name").orderBy(
            F.desc("cnt"), F.asc("value")
        )
        counts = (
            counts.withColumn("__rn", F.row_number().over(rank_win))
            .filter(F.col("__rn") <= top_k)
            .drop("__rn")
        )
    return counts
