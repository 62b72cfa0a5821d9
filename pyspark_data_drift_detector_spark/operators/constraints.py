"""Declarative data-quality constraint checks (Deequ-style).

A drift engine answers "did the data change"; a constraint suite answers
"is the data ACCEPTABLE" — the gate a 100 TB ingest runs before anything
downstream trusts a batch. All single-table constraints compile into ONE
wide aggregate over the frame (the engine's standard profile shape: one
scan, map-side partials, O(constraints) result cells), and referential
integrity is a broadcast-able anti-join count.

Supported single-table constraint specs (dicts):

- ``{"type": "completeness", "column": c, "min_ratio": r}`` — non-null
  share of rows ≥ r.
- ``{"type": "unique", "column": c_or_list}`` — no value (or composite
  tuple, for a list) occurs twice; for composites, rows with any NULL
  component are excluded, matching the single-column convention.
- ``{"type": "in_set", "column": c, "values": [...]}`` — every non-null
  value belongs to the accepted domain.
- ``{"type": "range", "column": c, "min": x, "max": y}`` — every
  non-null value inside [x, y] (either bound optional).
- ``{"type": "implication", "if_column": a, "then_column": b}`` — rows
  carrying ``a`` must also carry ``b`` (conditional completeness: "if
  there's a shipping address there must be a country").
- ``{"type": "min_rows", "count": n}`` — the batch is not suspiciously
  small.
- ``{"type": "functional_dependency", "determinant": x_or_list,
  "dependent": y}`` — every distinct determinant value maps to at most
  one distinct non-null dependent (delegates to
  ``check_functional_dependencies`` and unions its rows in; FD checks
  need a keyed groupBy, so a suite containing one runs a second scan —
  all FDs in the suite still share that one scan).

Output: one row per constraint — ``constraint, column, metric,
threshold, violations, passed``. ``metric`` is the measured quantity
(ratio / distinct gap / violation count / row count), ``violations``
the offending-row count where meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_data_drift_detector_spark.functions.quoting import (
    ensure_safe_columns,
    qs,
)


def check_constraints(df: DataFrame, constraints: list[dict]) -> DataFrame:
    """Evaluate single-table constraints in ONE wide aggregate (plus one
    shared keyed pass when the suite contains functional dependencies)."""
    if not constraints:
        raise ValueError("no constraints")
    fd_specs = [
        c for c in constraints if c.get("type") == "functional_dependency"
    ]
    constraints = [
        c for c in constraints if c.get("type") != "functional_dependency"
    ]
    fd = (
        check_functional_dependencies(
            df, [(s["determinant"], s["dependent"]) for s in fd_specs]
        )
        if fd_specs
        else None
    )
    if not constraints:
        assert fd is not None
        return fd
    cols = []
    for c in constraints:
        if "column" in c:
            v = c["column"]
            cols += [v] if isinstance(v, str) else list(v)
        for key in ("if_column", "then_column"):
            if key in c:
                cols.append(c[key])
    ensure_safe_columns(cols)

    aggs: list[str] = ["count(1) AS __total"]
    rows: list[str] = []
    for i, spec in enumerate(constraints):
        kind = spec.get("type")
        c = spec.get("column")
        if kind == "completeness":
            r = float(spec["min_ratio"])
            aggs.append(f"count(`{c}`) AS __n{i}")
            rows.append(
                f"named_struct('constraint', 'completeness', 'column', '{c}',"
                f" 'metric', CAST(__n{i} AS DOUBLE) / greatest(__total, 1),"
                f" 'threshold', CAST({r!r} AS DOUBLE),"
                f" 'violations', CAST(__total - __n{i} AS BIGINT),"
                f" 'passed', CAST(__n{i} AS DOUBLE) / greatest(__total, 1)"
                f" >= {r!r}D)"
            )
        elif kind == "unique":
            if isinstance(c, str):
                label, cnt_of = c, f"`{c}`"
            else:
                label = "(" + ", ".join(c) + ")"
                struct = "named_struct(" + ", ".join(
                    f"'f{j}', `{cc}`" for j, cc in enumerate(c)
                ) + ")"
                non_null = " AND ".join(f"`{cc}` IS NOT NULL" for cc in c)
                cnt_of = f"CASE WHEN {non_null} THEN {struct} END"
            aggs.append(f"count({cnt_of}) AS __n{i}")
            aggs.append(f"count(DISTINCT {cnt_of}) AS __d{i}")
            rows.append(
                f"named_struct('constraint', 'unique', 'column', '{label}',"
                f" 'metric', CAST(__n{i} - __d{i} AS DOUBLE),"
                f" 'threshold', CAST(0.0 AS DOUBLE),"
                f" 'violations', CAST(__n{i} - __d{i} AS BIGINT),"
                f" 'passed', __n{i} = __d{i})"
            )
        elif kind == "in_set":
            vals = ", ".join(qs(str(v)) for v in spec["values"])
            bad = (
                f"sum(CASE WHEN `{c}` IS NOT NULL AND"
                f" CAST(`{c}` AS STRING) NOT IN ({vals}) THEN 1 ELSE 0 END)"
            )
            aggs.append(f"{bad} AS __v{i}")
            rows.append(
                f"named_struct('constraint', 'in_set', 'column', '{c}',"
                f" 'metric', CAST(__v{i} AS DOUBLE),"
                f" 'threshold', CAST(0.0 AS DOUBLE),"
                f" 'violations', CAST(__v{i} AS BIGINT),"
                f" 'passed', __v{i} = 0)"
            )
        elif kind == "range":
            conds = []
            if spec.get("min") is not None:
                conds.append(f"CAST(`{c}` AS DOUBLE) < {float(spec['min'])!r}D")
            if spec.get("max") is not None:
                conds.append(f"CAST(`{c}` AS DOUBLE) > {float(spec['max'])!r}D")
            if not conds:
                raise ValueError(f"range constraint needs min and/or max: {spec}")
            bad = (
                f"sum(CASE WHEN `{c}` IS NOT NULL AND ({' OR '.join(conds)})"
                " THEN 1 ELSE 0 END)"
            )
            aggs.append(f"{bad} AS __v{i}")
            rows.append(
                f"named_struct('constraint', 'range', 'column', '{c}',"
                f" 'metric', CAST(__v{i} AS DOUBLE),"
                f" 'threshold', CAST(0.0 AS DOUBLE),"
                f" 'violations', CAST(__v{i} AS BIGINT),"
                f" 'passed', __v{i} = 0)"
            )
        elif kind == "implication":
            a, b = spec["if_column"], spec["then_column"]
            bad = (
                f"sum(CASE WHEN `{a}` IS NOT NULL AND `{b}` IS NULL"
                " THEN 1 ELSE 0 END)"
            )
            aggs.append(f"{bad} AS __v{i}")
            rows.append(
                f"named_struct('constraint', 'implication',"
                f" 'column', '{a} -> {b}',"
                f" 'metric', CAST(__v{i} AS DOUBLE),"
                f" 'threshold', CAST(0.0 AS DOUBLE),"
                f" 'violations', CAST(__v{i} AS BIGINT),"
                f" 'passed', __v{i} = 0)"
            )
        elif kind == "min_rows":
            n = int(spec["count"])
            rows.append(
                f"named_struct('constraint', 'min_rows', 'column', '*',"
                f" 'metric', CAST(__total AS DOUBLE),"
                f" 'threshold', CAST({float(n)!r} AS DOUBLE),"
                f" 'violations', CAST(CASE WHEN __total < {n} THEN 1 ELSE 0 END"
                f" AS BIGINT),"
                f" 'passed', __total >= {n})"
            )
        else:
            raise ValueError(f"unknown constraint type: {spec!r}")
    wide = df.groupBy().agg(*[F.expr(a) for a in aggs])
    out = wide.selectExpr(f"inline(array({', '.join(rows)}))")
    return out.unionByName(fd) if fd is not None else out


def check_referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_col: str,
    parent_col: str,
) -> DataFrame:
    """Foreign-key check: count child rows whose non-null key has no
    parent — a LEFT ANTI join against the parent's distinct keys (the
    distinct side is usually broadcast-able; at scale both sides shuffle
    on the key, never wider than (key) columns).

    Output (one row): ``constraint, column, metric, threshold,
    violations, passed`` — the ``check_constraints`` row shape, so suite
    results union cleanly.
    """
    ensure_safe_columns([child_col, parent_col])
    keys = parent.select(F.col(parent_col).alias(child_col)).where(
        F.col(child_col).isNotNull()
    ).distinct()
    orphans = (
        child.select(child_col)
        .where(F.col(child_col).isNotNull())
        .join(keys, child_col, "left_anti")
        .groupBy()
        .agg(F.expr("count(1) AS __v"))
    )
    return orphans.selectExpr(
        "inline(array(named_struct("
        f"'constraint', 'foreign_key', 'column', '{child_col}',"
        " 'metric', CAST(__v AS DOUBLE), 'threshold', CAST(0.0 AS DOUBLE),"
        " 'violations', CAST(__v AS BIGINT), 'passed', __v = 0)))"
    )


def check_embedding_constraints(
    df: DataFrame,
    embedding_col: str = "embedding",
    dim: int | None = None,
    max_null_ratio: float = 0.0,
    norm_min: float | None = None,
    norm_max: float | None = None,
    max_zero_norm_ratio: float = 0.0,
) -> DataFrame:
    """The acceptance gate for a VECTOR column — what ``check_constraints``
    is to scalars: before an embedding batch feeds ANN indexing /
    clustering / drift scoring, verify it is structurally sound. Checks
    (all from ONE wide aggregate over one narrow map):

    - ``embedding_completeness`` — NULL-vector share <= ``max_null_ratio``;
    - ``embedding_dim`` — every non-null vector has exactly ``dim``
      elements (skipped when ``dim`` is None);
    - ``embedding_element_nulls`` — no non-null vector carries NULL
      elements (the silently-poisoned-cosine case);
    - ``embedding_zero_norm`` — zero-norm share (no direction — every
      cosine consumer NULLs them) <= ``max_zero_norm_ratio``;
    - ``embedding_norm_range`` — norms inside [``norm_min``,
      ``norm_max``] (skipped when both None; an un-normalized batch
      from the wrong encoder version is the classic failure).

    Output rows in the :func:`check_constraints` shape (``constraint,
    column, metric, threshold, violations, passed``), so vector and
    scalar gates union into one suite result.
    """
    ensure_safe_columns([embedding_col])
    e = f"CAST(`{embedding_col}` AS ARRAY<DOUBLE>)"
    wellformed = (
        f"{e} IS NOT NULL"
        + (f" AND size({e}) = {int(dim)}" if dim is not None else "")
        + f" AND NOT exists({e}, __x -> __x IS NULL)"
    )
    norm = f"sqrt(aggregate({e}, 0.0D, (s, x) -> s + x * x))"
    flags = df.selectExpr(
        f"CAST({e} IS NULL AS INT) AS __null",
        f"CAST({e} IS NOT NULL AND size({e}) != {int(dim)} AS INT)"
        " AS __baddim"
        if dim is not None
        else "CAST(0 AS INT) AS __baddim",
        f"CAST({e} IS NOT NULL AND exists({e}, __x -> __x IS NULL)"
        " AS INT) AS __elnull",
        f"CAST({wellformed} AND {norm} = 0.0D AS INT) AS __zeronorm",
        f"CASE WHEN {wellformed} AND {norm} > 0.0D THEN {norm} END"
        " AS __norm",
    )
    nmin = "NULL" if norm_min is None else f"{float(norm_min)!r}D"
    nmax = "NULL" if norm_max is None else f"{float(norm_max)!r}D"
    agg = flags.groupBy().agg(
        F.expr("CAST(count(1) AS BIGINT) AS __n"),
        F.expr("CAST(sum(__null) AS BIGINT) AS __nulls"),
        F.expr("CAST(sum(__baddim) AS BIGINT) AS __baddims"),
        F.expr("CAST(sum(__elnull) AS BIGINT) AS __elnulls"),
        F.expr("CAST(sum(__zeronorm) AS BIGINT) AS __zeros"),
        F.expr(
            f"CAST(sum(CASE WHEN __norm IS NOT NULL AND"
            f" (({nmin} IS NOT NULL AND __norm < {nmin}) OR"
            f" ({nmax} IS NOT NULL AND __norm > {nmax}))"
            " THEN 1 ELSE 0 END) AS BIGINT) AS __badnorms"
        ),
    )
    rows = [
        ("'embedding_completeness'",
         "__nulls / greatest(CAST(__n AS DOUBLE), 1.0D)",
         f"{float(max_null_ratio)!r}D", "__nulls",
         f"__nulls / greatest(CAST(__n AS DOUBLE), 1.0D)"
         f" <= {float(max_null_ratio)!r}D"),
        ("'embedding_element_nulls'", "CAST(__elnulls AS DOUBLE)",
         "0.0D", "__elnulls", "__elnulls = 0"),
        ("'embedding_zero_norm'",
         "__zeros / greatest(CAST(__n - __nulls AS DOUBLE), 1.0D)",
         f"{float(max_zero_norm_ratio)!r}D", "__zeros",
         f"__zeros / greatest(CAST(__n - __nulls AS DOUBLE), 1.0D)"
         f" <= {float(max_zero_norm_ratio)!r}D"),
    ]
    if dim is not None:
        rows.insert(1, ("'embedding_dim'", "CAST(__baddims AS DOUBLE)",
                        "0.0D", "__baddims", "__baddims = 0"))
    if norm_min is not None or norm_max is not None:
        rows.append(("'embedding_norm_range'",
                     "CAST(__badnorms AS DOUBLE)", "0.0D", "__badnorms",
                     "__badnorms = 0"))
    structs = ", ".join(
        f"named_struct('constraint', {c}, 'column', '{embedding_col}',"
        f" 'metric', CAST({m} AS DOUBLE),"
        f" 'threshold', CAST({t} AS DOUBLE),"
        f" 'violations', CAST({v} AS BIGINT), 'passed', {p})"
        for c, m, t, v, p in rows
    )
    return agg.selectExpr(f"inline(array({structs}))")


def check_rollup_consistency(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
    parent_col: str,
    child_agg_expr: str,
    tolerance: float = 0.01,
) -> DataFrame:
    """Cross-table AGGREGATE consistency: does the parent's denormalized
    column equal the rollup of its children (``o_totalprice`` vs the sum
    of its lineitems' extended prices)? The reconciliation check every
    warehouse runs between a fact table and its pre-aggregated summary —
    drift detectors catch distribution moves, this catches the pipeline
    writing the two tables from diverging logic.

    ``child_agg_expr`` is a SQL aggregate over the child frame's columns
    (e.g. ``"sum(l_extendedprice * (1 - l_discount))"``). Keys compare
    null-safely; a parent key absent from the child (or vice versa)
    counts separately from a value mismatch. A pair matches when
    ``|parent - rollup| <= tolerance``; a NULL on either side of a
    compared pair is a mismatch (it contributes no magnitude).

    Output (one row): key/match/mismatch/orphan counts plus the
    mismatch magnitudes (``max_abs_diff``, ``mean_abs_diff`` over the
    MISMATCHED pairs — over all pairs they'd round to the tolerance). Plan: ONE keyed aggregate over the child (map-side
    partials), one full-outer join on the key — Spark co-partitions
    both sides on the same key the aggregate just produced — and one
    O(1)-row summary aggregate. Nothing wider than (key, value) ever
    shuffles.
    """
    ensure_safe_columns([parent_key, child_key, parent_col])
    if tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    rollup = (
        child.groupBy(F.col(child_key).alias("__ck"))
        .agg(F.expr(f"CAST(({child_agg_expr}) AS DOUBLE) AS __rollup"))
        .withColumn("__has_c", F.lit(True))
    )
    par = parent.select(
        F.col(parent_key).alias("__pk"),
        F.expr(f"CAST(`{parent_col}` AS DOUBLE) AS __pv"),
        F.lit(True).alias("__has_p"),
    )
    joined = par.join(
        rollup, F.expr("__pk <=> __ck"), "full_outer"
    )
    return joined.selectExpr(
        "CAST(__has_p AS INT) AS p",
        "CAST(__has_c AS INT) AS c",
        "__pv",
        "__rollup",
        f"CASE WHEN __has_p AND __has_c THEN"
        f" CAST(coalesce(abs(__pv - __rollup) <= {float(tolerance)!r}D,"
        " FALSE) AS INT)"
        " END AS ok",
        "CASE WHEN __has_p AND __has_c THEN abs(__pv - __rollup)"
        " END AS ad",
    ).groupBy().agg(
        F.expr("CAST(sum(coalesce(p, 0)) AS BIGINT) AS n_parent"),
        F.expr("CAST(sum(coalesce(c, 0)) AS BIGINT) AS n_child_keys"),
        F.expr("CAST(sum(CASE WHEN ok = 1 THEN 1 ELSE 0 END) AS BIGINT)"
               " AS n_matched"),
        F.expr("CAST(sum(CASE WHEN ok = 0 THEN 1 ELSE 0 END) AS BIGINT)"
               " AS n_mismatched"),
        F.expr("CAST(sum(CASE WHEN p = 1 AND c IS NULL THEN 1 ELSE 0 END)"
               " AS BIGINT) AS n_parent_only"),
        F.expr("CAST(sum(CASE WHEN c = 1 AND p IS NULL THEN 1 ELSE 0 END)"
               " AS BIGINT) AS n_child_only"),
        F.expr("max(CASE WHEN ok = 0 THEN ad END) AS max_abs_diff"),
        F.expr("avg(CASE WHEN ok = 0 THEN ad END) AS mean_abs_diff"),
    ).selectExpr(
        "*",
        "n_mismatched = 0 AND n_parent_only = 0 AND n_child_only = 0"
        " AS consistent",
    )


def rollup_mismatch_topk(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
    parent_col: str,
    child_agg_expr: str,
    k: int = 20,
    tolerance: float = 0.01,
) -> DataFrame:
    """The drill-down beside :func:`check_rollup_consistency`'s summary:
    the ``k`` keys whose parent value and child rollup disagree the
    MOST — what an on-call engineer actually opens. Compared pairs
    only (orphans carry no magnitude; the summary counts them); ties
    break to the smallest key. Top-k is a heap
    (``TakeOrderedAndProject``), never a global sort.
    """
    ensure_safe_columns([parent_key, child_key, parent_col])
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    rollup = child.groupBy(F.col(child_key).alias("__ck")).agg(
        F.expr(f"CAST(({child_agg_expr}) AS DOUBLE) AS __rollup")
    )
    par = parent.select(
        F.col(parent_key).alias("__pk"),
        F.expr(f"CAST(`{parent_col}` AS DOUBLE) AS __pv"),
    )
    return (
        par.join(rollup, F.expr("__pk <=> __ck"), "inner")
        .selectExpr(
            "__pk AS key",
            "__pv AS parent_value",
            "__rollup AS rollup_value",
            "abs(__pv - __rollup) AS abs_diff",
        )
        .filter(f"abs_diff > {float(tolerance)!r}D")
        .orderBy(F.col("abs_diff").desc(), F.col("key").asc())
        .limit(int(k))
    )


def check_functional_dependencies(
    df: DataFrame,
    dependencies: list[tuple],
) -> DataFrame:
    """Functional-dependency checks: does ``X -> y`` hold — i.e. does every
    distinct value (tuple) of the determinant column(s) ``X`` map to at
    most ONE distinct non-null value of ``y``?  The constraint behind
    "zip determines city" / "order determines customer" invariants that
    silently break when an upstream join starts fanning out.

    ``dependencies``: list of ``(determinant, dependent)`` where
    ``determinant`` is a column name or list of column names.  NULL
    determinant components participate as a real key (coalesced to a
    sentinel so composite keys stay unambiguous); NULL dependents are
    ignored (an unknown ``y`` violates nothing).

    Scale shape: all dependencies share ONE scan — each row emits one
    ``(dep_id, determinant-key, y)`` cell per dependency (``inline``), a
    single ``groupBy(dep_id, key)`` counts distinct dependents per group
    (the shuffle key includes the determinant, so no hot reducer), and a
    tiny ``groupBy(dep_id)`` rolls groups up.  Output one row per
    dependency: ``constraint, column, metric`` (violating-group share),
    ``threshold, violations`` (rows in violating groups), ``passed`` —
    the ``check_constraints`` row shape, so suite results union cleanly.
    """
    if not dependencies:
        raise ValueError("no dependencies")
    deps = [
        ([x] if isinstance(x, str) else list(x), y) for x, y in dependencies
    ]
    ensure_safe_columns([c for x, y in deps for c in [*x, y]])
    sep, nul = "\\u001f", "\\u0001<null>"
    cells = []
    for i, (xcols, y) in enumerate(deps):
        key = ", ".join(
            f"coalesce(CAST(`{c}` AS STRING), '{nul}')" for c in xcols
        )
        cells.append(
            f"named_struct('dep_id', {i}, 'key', concat_ws('{sep}', {key}),"
            f" 'y', CAST(`{y}` AS STRING))"
        )
    grouped = (
        df.selectExpr(f"inline(array({', '.join(cells)}))")
        .groupBy("dep_id", "key")
        .agg(
            F.expr("count(DISTINCT y) AS n_y"),
            F.expr("count(y) AS n_rows"),
        )
    )
    per_dep = grouped.groupBy("dep_id").agg(
        F.expr("count(1) AS n_groups"),
        F.expr("sum(CAST(n_y > 1 AS BIGINT)) AS violating_groups"),
        F.expr("sum(CASE WHEN n_y > 1 THEN n_rows ELSE 0 END) AS violating_rows"),
    )
    labels = ", ".join(
        f"named_struct('dep_id', {i}, 'column',"
        + qs("(" + ", ".join(x) + ") -> " + y)
        + ")"
        for i, (x, y) in enumerate(deps)
    )
    lab = per_dep.sparkSession.range(1).selectExpr(
        f"inline(array({labels}))"
    )
    return per_dep.join(F.broadcast(lab), "dep_id").selectExpr(
        "'functional_dependency' AS constraint",
        "column",
        "CAST(violating_groups AS DOUBLE) / greatest(n_groups, 1) AS metric",
        "CAST(0.0 AS DOUBLE) AS threshold",
        "CAST(violating_rows AS BIGINT) AS violations",
        "violating_groups = 0 AS passed",
    )


def k_anonymity_profile(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    max_buckets: int = 30,
) -> DataFrame:
    """Re-identification risk profile over a quasi-identifier set
    (Sweeney's k-anonymity): every row falls into the equivalence class
    of rows sharing its ``quasi_cols`` values; rows in classes smaller
    than ``k`` are re-identifiable to within ``class_size`` candidates —
    the governance check a pipeline runs BEFORE releasing a dataset the
    way it runs ``pii_scrub`` before training.

    Output: one row per power-of-two class-size bucket (1, 2, 3-4, 5-8,
    …, capped at ``max_buckets`` buckets) with ``class_size_lo/hi,
    n_classes, n_rows, row_share``, plus an at-risk summary row
    (``class_size_lo`` NULL, ``class_size_hi = k-1``) whose ``n_rows``
    counts rows in classes below ``k`` (``row_share`` = the at-risk
    fraction; ``n_classes`` = classes below ``k``). NULLs in
    quasi-identifiers group together (NULL birthdate is itself a
    disclosure class).

    Plan: ONE groupBy on the quasi-identifier tuple (high-cardinality,
    map-side combined — the whole point is that classes are small), then
    O(classes) rows reduce into O(log n) buckets. Nothing wide survives
    the first aggregate, so the profile holds at any scale.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    ensure_safe_columns(quasi_cols)
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    classes = df.selectExpr(*[f"`{c}`" for c in quasi_cols]).groupBy(
        *quasi_cols
    ).agg(F.expr("CAST(count(1) AS BIGINT) AS n"))
    # bucket = floor(log2(n)): 1, 2, 3-4, 5-8, ... (clamped). ONE pass
    # over the (potentially huge) class table: aggregate per
    # (bucket, at-risk) cell — risk can split inside a bucket when k is
    # not a power of two — then derive the histogram AND the risk
    # summary from the eagerly-checkpointed O(buckets) cell frame
    # (deriving both straight from `classes` would re-run the
    # quasi-identifier groupBy, Spark re-instantiating per reference).
    cells = classes.selectExpr(
        f"least(CAST(floor(log2(n)) AS INT), {int(max_buckets) - 1}) AS b",
        f"n < {int(k)} AS at_risk",
        "n",
    ).groupBy("b", "at_risk").agg(
        F.expr("CAST(count(1) AS BIGINT) AS n_classes"),
        F.expr("CAST(sum(n) AS BIGINT) AS n_rows"),
    ).localCheckpoint(eager=True)
    bucketed = cells.groupBy("b").agg(
        F.expr("CAST(sum(n_classes) AS BIGINT) AS n_classes"),
        F.expr("CAST(sum(n_rows) AS BIGINT) AS n_rows"),
    )
    total = cells.agg(
        F.expr("CAST(coalesce(sum(n_rows), 0) AS BIGINT) AS total_rows"),
        F.expr("CAST(coalesce(sum(CASE WHEN at_risk THEN n_classes END), 0)"
               " AS BIGINT) AS risk_classes"),
        F.expr("CAST(coalesce(sum(CASE WHEN at_risk THEN n_rows END), 0)"
               " AS BIGINT) AS risk_rows"),
    )
    buckets = bucketed.crossJoin(F.broadcast(total)).selectExpr(
        "CAST(pow(2, b) AS BIGINT) AS class_size_lo",
        "CAST(pow(2, b + 1) - 1 AS BIGINT) AS class_size_hi",
        "n_classes",
        "n_rows",
        "n_rows / CAST(total_rows AS DOUBLE) AS row_share",
    )
    summary = total.selectExpr(
        "CAST(NULL AS BIGINT) AS class_size_lo",
        f"CAST({int(k) - 1} AS BIGINT) AS class_size_hi",
        "risk_classes AS n_classes",
        "risk_rows AS n_rows",
        "risk_rows / CAST(total_rows AS DOUBLE) AS row_share",
    )
    return buckets.unionByName(summary)


def l_diversity_profile(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Distinct-l-diversity companion to :func:`k_anonymity_profile`
    (Machanavajjhala et al.): a k-anonymous equivalence class still
    discloses the sensitive attribute when every member SHARES it —
    homogeneity attack. Per distinct-sensitive-count ``d``: how many
    quasi-identifier classes carry exactly ``d`` distinct sensitive
    values and how many rows they hold, plus the below-``l`` at-risk
    summary row (``diversity`` NULL, ``n_classes``/``n_rows``/
    ``row_share`` of rows whose class has fewer than ``l`` distinct
    sensitive values). NULL sensitive values count as one disclosure
    value; NULL quasi-identifiers group together.

    Plan: one groupBy on ``(quasi..., sensitive)`` (map-side combined),
    re-aggregated per class, then O(classes) rows reduce to O(distinct
    diversities) — nothing wide survives the first aggregate.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    ensure_safe_columns(quasi_cols + [sensitive_col])
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    # two-level aggregation: (QI, sensitive) cells first, so a class with
    # millions of rows but few sensitive values never buffers its rows
    cells = df.selectExpr(
        *[f"`{c}`" for c in quasi_cols], f"`{sensitive_col}`"
    ).groupBy(*quasi_cols, sensitive_col).agg(
        F.expr("CAST(count(1) AS BIGINT) AS n")
    )
    classes = cells.groupBy(*quasi_cols).agg(
        F.expr("CAST(count(1) AS BIGINT) AS diversity"),
        F.expr("CAST(sum(n) AS BIGINT) AS n_rows"),
    )
    # ONE pass over the class table (risk = diversity < l is a function
    # of the per_d key, so totals derive from the checkpointed O(distinct
    # diversities) frame instead of re-running the class aggregation)
    per_d = classes.groupBy("diversity").agg(
        F.expr("CAST(count(1) AS BIGINT) AS n_classes"),
        F.expr("CAST(sum(n_rows) AS BIGINT) AS n_rows"),
    ).localCheckpoint(eager=True)
    total = per_d.agg(
        F.expr("CAST(coalesce(sum(n_rows), 0) AS BIGINT) AS total_rows"),
        F.expr(f"CAST(coalesce(sum(CASE WHEN diversity < {int(l)}"
               " THEN n_classes END), 0) AS BIGINT) AS risk_classes"),
        F.expr(f"CAST(coalesce(sum(CASE WHEN diversity < {int(l)}"
               " THEN n_rows END), 0) AS BIGINT) AS risk_rows"),
    )
    rows = per_d.crossJoin(F.broadcast(total)).selectExpr(
        "diversity",
        "n_classes",
        "n_rows",
        "n_rows / CAST(total_rows AS DOUBLE) AS row_share",
    )
    summary = total.selectExpr(
        "CAST(NULL AS BIGINT) AS diversity",
        "risk_classes AS n_classes",
        "risk_rows AS n_rows",
        "risk_rows / CAST(total_rows AS DOUBLE) AS row_share",
    )
    return rows.unionByName(summary)


def t_closeness_profile(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.1,
    n_buckets: int = 20,
) -> DataFrame:
    """Attribute-disclosure companion to :func:`k_anonymity_profile` and
    :func:`l_diversity_profile` (Li, Li & Venkatasubramanian's
    t-closeness): an l-diverse class still leaks when its sensitive
    distribution is far from the table-wide one (skewness attack — a
    class that is 90% one diagnosis discloses it even with 3 distinct
    values present). Per class, the total-variation distance (the
    equal-ground-distance earth-mover's distance for categorical
    sensitive attributes) between the class's sensitive distribution and
    the global distribution:

        tvd = 0.5 * sum_v |p_class(v) - p_global(v)|

    Output: one row per fixed-width tvd bucket (width ``1/n_buckets``)
    with ``tvd_lo, tvd_hi, n_classes, n_rows, row_share``, plus an
    at-risk summary row (``tvd_lo`` NULL, ``tvd_hi = t``) counting
    classes/rows with ``tvd >= t``. ``t`` must be a multiple of the
    bucket width so the at-risk cut is a bucket boundary. NULL sensitive
    values are one disclosure value; NULL quasi-identifiers group
    together.

    Exactness: bucketing never touches floating point. With class total
    ``A``, table total ``G``, cell count ``a`` and global count ``g``,

        tvd = [ sum_cells |a*G - g*A| + (G - sum_cells g) * A ] / (2*A*G)

    (absent sensitive values contribute their full global share, hence
    the ``(G - sum g)`` completion term — the class never needs
    densifying). The numerator and denominator are integers, carried as
    DECIMAL(38,0) so products stay exact past BIGINT range (G, A up to
    ~1e12 rows → products ≤ ~1e25 « 1e38), and the bucket index is an
    exact integral division ``(num * n_buckets) div (2*A*G)`` — the same
    rational arithmetic any SQL engine replays bit-for-bit.

    Plan: groupBy (QI, sensitive) cells (map-side combined), re-agg per
    class, one BROADCAST join of the O(distinct sensitive) global
    frequency table onto the cells, then O(classes) rows reduce into
    O(n_buckets). Nothing wide survives the first aggregate.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    ensure_safe_columns(quasi_cols + [sensitive_col])
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if not 0 < t <= 1:
        raise ValueError(f"t must be in (0, 1], got {t}")
    units = t * n_buckets
    if abs(units - round(units)) > 1e-9:
        raise ValueError(
            f"t={t} must be a multiple of the bucket width 1/{n_buckets}"
        )
    units = int(round(units))
    nb = int(n_buckets)
    dec = "DECIMAL(38,0)"
    qc = ", ".join(f"`{c}`" for c in quasi_cols)
    qi_eq = " AND ".join(f"c.`{c}` <=> tc.`{c}`" for c in quasi_cols)
    # One spark.sql CTE query rather than chained DataFrame joins: the
    # plan self-joins `cells` twice (global frequencies, class totals)
    # and Spark 4.1's DataFrame self-join dedup + resolution-through-
    # Window makes later same-named references ambiguous
    # (AMBIGUOUS_REFERENCE on the deduplicated branch's inner attrs).
    # SQL-side CTE references carry no cross-branch attr ids, and the
    # <=> joins keep NULL QI / NULL sensitive classes intact.
    #
    # The (QI, sensitive) cell aggregate — the ONLY corpus-scale pass —
    # is computed once and persisted; Spark re-instantiates a CTE per
    # reference, so leaving it inline would re-scan and re-shuffle the
    # corpus three times. The counts-mode convention (distribution.py):
    # persist the intermediate, eagerly checkpoint the O(n_buckets)
    # result, release the cache before returning.
    cells_df = (
        df.selectExpr(*[f"`{c}`" for c in quasi_cols],
                      f"`{sensitive_col}` AS __tc_s")
        .groupBy(*quasi_cols, "__tc_s")
        .agg(F.expr("CAST(count(1) AS BIGINT) AS __tc_a"))
        .persist()
    )
    query = f"""
    WITH cells AS (SELECT * FROM {{src}}),
    glob AS (
      SELECT __tc_s, CAST(sum(__tc_a) AS BIGINT) AS g FROM cells GROUP BY __tc_s),
    gtot AS (SELECT CAST(sum(g) AS BIGINT) AS g_total FROM glob),
    class_totals AS (
      SELECT {qc}, CAST(sum(__tc_a) AS BIGINT) AS class_n
      FROM cells GROUP BY {qc}),
    per_cell AS (
      SELECT /*+ BROADCAST(gl) */
        {', '.join(f'c.`{q}`' for q in quasi_cols)},
        abs(CAST(c.__tc_a AS {dec}) * CAST(gt.g_total AS {dec})
            - CAST(gl.g AS {dec}) * CAST(tc.class_n AS {dec})) AS term,
        gl.g AS g, tc.class_n AS class_n, gt.g_total AS g_total
      FROM cells c
      JOIN glob gl ON c.__tc_s <=> gl.__tc_s
      CROSS JOIN gtot gt
      JOIN class_totals tc ON {qi_eq}),
    cls AS (
      SELECT
        CAST(sum(term) AS {dec})
          + (CAST(max(g_total) AS {dec}) - CAST(sum(g) AS {dec}))
            * CAST(max(class_n) AS {dec}) AS num,
        CAST(max(class_n) AS {dec}) AS class_n,
        CAST(max(g_total) AS {dec}) AS g_total
      FROM per_cell GROUP BY {qc}),
    b AS (
      SELECT
        least(CAST((num * {nb})
                   div (CAST(2 AS {dec}) * class_n * g_total) AS BIGINT),
              {nb - 1}) AS b,
        class_n
      FROM cls),
    bucketed AS (
      SELECT b, CAST(count(1) AS BIGINT) AS n_classes,
        CAST(sum(class_n) AS BIGINT) AS n_rows
      FROM b GROUP BY b),
    tot AS (
      SELECT CAST(sum(class_n) AS BIGINT) AS total_rows,
        CAST(sum(CASE WHEN b >= {units} THEN 1 ELSE 0 END) AS BIGINT)
          AS risk_classes,
        CAST(sum(CASE WHEN b >= {units} THEN class_n ELSE 0 END) AS BIGINT)
          AS risk_rows
      FROM b)
    SELECT CAST(b AS DOUBLE) / {nb} AS tvd_lo,
      CAST(b + 1 AS DOUBLE) / {nb} AS tvd_hi,
      n_classes, n_rows,
      n_rows / CAST(total_rows AS DOUBLE) AS row_share
    FROM bucketed CROSS JOIN tot
    UNION ALL
    SELECT CAST(NULL AS DOUBLE), CAST({units} AS DOUBLE) / {nb},
      risk_classes, risk_rows,
      risk_rows / CAST(total_rows AS DOUBLE)
    FROM tot"""
    out = df.sparkSession.sql(query, src=cells_df).localCheckpoint(
        eager=True
    )
    cells_df.unpersist(blocking=False)
    return out


def dp_release(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dp",
    value_col: str | None = None,
    clip_lo: float = 0.0,
    clip_hi: float = 1.0,
    min_noisy_count: float | None = None,
) -> DataFrame:
    """Differentially-private aggregate release — the Laplace mechanism
    over a group-by, completing the privacy family
    (:func:`k_anonymity_profile` / ``l_diversity`` / ``t_closeness``
    MEASURE re-identification risk; this operator produces the
    noise-protected aggregates one actually RELEASES).

    Per group: ``noisy_count = count + Lap(1/eps)`` and, when
    ``value_col`` is given, ``noisy_sum = clipped_sum +
    Lap(max(|lo|,|hi|)/eps)`` over values clipped to ``[clip_lo,
    clip_hi]`` (clipping bounds each row's contribution — the
    sensitivity). With both statistics the budget splits eps/2 + eps/2
    (sequential composition).

    **Noise is a keyed PRF, not an OS RNG — deliberately.** The
    Laplace variate derives per group from ``md5(group_key + seed)``
    through the inverse CDF (``-b*sign(u)*ln(1-2|u|)``, ``u in (-0.5,
    0.5)``), the same portable md5 machinery as
    ``sampling.uniform_variate`` — so releases are reproducible,
    engine-portable (the DuckDB oracle replays them bit-for-bit), and
    a re-run cannot be differenced against the first to average the
    noise away. The privacy guarantee holds under the standard PRG
    assumption PROVIDED the seed stays secret and is rotated per
    release; with a public seed this is pseudo-noise, not DP —
    documented loudly, the codec-stub honesty convention.

    ``min_noisy_count`` suppresses groups whose noisy count falls
    below the threshold — the key-release guard: publishing WHICH
    groups exist leaks membership for rare groups, so thresholded
    release is the standard practice for unbounded key domains.

    Plan: ONE groupBy over the corpus (count + conditional clipped
    sum), then O(groups) expression-only noise columns. NULL group
    values form their own group (sentinel-encoded into the PRF key so
    NULL and empty string differ).
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )
    from pyspark_data_drift_detector_spark.operators.sampling import (
        uniform_variate,
    )

    ensure_safe_columns(
        list(group_cols) + ([value_col] if value_col is not None else [])
    )
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon!r}")
    if value_col is not None and clip_hi <= clip_lo:
        raise ValueError("clip_hi must exceed clip_lo")
    n_stats = 2 if value_col is not None else 1
    eps_each = epsilon / n_stats
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\u0000"))
            for c in group_cols
        ],
    )

    def lap(tag: str, scale: float):
        u = (
            uniform_variate(key, f"{seed}|{tag}") + F.lit(0.5)
        ) / F.lit(1000000.0) - F.lit(0.5)
        return (
            F.lit(-scale)
            * F.signum(u)
            * F.log(F.lit(1.0) - 2.0 * F.abs(u))
        )

    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    if value_col is not None:
        clipped = F.least(
            F.greatest(F.col(value_col).cast("double"), F.lit(clip_lo)),
            F.lit(clip_hi),
        )
        aggs.append(F.sum(clipped).alias("__s"))
    grouped = df.groupBy(*group_cols).agg(*aggs)
    out_cols = [*group_cols]
    out = grouped.withColumn(
        "noisy_count", F.col("__n") + lap("c", 1.0 / eps_each)
    )
    out_cols.append("noisy_count")
    if value_col is not None:
        sens = max(abs(clip_lo), abs(clip_hi))
        out = out.withColumn(
            "noisy_sum", F.col("__s") + lap("s", sens / eps_each)
        )
        out_cols.append("noisy_sum")
    if min_noisy_count is not None:
        out = out.filter(F.col("noisy_count") >= min_noisy_count)
    return out.select(*out_cols)
