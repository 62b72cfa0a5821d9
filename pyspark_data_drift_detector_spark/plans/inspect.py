"""Physical-plan inspection helpers.

Used by tests (and operators' authors) to assert the plans we designed for
are the plans we get: filters pushed to the parquet scan, column pruning in
``ReadSchema``, whole-stage codegen coverage, and shuffle counts. At 100 TB
these properties ARE the performance model — a scan that reads all columns
for a 2-column projection, or an extra shuffle, is a regression even when
small-scale tests stay green (SURVEY §4).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the columns actually read."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators in the optimized physical plan."""
    plan = simple_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def count_scans(df: DataFrame) -> int:
    return len(re.findall(r"Scan parquet|FileScan parquet|BatchScan", simple_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans — wider is better (fewer breaks).

    The simple plan marks codegen'd operators with ``*(N)``; the formatted
    plan uses ``WholeStageCodegen (N)`` — count either. NOTE: under AQE the
    markers only appear in the FINAL plan — run an action on the DataFrame
    first, then call this.
    """
    plan = simple_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df)))
    return len(ids)


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    filters = pushed_filters(df)
    assert any(fragment.lower() in f.lower() for f in filters), (
        f"expected a pushed filter containing {fragment!r}; got {filters}"
    )


def assert_column_pruned(df: DataFrame, absent_column: str) -> None:
    schemas = read_schemas(df)
    assert schemas, "no file scans found in plan"
    assert all(absent_column not in s for s in schemas), (
        f"column {absent_column!r} should be pruned from scans; ReadSchemas: {schemas}"
    )


def sorted_window_partition_arities(df: DataFrame) -> list[int]:
    """For every Window operator with a non-empty ORDER BY, the number of
    PARTITION BY expressions.

    A sorted window partitioned on a single low-cardinality key (e.g.
    ``column_name``) funnels every row of that key through ONE task — the
    100 TB cumulative-sum cliff. The distributed prefix-sum paths must show
    arity ≥ 2 (key + range bucket) on any window that sees per-value cells.

    Window nodes print as ``Window [fns...], [partition exprs], [sort
    exprs]``; partition exprs here are plain attributes, so a comma count
    is a safe arity measure.
    """
    return [a for a, _ in sorted_windows(df)]


def sorted_windows(df: DataFrame) -> list[tuple[int, str]]:
    """(partition arity, sort-expression text) for each sorted Window."""
    out: list[tuple[int, str]] = []
    for line in simple_plan(df).splitlines():
        m = re.search(r"Window (.*), \[([^\]]*)\], \[([^\]]*)\]\s*$", line)
        if m and m.group(3).strip():
            parts = [p for p in m.group(2).split(",") if p.strip()]
            out.append((len(parts), m.group(3)))
    return out


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    actual = count_shuffles(df)
    assert actual <= n, f"expected ≤{n} shuffles, plan has {actual}:\n{simple_plan(df)[:2000]}"


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's plan-time size estimate for ``df`` (bytes).

    Driver-side only — reads the optimized plan's statistics (propagated
    from file-scan sizes), runs no job. Estimates after joins/aggregates
    are conservative (they tend to over-estimate), which is the safe
    direction for callers gating a skew-safety stage on "could this be
    big?". Returns a large sentinel on any failure so callers fail toward
    the scale-safe path.
    """
    size = try_estimated_size_bytes(df)
    return size if size is not None else 1 << 60


def try_estimated_size_bytes(df: DataFrame) -> int | None:
    """Like :func:`estimated_size_bytes` but returns ``None`` when the
    estimate is unavailable, letting callers pick their own failure
    direction: skew gates fail toward "big" (stay safe), while the
    under-split fan-out fails toward "small" (repartition — skipping it
    would single-thread the explode stage it exists to protect)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - py4j/internal API drift
        return None
