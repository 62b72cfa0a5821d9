"""Mimics the driver's t2 gate: every queries() entry vs its DuckDB oracle.

Runs at the test scale factor (sf0.001 by default for speed; the driver
runs sf0.01). Compares row count, sorted column names, and values
(order-insensitive).
"""

from __future__ import annotations

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows, columns):
    """Sort columns by name, then rows; stringify with float rounding."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                out.append(f"b:{v}")
            elif isinstance(v, float):
                if math.isnan(v):
                    out.append("f:nan")
                else:
                    out.append(f"f:{round(v, 9):.9f}")
            elif v is None:
                out.append("∅")
            else:
                out.append(f"{type(v).__name__[0]}:{v}")
        return tuple(out)

    return sorted(key(r) for r in rows)


@pytest.fixture(scope="module")
def oracles():
    # built ONCE: oracle_sql() assembles ~240 large SQL strings (some via
    # numpy parameter generators) — rebuilding it per parametrized test
    # added minutes to the suite
    return entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(name, spark, sf_dir, duck, oracles):
    if name not in oracles:
        pytest.skip(f"{name} is rows-only (no oracle)")
    sdf = entry_mod.queries()[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    # a hash-match over zero rows proves nothing (the round-1
    # embedding_neardup lesson): non-vacuousness rides the rows this
    # test already collected, so test_query_not_vacuous below only has
    # to re-execute the rows-only queries that have no oracle
    assert spark_rows, f"{name} returns 0 rows at {sf_dir} — vacuous oracle check"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    left = _normalize(spark_rows, spark_cols)
    right = _normalize(duck_rows, duck_cols)
    mismatches = [(l, r) for l, r in zip(left, right) if l != r]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "drift_score" in df.columns


_ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_query_not_vacuous(name, spark, sf_dir):
    """A hash-match over zero rows proves nothing (the round-1
    embedding_neardup lesson): every harness query must produce rows at
    test scale. Oracled queries get this assertion inside
    test_query_matches_oracle (which already collects their rows — the
    separate pass re-executed all 241 queries, ~5 minutes of suite
    time); only the rows-only queries need their own execution here."""
    rows = entry_mod.queries()[name](spark, sf_dir).limit(1).count()
    assert rows > 0, f"{name} returns 0 rows at {sf_dir} — its oracle check is vacuous"
