"""Standalone driver-contract verification at sf0.01.

Simulates the driver's correctness gate FAITHFULLY: runs every ``queries()``
entry from ``__spark_entry__.py`` on Spark and its ``oracle_sql()`` twin in
DuckDB over the same parquet tables, converts BOTH sides to pandas the way
the driver does (``toPandas()`` / ``.df()``), canonicalizes (columns sorted
by name, rows sorted by all columns), and compares values EXACTLY —
dtype-kind-sensitively, with no float re-rounding.

This is deliberately stricter than value equality, because the driver's
hash is computed over the canonicalized pandas frame:

* DuckDB ``SUM(<integer>)`` returns HUGEINT, which ``.df()`` converts to
  **float64** — against Spark's int64 that is a driver hash mismatch even
  when every value is equal.  (Root cause of the three r5 "knife-edge"
  reds: their oracles emitted bare ``SUM(CASE...)`` columns; green queries
  used ``COUNT``.)  Fix pattern: ``CAST(SUM(...) AS BIGINT)`` in the SQL.
* List-typed result columns crash the driver's ``sort_values``
  canonicalizer (unhashable) — they crash here too, on purpose.
* Floats must be bit-comparable: both sides ROUND(x, 5) inside the query;
  this tool does NOT re-round.

Usage::

    python tools/verify_oracle.py              # all queries at sf0.01
    python tools/verify_oracle.py name1 name2  # a subset

Exit code 0 iff every compared query matches.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
# Default matches the DRIVER's parallelism (local[32]) — round 6 shipped a
# red (`rollup_timeseries`) that passed at 8 CPUs and failed at 32 because
# float partial-sum order differs with partition count.  Local green must
# imply driver green, so verify at the driver's CPU count.
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# dtype kinds that may hash differently in the driver's canonicalizer
_KIND_GROUPS = {"i": "int", "u": "int", "f": "float", "b": "bool", "O": "obj", "M": "ts"}


def _canon(pdf):
    """Driver-style canonicalization: sorted columns, rows sorted by all
    columns (raises TypeError on unhashable cells, like the driver)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    try:
        a_na = a is None or (isinstance(a, float) and math.isnan(a))
        b_na = b is None or (isinstance(b, float) and math.isnan(b))
    except Exception:
        a_na = b_na = False
    if a_na or b_na:
        return a_na and b_na
    if isinstance(a, float) and isinstance(b, float):
        import struct

        return struct.pack("d", a) == struct.pack("d", b)
    return bool(a == b)


def _compare(a, b) -> str | None:
    """Return None if frames match driver-hash-exactly, else a reason."""
    import pandas as pd

    for c in a.columns:
        ka = _KIND_GROUPS.get(a[c].dtype.kind, a[c].dtype.kind)
        kb = _KIND_GROUPS.get(b[c].dtype.kind, b[c].dtype.kind)
        if ka != kb:
            return f"dtype kind differs for {c!r}: spark={a[c].dtype} oracle={b[c].dtype}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, pd.Timestamp) or isinstance(y, pd.Timestamp):
                if pd.Timestamp(x) != pd.Timestamp(y):
                    return f"value differs at {c}[{i}]: {x!r} != {y!r}"
            elif not _cell_eq(x, y):
                return f"value differs at {c}[{i}]: spark={x!r} oracle={y!r}"
    return None


def main(argv):
    from pyspark.sql import SparkSession

    import duckdb

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("verify-oracle")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = argv or list(queries)
    results, n_fail = {}, 0
    for name in names:
        t0 = time.time()
        rec = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            sdf = queries[name](spark, SF_DIR)
            a = _canon(sdf.toPandas())
            if name not in oracles:
                rec.update(rows_match=True, note="rows-only (no oracle)",
                           spark_rows=len(a))
            else:
                b = _canon(con.execute(oracles[name]).df())
                rec["schema_match"] = list(a.columns) == list(b.columns)
                rec["rows_match"] = len(a) == len(b)
                rec["spark_rows"] = len(a)
                rec["oracle_rows"] = len(b)
                if not rec["schema_match"]:
                    rec["err"] = (
                        f"schema: spark={list(a.columns)} oracle={list(b.columns)}"
                    )
                    rec["hash_match"] = False
                elif not rec["rows_match"]:
                    rec["hash_match"] = False
                else:
                    reason = _compare(a, b)
                    rec["hash_match"] = reason is None
                    if reason:
                        rec["err"] = reason
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        rec["sec"] = round(time.time() - t0, 2)
        ok = rec["err"] is None and rec.get("hash_match", True) is not False
        if not ok:
            n_fail += 1
        results[name] = rec
        print(f"{'PASS' if ok else 'FAIL'} {name} ({rec['sec']}s)"
              + (f" -- {rec['err']}" if rec["err"] else ""), flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "n": len(names), "failed": n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
