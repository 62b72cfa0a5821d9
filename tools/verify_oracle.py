"""Standalone driver-contract verification at sf0.01.

Simulates the driver's correctness gate: runs every ``queries()`` entry from
``__spark_entry__.py`` on Spark and its ``oracle_sql()`` twin in DuckDB over
the same parquet tables, then compares sorted column names, row count, and
order-insensitive values (floats rounded to 5 decimals — both sides already
ROUND(x, 5) where it matters).

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
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 5)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


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
            s_cols = sorted(sdf.columns)
            s_rows = _norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
            if name not in oracles:
                rec.update(rows_match=True, note="rows-only (no oracle)")
            else:
                cur = con.execute(oracles[name])
                o_cols = sorted(d[0] for d in cur.description)
                o_rows = _norm_rows([d[0] for d in cur.description], cur.fetchall())
                rec["schema_match"] = s_cols == o_cols
                rec["rows_match"] = len(s_rows) == len(o_rows)
                rec["hash_match"] = s_rows == o_rows
                rec["spark_rows"] = len(s_rows)
                rec["oracle_rows"] = len(o_rows)
                if not rec["schema_match"]:
                    rec["err"] = f"schema: spark={s_cols} oracle={o_cols}"
                elif not rec["hash_match"]:
                    diff = [
                        (a, b) for a, b in zip(s_rows, o_rows) if a != b
                    ][:3]
                    rec["err"] = f"values differ, e.g. {diff}"
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
