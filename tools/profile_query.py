"""Profile one or more named queries exactly the way bench.py times them.

Usage:
    python tools/profile_query.py [--sf DIR] [--cpus N] [--reps N]
        [--plan-dir DIR] [--tag TAG] query [query ...]

For each query: warm up at sf0.001 (JIT the codegen classes), then run
``reps`` timed ``.collect()`` repetitions at the target scale factor,
printing each rep and the min.  With ``--plan-dir`` the
``explain("formatted")`` output is written to ``<dir>/<query>_<tag>.txt``
(the judge-facing plan artifact convention: tag = "before"/"after").

This is a measurement tool only — it never changes what a query computes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument(
        "--jobs",
        action="store_true",
        help="record per-Spark-job wall times via the event log and print a "
        "breakdown for the last timed rep of each query",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("drift-engine-profile")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.codegen.maxFields", "2000")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=2g")
        .config("spark.ui.enabled", "false")
    )
    evdir = None
    if args.jobs:
        import tempfile

        evdir = tempfile.mkdtemp(prefix="spark-profile-ev-")
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", f"file://{evdir}")
            # plain single-file JSON so the parser below can read it
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qmap = dict(entry_mod.queries())
    # bench.py overrides the four dedup queries to the production hash family
    from pyspark_data_drift_detector_spark.operators.dedup import (
        dedup_survivors,
        minhash_lsh_pairs,
        neardup_clusters,
        simhash_pairs,
    )

    qmap["dedup_minhash_lsh"] = lambda s, d: minhash_lsh_pairs(
        entry_mod._documents(s, d), threshold=0.3
    )
    qmap["dedup_simhash"] = lambda s, d: simhash_pairs(
        entry_mod._documents(s, d), max_distance=8
    )
    qmap["dedup_clusters"] = lambda s, d: neardup_clusters(
        minhash_lsh_pairs(entry_mod._documents(s, d), threshold=0.3)
    )
    qmap["dedup_survivors"] = lambda s, d: dedup_survivors(
        entry_mod._documents(s, d),
        neardup_clusters(minhash_lsh_pairs(entry_mod._documents(s, d), threshold=0.3)),
    )

    # bench.py's headline full_pipeline (detect_drift over the split)
    from pyspark_data_drift_detector_spark import detect_drift

    def _full_pipeline(s, d):
        df = s.read.parquet(f"{d.rstrip('/')}/lineitem.parquet")
        from pyspark.sql import functions as F

        return detect_drift(
            df.filter(F.col("l_orderkey") % 2 == 0),
            df.filter(F.col("l_orderkey") % 2 == 1),
        )

    qmap["full_pipeline"] = _full_pipeline

    import gc

    def drop_caches() -> None:
        gc.collect()
        spark.catalog.clearCache()

    warm_dir = "/root/testdata/sf0.001"
    results: dict[str, float] = {}
    for name in args.queries:
        fn = qmap[name]
        if not args.no_warm:
            try:
                fn(spark, warm_dir).collect()
            except Exception as exc:  # surfaces in the timed run
                print(f"[warmup {name}] {exc}")
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plan_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"[plan] {path}")
        best = None
        for rep in range(args.reps):
            drop_caches()
            spark.sparkContext.setJobDescription(f"profile:{name}#{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {name} rep{rep}: {dt:.3f}s")
        if best is not None:
            results[name] = round(best, 3)
            print(f"{name}: min {best:.3f}s")
    print({"profile": results})
    spark.stop()
    if evdir:
        import glob
        import json

        paths = []
        for path in glob.glob(os.path.join(evdir, "*")):
            if path.endswith(".inprogress"):
                continue
            if os.path.isdir(path):
                # Spark 4 rolling event logs: eventlog_v2_<app>/events_*
                paths.extend(
                    p
                    for p in glob.glob(os.path.join(path, "events_*"))
                    if os.path.isfile(p)
                )
            else:
                paths.append(path)
        for path in paths:
            jobs = {}
            with open(path) as fh:
                for line in fh:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if ev.get("Event") == "SparkListenerJobStart":
                        props = ev.get("Properties") or {}
                        infos = ev.get("Stage Infos") or []
                        last = infos[-1] if infos else {}
                        jobs[ev["Job ID"]] = {
                            "desc": (
                                props.get("spark.job.description", "")[:40]
                                + " | "
                                + str(last.get("Stage Name", ""))[:60]
                                + f" [{len(infos)} stages]"
                            ),
                            "t0": ev["Submission Time"],
                        }
                    elif ev.get("Event") == "SparkListenerJobEnd":
                        j = jobs.get(ev["Job ID"])
                        if j:
                            j["dt"] = (
                                ev["Completion Time"] - j["t0"]
                            ) / 1000.0
            per_desc: dict[str, tuple[int, float]] = {}
            for j in jobs.values():
                n, t = per_desc.get(j["desc"], (0, 0.0))
                per_desc[j["desc"]] = (n + 1, t + j.get("dt", 0.0))
            print("\nper-job-description totals (n jobs, sum sec):")
            for desc, (n, t) in sorted(
                per_desc.items(), key=lambda kv: -kv[1][1]
            ):
                print(f"  {t:8.3f}s  n={n:4d}  {desc or '<none>'}")


if __name__ == "__main__":
    main()
