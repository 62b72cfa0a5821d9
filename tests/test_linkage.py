"""Cross-table record linkage (operators/linkage.py).

Semantics the blocked matcher must honor: typo-level probes resolve to
the right master, normalization-only variants match at distance 0,
band-crossing deletions are still caught (the band-slack recall
guarantee), blanks never link, ties break deterministically, and the
incremental path distinguishes matched-master / dup-in-batch / new."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_data_drift_detector_spark.operators.linkage import (
    linkage_keyed,
    linkage_state,
    record_linkage,
    record_linkage_against_state,
    record_linkage_incremental,
)

MASTER = [
    (1, "Acme Corporation"),
    (2, "Globex LLC"),
    (3, "Initech Inc"),
    (4, "Umbrella Corp"),
    (5, "Stark Industries"),
]


def _master(spark):
    return spark.createDataFrame(MASTER, "id long, name string")


def test_record_linkage_basic(spark):
    probe = spark.createDataFrame(
        [
            (101, "Acme Corporaton"),    # deletion near the end: 1 edit,
                                          # crosses a length band AND moves
                                          # the suffix — band slack catches it
            (102, "globex  llc"),         # case/whitespace only: distance 0
            (103, "Initech Incx"),        # trailing insertion: 1 edit
            (104, "Wayne Enterprises"),   # no master within distance
            (105, "Stork Industries"),    # edit INSIDE the prefix: suffix
                                          # pass catches it
            (106, "   "),                 # blank: excluded entirely
        ],
        "id long, name string",
    )
    rows = {
        r["probe_id"]: r
        for r in record_linkage(probe, _master(spark), max_distance=2).collect()
    }
    assert set(rows) == {101, 102, 103, 104, 105}  # blank 106 dropped
    assert (rows[101]["master_id"], rows[101]["distance"]) == (1, 1)
    assert (rows[102]["master_id"], rows[102]["distance"]) == (2, 0)
    assert (rows[103]["master_id"], rows[103]["distance"]) == (3, 1)
    assert rows[104]["master_id"] is None and not rows[104]["matched"]
    assert rows[104]["n_candidates"] == 0
    assert (rows[105]["master_id"], rows[105]["distance"]) == (5, 1)
    assert all(rows[i]["matched"] for i in (101, 102, 103, 105))


def test_record_linkage_deterministic_tiebreak(spark):
    # two masters both at distance 1 from the probe -> smallest master id
    master = spark.createDataFrame(
        [(7, "abcdefgh"), (9, "abcdefgi"), (8, "abcdefgj")],
        "id long, name string",
    )
    probe = spark.createDataFrame([(50, "abcdefg")], "id long, name string")
    row = record_linkage(probe, master, max_distance=2).collect()[0]
    assert row["n_candidates"] == 3
    assert row["master_id"] == 7 and row["distance"] == 1


def test_record_linkage_hot_block_cap(spark):
    # every record shares prefix AND suffix blocks; a pair-product cap
    # below n*m drops all blocks -> nothing links (the documented
    # bounded-recall tradeoff, preferred to the quadratic join)
    master = spark.createDataFrame(
        [(i, "same name here") for i in range(10)], "id long, name string"
    )
    probe = spark.createDataFrame(
        [(100 + i, "same name here") for i in range(10)],
        "id long, name string",
    )
    capped = record_linkage(probe, master, max_distance=2, max_block_pairs=50)
    assert capped.filter("matched").count() == 0
    uncapped = record_linkage(probe, master, max_distance=2)
    assert uncapped.filter("matched").count() == 10


def test_linkage_keyed_band_slack(spark):
    df = spark.createDataFrame([(1, "a" * 16)], "id long, name string")
    no_slack = linkage_keyed(df, "name", "id").collect()
    slack = linkage_keyed(df, "name", "id", band_slack=2).collect()
    # slack 2 across the 16-char band boundary emits bands 1 and 2
    assert len(no_slack) == 2  # one prefix key + one suffix key
    assert len(slack) == 3
    pkeys = sorted(r["block"] for r in slack if r["block"].startswith("p#"))
    assert pkeys == ["p#aaaaaa#1", "p#aaaaaa#2"]


def test_record_linkage_incremental_verdicts(spark):
    state = linkage_state(_master(spark))
    batch = spark.createDataFrame(
        [
            (201, "Acme Corporaton"),     # resolves to master 1
            (202, "Wayne Enterprises"),   # new entity, minted
            (203, "Wayne Enterprizes"),   # dup of 202 within the batch
            (204, "Globex LLC"),          # exact master hit
        ],
        "id long, name string",
    )
    rows = {
        r["probe_id"]: r
        for r in record_linkage_incremental(batch, state, max_distance=2).collect()
    }
    assert rows[201]["matched_master"] and rows[201]["master_id"] == 1
    assert rows[202]["is_new"] and not rows[202]["dup_in_batch"]
    assert rows[203]["dup_in_batch"] and not rows[203]["is_new"]
    assert rows[204]["matched_master"] and rows[204]["distance"] == 0
    # exactly one row of the duplicate registration pair mints a master
    assert sum(1 for r in rows.values() if r["is_new"]) == 1


def test_record_linkage_state_never_rereads_master(spark):
    # the state frame alone must be enough: feed a state built once,
    # then link against it with the master DataFrame discarded
    state_rows = linkage_state(_master(spark)).collect()
    state = spark.createDataFrame(
        state_rows, "master_id long, block string, mprobe string, mlen int"
    )
    probe = spark.createDataFrame(
        [(301, "Umbrella Corpx")], "id long, name string"
    )
    out = record_linkage_against_state(probe, state, max_distance=2).collect()
    assert out[0]["master_id"] == 4 and out[0]["distance"] == 1


def test_record_linkage_no_raw_text_in_exchange(spark, sf_dir):
    # the raw name column must never cross a shuffle: only the capped
    # compare windows (aliased `probe`/`mprobe`) travel. Check every
    # Exchange's column list for the source column.
    from pyspark_data_drift_detector_spark.plans.inspect import formatted_plan

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    master = customer.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("full_name")
    )
    probe = customer.select(
        (F.col("c_custkey") + 1000000).alias("id"),
        F.upper("c_name").alias("full_name"),
    )
    out = record_linkage(
        probe, master, probe_text="full_name", master_text="full_name",
        compare_len=12, max_distance=2,
    )
    plan = formatted_plan(out)
    assert "Exchange" in plan
    for seg in plan.split("Exchange")[1:]:
        assert "full_name" not in seg[:400], "raw text crossed an exchange"
    # semantics on the real table: case-only variants all link at 0
    assert out.filter("matched AND distance = 0").count() == customer.count()


def test_linkage_vetting_sink_mints_only_new(spark, tmp_path):
    """The MDM loop through real Structured Streaming: batch 1
    bootstraps (everything new, within-batch twins collapse to the
    smallest id, which mints); batch 2 resolves against the masters
    batch 1 minted — matches do NOT extend the state, new entities
    do."""
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        linkage_vetting_sink,
    )

    ingest = tmp_path / "reg_ingest"
    b1 = spark.createDataFrame(
        [
            (1, "Acme Corporation"),
            (2, "Acme Corporaton"),   # within-batch twin of 1
            (3, "Globex LLC"),
        ],
        "id long, name string",
    )
    b2 = spark.createDataFrame(
        [
            (10, "acme  corporation"),  # resolves to minted master 1
            (11, "Hooli Inc"),          # new entity
            (12, "Acme Corporaton"),    # resolves to master 1 (NOT 2 —
                                        # 2 never minted)
        ],
        "id long, name string",
    )
    b1.coalesce(1).write.parquet(str(ingest), mode="append")
    b2.coalesce(1).write.parquet(str(ingest), mode="append")
    state_p = str(tmp_path / "master_state")
    report_p = str(tmp_path / "reg_report")
    q = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ingest))
        .writeStream.foreachBatch(
            linkage_vetting_sink(state_p, report_p, max_distance=2)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    report = {
        r["probe_id"]: r for r in spark.read.parquet(report_p).collect()
    }
    assert len(report) == 6
    # file order isn't guaranteed; identify the bootstrap batch by id 1
    boot_bid = report[1]["batch_id"]
    assert report[2]["batch_id"] == boot_bid
    # bootstrap: 1 mints, 2 is its within-batch twin, 3 mints
    assert report[1]["is_new"] and report[3]["is_new"]
    assert report[2]["dup_in_batch"] and not report[2]["is_new"]
    # second batch: 10 and 12 resolve to master 1 (2 never minted),
    # 11 mints
    assert report[10]["matched_master"] and report[10]["master_id"] == 1
    assert report[12]["matched_master"] and report[12]["master_id"] == 1
    assert report[11]["is_new"]
    # state carries exactly the minted masters: 1, 3, 11
    state = spark.read.parquet(state_p)
    assert set(
        r["master_id"] for r in state.select("master_id").distinct().collect()
    ) == {1, 3, 11}


def test_token_block_links_reordered_names(spark):
    # "Corp ACME" vs "Acme Corp": the reorder defeats the prefix pass,
    # the suffix pass AND the plain Levenshtein verify — without the
    # token pass the probe is unmatched; with it, the sorted-token
    # forms coincide and the match is EXACT (distance 0)
    master = spark.createDataFrame(
        [(1, "Acme Corp"), (2, "Globex LLC")], "id long, name string"
    )
    probe = spark.createDataFrame([(101, "Corp ACME")], "id long, name string")
    base = record_linkage(probe, master).collect()[0]
    assert not base["matched"]
    tok = record_linkage(probe, master, token_block=True).collect()[0]
    assert tok["matched"] and tok["master_id"] == 1
    assert tok["distance"] == 0


def test_token_block_reorder_plus_typo_scores_typos(spark):
    # reorder + 1 substitution: sorted-form edit distance = 1; the
    # single distance domain keeps the deterministic winner rule
    master = spark.createDataFrame(
        [(1, "Stark Industries")], "id long, name string"
    )
    probe = spark.createDataFrame(
        [(101, "Industries Starx")], "id long, name string"
    )
    out = record_linkage(probe, master, token_block=True).collect()[0]
    assert out["matched"] and out["distance"] == 1


def test_token_block_preserves_plain_matches(spark):
    # the third pass only ADDS recall: every verdict of the two-pass
    # matcher is reproduced (same masters, same-or-lower distances)
    probe = spark.createDataFrame(
        [
            (101, "Acme Corporaton"),
            (102, "globex  llc"),
            (103, "Zzyzx Ventures"),
        ],
        "id long, name string",
    )
    base = {
        r["probe_id"]: r for r in record_linkage(probe, _master(spark)).collect()
    }
    tok = {
        r["probe_id"]: r
        for r in record_linkage(
            probe, _master(spark), token_block=True
        ).collect()
    }
    for pid, b in base.items():
        t = tok[pid]
        assert t["matched"] >= b["matched"]
        if b["matched"]:
            assert t["master_id"] == b["master_id"]
            assert t["distance"] <= b["distance"]


def test_norm_sql_col_quotes_awkward_legal_names(spark):
    # a column name with spaces passes ensure_safe_columns; the SQL
    # fragment must backtick-quote it rather than misparse
    master = spark.createDataFrame(
        [(1, "Acme Corporation")], "id long, `company name` string"
    )
    probe = spark.createDataFrame(
        [(101, "acme  corporation")], "id long, `company name` string"
    )
    out = record_linkage(
        probe, master, probe_text="company name", master_text="company name"
    ).collect()[0]
    assert out["matched"] and out["distance"] == 0


def test_vetting_sink_bootstrap_respects_string_ids(spark, tmp_path):
    # ADVICE r13: the bootstrap state schema must derive master_id's
    # type from the feed — a hardcoded long with string ids wrote
    # mixed-type report parquet that failed on read
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        linkage_vetting_sink,
    )

    sink = linkage_vetting_sink(
        str(tmp_path / "state"), str(tmp_path / "report")
    )
    b0 = spark.createDataFrame(
        [("r1", "Acme Corporation"), ("r2", "Globex LLC")],
        "id string, name string",
    )
    b1 = spark.createDataFrame(
        [("r3", "Acme Corporaton"), ("r4", "Wayne Enterprises")],
        "id string, name string",
    )
    sink(b0, 0)
    sink(b1, 1)
    rep = spark.read.parquet(str(tmp_path / "report"))
    assert dict(rep.dtypes)["master_id"] == "string"
    rows = {r["probe_id"]: r for r in rep.collect()}
    assert rows["r1"]["is_new"] and rows["r2"]["is_new"]
    assert rows["r3"]["matched_master"] and rows["r3"]["master_id"] == "r1"
    assert rows["r4"]["is_new"]


def test_blocking_report_pair_product_is_exact_join_size(spark):
    # total_pair_product must equal the ACTUAL candidate-join output
    # row count (before pair dedup) — the panel predicts exactly the
    # work record_linkage would schedule
    from pyspark_data_drift_detector_spark.operators.linkage import (
        blocking_report,
    )

    probe = spark.createDataFrame(
        [
            (101, "Acme Corporaton"),
            (102, "globex  llc"),
            (103, "Zzyzx Ventures"),
            (104, "Acme Corporation"),
        ],
        "id long, name string",
    )
    rep = {
        r["metric"]: r["value"]
        for r in blocking_report(probe, _master(spark)).collect()
    }
    pk = linkage_keyed(probe, "name", "id", band_slack=2)
    mk = linkage_keyed(_master(spark), "name", "id")
    join_rows = pk.join(
        mk.select(F.col("block"), F.col("id").alias("mid")), "block"
    ).count()
    assert rep["total_pair_product"] == float(join_rows)
    assert rep["n_probe_rows"] == float(pk.count())
    assert rep["n_master_rows"] == float(mk.count())
    assert rep["max_block_pair_product"] <= rep["total_pair_product"]
    assert 0.0 < rep["top_block_share"] <= 1.0
    assert "n_capped_blocks" not in rep  # only reported with a cap


def test_blocking_report_cap_metrics(spark):
    # the degenerate shared-prefix block carries 25 of the 30 pair
    # products -> a cap of 1 drops exactly it (the per-key suffix
    # blocks are product-1 and survive); a cap of 0 drops everything
    from pyspark_data_drift_detector_spark.operators.linkage import (
        blocking_report,
    )

    master = spark.createDataFrame(
        [(i, f"customer#00{i}") for i in range(1, 6)],
        "id long, name string",
    )
    probe = spark.createDataFrame(
        [(100 + i, f"customer#00{i}") for i in range(1, 6)],
        "id long, name string",
    )
    rep = {
        r["metric"]: r["value"]
        for r in blocking_report(
            probe, master, max_block_pairs=1
        ).collect()
    }
    assert rep["n_capped_blocks"] == 1.0
    assert rep["capped_pair_share"] == pytest.approx(25 / 30)
    all_capped = {
        r["metric"]: r["value"]
        for r in blocking_report(
            probe, master, max_block_pairs=0
        ).collect()
    }
    assert all_capped["capped_pair_share"] == 1.0
