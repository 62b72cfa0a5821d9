"""SCD type-2 apply-changes (operators/scd.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark_data_drift_detector_spark.operators.scd import scd2_apply

T1 = datetime(2024, 1, 1)
T2 = datetime(2024, 2, 1)
T3 = datetime(2024, 3, 1)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "k long, seg string, valid_from timestamp, valid_to timestamp,"
        " is_current boolean",
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, effective_ts timestamp"
    )


def _apply(dim, changes):
    return scd2_apply(dim, changes, "k", ["seg"])


def test_scd2_change_closes_and_opens(spark):
    dim = _dim(spark, [(1, "A", T1, None, True)])
    out = sorted(
        _apply(dim, _changes(spark, [(1, "B", T2)])).collect(),
        key=lambda r: r["valid_from"],
    )
    assert len(out) == 2
    old, new = out
    assert (old["seg"], old["valid_to"], old["is_current"]) == (
        "A", T2, False,
    )
    assert (new["seg"], new["valid_from"], new["valid_to"],
            new["is_current"]) == ("B", T2, None, True)


def test_scd2_multi_change_batch_chains(spark):
    dim = _dim(spark, [(1, "A", T1, None, True)])
    out = sorted(
        _apply(dim, _changes(spark, [(1, "C", T3), (1, "B", T2)])).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["seg"], r["valid_to"]) for r in out] == [
        ("A", T2), ("B", T3), ("C", None),
    ]
    assert [r["is_current"] for r in out] == [False, False, True]


def test_scd2_noop_changes_vanish_but_reverts_version(spark):
    dim = _dim(spark, [(1, "A", T1, None, True), (2, "X", T1, None, True)])
    changes = _changes(
        spark,
        [
            (1, "A", T2),      # no-op: equals current -> vanishes
            (2, "Y", T2),      # real change
            (2, "X", T3),      # REVERT to the original: a new version
        ],
    )
    out = _apply(dim, changes).collect()
    k1 = [r for r in out if r["k"] == 1]
    assert len(k1) == 1 and k1[0]["is_current"] and k1[0]["seg"] == "A"
    k2 = sorted((r for r in out if r["k"] == 2), key=lambda r: r["valid_from"])
    assert [(r["seg"], r["is_current"]) for r in k2] == [
        ("X", False), ("Y", False), ("X", True),
    ]


def test_scd2_new_key_inserts_chain_and_dedupes(spark):
    dim = _dim(spark, [(1, "A", T1, None, True)])
    changes = _changes(spark, [(9, "N", T2), (9, "N", T3)])  # dup no-op
    out = [r for r in _apply(dim, changes).collect() if r["k"] == 9]
    assert len(out) == 1
    assert (out[0]["seg"], out[0]["valid_from"], out[0]["is_current"]) == (
        "N", T2, True,
    )


def test_scd2_history_passes_through_untouched(spark):
    dim = _dim(
        spark,
        [
            (1, "OLD", datetime(2023, 1, 1), T1, False),  # closed history
            (1, "A", T1, None, True),
        ],
    )
    out = sorted(
        _apply(dim, _changes(spark, [(1, "B", T2)])).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["seg"], r["is_current"]) for r in out] == [
        ("OLD", False), ("A", False), ("B", True),
    ]
    assert out[0]["valid_to"] == T1  # untouched


def test_scd2_untouched_keys_and_null_feed_rows(spark):
    dim = _dim(spark, [(1, "A", T1, None, True), (2, "B", T1, None, True)])
    changes = _changes(
        spark, [(1, "Z", T2), (None, "Q", T2), (2, "W", None)]
    )
    out = _apply(dim, changes).collect()
    k2 = [r for r in out if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["seg"] == "B" and k2[0]["is_current"]
    assert not [r for r in out if r["k"] is None]


def test_scd2_rejects_empty_tracked(spark):
    dim = _dim(spark, [(1, "A", T1, None, True)])
    with pytest.raises(ValueError, match="tracked_cols"):
        scd2_apply(dim, _changes(spark, []), "k", [])


def test_scd2_idempotent_reapply(spark):
    # applying the same feed to the already-updated dimension changes
    # nothing: every change is now a no-op against the in-effect state
    dim = _dim(spark, [(1, "A", T1, None, True)])
    feed = _changes(spark, [(1, "B", T2)])
    once = _apply(dim, feed)
    twice = _apply(once, feed)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_lookup_point_in_time(spark):
    from pyspark_data_drift_detector_spark.operators.scd import scd2_lookup

    dim = _dim(
        spark,
        [
            (1, "A", T1, T2, False),
            (1, "B", T2, T3, False),
            (1, "C", T3, None, True),
            (2, "X", T2, None, True),
        ],
    )
    facts = spark.createDataFrame(
        [
            (100, 1, datetime(2024, 1, 15)),   # during A
            (101, 1, T2),                       # AT the boundary: B opens
            (102, 1, datetime(2024, 2, 20)),   # during B
            (103, 1, datetime(2024, 6, 1)),    # during open C
            (104, 2, datetime(2024, 1, 15)),   # before key 2's first version
            (105, 9, datetime(2024, 6, 1)),    # unknown key
        ],
        "fid long, k long, ts timestamp",
    )
    out = {
        r["fid"]: r
        for r in scd2_lookup(
            facts, dim, "k", "ts", "k", ["seg"]
        ).collect()
    }
    assert out[100]["seg_at"] == "A"
    assert out[101]["seg_at"] == "B"      # inclusive at valid_from
    assert out[102]["seg_at"] == "B"
    assert out[103]["seg_at"] == "C"
    assert out[104]["seg_at"] is None     # no version in effect yet
    assert out[105]["seg_at"] is None     # unknown key
    assert out[102]["ts_at"] == T2        # matched version start reported


def test_scd2_lookup_agrees_with_range_join(spark):
    # the as-of formulation must equal the validity-interval range join
    # on a dimension built by scd2_apply (contiguity invariant)
    from pyspark_data_drift_detector_spark.operators.scd import scd2_lookup

    dim0 = _dim(spark, [(k, "A", T1, None, True) for k in range(1, 8)])
    feed = _changes(
        spark,
        [(k, f"S{k % 3}", T2) for k in range(1, 8, 2)]
        + [(k, f"Z{k % 2}", T3) for k in range(1, 8, 3)],
    )
    dim = _apply(dim0, feed)
    facts = spark.createDataFrame(
        [
            (i, 1 + i % 7, datetime(2024, 1 + i % 4, 1 + i % 27))
            for i in range(200)
        ],
        "fid long, k long, ts timestamp",
    )
    asof = {
        r["fid"]: r["seg_at"]
        for r in scd2_lookup(facts, dim, "k", "ts", "k", ["seg"]).collect()
    }
    dim.createOrReplaceTempView("__scd_dim")
    facts.createOrReplaceTempView("__scd_facts")
    ranged = {
        r["fid"]: r["seg"]
        for r in spark.sql(
            """SELECT f.fid, d.seg FROM __scd_facts f
               LEFT JOIN __scd_dim d ON d.k = f.k
                 AND d.valid_from <= f.ts
                 AND (d.valid_to IS NULL OR f.ts < d.valid_to)"""
        ).collect()
    }
    assert asof == ranged


def test_scd2_apply_shuffle_budget(spark, sf_dir):
    # the whole rebuild is keyed on the dimension key: one hash
    # exchange feeds both the lag and lead windows (same partitioning,
    # Spark reuses it); history rows union in without shuffling
    from pyspark_data_drift_detector_spark.plans.inspect import (
        count_shuffles,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    dim = cust.selectExpr(
        "c_custkey AS k", "c_mktsegment AS seg",
        "TIMESTAMP '2024-01-01' AS valid_from",
        "CAST(NULL AS TIMESTAMP) AS valid_to", "true AS is_current",
    )
    feed = cust.selectExpr(
        "c_custkey AS k", "'Z' AS seg",
        "TIMESTAMP '2024-02-01' AS effective_ts",
    )
    assert count_shuffles(scd2_apply(dim, feed, "k", ["seg"])) <= 2


def test_scd2_validate_counts_each_violation(spark):
    from pyspark_data_drift_detector_spark.operators.scd import scd2_validate

    T15 = datetime(2024, 1, 15)
    dim = _dim(
        spark,
        [
            (1, "A", T1, T2, False), (1, "B", T2, None, True),  # clean
            (2, "X", T1, None, True), (2, "Y", T2, None, True),  # 2 open
            # overlap: second version starts INSIDE the first
            (3, "G", T1, T2, False), (3, "H", T15, None, True),
            # gap: uncovered time between T2 and T3
            (4, "P", T1, T2, False), (4, "Q", T3, None, True),
            # inverted interval
            (5, "I", T2, T1, False), (5, "J", T3, None, True),
            (6, "D", T1, T2, False),                             # no open
            # flag/interval disagreement: current but closed
            (7, "E", T1, T2, True),
        ],
    )
    out = {
        r["check"]: r["n_violations"]
        for r in scd2_validate(dim, "k").collect()
    }
    assert out["multiple_open"] == 1    # key 2
    assert out["no_open"] == 1          # key 6 (fully closed chain)
    assert out["overlap"] == 1
    assert out["inverted"] == 1
    assert out["open_not_null_to"] == 1  # key 7


def test_scd2_validate_clean_after_apply(spark):
    # scd2_apply output must validate clean (except no_open never
    # fires: every chain ends open)
    from pyspark_data_drift_detector_spark.operators.scd import scd2_validate

    dim = _dim(spark, [(k, "A", T1, None, True) for k in range(1, 6)])
    feed = _changes(
        spark, [(k, f"S{k}", T2) for k in range(1, 6, 2)]
        + [(1, "Z", T3)]
    )
    out = {
        r["check"]: r["n_violations"]
        for r in scd2_validate(_apply(dim, feed), "k").collect()
    }
    assert all(v == 0 for v in out.values()), out


def _changes_op(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, effective_ts timestamp, op string"
    )


def _apply_op(dim, changes):
    return scd2_apply(dim, changes, "k", ["seg"], op_col="op")


def test_scd2_tombstone_closes_chain(spark):
    dim = _dim(spark, [(1, "A", T1, None, True)])
    out = _apply_op(dim, _changes_op(spark, [(1, None, T2, "delete")])).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["seg"], row["valid_to"], row["is_current"]) == ("A", T2, False)


def test_scd2_tombstone_noops(spark):
    # delete of an unknown key, a consecutive second delete, and a
    # delete preceding the key's first change are all no-ops
    dim = _dim(spark, [(1, "A", T1, None, True)])
    changes = _changes_op(
        spark,
        [
            (9, None, T2, "delete"),            # unknown key
            (1, None, T2, "delete"),            # real close
            (1, None, T3, "delete"),            # already deleted
            (7, None, T1, "delete"),            # precedes first change
            (7, "N", T2, "upsert"),             # fresh chain
        ],
    )
    out = _apply_op(dim, changes).collect()
    assert not [r for r in out if r["k"] == 9]
    k1 = [r for r in out if r["k"] == 1]
    assert len(k1) == 1 and k1[0]["valid_to"] == T2
    k7 = [r for r in out if r["k"] == 7]
    assert len(k7) == 1
    assert (k7[0]["valid_from"], k7[0]["is_current"]) == (T2, True)


def test_scd2_delete_then_upsert_reopens_even_identical(spark):
    # re-registration: the post-delete upsert re-opens a chain even
    # with tracked values identical to the pre-delete state, and the
    # absence interval [T2, T3) stays uncovered
    dim = _dim(spark, [(1, "A", T1, None, True)])
    changes = _changes_op(
        spark, [(1, None, T2, "delete"), (1, "A", T3, "upsert")]
    )
    out = sorted(
        _apply_op(dim, changes).collect(), key=lambda r: r["valid_from"]
    )
    assert [(r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in out] == [("A", T1, T2, False), ("A", T3, None, True)]


def test_scd2_delete_only_feed_reapply_idempotent(spark):
    dim = _dim(spark, [(1, "A", T1, None, True)])
    feed = _changes_op(spark, [(1, None, T2, "delete")])
    once = _apply_op(dim, feed)
    twice = _apply_op(once, feed)
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_scd2_same_ts_delete_sorts_before_upsert(spark):
    # delete + upsert at one effective timestamp: the delete closes
    # first, the upsert immediately re-opens -> contiguous chain, no
    # empty version, deterministic
    dim = _dim(spark, [(1, "A", T1, None, True)])
    changes = _changes_op(
        spark, [(1, "B", T2, "upsert"), (1, None, T2, "delete")]
    )
    out = sorted(
        _apply_op(dim, changes).collect(), key=lambda r: r["valid_from"]
    )
    assert [(r["seg"], r["valid_from"], r["valid_to"]) for r in out] == [
        ("A", T1, T2), ("B", T2, None),
    ]


def test_scd2_validate_reports_tombstone_shapes(spark):
    from pyspark_data_drift_detector_spark.operators.scd import scd2_validate

    dim = _dim(spark, [(1, "A", T1, None, True), (2, "B", T1, None, True)])
    changes = _changes_op(
        spark,
        [
            (1, None, T2, "delete"),            # closed chain -> no_open
            (2, None, T2, "delete"),
            (2, "B", T3, "upsert"),             # reopen -> gap
        ],
    )
    out = {
        r["check"]: r["n_violations"]
        for r in scd2_validate(_apply_op(dim, changes), "k").collect()
    }
    assert out["no_open"] == 1          # key 1 (soft-deleted, legal)
    assert out["gap"] == 1              # key 2's absence interval
    assert out["multiple_open"] == 0
    assert out["overlap"] == 0 and out["inverted"] == 0
    assert out["open_not_null_to"] == 0


def test_scd2_lookup_end_bounded_on_closed_chain(spark):
    # facts at/after a fully-closed chain's final valid_to (and inside
    # a delete->reopen gap) attach NULLs, not the stale last version
    from pyspark_data_drift_detector_spark.operators.scd import scd2_lookup

    dim = _dim(
        spark,
        [
            (1, "A", T1, T2, False),             # closed chain: deleted
            (2, "X", T1, T2, False),             # gap [T2, T3) then reopen
            (2, "Y", T3, None, True),
        ],
    )
    facts = spark.createDataFrame(
        [
            (100, 1, datetime(2024, 1, 15)),     # during A
            (101, 1, T2),                        # AT the close: gone
            (102, 1, datetime(2024, 6, 1)),      # long after: gone
            (103, 2, datetime(2024, 2, 15)),     # inside the gap
            (104, 2, datetime(2024, 6, 1)),      # during open Y
        ],
        "fid long, k long, ts timestamp",
    )
    out = {
        r["fid"]: r
        for r in scd2_lookup(facts, dim, "k", "ts", "k", ["seg"]).collect()
    }
    assert out[100]["seg_at"] == "A" and out[100]["ts_at"] == T1
    assert out[101]["seg_at"] is None and out[101]["ts_at"] is None
    assert out[102]["seg_at"] is None
    assert out[103]["seg_at"] is None    # absence interval
    assert out[104]["seg_at"] == "Y"


def test_scd2_report_metrics(spark):
    from pyspark_data_drift_detector_spark.operators.scd import scd2_report

    dim = _dim(
        spark,
        [
            (1, "A", T1, T2, False),   # key 1: 2 versions, open
            (1, "B", T2, None, True),
            (2, "X", T1, None, True),  # key 2: single open version
            (3, "D", T1, T3, False),   # key 3: soft-deleted
        ],
    )
    out = {r["metric"]: r["value"] for r in scd2_report(dim, "k").collect()}
    assert out["n_rows"] == 4.0 and out["n_keys"] == 3.0
    assert out["versions_per_key_mean"] == pytest.approx(4 / 3)
    assert out["versions_per_key_max"] == 2.0
    assert out["single_version_share"] == pytest.approx(2 / 3)
    assert out["open_share"] == pytest.approx(2 / 3)
    assert out["closed_rows_share"] == pytest.approx(0.5)
    # closed lifetimes: Jan (31d) and Jan+Feb (60d) -> mean 45.5
    assert out["avg_closed_lifetime_days"] == pytest.approx(45.5)


def test_scd2_report_no_closed_rows_null_lifetime(spark):
    from pyspark_data_drift_detector_spark.operators.scd import scd2_report

    dim = _dim(spark, [(1, "A", T1, None, True)])
    out = {r["metric"]: r["value"] for r in scd2_report(dim, "k").collect()}
    assert out["avg_closed_lifetime_days"] is None
    assert out["closed_rows_share"] == 0.0
