"""Bounded-iteration PageRank (operators/graph.py)."""

from __future__ import annotations

import pytest

from pyspark_data_drift_detector_spark.operators.graph import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w double")


def _reference_pagerank(edges, n_iter, damping=0.85):
    """Driver-side textbook power iteration with uniform dangling
    redistribution — the spec the distributed operator must match."""
    out = {}
    for s, t, w in edges:
        out.setdefault(s, []).append((t, w))
        out.setdefault(t, out.get(t, []))
    nodes = sorted(out)
    n = len(nodes)
    shares = {
        s: [(t, w / sum(w2 for _, w2 in lst)) for t, w in lst]
        for s, lst in out.items()
        if lst
    }
    r = {x: 1.0 / n for x in nodes}
    for _ in range(n_iter):
        dm = sum(r[x] for x in nodes if x not in shares)
        new = {x: (1.0 - damping) / n + damping * dm / n for x in nodes}
        for s, lst in shares.items():
            for t, sh in lst:
                new[t] += damping * r[s] * sh
        r = new
    return r


GRAPH = [
    ("a", "b", 1.0), ("a", "c", 1.0), ("b", "c", 1.0),
    ("c", "a", 1.0), ("c", "d", 1.0),   # d is dangling
]


def test_pagerank_matches_power_iteration(spark):
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, GRAPH), weight_col="w", n_iter=5).collect()
    }
    want = _reference_pagerank(GRAPH, n_iter=5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0)


def test_pagerank_weights_steer_rank(spark):
    # a splits 9:1 between b and c -> b must outrank c
    rows = [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, rows), weight_col="w", n_iter=10).collect()
    }
    assert got["b"] > got["c"]
    want = _reference_pagerank(rows, n_iter=10)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_pagerank_unweighted_parallel_edges_add(spark):
    # without weight_col every edge counts 1; the duplicated a->b edge
    # doubles its share exactly like w=2
    dup = [("a", "b", 1.0), ("a", "b", 1.0), ("a", "c", 1.0),
           ("b", "a", 1.0), ("c", "a", 1.0)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, dup), n_iter=6).collect()
    }
    weighted = [("a", "b", 2.0), ("a", "c", 1.0), ("b", "a", 1.0),
                ("c", "a", 1.0)]
    want = _reference_pagerank(weighted, n_iter=6)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_pagerank_null_endpoints_and_nonpositive_weights_dropped(spark):
    rows = [("a", "b", 1.0), (None, "b", 1.0), ("a", None, 1.0),
            ("b", "a", 0.0), ("b", "a", 1.0)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, rows), weight_col="w", n_iter=4).collect()
    }
    assert set(got) == {"a", "b"}
    want = _reference_pagerank([("a", "b", 1.0), ("b", "a", 1.0)], n_iter=4)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_pagerank_rejects_bad_params(spark):
    e = _edges(spark, GRAPH)
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(e, n_iter=0)


def test_pagerank_all_dangling_uniform(spark):
    # star with no back-edges: b/c/d dangle; ranks remain a valid
    # distribution (sums to 1) and the leaves tie exactly
    rows = [("a", "b", 1.0), ("a", "c", 1.0), ("a", "d", 1.0)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, rows), weight_col="w", n_iter=8).collect()
    }
    assert sum(got.values()) == pytest.approx(1.0)
    assert got["b"] == got["c"] == got["d"]
    want = _reference_pagerank(rows, n_iter=8)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def _components(spark, rows, schema="src string, dst string", **kw):
    from pyspark_data_drift_detector_spark.operators.graph import (
        graph_components,
    )

    return graph_components(spark.createDataFrame(rows, schema), **kw)


def test_components_string_ids_two_blobs(spark):
    # two components incl. a 4-hop chain (pointer jumping must span it)
    rows = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),   # chain
        ("x", "y"), ("y", "x"),                            # mutual pair
    ]
    out = {
        r["node"]: (r["component_id"], r["component_size"])
        for r in _components(spark, rows).collect()
    }
    assert {k: v for k, v in out.items() if k in "abcde"} == {
        c: ("a", 5) for c in "abcde"
    }
    assert out["x"] == ("x", 2) and out["y"] == ("x", 2)


def test_components_integral_ids_direct_path(spark):
    rows = [(1, 2), (2, 3), (10, 11), (20, 20)]  # chain, pair, self-loop
    out = {
        r["node"]: (r["component_id"], r["component_size"])
        for r in _components(spark, rows, "src long, dst long").collect()
    }
    assert out == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 2), 11: (10, 2),
        20: (20, 1),
    }


def test_components_null_edges_dropped_parallel_harmless(spark):
    rows = [("a", "b"), ("a", "b"), ("b", "a"), (None, "z"), ("q", None)]
    out = {r["node"] for r in _components(spark, rows).collect()}
    assert out == {"a", "b"}  # z/q only appeared on NULL edges


def test_components_match_semantic_oracle_on_order_chains(spark, sf_dir):
    # the entry-query construction: per-customer order chains — the
    # component of any chained order is its customer's order set
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspark_data_drift_detector_spark.operators.graph import (
        graph_components,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    edges = (
        orders.select(
            "o_orderkey", F.lag("o_orderkey").over(w).alias("prev")
        )
        .filter(F.col("prev").isNotNull())
        .selectExpr("prev AS src", "o_orderkey AS dst")
    )
    got = {
        r["node"]: (r["component_id"], r["component_size"])
        for r in graph_components(edges).collect()
    }
    expect = {}
    for r in orders.groupBy("o_custkey").agg(
        F.collect_list("o_orderkey").alias("ks")
    ).collect():
        ks = sorted(r["ks"])
        if len(ks) >= 2:
            for k in ks:
                expect[k] = (ks[0], len(ks))
    assert got == expect


def test_components_shuffle_budget_after_core(spark, sf_dir):
    # post-core plan contract: once the pointer-jumping core has
    # converged (checkpointed, O(edge-endpoints) labels), the
    # membership/size decoration costs at most the size groupBy and
    # its join back — no extra corpus-scale exchanges
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspark_data_drift_detector_spark.operators.graph import (
        graph_components,
    )
    from pyspark_data_drift_detector_spark.plans.inspect import (
        count_shuffles,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    edges = (
        orders.select(
            "o_orderkey", F.lag("o_orderkey").over(w).alias("prev")
        )
        .filter(F.col("prev").isNotNull())
        .selectExpr("prev AS src", "o_orderkey AS dst")
    )
    assert count_shuffles(graph_components(edges)) <= 3


def _triangles(spark, rows, schema="src string, dst string", **kw):
    from pyspark_data_drift_detector_spark.operators.graph import (
        graph_triangles,
    )

    return {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in graph_triangles(
            spark.createDataFrame(rows, schema), **kw
        ).collect()
    }


def test_triangles_k4_all_closed(spark):
    rows = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    out = _triangles(spark, rows)
    assert out == {c: (3, 3, 1.0) for c in "abcd"}


def test_triangles_one_with_pendant(spark):
    # triangle a-b-c plus pendant d off a: a has an open wedge
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    out = _triangles(spark, rows)
    assert out["a"] == (3, 1, pytest.approx(1 / 3))
    assert out["b"] == (2, 1, 1.0) and out["c"] == (2, 1, 1.0)
    assert out["d"] == (1, 0, None)  # degree < 2: no wedge to close


def test_triangles_square_is_triangle_free(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    out = _triangles(spark, rows)
    assert all(v == (2, 0, 0.0) for v in out.values())


def test_triangles_canonicalization(spark):
    # reversed duplicates, parallel edges, self-loops and NULLs must
    # not create or destroy triangles
    rows = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a"),
        ("c", "b"), (None, "a"), ("c", None),
    ]
    out = _triangles(spark, rows)
    assert out == {
        "a": (2, 1, 1.0), "b": (2, 1, 1.0), "c": (2, 1, 1.0)
    }


def test_triangles_out_degree_cap_drops_low_corner_wedges(spark):
    # K4: every node's oriented out-degree is <= 3; capping at 1
    # removes every wedge corner, so no triangle survives — the
    # documented bounded-recall tradeoff fires loudly, not subtly
    rows = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    out = _triangles(spark, rows, max_out_degree=1)
    assert all(v[1] == 0 for v in out.values())
    full = _triangles(spark, rows, max_out_degree=3)
    assert all(v[1] == 3 for v in full.values())


def test_components_incremental_equals_full_recompute(spark, sf_dir):
    # the star-forest compression must reproduce EXACTLY the components
    # of the full edge union, from O(state + batch) input — organic
    # per-customer order chains split into two waves by orderkey parity
    # of the chain position
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspark_data_drift_detector_spark.operators.graph import (
        components_incremental,
        graph_components,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    chain = (
        orders.select(
            "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev"),
            (F.row_number().over(w) % 2).alias("wave"),
        )
        .filter(F.col("prev").isNotNull())
        .selectExpr("prev AS src", "o_orderkey AS dst", "wave")
    )
    prior = chain.filter("wave = 0").drop("wave")
    batch = chain.filter("wave = 1").drop("wave")
    state = graph_components(prior).drop("component_size")
    inc = {
        (r["node"], r["component_id"], r["component_size"])
        for r in components_incremental(batch, state).collect()
    }
    full = {
        (r["node"], r["component_id"], r["component_size"])
        for r in graph_components(chain.drop("wave")).collect()
    }
    assert inc == full and len(inc) > 0


def test_components_incremental_merges_and_news(spark):
    from pyspark_data_drift_detector_spark.operators.graph import (
        components_incremental,
        graph_components,
    )

    prior = spark.createDataFrame(
        [("a", "b"), ("x", "y")], "src string, dst string"
    )
    state = graph_components(prior).drop("component_size")
    batch = spark.createDataFrame(
        [("b", "x"), ("p", "q")], "src string, dst string"
    )
    out = {
        r["node"]: (r["component_id"], r["component_size"])
        for r in components_incremental(batch, state).collect()
    }
    assert out == {
        "a": ("a", 4), "b": ("a", 4), "x": ("a", 4), "y": ("a", 4),
        "p": ("p", 2), "q": ("p", 2),
    }


def test_components_state_sink_two_batches(spark, tmp_path):
    from pyspark_data_drift_detector_spark.streaming.state_tables import (
        components_state_sink,
    )

    sink = components_state_sink(
        str(tmp_path / "state"), str(tmp_path / "report")
    )
    b0 = spark.createDataFrame(
        [(1, 2), (3, 4)], "src long, dst long"
    )
    b1 = spark.createDataFrame(
        [(2, 3), (10, 11)], "src long, dst long"
    )
    sink(b0, 0)
    sink(b1, 1)
    state = {
        r["node"]: (r["component_id"], r["component_size"])
        for r in spark.read.parquet(str(tmp_path / "state")).collect()
    }
    assert state == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        10: (10, 2), 11: (10, 2),
    }
    rep = {
        r["batch_id"]: r
        for r in spark.read.parquet(str(tmp_path / "report")).collect()
    }
    assert rep[0]["n_nodes"] == 4 and rep[0]["n_components"] == 2
    assert rep[0]["n_new_nodes"] == 4 and rep[0]["n_label_changes"] == 0
    assert rep[1]["n_nodes"] == 6 and rep[1]["n_components"] == 2
    assert rep[1]["n_new_nodes"] == 2
    assert rep[1]["n_label_changes"] == 2  # 3 and 4 relabel to 1


def test_graph_report_one_node_density_is_null_by_convention(spark):
    from pyspark_data_drift_detector_spark.operators.graph import (
        graph_report,
    )

    rep = {
        r["metric"]: r["value"]
        for r in graph_report(
            spark.createDataFrame([("a", "a")], "src string, dst string")
        ).collect()
    }
    assert rep["n_nodes"] == 1.0 and rep["n_self_loops"] == 1.0
    assert rep["density"] is None  # undefined on n*(n-1) = 0, stated
