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
