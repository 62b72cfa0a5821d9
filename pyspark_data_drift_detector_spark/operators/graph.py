"""Graph analytics over edge tables — bounded-iteration PageRank.

The reference has no graph surface at all; the nearest in-repo
relatives are the pointer-jumping connected components of
``dedup.neardup_clusters`` (which labels components but cannot rank
WITHIN them) and the key-skew profiler (degree only). PageRank is the
canonical "which entities matter" reduction over relationship data —
supplier criticality from order flows, document authority from link
graphs, user influence from interaction edges.

Design (the 100 TB shape):

- **Fixed iteration count, not convergence-polling.** Each iteration
  is two shuffles (join ranks→edges on src, groupBy dst); ``n_iter``
  bounds total cost at plan-build time and keeps the operator
  deterministic and oracle-replayable (the DuckDB twin unrolls the
  same iterations as CTEs — the ``kmeans_fit`` convention). Power
  iteration converges geometrically (damping 0.85 ⇒ residual ∝
  0.85^k), so small fixed k is the production norm (GraphX defaults
  to the same scheme).
- **Weighted by design.** Rank flows proportional to
  ``weight / out_weight_sum``; the unweighted case is weight 1.
- **Dangling mass redistributed exactly.** Nodes with no out-edges
  leak rank; their total is collected as ONE scalar per iteration
  (1-row aggregate, broadcast back) and spread uniformly — the
  textbook correction, without which ranks no longer sum to 1.
- **Everything stays keyed by node.** No driver-side adjacency; the
  only driver traffic is the per-iteration dangling scalar.

Float caveat (documented): incoming-rank sums are float additions in
shuffle order, so last-ulp differences across runs/engines are
possible; results are compared ROUNDED (the repo-wide 5-decimal
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: Edge-count gate for the single-task PageRank fast path (the
#: dedup.SMALL_COMPONENTS_EDGES convention): below it the deduped
#: weighted edge list is ranked in ONE vectorized NumPy task; above it
#: the distributed per-iteration join/groupBy loop — the 100 TB path —
#: is unchanged.
SMALL_GRAPH_EDGES = 2_000_000


def _pagerank_one_task(
    e: DataFrame, damping: float, n_iter: int, node_type: str
) -> DataFrame:
    """Power iteration over a gathered ``(src, dst, w)`` edge list in one
    task — the same update rule as the distributed loop:
    ``rank' = (1−d)/n + d·(Σ share·rank_src + dangling_mass/n)`` with
    ``share = w / out_weight(src)``. Edges are sorted by (src, dst)
    before factorization so every float accumulation runs in a fixed,
    run-independent order."""

    def fn(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
        m = len(pdf)
        codes, uniq = pd.factorize(
            pd.concat([pdf["src"], pdf["dst"]], ignore_index=True),
            sort=True,
        )
        isrc, idst = codes[:m], codes[m:]
        w = pdf["w"].to_numpy(dtype="float64")
        n = len(uniq)
        ow = np.zeros(n)
        np.add.at(ow, isrc, w)
        share = w / ow[isrc]
        dangling = ow == 0.0
        base = (1.0 - damping) / n
        r = np.full(n, 1.0 / n)
        for _ in range(n_iter):
            inflow = np.zeros(n)
            np.add.at(inflow, idst, share * r[isrc])
            dm = float(r[dangling].sum())
            r = base + damping * (inflow + dm / n)
        return pd.DataFrame({"node": uniq, "rank": r})

    return e.groupBy().applyInPandas(fn, f"node {node_type}, rank double")


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    n_iter: int = 3,
) -> DataFrame:
    """Weighted PageRank over a directed edge table. Returns one row
    per node: ``node, rank`` (ranks sum to 1 over all nodes).

    Nodes are every distinct value appearing as a source OR a
    destination; NULL endpoints and non-positive weights are dropped
    (a NULL node has no identity; zero/negative weight has no flow
    interpretation). Parallel edges are legal — their weights add.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping!r}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            w.alias("w"),
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("w") > 0)
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    # persist the deduped weighted edges FIRST: nodes, out-weights,
    # shares and the dangling set all derive from it, and without the
    # cache each derivation re-executes the upstream edge build
    # (measured 3 redundant scans on a join-built edge table)
    e = e.persist()
    from pyspark.sql import types as T

    st, dt = e.schema["src"].dataType, e.schema["dst"].dataType
    n_edges = e.count()
    if (
        0 < n_edges <= SMALL_GRAPH_EDGES
        and st == dt
        and isinstance(st, (T.IntegralType, T.StringType))
    ):
        # Small-graph fast path (the neardup_clusters convention): the
        # distributed loop costs 2 shuffles + a dangling aggregate + an
        # eager checkpoint PER ITERATION — driver-job scheduling
        # dominates when the deduped edge list is a few MB. One task
        # runs the SAME power iteration (identical update rule, exact
        # dangling redistribution) in vectorized NumPy over the
        # gathered edges, with a fixed accumulation order (edges sorted
        # by key) — within the module's documented float contract
        # (sums are order-sensitive at the last ulp; results compared
        # ROUNDED). Node ids are only indexed, never ordered into the
        # output, so string keys are safe. Above the gate the
        # distributed loop — the 100 TB path — is unchanged.
        compact = e.localCheckpoint(eager=True)
        e.unpersist()
        return _pagerank_one_task(
            compact, damping, n_iter, st.simpleString()
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # edges annotated with their flow share; persisted because the
    # iteration loop references it n_iter times
    out_w = e.groupBy("src").agg(F.sum("w").alias("ow"))
    share = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("share"))
        .persist()
    )
    nodes = nodes.persist()
    n_nodes = nodes.count()  # one action; also materializes the cache
    # the dangling-node set (no out-edges) is loop-invariant: compute it
    # ONCE and persist — inlining the anti-join in the loop would
    # recompute the full edge build every iteration (out_w is upstream
    # of the un-persisted e; measured 2-3x total query cost)
    dangling_nodes = nodes.join(
        out_w.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            share.join(
                ranks.select(
                    F.col("node").alias("src"), F.col("rank").alias("r")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("share") * F.col("r")).alias("inflow"))
        )
        # dangling nodes leak their whole rank: collect the leaked
        # total as one scalar and spread it uniformly
        dangling = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("dm") / n_nodes
                    )
                ).alias("rank"),
            )
        )
        # truncate lineage each superstep (the GraphX materialization
        # convention): without this the lazy plan nests one join layer
        # per iteration and Catalyst analysis time blows up around
        # iteration ~8-10
        ranks = ranks.localCheckpoint(eager=True)
    out = ranks
    share.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    dangling_nodes.unpersist(blocking=False)
    e.unpersist(blocking=False)
    return out


def graph_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Undirected connected components over an arbitrary edge table —
    the membership companion to :func:`graph_report` (which profiles)
    and :func:`pagerank` (which ranks): "which entities are in the
    same blob" is the first question of every entity-graph audit, and
    the same machinery every dedup family already uses internally
    (``dedup.neardup_clusters``'s O(log diameter) min-label pointer
    jumping — delegated to directly, not reimplemented).

    Returns one row per node: ``node, component_id, component_size``
    with ``component_id`` = the MINIMUM node id in the component
    (deterministic labels; for string ids, lexicographic min) and
    ``component_size`` = the number of distinct nodes in it.

    Nodes are every endpoint of a surviving edge; edges with a NULL
    endpoint are dropped whole (same convention as
    :func:`graph_report`), direction is ignored, parallel edges and
    self-loops are harmless. Integral node ids run through the
    pointer-jumping core directly; any other id type (strings —
    entity-graph reality) is mapped to a surrogate integer per node
    first (one ``monotonically_increasing_id`` over the distinct
    nodes, pinned by an eager checkpoint so the mapping is stable
    across the core's iterations) and mapped back at the end — labels
    are still the min ORIGINAL id, so the surrogate never leaks.
    ``max_iter`` bounds the pointer-jumping rounds (the core warns if
    a component is wider than the propagation horizon).
    """
    from pyspark.sql import types as T

    from pyspark_data_drift_detector_spark.operators.dedup import (
        neardup_clusters,
    )

    e = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).filter(F.col("s").isNotNull() & F.col("d").isNotNull())
    integral = isinstance(
        e.schema["s"].dataType,
        (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    ) and isinstance(
        e.schema["d"].dataType,
        (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    )
    if integral:
        comp = neardup_clusters(
            e.select(
                F.col("s").cast("long").alias("id1"),
                F.col("d").cast("long").alias("id2"),
            ),
            max_iter=max_iter,
        )
        sizes = comp.groupBy("cluster_id").agg(
            F.count(F.lit(1)).cast("long").alias("component_size")
        )
        return comp.join(sizes, "cluster_id").select(
            F.col("id").alias("node"),
            F.col("cluster_id").alias("component_id"),
            "component_size",
        )
    # surrogate path: the core's min-label arithmetic (and its exact
    # decimal convergence sum) needs integer ids
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .withColumn("sid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)  # pin sid values before reuse
    )
    pairs = (
        e.join(nodes.select(F.col("node").alias("s"), "sid"), "s")
        .withColumnRenamed("sid", "id1")
        .join(
            nodes.select(F.col("node").alias("d"), F.col("sid").alias("id2")),
            "d",
        )
        .select("id1", "id2")
    )
    comp = neardup_clusters(pairs, max_iter=max_iter)
    labeled = comp.join(
        nodes.select(F.col("sid").alias("id"), "node"), "id"
    ).select("node", F.col("cluster_id").alias("cid"))
    groups = labeled.groupBy("cid").agg(
        F.min("node").alias("component_id"),
        F.count(F.lit(1)).cast("long").alias("component_size"),
    )
    return labeled.join(groups, "cid").select(
        "node", "component_id", "component_size"
    )


def components_incremental(
    batch_edges: DataFrame,
    state: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Vet-the-increment member for graph membership: fold a NEW edge
    batch into existing component labels WITHOUT re-reading the
    historical edge corpus — the star-forest compression trick. Prior
    labels ``(node, component_id)`` have exactly the connectivity of
    every edge ever seen (each component is a star centered on its
    label), so running :func:`graph_components` over ``batch_edges ∪
    {node → component_id}`` reproduces, exactly, the components of the
    FULL union — on an input of size O(state + batch), the additive
    shape every incremental family member in this repo honors (the
    prior corpus is never re-read; pinned by the
    incremental-equals-full-recompute test).

    ``state`` is :func:`graph_components` output (``component_size`` is
    ignored if present). Labels stay "minimum node id in the merged
    component" because prior labels ARE member node ids — a batch that
    bridges two components relabels both to the smaller minimum.
    Returns fresh ``(node, component_id, component_size)`` — the new
    state."""
    star = state.select(
        F.col("node").alias(src_col),
        F.col("component_id").alias(dst_col),
    )
    return graph_components(
        batch_edges.select(
            F.col(src_col), F.col(dst_col)
        ).unionByName(star),
        src_col,
        dst_col,
        max_iter=max_iter,
    )


def graph_triangles(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_out_degree: int | None = None,
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient — the
    COHESION member of the graph family (:func:`pagerank` ranks,
    :func:`graph_components` labels membership, this measures how
    tightly each node's neighborhood closes). Triangle density is the
    canonical "is this a community or a broadcast tree" signal for
    relationship feeds, and a sudden clustering-coefficient shift means
    the feed's generative process changed.

    Returns one row per node of the SIMPLE undirected graph: ``node,
    degree, n_triangles, clustering`` with ``clustering = 2·T /
    (d·(d−1))`` (NULL when ``degree < 2`` — no wedge to close).

    Scale shape — the degree-ordered orientation (the standard
    distributed triangle algorithm): edges are canonicalized
    (NULL-dropped, self-loops dropped, ``(min,max)``-deduped) and then
    ORIENTED from the lower-``(degree, id)`` endpoint to the higher.
    Every triangle has exactly one node whose two triangle edges both
    point OUT (its lowest-ranked corner), so enumerating wedges from
    out-neighbor pairs counts each triangle once, and the per-node
    wedge fan-out is bounded by the oriented out-degree — O(√m) on any
    graph — instead of the raw degree (a hot hub generates NO wedges
    from its own fan-in). Plan: two degree aggregates, one wedge
    self-join on the common LOW corner, one left-semi close check
    against the oriented edges, one explode-to-corners groupBy.

    ``max_out_degree`` is the documented bounded-recall cap (the
    ``max_block_pairs`` convention): nodes whose ORIENTED out-degree
    exceeds it contribute no wedges from their corner — triangles
    whose lowest corner is such a node are not counted. With the
    orientation bound already O(√m) the cap is rarely needed; it
    guards adversarially dense graphs.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .persist()
    )
    # orient each edge toward the higher (degree, id) endpoint
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
    lo_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
        .persist()
    )
    wedge_src = oriented
    if max_out_degree is not None:
        od = oriented.groupBy("lo").agg(F.count(F.lit(1)).alias("__od"))
        ok = od.filter(F.col("__od") <= max_out_degree).select("lo")
        wedge_src = wedge_src.join(ok, "lo", "left_semi")
    # wedges from the common low corner; u < v under the SAME total
    # order used for orientation is implied by taking distinct pairs —
    # id order suffices to emit each unordered out-pair once
    w1 = wedge_src.select(F.col("lo").alias("v"), F.col("hi").alias("x"))
    w2 = wedge_src.select(F.col("lo").alias("v"), F.col("hi").alias("y"))
    wedges = w1.join(w2, "v").filter(F.col("x") < F.col("y"))
    # close the wedge: the third edge is oriented too, but x<y in ID
    # order does not mean x->y in DEGREE order — check both directions
    closed = wedges.join(
        oriented.select(
            F.col("lo").alias("x"), F.col("hi").alias("y")
        ).unionByName(
            oriented.select(F.col("hi").alias("x"), F.col("lo").alias("y"))
        ),
        ["x", "y"],
        "left_semi",
    )
    corners = closed.select(
        F.explode(F.array("v", "x", "y")).alias("node")
    )
    tri = corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    out = (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1.0)),
            ).alias("clustering"),
        )
        .localCheckpoint(eager=True)
    )
    for frame in (oriented, deg, e):
        frame.unpersist(blocking=False)
    return out


def graph_report(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Graph intake health panel — the O(1) long-format report for edge
    tables, answering "is this relationship feed shaped like a graph or
    like a bug?" before anything expensive (PageRank, components) runs:

    - ``n_nodes`` / ``n_edges`` (distinct directed pairs after NULL
      drop) and ``density`` (edges / n·(n−1));
    - ``n_self_loops`` — usually a feed defect;
    - ``max_out_share`` / ``max_in_share`` — the hot-node guard (one
      node owning most edges is the skew that breaks the downstream
      shuffles; same role as ``key_skew_profile`` for joins);
    - ``dangling_share`` — nodes with no out-edges (PageRank leak
      mass);
    - ``reciprocity`` — share of directed edges whose reverse exists
      (≈1 for mutual-follow graphs, ≈0 for bipartite flows; a sudden
      change means the feed's direction convention flipped).

    One distinct + two degree aggregates + one self-join on the edge
    key — every frame after the first pass is O(nodes) or O(1).
    """
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi").agg(
        F.count(F.lit(1)).cast("double").alias("n_recip")
    )
    # node census, out-degrees and in-degrees share ONE groupBy(node)
    # exchange over the endpoint melt (they previously ran as three
    # separate O(edges) shuffles: union+distinct, groupBy(src),
    # groupBy(dst)); every downstream stat is the identical integer
    # aggregate of the same degree multiset
    deg = e.selectExpr(
        "inline(array(named_struct('node', src, 'o', 1, 'i', 0),"
        " named_struct('node', dst, 'o', 0, 'i', 1)))"
    ).groupBy("node").agg(
        F.expr("sum(o) AS od"), F.expr("sum(i) AS id")
    )
    deg_stats = deg.agg(
        F.count(F.lit(1)).cast("double").alias("n_nodes"),
        F.max("od").cast("double").alias("max_out"),
        F.coalesce(F.sum((F.col("od") > 0).cast("int")), F.lit(0))
        .cast("double")
        .alias("n_sources"),
        F.max("id").cast("double").alias("max_in"),
    )
    base = (
        e.agg(
            F.count(F.lit(1)).cast("double").alias("n_edges"),
            F.sum((F.col("src") == F.col("dst")).cast("int"))
            .cast("double")
            .alias("n_self_loops"),
        )
        .crossJoin(F.broadcast(deg_stats))
        .crossJoin(F.broadcast(recip))
    )
    melted = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("metric"), expr.alias("value")
                    )
                    for name, expr in [
                        ("n_nodes", F.col("n_nodes")),
                        ("n_edges", F.col("n_edges")),
                        (
                            # density is UNDEFINED on a 1-node graph
                            # (n·(n−1) = 0): an explicit guard makes the
                            # NULL a stated convention, not a division
                            # artifact
                            "density",
                            F.when(
                                F.col("n_nodes") > 1,
                                F.col("n_edges")
                                / (
                                    F.col("n_nodes")
                                    * (F.col("n_nodes") - 1)
                                ),
                            ),
                        ),
                        ("n_self_loops", F.col("n_self_loops")),
                        (
                            "max_out_share",
                            F.col("max_out") / F.col("n_edges"),
                        ),
                        (
                            "max_in_share",
                            F.col("max_in") / F.col("n_edges"),
                        ),
                        (
                            "dangling_share",
                            (F.col("n_nodes") - F.col("n_sources"))
                            / F.col("n_nodes"),
                        ),
                        (
                            "reciprocity",
                            F.col("n_recip") / F.col("n_edges"),
                        ),
                    ]
                ]
            )
        ).alias("m")
    )
    out = melted.select("m.metric", "m.value").localCheckpoint(eager=True)
    e.unpersist(blocking=False)
    return out
