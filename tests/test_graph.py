"""PageRank: the distributed power iteration must match a dense numpy
reference (same damping, same dangling-mass redistribution) on a graph
derived from the fixtures."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from pixelspark.ops.graph import pagerank
from pixelspark.schemas import load_table


def _numpy_pagerank(edge_list, damping=0.85, iterations=15):
    ids = sorted({v for e in edge_list for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        inflow = np.zeros(n)
        for s, d in edge_list:
            inflow[idx[d]] += r[idx[s]] / out_deg[idx[s]]
        dangling = r[out_deg == 0].sum()
        r = (1.0 - damping) / n + damping * (dangling / n + inflow)
    return {v: r[idx[v]] for v in ids}


def test_pagerank_matches_dense_reference(spark, sf_dir):
    # deterministic directed graph over doc ids: i -> (i*7+3) % 97 and
    # i -> (i*13+5) % 97, which leaves some vertices dangling
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 97)
    edges = docs.select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 7 + 3) % 97).alias("dst")
    ).unionByName(
        docs.select(F.col("doc_id").alias("src"), ((F.col("doc_id") * 13 + 5) % 97).alias("dst"))
    ).where(F.col("src") != F.col("dst"))

    got = {r["id"]: r["rank"] for r in pagerank(edges, iterations=15).collect()}
    want = _numpy_pagerank([(r["src"], r["dst"]) for r in edges.collect()])
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


# ---------------------------------------------------------------------------
# Triangle counting: exact counts on known graphs, orientation
# invariance, and the hub-skew probe that motivates degree orientation.
# ---------------------------------------------------------------------------

from itertools import combinations

from pixelspark.ops.graph import (
    oriented_edges,
    triangle_count,
    undirected_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _count(df):
    return df.collect()[0]["n_triangles"]


def test_triangle_count_known_graphs(spark):
    # K5: C(5,3) = 10 triangles; direction/duplication/self-loops noise
    k5 = [(a, b) for a, b in combinations(range(5), 2)]
    noisy = k5 + [(b, a) for a, b in k5] + [(3, 3)]
    assert _count(triangle_count(_edges(spark, noisy))) == 10
    # a 6-cycle has none; chord 0-2 closes exactly one
    cycle = [(i, (i + 1) % 6) for i in range(6)]
    assert _count(triangle_count(_edges(spark, cycle))) == 0
    assert _count(triangle_count(_edges(spark, cycle + [(0, 2)]))) == 1


def test_triangle_orientations_agree(spark):
    """Degree orientation is a performance choice; the count must be
    identical to the id orientation on an irregular graph."""
    import random

    rng = random.Random(7)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(300)})
    df = _edges(spark, pairs)
    assert _count(triangle_count(df, orient="degree")) == _count(
        triangle_count(df, orient="id")
    )


def test_degree_orientation_bounds_hub_wedge_fanout(spark):
    """The probe behind the production default: on a 1000-spoke star
    whose center carries a mid-range id, id orientation roots ~n^2/4
    wedges at the hub, degree orientation roots ZERO — every edge
    points spoke->center, so no vertex has two out-neighbors.  This is
    the fan-out a power-law hub would inject at 100 TB."""
    center = 500
    star = _edges(spark, [(i, center) for i in range(1001) if i != center])
    und = undirected_edges(star)

    def wedge_count(orient):
        o = oriented_edges(und, orient)
        o1 = o.select(F.col("u"), F.col("w").alias("v1"))
        o2 = o.select(F.col("u"), F.col("w").alias("v2"))
        return o1.join(o2, "u").where(F.col("v1") != F.col("v2")).count()

    assert wedge_count("degree") == 0
    # id order points the hub at its 500 higher-id spokes: the hub roots
    # one ordered pair per (v1, v2) of those out-neighbors
    assert wedge_count("id") == 500 * 499
    assert _count(triangle_count(star)) == 0


def test_k_core_matches_reference_peeling(spark):
    """K5 clique + a pendant chain: the 4-core is exactly the clique
    (the chain peels away over multiple waves); the 2-core of a cycle
    is the whole cycle; an over-demanding k yields an empty core.
    Cross-checked against a brute-force python peeler."""
    from pixelspark.ops.graph import k_core

    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    chain = [(4, 10), (10, 11), (11, 12)]
    cycle = [(20, 21), (21, 22), (22, 23), (23, 20)]
    edges = spark.createDataFrame(
        clique + chain + cycle, "src long, dst long"
    )

    def reference(pairs, k):
        adj: dict[int, set] = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for v in [v for v, ns in adj.items() if len(ns) < k]:
                for n in adj.pop(v):
                    adj[n].discard(v)
                changed = True
        return {v: len(ns) for v, ns in adj.items()}

    for k in (2, 3, 4, 5):
        got = {
            r["id"]: r["degree"]
            for r in k_core(edges, k).collect()
        }
        assert got == reference(clique + chain + cycle, k), k
    assert k_core(edges, 4).count() == 5  # exactly the K5
    assert k_core(edges, 5).count() == 0
