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
