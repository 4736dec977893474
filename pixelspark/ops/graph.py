"""Graph operators over edge DataFrames (src, dst).

Companion to ops/llm.py's connected-components (`dedup_clusters`):
the same edges-as-relation representation, driven by DataFrame joins
so Catalyst handles partitioning.  Iterative algorithms follow the
scale rules that make them survivable on a 1000-executor cluster:

* per-iteration state is ONE relation (the rank vector), re-derived
  by join + groupBy — never collected to the driver;
* lineage is cut with localCheckpoint every few rounds so the plan
  doesn't grow by one join per iteration (the classic iterative-Spark
  OOM);
* the only driver-side values are true scalars (vertex count,
  dangling mass — one double per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 3


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 15,
) -> DataFrame:
    """Distributed PageRank by power iteration on (src, dst) edges.

    Exact textbook formulation: per round each vertex sends
    rank/out_degree along its out-edges; dangling vertices' mass is
    redistributed uniformly (so total rank stays 1 and the result
    matches the dense power iteration bit-for-bit up to float order —
    asserted against a numpy reference in tests/test_graph.py).

    Each round = one join edges-to-ranks (shuffle on src, or
    broadcast when the rank vector is small) + one groupBy dst
    (map-side partial sums).  Degree table is computed once.
    """
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(eager=True)

    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        with_deg = ranks.join(out_deg, ranks.id == out_deg.src, "left")
        # mass of vertices with no out-edges, shared with every vertex.
        # Folded into the plan as a broadcast 1-row aggregate instead
        # of a per-iteration collect(): the scalar round-trip cost one
        # extra Spark job per iteration (driver-side barrier), the
        # broadcast keeps every iteration a single job.
        dangling = F.broadcast(
            with_deg.where(F.col("deg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
            )
        )
        contribs = (
            edges.join(ranks, edges.src == ranks.id)
            .join(out_deg, "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        # same float-op order as the scalar formulation:
        # ((1-d)/n + (d*dangling)/n) + d*inflow
        base = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * F.col("_dangling") / F.lit(float(n))
        )
        ranks = (
            verts.join(contribs, "id", "left")
            .crossJoin(dangling)
            .select(
                "id",
                (base + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        if (i + 1) % CHECKPOINT_EVERY == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected edge set.

    Edges are canonicalized to (a < b) and deduplicated, then each
    wedge a-b-c (two joins) is closed by a semi join probing for the
    (a, c) edge — counting each triangle exactly once because the
    enumeration enforces a < b < c.  Two shuffles (wedge join, closing
    semi join), never a cross join.

    At scale the classic refinement is ORIENTING edges by degree
    (low-degree -> high-degree) instead of by id, which bounds wedge
    fan-out per vertex by sqrt(|E|) and removes hub skew; id order
    keeps this testdata's plan simple and the oracle expressible —
    swap the canonicalization for a degree rank to productionize.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    wedges = e1.join(e2, F.col("y") == F.col("y2")).select("x", "y", "z")
    closed = wedges.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("z")),
        ["x", "z"],
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
