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
        # materialize the rank vector once per round: both the
        # dangling-mass broadcast aggregate and the contribution join
        # consume `ranks`, so without this the un-checkpointed tail of
        # the lineage re-executed twice per round — and compounded up
        # to 4x between the every-3rd-round checkpoints (r12; guide
        # §2.4 — same relation, one computation; A/B at sf0.1:
        # per-3-rounds-eager 5.3s, per-round-lazy 3.6s, per-round-
        # eager 3.3s warm).  Values are unchanged: the checkpoint
        # preserves rows and partitioning, so aggregate accumulation
        # order is identical.
        ranks = ranks.localCheckpoint(eager=True)
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
        # no periodic every-3rd-round checkpoint needed any more: the
        # per-round EAGER checkpoint above (one blocking job per
        # round — the A/B winner) already truncates the lineage.
        # Superseded rounds' checkpoint blocks are released by the
        # ContextCleaner once the rebound `ranks` drops the last
        # reference, so storage stays O(1) rounds, not O(iterations).
    return ranks


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonicalize (src, dst) to a deduplicated undirected edge set
    (a < b), self-loops dropped."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def oriented_edges(und: DataFrame, orient: str = "degree") -> DataFrame:
    """Orient each undirected edge {a, b} into exactly one directed
    edge (u, w).

    `orient="degree"` (the production path) points every edge from the
    LOWER-degree endpoint to the higher (ties broken by id, so the
    order is total and the oriented graph acyclic).  This is the
    classic hub-skew fix: every vertex's oriented out-degree is
    O(sqrt(|E|)), so wedge enumeration is bounded even on power-law
    graphs — a degree-d hub contributes 0 wedges as a source instead
    of O(d^2).  `orient="id"` keeps the simple a<b orientation (fine
    on near-regular graphs, quadratic on hubs — see the star-graph
    probe in tests/test_graph.py)."""
    if orient == "id":
        return und.select(F.col("a").alias("u"), F.col("b").alias("w"))
    if orient != "degree":
        raise ValueError(f"orient must be 'degree' or 'id', got {orient!r}")
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        und.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    )


def triangle_count(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """Global triangle count over an undirected edge set.

    Orient every edge (degree order by default — see oriented_edges),
    enumerate wedges as ordered pairs of out-neighbors of a common
    source, and close each wedge with a semi join probing for the
    oriented (v1, v2) edge.  The orientation is a total acyclic order,
    so each triangle r1 < r2 < r3 is counted exactly once: only the
    wedge (r2, r3) rooted at r1 finds its closing edge.  Two shuffles
    (wedge self-join on the source, closing semi join), never a cross
    join; the count is orientation-invariant (asserted vs the id
    orientation and the DuckDB oracle)."""
    o = oriented_edges(undirected_edges(edges), orient)
    o1 = o.select(F.col("u"), F.col("w").alias("v1"))
    o2 = o.select(F.col("u"), F.col("w").alias("v2"))
    wedges = (
        o1.join(o2, "u").where(F.col("v1") != F.col("v2")).select("v1", "v2")
    )
    closed = wedges.join(
        o.select(F.col("u").alias("v1"), F.col("w").alias("v2")),
        ["v1", "v2"],
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def k_core(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """Vertices of the k-core — the maximal subgraph where every
    vertex keeps degree >= k after all lower-degree vertices are
    (transitively) removed.  The standard coreness pre-filter for
    community detection and spam-graph pruning.

    Edges are treated as UNDIRECTED (symmetrized, self-loops and
    duplicate pairs dropped).  Peeling runs in waves: each round
    computes degrees (one groupBy with map-side partial counts),
    removes EVERY vertex currently below k (two anti-joins against the
    broadcast-sized peel set), and checkpoints the shrinking edge
    relation so the plan does not grow by a join per round (the
    iterative-Spark discipline shared with pagerank/dedup_clusters).
    Rounds are bounded by the graph's degeneracy-ordering depth, not
    the vertex count — a handful in practice.  Raises on round-budget
    exhaustion rather than returning a wrong (unpeeled) core.

    Returns (id, degree): the surviving vertices with their degree
    inside the core.
    """
    sym = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = sym
    for _ in range(max_rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        low = deg.where(F.col("deg") < k).select("src").localCheckpoint(eager=True)
        if not low.limit(1).collect():
            return deg.select(
                F.col("src").alias("id"),
                F.col("deg").cast("long").alias("degree"),
            )
        cur = (
            cur.join(F.broadcast(low), "src", "left_anti")
            .join(
                F.broadcast(low.select(F.col("src").alias("dst"))),
                "dst",
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"k_core({k}) did not converge within {max_rounds} peeling waves"
    )
