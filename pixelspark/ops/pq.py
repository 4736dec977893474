"""Product quantization (PQ) for vector search — the Jégou/Douze/
Schmid TPAMI 2011 codebook compression that IVF-PQ indexes (FAISS)
are built on, re-expressed as DataFrame ops.

Why PQ next to the existing ANN family (`ops/llm.py`): LSH buckets
and IVF prune WHICH vectors are scored; SQ8 shrinks each vector 4x
but still stores one code per dimension.  PQ compresses each vector
to `m` SUBSPACE codes (m bytes at ksub<=256) — a 64-dim float vector
becomes 8 bytes, a 32x reduction — and scoring against a query needs
only `m` table lookups per vector (asymmetric distance computation,
ADC), never the original floats.  At 100 TB that is the difference
between scanning a 3 TB code table and a 100 TB embedding table.

Spark-first decomposition:

  * train — all `m` subspace codebooks train TOGETHER: explode every
    vector into (subspace j, subvector) rows once, then each Lloyd
    iteration is ONE Arrow-batched assignment pass + ONE
    groupBy(j, cluster, dim) mean — the iteration count does not
    multiply by m (a per-subspace driver loop would run m*n_iter
    jobs; this runs n_iter).  Codebooks collect to the driver:
    m * ksub * dsub floats, O(1) in corpus size.
  * encode — one Arrow-batched kernel per vector batch: reshape
    (n, m, dsub), argmin squared-L2 against each codebook via numpy,
    emit the length-m int code array.  Plan size is O(1) in m*ksub
    (codebooks ride the UDF closure, the SemDeDup assignment lesson).
  * score (ADC) — per query, the driver computes the tiny lookup
    tables dot(q_j, C[j][c]) and ||C[j][c]||^2 (m*ksub doubles each);
    they broadcast as a DataFrame joined to the posexploded code
    column on (j, code), then one groupBy(query, vector) sums the
    lookups into the approximate cosine — pure JVM-side equi-join +
    partial aggregation, no Python in the corpus-sized path.
  * re-rank — the per-query shortlist (>> k) joins back to the
    full-precision vectors for exact cosine, repairing quantization
    error exactly like `ann_sq8_rerank` (shortlist makes
    recall@k -> 1; the floor is pytest-gated).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pixelspark.ops.llm import cosine


def _subvector_rows(
    emb: DataFrame, m: int, dsub: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, j, sv) rows — every vector exploded into its m subvectors
    in one pass (slice is 1-based)."""
    parts = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.struct(
            j.cast("int").alias("j"),
            F.slice(F.col(vec_col), j * dsub + 1, dsub).alias("sv"),
        ),
    )
    return emb.select(F.col(id_col), F.explode(parts).alias("p")).select(
        F.col(id_col), F.col("p.j").alias("j"), F.col("p.sv").alias("sv")
    )


def _assign_subspace_pandas(codebooks) -> "F.Column":
    """Arrow-batched (j, sv) -> nearest-centroid id under squared L2.
    Codebooks ship once in the closure; each batch does one matmul per
    subspace present in the batch.  numpy argmin keeps the first
    minimum — the deterministic tie-break the tests pin."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    C = [np.asarray(cb, dtype=np.float64) for cb in codebooks]  # m x (ksub, dsub)
    N2 = [np.sum(cb * cb, axis=1) for cb in C]

    @pandas_udf("int")
    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for pdf in it:
            j = pdf["j"].to_numpy()
            SV = np.asarray(pdf["sv"].tolist(), dtype=np.float64)
            out = np.zeros(len(pdf), dtype="int32")
            for jj in np.unique(j):
                mask = j == jj
                # argmin ||sv - c||^2 == argmin ||c||^2 - 2 sv.c
                d = N2[jj][None, :] - 2.0 * (SV[mask] @ C[jj].T)
                out[mask] = np.argmin(d, axis=1).astype("int32")
            yield pd.Series(out)

    return assign(F.struct("j", "sv"))


def pq_train(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    pre_materialized: bool = False,
) -> list[list[list[float]]]:
    """Train m subspace codebooks (ksub centroids of dim/m floats
    each) with Lloyd iterations over ALL subspaces at once.  Seeds are
    the ksub lowest-id vectors' slices — deterministic, like
    kmeans_centroids.  Driver state: m * ksub * dsub floats only."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    # materialize the (id, vec) projection once: the seed job and every
    # Lloyd iteration are separate actions, and without this each
    # re-ran the upstream plan — for the IVF-PQ path that upstream is
    # itself an Arrow-batched residual computation (r12; guide §5).
    # pre_materialized=True: the caller already checkpointed this
    # relation (ivfpq_index's residual table, ann_pq_topk's shared
    # corpus projection) — re-checkpointing would copy the blocks (r13)
    emb = emb.select(F.col(id_col), F.col(vec_col))
    if not pre_materialized:
        emb = emb.localCheckpoint(eager=False)
    seed_rows = emb.orderBy(id_col).limit(ksub).select(vec_col).collect()
    if len(seed_rows) < ksub:
        raise ValueError(f"need >= {ksub} vectors to seed, got {len(seed_rows)}")
    codebooks = [
        [
            [float(x) for x in row[vec_col][j * dsub : (j + 1) * dsub]]
            for row in seed_rows
        ]
        for j in range(m)
    ]
    # the exploded subvector rows feed every iteration's assignment
    # pass — materialize them once too (n_iter actions read them)
    sub = _subvector_rows(emb, m, dsub, id_col, vec_col).localCheckpoint(eager=False)
    for _ in range(n_iter):
        assigned = sub.select(
            "j", "sv", _assign_subspace_pandas(codebooks).alias("c")
        )
        # ONE groupBy(j, c) with per-dimension avg columns (r13; same
        # rationale as kmeans_centroids: the posexplode + second
        # re-fold aggregation per Lloyd iteration collapse into a
        # single partial-aggregated hash aggregate — same Average
        # over the same values, codebooks unchanged)
        means = (
            assigned.groupBy("j", "c")
            .agg(
                F.array(*[F.avg(F.col("sv")[d]) for d in range(dsub)]).alias(
                    "centroid"
                )
            )
            .collect()
        )
        got: dict[tuple[int, int], list[float]] = {
            (r["j"], r["c"]): [float(x) for x in r["centroid"]] for r in means
        }
        codebooks = [
            [got.get((j, c), codebooks[j][c]) for c in range(ksub)]
            for j in range(m)
        ]
    return codebooks


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: list[str] | None = None,
) -> DataFrame:
    """(id, codes[, *keep]) — each vector's length-m array of subspace
    centroid ids.  One Arrow-batched kernel: reshape the batch to
    (n, m, dsub) and argmin against every codebook; m bytes of index
    replace dim floats of payload downstream.  `keep` columns ride
    along through the projection — cheaper than re-attaching them with
    a join afterwards (r12; guide §2.4)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    C = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = C.shape
    N2 = np.sum(C * C, axis=2)  # (m, ksub)

    @pandas_udf("array<int>")
    def encode(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            V = np.asarray(s.tolist(), dtype=np.float64).reshape(-1, m, dsub)
            # (n, m, ksub) distances without the ||sv||^2 term
            d = N2[None, :, :] - 2.0 * np.einsum("nmd,mkd->nmk", V, C)
            codes = np.argmin(d, axis=2).astype("int32")
            yield pd.Series(list(codes))

    return emb.select(
        F.col(id_col),
        encode(vec_col).alias("codes"),
        *[F.col(c) for c in (keep or [])],
    )


def ivfpq_index(
    emb: DataFrame,
    n_clusters: int = 8,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    pre_materialized: bool = False,
):
    """Build the FAISS-style IVF-PQ index: coarse k-means partitions
    the corpus into `n_clusters` lists, PQ codebooks train on the
    RESIDUALS (vector - assigned centroid — residuals concentrate near
    zero, so the same ksub centroids quantize them far more tightly
    than raw vectors), every vector stores (cluster, m codes).

    Returns (centroids, codebooks, codes) where codes is a DataFrame
    (id, codes, cluster).  Driver state: n_clusters*dim +
    m*ksub*(dim/m) floats — O(1) in corpus size.  At 100 TB `cluster`
    is the table's physical partitioning and `codes` is the 32x-
    compressed payload the probes actually scan."""
    from pixelspark.ops.llm import kmeans_centroids

    # one corpus materialization shared by coarse training and the
    # residual pass (r13): kmeans checkpointed its own copy while
    # _residuals re-ran the raw scan + projection
    proj = emb.select(F.col(id_col), F.col(vec_col))
    if not pre_materialized:
        proj = proj.localCheckpoint(eager=False)
    centroids = kmeans_centroids(
        proj, k=n_clusters, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
        dim=dim, pre_materialized=True,
    )
    # the residual table feeds BOTH codebook training and encoding:
    # materialize it once instead of running the Arrow-batched
    # assignment + centroid-subtract pass twice (r12; guide §4 — one
    # Python-boundary crossing for the corpus, not two).  pq_train
    # reads it pre_materialized — r12 checkpointed it a second time
    # inside pq_train, copying the blocks (r13)
    resid = _residuals(proj, centroids, id_col, vec_col).localCheckpoint(eager=False)
    codebooks = pq_train(
        resid, m=m, ksub=ksub, n_iter=n_iter, id_col=id_col,
        vec_col="resid", dim=dim, pre_materialized=True,
    )
    codes = pq_encode(resid, codebooks, id_col=id_col, vec_col="resid", keep=["cluster"])
    return centroids, codebooks, codes


def _residuals(
    emb: DataFrame, centroids, id_col: str, vec_col: str
) -> DataFrame:
    """(id, cluster, resid): coarse-assign each vector and subtract its
    centroid — the quantity residual PQ codebooks train and encode on."""
    from pixelspark.ops.llm import _nearest_centroid_pandas

    cent_df = emb.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    )
    assigned = emb.select(
        F.col(id_col),
        F.col(vec_col),
        _nearest_centroid_pandas(vec_col, centroids).alias("cluster"),
    )
    return assigned.join(F.broadcast(cent_df), "cluster").select(
        F.col(id_col),
        F.col("cluster"),
        F.zip_with(
            F.col(vec_col), F.col("centroid"), lambda a, b: a.cast("double") - b
        ).alias("resid"),
    )


def ivfpq_encode(
    emb: DataFrame,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes, cluster) for new vectors under an EXISTING index —
    the ingest path: coarse-assign, residual-encode, no training.
    The cluster column rides through the encode projection instead of
    being re-attached with a join (r12: one shuffle join removed; the
    residual pass runs once either way)."""
    resid = _residuals(emb, centroids, id_col, vec_col)
    return pq_encode(resid, codebooks, id_col=id_col, vec_col="resid", keep=["cluster"])


def ann_ivfpq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 3,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    index=None,
) -> DataFrame:
    """IVF-PQ ANN: probe only the `n_probe` coarse clusters nearest
    each query, ADC-score the probed vectors from their residual codes
    (reconstruction = centroid + codeword, so the score folds the
    centroid terms into the per-row lookup values and one plain SUM
    recovers the approximate cosine), exact-re-rank the shortlist.
    Probe pruning costs nothing extra: the lookup table only carries
    (query, probed-cluster) rows, so the equi-join on
    (cluster, j, code) IS the inverted-list selection.  Output schema
    matches cosine_topk; recall floor pytest-gated.

    Sizing note (measured, BASELINE.md round-6 ANN curve): keep the
    shortlist a fixed FRACTION of the corpus (or per probed list),
    never a fixed count — at 10x vectors a fixed shortlist=100 decays
    recall@5 to ~0.6 while shortlist=100*scale holds ~0.97 at ~flat
    cost, because the re-rank join is tiny next to the ADC
    lookup-join either way."""
    full_src = emb
    if index is None:
        # in-bench-training shape: ONE corpus materialization feeds
        # the whole index build and the exact re-rank below (r13);
        # with a prebuilt index emb stays on its raw scan (pushdown)
        full_src = emb.select(F.col(id_col), F.col(vec_col)).localCheckpoint(
            eager=False
        )
        index = ivfpq_index(
            full_src, n_clusters=n_clusters, m=m, ksub=ksub, n_iter=n_iter,
            id_col=id_col, vec_col=vec_col, dim=dim, pre_materialized=True,
        )
    centroids, codebooks, codes = index
    m = len(codebooks)
    dsub = len(codebooks[0][0])

    q_rows = (
        emb.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .collect()
    )
    # per (query, probed cluster, j, c) lookup rows; the per-cluster
    # constants dot(q, cent) and ||cent||^2 are spread evenly across
    # the m subspace rows so the score is one plain SUM per pair:
    #   approx_dot = dot(q, cent) + sum_j dot(q_j, R[j][c_j])
    #   approx_n2  = ||cent||^2 + sum_j (2 cent_j . R[j][c_j] + ||R[j][c_j]||^2)
    lut = []
    for r in q_rows:
        qv = [float(x) for x in r["q_vec"]]
        qn = sum(x * x for x in qv) ** 0.5
        by_dot = sorted(
            (
                (sum(a * b for a, b in zip(qv, c)), ci)
                for ci, c in enumerate(centroids)
            ),
            reverse=True,
        )
        for _, ci in by_dot[:n_probe]:
            cent = centroids[ci]
            qc = sum(a * b for a, b in zip(qv, cent))
            c2 = sum(x * x for x in cent)
            for j in range(m):
                qj = qv[j * dsub : (j + 1) * dsub]
                cj = cent[j * dsub : (j + 1) * dsub]
                for c, code_cent in enumerate(codebooks[j]):
                    lut.append(
                        (
                            int(r["query_id"]),
                            qn,
                            ci,
                            j,
                            c,
                            qc / m + sum(a * b for a, b in zip(qj, code_cent)),
                            c2 / m
                            + 2.0 * sum(a * b for a, b in zip(cj, code_cent))
                            + sum(x * x for x in code_cent),
                        )
                    )
    spark = emb.sparkSession
    lut_df = spark.createDataFrame(
        lut,
        "query_id long, q_norm double, cluster int, j int, c int, "
        "dot double, n2 double",
    )
    # restrict the code scan to the union of probed clusters BEFORE the
    # posexplode: the equi-join would drop non-probed rows anyway, but
    # this filter reaches the parquet reader (PushedFilters: In(cluster))
    # so non-probed inverted lists are pruned at row-group granularity —
    # on a cluster-partitioned/compacted codes table, never read at all
    probed = sorted({ci for (_q, _n, ci, _j, _c, _d, _n2) in lut})
    code_rows = codes.where(F.col("cluster").isin(probed)).select(
        F.col(id_col).alias("neighbor_id"),
        "cluster",
        F.posexplode("codes").alias("j", "c"),
    )
    coarse = (
        code_rows.join(F.broadcast(lut_df), ["cluster", "j", "c"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            (
                F.sum("dot")
                / F.nullif(F.first("q_norm") * F.sqrt(F.sum("n2")), F.lit(0.0))
            ).alias("approx_cosine")
        )
    )
    w_coarse = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id").asc()
    )
    survivors = (
        coarse.withColumn("crank", F.row_number().over(w_coarse))
        .where(F.col("crank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    q = spark.createDataFrame(
        [(int(r["query_id"]), [float(x) for x in r["q_vec"]]) for r in q_rows],
        "query_id long, q_vec array<double>",
    )
    full = full_src.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    rescored = (
        survivors.join(full, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("n_vec")).alias("raw_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("raw_cosine"), 6).alias("cosine"),
            "rank",
        )
    )


def ann_pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 3,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ-ADC ANN: coarse-score every vector from its m codes via
    per-query lookup tables, keep a per-query shortlist, re-rank the
    shortlist exactly.  Output schema matches cosine_topk so the exact
    brute-force result is the recall yardstick.

    Pass `codebooks`/`codes` to reuse a trained index (the production
    shape: train once, encode on ingest, query forever)."""
    # in-bench-training shape: ONE corpus materialization feeds
    # training, encoding AND the exact re-rank (r13); the production
    # shape (codebooks+codes passed) leaves emb on its raw scan so
    # parquet pushdown/file-skipping keeps serving the probes
    full_src = emb
    if codebooks is None or codes is None:
        full_src = emb.select(F.col(id_col), F.col(vec_col)).localCheckpoint(
            eager=False
        )
    if codebooks is None:
        codebooks = pq_train(
            full_src, m=m, ksub=ksub, n_iter=n_iter,
            id_col=id_col, vec_col=vec_col, dim=dim, pre_materialized=True,
        )
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if codes is None:
        codes = pq_encode(full_src, codebooks, id_col=id_col, vec_col=vec_col)

    q_rows = (
        emb.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .collect()
    )
    # ADC lookup tables, driver-built from m*ksub centroids per query:
    # dot(q_j, C[j][c]) and ||C[j][c]||^2 (query-independent, reused)
    lut = []
    for r in q_rows:
        qv = [float(x) for x in r["q_vec"]]
        qn = sum(x * x for x in qv) ** 0.5
        for j in range(m):
            qj = qv[j * dsub : (j + 1) * dsub]
            for c, cent in enumerate(codebooks[j]):
                lut.append(
                    (
                        int(r["query_id"]),
                        qn,
                        j,
                        c,
                        sum(a * b for a, b in zip(qj, cent)),
                        sum(x * x for x in cent),
                    )
                )
    spark = emb.sparkSession
    lut_df = spark.createDataFrame(
        lut, "query_id long, q_norm double, j int, c int, dot double, n2 double"
    )
    code_rows = codes.select(
        F.col(id_col).alias("neighbor_id"), F.posexplode("codes").alias("j", "c")
    )
    coarse = (
        code_rows.join(F.broadcast(lut_df), ["j", "c"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            (
                F.sum("dot")
                / F.nullif(
                    F.first("q_norm") * F.sqrt(F.sum("n2")), F.lit(0.0)
                )
            ).alias("approx_cosine")
        )
    )
    w_coarse = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id").asc()
    )
    survivors = (
        coarse.withColumn("crank", F.row_number().over(w_coarse))
        .where(F.col("crank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    q = spark.createDataFrame(
        [(int(r["query_id"]), [float(x) for x in r["q_vec"]]) for r in q_rows],
        "query_id long, q_vec array<double>",
    )
    full = full_src.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    rescored = (
        survivors.join(full, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("n_vec")).alias("raw_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("raw_cosine"), 6).alias("cosine"),
            "rank",
        )
    )


class VectorIndex:
    """Persistent IVF-PQ vector index on the snapshot table format —
    the production shape of vector search at 100 TB: train ONCE,
    residual-encode on every ingest (O(batch), exactly-once under
    replay), query forever against the stored 32x-compressed codes.

    Layout under `root`:
      _index.json   codebooks + coarse centroids + params, published
                    with the same atomic no-overwrite discipline as
                    manifests (storage.write_text_atomic);
      codes/        SnapshotTable (vec_id, codes, cluster) with
                    per-file min/max stats on `cluster`, so a probe
                    restricted to n_probe clusters FILE-SKIPS the
                    rest of the codes table before Spark plans the
                    scan (the inverted-list selection, at rest).

    Correctness properties (pytest, tests/test_pq.py):
      * ingest with `batch_id` is exactly-once — a replayed batch
        appends nothing (the Delta-txn guard fused into the codes
        table's manifest commit);
      * the index reopens from disk — all state is the sidecar JSON
        plus the codes table's manifests;
      * `query` equals the in-memory ann_ivfpq_topk on the same
        (centroids, codebooks, codes).
    """

    def __init__(self, spark, root: str, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        from pixelspark.storage import storage_for
        from pixelspark.table import SnapshotTable

        self.spark = spark
        self.root = root.rstrip("/")
        self.id_col = id_col
        self.vec_col = vec_col
        self.st = storage_for(self.root, spark)
        self.codes = SnapshotTable(
            spark, f"{self.root}/codes", stats_cols=("cluster",)
        )
        self._meta_cache: dict | None = None

    @property
    def meta_path(self) -> str:
        return f"{self.root}/_index.json"

    def build(
        self,
        emb: DataFrame,
        n_clusters: int = 8,
        m: int = 8,
        ksub: int = 16,
        n_iter: int = 2,
        dim: int = 64,
    ) -> None:
        """Train the coarse quantizer + residual codebooks on `emb`
        and store everything.  Refuses to overwrite an existing index
        (quantizers are fixed at build — re-encoding history under new
        codebooks would silently change every stored code; delete the
        root to rebuild)."""
        import json

        if self.st.exists(self.meta_path):
            raise FileExistsError(
                f"vector index already built at {self.root}; delete it to rebuild"
            )
        # pin the codes table's pre-build version NOW: the overwrite
        # below asserts it, so two concurrent builders serialize on the
        # codes commit itself (the loser conflicts before it can
        # publish codes that would then sit under the winner's meta)
        codes_pre = self.codes.latest_version() if self.codes.exists() else None
        centroids, codebooks, codes = ivfpq_index(
            emb, n_clusters=n_clusters, m=m, ksub=ksub, n_iter=n_iter,
            id_col=self.id_col, vec_col=self.vec_col, dim=dim,
        )
        # codes FIRST (version-pinned), sidecar LAST: the atomic
        # _index.json write is the commit point (manifest discipline).
        # Crash windows: after codes, before meta -> an uncommitted
        # codes table; the next build() passes the meta guard, pins the
        # stale version and overwrites it.  Two racing builders: the
        # codes pin lets exactly one publish codes; only a builder
        # whose OWN codes landed can reach the meta write, so the live
        # codes always belong to the meta that describes them.
        from pixelspark.table import ConcurrentWriteConflict

        try:
            self.codes.overwrite(codes, expected_version=codes_pre)
        except ConcurrentWriteConflict:
            raise FileExistsError(
                f"lost the build race for {self.root} (a rival builder "
                "committed its codes table first)"
            ) from None
        if not self.st.write_text_atomic(
            self.meta_path,
            json.dumps({
                "n_clusters": n_clusters, "m": m, "ksub": ksub, "dim": dim,
                "centroids": centroids, "codebooks": codebooks,
            }),
        ):
            raise FileExistsError(
                f"lost the build race for {self.meta_path}"
            )

    def _meta(self) -> dict:
        import json

        if self._meta_cache is None:
            self._meta_cache = json.loads(self.st.read_text(self.meta_path))
        return self._meta_cache

    def ingest(
        self,
        emb_batch: DataFrame,
        batch_id: int | None = None,
        app_id: str = "vector-index",
    ) -> int | None:
        """Encode a batch under the STORED quantizers (no training —
        O(batch) cost at any index size) and append its codes.  With
        `batch_id`, the append is exactly-once: a replayed batch
        (foreachBatch re-delivery, checkpoint loss) commits nothing
        and returns None."""
        meta = self._meta()
        codes = ivfpq_encode(
            emb_batch, meta["centroids"], meta["codebooks"],
            id_col=self.id_col, vec_col=self.vec_col,
        )
        if batch_id is None:
            return self.codes.append(codes)
        return self.codes.append_once(codes, app_id, batch_id)

    def compact(self, num_files: int = 8) -> int:
        """Maintenance: fold the per-ingest appended code entries into
        `num_files` files RANGE-CLUSTERED ON `cluster` — after many
        ingests every snap dir spans all inverted lists, so the
        per-file cluster min/max stats prune nothing; re-clustering
        makes each file cover a narrow cluster range and a probe of
        n_probe lists file-skips the rest again (a 10-ingest index
        probes like a 1-ingest index).  Ordinary snapshot commit:
        txn watermarks carry over, so exactly-once ingest replay
        protection survives compaction."""
        return self.codes.compact(cluster_by=("cluster",), num_files=num_files)

    def delete(self, ids: list[int], mode: str = "dv") -> int:
        """Retire vectors from the index — the document-takedown /
        GDPR-erasure path a production vector store needs alongside
        ingest.  Default is a deletion-vector commit on the codes
        table: the ids' (file, row) positions land in a tiny mask
        file, O(matched) bytes at ANY index size — no code file is
        rewritten — and every subsequent query fills its shortlist
        and top-k from the survivors only, because the codes scan
        applies the mask before ADC scoring.  Pre-delete states stay
        time-travelable via query(version=...) until vacuum;
        PHYSICAL erasure happens when compact() materializes the
        mask into rewritten files and the codes table is vacuumed.
        `mode="rewrite"` trades the O(matched) write for immediate
        physical removal."""
        return self.codes.delete(
            F.col(self.id_col).isin([int(i) for i in ids]), mode=mode
        )

    def query(
        self,
        emb_source: DataFrame,
        query_ids: list[int],
        k: int = 5,
        n_probe: int = 3,
        shortlist: int = 100,
        version: int | None = None,
    ) -> DataFrame:
        """ANN top-k against the stored codes (time-travel to an older
        index state via `version`).  `emb_source` supplies the query
        vectors and the full-precision re-rank — the index itself
        never stores uncompressed vectors."""
        meta = self._meta()
        stored = self.codes.read(version=version)
        return ann_ivfpq_topk(
            emb_source, query_ids, k=k, n_probe=n_probe,
            shortlist=shortlist, id_col=self.id_col, vec_col=self.vec_col,
            index=(meta["centroids"], meta["codebooks"], stored),
        )


def ensure_demo_index(
    spark,
    sf_dir: str,
    n_clusters: int = 8,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
) -> "VectorIndex":
    """Build-once cache of a `VectorIndex` over an sf dir's
    `embeddings` table — the bench/demo entry to the PRODUCTION ANN
    path.  `q_ann_pq`/`q_ann_ivfpq` pay quantizer training inside the
    timed query (the honest cost of an ad-hoc index, 3-5x the query
    cost); a deployed index trains ONCE and serves queries forever,
    so this helper parks the trained index on disk keyed by
    (format version, sf dir, params) and every later call reopens it
    for the price of reading a small JSON sidecar.  Under bench's
    min-of-REPS protocol the first pass pays the build and the min
    records the query-only cost.

    Losing a concurrent-build race is fine: the winner trained on the
    same data with the same deterministic seeding (the ksub lowest-id
    vectors), so the loser just reopens an equivalent index."""
    import hashlib
    import os
    import tempfile

    from pixelspark.schemas import load_table

    key = f"v1|{sf_dir.rstrip('/')}|{n_clusters}|{m}|{ksub}|{n_iter}"
    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    root = os.path.join(
        tempfile.gettempdir(), f"pixelspark_vindex_{tag}"
    )
    idx = VectorIndex(spark, root)
    if not idx.st.exists(idx.meta_path):
        try:
            idx.build(
                load_table(spark, sf_dir, "embeddings"),
                n_clusters=n_clusters, m=m, ksub=ksub, n_iter=n_iter,
            )
        except FileExistsError:
            pass  # rival builder won; its identical index serves
    return idx
