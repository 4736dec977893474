"""Product-quantization tests: codebook shapes and determinism,
encode/decode reconstruction sanity, the ADC recall floor against the
exact brute-force baseline, and index reuse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixelspark.ops.llm import cosine_topk
from pixelspark.ops.pq import ann_pq_topk, pq_encode, pq_train
from pixelspark.schemas import load_table

QUERY_IDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=8, ksub=16, n_iter=2)


def test_codebook_shape_and_determinism(emb, books):
    assert len(books) == 8
    assert all(len(cb) == 16 for cb in books)
    assert all(len(c) == 8 for cb in books for c in cb)
    again = pq_train(emb.repartition(5), m=8, ksub=16, n_iter=2)
    for j in range(8):
        for c in range(16):
            assert books[j][c] == pytest.approx(again[j][c], abs=1e-9)


def test_encode_codes_in_range_and_deterministic(emb, books):
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])
    again = {r["vec_id"]: r["codes"] for r in pq_encode(emb.repartition(3), books).collect()}
    for r in codes:
        assert again[r["vec_id"]] == r["codes"]


def test_encode_picks_nearest_centroid(spark, books):
    # a vector that IS a concatenation of centroids must encode to
    # exactly those centroid ids (distance zero beats everything)
    vec = [x for j in range(8) for x in books[j][3]]
    df = spark.createDataFrame([(99, vec)], "vec_id long, embedding array<double>")
    got = pq_encode(df, books).collect()[0]["codes"]
    assert got == [3] * 8


def test_pq_recall_floor_vs_exact(spark, emb):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, QUERY_IDS, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_pq_topk(
            emb, QUERY_IDS, k=5, m=8, ksub=16, n_iter=2, shortlist=100
        ).collect()
    }
    # shortlist = 20% of this 500-vector corpus; at scale the ratio is
    # far smaller (10k of billions) — the gate pins the ADC ordering
    # quality, not the ratio
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(approx))


def test_index_reuse_matches_fresh_train(emb, books):
    codes = pq_encode(emb, books)
    reused = ann_pq_topk(
        emb, QUERY_IDS, k=5, shortlist=100, codebooks=books, codes=codes
    ).collect()
    fresh = ann_pq_topk(
        emb, QUERY_IDS, k=5, m=8, ksub=16, n_iter=2, shortlist=100
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["neighbor_id"], r["rank"]) for r in reused]
    ) == sorted([(r["query_id"], r["neighbor_id"], r["rank"]) for r in fresh])


def test_ivfpq_recall_floor_and_probe_monotonicity(spark, emb):
    from pixelspark.ops.pq import ann_ivfpq_topk, ivfpq_index

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, QUERY_IDS, k=5).collect()
    }
    idx = ivfpq_index(emb, n_clusters=8, m=8, ksub=16, n_iter=2)
    got = {}
    for n_probe in (1, 3):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_ivfpq_topk(
                emb, QUERY_IDS, k=5, n_probe=n_probe, shortlist=100, index=idx
            ).collect()
        }
        got[n_probe] = len(approx & exact) / len(exact)
    assert got[3] >= 0.9, got
    # probing more lists can only widen the candidate set
    assert got[3] >= got[1], got


def test_ivfpq_residual_codes_cover_clusters(emb):
    from pixelspark.ops.pq import ivfpq_index

    centroids, codebooks, codes = ivfpq_index(emb, n_clusters=8, m=8, ksub=16, n_iter=2)
    assert len(centroids) == 8 and len(codebooks) == 8
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert {r["cluster"] for r in rows} <= set(range(8))
    for r in rows:
        assert len(r["codes"]) == 8 and all(0 <= c < 16 for c in r["codes"])


def test_registry_queries_run(spark, sf_dir):
    from pixelspark.queries import QUERIES

    for qname in ("q_ann_pq", "q_ann_ivfpq"):
        out = QUERIES[qname](spark, sf_dir)
        assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
        rows = out.collect()
        per_q: dict[int, list[int]] = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert set(per_q) == set(QUERY_IDS), qname
        for ranks in per_q.values():
            assert sorted(ranks) == [1, 2, 3, 4, 5]


@pytest.mark.slow  # deep end-to-end matrix: certification tier (r13; pytest.ini)
def test_vector_index_build_ingest_query_reopen(spark, sf_dir, tmp_path):
    """Persistent IVF-PQ index lifecycle: build stores quantizers +
    codes; query equals the in-memory path on the same state; ingest
    is O(batch) encode + append and exactly-once under replay; the
    index reopens from disk; double-build is refused."""
    from pixelspark.ops.pq import VectorIndex, ann_ivfpq_topk
    from pixelspark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where("vec_id < 400")
    idx = VectorIndex(spark, str(tmp_path / "vidx"))
    idx.build(base, n_clusters=8, m=8, ksub=16, n_iter=2)

    meta = idx._meta()
    stored = idx.codes.read()
    assert stored.count() == 400
    direct = ann_ivfpq_topk(
        emb, [0, 1, 2], k=5, n_probe=3, shortlist=100,
        index=(meta["centroids"], meta["codebooks"], stored),
    ).collect()
    via_index = idx.query(emb, [0, 1, 2], k=5, n_probe=3, shortlist=100).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    assert sorted(map(key, via_index)) == sorted(map(key, direct))

    # exactly-once ingest: same batch twice adds nothing
    batch = emb.where("vec_id >= 400")
    assert idx.ingest(batch, batch_id=1) is not None
    assert idx.codes.read().count() == 500
    assert idx.ingest(batch, batch_id=1) is None  # replay
    assert idx.codes.read().count() == 500

    # newly ingested vectors are findable
    got = {r["neighbor_id"] for r in idx.query(emb, [450], k=5).collect()}
    assert len(got) == 5

    # reopens from disk (same answer as the live handle, post-ingest);
    # time travel back to the pre-ingest codes reproduces via_index;
    # a second build is refused
    idx2 = VectorIndex(spark, str(tmp_path / "vidx"))
    now = idx.query(emb, [0, 1, 2], k=5, n_probe=3, shortlist=100).collect()
    again = idx2.query(emb, [0, 1, 2], k=5, n_probe=3, shortlist=100).collect()
    assert sorted(map(key, again)) == sorted(map(key, now))
    pre_ingest = idx2.query(
        emb, [0, 1, 2], k=5, n_probe=3, shortlist=100, version=1
    ).collect()
    assert sorted(map(key, pre_ingest)) == sorted(map(key, via_index))
    with pytest.raises(FileExistsError):
        idx2.build(base)

    # cluster stats land in the manifest (the file-skip path at rest)
    m0 = idx.codes.manifest(idx.codes.latest_version())
    assert any(e.get("stats") for e in m0["entries"])


def test_vector_index_compact_preserves_answers_and_tightens_stats(
    spark, sf_dir, tmp_path
):
    """compact() re-clusters the codes on `cluster` after many
    ingests: answers are unchanged, the manifest folds to bounded
    entries with tight per-file cluster stats (the file-skip path
    works again), and exactly-once replay survives the commit."""
    from pixelspark.ops.pq import VectorIndex
    from pixelspark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = VectorIndex(spark, str(tmp_path / "vidx_c"))
    idx.build(emb.where("vec_id < 200"), n_clusters=8, m=8, ksub=16, n_iter=2)
    for i in range(1, 4):  # three ingests widen the scan union
        idx.ingest(
            emb.where(f"vec_id >= {100 + 100 * i} and vec_id < {200 + 100 * i}"),
            batch_id=i,
        )
    m_before = idx.codes.manifest(idx.codes.latest_version())
    assert len(m_before["entries"]) == 4
    before = idx.query(emb, [0, 7, 42], k=5, n_probe=3, shortlist=100).collect()
    idx.compact(num_files=4)
    m_after = idx.codes.manifest(idx.codes.latest_version())
    assert len(m_after["entries"]) == 1
    # per-file cluster ranges are now narrow: no file spans every list
    stats = m_after["entries"][0]["stats"]
    n_clusters = 8
    assert any(
        s["cluster"][1] - s["cluster"][0] < n_clusters - 1
        for s in stats.values()
    )
    after = idx.query(emb, [0, 7, 42], k=5, n_probe=3, shortlist=100).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    assert sorted(map(key, after)) == sorted(map(key, before))
    # replay protection survived compaction
    n = idx.codes.read().count()
    assert idx.ingest(emb.where("vec_id >= 400 and vec_id < 500"), batch_id=3) is None
    assert idx.codes.read().count() == n


def test_vector_index_build_crash_window_recoverable(spark, sf_dir, tmp_path):
    """The sidecar _index.json is the COMMIT POINT (written last): a
    crash mid-build leaves codes without meta, and a retried build()
    must succeed — never the wedged sidecar-without-codes state that
    the old meta-first order produced."""
    from pixelspark.ops.pq import VectorIndex
    from pixelspark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings").where("vec_id < 200")
    root = str(tmp_path / "vidx_crash")
    idx = VectorIndex(spark, root)

    # simulate the crash between codes.overwrite and the sidecar write
    orig = idx.st.write_text_atomic

    def boom(path, text):
        if path.endswith("_index.json"):
            raise RuntimeError("simulated crash before sidecar publish")
        return orig(path, text)

    idx.st.write_text_atomic = boom
    with pytest.raises(RuntimeError, match="simulated"):
        idx.build(emb, n_clusters=4, m=8, ksub=16, n_iter=1)
    idx.st.write_text_atomic = orig
    assert not idx.st.exists(idx.meta_path)  # no torn commit visible

    # retry on a fresh handle: passes the guard, overwrites the
    # uncommitted codes, and the index is fully usable
    idx2 = VectorIndex(spark, root)
    idx2.build(emb, n_clusters=4, m=8, ksub=16, n_iter=1)
    got = idx2.query(emb, [0, 1], k=3, n_probe=2, shortlist=50).collect()
    assert {r["query_id"] for r in got} == {0, 1}


def test_streaming_ingest_into_vector_index(spark, sf_dir, tmp_path):
    """foreachBatch ingest into the persistent index is exactly-once:
    a checkpoint-loss replay of the same stream (fresh checkpoint,
    same batch ids) re-delivers every batch and indexes nothing twice;
    streamed vectors are queryable."""
    from pixelspark.ops.pq import VectorIndex
    from pixelspark.schemas import load_table
    from pixelspark.streaming import daily as SD

    emb = load_table(spark, sf_dir, "embeddings")
    idx_root = str(tmp_path / "vidx")
    idx = VectorIndex(spark, idx_root)
    idx.build(emb.where("vec_id < 300"), n_clusters=8, m=8, ksub=16, n_iter=2)

    src = str(tmp_path / "incoming")
    emb.where("vec_id >= 300").write.parquet(src)
    stream = spark.readStream.schema(
        emb.schema
    ).parquet(src)
    SD.run_vector_index_sink(stream, idx_root, str(tmp_path / "ckpt"))
    assert idx.codes.read().count() == 500

    # checkpoint loss: fresh checkpoint, same source -> same batch ids
    stream2 = spark.readStream.schema(emb.schema).parquet(src)
    SD.run_vector_index_sink(stream2, idx_root, str(tmp_path / "ckpt2"))
    assert idx.codes.read().count() == 500  # nothing double-indexed

    got = {r["neighbor_id"] for r in idx.query(emb, [350], k=5).collect()}
    assert len(got) == 5


def test_ivfpq_probe_filter_reaches_parquet_scan(spark, sf_dir, tmp_path):
    """The probed-cluster restriction must reach the codes scan as a
    pushed filter (In/EqualTo on cluster) — on a compacted
    cluster-clustered codes table that is what turns logical probe
    pruning into skipped I/O."""
    from pixelspark.ops.pq import VectorIndex
    from pixelspark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = VectorIndex(spark, str(tmp_path / "vidx"))
    idx.build(emb, n_clusters=8, m=8, ksub=16, n_iter=2)
    out = idx.query(emb, [0], k=5, n_probe=2, shortlist=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "cluster" in pushed, pushed


def test_vector_index_build_race_serializes_on_codes(spark, sf_dir, tmp_path, monkeypatch):
    """Two racing builders must never leave one builder's meta over the
    other's codes: the codes commit is version-pinned, so the loser
    fails BEFORE its codes can land under the winner's quantizers —
    and a crashed half-build (codes, no meta) is repaired by the next
    build()."""
    import pixelspark.ops.pq as PQ
    from pixelspark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings").where("vec_id < 200")
    root = str(tmp_path / "vidx_race")
    idx = PQ.VectorIndex(spark, root)

    orig = PQ.ivfpq_index
    rival_done = {}

    def racing(*a, **k):
        res = orig(*a, **k)
        # a rival builder lands its codes between this builder's
        # version pin and its overwrite
        if not rival_done:
            rival = PQ.VectorIndex(spark, root)
            rival.codes.overwrite(res[2])
            rival_done["v"] = rival.codes.latest_version()
        return res

    monkeypatch.setattr(PQ, "ivfpq_index", racing)
    import pytest as _pytest

    with _pytest.raises(FileExistsError, match="rival"):
        idx.build(emb, n_clusters=4, m=4, ksub=8, n_iter=1)

    # state now == rival crashed before meta (codes live, no sidecar):
    # a fresh build() must repair, not wedge
    monkeypatch.setattr(PQ, "ivfpq_index", orig)
    idx2 = PQ.VectorIndex(spark, root)
    idx2.build(emb, n_clusters=4, m=4, ksub=8, n_iter=1)
    got = idx2.query(emb, [0, 1], k=3, n_probe=4, shortlist=50).collect()
    assert len(got) == 6


def test_vector_index_delete_retires_vectors(spark, sf_dir, tmp_path):
    """delete() is the takedown path: a DV commit on the codes table
    masks the ids (no code file rewritten), queries refill top-k from
    survivors, the pre-delete state stays time-travelable, and
    compact() materializes the erasure without changing answers."""
    from pixelspark.ops.pq import VectorIndex
    from pixelspark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where("vec_id < 400")
    idx = VectorIndex(spark, str(tmp_path / "vidx_del"))
    idx.build(base, n_clusters=8, m=8, ksub=16, n_iter=2)

    before = idx.query(emb, [7], k=5).collect()
    victim = before[0]["neighbor_id"]
    pre_v = idx.codes.latest_version()
    dirs_before = {e["base"] for e in idx.codes.manifest(pre_v)["entries"]}

    idx.delete([victim])
    # mask, not rewrite: every pre-delete data dir is still referenced
    m_after = idx.codes.manifest(idx.codes.latest_version())
    assert dirs_before <= {e["base"] for e in m_after["entries"]}

    after = idx.query(emb, [7], k=5).collect()
    survivors = {r["neighbor_id"] for r in after}
    assert victim not in survivors
    assert len(after) == 5  # k refilled from the remaining vectors

    # time travel still sees the victim
    back = idx.query(emb, [7], k=5, version=pre_v).collect()
    assert ({r["neighbor_id"] for r in back}
            == {r["neighbor_id"] for r in before})

    # compact materializes the mask; answers unchanged, row physically gone
    idx.compact(num_files=4)
    assert ({r["neighbor_id"] for r in idx.query(emb, [7], k=5).collect()}
            == survivors)
    assert idx.codes.read().where(F.col("vec_id") == victim).count() == 0
