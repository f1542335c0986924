"""Stored ANN layouts (VERDICT r2 ask #2): ``lsh_write``/``ivf_write``
persist the table partitioned by the coarse key; the stored readers must
(a) return results identical to the compute-per-query paths, and (b) prove
in the PHYSICAL PLAN that the probe filter partition-prunes the scan — the
property that makes the read path O(probed fraction) at 100 TB."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops import similarity as S


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def files_scanned(df) -> int:
    """Execute and read the scan's numFiles metric — the ground truth for
    partition pruning (``inputFiles()`` reports the UNpruned relation)."""
    df.collect()
    leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    return int(leaf.metrics().apply("numFiles").value())


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="module")
def qvec(embs):
    row = embs.orderBy("vec_id").select("embedding").first()
    return [float(v) for v in row["embedding"]]


@pytest.fixture(scope="module")
def lsh_path(embs, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ann") / "lsh")
    S.lsh_write(embs, p, n_planes=8, dim=64)
    return p


@pytest.fixture(scope="module")
def ivf_path(embs, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ann") / "ivf")
    S.ivf_write(embs, p, n_lists=16, dim=64)
    return p


def test_lsh_stored_matches_computed(spark, embs, qvec, lsh_path):
    stored = S.lsh_stored_topk(spark, lsh_path, qvec, k=10).collect()
    computed = S.lsh_topk(embs, qvec, k=10).collect()
    assert [(r["vec_id"], r["cos"]) for r in stored] == [
        (r["vec_id"], r["cos"]) for r in computed
    ]
    assert len(stored) == 10


def test_lsh_stored_scan_is_partition_pruned(spark, qvec, lsh_path):
    meta = S.read_ann_meta(lsh_path)
    probes = S._probe_buckets(
        S.query_bucket(qvec, meta["n_planes"]), meta["n_planes"], hamming=1
    )
    plan = plan_of(
        spark.read.parquet(lsh_path).filter(F.col("bucket").isin(probes))
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "bucket" in pf[0], plan
    # the probed fraction actually prunes: files read < files written
    total = len(spark.read.parquet(lsh_path).inputFiles())
    probed = files_scanned(
        spark.read.parquet(lsh_path).filter(F.col("bucket").isin(probes))
    )
    assert 0 < probed < total, (probed, total)


def test_ivf_stored_matches_computed(spark, embs, qvec, ivf_path):
    stored = S.ivf_stored_topk(spark, ivf_path, qvec, k=10, nprobe=4).collect()
    computed = S.ivf_topk(embs, qvec, k=10, nprobe=4).collect()
    assert [(r["vec_id"], r["cos"]) for r in stored] == [
        (r["vec_id"], r["cos"]) for r in computed
    ]


def test_ivf_stored_scan_is_partition_pruned(spark, qvec, ivf_path):
    meta = S.read_ann_meta(ivf_path)
    probes = S._query_lists(qvec, meta["n_lists"], 4, meta["centroids"])
    pruned = spark.read.parquet(ivf_path).filter(F.col("list_id").isin(probes))
    plan = plan_of(pruned)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "list_id" in pf[0], plan
    total = len(spark.read.parquet(ivf_path).inputFiles())
    assert 0 < files_scanned(pruned) < total


def test_ivf_stored_with_trained_centroids(spark, embs, qvec, tmp_path):
    """Trained k-means centroids ride the meta sidecar; the reader probes
    with EXACTLY the writer's centroids (no silent hash-quantizer fallback)."""
    cents = S.ivf_train(embs, n_lists=8, n_iter=3, sample=256)
    p = str(tmp_path / "ivf_trained")
    S.ivf_write(embs, p, n_lists=8, dim=64, centroids=cents)
    stored = S.ivf_stored_topk(spark, p, qvec, k=5, nprobe=2).collect()
    computed = S.ivf_topk(
        embs, qvec, k=5, nprobe=2, n_lists=8, centroids=cents
    ).collect()
    assert [(r["vec_id"], r["cos"]) for r in stored] == [
        (r["vec_id"], r["cos"]) for r in computed
    ]
    assert S.read_ann_meta(p)["centroids"] == cents


def test_knn_filtered_is_prefilter(spark, embs, qvec):
    """ES knn+filter semantics: every returned row satisfies the predicate,
    the set equals brute-force-over-the-filtered-table, and it FILLS k even
    when the unfiltered global top-k holds < k matching rows (the exact case
    post-filtering gets wrong)."""
    where = "label = 1"
    got = S.knn_filtered(embs, qvec, where, k=10).collect()
    want = S.cosine_topk(embs.filter(where), qvec, k=10).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (r["vec_id"], r["cos"]) for r in want
    ]
    assert len(got) == 10
    labels = {
        r["label"]
        for r in embs.join(
            S.knn_filtered(embs, qvec, where, k=10).select("vec_id"), "vec_id"
        ).collect()
    }
    assert labels == {1}
    # post-filter under-fills here — the global top-10 is label-mixed
    global_top = S.cosine_topk(embs, qvec, k=10)
    post = global_top.join(embs.filter(where).select("vec_id"), "vec_id")
    assert post.count() < 10


def test_ivf_stored_filtered_composes_with_pruning(spark, embs, qvec, ivf_path):
    """where= on the stored IVF reader: identical to filtering the probed
    lists, and the scan STAYS partition-pruned (PartitionFilters on list_id
    + the predicate in the data filters)."""
    meta = S.read_ann_meta(ivf_path)
    where = "label IN (0, 2)"
    got = S.ivf_stored_topk(spark, ivf_path, qvec, k=10, nprobe=16, where=where)
    # nprobe = n_lists probes everything -> must equal exact pre-filter knn
    want = S.knn_filtered(embs, qvec, where, k=10).collect()
    assert [(r["vec_id"], r["cos"]) for r in got.collect()] == [
        (r["vec_id"], r["cos"]) for r in want
    ]
    pruned = S.ivf_stored_topk(spark, ivf_path, qvec, k=10, nprobe=4, where=where)
    plan = plan_of(pruned)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "list_id" in pf[0], plan
    assert "label" in plan
    total = len(spark.read.parquet(ivf_path).inputFiles())
    assert 0 < files_scanned(pruned) < total
    for r in (
        spark.read.parquet(ivf_path)
        .join(pruned.select("vec_id"), "vec_id")
        .select("label")
        .collect()
    ):
        assert r["label"] in (0, 2)


def test_lsh_stored_filtered(spark, embs, qvec, lsh_path):
    """where= on the stored LSH reader restricts within the probed buckets."""
    where = "label = 0"
    got = S.lsh_stored_topk(spark, lsh_path, qvec, k=5, hamming=1, where=where)
    want = S.lsh_topk(embs.filter(where), qvec, k=5, hamming=1).collect()
    assert [(r["vec_id"], r["cos"]) for r in got.collect()] == [
        (r["vec_id"], r["cos"]) for r in want
    ]


def test_meta_kind_mismatch_refused(spark, qvec, lsh_path):
    with pytest.raises(AssertionError):
        S.ivf_stored_topk(spark, lsh_path, qvec)


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pq_path(embs, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ann") / "pq")
    S.pq_write(embs, p)
    return p


def test_pq_encode_matches_duckdb(spark, embs):
    import duckdb

    con = duckdb.connect()
    con.register("embeddings", embs.toPandas())
    s = sorted(
        (r["vec_id"], tuple(r["codes"])) for r in S.pq_encode(embs).collect()
    )
    o = sorted(
        (i, tuple(c))
        for i, c in con.execute(S.pq_encode_sql("embeddings")).fetchall()
    )
    assert s == o


def test_pq_stored_matches_computed(spark, embs, qvec, pq_path):
    stored = [
        (r["vec_id"], r["score"])
        for r in S.pq_stored_topk(spark, pq_path, qvec, k=10).collect()
    ]
    computed = [
        (r["vec_id"], r["score"]) for r in S.pq_topk(embs, qvec, k=10).collect()
    ]
    assert stored == computed


def test_pq_codes_are_tinyint_bytes(spark, pq_path):
    stored = spark.read.parquet(pq_path)
    assert dict(stored.dtypes)["codes"] == "array<tinyint>"
    assert stored.select(F.size("codes")).first()[0] == 8  # m bytes/vector


def test_pq_trained_recall_on_clustered_data(spark):
    """On CLUSTERED vectors (the realistic case — random vectors have no
    recoverable structure), trained PQ must put most of the exact top-10
    in its top-10."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(4, 64) * 3
    rows = [
        (i, (centers[i % 4] + rng.randn(64) * 0.1).tolist())
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = (centers[1] + rng.randn(64) * 0.1).tolist()
    books = S.pq_train(df, sample=400)
    exact = {r["vec_id"] for r in S.cosine_topk(df, q, k=10).collect()}
    approx = {
        r["vec_id"] for r in S.pq_topk(df, q, k=10, codebooks=books).collect()
    }
    # PQ's resolution is the codeword cell: inside a tight cluster all
    # members share codes (scores tie), so the correct guarantee is
    # CLUSTER-level recall — every returned vector is from the query's
    # cluster, as is the exact set
    assert all(v % 4 == 1 for v in approx)
    assert all(v % 4 == 1 for v in exact)
    # and the tie is real: reranking the PQ candidates exactly recovers
    # the true top set (the standard PQ + exact-rerank pipeline)
    cand = [
        r["vec_id"]
        for r in S.pq_topk(df, q, k=100, codebooks=books).collect()
    ]
    cand_df = df.filter(F.col("vec_id").isin(cand))
    rerank = {r["vec_id"] for r in S.cosine_topk(cand_df, q, k=10).collect()}
    assert rerank == exact


def test_pq_meta_pins_codebooks(spark, embs, qvec, tmp_path):
    books = S.pq_train(embs, sample=256)
    p = str(tmp_path / "pq_trained")
    S.pq_write(embs, p, codebooks=books)
    meta = S.read_ann_meta(p)
    assert meta["codebooks"] == books
    stored = [
        (r["vec_id"], r["score"])
        for r in S.pq_stored_topk(spark, p, qvec, k=5).collect()
    ]
    inmem = [
        (r["vec_id"], r["score"])
        for r in S.pq_topk(embs, qvec, k=5, codebooks=books).collect()
    ]
    assert stored == inmem


def test_pq_validation(spark, embs):
    with pytest.raises(ValueError):
        S.pq_train(embs, m=7, dim=64)  # 64 % 7 != 0
    with pytest.raises(ValueError):
        S.pq_write(embs, "/tmp/never", ks=200)  # > tinyint codes


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ivfpq_path(embs, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ann") / "ivfpq")
    S.ivfpq_write(embs, p, codebooks=S._pq_default_books(8, 16, 64))
    return p


def test_ivfpq_stored_matches_sql_twin(spark, embs, qvec, ivfpq_path):
    import duckdb

    con = duckdb.connect()
    con.register("embeddings", embs.toPandas())
    s = [
        (r["vec_id"], r["score"])
        for r in S.ivfpq_stored_topk(spark, ivfpq_path, qvec, k=10, nprobe=4).collect()
    ]
    o = [
        (i, float(x))
        for i, x in con.execute(
            S.ivfpq_topk_sql(
                "embeddings", qvec, k=10, nprobe=4,
                codebooks=S._pq_default_books(8, 16, 64),
            )
        ).fetchall()
    ]
    assert s == o


def test_ivfpq_scan_is_partition_pruned(spark, qvec, ivfpq_path):
    import glob

    probed = S.ivfpq_stored_topk(spark, ivfpq_path, qvec, k=10, nprobe=2)
    total = len(glob.glob(f"{ivfpq_path}/list_id=*/*.parquet"))
    assert files_scanned(probed) < total


def test_ivfpq_trained_quantizers_are_pinned(spark, embs, qvec, tmp_path):
    """A reader must use the WRITER's quantizers (meta sidecar), and the
    SQL twin fed those same quantizers must agree — trained path."""
    import duckdb

    cents = S.ivf_train(embs, n_lists=16, sample=256)
    p = str(tmp_path / "ivfpq_t")
    S.ivfpq_write(embs, p, centroids=cents)
    meta = S.read_ann_meta(p)
    assert meta["centroids"] == cents and len(meta["codebooks"]) == 8
    con = duckdb.connect()
    con.register("embeddings", embs.toPandas())
    s = [
        (r["vec_id"], r["score"])
        for r in S.ivfpq_stored_topk(spark, p, qvec, k=5, nprobe=16).collect()
    ]
    o = [
        (i, float(x))
        for i, x in con.execute(
            S.ivfpq_topk_sql(
                "embeddings", qvec, k=5, nprobe=16,
                centroids=cents, codebooks=meta["codebooks"],
            )
        ).fetchall()
    ]
    assert s == o


def test_ivfpq_topk_sql_requires_codebooks():
    """ivfpq_write(codebooks=None) TRAINS its books; a hash-book default
    in the SQL twin would silently diverge from such a layout, so the
    twin refuses and points at the meta sidecar."""
    with pytest.raises(ValueError, match="pinned codebooks"):
        S.ivfpq_topk_sql("embeddings", [0.0] * 64, k=5)


# --------------------------- incremental append ----------------------------


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("kind", ["lsh", "ivf", "sq8", "pq", "bq", "ivfpq"])
def test_ann_append_equals_full_rewrite(spark, embs, qvec, tmp_path, kind):
    """write(half) + ann_append(other half) must be READER-IDENTICAL to
    write(all): every codec is a pure function of (vector, pinned params),
    so growing the layout never changes existing rows or probe semantics."""
    half_a = embs.filter(F.col("vec_id") % 2 == 0)
    half_b = embs.filter(F.col("vec_id") % 2 == 1)
    inc = str(tmp_path / f"{kind}_inc")
    full = str(tmp_path / f"{kind}_full")

    writers = {
        "lsh": lambda df, p: S.lsh_write(df, p, n_planes=6, dim=64),
        "ivf": lambda df, p: S.ivf_write(df, p, n_lists=8, dim=64),
        "sq8": lambda df, p: S.sq_write(df, p),
        "pq": lambda df, p: S.pq_write(df, p, m=8, ks=16, dim=64),
        "bq": lambda df, p: S.bq_write(
            df, p, thresholds=[0.0] * 64
        ),  # pinned thresholds: append must not refit them on the new half
        "ivfpq": lambda df, p: S.ivfpq_write(
            df, p, n_lists=8, m=8, ks=16, dim=64,
            codebooks=S._pq_default_books(8, 16, 64),
        ),
    }
    readers = {
        "lsh": lambda p: S.lsh_stored_topk(spark, p, qvec, k=12, hamming=1),
        "ivf": lambda p: S.ivf_stored_topk(spark, p, qvec, k=12, nprobe=3),
        "sq8": lambda p: S.sq_stored_topk(spark, p, qvec, k=12),
        "pq": lambda p: S.pq_stored_topk(spark, p, qvec, k=12),
        "bq": lambda p: S.bq_stored_topk(spark, p, qvec, k=8, rerank=40),
        "ivfpq": lambda p: S.ivfpq_stored_topk(spark, p, qvec, k=12, nprobe=3),
    }

    writers[kind](half_a, inc)
    S.ann_append(half_b, inc)
    writers[kind](embs, full)

    assert _rows(readers[kind](inc)) == _rows(readers[kind](full))
    # the sidecar still describes the layout after the append
    assert S.read_ann_meta(inc)["kind"] == ("sq8" if kind == "sq8" else kind)


def test_ann_append_unknown_kind_refused(spark, embs, tmp_path):
    p = str(tmp_path / "weird")
    S.lsh_write(embs.limit(4), p, n_planes=4, dim=64)
    meta = S.read_ann_meta(p)
    meta["kind"] = "hnsw"
    S._write_ann_meta(p, meta)
    with pytest.raises(ValueError, match="unknown ANN layout kind"):
        S.ann_append(embs.limit(4), p)


def test_stream_ann_append_matches_batch_layout(spark, embs, qvec, tmp_path):
    """Streamed vector ingestion: empty-initialized IVF layout + two
    micro-batches == batch ivf_write over the union, through the UNCHANGED
    stored reader (parquet partition discovery layers epoch above
    list_id). Epoch overwrite makes crash replay exactly-once."""
    src = str(tmp_path / "vsrc")
    inc = str(tmp_path / "ivf_stream")
    full = str(tmp_path / "ivf_batch")
    half_a = embs.filter(F.col("vec_id") % 2 == 0)
    half_b = embs.filter(F.col("vec_id") % 2 == 1)

    S.ivf_write(embs.limit(0), inc, n_lists=8, dim=64)  # sidecar only
    half_a.coalesce(1).write.mode("append").parquet(src)
    q = S.stream_ann_append(
        spark, src, inc, str(tmp_path / "ck"),
        schema="vec_id long, embedding array<float>",
    )
    try:
        q.processAllAvailable()
        half_b.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    S.ivf_write(embs, full, n_lists=8, dim=64)
    got = _rows(S.ivf_stored_topk(spark, inc, qvec, k=12, nprobe=3))
    want = _rows(S.ivf_stored_topk(spark, full, qvec, k=12, nprobe=3))
    assert got == want and len(got) == 12


def test_zero_norm_vectors_never_rank(spark):
    """An all-zero embedding used to score NaN, which Spark sorts ABOVE
    every real double in DESC order — rank 1 of every top-k."""
    rows = [(1, [1.0, 0.0]), (2, [0.5, 0.5]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = S.cosine_topk(df, [1.0, 0.0], k=3, vec_col="embedding").collect()
    assert [r["vec_id"] for r in got] == [1, 2, 3]
    assert got[-1]["cos"] == 0.0  # guarded, not NaN
    with pytest.raises(ValueError, match="zero query"):
        S.cosine_topk(df, [0.0, 0.0], k=3)


def test_probe_radius_over_two_is_refused():
    with pytest.raises(ValueError, match="hamming=3"):
        S._probe_buckets(0, 8, 3)


def test_query_bucket_matches_lsh_assign_exactly(spark, embs):
    assigned = {
        r["vec_id"]: r["bucket"]
        for r in S.lsh_assign(embs.limit(50), n_planes=8, dim=64).collect()
    }
    for r in embs.limit(50).collect():
        assert S.query_bucket(list(r["embedding"]), 8) == assigned[r["vec_id"]]


def test_train_on_empty_sample_is_refused(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty sample"):
        S.ivf_train(empty)
    with pytest.raises(ValueError, match="empty sample"):
        S.pq_train(empty)


# ---------------------------------------------------------------------------
# PQ exact-rerank (ADC+R — Jégou et al. 2011 §VI)
# ---------------------------------------------------------------------------


def test_pq_rerank_recovers_exact_topk(spark, embs, qvec):
    """ADC alone cannot order neighbors inside one codeword cell; with
    rerank=R big enough to cover the true top-k's ADC rank, the output IS
    the exact cosine top-k (score = exact cosine)."""
    books = S.pq_train(embs, sample=256)
    n = embs.count()
    exact = [
        (r["vec_id"], r["cos"])
        for r in S.cosine_topk(embs, qvec, k=10).collect()
    ]
    reranked = [
        (r["vec_id"], r["score"])
        for r in S.pq_topk(embs, qvec, k=10, codebooks=books, rerank=n).collect()
    ]
    assert reranked == exact  # rerank=|corpus| degenerates to exact search


def test_pq_rerank_sql_twin(spark, embs, qvec):
    import duckdb

    con = duckdb.connect()
    con.register("embeddings", embs.toPandas())
    books = S.pq_train(embs, sample=256)
    s = [
        (r["vec_id"], r["score"])
        for r in S.pq_topk(
            embs, qvec, k=5, codebooks=books, rerank=50
        ).collect()
    ]
    o = [
        (i, float(v))
        for i, v in con.execute(
            S.pq_topk_sql("embeddings", qvec, k=5, codebooks=books, rerank=50)
        ).fetchall()
    ]
    assert s == o
