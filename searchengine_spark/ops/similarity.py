"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``      — brute-force cosine top-k for one query vector: the
                         exactness baseline. Dot products run JVM-side via
                         zip_with + aggregate (no Python, no shuffle beyond
                         the final TakeOrderedAndProject).
* ``cosine_neardup``   — all pairs with cosine ≥ τ (embedding near-dup).
                         Quadratic verification kernel — at 100 TB restrict
                         to LSH candidates first.
* ``lsh_assign``       — deterministic random-hyperplane bucket assignment
                         (sign bits of dot products with md5-derived
                         pseudo-random planes): the scale path. Bucketing is
                         reproducible in SQL, so the oracle can verify it.

All floats rounded at ROUND_DP for cross-engine hashing; embeddings cast to
double before any math in BOTH engines (the parquet column is float32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_DP = 5


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _cos(a, b):
    """Guarded cosine: 0.0 when either vector has zero norm. The raw
    division there is an ANSI-mode DIVIDE_BY_ZERO crash (or, with ANSI
    off, a NaN that Spark sorts ABOVE every real double in DESC order —
    an all-zero embedding would take rank 1 of every top-k). try_divide
    yields NULL in both modes; the DuckDB twins yield NULL for the same
    division and coalesce to the same 0.0."""
    return F.coalesce(
        F.try_divide(_dot(a, b), _norm(a) * _norm(b)), F.lit(0.0)
    )


def _require_nonzero_query(query_vec):
    if not any(float(v) != 0.0 for v in query_vec):
        raise ValueError("zero query vector has no cosine direction")


def _as_double(col):
    return F.col(col).cast("array<double>")


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 20, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Top-k by cosine to a literal query vector (tie-break id asc)."""
    _require_nonzero_query(query_vec)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    emb = _as_double(vec_col)
    cos = _cos(emb, q)
    return (
        df.select(F.col(id_col).alias("vec_id"), F.round(cos, ROUND_DP).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_sql(
    table: str, query_vec: list[float], k: int = 20, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    ql = "[" + ", ".join(f"{float(v)!r}" for v in query_vec) + "]::DOUBLE[]"
    return f"""
SELECT {id_col} AS vec_id,
       round(coalesce(list_dot_product({vec_col}::DOUBLE[], {ql})
             / (sqrt(list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[]))
                * sqrt(list_dot_product({ql}, {ql}))), 0.0), {ROUND_DP}) AS cos
FROM {table}
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def knn_filtered(
    df: DataFrame,
    query_vec: list[float],
    where,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ES ``knn`` with ``filter`` — PRE-filter semantics: the metadata
    predicate restricts the candidate set BEFORE any distance math, so the
    result always holds k MATCHING vectors (post-filtering an unfiltered
    top-k under-fills whenever fewer than k of the global neighbors
    satisfy the predicate — ES made the same pre-filter choice for
    correctness). ``where`` is a Column or a SQL string; as a plain
    comparison/IN it lands in the parquet scan's PushedFilters, so at
    100 TB the distance kernel touches only surviving row groups."""
    pred = F.expr(where) if isinstance(where, str) else where
    return cosine_topk(df.filter(pred), query_vec, k, id_col, vec_col)


def knn_filtered_sql(
    table: str,
    query_vec: list[float],
    where: str,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    return cosine_topk_sql(
        f"(SELECT * FROM {table} WHERE {where}) AS knn_filtered",
        query_vec, k, id_col, vec_col,
    )


def cosine_neardup(
    df: DataFrame,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    allow_full_scan: bool = False,
) -> DataFrame:
    """(vec_a, vec_b, cos) for pairs with cosine ≥ τ (a < b).

    With ``candidates`` (a (vec_a, vec_b) df, e.g. ``lsh_candidate_pairs``)
    this is the pair-driven verification kernel — linear in candidate pairs,
    the 100 TB path (``cosine_neardup_lsh`` composes the two). Without
    candidates it is an all-pairs cross join: refuse unless
    ``allow_full_scan=True`` (small-corpus exactness baseline only)."""
    base = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    if candidates is not None:
        pairs = (
            candidates.select("vec_a", "vec_b")
            .join(base.select(F.col("id").alias("vec_a"), F.col("v").alias("va")), "vec_a")
            .join(base.select(F.col("id").alias("vec_b"), F.col("v").alias("vb")), "vec_b")
        )
    else:
        if not allow_full_scan:
            raise ValueError(
                "cosine_neardup without candidates is an O(n²) cross join — "
                "pass candidates=lsh_candidate_pairs(df) (see "
                "cosine_neardup_lsh) or allow_full_scan=True for a "
                "small-corpus exactness baseline"
            )
        a = base.select(F.col("id").alias("vec_a"), F.col("v").alias("va"))
        b = base.select(F.col("id").alias("vec_b"), F.col("v").alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    cos = _cos(F.col("va"), F.col("vb"))
    return pairs.select("vec_a", "vec_b", F.round(cos, ROUND_DP).alias("cos")).filter(
        F.col("cos") >= tau
    )


def lsh_candidate_pairs(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b) pairs sharing an LSH bucket (a < b): the candidate
    generator for near-dup verification. One shuffle on the bucket key; at
    10^9+ vectors write the table partitioned by bucket and this becomes a
    co-partitioned self-join with no extra exchange."""
    assigned = lsh_assign(df, n_planes, dim, id_col, vec_col)
    x = assigned.select(F.col("vec_id").alias("vec_a"), "bucket")
    y = assigned.select(F.col("vec_id").alias("vec_b"), "bucket")
    return x.join(y, "bucket").filter(F.col("vec_a") < F.col("vec_b")).select(
        "vec_a", "vec_b"
    )


def cosine_neardup_lsh(
    df: DataFrame,
    tau: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for embedding near-dup: LSH-bucket candidates → pair-driven
    cosine verification. Recall is bounded by bucket collocation (raise it
    with fewer planes or multi-probe); precision is exact (every emitted pair
    passed the real cosine test)."""
    cand = lsh_candidate_pairs(df, n_planes, dim, id_col, vec_col)
    return cosine_neardup(df, tau, id_col, vec_col, candidates=cand)


def cosine_neardup_lsh_sql(
    table: str,
    tau: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    assign = lsh_assign_sql(table, n_planes, dim, id_col, vec_col)
    cos = (
        f"round(coalesce(list_dot_product(a.{vec_col}::DOUBLE[], b.{vec_col}::DOUBLE[])"
        f" / (sqrt(list_dot_product(a.{vec_col}::DOUBLE[], a.{vec_col}::DOUBLE[]))"
        f" * sqrt(list_dot_product(b.{vec_col}::DOUBLE[], b.{vec_col}::DOUBLE[]))), 0.0), {ROUND_DP})"
    )
    return f"""
WITH assigned AS ({assign}),
cand AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM assigned x JOIN assigned y
    ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
SELECT c.vec_a, c.vec_b, {cos} AS cos
FROM cand c
JOIN {table} a ON a.{id_col} = c.vec_a
JOIN {table} b ON b.{id_col} = c.vec_b
WHERE {cos} >= {tau}
"""


def cosine_neardup_sql(
    table: str, tau: float = 0.9, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    return f"""
SELECT a.{id_col} AS vec_a, b.{id_col} AS vec_b,
       round(coalesce(list_dot_product(a.{vec_col}::DOUBLE[], b.{vec_col}::DOUBLE[])
             / (sqrt(list_dot_product(a.{vec_col}::DOUBLE[], a.{vec_col}::DOUBLE[]))
                * sqrt(list_dot_product(b.{vec_col}::DOUBLE[], b.{vec_col}::DOUBLE[]))), 0.0), {ROUND_DP}) AS cos
FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
WHERE round(coalesce(list_dot_product(a.{vec_col}::DOUBLE[], b.{vec_col}::DOUBLE[])
            / (sqrt(list_dot_product(a.{vec_col}::DOUBLE[], a.{vec_col}::DOUBLE[]))
               * sqrt(list_dot_product(b.{vec_col}::DOUBLE[], b.{vec_col}::DOUBLE[]))), 0.0), {ROUND_DP}) >= {tau}
"""


# ------------------------------------------------- LSH (random hyperplanes)
def _plane_val(p: int, d: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1):
    (int(md5(f"{p}_{d}")[:8], 16) % 2000 - 1000) / 1000. Computed driver-side
    and inlined as a literal — building it as 512 md5 expressions made the
    plan an order of magnitude slower to analyze/compile for identical
    values. The DuckDB oracle still derives it from md5 symbolically, which
    cross-checks this Python derivation exactly."""
    import hashlib

    h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:8], 16)
    return ((h % 2000) - 1000) / 1000.0


def lsh_assign(
    df: DataFrame, n_planes: int = 8, dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, bucket): bucket = Σ_p (dot(v, plane_p) > 0) << p."""
    emb = _as_double(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(_plane_val(p, d)) for d in range(dim)])
        bit = F.when(_dot(emb, plane) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, p)
    return df.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def query_bucket(query_vec: list[float], n_planes: int = 8) -> int:
    """Driver-side bucket of a query vector — bit-identical to lsh_assign:
    the SAME pre-rounded plane literal (_plane_val) times the component,
    in the same order. An inline ((h % 2000) - 1000) / 1000.0 would
    associate as (v*m)/1000.0 and could round one ulp away from
    v*(m/1000.0), flipping a near-zero sign bit into the wrong bucket."""
    bucket = 0
    for p in range(n_planes):
        dot = 0.0
        for d, v in enumerate(query_vec):
            dot += float(v) * _plane_val(p, d)
        if dot > 0:
            bucket += 1 << p
    return bucket


def _probe_buckets(center: int, n_planes: int, hamming: int) -> list[int]:
    if not 0 <= hamming <= 2:
        raise ValueError(
            f"hamming={hamming} unsupported — multi-probe enumerates radius "
            "<= 2 (wider probes: add planes or use the IVF layout)"
        )
    out = {center}
    if hamming >= 1:
        out |= {center ^ (1 << p) for p in range(n_planes)}
    if hamming >= 2:
        out |= {
            center ^ (1 << p) ^ (1 << q)
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        }
    return sorted(out)


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 20,
    n_planes: int = 8,
    dim: int = 64,
    hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: prune to the query's LSH bucket ± ``hamming`` bit
    flips (multi-probe), brute-force cosine inside. Default hamming=2:
    measured at 1M clustered vectors (BENCH_SCALING.md §ANN recall),
    hamming=1 recalls only 0.76@10 while hamming=2 reaches 0.98 for a
    ~37/256-bucket probe footprint — the radius-1 ball misses true
    neighbors whose noise flips two hyperplane signs. The 100 TB path: the
    bucket filter is a partition-prunable predicate when embeddings are
    written partitioned/bucketed by LSH bucket, so the scan touches
    (n_probes/2^n_planes) of the data instead of all of it."""
    probes = _probe_buckets(query_bucket(query_vec, n_planes), n_planes, hamming)
    assigned = lsh_assign(df, n_planes, dim, id_col, vec_col).filter(
        F.col("bucket").isin(probes)
    )
    cand = df.join(
        assigned.select(F.col("vec_id").alias(id_col)), on=id_col, how="left_semi"
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def lsh_topk_sql(
    table: str,
    query_vec: list[float],
    k: int = 20,
    n_planes: int = 8,
    dim: int = 64,
    hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    probes = ", ".join(
        str(b) for b in _probe_buckets(query_bucket(query_vec, n_planes), n_planes, hamming)
    )
    assign = lsh_assign_sql(table, n_planes, dim, id_col, vec_col)
    ql = "[" + ", ".join(f"{float(v)!r}" for v in query_vec) + "]::DOUBLE[]"
    return f"""
WITH assigned AS ({assign}),
cand AS (
  SELECT t.* FROM {table} t
  JOIN assigned a ON a.vec_id = t.{id_col}
  WHERE a.bucket IN ({probes}))
SELECT {id_col} AS vec_id,
       round(coalesce(list_dot_product({vec_col}::DOUBLE[], {ql})
             / (sqrt(list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[]))
                * sqrt(list_dot_product({ql}, {ql}))), 0.0), {ROUND_DP}) AS cos
FROM cand
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


# ------------------------------------------------- stored ANN layouts
# The 100 TB read path: assignment happens ONCE at write time and the table
# is laid out partitioned by the coarse key (LSH bucket / IVF list), so a
# probe reads nprobe/n_lists (or n_probes/2^n_planes) of the data via
# partition pruning instead of scanning and re-assigning everything per
# query. A meta sidecar pins the quantizer (planes are derivation-stable;
# IVF centroids are persisted verbatim) so readers can never probe with a
# different quantizer than the writer used.


def _ann_meta_path(path: str) -> str:
    import os

    return os.path.join(path, "_ann_meta.json")


def _write_ann_meta(path: str, meta: dict) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    tmp = _ann_meta_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _ann_meta_path(path))


def read_ann_meta(path: str) -> dict:
    import json

    with open(_ann_meta_path(path)) as f:
        return json.load(f)


def _ann_write(df, path, meta, id_col, vec_col):
    """Encode with the layout's PINNED params and overwrite: every writer
    trains/derives its params, builds the meta dict, and delegates here —
    ONE encode path per kind, shared verbatim with ``ann_append`` /
    ``stream_ann_append`` (``_ann_encode``), so batch writes and appends
    can never encode differently for the same layout. Partitioned kinds
    pre-repartition on the key (see the file-explosion note below)."""
    out, part = _ann_encode(df, meta, id_col, vec_col)
    if part:
        out.repartition(part).write.mode("overwrite").partitionBy(part).parquet(path)
    else:
        out.write.mode("overwrite").parquet(path)
    _write_ann_meta(path, meta)


def lsh_write(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the LSH layout: rows + their bucket, written
    ``partitionBy(bucket)`` (≤ 2^n_planes directories). The pre-write
    ``repartition(bucket)`` clusters each bucket into one task's output
    instead of every task writing a sliver of every bucket — without it a
    T-task write emits up to T·2^n_planes small files, the classic
    partitioned-write file explosion (at 100 TB you'd repartition(N, bucket)
    with N sized to the per-file target)."""
    _ann_write(
        df, path,
        {"kind": "lsh", "n_planes": n_planes, "dim": dim,
         "id_col": id_col, "vec_col": vec_col},
        id_col, vec_col,
    )


def lsh_stored_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 20,
    hamming: int = 2,
    where=None,
) -> DataFrame:
    """Top-k over a ``lsh_write`` layout. The probe-bucket IN-filter lands in
    the scan's PartitionFilters (plan-tested), so only
    |probes|/2^n_planes of the stored bytes are read — no per-query
    re-assignment of the full table. ``where`` (optional metadata predicate,
    ES knn filter) composes: partition pruning picks the probe directories,
    the predicate prunes row groups inside them — pre-filter semantics
    within the probed buckets."""
    meta = read_ann_meta(path)
    assert meta["kind"] == "lsh", f"not an LSH layout: {path}"
    probes = _probe_buckets(
        query_bucket(query_vec, meta["n_planes"]), meta["n_planes"], hamming
    )
    stored = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    if where is not None:
        stored = stored.filter(F.expr(where) if isinstance(where, str) else where)
    return cosine_topk(stored, query_vec, k, meta["id_col"], meta["vec_col"])


def ivf_write(
    df: DataFrame,
    path: str,
    n_lists: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> None:
    """Materialize the IVF layout partitioned by list_id; the centroids the
    writer used are persisted in the meta sidecar (trained or hash-derived),
    so probe selection is always consistent with the stored assignment."""
    cvecs = centroids if centroids is not None else [_centroid(c, dim) for c in range(n_lists)]
    _ann_write(
        df, path,
        {"kind": "ivf", "n_lists": n_lists, "dim": dim, "id_col": id_col,
         "vec_col": vec_col, "centroids": cvecs},
        id_col, vec_col,
    )


def ivf_stored_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 20,
    nprobe: int = 4,
    where=None,
) -> DataFrame:
    """Top-k over an ``ivf_write`` layout: nearest-nprobe list_ids from the
    PERSISTED centroids → partition-pruned scan → exact cosine inside.
    ``where`` (optional metadata predicate, ES knn filter) composes with
    the pruning: list_id picks partitions, the predicate prunes row groups
    inside them — pre-filter semantics within the probed lists."""
    meta = read_ann_meta(path)
    assert meta["kind"] == "ivf", f"not an IVF layout: {path}"
    probes = _query_lists(query_vec, meta["n_lists"], nprobe, meta["centroids"])
    stored = spark.read.parquet(path).filter(F.col("list_id").isin(probes))
    if where is not None:
        stored = stored.filter(F.expr(where) if isinstance(where, str) else where)
    return cosine_topk(stored, query_vec, k, meta["id_col"], meta["vec_col"])


# ------------------------------------------------- IVF (coarse quantizer)
def _centroid(c: int, dim: int) -> list[float]:
    """Deterministic centroid c: md5-derived components in [-1, 1) — a
    training-free coarse quantizer (same family as the LSH planes). In
    production the literals are replaced by k-means centroids trained on a
    sample; every downstream expression is unchanged."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"ivf_{c}_{d}".encode()).hexdigest()[:8], 16)
        out.append(((h % 2000) - 1000) / 1000.0)
    return out


def _sqdist(a, cvec: list[float]):
    c = F.array(*[F.lit(v) for v in cvec])
    return F.aggregate(
        F.zip_with(a, c, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def ivf_train(
    df: DataFrame,
    n_lists: int = 16,
    n_iter: int = 5,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train IVF centroids: deterministic sample (first ``sample`` rows by
    vec_id) → driver-side numpy Lloyd iterations. At 100 TB the sample is
    what you train on anyway (k-means over a bounded sample, assignment over
    everything); the returned literals feed ``ivf_assign``/``ivf_topk``
    unchanged. Deterministic: ordered sample, first-k-distinct init, ties in
    assignment break to the lowest centroid index."""
    import numpy as np

    rows = (
        df.select(F.col(id_col).alias("i"), _as_double(vec_col).alias("v"))
        .orderBy("i")
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train IVF centroids on an empty sample")
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    # init: first n_lists distinct vectors
    seen: list[np.ndarray] = []
    for v in x:
        if all(not np.array_equal(v, s) for s in seen):
            seen.append(v)
        if len(seen) == n_lists:
            break
    cents = np.stack(seen) if len(seen) == n_lists else np.resize(x, (n_lists, x.shape[1]))
    for _ in range(n_iter):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_lists):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def ivf_assign(
    df: DataFrame,
    n_lists: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(vec_id, list_id): nearest-centroid (argmin squared L2) inverted-file
    assignment. ``centroids`` defaults to the deterministic hash quantizer
    (oracle-reproducible); pass ``ivf_train(...)`` output for the trained
    variant. At 100 TB the table is written partitioned by list_id, so a
    probe reads nprobe/n_lists of the data (partition pruning)."""
    # argmin via array_min + array_position — LINEAR expression tree (a
    # chained when() argmin re-references the accumulated expression per
    # centroid and grows 2^n nodes; same failure class as the stemmer's
    # when-chain, see stemming.stem_expr)
    cvecs = centroids if centroids is not None else [_centroid(c, dim) for c in range(n_lists)]
    emb = _as_double(vec_col)
    dists = F.array(*[_sqdist(emb, cv) for cv in cvecs])
    base = df.select(F.col(id_col).alias("vec_id"), dists.alias("dists"))
    return base.select(
        "vec_id",
        (F.array_position(F.col("dists"), F.array_min(F.col("dists"))) - 1)
        .cast("int")
        .alias("list_id"),
    )


def _query_lists(
    query_vec: list[float], n_lists: int, nprobe: int,
    centroids: list[list[float]] | None = None,
) -> list[int]:
    dim = len(query_vec)
    cvecs = centroids if centroids is not None else [_centroid(c, dim) for c in range(n_lists)]
    dists = []
    for c, cv in enumerate(cvecs):
        dists.append((sum((a - b) ** 2 for a, b in zip(query_vec, cv)), c))
    dists.sort()
    return sorted(c for _, c in dists[:nprobe])


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 20,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF probing: brute-force cosine only inside the
    ``nprobe`` inverted lists nearest to the query."""
    probes = _query_lists(query_vec, n_lists, nprobe, centroids)
    dim = len(query_vec)
    assigned = ivf_assign(df, n_lists, dim, id_col, vec_col, centroids).filter(
        F.col("list_id").isin(probes)
    )
    cand = df.join(
        assigned.select(F.col("vec_id").alias(id_col)), on=id_col, how="left_semi"
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_assign_sql(
    table: str, n_lists: int = 16, dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    def cent(c: int) -> str:
        return "[" + ", ".join(f"{v!r}" for v in _centroid(c, dim)) + "]::DOUBLE[]"

    def dist(c: int) -> str:
        return f"list_distance({vec_col}::DOUBLE[], {cent(c)})"

    # argmin via list_position over the distances list (squared vs plain L2
    # are argmin-equivalent; DuckDB list_distance is the L2 norm)
    dists = ", ".join(dist(c) for c in range(n_lists))
    return f"""
SELECT {id_col} AS vec_id,
       (list_position([{dists}], list_min([{dists}])) - 1)::INT AS list_id
FROM {table}
"""


def ivf_topk_sql(
    table: str,
    query_vec: list[float],
    k: int = 20,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    probes = ", ".join(str(c) for c in _query_lists(query_vec, n_lists, nprobe))
    assign = ivf_assign_sql(table, n_lists, len(query_vec), id_col, vec_col)
    ql = "[" + ", ".join(f"{float(v)!r}" for v in query_vec) + "]::DOUBLE[]"
    return f"""
WITH assigned AS ({assign}),
cand AS (
  SELECT t.* FROM {table} t
  JOIN assigned a ON a.vec_id = t.{id_col}
  WHERE a.list_id IN ({probes}))
SELECT {id_col} AS vec_id,
       round(coalesce(list_dot_product({vec_col}::DOUBLE[], {ql})
             / (sqrt(list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[]))
                * sqrt(list_dot_product({ql}, {ql}))), 0.0), {ROUND_DP}) AS cos
FROM cand
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def lsh_assign_sql(
    table: str, n_planes: int = 8, dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    def plane(p: int) -> str:
        vals = ", ".join(
            f"((('0x' || substr(md5('{p}_{d}'), 1, 8))::BIGINT % 2000) - 1000) / 1000.0"
            for d in range(dim)
        )
        return f"[{vals}]::DOUBLE[]"

    bits = " + ".join(
        f"(CASE WHEN list_dot_product({vec_col}::DOUBLE[], {plane(p)}) > 0 "
        f"THEN (1::BIGINT << {p}) ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"SELECT {id_col} AS vec_id, ({bits})::BIGINT AS bucket FROM {table}"


# ------------------------------------------------ scalar quantization (SQ8)
# int8 symmetric per-vector quantization — the 4× memory-compression read
# path for 100 TB embedding tables (float32 → int8; the scan reads a quarter
# of the bytes, and integer dot products are exact in doubles so the scoring
# is bit-reproducible across engines). Codec: scale = max|x|/127,
# q_i = floor(x_i/scale + 0.5) ∈ [-127, 127]. Scales CANCEL in cosine
# (cos(s·a, t·b) = cos(a, b)), so the cosine reader prunes the scale column
# entirely; scale is stored for dot-product / L2 reconstruction.

SQ_LEVELS = 127


def sq_quantize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, scale, qvec array<int>) — deterministic symmetric int8
    codec. A zero vector quantizes to all-zero qvec with scale 0. SQL
    lambdas with unique variable names (sibling Python lambdas in one
    projection silently cross-bind in PySpark 4.1)."""
    emb = f"cast({vec_col} as array<double>)"
    with_scale = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_emb"),
        (F.expr(f"array_max(transform({emb}, sqa -> abs(sqa)))") / SQ_LEVELS).alias("scale"),
    )
    qvec = F.expr(
        "CASE WHEN scale > 0 THEN "
        "  transform(cast(_emb as array<double>), sqq -> cast(floor(sqq / scale + 0.5) as int)) "
        "ELSE transform(cast(_emb as array<double>), sqz -> 0) END"
    )
    return with_scale.select("vec_id", "scale", qvec.alias("qvec"))


def sq_py_quantize(vec: list[float]) -> tuple[float, list[int]]:
    """The identical codec driver-side, for query vectors."""
    import math

    mx = max(abs(float(v)) for v in vec) if vec else 0.0
    scale = mx / SQ_LEVELS
    if scale == 0.0:
        return 0.0, [0] * len(vec)
    return scale, [int(math.floor(float(v) / scale + 0.5)) for v in vec]


def _sq_cos_topk(quant: DataFrame, q_ints: list[int], k: int) -> DataFrame:
    """Top-k by quantized cosine: integer dot and norms (exact in doubles —
    every partial sum is an integer ≪ 2^53, so fold order is irrelevant),
    one FP division at the end. Selects only (vec_id, qvec) — the scale
    column is pruned from the scan."""
    import math

    qn = math.sqrt(float(sum(v * v for v in q_ints)))
    if qn == 0.0:
        raise ValueError("query vector quantized to zero")
    qlit = "array(" + ", ".join(str(int(v)) for v in q_ints) + ")"
    dot = F.expr(
        f"aggregate(zip_with(qvec, {qlit}, (sqd, sqe) -> cast(sqd as double) * sqe), "
        "cast(0.0 as double), (sqacc, sqx) -> sqacc + sqx)"
    )
    dnorm = F.sqrt(
        F.expr(
            "aggregate(qvec, cast(0.0 as double), "
            "(sqn, sqy) -> sqn + cast(sqy as double) * sqy)"
        )
    )
    return (
        quant.select("vec_id", dot.alias("_dot"), dnorm.alias("_dn"))
        .filter(F.col("_dn") > 0)
        .select("vec_id", F.round(F.col("_dot") / (F.col("_dn") * qn), ROUND_DP).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def sq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors, quantizing on
    the fly — the exactness/recall baseline for the stored layout."""
    _, q_ints = sq_py_quantize(query_vec)
    return _sq_cos_topk(sq_quantize(df, id_col, vec_col), q_ints, k)


def sq_write(
    df: DataFrame, path: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> None:
    """Materialize the SQ8 layout: (vec_id, scale, qvec array<tinyint>) —
    a quarter of the float32 bytes. Values are in [-127, 127] by
    construction, so the tinyint cast is lossless."""
    _ann_write(
        df, path, {"kind": "sq8", "levels": SQ_LEVELS, "id_col": id_col},
        id_col, vec_col,
    )


def sq_stored_topk(spark, path: str, query_vec: list[float], k: int = 20) -> DataFrame:
    """Top-k over a ``sq_write`` layout: identical results to ``sq_topk``
    (the codec is deterministic), but the scan reads int8 instead of
    float32 and prunes the scale column (cosine is scale-invariant)."""
    meta = read_ann_meta(path)
    assert meta["kind"] == "sq8", f"not an SQ8 layout: {path}"
    _, q_ints = sq_py_quantize(query_vec)
    stored = spark.read.parquet(path).select(
        "vec_id", F.col("qvec").cast("array<int>").alias("qvec")
    )
    return _sq_cos_topk(stored, q_ints, k)


def _sq_quant_cte(table: str, vec_col: str = "embedding", id_col: str = "vec_id") -> str:
    return f"""
  SELECT {id_col} AS vec_id,
         list_max(list_transform({vec_col}::DOUBLE[], sqa -> abs(sqa))) / {SQ_LEVELS}.0 AS scale,
         {vec_col}::DOUBLE[] AS emb
  FROM {table}
"""


def sq_quantize_sql(
    table: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """Exploded (vec_id, dim, qval) twin — integers, so the driver hash
    checks the codec bit-for-bit."""
    return f"""
WITH s AS ({_sq_quant_cte(table, vec_col, id_col)}),
q AS (
  SELECT vec_id,
         CASE WHEN scale > 0
              THEN list_transform(emb, sqq -> CAST(floor(sqq / scale + 0.5) AS INT))
              ELSE list_transform(emb, sqz -> 0) END AS qvec
  FROM s)
SELECT vec_id,
       CAST(generate_subscripts(qvec, 1) - 1 AS INT) AS dim,
       unnest(qvec) AS qval
FROM q
"""


def sq_topk_sql(
    table: str,
    query_vec: list[float],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    import math

    _, q_ints = sq_py_quantize(query_vec)
    qn = math.sqrt(float(sum(v * v for v in q_ints)))
    ql = "[" + ", ".join(str(int(v)) for v in q_ints) + "]::DOUBLE[]"
    return f"""
WITH s AS ({_sq_quant_cte(table, vec_col, id_col)}),
q AS (
  SELECT vec_id,
         CASE WHEN scale > 0
              THEN list_transform(emb, sqq -> floor(sqq / scale + 0.5))
              ELSE list_transform(emb, sqz -> 0.0) END AS qvec
  FROM s)
SELECT vec_id,
       round(coalesce(list_dot_product(qvec, {ql})
             / (sqrt(list_dot_product(qvec, qvec)) * {qn!r}), 0.0), {ROUND_DP}) AS cos
FROM q
WHERE list_dot_product(qvec, qvec) > 0
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def mmr_rerank(
    hits: list[tuple[int, float]],
    emb_df: DataFrame,
    lam: float = 0.7,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> list[tuple[int, float]]:
    """Maximal Marginal Relevance diversification (Carbonell & Goldstein
    1998) over a candidate list: greedily pick
    argmax λ·rel_norm(d) − (1−λ)·max_{s∈selected} cos(d, s),
    ties broken by doc id. Returns [(doc_id, mmr_score)] of length ≤ k.

    Scale shape: this is a RERANK stage — the candidate list is already
    top-|hits| (≤ a few hundred), so the |hits| embeddings collect to the
    driver via one pruned point read and the greedy quadratic loop runs
    on ≤ |hits|² tiny dot products. Never feed it an unbounded frame."""
    import numpy as np

    if not hits:
        return []
    ids = [d for d, _ in hits]
    rows = (
        emb_df.filter(F.col(id_col).isin(ids))
        .select(id_col, emb_col)
        .collect()
    )
    embs = {}
    for r in rows:
        v = np.asarray(r[emb_col], dtype=np.float64)
        n = np.linalg.norm(v)
        embs[r[id_col]] = v / n if n else v
    rel = {d: s for d, s in hits}
    # min-max normalize to [0, 1]: dividing by max(rel) would INVERT the
    # relevance ordering when every candidate score is negative (opposite-
    # halfspace cosine candidates), making MMR greedily pick worst-first
    min_rel = min(rel.values())
    span = (max(rel.values()) - min_rel) or 1.0
    cand = [d for d in ids if d in embs]
    selected: list[tuple[int, float]] = []
    while cand and len(selected) < k:
        best = None
        for d in cand:
            sim = max(
                (float(embs[d] @ embs[s]) for s, _ in selected), default=0.0
            )
            score = lam * ((rel[d] - min_rel) / span) - (1.0 - lam) * sim
            key = (score, -d)
            if best is None or key > best[0]:
                best = (key, d, score)
        _, d, score = best
        selected.append((d, round(score, 6)))
        cand.remove(d)
    return selected


# ---------------------------------------------------------------------------
# Product quantization (PQ): m subspaces × ks codewords, ADC scan
# ---------------------------------------------------------------------------

def pq_train(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    n_iter: int = 5,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ codebooks (Jégou et al. 2011): split the vector into ``m``
    subspaces of dim/m and run the same deterministic sample k-means as
    ``ivf_train`` independently per subspace. Returns codebooks[m][ks][dsub]
    as plain literals — like the IVF centroids, training is bounded-sample
    driver-side work; ENCODING and SCANNING are the distributed parts."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rows = (
        df.select(F.col(id_col).alias("i"), _as_double(vec_col).alias("v"))
        .orderBy("i")
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train PQ codebooks on an empty sample")
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    books: list[list[list[float]]] = []
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        seen: list = []
        for v in xs:
            if all(not np.array_equal(v, s) for s in seen):
                seen.append(v)
            if len(seen) == ks:
                break
        cents = (
            np.stack(seen) if len(seen) == ks else np.resize(xs, (ks, dsub))
        )
        for _ in range(n_iter):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ks):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def _pq_default_books(m: int, ks: int, dim: int) -> list[list[list[float]]]:
    """Deterministic hash codebooks (the oracle-reproducible default,
    mirroring ``_centroid``): codeword c of subspace j reuses the IVF
    hash-centroid generator on a per-subspace salt."""
    dsub = dim // m
    return [
        [_centroid(j * ks + c, dsub) for c in range(ks)] for j in range(m)
    ]


def pq_encode(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """(vec_id, codes array<int>): per-subspace nearest-codeword codes —
    dim float32s compress to m small ints (16× at dim=64, m=8 vs float32).
    Argmin per subspace via the same linear array_min/array_position tree
    as ``ivf_assign``; ties break to the lowest codeword index in BOTH
    engines (squared L2 on identical literals)."""
    books = codebooks if codebooks is not None else _pq_default_books(m, ks, dim)
    dsub = dim // m
    emb = _as_double(vec_col)
    code_cols = []
    for j, book in enumerate(books):
        sub = F.slice(emb, j * dsub + 1, dsub)
        dists = F.array(*[_sqdist(sub, cw) for cw in book])
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return df.select(
        F.col(id_col).alias("vec_id"), F.array(*code_cols).alias("codes")
    )


def _pq_lut(
    books: list[list[list[float]]], query_vec: list[float]
) -> list[list[float]]:
    """ADC lookup tables: lut[j][c] = <q_sub_j, codeword_c> — computed
    driver-side in one fixed order so both engines consume identical
    double literals."""
    m = len(books)
    dsub = len(books[0][0])
    lut = []
    for j in range(m):
        q = query_vec[j * dsub : (j + 1) * dsub]
        lut.append(
            [
                float(sum(qv * cv for qv, cv in zip(q, cw)))
                for cw in books[j]
            ]
        )
    return lut


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 20,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """(vec_id, score): asymmetric-distance top-k — encode + ADC in one
    pass (use ``pq_write``/``pq_stored_topk`` for the stored-codes scan).
    score = Σ_j lut[j][code_j] (approximate inner product), rounded and
    ranked (score DESC, vec_id ASC) via TakeOrderedAndProject.

    ``rerank=R``: ADC retrieves the coarse top-R, then the true winners
    come from an EXACT cosine pass over only those R rows (score = exact
    cosine) — the standard ADC+R composition (Jégou et al. 2011 §VI). Use
    it whenever neighbors differ at sub-quantization-error scale: raw ADC
    resolves coarse geometry but not fine intra-cluster order (measured
    recall cliff in BENCH_SCALING.md §ANN recall), while ADC+R restores
    ≥0.9 recall at R≈20·k for the cost of R exact distances."""
    books = codebooks if codebooks is not None else _pq_default_books(m, ks, dim)
    lut = _pq_lut(books, query_vec)
    codes = pq_encode(df, m, ks, dim, id_col, vec_col, books)
    coarse = _pq_adc(codes, lut, k if rerank is None else max(int(rerank), k))
    if rerank is None:
        return coarse
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    j = df.withColumnRenamed(id_col, "vec_id").join(
        F.broadcast(coarse.select("vec_id")), "vec_id"
    )
    cos = _cos(_as_double(vec_col), q)
    return (
        j.select("vec_id", F.round(cos, ROUND_DP).alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(int(k))
    )


def _pq_adc(codes: DataFrame, lut: list[list[float]], k: int) -> DataFrame:
    score = None
    for j, table in enumerate(lut):
        arr = F.array(*[F.lit(v) for v in table])
        term = F.element_at(arr, F.element_at(F.col("codes"), j + 1) + 1)
        score = term if score is None else score + term
    return (
        codes.select("vec_id", F.round(score, 5).alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(int(k))
    )


def pq_write(
    df: DataFrame,
    path: str,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> None:
    """Materialize the PQ layout: (vec_id, codes array<tinyint>) — m bytes
    per vector (ks ≤ 128), 16-32× smaller than the float32 scan. The
    codebooks are pinned in the meta sidecar so readers decode with the
    EXACT quantizer that wrote the codes."""
    if ks > 128:
        raise ValueError("ks must be <= 128 for the tinyint code layout")
    books = codebooks if codebooks is not None else _pq_default_books(m, ks, dim)
    _ann_write(
        df, path,
        {"kind": "pq", "m": m, "ks": ks, "dim": dim, "codebooks": books},
        id_col, vec_col,
    )


def pq_stored_topk(
    spark, path: str, query_vec: list[float], k: int = 20
) -> DataFrame:
    """ADC top-k over a ``pq_write`` layout: the scan reads m bytes per
    vector instead of dim float32s; identical results to ``pq_topk`` with
    the pinned codebooks."""
    meta = read_ann_meta(path)
    assert meta["kind"] == "pq", f"not a PQ layout: {path}"
    lut = _pq_lut(meta["codebooks"], query_vec)
    stored = spark.read.parquet(path).select(
        "vec_id", F.col("codes").cast("array<int>").alias("codes")
    )
    return _pq_adc(stored, lut, k)


def _pq_sq_sql(vec_col: str, base: int, cw: list[float]) -> str:
    """Squared-L2 to one codeword as a left-assoc term sum — the same
    fold order as the Spark aggregate, so doubles (and argmin ties)
    match bit-for-bit."""
    return " + ".join(
        f"({vec_col}[{base + i + 1}] - {v!r}::DOUBLE)"
        f" * ({vec_col}[{base + i + 1}] - {v!r}::DOUBLE)"
        for i, v in enumerate(cw)
    )


def pq_encode_sql(
    table: str,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> str:
    books = codebooks if codebooks is not None else _pq_default_books(m, ks, dim)
    dsub = dim // m
    v = f"({vec_col}::DOUBLE[])"
    cols = []
    for j, book in enumerate(books):
        dists = ", ".join(_pq_sq_sql(v, j * dsub, cw) for cw in book)
        cols.append(
            f"(list_position([{dists}], list_min([{dists}])) - 1)::INT"
        )
    codes = ", ".join(cols)
    return f"SELECT {id_col} AS vec_id, [{codes}] AS codes FROM {table}"


def pq_topk_sql(
    table: str,
    query_vec: list[float],
    k: int = 20,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    rerank: int | None = None,
) -> str:
    books = codebooks if codebooks is not None else _pq_default_books(m, ks, dim)
    lut = _pq_lut(books, query_vec)
    enc = pq_encode_sql(table, m, ks, dim, id_col, vec_col, books)
    terms = " + ".join(
        f"([{', '.join(repr(v) for v in t)}]::DOUBLE[])[codes[{j + 1}] + 1]"
        for j, t in enumerate(lut)
    )
    adc = f"""
SELECT vec_id, ROUND({terms}, 5) AS score
FROM ({enc}) enc
ORDER BY score DESC, vec_id ASC
LIMIT {int(k if rerank is None else max(int(rerank), k))}
"""
    if rerank is None:
        return adc
    ql = "[" + ", ".join(f"{float(v)!r}" for v in query_vec) + "]::DOUBLE[]"
    return f"""
SELECT t.{id_col} AS vec_id,
       round(coalesce(list_dot_product(t.{vec_col}::DOUBLE[], {ql})
             / (sqrt(list_dot_product(t.{vec_col}::DOUBLE[], t.{vec_col}::DOUBLE[]))
                * sqrt(list_dot_product({ql}, {ql}))), 0.0), {ROUND_DP}) AS score
FROM {table} t JOIN ({adc}) coarse ON coarse.vec_id = t.{id_col}
ORDER BY score DESC, vec_id ASC
LIMIT {int(k)}
"""


# ---------------------------------------------------------------------------
# IVF-PQ: coarse prune + residual PQ codes (the FAISS IVFPQ composition)
# ---------------------------------------------------------------------------

def _residual_col(emb, list_id_col, cvecs: list[list[float]]):
    """embedding − centroid[list_id] as one zip_with over an array-of-
    arrays literal (JVM codegen; centroid tables are tiny literals)."""
    cents = F.array(*[F.array(*[F.lit(v) for v in cv]) for cv in cvecs])
    cvec = F.element_at(cents, list_id_col + 1)
    return F.zip_with(emb, cvec, lambda x, c: x - c)


def ivfpq_write(
    df: DataFrame,
    path: str,
    n_lists: int = 16,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    train_sample: int = 2048,
) -> None:
    """Materialize the IVF-PQ layout: coarse-assign each vector to its
    nearest centroid list, PQ-encode the RESIDUAL (x − centroid — the
    classic variance reduction: residuals are smaller and better covered
    by ks codewords), and write (vec_id, codes) partitioned by list_id.
    A probe then reads nprobe/n_lists of an already-16×-compressed table.

    ``codebooks=None`` trains them on the residuals of the deterministic
    sample (same recipe as ``pq_train``); both quantizers are pinned in
    the meta sidecar."""
    if ks > 128:
        raise ValueError("ks must be <= 128 for the tinyint code layout")
    cvecs = (
        centroids
        if centroids is not None
        else [_centroid(c, dim) for c in range(n_lists)]
    )
    books = codebooks
    if books is None:
        assigned = ivf_assign(df, n_lists, dim, id_col, vec_col, cvecs)
        base = df.join(assigned.withColumnRenamed("vec_id", id_col), id_col)
        resid = base.select(
            F.col(id_col).alias("vec_id"),
            "list_id",
            _residual_col(
                _as_double(vec_col), F.col("list_id"), cvecs
            ).alias("resid"),
        )
        books = pq_train(
            resid, m, ks, dim, sample=train_sample, id_col="vec_id", vec_col="resid"
        )
    _ann_write(
        df, path,
        {
            "kind": "ivfpq",
            "n_lists": n_lists,
            "m": m,
            "ks": ks,
            "dim": dim,
            "centroids": cvecs,
            "codebooks": books,
        },
        id_col, vec_col,
    )


def ivfpq_stored_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 20,
    nprobe: int = 4,
) -> DataFrame:
    """(vec_id, score): ADC top-k over an ``ivfpq_write`` layout. The scan
    touches only the nprobe probed list partitions and reads m bytes per
    vector; score = ⟨q, c_list⟩ + Σ_j lut[j][code_j] ≈ ⟨q, x⟩ (inner
    product decomposes over the residual — the LUT is list-independent,
    the centroid term is a per-list constant)."""
    meta = read_ann_meta(path)
    assert meta["kind"] == "ivfpq", f"not an IVF-PQ layout: {path}"
    cvecs, books = meta["centroids"], meta["codebooks"]
    probes = _query_lists(query_vec, meta["n_lists"], nprobe, cvecs)
    lut = _pq_lut(books, query_vec)
    qc = [
        float(sum(qv * cv for qv, cv in zip(query_vec, cvecs[c])))
        for c in range(meta["n_lists"])
    ]
    stored = spark.read.parquet(path).filter(F.col("list_id").isin(probes))
    codes = stored.select(
        "vec_id",
        F.col("codes").cast("array<int>").alias("codes"),
        F.element_at(
            F.array(*[F.lit(v) for v in qc]), F.col("list_id").cast("int") + 1
        ).alias("qc"),
    )
    score = F.col("qc")
    for j, table in enumerate(lut):
        arr = F.array(*[F.lit(v) for v in table])
        score = score + F.element_at(arr, F.element_at(F.col("codes"), j + 1) + 1)
    return (
        codes.select("vec_id", F.round(score, 5).alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(int(k))
    )


def ivfpq_topk_sql(
    table: str,
    query_vec: list[float],
    k: int = 20,
    nprobe: int = 4,
    n_lists: int = 16,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> str:
    """DuckDB twin: recompute assignment + residual codes from the raw
    table (same argmin literals), filter to the probed lists, ADC + the
    per-list centroid term — value-identical to the stored reader ONLY
    under the same codebooks. ``ivfpq_write(codebooks=None)`` TRAINS its
    books on the residual sample and pins them in the meta sidecar, so a
    None default here would silently diverge from such a layout —
    ``codebooks`` is therefore required: pass
    ``read_ann_meta(path)["codebooks"]`` (or the explicit books you
    pinned at write time, e.g. ``_pq_default_books(m, ks, dim)``)."""
    if codebooks is None:
        raise ValueError(
            "ivfpq_topk_sql needs the layout's pinned codebooks "
            '(read_ann_meta(path)["codebooks"]) — a hash-book default '
            "would silently diverge from a trained ivfpq_write layout"
        )
    cvecs = (
        centroids
        if centroids is not None
        else [_centroid(c, dim) for c in range(n_lists)]
    )
    books = codebooks
    probes = _query_lists(query_vec, n_lists, nprobe, cvecs)
    lut = _pq_lut(books, query_vec)
    qc = [
        float(sum(qv * cv for qv, cv in zip(query_vec, cvecs[c])))
        for c in range(n_lists)
    ]
    dsub = dim // m

    def cent_sql(c: int) -> str:
        return "[" + ", ".join(f"{v!r}::DOUBLE" for v in cvecs[c]) + "]"

    v = f"({vec_col}::DOUBLE[])"
    dists = ", ".join(_pq_sq_sql(v, 0, cvecs[c]) for c in range(n_lists))
    cents = "[" + ", ".join(cent_sql(c) for c in range(n_lists)) + "]"
    code_cols = []
    for j, book in enumerate(books):
        d = ", ".join(_pq_sq_sql("r", j * dsub, cw) for cw in book)
        code_cols.append(f"(list_position([{d}], list_min([{d}])) - 1)::INT")
    adc = " + ".join(
        f"([{', '.join(repr(x) for x in t)}]::DOUBLE[])[codes[{j + 1}] + 1]"
        for j, t in enumerate(lut)
    )
    qc_list = "[" + ", ".join(repr(x) for x in qc) + "]::DOUBLE[]"
    probe_list = ", ".join(str(p) for p in probes)
    return f"""
WITH assigned AS (
  SELECT {id_col} AS vec_id, {v} AS emb,
         (list_position([{dists}], list_min([{dists}])) - 1)::INT AS list_id
  FROM {table}),
probed AS (SELECT * FROM assigned WHERE list_id IN ({probe_list})),
resid AS (
  SELECT vec_id, list_id,
         list_transform(range(1, {dim} + 1),
                        i -> emb[i] - ({cents})[list_id + 1][i]) AS r
  FROM probed),
coded AS (SELECT vec_id, list_id, [{', '.join(code_cols)}] AS codes FROM resid)
SELECT vec_id,
       ROUND(({qc_list})[list_id + 1] + {adc}, 5) AS score
FROM coded
ORDER BY score DESC, vec_id ASC
LIMIT {int(k)}
"""


# ------------------------------------------- late interaction (MaxSim)
def _hash_emb_expr(col_name: str, dim: int):
    """Per-term deterministic embedding, computed IN-ENGINE: byte i of
    md5(term) → float in [-1, 1). Identical to
    expansion.hash_term_vectors and to the DuckDB hex-substr twin, so the
    whole late-interaction pipeline is cross-engine hash-checkable. The
    honest swap point for a real token encoder (ColBERT/BERT) is this one
    expression — everything downstream is encoder-agnostic."""
    return F.expr(
        f"transform(sequence(0, {dim - 1}), d -> "
        f"cast(conv(substr(md5({col_name}), (d % 16) * 2 + 1, 2), 16, 10) AS DOUBLE)"
        f" / 128.0 - 1.0)"
    )


def maxsim_topk(
    doc_terms: DataFrame,
    query_terms: list[str],
    k: int = 20,
    dim: int = 8,
    id_col: str = "doc_id",
    term_col: str = "term",
    round_dp: int | None = ROUND_DP,
) -> DataFrame:
    """Late-interaction retrieval (ColBERT MaxSim): score(doc) =
    Σ_{q ∈ query} max_{t ∈ doc} ⟨emb(q), emb(t)⟩ — each query token finds
    its best-matching doc token, unlike single-vector retrieval where the
    pooled doc vector must serve every query token at once.

    Shape: NO join at all — the query-side vectors ride along as a
    literal array of structs, each doc term computes its |q| dots
    map-side (zip_with + aggregate, JVM codegen), then two hash
    aggregations (max per (doc, query-token), sum per doc) and a
    TakeOrderedAndProject. At 100 TB the only shuffle is the
    (doc_id, qi)-keyed agg over distinct doc terms — postings-sized, with
    map-side partial max."""
    import hashlib

    qvecs = []
    for qi, term in enumerate(sorted(set(query_terms))):
        digest = hashlib.md5(term.encode()).digest()
        qvecs.append((qi, [digest[i % 16] / 128.0 - 1.0 for i in range(dim)]))

    # built over the post-rename "term" column: dots is applied AFTER the
    # select that aliases term_col away, so referencing term_col here
    # would break for any non-default term column name
    demb = _hash_emb_expr("term", dim)
    dots = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    demb,
                    F.array(*[F.lit(float(v)) for v in vec]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for _, vec in qvecs
        ]
    )
    per_term = (
        doc_terms.select(F.col(id_col).alias("doc_id"), F.col(term_col).alias("term"))
        .distinct()
        .select("doc_id", F.posexplode(dots).alias("qi", "dot"))
    )
    score = F.sum("m")
    if round_dp is not None:
        score = F.round(score, round_dp)
    return (
        per_term.groupBy("doc_id", "qi")
        .agg(F.max("dot").alias("m"))
        .groupBy("doc_id")
        .agg(score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def maxsim_topk_sql(
    tf_sql: str,
    query_terms: list[str],
    k: int = 20,
    dim: int = 8,
    round_dp: int = ROUND_DP,
) -> str:
    """DuckDB twin of ``maxsim_topk`` over a (doc_id, term, ...) CTE."""
    import hashlib

    rows = []
    for qi, term in enumerate(sorted(set(query_terms))):
        digest = hashlib.md5(term.encode()).digest()
        for d in range(dim):
            rows.append(f"({qi}, {d}, {digest[d % 16] / 128.0 - 1.0!r})")
    qv = ", ".join(rows)
    hashval = (
        "(('0x' || substr(md5(term), (d % 16) * 2 + 1, 2))::INT / 128.0 - 1.0)"
    )
    return f"""
WITH tf AS ({tf_sql}),
dt AS (SELECT DISTINCT doc_id, term FROM tf),
qv(qi, dim, v) AS (VALUES {qv}),
demb AS (
  SELECT doc_id, term, d AS dim, {hashval} AS e
  FROM dt, unnest(range(0, {dim})) AS r(d)),
dots AS (
  SELECT doc_id, term, qi, sum(e * v) AS dot
  FROM demb JOIN qv USING (dim) GROUP BY 1, 2, 3),
mx AS (SELECT doc_id, qi, max(dot) AS m FROM dots GROUP BY 1, 2)
SELECT doc_id, round(sum(m), {round_dp}) AS score
FROM mx GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# ------------------------------------------------------------- SemDeDup
def semantic_dedup(
    df: DataFrame,
    tau: float = 0.9,
    n_lists: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication") → one row per vector:
    (vec_id, list_id, cdist, keep).

    Cluster embeddings with the IVF coarse quantizer (k-means centroids via
    ``ivf_train``, or the deterministic hash quantizer for oracle runs),
    then WITHIN each cluster drop near-duplicates: a vector is dropped iff
    some same-cluster neighbor has cosine ≥ τ with it AND higher keep
    priority. Keep priority follows the paper's diversity rule — the point
    FARTHER from its centroid survives (the paper keeps the lowest
    centroid-similarity example) — applied per EDGE (one join, no
    connected-components iteration; for transitive-group semantics compose
    the τ-pairs with ``dedup.dedup_components`` instead). Ties break to the
    lower vec_id.

    100 TB plan: the pair space is Σ_c |cluster_c|² — the whole point of
    clustering first; the self-join shuffles once on list_id, and with the
    assignment written ``partitionBy(list_id)`` (``ivf_write``) it becomes
    co-partitioned. ``cdist`` (squared L2 to the assigned centroid) and the
    pairwise cosine are rounded at ROUND_DP before any comparison so keep
    verdicts are engine-identical."""
    cvecs = (
        centroids if centroids is not None else [_centroid(c, dim) for c in range(n_lists)]
    )
    emb = _as_double(vec_col)
    dists = F.array(*[_sqdist(emb, cv) for cv in cvecs])
    base = (
        df.select(F.col(id_col).alias("vec_id"), emb.alias("v"), dists.alias("dists"))
        .select(
            "vec_id",
            "v",
            (F.array_position(F.col("dists"), F.array_min(F.col("dists"))) - 1)
            .cast("int")
            .alias("list_id"),
            F.round(F.array_min(F.col("dists")), ROUND_DP).alias("cdist"),
        )
    )
    a = base.select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("va"),
        "list_id", F.col("cdist").alias("ca"),
    )
    b = base.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("vb"),
        "list_id", F.col("cdist").alias("cb"),
    )
    cos = _cos(F.col("va"), F.col("vb"))
    dropped = (
        a.join(b, "list_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(F.round(cos, ROUND_DP) >= tau)
        .filter(
            (F.col("cb") > F.col("ca"))
            | ((F.col("cb") == F.col("ca")) & (F.col("b_id") < F.col("a_id")))
        )
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
    )
    return (
        base.join(dropped.withColumn("_d", F.lit(True)), "vec_id", "left")
        .select("vec_id", "list_id", "cdist", F.col("_d").isNull().alias("keep"))
    )


def semantic_dedup_sql(
    table: str,
    tau: float = 0.9,
    n_lists: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ``semantic_dedup`` (hash-quantizer centroids).
    Squared centroid distance uses the expanded form
    ⟨v,v⟩ − 2⟨v,c⟩ + ⟨c,c⟩ (DuckDB lacks Spark's zip_with fold); the two
    differ only in float rounding ~1e-15, absorbed by ROUND_DP."""

    def cent(c: int) -> str:
        return "[" + ", ".join(f"{v!r}" for v in _centroid(c, dim)) + "]::DOUBLE[]"

    def sqd(c: int) -> str:
        cc = sum(v * v for v in _centroid(c, dim))
        return (
            f"(list_dot_product(v, v) - 2.0 * list_dot_product(v, {cent(c)})"
            f" + {cc!r})"
        )

    dists = ", ".join(sqd(c) for c in range(n_lists))
    cos = (
        "round(coalesce(list_dot_product(a.va, b.vb)"
        " / (sqrt(list_dot_product(a.va, a.va))"
        f" * sqrt(list_dot_product(b.vb, b.vb))), 0.0), {ROUND_DP})"
    )
    return f"""
WITH pts AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table}),
assigned AS (
  SELECT vec_id, v,
         (list_position([{dists}], list_min([{dists}])) - 1)::INT AS list_id,
         round(list_min([{dists}]), {ROUND_DP}) AS cdist
  FROM pts),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM (SELECT vec_id, v AS va, list_id, cdist AS ca FROM assigned) a
  JOIN (SELECT vec_id, v AS vb, list_id, cdist AS cb FROM assigned) b
    ON a.list_id = b.list_id AND a.vec_id != b.vec_id
  WHERE {cos} >= {tau}
    AND (b.cb > a.ca OR (b.cb = a.ca AND b.vec_id < a.vec_id)))
SELECT vec_id, list_id, cdist,
       vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
FROM assigned
"""


# ---------------------------------------------------------------------------
# 1-bit binary quantization (ES BBQ / classic sign-bit BQ shape):
# each dimension collapses to one bit (above / below the per-dim corpus
# MIDRANGE), the bits pack into int64 words, and the coarse pass ranks by
# Hamming distance computed as bit_count(xor) — pure JVM integer ops over
# dim/64 longs per row, a 32x byte reduction vs float32. The coarse top-C
# candidates are then reranked by EXACT cosine over the raw vectors, so the
# final top-k quality is bounded only by coarse recall, never by the codec.
#
# The threshold is the per-dim midrange (min+max)/2 rather than the mean:
# min/max are fold-order-INSENSITIVE, so Spark and the SQL oracle derive
# bit-identical thresholds from the same float32 data (a mean would differ
# in the last ulp between engines and could flip a bit for values on the
# boundary). At 100 TB the thresholds come from one cheap min/max agg (or a
# sample) and are ~dim floats — broadcast literals, never a join.
# ---------------------------------------------------------------------------

BQ_WORD = 64


def bq_thresholds(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[float]:
    """Per-dimension midrange (min+max)/2 over the corpus — ~dim doubles,
    one aggregation job. Exactly reproducible in any engine (min/max have
    no fold-order sensitivity; the midpoint is one IEEE add + halve)."""
    rows = (
        df.select(F.posexplode(_as_double(vec_col)).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .orderBy("dim")
        .collect()
    )
    return [(r["lo"] + r["hi"]) / 2.0 for r in rows]


def _bq_bits_expr(vec_col: str, thresholds: list[float]) -> str:
    """SQL expression packing sign bits (v > threshold) into int64 words,
    little-endian within each word. Pure comparisons + shifts — whole-stage
    codegen keeps this JVM-side."""
    words = []
    for w in range(0, len(thresholds), BQ_WORD):
        terms = " + ".join(
            f"IF(cast({vec_col}[{i}] as double) > cast({thresholds[i]!r} as double), "
            f"shiftleft(1L, {i - w}), 0L)"
            for i in range(w, min(w + BQ_WORD, len(thresholds)))
        )
        words.append(f"({terms})")
    return "array(" + ", ".join(words) + ")"


def bq_quantize(
    df: DataFrame,
    thresholds: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bits array<bigint>) — ceil(dim/64) words per vector."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.expr(_bq_bits_expr(vec_col, thresholds)).alias("bits"),
    )


def bq_py_bits(query_vec: list[float], thresholds: list[float]) -> list[int]:
    """The identical packing driver-side, for query vectors (signed i64
    words, matching Spark's bigint)."""
    words = []
    for w in range(0, len(thresholds), BQ_WORD):
        acc = 0
        for i in range(w, min(w + BQ_WORD, len(thresholds))):
            if float(query_vec[i]) > thresholds[i]:
                acc |= 1 << (i - w)
        if acc >= 1 << 63:
            acc -= 1 << 64
        words.append(acc)
    return words


def _bq_hamming(bits_col: str, qwords: list[int]):
    """Hamming distance to the packed query: Σ bit_count(word ^ qword)."""
    qlit = "array(" + ", ".join(f"cast({w} as bigint)" for w in qwords) + ")"
    return F.expr(
        f"aggregate(zip_with({bits_col}, {qlit}, (bqx, bqy) -> bit_count(bqx ^ bqy)), "
        "0, (bqa, bqb) -> bqa + bqb)"
    )


def _bq_rerank(
    emb_src: DataFrame,
    coarse: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-cosine rerank of the coarse candidates: broadcast the ≤C-row
    candidate list into the embedding scan (the join filters rows BEFORE the
    cosine projection runs — distance math touches only candidates)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    j = emb_src.withColumnRenamed(id_col, "vec_id").join(
        F.broadcast(coarse), "vec_id"
    )
    emb = _as_double(vec_col)
    cos = _cos(emb, q)
    return (
        j.select("vec_id", "hamming", F.round(cos, ROUND_DP).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def bq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 50,
    thresholds: list[float] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via 1-bit quantization: coarse top-``rerank``
    by Hamming (ties doc asc — a deterministic cut), exact cosine rerank to
    ``k``. ``rerank=|corpus|`` degenerates to exact search (tested)."""
    thr = thresholds if thresholds is not None else bq_thresholds(df, id_col, vec_col)
    qwords = bq_py_bits(query_vec, thr)
    coarse = (
        bq_quantize(df, thr, id_col, vec_col)
        .select("vec_id", _bq_hamming("bits", qwords).alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(rerank)
    )
    return _bq_rerank(df, coarse, query_vec, k, id_col, vec_col)


def bq_write(
    df: DataFrame,
    path: str,
    thresholds: list[float] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the BQ layout: (vec_id, bits, embedding) in one parquet —
    parquet is columnar, so the coarse pass reads ONLY the bits column
    (dim/8 bytes/row; plan-tested) and the rerank reads raw vectors for just
    the broadcast candidate ids. Thresholds persist in the meta sidecar so
    probes always binarize queries consistently with the stored bits."""
    thr = thresholds if thresholds is not None else bq_thresholds(df, id_col, vec_col)
    _ann_write(
        df, path,
        {"kind": "bq", "thresholds": thr, "id_col": id_col,
         "vec_col": vec_col},
        id_col, vec_col,
    )


def bq_stored_topk(
    spark, path: str, query_vec: list[float], k: int = 10, rerank: int = 50
) -> DataFrame:
    """Top-k over a ``bq_write`` layout — identical results to ``bq_topk``
    (deterministic codec + persisted thresholds), but the coarse scan reads
    int64 words instead of float32 vectors."""
    meta = read_ann_meta(path)
    assert meta["kind"] == "bq", f"not a BQ layout: {path}"
    qwords = bq_py_bits(query_vec, meta["thresholds"])
    stored = spark.read.parquet(path)
    coarse = (
        stored.select("vec_id", _bq_hamming("bits", qwords).alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(rerank)
    )
    return _bq_rerank(
        stored.select("vec_id", "embedding"), coarse, query_vec, k,
        "vec_id", "embedding",
    )


def bq_topk_sql(
    table: str,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Relational twin: per-dim midrange thresholds from the same data,
    bit-disagreement count as Hamming (no packing needed for truth), same
    deterministic coarse cut, same exact-cosine rerank."""
    ql = "[" + ", ".join(f"{float(v)!r}" for v in query_vec) + "]::DOUBLE[]"
    return f"""
WITH e AS (SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS emb FROM {table}),
d AS (SELECT vec_id, CAST(generate_subscripts(emb, 1) - 1 AS INT) AS dim,
             unnest(emb) AS v
      FROM e),
thr AS (SELECT dim, (min(v) + max(v)) / 2 AS mid FROM d GROUP BY 1),
q AS (SELECT CAST(generate_subscripts(ql, 1) - 1 AS INT) AS dim, unnest(ql) AS qv
      FROM (SELECT {ql} AS ql)),
ham AS (
  SELECT d.vec_id,
         sum(CASE WHEN (d.v > t.mid) <> (q.qv > t.mid) THEN 1 ELSE 0 END)::INT
           AS hamming
  FROM d JOIN thr t USING (dim) JOIN q USING (dim)
  GROUP BY 1),
coarse AS (SELECT vec_id, hamming FROM ham
           ORDER BY hamming ASC, vec_id ASC LIMIT {rerank})
SELECT c.vec_id AS vec_id, c.hamming AS hamming,
       round(coalesce(list_dot_product(e.emb, {ql})
             / (sqrt(list_dot_product(e.emb, e.emb))
                * sqrt(list_dot_product({ql}, {ql}))), 0.0), {ROUND_DP}) AS cos
FROM coarse c JOIN e USING (vec_id)
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def _ann_encode(df, meta: dict, idc: str, vc: str):
    """Encode a batch of raw vectors for a stored layout with its PINNED
    quantizer: returns (encoded DataFrame, partition column or None).
    Shared by batch ``ann_append`` and streaming ``stream_ann_append`` —
    every codec is a pure function of (vector, pinned params)."""
    kind = meta["kind"]
    if kind == "lsh":
        assigned = lsh_assign(df, meta["n_planes"], meta["dim"], idc, vc)
        return df.join(assigned.withColumnRenamed("vec_id", idc), idc), "bucket"
    if kind == "ivf":
        assigned = ivf_assign(
            df, meta["n_lists"], meta["dim"], idc, vc, meta["centroids"]
        )
        return df.join(assigned.withColumnRenamed("vec_id", idc), idc), "list_id"
    if kind == "sq8":
        out = sq_quantize(df, idc, vc).select(
            "vec_id", "scale", F.col("qvec").cast("array<tinyint>").alias("qvec")
        )
        return out, None
    if kind == "pq":
        out = pq_encode(
            df, meta["m"], meta["ks"], meta["dim"], idc, vc, meta["codebooks"]
        ).select("vec_id", F.col("codes").cast("array<tinyint>").alias("codes"))
        return out, None
    if kind == "bq":
        out = df.select(
            F.col(idc).alias("vec_id"),
            F.expr(_bq_bits_expr(vc, meta["thresholds"])).alias("bits"),
            F.col(vc).alias("embedding"),
        )
        return out, None
    if kind == "ivfpq":
        cvecs, books = meta["centroids"], meta["codebooks"]
        assigned = ivf_assign(df, meta["n_lists"], meta["dim"], idc, vc, cvecs)
        base = df.join(assigned.withColumnRenamed("vec_id", idc), idc)
        resid = base.select(
            F.col(idc).alias("vec_id"),
            "list_id",
            _residual_col(_as_double(vc), F.col("list_id"), cvecs).alias("resid"),
        )
        codes = pq_encode(
            resid, meta["m"], meta["ks"], meta["dim"], "vec_id", "resid", books
        )
        out = (
            resid.select("vec_id", "list_id")
            .join(codes, "vec_id")
            .select(
                "vec_id",
                F.col("codes").cast("array<tinyint>").alias("codes"),
                "list_id",
            )
        )
        return out, "list_id"
    raise ValueError(f"unknown ANN layout kind: {kind!r}")


def ann_append(
    df: DataFrame,
    path: str,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> None:
    """Incrementally grow ANY stored ANN layout (`lsh_write` / `ivf_write` /
    `sq_write` / `pq_write` / `bq_write` / `ivfpq_write`): re-encode the NEW
    vectors with the layout's PINNED quantizer from the meta sidecar and
    append their rows/partitions. Readers (`*_stored_topk`) see old + new
    with semantics identical to a full rewrite, because every codec here is
    a pure function of (vector, pinned parameters) — no retraining, no
    compaction, no rewrite of existing partitions.

    Scale shape: one narrow encode pass over the new batch + a clustered
    partitioned append (`repartition(partition key)` for the partitioned
    kinds, same file-explosion guard as the writers). The quantizer is
    NEVER refit on append — drift between the pinned quantizer and a
    shifting vector distribution degrades recall, not correctness, and is
    fixed by a full rewrite (the ANN analogue of index compaction).
    Parquet appends are NOT atomic for a concurrently listing reader —
    run maintenance off the serving path, or use ``stream_ann_append``
    whose per-epoch directories commit atomically per micro-batch.

    ``id_col``/``vec_col`` override the sidecar's recorded names when the
    incoming frame differs (sq8 layouts predating vec_col recording default
    to "embedding")."""
    meta = read_ann_meta(path)
    idc = id_col or meta.get("id_col", "vec_id")
    vc = vec_col or meta.get("vec_col", "embedding")
    try:
        out, part = _ann_encode(df, meta, idc, vc)
    except ValueError as e:
        raise ValueError(f"{e} at {path}") from None
    w = out.repartition(part).write.mode("append") if part else out.write.mode("append")
    (w.partitionBy(part) if part else w).parquet(path)


def stream_ann_append(
    spark,
    source_dir: str,
    path: str,
    checkpoint_dir: str,
    schema: str = "vec_id long, embedding array<float>",
    id_col: str | None = None,
    vec_col: str | None = None,
):
    """Maintain a stored ANN layout over a Structured Stream of new
    vectors: each micro-batch is encoded with the layout's pinned
    quantizer and lands in ``path/epoch=<id>/`` (OVERWRITE per epoch — a
    replayed batch after crash rewrites the same directory, so ingestion
    is exactly-once), partitioned by bucket/list_id inside the epoch for
    the partitioned kinds, so the stored readers' partition pruning holds
    per epoch. Readers (`*_stored_topk`) work UNCHANGED: parquet partition
    discovery layers epoch above the probe key.

    The layout must be stream-initialized — run the matching ``*_write``
    on an EMPTY slice first (``lsh_write(df.limit(0), path, …)``) so the
    sidecar exists and every data file lives under an epoch (a non-empty
    batch base would mix directory depths). Returns the StreamingQuery."""
    meta = read_ann_meta(path)
    idc = id_col or meta.get("id_col", "vec_id")
    vc = vec_col or meta.get("vec_col", "embedding")

    def fold(batch_df, epoch_id: int) -> None:
        out, part = _ann_encode(batch_df, meta, idc, vc)
        w = (
            out.repartition(part).write.mode("overwrite")
            if part
            else out.write.mode("overwrite")
        )
        (w.partitionBy(part) if part else w).parquet(f"{path}/epoch={epoch_id}")

    return (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
