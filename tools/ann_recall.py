#!/usr/bin/env python3
"""ANN recall evidence at scale (VERDICT r3 #7): 1M+ synthetic vectors,
recall@k of LSH / IVF / PQ against the exact ``cosine_topk`` baseline at
swept probe counts.

Vectors are deterministic and CLUSTERED (64 latent centers + hash noise) so
the approximate indexes face realistic geometry — uniform random vectors
would make every bucketing look artificially bad (nearest neighbors at
uniform-random distance carry no cluster signal to exploit) and hide real
recall cliffs near decision boundaries. Everything derives from xxhash64
column expressions: no driver-side generation, no RNG state, rerun-stable.

Usage: python tools/ann_recall.py [n_vectors] (default 1_000_000)
Appends a results section to BENCH_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from searchengine_spark.session import get_spark

DIM = 64
N_CLUSTERS = 64
K = 10
N_QUERIES = 10


def synth_vectors(spark, n: int):
    """(vec_id, embedding): hash-derived clustered vectors, fully JVM-side.
    center[c][i] ∈ [-1, 1); point = center + 0.5 · noise[id][i]."""
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    c = F.pmod(F.xxhash64("vec_id"), F.lit(N_CLUSTERS))

    def h01(*cols):  # hash → [-1, 1)
        return (F.pmod(F.xxhash64(*cols), F.lit(10000)) / 5000.0) - 1.0

    comps = [
        (h01(c, F.lit(i)) + 0.5 * h01(F.col("vec_id"), F.lit(1000 + i))).alias(f"_{i}")
        for i in range(DIM)
    ]
    return base.select(
        "vec_id", F.array(*comps).cast("array<double>").alias("embedding")
    )


def main() -> None:
    from searchengine_spark.ops.similarity import (
        _pq_adc,
        _pq_lut,
        _probe_buckets,
        _query_lists,
        cosine_topk,
        ivf_assign,
        ivf_train,
        lsh_assign,
        pq_encode,
        pq_train,
        query_bucket,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("ann-recall", shuffle_partitions=32)
    vecs = synth_vectors(spark, n).repartition(32).persist()
    vecs.count()

    qids = [int(i * (n // N_QUERIES) + 17) for i in range(N_QUERIES)]
    qrows = {
        int(r["vec_id"]): [float(v) for v in r["embedding"]]
        for r in vecs.filter(F.col("vec_id").isin(qids)).collect()
    }
    queries = [qrows[q] for q in sorted(qrows)]

    # Assignments and codes are QUERY-INDEPENDENT — computed once and
    # cached, exactly like the stored layouts (`lsh_write`/`ivf_write`/
    # `pq_write`) whose read path this sweep models; per-query cost is the
    # probe filter + candidate scan, not a re-assignment of the corpus.
    t0 = time.time()
    centroids = ivf_train(vecs, n_lists=64, sample=4096)
    books8 = pq_train(vecs, m=8, ks=16, dim=DIM, sample=4096)
    lsh_a = lsh_assign(vecs, 8, DIM).select("vec_id", "bucket").persist()
    ivf_a = (
        ivf_assign(vecs, 64, DIM, centroids=centroids)
        .select("vec_id", "list_id")
        .persist()
    )
    codes16 = pq_encode(vecs, m=8, ks=16, dim=DIM, codebooks=books8).persist()
    for df in (lsh_a, ivf_a, codes16):
        df.count()
    train_sec = time.time() - t0

    def ids_of(df):
        return [int(r[0]) for r in df.collect()]

    def lsh_probe(qv, hamming):
        probes = _probe_buckets(query_bucket(qv, 8), 8, hamming)
        cand = vecs.join(
            lsh_a.filter(F.col("bucket").isin(probes)).select("vec_id"),
            "vec_id",
            "left_semi",
        )
        return cosine_topk(cand, qv, k=K)

    def ivf_probe(qv, nprobe):
        probes = _query_lists(qv, 64, nprobe, centroids)
        cand = vecs.join(
            ivf_a.filter(F.col("list_id").isin(probes)).select("vec_id"),
            "vec_id",
            "left_semi",
        )
        return cosine_topk(cand, qv, k=K)

    def pq_adc(qv, codes, books, rerank=None):
        lut = _pq_lut(books, qv)
        coarse = _pq_adc(codes, lut, K if rerank is None else rerank)
        if rerank is None:
            return coarse
        cand = vecs.join(
            F.broadcast(coarse.select("vec_id")), "vec_id", "left_semi"
        )
        return cosine_topk(cand, qv, k=K)

    exact: list[set[int]] = []
    t0 = time.time()
    for qv in queries:
        exact.append(set(ids_of(cosine_topk(vecs, qv, k=K))))
    exact_sec = (time.time() - t0) / len(queries)

    sweeps = []
    for name, fn in [
        ("lsh h=0", lambda qv: lsh_probe(qv, 0)),
        ("lsh h=1", lambda qv: lsh_probe(qv, 1)),
        ("lsh h=2", lambda qv: lsh_probe(qv, 2)),
        ("ivf p=1", lambda qv: ivf_probe(qv, 1)),
        ("ivf p=2", lambda qv: ivf_probe(qv, 2)),
        ("ivf p=4", lambda qv: ivf_probe(qv, 4)),
        ("ivf p=8", lambda qv: ivf_probe(qv, 8)),
        ("pq raw ks=16", lambda qv: pq_adc(qv, codes16, books8)),
        ("pq+rerank200 ks=16", lambda qv: pq_adc(qv, codes16, books8, rerank=200)),
        ("pq+rerank2000 ks=16", lambda qv: pq_adc(qv, codes16, books8, rerank=2000)),
    ]:
        hits, t0 = 0, time.time()
        for qv, truth in zip(queries, exact):
            hits += len(set(ids_of(fn(qv))) & truth)
        sweeps.append(
            {
                "config": name,
                "recall_at_10": round(hits / (K * len(queries)), 3),
                "sec_per_query": round((time.time() - t0) / len(queries), 2),
            }
        )
        print(json.dumps(sweeps[-1]), flush=True)

    out = {
        "n_vectors": n,
        "dim": DIM,
        "k": K,
        "n_queries": len(queries),
        "exact_sec_per_query": round(exact_sec, 2),
        "train_sec": round(train_sec, 1),
        "sweeps": sweeps,
    }
    print(json.dumps(out))

    lines = [
        "",
        f"## ANN recall at {n:,} vectors",
        "",
        f"{n:,} deterministic clustered vectors (dim {DIM}, 64 latent centers,",
        f"hash-derived — see tools/ann_recall.py), {len(queries)} queries, "
        f"recall@{K} vs exact",
        f"`cosine_topk` (exact scan: {exact_sec:.2f} s/query at local[32]).",
        "",
        "| config | recall@10 | sec/query |",
        "|---|---|---|",
    ]
    for s in sweeps:
        lines.append(
            f"| {s['config']} | {s['recall_at_10']} | {s['sec_per_query']} |"
        )
    with open("/root/repo/BENCH_SCALING.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
