#!/usr/bin/env python3
"""Stored-layout ANN recall + probe latency (VERDICT r4 ask #4): the same
clustered-vector recall protocol as tools/ann_recall.py, but probing through
the PERSISTED ``lsh_write``/``ivf_write`` layouts — the partition-pruned
read path the 100 TB story relies on — instead of the cached in-memory
assignment frame. The latency column here is the one that must stay roughly
flat as the corpus grows at fixed nprobe: the probe reads |probes|/n_lists
of the stored bytes (PartitionFilters, plan-tested in test_ann_stored.py),
so its cost tracks LIST size, not CORPUS size, until list sizes themselves
grow linearly (balanced lists ⇒ per-probe bytes = n/n_lists · nprobe).

Run at two sizes for the trend, e.g.:
    python tools/ann_recall_stored.py 1000000
    python tools/ann_recall_stored.py 4000000
Appends a section to BENCH_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from searchengine_spark.session import get_spark

sys.path.insert(0, "/root/repo/tools")
from ann_recall import DIM, K, N_QUERIES, synth_vectors  # noqa: E402


def main() -> None:
    from searchengine_spark.ops.similarity import (
        cosine_topk,
        ivf_stored_topk,
        ivf_train,
        ivf_write,
        lsh_stored_topk,
        lsh_write,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    # fixed n_lists means list SIZE (and probe bytes) grows with the
    # corpus; the 100 TB deployment scales n_lists with n to hold list
    # size — pass it explicitly to measure that regime
    n_lists = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("ann-recall-stored", shuffle_partitions=32)
    vecs = synth_vectors(spark, n).repartition(32).persist()
    vecs.count()

    qids = [int(i * (n // N_QUERIES) + 17) for i in range(N_QUERIES)]
    qrows = {
        int(r["vec_id"]): [float(v) for v in r["embedding"]]
        for r in vecs.filter(F.col("vec_id").isin(qids)).collect()
    }
    queries = [qrows[q] for q in sorted(qrows)]

    base = tempfile.mkdtemp(prefix="ann_stored_")
    t0 = time.time()
    centroids = ivf_train(vecs, n_lists=n_lists, sample=8192)
    ivf_write(vecs, f"{base}/ivf", n_lists=n_lists, dim=DIM,
              centroids=centroids)
    lsh_write(vecs, f"{base}/lsh", n_planes=8, dim=DIM)
    write_sec = time.time() - t0
    vecs.unpersist()  # the stored read path must not benefit from the cache

    exact: list[set[int]] = []
    exact_src = spark.read.parquet(f"{base}/ivf")  # full scan, no pruning
    t0 = time.time()
    for qv in queries:
        exact.append(
            {int(r[0]) for r in cosine_topk(exact_src, qv, k=K).collect()}
        )
    exact_sec = (time.time() - t0) / len(queries)

    sweeps = []
    for name, fn in [
        ("ivf stored p=1", lambda qv: ivf_stored_topk(spark, f"{base}/ivf", qv, k=K, nprobe=1)),
        ("ivf stored p=2", lambda qv: ivf_stored_topk(spark, f"{base}/ivf", qv, k=K, nprobe=2)),
        ("ivf stored p=4", lambda qv: ivf_stored_topk(spark, f"{base}/ivf", qv, k=K, nprobe=4)),
        ("ivf stored p=8", lambda qv: ivf_stored_topk(spark, f"{base}/ivf", qv, k=K, nprobe=8)),
        ("lsh stored h=1", lambda qv: lsh_stored_topk(spark, f"{base}/lsh", qv, k=K, hamming=1)),
        ("lsh stored h=2", lambda qv: lsh_stored_topk(spark, f"{base}/lsh", qv, k=K, hamming=2)),
    ]:
        hits, t0 = 0, time.time()
        for qv, truth in zip(queries, exact):
            got = {int(r[0]) for r in fn(qv).collect()}
            hits += len(got & truth)
        sweeps.append(
            {
                "config": name,
                "recall_at_10": round(hits / (K * len(queries)), 3),
                "sec_per_query": round((time.time() - t0) / len(queries), 2),
            }
        )
        print(json.dumps(sweeps[-1]), flush=True)

    shutil.rmtree(base, ignore_errors=True)
    out = {
        "n_vectors": n,
        "n_lists": n_lists,
        "dim": DIM,
        "k": K,
        "n_queries": len(queries),
        "exact_sec_per_query": round(exact_sec, 2),
        "write_sec": round(write_sec, 1),
        "sweeps": sweeps,
    }
    print(json.dumps(out))

    lines = [
        "",
        f"## Stored-layout ANN probes at {n:,} vectors, {n_lists} IVF lists (round 5)",
        "",
        f"Same geometry as the §ANN sections above, but probed through the",
        f"PERSISTED `ivf_write`/`lsh_write` layouts (partition-pruned scan,",
        f"no cached assignment frame). Layout write: {write_sec:.1f} s;",
        f"exact full-scan baseline {exact_sec:.2f} s/query.",
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
