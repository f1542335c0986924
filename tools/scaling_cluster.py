#!/usr/bin/env python3
"""Multi-PROCESS scaling evidence (VERDICT r4 ask #2): the same build+query
job as scaling.py, but under ``local-cluster[W,C,M]`` — W separate executor
JVMs with separate heaps, allocators, GCs, and Python worker pools — so the
N→4N query pair is measured across process boundaries instead of threads
inside one JVM. This isolates JVM-internal contention (allocator, GC, lock)
from the VM's shared DRAM bandwidth: executors on ONE box still share the
physical memory bus, so a pair that stays below the thread-mode number
implicates the hardware roofline, while a pair that recovers toward 1.0
implicates the single-JVM runtime.

Levels: local-cluster[1,2,M] → local-cluster[4,2,M] (2→8 cores via 1→4
executor processes, each executor identical — exactly how a real cluster
grows). Interleaved trials, per-metric best, rank-identity asserted across
levels. Appends a round-5 section to BENCH_SCALING.md (below the keep
marker, so scaling.py reruns preserve it) and prints one JSON line.

Env: SCALING_FILES (default 250000), SCALING_TRIALS (default 3),
SCALING_CORPUS_DIR (reuse a pre-generated corpus), SCALING_WORKER_MB
(default 8192).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from searchengine_spark.query.engine import SearchEngine  # noqa: E402

N_FILES = int(os.environ.get("SCALING_FILES", "250000"))
TRIALS = int(os.environ.get("SCALING_TRIALS", "3"))
WORKER_MB = int(os.environ.get("SCALING_WORKER_MB", "8192"))
CORPUS_DIR = os.environ.get("SCALING_CORPUS_DIR", "")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# (workers, cores_per_worker): 1×2 → 4×2 is the north rule's N→4N with
# every executor identical
LEVELS = [(1, 2), (4, 2)]
QUERIES = ["index merge query", "token parse rank", "buffer stream batch",
           "shard node graph", "cache heap block"]


def cluster_session(workers: int, cores: int) -> SparkSession:
    total = workers * cores
    return (
        SparkSession.builder.appName(f"scaling-lc-{workers}x{cores}")
        .master(f"local-cluster[{workers},{cores},{WORKER_MB}]")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        # the M in the master string is the WORKER's memory budget; the
        # executor itself defaults to 1g unless told to claim it
        .config("spark.executor.memory", f"{max(WORKER_MB - 1024, 1024)}m")
        # shared-VM stall tolerance: episodic CPU steal must not look like
        # a dead worker/executor to the master's liveness checks
        .config("spark.network.timeout", "300s")
        .config("spark.executor.heartbeatInterval", "30s")
        .config("spark.worker.timeout", "300")
        .config("spark.sql.shuffle.partitions", str(total))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def prepare_corpus() -> str:
    from searchengine_spark.corpus import corpus_df_dist
    from searchengine_spark.session import get_spark

    out = tempfile.mkdtemp(prefix="scale_lc_corpus_") + "/corpus"
    spark = get_spark("scaling-lc-prep", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    corpus_df_dist(spark, N_FILES, partitions=64).write.mode("overwrite").parquet(out)
    spark.stop()
    return out


def run_level(workers: int, cores: int, corpus_dir: str) -> dict:
    total = workers * cores
    spark = cluster_session(workers, cores)
    spark.sparkContext.setLogLevel("ERROR")
    big = spark.read.parquet(corpus_dir).repartition(max(total, 16)).cache()
    n = big.count()

    idx_dir = tempfile.mkdtemp(prefix=f"scale_lc_idx_{workers}x{cores}_")
    eng = SearchEngine(spark, os.path.join(idx_dir, "idx"))
    t0 = time.perf_counter()
    eng.build_index_from_df(big, id_col="doc_id", text_col="content",
                            range_bits=5, n_buckets=32, fresh=True)
    build_sec = time.perf_counter() - t0

    eng.search(QUERIES[0], k=100)  # warm the query path
    batch = {f"q{i:03d}": q for i, q in enumerate(QUERIES * 40)}
    t0 = time.perf_counter()
    out = eng.search_batch(batch, k=100)
    qtp_sec = time.perf_counter() - t0
    top1 = [
        (out[f"q{i:03d}"][0][0], round(out[f"q{i:03d}"][0][1], 9))
        if out[f"q{i:03d}"]
        else None
        for i in range(len(QUERIES))
    ]

    shutil.rmtree(idx_dir, ignore_errors=True)
    big.unpersist()
    spark.stop()
    return {
        "workers": workers,
        "cores_per_worker": cores,
        "total_cores": total,
        "n_docs": n,
        "build_sec": round(build_sec, 2),
        "build_docs_per_sec": round(n / build_sec, 1),
        "query_batch_sec": round(qtp_sec, 2),
        "queries_per_sec": round(len(batch) / qtp_sec, 2),
        "top1": top1,
    }


def main() -> None:
    generated = not CORPUS_DIR
    corpus_dir = CORPUS_DIR or prepare_corpus()
    try:
        trials: dict[tuple[int, int], list[dict]] = {lv: [] for lv in LEVELS}
        for t in range(TRIALS):
            for lv in LEVELS:
                r = run_level(*lv, corpus_dir)
                trials[lv].append(r)
                print(json.dumps({"trial": t, **{k: v for k, v in r.items() if k != "top1"}}),
                      file=sys.stderr, flush=True)
    finally:
        if generated:
            shutil.rmtree(os.path.dirname(corpus_dir), ignore_errors=True)

    tops = {json.dumps(r["top1"]) for rs in trials.values() for r in rs}
    assert len(tops) == 1, f"results differ across cluster sizes: {tops}"

    best = {}
    for lv, rs in trials.items():
        bb = max(rs, key=lambda r: r["build_docs_per_sec"])
        bq = max(rs, key=lambda r: r["queries_per_sec"])
        best[lv] = {**bb,
                    "query_batch_sec": bq["query_batch_sec"],
                    "queries_per_sec": bq["queries_per_sec"]}

    lo, hi = best[LEVELS[0]], best[LEVELS[1]]
    ratio = hi["total_cores"] / lo["total_cores"]
    pair = {
        "pair": (f"local-cluster[{LEVELS[0][0]},{LEVELS[0][1]},{WORKER_MB}] -> "
                 f"local-cluster[{LEVELS[1][0]},{LEVELS[1][1]},{WORKER_MB}]"),
        "build_scaling_efficiency": round(
            hi["build_docs_per_sec"] / (ratio * lo["build_docs_per_sec"]), 3),
        "query_scaling_efficiency": round(
            hi["queries_per_sec"] / (ratio * lo["queries_per_sec"]), 3),
    }
    out = {
        "metric": "multi-process (local-cluster) scaling efficiency N→4N",
        "levels": [
            {k: v for k, v in best[lv].items() if k != "top1"} for lv in LEVELS
        ],
        "pair": pair,
        "results_identical_across_levels": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
