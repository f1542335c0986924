#!/usr/bin/env python3
"""Solo per-component timing for the bench rows the round-4 driver bench
flagged under concurrent load (`VERDICT.md` What's-wrong #1): build the
same sf0.1 index bench.py builds, then time ONLY the requested components,
best-of-``--reps``, in an otherwise idle process. Prints one JSON line:

    {"solo": {"query_and": [r1, r2, ...], ...}, "best": {...}, "sf": 0.1}

Usage: python tools/bench_solo.py [--reps 3] [comp ...]
Components: query_vectorized query_and query_not index_build_positional
(default: all four flagged rows).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGGED = ["query_vectorized", "query_and", "query_not", "index_build_positional"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("components", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    comps = args.components or FLAGGED

    from bench import BENCH_QUERIES

    from searchengine_spark.query.engine import SearchEngine
    from searchengine_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-solo", master=f"local[{cpus}]", shuffle_partitions=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus).cache()
    docs.count()

    idx_dir = tempfile.mkdtemp(prefix="bench_solo_")
    eng = SearchEngine(spark, os.path.join(idx_dir, "idx"))
    # same warmup shape as bench.py so JIT/worker-pool state matches
    warm = docs.limit(500).cache()
    warm.count()
    weng = SearchEngine(spark, os.path.join(idx_dir, "warm"))
    weng.build_index_from_df(
        warm, id_col="doc_id", text_col="text", range_bits=2, n_buckets=4, fresh=True
    )
    weng.search(BENCH_QUERIES[0], k=10)
    warm.unpersist()
    eng.build_index_from_df(
        docs, id_col="doc_id", text_col="text", range_bits=4, n_buckets=16, fresh=True
    )

    peng = SearchEngine(spark, os.path.join(idx_dir, "pidx"))

    def query_vectorized():
        for q in BENCH_QUERIES:
            eng.search(q, k=100, use_wand=False)

    def query_and():
        for q in BENCH_QUERIES[:6]:
            eng.search(q, k=100, mode="and")

    def query_not():
        for q in BENCH_QUERIES[:6]:
            eng.search(q, k=100, exclude="hash window")

    def index_build_positional():
        peng.build_index_from_df(
            docs, id_col="doc_id", text_col="text", range_bits=4, n_buckets=16,
            with_positions=True, fresh=True,
        )

    fns = {f.__name__: f for f in
           (query_vectorized, query_and, query_not, index_build_positional)}
    runs: dict[str, list[float]] = {}
    for name in comps:
        fn = fns[name]
        out = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            out.append(round(time.perf_counter() - t0, 3))
        runs[name] = out
    import shutil

    shutil.rmtree(idx_dir, ignore_errors=True)
    print(json.dumps({
        "solo": runs,
        "best": {k: min(v) for k, v in runs.items()},
        "sf": sf_dir,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
