#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (north rule: ≥0.8 throughput scaling
efficiency from N to 4N executors).

No real cluster exists in this sandbox, so per driver instructions the same
index-build + query job runs at two parallelism levels — local[8] and
local[32] — on the same input; we report throughput at both plus
efficiency = throughput_4N / (4 · throughput_N).

The input is the sf documents table replicated REPLICATE× with remapped
doc_ids (pure Spark, deterministic) so the job is compute-bound rather than
overhead-bound — the regime that actually predicts multi-executor scaling.

Writes BENCH_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from searchengine_spark.query.engine import SearchEngine  # noqa: E402
from searchengine_spark.session import get_spark  # noqa: E402

REPLICATE = int(os.environ.get("SCALING_REPLICATE", "24"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["spark join stream", "hash merge sort table", "window group order",
           "customer order line", "fast scan filter"]


def run_level(cores: int) -> dict:
    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(REPLICATE).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(10_000_000))
        .drop("rep")
        .repartition(cores)
        .cache()
    )
    n = big.count()

    idx_dir = tempfile.mkdtemp(prefix=f"scale_idx_{cores}_")
    eng = SearchEngine(spark, os.path.join(idx_dir, "idx"))
    t0 = time.perf_counter()
    eng.build_index_from_df(big, id_col="doc_id", text_col="text",
                            range_bits=5, n_buckets=32, fresh=True)
    build_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    results = [eng.search(q, k=100) for q in QUERIES]
    query_sec = time.perf_counter() - t0
    top1 = [(r[0][0], round(r[0][1], 9)) if r else None for r in results]

    shutil.rmtree(idx_dir, ignore_errors=True)
    big.unpersist()
    spark.stop()
    return {
        "cores": cores,
        "n_docs": n,
        "build_sec": round(build_sec, 2),
        "build_docs_per_sec": round(n / build_sec, 1),
        "query_sec": round(query_sec, 2),
        "queries_per_sec": round(len(QUERIES) / query_sec, 2),
        "top1": top1,
    }


def main() -> None:
    lo = run_level(8)
    hi = run_level(32)
    assert lo["top1"] == hi["top1"], (
        f"results differ across parallelism levels: {lo['top1']} vs {hi['top1']}"
    )
    eff_build = hi["build_docs_per_sec"] / (4 * lo["build_docs_per_sec"])
    eff_query = hi["queries_per_sec"] / (4 * lo["queries_per_sec"])
    out = {
        "metric": "scaling efficiency N→4N (local[8] → local[32], same input)",
        "n_level": lo,
        "four_n_level": hi,
        "build_scaling_efficiency": round(eff_build, 3),
        "query_scaling_efficiency": round(eff_query, 3),
        "results_identical_across_levels": True,
    }
    with open("BENCH_SCALING.md", "w") as f:
        f.write("# Scaling evidence: local[8] vs local[32], same input\n\n")
        f.write("Per driver instructions, the two-cluster-size criterion is evidenced by\n")
        f.write("running the same index-build + query job at two parallelism levels.\n\n")
        f.write("| level | cores | docs | build sec | build docs/s | query sec | q/s |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for r in (lo, hi):
            f.write(
                f"| local[{r['cores']}] | {r['cores']} | {r['n_docs']} | {r['build_sec']} "
                f"| {r['build_docs_per_sec']} | {r['query_sec']} | {r['queries_per_sec']} |\n"
            )
        f.write(
            f"\n- build scaling efficiency (throughput₄ₙ / 4·throughputₙ): **{eff_build:.3f}**\n"
        )
        f.write(f"- query scaling efficiency: **{eff_query:.3f}**\n")
        f.write("- top-1 (doc_id, score) identical at both levels for all benchmark queries: ✅\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
