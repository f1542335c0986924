"""Impact-ordered docIDs (corpus.impact_ids — static index sorting):

1. the reassignment itself is correct (dense packed ranks, descending and
   ascending keys, exact-negation tie discipline),
2. search results over an impact-ordered build are CONTENT-identical to the
   hash-id build (BM25 never sees the id),
3. the point of the feature: on a length-skewed corpus the WAND kernel
   decodes measurably fewer blocks when high-impact (short) docs cluster in
   the head blocks than when hash ids scatter them uniformly.

Kernels run in-process on the real segment parquet (same harness as
test_wand_pruning — an executor-side monkeypatch wouldn't cross the
Python-worker boundary)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.corpus import impact_ids
from searchengine_spark.index.build import IndexMeta, build_index
from searchengine_spark.query import wand as W

K = 10


@pytest.fixture(scope="module")
def skew_corpus(spark):
    # 60 short docs (len 4, tf(needle)=2) — the BM25 winners — plus 3000
    # long docs (len 54, tf(needle)=1). Under hash ids the winners scatter
    # across every posting block; under length-ascending impact ids they
    # occupy the first blocks and the tail prunes.
    rows = []
    for i in range(60):
        # i pad tokens → strictly increasing dl → strictly decreasing BM25
        # score: the top-k is score-UNIQUE, so content identity across the
        # two id layouts is well-defined (no tie-break-by-id ambiguity)
        pads = " ".join(f"p{j}" for j in range(i))
        rows.append((i, f"needle needle u{i} short {pads}".strip()))
    # enough postings per doc_range group (needle df ≈ 6000/group at
    # range_bits=2) to clear the kernel's exhaustive-fallback crossover
    # AND amortize the sweep's first-chunk floor (~4 blocks/group)
    for i in range(24000):
        words = ["needle"] + [f"w{(i + j) % 11}" for j in range(50)] + [
            f"u{i + 60}", "long", "pad"
        ]
        rows.append((i + 60, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _build(spark, df, path, **kw):
    build_index(spark, df, path, id_col="doc_id", text_col="text",
                range_bits=2, n_buckets=2, fresh=True, **kw)
    return path


def _decode_counted_topk(spark, idx, term, k=K):
    """Run the WAND kernel per doc_range group in-process, counting
    decode_block calls; return (top-k rows, decoded, total_blocks)."""
    meta = IndexMeta.load(idx)
    dct = spark.read.parquet(f"{idx}/dictionary").filter(F.col("term") == term)
    idf = {r["term"]: float(r["idf"]) for r in dct.collect()}
    seg = spark.read.parquet(f"{idx}/segments").filter(F.col("term") == term)
    pdfs = [g for _, g in seg.toPandas().groupby("doc_range")]
    total = sum(len(p) for p in pdfs)

    decoded = [0]
    orig = W.decode_block

    def counting(*a):
        decoded[0] += 1
        return orig(*a)

    W.decode_block = counting
    try:
        outs = [
            W.score_group_wand(p, idf, meta.k1, meta.b, meta.avgdl, k)
            for p in pdfs
        ]
    finally:
        W.decode_block = orig
    import pandas as pd

    allr = pd.concat(outs).sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(k)
    return allr, decoded[0], total


def test_impact_ids_assignment_and_order(spark):
    df = spark.createDataFrame(
        [(i, float(i % 5), f"d{i:03d}") for i in range(40)],
        "old long, score double, name string",
    )
    out = impact_ids(df, "score", tiebreak=("name",), range_bits=2).collect()
    # descending score, then name asc; STRIDED packing — range = rank % 4,
    # dense local id = rank // 4
    rows = sorted(out, key=lambda r: (-r["score"], r["name"]))
    expect = [
        ((i % 4) << 62) | (i // 4) for i in range(40)
    ]
    expect = [v - (1 << 64) if v >= (1 << 63) else v for v in expect]
    assert [r["doc_id"] for r in rows] == expect
    assert "_impact_key" not in out[0].asDict()


def test_impact_ids_exact_negation_no_double_collapse(spark):
    # two int64 impacts that collide when cast to double must NOT tie:
    # 2^53 and 2^53+1 → double(2^53) == double(2^53+1)
    big = 1 << 53
    df = spark.createDataFrame(
        [(1, big, "b"), (2, big + 1, "a")], "old long, imp long, name string"
    )
    out = {r["old"]: r["doc_id"] for r in
           impact_ids(df, "imp", tiebreak=("name",), range_bits=1).collect()}
    # descending impact: old=2 (bigger imp) must take rank 0 (packed id 0)
    # regardless of the name tiebreak a lossy double cast would have invoked
    assert out[2] == 0 and out[1] != 0


def test_results_identical_and_pruning_improves(spark, skew_corpus, tmp_path):
    hash_df = skew_corpus.withColumn(
        "doc_id", F.xxhash64(F.col("doc_id").cast("string"))
    )
    imp_df = impact_ids(
        skew_corpus.withColumn("dl", F.size(F.split("text", " ")))
        .withColumnRenamed("doc_id", "old"),
        "dl", tiebreak=("old",), descending=False, range_bits=2,
    ).drop("dl", "old")

    h_idx = _build(spark, hash_df, str(tmp_path / "hash"))
    i_idx = _build(spark, imp_df, str(tmp_path / "impact"))

    h_top, h_dec, h_total = _decode_counted_topk(spark, h_idx, "needle")
    i_top, i_dec, i_total = _decode_counted_topk(spark, i_idx, "needle")
    # same postings; block counts may differ by a little per-range
    # fragmentation (range boundaries cut the posting stream differently)
    assert abs(h_total - i_total) <= 4, (h_total, i_total)

    # content identity: ids differ between builds, so map each top-k back
    # to text through its own corpus and compare (score, text) sets
    h_m = {r["doc_id"]: r["text"] for r in
           hash_df.filter(F.col("doc_id").isin([int(d) for d in h_top["doc_id"]])).collect()}
    i_m = {r["doc_id"]: r["text"] for r in
           imp_df.filter(F.col("doc_id").isin([int(d) for d in i_top["doc_id"]])).collect()}
    h_set = sorted((round(s, 9), h_m[int(d)]) for d, s in
                   zip(h_top["doc_id"], h_top["score"]))
    i_set = sorted((round(s, 9), i_m[int(d)]) for d, s in
                   zip(i_top["doc_id"], i_top["score"]))
    assert h_set == i_set
    # every winner is a short doc
    assert all(" short" in t for _, t in i_set)

    # the measurement: impact ordering must decode a far smaller fraction
    # of its blocks than the hash layout — both relatively and absolutely
    assert i_dec / i_total < 0.5 * (h_dec / h_total), (
        i_dec, i_total, h_dec, h_total,
    )
    assert i_dec / i_total < 0.2, (i_dec, i_total)
