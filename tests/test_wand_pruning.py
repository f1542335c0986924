"""Block-max pruning actually engages: on an idf-skewed corpus (rare
high-impact term + ubiquitous low-impact terms) the WAND kernel must decode
only a fraction of the blocks while returning results identical to the
exhaustive kernel. Runs the kernels in-process on the real segment parquet
(the executor-side monkeypatch wouldn't cross the Python-worker boundary)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.build import build_index
from searchengine_spark.query import wand as W


@pytest.fixture(scope="module")
def skewed_index(spark, tmp_path_factory):
    # 3000 docs of pure boilerplate; 20 docs (ids 0,5,...,95 — clustered in
    # the low-id region) additionally carry the rare term "needle" with a
    # high tf. idf(needle) ≈ ln(3000/20) >> idf(hay) ≈ ln(1 + tiny).
    rows = []
    for i in range(3000):
        words = ["hay"] * 3 + ["grass"] * 2 + [f"filler{i % 7}"]
        if i < 100 and i % 5 == 0:
            words += ["needle"] * 8
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path_factory.mktemp("widx") / "idx")
    build_index(
        spark, df, idx, id_col="doc_id", text_col="text",
        range_bits=1, n_buckets=2, fresh=True,
    )
    return idx


def _group_blocks(spark, idx, terms):
    from searchengine_spark.index.build import IndexMeta

    meta = IndexMeta.load(idx)
    dct = spark.read.parquet(f"{idx}/dictionary").filter(F.col("term").isin(terms))
    idf = {r["term"]: float(r["idf"]) for r in dct.collect()}
    seg = spark.read.parquet(f"{idx}/segments").filter(F.col("term").isin(sorted(idf)))
    pdfs = [g for _, g in seg.toPandas().groupby("doc_range")]
    return meta, idf, pdfs


def test_pruning_skips_most_blocks_and_stays_exact(spark, skewed_index):
    meta, idf, pdfs = _group_blocks(spark, skewed_index, ["needle", "hay", "grass"])
    assert idf["needle"] > 10 * idf["hay"]
    total_blocks = sum(len(p) for p in pdfs)
    assert total_blocks > 20  # enough dense blocks for pruning to matter

    decoded = [0]
    orig = W.decode_block

    def counting(*a):
        decoded[0] += 1
        return orig(*a)

    W.decode_block = counting
    try:
        wand_out = [
            W.score_group_wand(p, idf, meta.k1, meta.b, meta.avgdl, 10) for p in pdfs
        ]
    finally:
        W.decode_block = orig
    vect_out = [
        W.score_group_vectorized(p, idf, meta.k1, meta.b, meta.avgdl, 10) for p in pdfs
    ]
    for a, b in zip(wand_out, vect_out):
        assert a.equals(b)
    # top-10 is entirely needle docs (θ >> hay-only bounds) → the hay/grass
    # blocks outside the needle region must never be decoded
    assert decoded[0] < total_blocks * 0.5, (decoded[0], total_blocks)


def test_fallback_identity_on_small_groups(spark, skewed_index):
    """Below the crossover the kernel delegates to the exhaustive path —
    same results (the kernels' identity on big groups is covered above and
    by test_rank_identity)."""
    meta, idf, pdfs = _group_blocks(spark, skewed_index, ["needle"])
    for p in pdfs:
        a = W.score_group_wand(p, idf, meta.k1, meta.b, meta.avgdl, 5)
        b = W.score_group_vectorized(p, idf, meta.k1, meta.b, meta.avgdl, 5)
        assert a.equals(b)
        assert (a["score"].to_numpy() > 0).all()
        assert len(a) == 5


def test_u64max_doc_id_survives_sweep(spark, tmp_path):
    """doc_id = -1 (unsigned 2^64-1, reachable from xxhash64) sits exactly on
    the last interval boundary of the event sweep — the clamped mapping must
    keep it scoreable, identical to the exhaustive kernel.

    The TRAILING block (unsigned-largest ids, i.e. signed -1..-50) carries a
    boosted tf so its docs MUST make the top-k on score alone: the trailing
    block's end event used to wrap (last+1 == 0) and its first_doc equals the
    max event boundary, so the old sweep dropped the whole block — with a
    uniform corpus the tie-break masked that; the boost makes it observable."""
    rows = []
    for i in range(1500):
        text = "alpha beta common words here"
        if i < 50:  # signed ids -1..-50 == the unsigned-largest (trailing) docs
            text = " ".join(["alpha"] * 8) + " beta common words here"
        rows.append((-(i + 1), text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_index(spark, df, idx, id_col="doc_id", text_col="text",
                range_bits=1, n_buckets=2, fresh=True)
    meta, idf, pdfs = _group_blocks(spark, idx, ["alpha", "beta"])
    assert sum(int(p["n_docs"].sum()) for p in pdfs) > 1024  # sweep engages
    for p in pdfs:
        a = W.score_group_wand(p, idf, meta.k1, meta.b, meta.avgdl, 10)
        b = W.score_group_vectorized(p, idf, meta.k1, meta.b, meta.avgdl, 10)
        assert a.equals(b)
    # boosted docs strictly outscore the rest; ties among them break by
    # signed doc_id asc → expect the 10 most-negative of the boosted ids
    top = W.score_group_wand(pdfs[0], idf, meta.k1, meta.b, meta.avgdl, 10)
    boosted = sorted(-(i + 1) for i in range(50))
    assert list(top["doc_id"]) == boosted[:10]


def test_pruned_batch_kernel_matches_exhaustive_and_skips_blocks(
    spark, skewed_index
):
    """score_group_multi(prune=True): per-query sweep with a batch-shared
    decode cache — identical results to the exhaustive batch kernel, and on
    the skewed corpus the batch decodes <100% of the blocks its queries
    touch (θ cutoffs skip the hay-only regions)."""
    meta, idf, pdfs = _group_blocks(spark, skewed_index, ["needle", "hay", "grass"])
    idfs = {
        "q1": {"needle": idf["needle"], "hay": idf["hay"]},
        "q2": {"needle": idf["needle"], "grass": idf["grass"]},
        "q3": {"hay": idf["hay"], "grass": idf["grass"]},
    }
    decoded = [0]
    orig = W.decode_block

    def counting(*a):
        decoded[0] += 1
        return orig(*a)

    W.decode_block = counting
    try:
        pruned = [
            W.score_group_multi(p, idfs, meta.k1, meta.b, meta.avgdl, 10, prune=True)
            for p in pdfs
        ]
    finally:
        W.decode_block = orig
    n_decoded = decoded[0]
    exhaustive = [
        W.score_group_multi(p, idfs, meta.k1, meta.b, meta.avgdl, 10) for p in pdfs
    ]

    def norm(frames):
        out = pd.concat(frames, ignore_index=True)
        return out.sort_values(["query_id", "score", "doc_id"],
                               ascending=[True, False, True]).reset_index(drop=True)

    a, b_ = norm(pruned), norm(exhaustive)
    assert a.equals(b_), (a.head(), b_.head())
    # q1/q2 are needle-dominated → their hay/grass blocks outside the needle
    # region never decode; cache sharing means each block decodes ≤ once
    total_blocks = sum(len(p) for p in pdfs)
    assert n_decoded < total_blocks, (n_decoded, total_blocks)


def test_tie_safety_under_pruning(spark, tmp_path):
    """Exact score ties at the θ boundary are resolved by doc_id on both
    kernels — pruning must not drop a tying doc. All docs share identical
    text → identical scores → the top-k is the k smallest doc_ids."""
    rows = [(i, "alpha beta gamma") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_index(spark, df, idx, id_col="doc_id", text_col="text",
                range_bits=1, n_buckets=2, fresh=True)
    meta, idf, pdfs = _group_blocks(spark, idx, ["alpha", "beta"])
    for p in pdfs:
        a = W.score_group_wand(p, idf, meta.k1, meta.b, meta.avgdl, 7)
        b = W.score_group_vectorized(p, idf, meta.k1, meta.b, meta.avgdl, 7)
        assert a.equals(b)
        assert list(a["doc_id"]) == sorted(a["doc_id"])  # ties → id asc


def test_mask_reaches_the_sweep_kernel(spark, skewed_index):
    """Regression: `_or_sweep` had a local chunk array shadowing the new
    `mask` parameter inside the decode closure — tombstones/filters were
    silently ignored (and crashed on DocMask) EXACTLY when the group was big
    enough for the sweep to engage. Drive the sweep path (>1024 postings)
    with both mask halves and demand kernel identity + correct membership."""
    meta, idf, pdfs = _group_blocks(spark, skewed_index, ["needle", "hay", "grass"])
    assert sum(int(p["n_docs"].sum()) for p in pdfs) > 1024
    dead = np.array([0, 5, 10], dtype=np.int64).view(np.uint64)
    allow = np.sort(
        np.arange(0, 3000, 2, dtype=np.int64).view(np.uint64)
    )  # even ids only
    for mask in (
        W.DocMask(excluded=dead),
        W.DocMask(included=allow),
        W.DocMask(excluded=dead, included=allow),
    ):
        for p in pdfs:
            a = W.score_group_wand(p, idf, meta.k1, meta.b, meta.avgdl, 10,
                                   mask=mask)
            b = W.score_group_vectorized(p, idf, meta.k1, meta.b, meta.avgdl,
                                         10, mask=mask)
            assert a.equals(b)
            ids = set(a["doc_id"].tolist())
            if mask.excluded is not None:
                assert ids.isdisjoint({0, 5, 10})
            if mask.included is not None:
                assert all(d % 2 == 0 for d in ids)


def test_negative_rewriter_weight_takes_exact_path(spark, tmp_path):
    """A rewriter may fold a NEGATIVE weight into idf (demote a term);
    idf*max_u is then a LOWER bound, so block-max pruning could drop true
    top-k docs. Such queries must route to the exact kernel: results with
    use_wand=True must equal use_wand=False exactly."""
    from searchengine_spark.corpus import corpus_df
    from searchengine_spark.query.engine import SearchEngine

    df = corpus_df(spark, 300, seed=7)
    idx = str(tmp_path / "idx")
    eng = SearchEngine(spark, idx)
    eng.build_index_from_df(df, n_buckets=4, range_bits=2)
    demote = lambda q: [(t, -0.5 if t == "merge" else 1.0) for t, _ in q]
    wand = eng.search("index merge", k=10, rewriter=demote, use_wand=True)
    exact = eng.search("index merge", k=10, rewriter=demote, use_wand=False)
    assert wand == exact and wand


def test_and_kernel_survives_fully_masked_term(spark, tmp_path):
    """AND + deletes: when a non-rarest term's overlapping blocks decode
    empty under the tombstone mask, the kernel must return empty like the
    exhaustive path — it used to fancy-index a size-0 array (IndexError)."""
    from searchengine_spark.query.engine import SearchEngine

    docs = spark.createDataFrame(
        # 'needle' only in docs 1-2; 'common' everywhere
        [(1, "needle common"), (2, "needle common")]
        + [(i, "common filler text") for i in range(3, 40)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    eng = SearchEngine(spark, idx)
    eng.build_index_from_df(docs, id_col="doc_id", text_col="text",
                            n_buckets=2, range_bits=1)
    eng.delete_docs([1, 2])  # tombstone every 'needle' holder
    eng.refresh()
    assert eng.search("needle common", k=10, mode="and",
                      use_wand=True) == []
    assert eng.search("needle common", k=10, mode="and",
                      use_wand=False) == []
