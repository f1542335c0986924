"""Physical-plan quality gates: the properties that make the engine hold at
100 TB must be visible in `.explain`, not just assumed (SURVEY.md §4).

 * column pruning reaches the parquet scan (ReadSchema only carries the
   columns the query needs — a scan reading all columns for a 2-column
   projection is wrong);
 * predicate pushdown reaches the scan (PushedFilters non-empty);
 * the query side of BM25 scoring is a broadcast join, never a shuffle of
   the postings against a shuffled dictionary;
 * top-k plans TakeOrderedAndProject (bounded heap + merge), not a global
   Sort;
 * the minhash signature stage contains no Exchange before the band-bucket
   aggregation (map-side signatures).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_column_pruning_reaches_scan(docs):
    plan = plan_of(docs.select("doc_id"))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "text" not in scan[0], scan


def test_predicate_pushdown_reaches_scan(docs):
    plan = plan_of(docs.filter(F.col("doc_id") < 10).select("doc_id"))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "LessThan(doc_id,10)" in pushed[0], pushed


def test_bm25_query_join_is_broadcast(spark, docs):
    from searchengine_spark.postings import dictionary, doc_stats, term_frequencies
    from searchengine_spark.scoring import bm25_score

    tf = term_frequencies(docs, "doc_id", "text", use_arrow_udf=False)
    plan = plan_of(
        bm25_score(spark, tf, doc_stats(tf), dictionary(tf), "spark join", 100, 50.0)
    )
    assert "BroadcastHashJoin" in plan
    # postings join against the broadcast query side, not a SortMergeJoin
    assert plan.count("SortMergeJoin") <= 1  # only the doc_len join may merge


def test_topk_plans_bounded_heap(spark, docs):
    from searchengine_spark.postings import dictionary, doc_stats, term_frequencies
    from searchengine_spark.scoring import bm25_score, topk

    tf = term_frequencies(docs, "doc_id", "text", use_arrow_udf=False)
    plan = plan_of(
        topk(bm25_score(spark, tf, doc_stats(tf), dictionary(tf), "spark join", 100, 50.0), 10)
    )
    # bounded heap + merge, not a global Sort+Limit of all scored docs
    assert "TakeOrderedAndProject" in plan


def test_minhash_signatures_are_map_side(docs):
    from searchengine_spark.ops.dedup import minhash_signatures

    plan = plan_of(minhash_signatures(docs))
    assert "Exchange" not in plan, "signatures must not shuffle"
    assert "HashAggregate" not in plan


def test_composed_neardup_paths_have_no_cross_join(spark, docs, sf_dir):
    """The candidate-composed pipelines must never plan a CartesianProduct /
    BroadcastNestedLoopJoin — the quadratic kernels are gated behind explicit
    candidate dfs (VERDICT r1 #8)."""
    from searchengine_spark.ops import dedup, similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lsh_plan = plan_of(similarity.cosine_neardup_lsh(embs, tau=0.3, n_planes=8, dim=64))
    assert "CartesianProduct" not in lsh_plan
    assert "BroadcastNestedLoopJoin" not in lsh_plan

    cand = dedup.minhash_band_pairs(docs)
    verify_plan = plan_of(dedup.ngram_jaccard_pairs(docs, w=3, tau=0.2, candidates=cand))
    assert "CartesianProduct" not in verify_plan
    assert "BroadcastNestedLoopJoin" not in verify_plan


def test_tokenizer_expr_stays_in_codegen(docs):
    from searchengine_spark.tokenizer import tokenize_raw_expr

    plan = plan_of(docs.select(tokenize_raw_expr(F.col("text")).alias("t")))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lm_dirichlet_query_join_is_broadcast(spark, docs):
    from searchengine_spark.postings import dictionary, doc_stats, term_frequencies
    from searchengine_spark.scoring import lm_dirichlet_score

    tf = term_frequencies(docs, "doc_id", "text", use_arrow_udf=False)
    plan = plan_of(
        lm_dirichlet_score(spark, tf, doc_stats(tf), dictionary(tf), "spark join", 5000)
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 1


def test_collapse_plans_bounded_heap_after_window(spark, docs):
    """Collapse = one window shuffle on the low-cardinality key, then
    TakeOrderedAndProject for the global k — never a full Sort."""
    from searchengine_spark.postings import dictionary, doc_stats, term_frequencies
    from searchengine_spark.scoring import bm25_score, collapse_topk

    tf = term_frequencies(docs, "doc_id", "text", use_arrow_udf=False)
    scored = bm25_score(spark, tf, doc_stats(tf), dictionary(tf), "spark join", 100, 50.0)
    plan = plan_of(collapse_topk(scored, docs, "source", k=5))
    assert "TakeOrderedAndProject" in plan
    assert "Window" in plan


def test_sq_quantize_stays_jvm_side(spark, docs, sf_dir):
    """The SQ8 codec is pure Catalyst expressions — no Python/Arrow eval in
    the plan (UDFs would put int8 quantization of a 100 TB table on the
    slow path)."""
    from searchengine_spark.ops import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = plan_of(similarity.sq_quantize(embs))
    assert "Python" not in plan and "Arrow" not in plan.replace("ArrowEvalPython", "Python")


def test_decontamination_broadcasts_bench_side(spark, docs):
    from searchengine_spark.ops.dedup import contaminated_pairs

    bench = docs.filter(F.expr("doc_id % 31 = 0"))
    plan = plan_of(contaminated_pairs(docs, bench, w=5))
    # the benchmark shingle set broadcasts; the corpus side must not
    # shuffle its shingles into a SortMergeJoin
    assert "BroadcastHashJoin" in plan
    # the overlap count is the only required wide agg; the shingle join
    # itself contributes no Exchange on the corpus side
    pre_join = plan.split("BroadcastHashJoin")[0]
    assert "Exchange" not in pre_join, pre_join


def test_geo_box_predicate_pushes_down(spark, tmp_path):
    from searchengine_spark.ops.geo import geo_distance_search

    src = str(tmp_path / "geo.parquet")
    rows = [
        (i, (i * 7919 % 18000) / 100.0 - 90.0, (i * 104729 % 36000) / 100.0 - 180.0)
        for i in range(500)
    ]
    spark.createDataFrame(rows, "doc_id long, lat double, lon double").write.parquet(src)
    geo = spark.read.parquet(src)
    plan = plan_of(geo_distance_search(geo, 10.0, 20.0, 500.0))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    # the sargable bounding box reaches the parquet scan — this is the
    # line that lets a geo-cell layout prune files at 100 TB
    assert pushed and "GreaterThanOrEqual(lat," in pushed[0], pushed
    assert "LessThanOrEqual(lon," in pushed[0]


def test_sample_is_single_stateless_filter(spark, docs):
    from searchengine_spark.ops.sampling import sample_rate, sample_stratified

    for df in (
        sample_rate(docs, 0.2),
        sample_stratified(docs, {"en": 0.5}, by="lang"),
    ):
        plan = plan_of(df)
        assert "Exchange" not in plan, plan  # zero shuffle: one map pass
        assert "md5" in plan


def test_rrf_truncation_is_take_ordered(spark, docs):
    from searchengine_spark.fusion import rrf_fuse

    a = docs.select("doc_id", F.col("n_chars").cast("double").alias("score"))
    b = docs.select("doc_id", (F.col("doc_id") % 97).cast("double").alias("score"))
    plan = plan_of(rrf_fuse([a, b], k=10, window=50))
    # each input truncates via TakeOrderedAndProject (distributed heads),
    # never a global Sort of the full ranking before the window cut
    assert plan.count("TakeOrderedAndProject") >= 2, plan


def test_line_dedup_is_one_partial_agg_shuffle(docs):
    from searchengine_spark.ops import dedup

    plan = plan_of(dedup.line_dedup(dedup.chunk_lines(docs, 12)))
    # one hash agg keyed on the digest with a map-side partial before the
    # exchange — no window, no join, no second shuffle
    # formatted explain prints each node twice (tree + detail): count the
    # detail headers, one per physical Exchange
    assert plan.count(") Exchange") == 1, plan
    assert "Window" not in plan and "Join" not in plan
    # partial aggregate (SortAggregate: min(struct) is not hash-aggregable)
    # folds map-side BEFORE the exchange: in the printed tree (top-down),
    # an Aggregate node must appear BELOW the Exchange
    tree = plan.split("\n(")[0]
    assert tree.find("Aggregate", tree.index("Exchange")) >= 0, tree


def test_pack_docs_window_is_partitioned(docs):
    from searchengine_spark.ops import packing

    plan = plan_of(packing.pack_docs(docs, 2048, n_groups=1024))
    # the cumsum window MUST be partitioned by group_id: a partitionless
    # window funnels the corpus through one task (the classic scale bug)
    assert "Window" in plan
    assert "SinglePartition" not in plan, plan


def test_locality_ids_has_no_partitionless_window(docs):
    from searchengine_spark.corpus import locality_ids

    renamed = docs.withColumnRenamed("doc_id", "old_id")
    plan = plan_of(locality_ids(renamed, order_cols=("lang", "old_id"),
                                range_bits=4, n_partitions=4))
    assert "Window" not in plan, plan  # ranks come from offsets, not a window
    assert "SinglePartition" not in plan, plan


def test_prepare_pipeline_has_no_cartesian(spark, docs):
    from searchengine_spark.ops.pipeline import prepare_training_data

    handle: list = []
    out = prepare_training_data(
        docs, min_quality=2.5, line_chunk=12, w=3, tau=0.2,
        bench=docs.filter(F.col("doc_id") % 31 == 0), contam_w=5,
        rate=0.5, seed=7, cache_handle=handle,
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    for c in handle:
        c.unpersist()


def test_simhash_neardup_has_no_cross_join(docs):
    """Band blocking must plan as bucket aggregation + in-bucket pair
    generation — never an all-pairs join; verification is column math in
    the same projection (no join back to the signatures)."""
    from searchengine_spark.ops.dedup import simhash_neardup

    plan = plan_of(simhash_neardup(docs, d=6))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        "pairs must be generated inside the bucket (array combinators), "
        "not via a self-join: " + plan
    )


def test_shuffle_shards_single_exchange(docs):
    """The deterministic shuffle costs exactly ONE wide shuffle (the
    per-shard rank window); shard/hash assignment is stateless column
    math in the scan projection."""
    from searchengine_spark.ops.sampling import shuffle_shards

    plan = plan_of(shuffle_shards(docs, 8, seed=3))
    assert plan.count(") Exchange") == 1, plan


def test_terms_set_query_side_is_broadcast(spark, docs):
    """terms_set keeps the bm25_score join shape: |q|-row query side
    broadcast, required_df joined at the aggregated doc level."""
    from searchengine_spark.postings import (
        dictionary,
        doc_stats,
        term_frequencies,
    )
    from searchengine_spark.scoring import terms_set_score

    tf = term_frequencies(docs, "doc_id", "text")
    stats = doc_stats(tf)
    dct = dictionary(tf)
    required = docs.select(
        "doc_id", (F.pmod(F.col("doc_id"), F.lit(3)) + 1).alias("required")
    )
    out = terms_set_score(
        spark, tf, stats, dct, "hash merge sort table", required, 1000, 50.0
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_didyoumean_candidates_pruned_no_window(spark, docs):
    """The phrase-suggester's per-term candidate scan must carry the
    expand_fuzzy pruning: length-band filter ahead of a THRESHOLDED
    levenshtein, global rank via TakeOrderedAndProject — and no Window
    operator anywhere in the candidate plan (the old shape ranked the
    full vocabulary through an unpartitioned window per query term)."""
    from searchengine_spark.didyoumean import _candidates
    from searchengine_spark.ops.termstats import bigram_lm_counts

    _, uni, _ = bigram_lm_counts(docs, "doc_id", "text")
    base = _candidates(uni, "spark", 2, 5).filter(F.col("fb") == 0)
    plan = plan_of(base)
    assert "TakeOrderedAndProject" in plan, plan
    assert "levenshtein" in plan and "length(term" in plan, plan
    # the length band must sit in the SAME stage as (or before) the
    # levenshtein, and no global-sort/window may rank the vocabulary
    assert "Window" not in plan, plan
    assert plan.count("Sort ") == 0 or "TakeOrderedAndProject" in plan, plan
