#!/usr/bin/env python3
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Components (each timed, reported under "queries"):
  index_build       — segment index build over documents (docs/sec derived)
  query_wand        — 12 BM25 top-k queries via block-max WAND segments
  query_vectorized  — same queries via the decode-all vectorized kernel
  bm25_relational   — same queries via the pure-DataFrame relational path
  dedup_minhash     — MinHash banding candidate pairs
  dedup_exact       — exact hash dedup
  simhash           — 60-bit SimHash for every doc
  emb_cosine_topk   — brute-force cosine top-k over embeddings
  text_stats        — token_count + quality + lang_id + fingerprint
  …plus the round-2/3 additions: query_and / query_not / query_wand_batch,
  index_build_positional + query_phrase, query_qs (Lucene-style query
  strings), dedup_pipeline, ann_*_write / ann_*_stored_topk, ann_sq_*;
  round 4: porter2_analyze (snowball-exact stemming UDF over the corpus)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "spark join stream",
    "hash merge sort table",
    "window group order",
    "customer order line",
    "fast scan filter",
    "big small value",
    "batch stream vector",
    "query table column",
    "agg row key",
    "slow sort window merge",
    "data part group",
    "spark table scan filter join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:  # cosmetic label only — a custom corpus dir must not kill the run
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = None

    from pyspark.sql import functions as F

    from searchengine_spark.ops import dedup, similarity, textstats
    from searchengine_spark.postings import corpus_stats, dictionary, doc_stats, term_frequencies
    from searchengine_spark.query.engine import SearchEngine
    from searchengine_spark.scoring import bm25_score_batch
    from searchengine_spark.session import get_spark
    from searchengine_spark.entry_queries import _QUERY_VEC

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    # the sf parquet is a single small file → 1 input split; repartition to
    # model the many-split layout a real 100 TB table has (all map work would
    # otherwise run on one core)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus).cache()
    n_docs = docs.count()
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(cpus).cache()
    embs.count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    eng = SearchEngine(spark, os.path.join(idx_dir, "idx"))

    # untimed warmup: exercise every code path (codegen JIT, Python worker
    # pool, parquet writers) on a small slice so timed sections measure the
    # engine, not JVM cold start
    warm_docs = docs.limit(500).cache()
    warm_docs.count()
    warm_eng = SearchEngine(spark, os.path.join(idx_dir, "warm"))
    warm_eng.build_index_from_df(
        warm_docs, id_col="doc_id", text_col="text", range_bits=2, n_buckets=4, fresh=True
    )
    warm_eng.search(BENCH_QUERIES[0], k=10)
    dedup.minhash_band_pairs(warm_docs).count()
    warm_docs.unpersist()

    def build():
        eng.build_index_from_df(
            docs, id_col="doc_id", text_col="text", range_bits=4, n_buckets=16, fresh=True
        )

    timed("index_build", build)
    extra["index_docs_per_sec"] = round(n_docs / timings["index_build"], 1)
    from searchengine_spark.index.build import read_manifest

    mrows = [m for m in read_manifest(eng.index_dir) if m["kind"] == "metrics"]
    if mrows:
        extra["build_stages_sec"] = mrows[-1]["stages_sec"]

    def run_queries(**kw):
        def run():
            lat = []
            for q in BENCH_QUERIES:
                t0 = time.perf_counter()
                eng.search(q, k=100, **kw)
                lat.append(time.perf_counter() - t0)
            return lat

        return run

    lat = timed("query_wand", run_queries(use_wand=True))
    lat.sort()
    extra["query_p50_sec"] = round(lat[len(lat) // 2], 3)
    extra["query_p95_sec"] = round(lat[min(len(lat) - 1, int(len(lat) * 0.95))], 3)
    timed("query_vectorized", run_queries(use_wand=False))

    # conjunctive path: vectorized rare-term-driven intersection kernel
    def and_queries():
        for q in BENCH_QUERIES[:6]:
            eng.search(q, k=100, mode="and")

    timed("query_and", and_queries)

    # boolean NOT (Lucene MUST_NOT): in-kernel veto, exhaustive kernels
    def not_queries():
        for q in BENCH_QUERIES[:6]:
            eng.search(q, k=100, exclude="hash window")

    timed("query_not", not_queries)

    # batched segment search: whole 12-query batch in ONE job (the cluster
    # throughput shape — dictionary lookup, scan, and decode amortized)
    qbatch = {f"q{i:02d}": q for i, q in enumerate(BENCH_QUERIES)}
    eng.search_batch({"w": BENCH_QUERIES[0]}, k=10)  # warm
    timed("query_wand_batch", lambda: eng.search_batch(qbatch, k=100))
    extra["batch_queries_per_sec"] = round(
        len(qbatch) / timings["query_wand_batch"], 1
    )

    def relational():
        # throughput shape: one job scores the whole 12-query batch (the
        # postings scan + joins amortize across the batch — the plan we'd
        # run at 100 TB, vs one Spark job per query)
        tf = term_frequencies(docs, "doc_id", "text").cache()
        stats = doc_stats(tf).cache()
        dct = dictionary(tf).cache()
        n, avgdl = corpus_stats(stats)
        batch = {f"q{i:02d}": q for i, q in enumerate(BENCH_QUERIES)}
        bm25_score_batch(spark, tf, stats, dct, batch, n, avgdl, k=100).collect()
        for d in (tf, stats, dct):
            d.unpersist()

    timed("bm25_relational", relational)

    def ltr_pipeline():
        # LTR end-to-end: feature logging for the 12-query batch (one
        # broadcast-join agg), closed-form ridge fit (one moment agg +
        # driver solve), linear rescore + per-query top-k
        from searchengine_spark.ltr import (
            FEATURES, ltr_features, ltr_score, ltr_train_linear,
        )

        tf = term_frequencies(docs, "doc_id", "text").cache()
        stats = doc_stats(tf).cache()
        dct = dictionary(tf).cache()
        n, avgdl = corpus_stats(stats)
        batch = {f"q{i:02d}": q for i, q in enumerate(BENCH_QUERIES)}
        feats = ltr_features(spark, tf, stats, dct, batch, n, avgdl).cache()
        labeled = feats.withColumn(
            "label", 2.0 * F.col("bm25") + 0.5 * F.col("coverage")
        )
        w = ltr_train_linear(labeled, FEATURES, "label")
        ltr_score(feats, w, k=100).collect()
        for d in (tf, stats, dct, feats):
            d.unpersist()

    timed("ltr", ltr_pipeline)

    # positional build + index-native phrase queries (separate component so
    # index_build stays comparable across rounds)
    peng = SearchEngine(spark, os.path.join(idx_dir, "pidx"))

    def build_positional():
        peng.build_index_from_df(
            docs, id_col="doc_id", text_col="text", range_bits=4, n_buckets=16,
            with_positions=True, fresh=True,
        )

    timed("index_build_positional", build_positional)

    PHRASES = ["customer order", "spark join", "window group order", "hash merge"]

    def phrase_queries():
        for ph in PHRASES:
            peng.search_phrase(ph, k=50)

    peng.search_phrase(PHRASES[0], k=10)  # warm
    timed("query_phrase", phrase_queries)

    # Lucene-style query strings: every clause type (MUST/phrase/filter/
    # range/NOT/boost) composes constraint jobs + one scored pruned scan
    QS_QUERIES = [
        '+sort stream "merge sort" -dup',
        'stream^2 scan lang:en n_chars:[150 TO 2000]',
        'table +filter "customer order" source:src3',
    ]

    def qs_queries():
        for q in QS_QUERIES:
            peng.search_query_string(q, k=100, metadata=docs)

    timed("query_qs", qs_queries)

    # sharded scatter-gather: N independent shard indexes, batch scored
    # under GLOBAL stats, driver-side k·N merge — the multi-node serving
    # shape (per-shard jobs are independent; here they share one local JVM)
    from searchengine_spark.query.sharded import ShardedEngine

    def sharded_build():
        return ShardedEngine.build(
            spark, docs, os.path.join(idx_dir, "shards"), 4,
            range_bits=2, n_buckets=8,
        )

    sheng = timed("sharded_build", sharded_build)
    sheng.search_batch({"w": BENCH_QUERIES[0]}, k=10)  # warm
    timed("query_sharded_batch", lambda: sheng.search_batch(qbatch, k=100))

    timed("dedup_minhash", lambda: dedup.minhash_band_pairs(docs).count())
    # benchmark decontamination: broadcast bench shingles, one map-side pass
    bench_docs = docs.filter(F.expr("doc_id % 31 = 0"))
    timed(
        "decontamination",
        lambda: dedup.contaminated_pairs(docs, bench_docs, w=5).count(),
    )
    timed("dedup_pipeline", lambda: dedup.dedup_pipeline(docs, w=3, tau=0.2).count())
    timed("dedup_exact", lambda: dedup.exact_dedup(docs).count())
    timed("simhash", lambda: dedup.simhash(docs).count())
    timed("emb_cosine_topk", lambda: similarity.cosine_topk(embs, _QUERY_VEC, k=25).collect())
    timed("ann_lsh_topk", lambda: similarity.lsh_topk(embs, _QUERY_VEC, k=25).collect())
    timed("ann_ivf_topk", lambda: similarity.ivf_topk(embs, _QUERY_VEC, k=25).collect())

    # stored ANN layouts: write once (timed), then the partition-pruned read
    # path — the 100 TB probe shape (scan touches only the probed buckets)
    ann_dir = os.path.join(idx_dir, "ann")
    timed("ann_lsh_write", lambda: similarity.lsh_write(embs, f"{ann_dir}/lsh", n_planes=8, dim=64))
    timed("ann_lsh_stored_topk", lambda: similarity.lsh_stored_topk(spark, f"{ann_dir}/lsh", _QUERY_VEC, k=25).collect())
    timed("ann_ivf_write", lambda: similarity.ivf_write(embs, f"{ann_dir}/ivf", n_lists=16, dim=64))
    timed("ann_ivf_stored_topk", lambda: similarity.ivf_stored_topk(spark, f"{ann_dir}/ivf", _QUERY_VEC, k=25).collect())
    # int8 scalar quantization: codec + the 4×-compressed stored read path
    timed("ann_pq_topk", lambda: similarity.pq_topk(embs, _QUERY_VEC, k=25).collect())
    timed("ann_pq_write", lambda: similarity.pq_write(embs, f"{ann_dir}/pq"))
    timed("ann_pq_stored_topk", lambda: similarity.pq_stored_topk(spark, f"{ann_dir}/pq", _QUERY_VEC, k=25).collect())
    timed("ann_ivfpq_write", lambda: similarity.ivfpq_write(embs, f"{ann_dir}/ivfpq", codebooks=similarity._pq_default_books(8, 16, 64)))
    timed("ann_ivfpq_stored_topk", lambda: similarity.ivfpq_stored_topk(spark, f"{ann_dir}/ivfpq", _QUERY_VEC, k=25, nprobe=4).collect())
    timed("ann_sq_topk", lambda: similarity.sq_topk(embs, _QUERY_VEC, k=25).collect())
    timed("ann_sq_write", lambda: similarity.sq_write(embs, f"{ann_dir}/sq"))
    timed("ann_sq_stored_topk", lambda: similarity.sq_stored_topk(spark, f"{ann_dir}/sq", _QUERY_VEC, k=25).collect())
    # 1-bit binary quantization: 32× coarse-scan byte reduction + exact rerank
    timed("ann_bq_write", lambda: similarity.bq_write(embs, f"{ann_dir}/bq"))
    timed("ann_bq_stored_topk", lambda: similarity.bq_stored_topk(spark, f"{ann_dir}/bq", _QUERY_VEC, k=10, rerank=100).collect())

    def text_stats():
        textstats.token_count(docs).count()
        textstats.quality_score(docs).count()
        textstats.lang_id(docs).count()
        textstats.fingerprint(docs).count()
        textstats.repetition_stats(docs).count()

    timed("text_stats", text_stats)

    # snowball-exact stemming over the corpus (round 4): the porter2 Arrow
    # UDF applied to every doc's token stream — the analyzer-stage cost a
    # stemmed index build pays on top of tokenize
    from searchengine_spark.tokenizer import analyze_text_expr

    timed(
        "porter2_analyze",
        lambda: docs.select(
            F.length(analyze_text_expr(F.col("text"), "porter2")).alias("n")
        ).agg(F.sum("n")).collect(),
    )

    # corpus term analytics: significant terms + TF-IDF keywords (two df
    # aggs + window), PMI collocations and bigram-LM perplexity (map-side
    # zip_with bigram stream, count aggs only)
    from searchengine_spark.ops import termstats

    def term_analytics():
        termstats.significant_terms(docs, top_n=5).count()
        termstats.keyword_tfidf(docs, k=3).count()

    timed("term_analytics", term_analytics)
    timed(
        "collocations",
        lambda: termstats.collocations(docs, min_count=5, top_n=25).count(),
    )
    timed("perplexity_lm", lambda: termstats.perplexity(docs).count())

    def hll():
        from searchengine_spark.ops import sketch as sketch_ops
        from searchengine_spark.tokenizer import tokenize_raw_expr

        toks = docs.select(F.explode(tokenize_raw_expr(F.col("text"))).alias("term"))
        regs = sketch_ops.hll_build(toks, "term", p=12)
        sketch_ops.hll_estimate(regs, p=12).collect()

    timed("hll_distinct", hll)

    def bpe_train_bench():
        from searchengine_spark.ops import bpe as bpe_ops

        merges, state = bpe_ops.bpe_train(docs, 16, min_pair_count=2)
        state.unpersist()
        return merges

    timed("bpe_train16", bpe_train_bench)

    def dym():
        from searchengine_spark.didyoumean import suggest_phrase

        suggest_phrase(docs, "sow lin").collect()

    timed("didyoumean", dym)

    # geo-distance top-k (box-pruned haversine) + deterministic stratified
    # sampling — both single map-pass ops, here for regression tracking
    from searchengine_spark.ops.geo import geo_distance_topk
    from searchengine_spark.ops.sampling import sample_stratified

    geo = docs.select(
        "doc_id",
        (F.expr("doc_id * 7919 % 18000") / 100.0 - 90.0).alias("lat"),
        (F.expr("doc_id * 104729 % 36000") / 100.0 - 180.0).alias("lon"),
    )
    timed(
        "geo_topk",
        lambda: geo_distance_topk(geo, 10.0, 20.0, 25, radius_km=4000.0).collect(),
    )
    from searchengine_spark.ops.geo import geo_distance_join

    timed("geo_pairs", lambda: geo_distance_join(geo, 700.0).count())

    # round-3 additions: exact-substring duplicate spans (positional
    # shingles + diagonal islands), late-interaction MaxSim, distributed NB
    from searchengine_spark.ops.classify import nb_predict, nb_train
    from searchengine_spark.ops.similarity import maxsim_topk

    timed("dup_spans", lambda: dedup.duplicate_spans(docs, w=8).count())

    # trigram-accelerated regex search over raw text (Zoekt shape):
    # build the trigram layout once, then a pruned-candidate + verify query
    from searchengine_spark.trigram import build_trigram_index, trigram_search

    tg_dir = tempfile.mkdtemp(prefix="bench_tg_") + "/tg"
    timed("grep_build", lambda: build_trigram_index(docs, tg_dir, n_buckets=32))
    timed(
        "grep_query",
        lambda: trigram_search(
            spark, tg_dir, docs, "merge (sort|join)", k=500
        ).count(),
    )
    shutil.rmtree(os.path.dirname(tg_dir), ignore_errors=True)

    # repo-level fork detection: winnow fingerprints -> capped fp equi-join
    from searchengine_spark.ops.code import fork_pairs

    timed(
        "fork_pairs",
        lambda: fork_pairs(docs, "source", tau=0.001, min_shared=2).count(),
    )
    timed(
        "maxsim_topk",
        lambda: maxsim_topk(
            term_frequencies(docs, "doc_id", "text"),
            ["spark", "join", "stream", "shuffle"],
            k=20,
        ).collect(),
    )
    timed("nb_classify", lambda: nb_predict(nb_train(docs, "lang"), docs).count())
    # retrieve-then-rerank: WAND candidates → stored term vectors → MaxSim
    timed(
        "maxsim_rerank",
        lambda: eng.search_rerank_maxsim("spark join stream", k=15,
                                         n_candidates=50),
    )
    timed(
        "sample_stratified",
        lambda: sample_stratified(
            docs, {"en": 0.2, "fr": 0.6, "zh": 1.0}, by="lang", default_rate=0.05
        ).count(),
    )
    # DSIR importance resampling: feature hashing + λ model + Gumbel top-N
    from searchengine_spark.ops.selection import dsir_select

    timed(
        "dsir_select",
        lambda: dsir_select(docs, "lang = 'en'", 500, seed=7,
                            n_buckets=512).count(),
    )

    # training-data pipeline surfaces: exact line dedup (one hash agg),
    # sequence packing (windowed cumsum per group), and the composed
    # end-to-end preparation chain (quality -> line dedup -> exact ->
    # near-dup -> decontaminate -> sample)
    from searchengine_spark.ops import dedup as dedup_ops
    from searchengine_spark.ops import packing
    from searchengine_spark.ops.pipeline import prepare_training_data

    timed(
        "line_dedup",
        lambda: dedup_ops.line_dedup(dedup_ops.chunk_lines(docs, 12)).count(),
    )
    timed("pack_docs", lambda: packing.pack_docs(docs, 2048).count())
    _prep_cache: list = []
    timed(
        "prepare_pipeline",
        lambda: prepare_training_data(
            docs,
            min_quality=2.5,
            line_chunk=12,
            w=3,
            tau=0.2,
            bench=docs.filter(F.expr("doc_id % 31 = 0")),
            contam_w=5,
            rate=0.5,
            seed=7,
            cache_handle=_prep_cache,
        ).count(),
    )
    for c in _prep_cache:  # don't let the cached relation skew later timings
        c.unpersist()

    # authority graph: banding pairs -> symmetrized edges -> 4 checkpointed
    # power iterations (the iterative-algorithm path)
    from searchengine_spark.ops import graph

    timed(
        "pagerank",
        lambda: graph.pagerank(
            graph.symmetric_edges(dedup.minhash_band_pairs(docs)), n_iter=4
        ).count(),
    )

    # event-analytics surface: windowed agg + sessionization + as-of join
    # over the 100k-row events table (one timing for the group)
    from searchengine_spark.ops.temporal import asof_join
    from searchengine_spark.streaming.analytics import sessionize, windowed_event_counts

    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(cpus).cache()
    events.count()

    def event_analytics():
        windowed_event_counts(events, "1 hour").count()
        sessionize(events, 1800).count()
        clicks = events.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts")
        views = events.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "value")
        asof_join(clicks, views).count()

    timed("event_analytics", event_analytics)
    events.unpersist()

    # symbol layer (round 3): definition mining → stored layout → pruned
    # go-to-definition + prefix suggest + find-references over a synthetic
    # code corpus (the sf docs are prose, so defs would be vacuous)
    from searchengine_spark.ops import code as code_ops

    code_rows = [
        (i, f"def fn_{i % 997}(x):\n    return parse_{i % 31}(x)\n"
            f"class Type{i % 53}: pass")
        for i in range(n_docs)
    ]
    code_df = spark.createDataFrame(
        code_rows, "doc_id long, text string"
    ).repartition(cpus)
    sym_dir = tempfile.mkdtemp(prefix="bench_sym_") + "/symbols"

    def symbols_build():
        code_ops.symbol_write(code_df, sym_dir, n_buckets=32)

    timed("symbols_build", symbols_build)

    def symbols_query():
        code_ops.symbol_lookup(spark, sym_dir, "fn_7").count()
        code_ops.symbol_prefix_topk(spark, sym_dir, "parse_", k=10).count()
        code_ops.references(code_df, "parse_7").count()

    timed("symbols_query", symbols_query)
    shutil.rmtree(os.path.dirname(sym_dir), ignore_errors=True)

    # maintenance under churn (round 5): epoch-layout index → 10%
    # delete_by_query (distributed tombstone write) + 5% update_docs, sized
    # so the delete CROSSES tombstone_limit and triggers the write-side
    # join-free fold — compaction/fold throughput tracked round-over-round
    # like everything else. Rank identity of the churned index vs a fresh
    # survivor build is pinned in tests/test_bulk_maintenance.py.
    from searchengine_spark.streaming.ingest import compact_streamed_index

    churn_eng = SearchEngine(spark, os.path.join(idx_dir, "churn"))
    churn_eng.build_index_from_df(
        docs, id_col="doc_id", text_col="text", range_bits=4, n_buckets=16,
        fresh=True,
    )
    compact_streamed_index(spark, churn_eng.index_dir)  # epoch layout
    churn_eng.tombstone_limit = int(0.08 * n_docs)  # 10% delete crosses it

    def maintenance_churn():
        n_del = churn_eng.delete_by_query("window group order", mode="or")
        upd = docs.filter(F.expr("doc_id % 20 = 1")).select(
            "doc_id", F.concat(F.col("text"), F.lit(" updated")).alias("text")
        )
        n_upd = churn_eng.update_docs(upd)
        hits = churn_eng.search(BENCH_QUERIES[0], k=100)
        assert n_del > 0 and n_upd > 0 and hits

    timed("maintenance_churn", maintenance_churn)

    shutil.rmtree(idx_dir, ignore_errors=True)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "searchengine_spark e2e bench (index build + BM25 top-k + pipeline ops)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "cpus": cpus,
                **extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
