"""Reference-parity scoring modes (R1 quirk formula, R5 blend, W3 dynamic k,
W5 anomaly cutoff) and query-expansion hooks (§2.11) — Spark vs extended
pure-Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.corpus import corpus_df
from searchengine_spark.expansion import (
    identity_rewriter,
    make_spell_rewriter,
    make_synonym_rewriter,
    rewrite_query,
)
from searchengine_spark.oracle import OracleIndex
from searchengine_spark.postings import corpus_stats, dictionary, doc_stats, term_frequencies
from searchengine_spark.scoring import (
    anomaly_cutoff,
    blended_score_partc,
    bm25_reference_score,
    dynamic_k,
    topk,
)

QUERIES = ["index merge posting", "def return import", "license apache version"]


@pytest.fixture(scope="module")
def ctx(spark):
    df = corpus_df(spark, 200, seed=13).cache()
    oracle = OracleIndex.build(
        [(r["doc_id"], r["content"]) for r in df.select("doc_id", "content").collect()]
    )
    tf = term_frequencies(df, "doc_id", "content").cache()
    stats = doc_stats(tf)
    dct = dictionary(tf)
    n, avgdl = corpus_stats(stats)
    yield spark, tf, stats, dct, n, avgdl, oracle
    tf.unpersist()
    df.unpersist()


def test_bm25_reference_mode(ctx):
    spark, tf, stats, dct, n, avgdl, oracle = ctx
    for q in QUERIES:
        want = oracle.bm25_reference_topk(q, k=15)
        got = topk(bm25_reference_score(spark, tf, stats, dct, q, n, avgdl), 15).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in want], q
        for r, (_, ws) in zip(got, want):
            assert abs(r["score"] - ws) < 1e-9


def test_blended_partc(ctx):
    spark, tf, stats, dct, n, avgdl, oracle = ctx
    for q in QUERIES[:2]:
        want = oracle.blended_partc_topk(q, 15)
        got = topk(blended_score_partc(spark, tf, stats, dct, q, n, avgdl), 15).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in want], q
        for r, (_, ws) in zip(got, want):
            assert abs(r["score"] - ws) < 1e-9


def test_dynamic_k(ctx):
    _, _, _, _, _, _, oracle = ctx
    ranked = oracle.bm25_reference_topk("def return", k=None)
    full = oracle.bm25_reference_topk("def return", k=10**9)
    assert len(ranked) == round(0.9 * len(full))


def test_anomaly_cutoff(spark):
    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(10)] + [(99, -100.0)], "doc_id int, score double"
    )
    kept = anomaly_cutoff(scored, n_std=1.0).collect()
    assert all(r["score"] > -100.0 for r in kept)
    assert len(kept) < 11


def test_spell_rewriter():
    vocab = {"index", "merge", "posting", "block"}
    rw = make_spell_rewriter(vocab)
    out = rewrite_query("indx mrge posting", rw)
    assert ("index", 1.0) in out and ("merge", 1.0) in out and ("posting", 1.0) in out


def test_synonym_rewriter():
    rw = make_synonym_rewriter({"index": ["posting"]})
    out = dict(rewrite_query("index", rw))
    assert out == {"index": 1.0, "posting": 0.2}


def test_rewriter_in_engine(spark, tmp_path):
    from searchengine_spark.query.engine import SearchEngine

    df = corpus_df(spark, 100, seed=3)
    eng = SearchEngine(spark, str(tmp_path / "idx"))
    eng.build_index_from_df(df, range_bits=2, n_buckets=4, fresh=True)
    base = eng.search("index merge", k=10, rewriter=identity_rewriter)
    plain = eng.search("index merge", k=10)
    assert base == plain
    # misspelled query + spell rewriter == clean query
    vocab = {r["term"] for r in spark.read.parquet(str(tmp_path / "idx/dictionary")).select("term").collect()}
    fixed = eng.search("indx mrge", k=10, rewriter=make_spell_rewriter(vocab))
    assert fixed == plain
    # synonym expansion changes candidate set but stays deterministic
    syn = eng.search("index", k=10, rewriter=make_synonym_rewriter({"index": ["merge"]}))
    assert syn == eng.search("index", k=10, rewriter=make_synonym_rewriter({"index": ["merge"]}))


def test_embedding_rewriter():
    from searchengine_spark.expansion import hash_term_vectors, make_embedding_rewriter

    vocab = ["index", "merge", "posting", "block", "codec", "stream"]
    vecs = hash_term_vectors(vocab)
    rw = make_embedding_rewriter(vecs, n_neighbors=2)
    out = dict(rewrite_query("index", rw))
    assert out["index"] == 1.0
    expanded = {t for t, w in out.items() if w == 0.2}
    assert len(expanded) == 2 and expanded <= set(vocab) - {"index"}
    # deterministic
    assert rewrite_query("index", rw) == rewrite_query("index", rw)
    # >= max_query_terms → no expansion (reference: only short queries expand)
    out_long = dict(rewrite_query("index merge posting block codec", rw))
    assert all(w == 1.0 for w in out_long.values())


def test_embedding_rewriter_in_engine(spark, tmp_path):
    from searchengine_spark.expansion import hash_term_vectors, make_embedding_rewriter
    from searchengine_spark.query.engine import SearchEngine

    df = corpus_df(spark, 100, seed=3)
    eng = SearchEngine(spark, str(tmp_path / "gidx"))
    eng.build_index_from_df(df, range_bits=2, n_buckets=4, fresh=True)
    vocab = [
        r["term"]
        for r in spark.read.parquet(str(tmp_path / "gidx/dictionary")).select("term").collect()
    ]
    rw = make_embedding_rewriter(hash_term_vectors(vocab), n_neighbors=2)
    hits = eng.search("index", k=10, rewriter=rw)
    assert hits == eng.search("index", k=10, rewriter=rw)
    assert len(hits) > 0


def test_phrase_match_semantics(spark):
    from pyspark.sql import functions as F

    from searchengine_spark.scoring import phrase_match_col

    rows = [
        (1, "the merge sort routine"),       # adjacent → match ("the" is a stopword)
        (2, "merge the sort"),               # stopword between → ADJACENT after filter
        (3, "sort merge"),                   # wrong order → no match
        (4, "supermerge sortx"),             # substring traps → no match
        (5, "merge sorting"),                # different token → no match
        (6, "alpha merge sort beta"),        # interior → match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]
        for r in df.filter(phrase_match_col(F.col("text"), ["merge", "sort"])).collect()
    }
    assert got == {1, 2, 6}


def test_phrase_topk_subset_of_and(spark):
    from searchengine_spark.entry_queries import q_boolean_and, q_phrase_topk

    sf = "/root/testdata/sf0.001"
    phrase_ids = {r["doc_id"] for r in q_phrase_topk(spark, sf).collect()}
    # phrase docs necessarily contain BOTH terms → subset of unrestricted AND
    # over those same terms (recompute AND for the phrase's terms)
    from searchengine_spark.postings import term_frequencies
    from searchengine_spark.scoring import boolean_and

    tf = term_frequencies(
        spark.read.parquet(f"{sf}/documents.parquet"), "doc_id", "text", use_arrow_udf=False
    )
    and_ids = {r["doc_id"] for r in boolean_and(spark, tf, "customer order").collect()}
    assert phrase_ids <= and_ids


def test_prf_expansion_semantics(spark, sf_dir):
    """PRF rewriter (§2.11 corpus-driven member): originals at weight 1.0,
    exactly m NEW terms at beta, and beta=0 degrades to plain BM25 on the
    base candidate set."""
    from searchengine_spark.postings import corpus_stats, dictionary, doc_stats, term_frequencies
    from searchengine_spark.scoring import bm25_prf_score, bm25_score, parse_query, prf_expanded_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tf = term_frequencies(docs, "doc_id", "text").cache()
    stats = doc_stats(tf)
    dct = dictionary(tf)
    n, avgdl = corpus_stats(stats)
    q = "spark join stream"
    weighted = prf_expanded_terms(spark, tf, stats, dct, q, n, avgdl, m_terms=4)
    orig = {t for t, _ in parse_query(q)}
    ones = {t for t, w in weighted if w == 1.0}
    betas = [(t, w) for t, w in weighted if w != 1.0]
    assert ones == orig
    assert len(betas) == 4 and all(w == 0.4 for _, w in betas)
    assert not any(t in orig for t, _ in betas)

    # beta=0: expansion terms contribute nothing → scores equal plain BM25
    # for every doc the plain query retrieves
    plain = {r["doc_id"]: r["score"] for r in bm25_score(
        spark, tf, stats, dct, q, n, avgdl).collect()}
    zero = {r["doc_id"]: r["score"] for r in bm25_prf_score(
        spark, tf, stats, dct, q, n, avgdl, m_terms=4, beta=0.0).collect()}
    for d, s in plain.items():
        assert abs(zero[d] - s) < 1e-9
    tf.unpersist()


def test_spell_rewriter_distance2_lexicographic_tie():
    """Distance-2 ties break to the LEXICOGRAPHIC minimum across ALL
    intermediates (the documented contract), not whichever intermediate
    iterates first."""
    from searchengine_spark.expansion import make_spell_rewriter

    r = make_spell_rewriter({"xya", "zda"})
    assert r([("aaa", 1)]) == [("xya", 1.0)]
