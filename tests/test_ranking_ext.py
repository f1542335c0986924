"""Ranking extensions beyond the reference scorer family: Dirichlet LM
scoring, field collapsing, recency decay, batched hit counts — each checked
against a brute-force pure-Python oracle on a real corpus slice.

Reference parity note: the reference ships only BM25/inner/cosine blends
(``Part C/ranker.py``); these are engine-hardening surfaces a fulltext index
is expected to carry (Lucene LMDirichletSimilarity, Elasticsearch collapse /
function-score decay / _count). Driver entries lm_dirichlet / collapse_topk /
recency_topk / hit_counts pin them to DuckDB twins at sf0.01.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from searchengine_spark.postings import corpus_stats, dictionary, doc_stats, term_frequencies
from searchengine_spark.scoring import (
    bm25_score,
    collapse_topk,
    hit_counts,
    lm_dirichlet_score,
    parse_query,
    recency_blend,
    topk,
)
from searchengine_spark.tokenizer import tokenize_py

QUERY = "spark join stream table"


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    ).cache()


@pytest.fixture(scope="module")
def ctx(spark, corpus):
    tf = term_frequencies(corpus, use_arrow_udf=False).cache()
    stats = doc_stats(tf).cache()
    dct = dictionary(tf).cache()
    n, avgdl = corpus_stats(stats)
    return tf, stats, dct, n, avgdl


@pytest.fixture(scope="module")
def py_index(corpus):
    """Brute-force in-memory index of the slice."""
    docs = {r["doc_id"]: tokenize_py(r["text"]) for r in corpus.collect()}
    docs = {d: t for d, t in docs.items() if t}
    tf = {d: Counter(t) for d, t in docs.items()}
    df: Counter = Counter()
    cf: Counter = Counter()
    for c in tf.values():
        for t, n in c.items():
            df[t] += 1
            cf[t] += n
    return docs, tf, df, cf


def test_lm_dirichlet_matches_bruteforce(spark, ctx, py_index):
    tf_df, stats, dct, n, _ = ctx
    _, tf, df, cf = py_index
    total_cf = sum(cf.values())
    mu = 2000.0
    got = {
        r["doc_id"]: r["score"]
        for r in lm_dirichlet_score(spark, tf_df, stats, dct, QUERY, total_cf, mu=mu).collect()
    }
    qterms = parse_query(QUERY)
    want = {}
    for d, c in tf.items():
        dl = sum(c.values())
        s = 0.0
        matched = False
        for t, qtf in qterms:
            if c.get(t):
                matched = True
                s += qtf * max(
                    0.0,
                    math.log(1.0 + c[t] / (mu * cf[t] / total_cf))
                    + math.log(mu / (dl + mu)),
                )
        if matched:
            want[d] = s
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_collapse_keeps_best_per_group(spark, ctx, corpus):
    tf_df, stats, dct, n, avgdl = ctx
    scored = bm25_score(spark, tf_df, stats, dct, QUERY, n, avgdl)
    out = collapse_topk(scored, corpus, "source", k=5, round_dp=5).collect()
    # brute force: best (rounded score, -doc_id) per source
    rows = (
        scored.select("doc_id", F.round("score", 5).alias("score"))
        .join(corpus.select("doc_id", "source"), "doc_id")
        .collect()
    )
    best: dict[str, tuple] = {}
    for r in rows:
        key = (-r["score"], r["doc_id"])
        if r["source"] not in best or key < best[r["source"]]:
            best[r["source"]] = key
    want = sorted(((neg_s, d, src) for src, (neg_s, d) in best.items()))[:5]
    got = [(-r["score"], r["doc_id"], r["source"]) for r in out]
    assert got == want
    # one row per group, globally ordered
    assert len({r["source"] for r in out}) == len(out)


def test_collapse_inner_hits_shape_and_order(spark, ctx, corpus):
    """inner_hits deepens the per-group cut without changing WHICH groups
    win: rank-1 rows ≡ collapse_topk, each group carries ≤inner_size docs
    in (score desc, doc_id asc) order, all from that group."""
    from searchengine_spark.scoring import collapse_inner_hits

    tf_df, stats, dct, n, avgdl = ctx
    scored = bm25_score(spark, tf_df, stats, dct, QUERY, n, avgdl)
    flat = collapse_topk(scored, corpus, "source", k=4, round_dp=5).collect()
    deep = collapse_inner_hits(
        scored, corpus, "source", k=4, inner_size=3, round_dp=5
    ).collect()
    heads = {
        r["source"]: (r["doc_id"], r["score"])
        for r in deep
        if r["inner_rank"] == 1
    }
    assert heads == {r["source"]: (r["doc_id"], r["score"]) for r in flat}
    by_group: dict[str, list] = {}
    for r in sorted(deep, key=lambda r: (r["source"], r["inner_rank"])):
        by_group.setdefault(r["source"], []).append((r["score"], r["doc_id"]))
    rows = (
        scored.select("doc_id", F.round("score", 5).alias("score"))
        .join(corpus.select("doc_id", "source"), "doc_id")
        .collect()
    )
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append((-r["score"], r["doc_id"]))
    for src, got in by_group.items():
        assert len(got) <= 3
        want = [(-ns, d) for ns, d in sorted(per_src[src])[:3]]
        assert got == want
    import pytest as _pt

    with _pt.raises(ValueError):
        collapse_inner_hits(scored, corpus, "source", k=4, inner_size=0)


def test_recency_blend_decays(spark, ctx, corpus):
    tf_df, stats, dct, n, avgdl = ctx
    scored = bm25_score(spark, tf_df, stats, dct, QUERY, n, avgdl).select(
        "doc_id", F.round("score", 5).alias("score")
    )
    age = corpus.select("doc_id", (F.col("doc_id") % 100).cast("double").alias("age"))
    out = {r["doc_id"]: r["score"] for r in recency_blend(scored, age, half_life=50.0).collect()}
    base = {r["doc_id"]: r["score"] for r in scored.collect()}
    lam = math.log(2.0) / 50.0
    assert set(out) == set(base)
    for d, s in base.items():
        assert out[d] == pytest.approx(s * math.exp(-lam * (d % 100)), rel=1e-12)
    # a doc exactly one half-life old scores half its text relevance
    one_hl = [d for d in base if d % 100 == 50]
    for d in one_hl:
        assert out[d] == pytest.approx(base[d] / 2.0, rel=1e-12)
    assert topk(recency_blend(scored, age, 50.0), 5).count() == 5


def test_hit_counts_or_and(spark, ctx, py_index):
    tf_df = ctx[0]
    _, tf, _, _ = py_index
    queries = {"q1": QUERY, "q2": "customer order", "q3": "zzznotaterm spark"}
    got = {r["query_id"]: (r["or_hits"], r["and_hits"]) for r in hit_counts(spark, tf_df, queries).collect()}
    for qid, q in queries.items():
        terms = [t for t, _ in parse_query(q)]
        or_hits = sum(1 for c in tf.values() if any(c.get(t) for t in terms))
        and_hits = sum(1 for c in tf.values() if all(c.get(t) for t in terms))
        assert got[qid] == (or_hits, and_hits), qid
    # OOV term kills the conjunctive count but not the OR count
    assert got["q3"][1] == 0 and got["q3"][0] > 0


def test_hit_counts_empty_batch_raises(spark, ctx):
    with pytest.raises(ValueError):
        hit_counts(spark, ctx[0], {})


@pytest.fixture(scope="module")
def eng(spark, corpus, tmp_path_factory):
    from searchengine_spark.query.engine import SearchEngine

    e = SearchEngine(spark, str(tmp_path_factory.mktemp("lmidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          range_bits=2, n_buckets=4)
    return e


def test_lm_index_native_matches_relational(spark, ctx, eng):
    """scorer='lm' on the segment index reproduces the relational LM
    ranking and scores (same tf/dl from the blocks, cf from the stored
    dictionary, C from meta.total_len)."""
    tf_df, stats, dct, n, _ = ctx
    from searchengine_spark.scoring import topk

    C = int(stats.agg(F.sum("doc_len")).collect()[0][0])
    for q in (QUERY, "customer order", "window group"):
        rel = topk(lm_dirichlet_score(spark, tf_df, stats, dct, q, C), 15).collect()
        got = eng.search(q, k=15, scorer="lm")
        assert [(g[0]) for g in got] == [r["doc_id"] for r in rel], q
        for g, r in zip(got, rel):
            assert g[1] == pytest.approx(r["score"], abs=1e-9)


def test_lm_index_and_mode_and_exclude(spark, ctx, eng):
    """LM composes with conjunctive mode and boolean NOT — the masks and
    guards are scorer-independent."""
    or_ids = {d for d, _ in eng.search(QUERY, k=1000, scorer="lm")}
    and_hits = eng.search(QUERY, k=1000, mode="and", scorer="lm")
    assert {d for d, _ in and_hits} <= or_ids
    not_hits = eng.search(QUERY, k=1000, scorer="lm", exclude="table")
    table_docs = {d for d, _ in eng.search("table", k=100000)}
    assert not ({d for d, _ in not_hits} & table_docs)


def test_lm_scorer_validation(eng):
    with pytest.raises(ValueError, match="unknown scorer"):
        eng.search(QUERY, k=5, scorer="dfr")
    from searchengine_spark.expansion import identity_rewriter

    with pytest.raises(ValueError, match="rewriters"):
        eng.search(QUERY, k=5, scorer="lm", rewriter=identity_rewriter)


# ---------------------------------------------------------------- pinned
def test_pinned_topk_semantics(spark):
    """Pins outrank organic in LIST order; a pinned doc that also matched
    organically appears once (at its pin); unknown ids are skipped;
    organic relevance fills the rest."""
    import pytest as _pt

    from searchengine_spark.scoring import pinned_topk

    scored = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 7.0), (4, 3.0)], "doc_id long, score double"
    )
    docs = spark.createDataFrame([(i,) for i in range(1, 5)], "doc_id long")
    out = pinned_topk(
        spark, scored, [3, 42, 2], k=4, valid_docs=docs
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert ids == [3, 2, 1, 4]  # pins (3 then 2; 42 skipped), then organic
    assert out[0]["score"] > out[1]["score"] > 1e8  # pin scores descend
    assert out[2]["score"] == 9.0  # organic untouched
    with _pt.raises(ValueError):
        pinned_topk(spark, scored, [], k=4)
    with _pt.raises(ValueError):
        pinned_topk(spark, scored, [1, 1], k=4)


# ------------------------------------------------------------- has_parent
def test_has_parent_fans_out_and_filters(spark):
    """Children inherit the parent's score; children of non-matching
    parents are excluded; score=False gives ES filter semantics (0.0)."""
    from searchengine_spark.scoring import has_parent_topk

    parents = spark.createDataFrame(
        [("a", 4.0), ("b", 2.0)], "source string, score double"
    )
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "a")], "doc_id long, source string"
    )
    out = has_parent_topk(parents, docs, "source", k=10).collect()
    assert [(r["doc_id"], r["source"], r["score"]) for r in out] == [
        (1, "a", 4.0), (4, "a", 4.0), (2, "b", 2.0)
    ]  # doc 3's parent 'c' matched nothing
    flt = has_parent_topk(parents, docs, "source", k=10, score=False).collect()
    assert all(r["score"] == 0.0 for r in flt) and len(flt) == 3


# --------------------------------------------------------- LM Jelinek-Mercer
def test_lm_jelinek_mercer_matches_brute(spark):
    import math

    from searchengine_spark.postings import (
        corpus_stats, dictionary, doc_stats, term_frequencies,
    )
    from searchengine_spark.scoring import lm_jelinek_mercer_score

    docs = spark.createDataFrame(
        [(1, "spark join spark"), (2, "join filter window"),
         (3, "spark window window filter")],
        "doc_id long, text string",
    )
    tf = term_frequencies(docs)
    stats = doc_stats(tf)
    dct = dictionary(tf)
    total_cf = int(sum(r["cf"] for r in dct.collect()))
    lam = 0.1
    got = {
        r["doc_id"]: r["score"]
        for r in lm_jelinek_mercer_score(
            spark, tf, stats, dct, "spark window", total_cf, lam=lam
        ).collect()
    }
    raw = {
        (r["doc_id"], r["term"]): r["tf"] for r in tf.collect()
    }
    cf = {r["term"]: r["cf"] for r in dct.collect()}
    dl = {r["doc_id"]: r["doc_len"] for r in stats.collect()}
    want = {}
    for d in (1, 2, 3):
        s = 0.0
        for t in ("spark", "window"):
            if (d, t) in raw:
                s += math.log(
                    1.0 + ((1 - lam) * raw[(d, t)] / dl[d])
                    / (lam * (cf[t] / total_cf))
                )
        if s:
            want[d] = s
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
    # matched-terms-only: every contribution is positive, no clamp needed
    assert all(v > 0 for v in got.values())
    with pytest.raises(ValueError):
        lm_jelinek_mercer_score(spark, tf, stats, dct, "spark", total_cf, lam=1.0)
