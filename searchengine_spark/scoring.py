"""Ranked-retrieval scorers as pure column arithmetic (relational path).

Reference analogue (SURVEY.md §2.6):
  * BM25           — ``Part C/ranker.py:62-86`` (R1; reference uses k=3, b=0.6
                     over *normalized* tf — kept behind ``reference_mode``)
  * inner product  — ``Part C/ranker.py:46-59`` (R3)
  * cosine         — ``Part C/ranker.py:89-105`` (R4; doc norm = A5)
  * blends         — ``Part C/ranker.py:28-32`` (R5: 0.9·BM25 + 0.1·inner)
  * top-k          — ``Part C/ranker.py:110-117`` (W2): Spark plans
                     ``TakeOrderedAndProject`` for orderBy+limit = bounded
                     per-partition heap + merge.

The engine's primary scorer is standard BM25 with k1=1.5, b=0.75 and
idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Lucene form, always positive),
per BASELINE.json north_star. Candidate generation is an OR (term-at-a-time
union) like the reference (``Part C/searcher.py:79-106``); AND semantics and
block-max pruning live in the segment/WAND path (query/wand.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1
from .tokenizer import tokenize_py


def parse_query(query: str | list[str]) -> list[tuple[str, int]]:
    """query string → [(term, qtf)] sorted by term (deterministic;
    ref: ``Part C/searcher.py:38,69-72``). A pre-tokenized list is accepted
    verbatim so alternate front-ends (e.g. the tweet-mode parser in
    refbench.py) can feed every scorer without re-tokenizing."""
    counts: dict[str, int] = {}
    toks = query if isinstance(query, list) else tokenize_py(query)
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    return sorted(counts.items())


def _query_df(spark: SparkSession, query: str) -> DataFrame:
    terms = parse_query(query)
    if not terms:
        raise ValueError(f"query tokenized to nothing: {query!r}")
    return spark.createDataFrame(terms, "term string, qtf int")


def bm25_idf_col(n_docs: int):
    return F.log(1.0 + (float(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))


def bm25_score(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """OR-mode BM25: postings ⋈ query terms (broadcast) → per-doc Σ.
    Returns (doc_id, score) unsorted — compose with ``topk``.

    Join strategy at 100 TB: the query side and the query-term slice of the
    dictionary are O(|q|) rows → broadcast; postings side is filtered by the
    broadcast join *before* the doc-stats join, so only candidate docs'
    stats rows move.
    """
    qdf = _query_df(spark, query)
    qstats = F.broadcast(qdf.join(dict_df, "term"))  # |q| rows with df
    cand = tf_df.join(qstats, "term").join(stats_df.select("doc_id", "doc_len"), "doc_id")
    idf = bm25_idf_col(n_docs)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    per_term = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return _ordered_sum(cand, per_term)


def _ordered_sum(cand: DataFrame, per_term) -> DataFrame:
    """Per-doc Σ over query terms in sorted-term order → bit-stable scores
    across parallelism levels and bit-identical to the Python oracle
    (SURVEY.md §7 'rank determinism'). ≤|q| structs per doc, so the
    collect_list is tiny."""
    per = cand.select("doc_id", F.struct("term", per_term.alias("s")).alias("ts"))
    return per.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list("ts")),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )


def bm25_score_batch(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    queries: dict[str, str],
    n_docs: int,
    avgdl: float,
    k: int | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Batched BM25: score every query of a batch in ONE job —
    (query_id, doc_id, score[, rank]). The throughput shape for 100 TB: the
    postings scan, doc-stats join, and shuffle are amortized across the whole
    query batch instead of one Spark job per query; the query side stays a
    broadcast (|batch|·|q| rows). With ``k`` set, a per-query window row_number
    cut yields ranked top-k (W2/W4 batched)."""
    rows = [
        (qid, t, qtf) for qid, q in sorted(queries.items()) for t, qtf in parse_query(q)
    ]
    if not rows:
        raise ValueError("empty query batch")
    live = {qid for qid, _, _ in rows}
    dead = sorted(set(queries) - live)
    if dead:
        # a stopword-only query contributes no rows and would silently
        # VANISH from the batched output (indistinguishable from matching
        # nothing) — name it instead; callers drop or rewrite it
        raise ValueError(f"queries tokenized to nothing: {dead}")
    qdf = spark.createDataFrame(rows, "query_id string, term string, qtf int")
    qstats = F.broadcast(qdf.join(dict_df, "term"))
    cand = tf_df.join(qstats, "term").join(stats_df.select("doc_id", "doc_len"), "doc_id")
    idf = bm25_idf_col(n_docs)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    per_term = idf * (F.col("tf") * (k1 + 1.0)) / denom
    per = cand.select(
        "query_id", "doc_id", F.struct("term", per_term.alias("s")).alias("ts")
    )
    scored = per.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list("ts")), F.lit(0.0), lambda acc, x: acc + x["s"]
        ).alias("score")
    )
    if k is None:
        return scored
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def inner_product_score(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    n_docs: int,
) -> DataFrame:
    """R3: Σ over shared terms of doc tfidf · qtf, with the Part C weight
    tfidf = (tf/doc_len)·log2(N/df) (``Part C/indexer.py:66-67``,
    ``Part C/search_engine_1.py:87-106``)."""
    qdf = _query_df(spark, query)
    qstats = F.broadcast(qdf.join(dict_df, "term"))
    cand = tf_df.join(qstats, "term").join(stats_df.select("doc_id", "doc_len"), "doc_id")
    tfidf = (F.col("tf") / F.col("doc_len")) * F.log2(F.lit(float(n_docs)) / F.col("df"))
    return _ordered_sum(cand, tfidf * F.col("qtf"))


def doc_weights(tf_df: DataFrame, stats_df: DataFrame, dict_df: DataFrame, n_docs: int) -> DataFrame:
    """A5: per-doc Σ tfidf² (cosine denominator), ``Part C/search_engine_1.py:87-106``."""
    enriched = tf_df.join(dict_df, "term").join(stats_df.select("doc_id", "doc_len"), "doc_id")
    tfidf = (F.col("tf") / F.col("doc_len")) * F.log2(F.lit(float(n_docs)) / F.col("df"))
    return enriched.groupBy("doc_id").agg(F.sum(tfidf * tfidf).alias("doc_w2"))


def cosine_score(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    n_docs: int,
) -> DataFrame:
    """R4: inner / sqrt(doc_w2 · q_w2); q_w2 = Σ qtf² (``Part C/searcher.py:74-78``)."""
    inner = inner_product_score(spark, tf_df, stats_df, dict_df, query, n_docs)
    q_w2 = float(sum(qtf * qtf for _, qtf in parse_query(query)))
    w2 = doc_weights(tf_df, stats_df, dict_df, n_docs)
    return inner.join(w2, "doc_id").select(
        "doc_id",
        (F.col("score") / F.sqrt(F.col("doc_w2") * F.lit(q_w2))).alias("score"),
    )


def boolean_and(spark: SparkSession, tf_df: DataFrame, query: str) -> DataFrame:
    """Posting-list intersection (AND semantics — absent in the reference,
    required by the north rule; SURVEY.md §2.7): docs containing every
    distinct query term."""
    terms = [t for t, _ in parse_query(query)]
    qdf = F.broadcast(_query_df(spark, query).select("term"))
    return (
        tf_df.join(qdf, "term")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"))
        .filter(F.col("n_terms") == len(terms))
        .select("doc_id")
    )


def phrase_match_col(text_col, phrase_terms: list[str]):
    """Boolean column: the tokenized text contains ``phrase_terms`` ADJACENT
    and in order. Token-space substring via delimiter framing — pure
    Catalyst, reproducible in SQL, no UDF. The phrase capability the
    reference lacks (its parser discards order, SURVEY.md §2.2) but a
    complete engine needs; at scale this is the verification step over
    AND-candidates (boolean_and / WAND AND-mode), never a full scan."""
    from .tokenizer import tokenize_raw_expr

    # adjacency is over the FILTERED token stream, so stopwords between
    # phrase words do not break the phrase ("merge the sort" matches
    # "merge sort") — the classic stopword-tolerant phrase semantics.
    joined = F.concat(F.lit(" "), F.array_join(tokenize_raw_expr(text_col), " "), F.lit(" "))
    needle = " " + " ".join(phrase_terms) + " "
    return joined.contains(needle)


def phrase_topk(
    spark: SparkSession,
    corpus_df: DataFrame,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    phrase: str,
    n_docs: int,
    avgdl: float,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase top-k: filter docs containing the phrase (adjacency
    verify), BM25-score them on the phrase's terms, return (doc_id, score)
    top-k. Candidate generation composes with boolean_and upstream; here the
    verify+score runs in one job.

    Phrase order is preserved (tokenize_py, NOT parse_query — parse_query
    sorts terms, which silently turned "spark join" into the phrase
    "join spark"; caught by the positional-index identity test)."""
    terms = tokenize_py(phrase)
    if not terms:
        raise ValueError(f"phrase tokenized to nothing: {phrase!r}")
    matches = corpus_df.filter(phrase_match_col(F.col(text_col), terms)).select(
        F.col(id_col).alias("doc_id")
    )
    scored = bm25_score(spark, tf_df, stats_df, dict_df, " ".join(terms), n_docs, avgdl)
    return (
        scored.join(matches, "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_reference_score(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
    k1: float = 3.0,
    b: float = 0.6,
) -> DataFrame:
    """Reference-parity BM25 (R1, ``Part C/ranker.py:62-86``): postings carry
    *normalized* tf = raw_tf/doc_len (``Part C/indexer.py:66-75``),
    idf = log2(N/df), numerator = ntf·(ntf·(k+1)) [the reference's shipped
    formula, quirk included], k=3, b=0.6. avgdl here is the reference's avdl
    over raw doc lengths."""
    qdf = _query_df(spark, query)
    qstats = F.broadcast(qdf.join(dict_df, "term"))
    cand = tf_df.join(qstats, "term").join(stats_df.select("doc_id", "doc_len"), "doc_id")
    ntf = F.col("tf") / F.col("doc_len")
    idf = F.log2(F.lit(float(n_docs)) / F.col("df"))
    num = ntf * (ntf * (k1 + 1.0))
    den = ntf + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    return _ordered_sum(cand, idf * (num / den))


def blended_score_partc(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
) -> DataFrame:
    """R5 (``Part C/ranker.py:28-32``): 0.9·BM25_ref + 0.1·inner-product."""
    bm = bm25_reference_score(spark, tf_df, stats_df, dict_df, query, n_docs, avgdl)
    inner = inner_product_score(spark, tf_df, stats_df, dict_df, query, n_docs)
    return (
        bm.withColumnRenamed("score", "bm")
        .join(inner.withColumnRenamed("score", "ip"), "doc_id", "outer")
        .fillna(0.0)
        .select("doc_id", (0.9 * F.col("bm") + 0.1 * F.col("ip")).alias("score"))
    )


def blended_score_parta(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    n_docs: int,
) -> DataFrame:
    """R6+R8+R9 legacy Part A mode, faithful to the shipped code path:

      * index-time doc norm (``Part A/merger.py:68-81``): doc_w = Σ over the
        doc's terms of (0.8·tf/max_tf + 0.2·tf/doc_len)·idf, idf=log10(N/df),
        rounded to 3dp. (The reference rounds the RUNNING sum after every
        posting — iteration-order-dependent and thus not reproducible in a
        declarative engine; we round once at the end. It also calls this
        "doc_weight_squared" but never squares — quirk kept as shipped.)
      * query-time posting weight (``Part A/searcher.py:70``, R9):
        w = round(0.6·tf/max_tf + 0.4·tf/doc_len, 3)·idf — note the 3dp
        rounding happens BEFORE the idf multiply.
      * inner = Σ w·qtf; cosine = inner/sqrt(doc_w·Σqtf²)
        (``Part A/ranker.py:41-71``); score = 0.5·cosine + 0.5·inner
        (``Part A/ranker.py:22-27``).
    """
    qterms = parse_query(query)
    qdf = _query_df(spark, query)
    qstats = F.broadcast(qdf.join(dict_df, "term"))
    enriched = tf_df.join(dict_df, "term").join(
        stats_df.select("doc_id", "doc_len", "max_tf"), "doc_id"
    )
    idf = F.log10(F.lit(float(n_docs)) / F.col("df"))
    w_idx = (
        0.8 * (F.col("tf") / F.col("max_tf")) + 0.2 * (F.col("tf") / F.col("doc_len"))
    ) * idf
    doc_w = enriched.groupBy("doc_id").agg(F.round(F.sum(w_idx), 3).alias("doc_w"))
    cand = tf_df.join(qstats, "term").join(
        stats_df.select("doc_id", "doc_len", "max_tf"), "doc_id"
    )
    w_q = (
        F.round(
            0.6 * (F.col("tf") / F.col("max_tf")) + 0.4 * (F.col("tf") / F.col("doc_len")),
            3,
        )
        * F.log10(F.lit(float(n_docs)) / F.col("df"))
    )
    inner = _ordered_sum(cand, w_q * F.col("qtf")).withColumnRenamed("score", "ip")
    q_w2 = float(sum(qtf * qtf for _, qtf in qterms))
    return inner.join(doc_w, "doc_id").select(
        "doc_id",
        (
            0.5 * (F.col("ip") / F.sqrt(F.col("doc_w") * F.lit(q_w2))) + 0.5 * F.col("ip")
        ).alias("score"),
    )


def prf_expanded_terms(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str | list[str],
    n_docs: int,
    avgdl: float,
    k_docs: int = 10,
    m_terms: int = 5,
    beta: float = 0.4,
) -> list[tuple[str, float]]:
    """Pseudo-relevance-feedback expansion (Rocchio/RM-style): run the base
    BM25 query, pool the top ``k_docs`` documents' terms by
    Σ ntf·log10(N/df), and return the original terms at weight 1.0 plus the
    ``m_terms`` best NEW terms at weight ``beta``.

    The corpus-driven member of the §2.11 rewriter family (spell /
    thesaurus / embedding rewriters are query-side only — this one reads
    the collection). Determinism for the driver oracle: doc top-k ties
    break (score desc, doc_id asc); term ranking uses the pooled weight
    rounded to 6dp, ties (weight desc, term asc).

    Measured on the reference's real benchmark (BASELINE.md): recall +1pp,
    P@5/P@10 up ~1pp, MAP flat — tweet-length documents give PRF little to
    pool from; it is shipped as capability, not as a benchmark win."""
    base = bm25_score(spark, tf_df, stats_df, dict_df, query, n_docs, avgdl)
    # selection on the ROUNDED score (ties → doc_id asc) so the chosen
    # feedback set is engine-independent (same discipline as wand_topk)
    top = (
        base.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k_docs)
    )
    pooled = (
        tf_df.join(F.broadcast(top.select("doc_id")), "doc_id")
        .join(dict_df.select("term", "df"), "term")
        .join(stats_df.select("doc_id", "doc_len"), "doc_id")
        .groupBy("term")
        .agg(
            F.round(
                F.sum(
                    (F.col("tf") / F.col("doc_len"))
                    * F.log10(F.lit(float(n_docs)) / F.col("df"))
                ),
                6,
            ).alias("w")
        )
    )
    orig = [t for t, _ in parse_query(query)]
    new = (
        pooled.filter(~F.col("term").isin(orig))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(m_terms)
        .collect()
    )
    return [(t, 1.0) for t in orig] + [(r["term"], beta) for r in new]


def bm25_prf_score(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str | list[str],
    n_docs: int,
    avgdl: float,
    k_docs: int = 10,
    m_terms: int = 5,
    beta: float = 0.4,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 over the PRF-expanded weighted query: per-term score × its
    expansion weight, summed in ascending-term order. Two Spark jobs total
    (base top-k + pooled-term collect), then one scoring job — the same
    broadcast-candidate shape as ``bm25_score`` at any scale."""
    weighted = prf_expanded_terms(
        spark, tf_df, stats_df, dict_df, query, n_docs, avgdl, k_docs, m_terms, beta
    )
    return bm25_weighted_score(
        spark, tf_df, stats_df, dict_df, weighted, n_docs, avgdl, k1, b
    )


def bm25_weighted_score(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    weighted: list[tuple[str, float]],
    n_docs: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 over an explicitly WEIGHTED query ``[(term, w)]`` — the shared
    relational tail of every §2.11 rewriter (PRF pooling, thesaurus/WordNet
    synonym expansion at the 0.2 reference weight, spell rewrites): each
    term's BM25 contribution scales by its weight, summed per doc in
    sorted-term order (rank determinism). Same broadcast-query-side shape
    as ``bm25_score`` at any corpus size."""
    qdf = F.broadcast(
        spark.createDataFrame(sorted(weighted), "term string, w double").join(
            dict_df, "term"
        )
    )
    cand = tf_df.join(qdf, "term").join(stats_df.select("doc_id", "doc_len"), "doc_id")
    idf = bm25_idf_col(n_docs)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    per_term = F.col("w") * idf * (F.col("tf") * (k1 + 1.0)) / denom
    return _ordered_sum(cand, per_term)


def dynamic_k(n_candidates: int) -> int:
    """W3 (``Part C/ranker.py:38-40``): k=None → round(0.9·n_candidates)."""
    return round(0.9 * n_candidates)


def anomaly_cutoff(scored: DataFrame, n_std: float = 1.0) -> DataFrame:
    """W5 (``Part C/ranker_glove.py:181-202``): keep score > mean − n·std."""
    stats = scored.agg(F.avg("score").alias("m"), F.stddev_pop("score").alias("s")).collect()[0]
    if stats["m"] is None:  # empty match set — nothing to cut
        return scored
    thr = float(stats["m"]) - n_std * float(stats["s"] or 0.0)
    return scored.filter(F.col("score") > thr)


def topk(scored: DataFrame, k: int, round_dp: int | None = None) -> DataFrame:
    """W2: deterministic top-k — (score desc, doc_id asc) tie-break pinned
    (SURVEY.md §7 'rank determinism'). orderBy+limit plans
    TakeOrderedAndProject: bounded heap per partition, merged on the driver —
    no full sort, no full shuffle."""
    score = F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
    return (
        scored.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def py_bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


# ---------------------------------------------------------------------------
# Ranking extensions beyond the reference's scorer family: language-model
# smoothing, field collapsing, recency decay, and batched hit counting.
# These are the standard fulltext-engine surfaces (Lucene
# LMDirichletSimilarity, Elasticsearch `collapse`, function-score `exp`
# decay, `_count`) a user of any production index expects next to BM25.
# All stay pure column arithmetic — same 100 TB join shapes as bm25_score.
# ---------------------------------------------------------------------------

LM_MU = 2000.0


def lm_dirichlet_score(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    total_cf: int,
    mu: float = LM_MU,
) -> DataFrame:
    """Query-likelihood scoring with Dirichlet smoothing (Lucene
    ``LMDirichletSimilarity`` form, matched-terms-only with the per-term
    clamp to ≥0):

        score(q, d) = Σ_t qtf · max(0, ln(1 + tf/(μ·cf_t/C)) + ln(μ/(dl+μ)))

    ``total_cf`` is C = Σ cf over the dictionary (total token count) — a
    scalar computed once per corpus, broadcast into the expression. Join
    shape is identical to ``bm25_score``: |q|-row broadcast against the
    postings, stats joined only for candidate docs."""
    qdf = _query_df(spark, query)
    qstats = F.broadcast(qdf.join(dict_df, "term"))
    cand = tf_df.join(qstats, "term").join(stats_df.select("doc_id", "doc_len"), "doc_id")
    p_c = F.col("cf") / F.lit(float(total_cf))
    per_term = F.col("qtf") * F.greatest(
        F.lit(0.0),
        F.log(1.0 + F.col("tf") / (mu * p_c)) + F.log(F.lit(mu) / (F.col("doc_len") + mu)),
    )
    return _ordered_sum(cand, per_term)


LM_LAMBDA = 0.1  # Lucene LMJelinekMercerSimilarity default for short queries


def lm_jelinek_mercer_score(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    total_cf: int,
    lam: float = LM_LAMBDA,
) -> DataFrame:
    """Query-likelihood with Jelinek-Mercer smoothing (Lucene
    ``LMJelinekMercerSimilarity``, matched-terms-only):

        score(q, d) = Σ_t qtf · ln(1 + ((1−λ)·tf/dl) / (λ·cf_t/C))

    λ interpolates the document model with the corpus model: small λ
    (0.1, Lucene's short-query default) trusts the document; larger λ
    (~0.7) suits long queries. Always ≥ 0 — no clamp needed, unlike the
    Dirichlet form. Join shape identical to ``bm25_score``: |q|-row
    broadcast, stats joined only for candidates."""
    if not 0.0 < lam < 1.0:
        raise ValueError("lambda must be in (0, 1)")
    qdf = _query_df(spark, query)
    qstats = F.broadcast(qdf.join(dict_df, "term"))
    cand = tf_df.join(qstats, "term").join(stats_df.select("doc_id", "doc_len"), "doc_id")
    p_c = F.col("cf") / F.lit(float(total_cf))
    per_term = F.col("qtf") * F.log(
        1.0 + ((1.0 - lam) * F.col("tf") / F.col("doc_len")) / (lam * p_c)
    )
    return _ordered_sum(cand, per_term)


def collapse_topk(
    scored: DataFrame,
    docs_df: DataFrame,
    group_col: str,
    k: int,
    round_dp: int | None = None,
) -> DataFrame:
    """Field collapsing (Elasticsearch ``collapse``, Solr ``group.main``):
    keep only the single best doc per ``group_col`` value, then global
    top-k. Returns (group, doc_id, score).

    Plan at 100 TB: the window partitions by the collapse key — one shuffle
    on a key whose cardinality (hosts, langs, sources) is far below doc
    count, then TakeOrderedAndProject for the final k. No join back to the
    full corpus: only candidate docs' metadata rows move (scored is already
    |candidates|-sized)."""
    from pyspark.sql import Window

    score = F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
    joined = scored.select("doc_id", score.alias("score")).join(
        docs_df.select("doc_id", F.col(group_col).alias("grp")), "doc_id"
    )
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("grp").alias(group_col), "doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def collapse_inner_hits(
    scored: DataFrame,
    docs_df: DataFrame,
    group_col: str,
    k: int,
    inner_size: int = 3,
    round_dp: int | None = None,
) -> DataFrame:
    """Field collapsing WITH ``inner_hits`` (the full Elasticsearch
    ``collapse`` response shape): the top ``k`` GROUPS ranked by their best
    doc, each carrying up to ``inner_size`` of its own best docs. Output
    (group, doc_id, score, inner_rank) — inner_rank 1 is the group's
    headline hit, exactly `collapse_topk`'s row.

    Same plan spine as ``collapse_topk`` (one window shuffle on the
    collapse key over the |candidates| frame) plus a broadcast semi-join
    of the ≤k winning group keys back onto the ranked rows — inner hits
    never widen the shuffle, they only deepen the per-group cut."""
    from pyspark.sql import Window

    if inner_size < 1:
        raise ValueError("inner_size must be >= 1")
    score = F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
    joined = scored.select("doc_id", score.alias("score")).join(
        docs_df.select("doc_id", F.col(group_col).alias("grp")), "doc_id"
    )
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = joined.withColumn("inner_rank", F.row_number().over(w)).filter(
        F.col("inner_rank") <= inner_size
    )
    top_groups = (
        ranked.filter(F.col("inner_rank") == 1)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("grp")
    )
    return (
        ranked.join(F.broadcast(top_groups), "grp")
        .select(
            F.col("grp").alias(group_col),
            "doc_id",
            "score",
            F.col("inner_rank").cast("long").alias("inner_rank"),
        )
    )


def parent_topk(
    scored: DataFrame,
    docs_df: DataFrame,
    parent_col: str,
    k: int,
    score_mode: str = "max",
    round_dp: int | None = None,
) -> DataFrame:
    """Parent-entity ranking (Elasticsearch ``has_child`` score modes /
    Lucene join): rank PARENT values (repo, host, source) by aggregating
    their matching children's scores — ``max`` | ``sum`` | ``avg`` over
    matching children only — returning (parent, score, n_children).
    Complements ``collapse_topk`` (best child per parent) by returning the
    parent itself with sum/avg semantics collapse can't express.

    Plan at 100 TB: ``scored`` is |candidates|-sized, so the join moves
    only candidate metadata; the aggregation shuffles on the parent key
    (cardinality ≪ doc count, map-side partial agg) and the final k is
    TakeOrderedAndProject. Per-child scores are rounded BEFORE the agg so
    rank decisions are engine-independent, and the aggregate is rounded
    again after."""
    if score_mode not in ("max", "sum", "avg"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    score = (
        F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
    )
    joined = scored.select("doc_id", score.alias("score")).join(
        docs_df.select("doc_id", F.col(parent_col).alias("parent")), "doc_id"
    )
    agg = {"max": F.max, "sum": F.sum, "avg": F.avg}[score_mode]("score")
    if round_dp is not None:
        agg = F.round(agg, round_dp)
    return (
        joined.groupBy("parent")
        .agg(agg.alias("score"), F.count(F.lit(1)).alias("n_children"))
        .select(F.col("parent").alias(parent_col), "score", "n_children")
        .orderBy(F.desc("score"), F.asc(parent_col))
        .limit(k)
    )


def top_hits(
    scored: DataFrame,
    docs_df: DataFrame,
    group_col: str,
    n_hits: int,
    round_dp: int | None = None,
) -> DataFrame:
    """Top-hits-per-group aggregation (Elasticsearch ``top_hits`` inside a
    ``terms`` bucket): for every value of ``group_col``, the ``n_hits``
    best-scoring matching docs. Generalizes ``collapse_topk`` (which is
    n_hits=1 + global top-k) — here EVERY group returns its leaders, the
    "show me the best 3 hits per language/source/host" surface.

    Plan at 100 TB: identical shape to collapsing — scored is already
    |candidates|-sized, one shuffle partitions by the (low-cardinality)
    group key, and row_number + filter keeps n_hits per group, so the
    output is |groups|·n_hits rows; nothing global is sorted. Returns
    (group, doc_id, score, hit_rank)."""
    from pyspark.sql import Window

    score = F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
    joined = scored.select("doc_id", score.alias("score")).join(
        docs_df.select("doc_id", F.col(group_col).alias("grp")), "doc_id"
    )
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("hit_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("hit_rank") <= n_hits)
        .select(F.col("grp").alias(group_col), "doc_id", "score", "hit_rank")
    )


def recency_blend(
    scored: DataFrame,
    age_df: DataFrame,
    half_life: float,
    round_dp: int | None = None,
) -> DataFrame:
    """Exponential time-decay blend (Elasticsearch function-score ``exp``
    decay): blended = score · exp(−ln2 · age/half_life), so a doc one
    half-life old scores half its text relevance. ``age_df`` is
    (doc_id, age) in any unit consistent with ``half_life``.

    The decay is a deterministic column product — no extra shuffle beyond
    the (candidate-sized) join with the age column. Docs with NO age row
    keep their undecayed score (LEFT join — ES treats a missing field as
    non-decaying; an inner join would make a score MODIFIER silently
    shrink the match set, the bug authority_blend's left join avoids)."""
    lam = math.log(2.0) / float(half_life)
    blended = F.col("score") * F.exp(
        -F.lit(lam) * F.coalesce(F.col("age"), F.lit(0.0))
    )
    out = F.round(blended, round_dp) if round_dp is not None else blended
    return scored.join(age_df, "doc_id", "left").select(
        "doc_id", out.alias("score")
    )


def authority_blend(
    scored: DataFrame,
    ranks: DataFrame,
    weight: float = 0.5,
    round_dp: int | None = None,
) -> DataFrame:
    """Static-authority blend (the web-search PageRank signal as a
    function-score): blended = score · (1 + weight · rank/max_rank), so
    the most authoritative doc gets up to (1+weight)× its text relevance
    and authority can reorder only score-close docs. ``ranks`` is
    (node, rank) from ``ops.graph.pagerank``; docs absent from the graph
    blend with authority 0 (left join).

    One scalar max agg + a candidate-sized broadcast-friendly join — no
    shuffle of the scored side beyond the join itself."""
    max_rank = ranks.agg(F.max("rank")).collect()[0][0] or 1.0
    r = ranks.select(
        F.col("node").alias("doc_id"),
        (F.col("rank") / F.lit(max_rank)).alias("_auth"),
    )
    blended = F.col("score") * (
        1.0 + F.lit(float(weight)) * F.coalesce(F.col("_auth"), F.lit(0.0))
    )
    out = F.round(blended, round_dp) if round_dp is not None else blended
    return scored.join(r, "doc_id", "left").select("doc_id", out.alias("score"))


def hit_counts(
    spark: SparkSession,
    tf_df: DataFrame,
    queries: dict[str, str],
) -> DataFrame:
    """Total-hits counting (Elasticsearch ``_count`` / Lucene
    ``TotalHitCountCollector``) for a whole query batch in ONE job:
    (query_id, or_hits, and_hits). or_hits = docs matching ≥1 term;
    and_hits = docs matching every query term (conjunctive). A query with
    out-of-vocabulary terms still counts OR hits but has and_hits = 0,
    matching the engine's conjunctive OOV rule (query/wand.py).

    One broadcast join + one (query_id, doc_id) aggregation — the count
    never materializes per-doc rows on the driver."""
    rows = [
        (qid, t, len(parse_query(q)))
        for qid, q in sorted(queries.items())
        for t, _ in parse_query(q)
    ]
    if not rows:
        raise ValueError("empty query batch")
    qdf = F.broadcast(
        spark.createDataFrame(rows, "query_id string, term string, n_terms int")
    )
    per_doc = (
        tf_df.join(qdf, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("matched"), F.first("n_terms").alias("n_terms"))
    )
    counted = per_doc.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("or_hits"),
        F.sum(F.when(F.col("matched") == F.col("n_terms"), 1).otherwise(0)).alias(
            "and_hits"
        ),
    )
    # a query whose terms are ALL out-of-vocabulary (or stopword-only)
    # contributes no per_doc rows — a _count surface must report (0, 0),
    # not silently drop the query_id from the output
    spark2 = qdf.sparkSession
    all_q = spark2.createDataFrame(
        [(qid,) for qid in sorted(queries)], "query_id string"
    )
    return all_q.join(counted, "query_id", "left").select(
        "query_id",
        F.coalesce("or_hits", F.lit(0)).cast("long").alias("or_hits"),
        F.coalesce("and_hits", F.lit(0)).cast("long").alias("and_hits"),
    )


def terms_set_score(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    required_df: DataFrame,
    n_docs: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """ES ``terms_set`` query: a doc matches iff it contains at least
    ``m(doc)`` DISTINCT query terms, where m comes from a PER-DOC numeric
    field (``minimum_should_match_field``) — the dynamic-threshold
    generalization of ``min_should_match`` (whose constant-m form runs
    index-natively in the kernels; the per-doc form is inherently a
    metadata join, so it lives on the relational scorer).

    ``required_df``: (doc_id, required). ES semantics kept exactly:
      * docs absent from ``required_df`` (missing field) never match
        (the inner join below),
      * ``required <= 0`` matches on any single term (clamped to 1 —
        a conjunction over zero terms is vacuous; ES behaves the same
        because a doc reaches the scorer only via ≥1 posting),
      * ``required > |query terms|`` can never match (no clamp-down —
        ES documents this foot-gun and we reproduce it).
    Score of a surviving doc = its plain BM25 OR score.

    Plan shape: the matched-count aggregation and the BM25 sum run over
    the SAME broadcast-filtered candidate frame (one shuffle on doc_id);
    ``required_df`` joins the post-aggregation doc-level frame — at 100 TB
    that is |candidates| rows against the metadata table on the doc_id
    key, never a row-level blowup."""
    qdf = _query_df(spark, query)
    qstats = F.broadcast(qdf.join(dict_df, "term"))
    cand = tf_df.join(qstats, "term").join(
        stats_df.select("doc_id", "doc_len"), "doc_id"
    )
    idf = bm25_idf_col(n_docs)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    per_term = idf * (F.col("tf") * (k1 + 1.0)) / denom
    # _ordered_sum's sorted-term accumulation (bit-stable across
    # parallelism levels), widened with the distinct-match count
    per = cand.select(
        "doc_id", "term", F.struct("term", per_term.alias("s")).alias("ts")
    )
    scored = per.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list("ts")),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score"),
        F.count_distinct("term").alias("matched"),
    )
    req = required_df.select(
        "doc_id", F.greatest(F.col("required"), F.lit(1)).alias("required")
    )
    return scored.join(req, "doc_id").filter(
        F.col("matched") >= F.col("required")
    ).select("doc_id", "score")


# --------------------------------------------------------- function_score
_FS_MODIFIERS = ("none", "ln1p", "sqrt", "square", "reciprocal")


def _fs_cond(flt: "dict | None"):
    """Metadata-predicate filter of one score function (filter context):
    {"field": f} with any of eq / gte / lte. None matches every doc."""
    cond = F.lit(True)
    if flt is None:
        return cond
    col = F.col(flt["field"])
    if "eq" in flt:
        cond = cond & (col == flt["eq"])
    if "gte" in flt:
        cond = cond & (col >= flt["gte"])
    if "lte" in flt:
        cond = cond & (col <= flt["lte"])
    return cond


def _decay_consts(dc: dict) -> tuple[str, float, float, float, float]:
    """Validate a decay spec and precompute its driver-side constants —
    shared by the Column builder and the SQL twin so both engines evaluate
    the exact same float expression."""
    import math

    typ = dc.get("type", "gauss")
    scale = float(dc["scale"])
    decay = float(dc.get("decay", 0.5))
    if scale <= 0:
        raise ValueError("decay scale must be > 0")
    if not 0.0 < decay < 1.0:
        raise ValueError("decay must be in (0, 1)")
    origin = float(dc["origin"])
    offset = float(dc.get("offset", 0.0))
    if typ == "gauss":
        c = 2.0 * (-scale * scale / (2.0 * math.log(decay)))  # 2σ²
    elif typ == "exp":
        c = math.log(decay) / scale  # λ
    elif typ == "linear":
        c = scale / (1.0 - decay)  # s'
    else:
        raise ValueError(
            f"unknown decay type {typ!r} (supported: gauss, exp, linear)"
        )
    return typ, origin, offset, c, decay


def _fs_value(fn: dict):
    """One function's per-doc value column: a bare {"weight": w} constant,
    field_value_factor = modifier(factor · coalesce(field, missing)) · w,
    or a decay function {"decay": {type, field, origin, scale, offset,
    decay, missing}} — the three ES shapes on numeric distance
    d = max(0, |value − origin| − offset):

      gauss   exp(−d² / 2σ²),  σ² = −scale²/(2·ln(decay))
      exp     exp(λ·d),        λ  = ln(decay)/scale
      linear  max((s' − d)/s', 0),  s' = scale/(1 − decay)

    so the value is 1 at the origin(±offset) and exactly ``decay`` at
    ``scale`` away — ES's contract. ``missing`` defaults to the origin
    (a doc without the field decays not at all rather than vanishing;
    pass missing=∞-like values to invert that).

    The modifier set is pinned (ln1p is the NATURAL log — documented
    deviation from ES's log10 'log1p', chosen to match the engine's other
    ln-based scorers)."""
    w = float(fn.get("weight", 1.0))
    if "decay" in fn:
        dc = fn["decay"]
        typ, origin, offset, c, _ = _decay_consts(dc)
        raw = F.coalesce(
            F.col(dc["field"]).cast("double"),
            F.lit(float(dc.get("missing", origin))),
        )
        dist = F.greatest(F.abs(raw - F.lit(origin)) - F.lit(offset), F.lit(0.0))
        if typ == "gauss":
            x = F.exp(-(dist * dist) / F.lit(c))
        elif typ == "exp":
            x = F.exp(F.lit(c) * dist)
        else:
            x = F.greatest((F.lit(c) - dist) / F.lit(c), F.lit(0.0))
        return x * F.lit(w)
    if "field_value_factor" not in fn:
        return F.lit(w)
    fvf = fn["field_value_factor"]
    raw = F.coalesce(
        F.col(fvf["field"]).cast("double"),
        F.lit(float(fvf.get("missing", 1.0))),
    )
    x = raw * F.lit(float(fvf.get("factor", 1.0)))
    mod = fvf.get("modifier", "none")
    if mod == "ln1p":
        x = F.log(x + F.lit(1.0))
    elif mod == "sqrt":
        x = F.sqrt(x)
    elif mod == "square":
        x = x * x
    elif mod == "reciprocal":
        x = F.lit(1.0) / x
    elif mod != "none":
        raise ValueError(f"unknown modifier {mod!r} (supported: {_FS_MODIFIERS})")
    return x * F.lit(w)


def function_score(
    scored: DataFrame,
    metadata: DataFrame,
    functions: list[dict],
    score_mode: str = "sum",
    boost_mode: str = "multiply",
    round_dp: int = 5,
) -> DataFrame:
    """Elasticsearch ``function_score``: modify query relevance with
    per-doc functions — filter-gated constant weights and
    field_value_factor transforms of a metadata column — combined by
    ``score_mode`` (sum | multiply | max over the MATCHING functions) and
    folded into the query score by ``boost_mode`` (multiply | sum |
    replace). A doc matching NO function keeps its query score unchanged
    (boost-neutral, every boost_mode).

    Determinism contract: each matching function's value rounds to
    ``round_dp`` before the combine, the combined fscore rounds again, and
    the boosted result rounds once more — the same per-node discipline as
    the bool DSL, so a SQL twin built by ``function_score_sql`` aligns
    bit-for-bit. For hash-checked entries prefer boost_mode="sum" and
    even-digit weights (sums of 5dp decimals never create a 6th decimal;
    products can — see boolquery's tie_breaker note).

    Plan at 100 TB: ``scored`` is |candidates|-sized, so the single LEFT
    join moves only candidate metadata rows; every function is then a
    stateless column expression on that one joined frame — |functions|
    never adds jobs, joins, or shuffles."""
    if score_mode not in ("sum", "multiply", "max"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    if boost_mode not in ("multiply", "sum", "replace"):
        raise ValueError(f"unknown boost_mode {boost_mode!r}")
    if not functions:
        raise ValueError("functions must hold ≥1 score function")
    j = scored.join(metadata, "doc_id", "left")
    conds = [_fs_cond(fn.get("filter")) for fn in functions]
    vals = [F.round(_fs_value(fn), round_dp) for fn in functions]
    matched = conds[0]
    for c in conds[1:]:
        matched = matched | c
    if score_mode == "sum":
        fs = F.lit(0.0)
        for c, v in zip(conds, vals):
            fs = fs + F.when(c, v).otherwise(F.lit(0.0))
    elif score_mode == "multiply":
        fs = F.lit(1.0)
        for c, v in zip(conds, vals):
            fs = fs * F.when(c, v).otherwise(F.lit(1.0))
    else:  # max — greatest() skips non-matching NULLs
        parts = [F.when(c, v) for c, v in zip(conds, vals)]
        fs = parts[0] if len(parts) == 1 else F.greatest(*parts)
    fs = F.round(fs, round_dp)
    if boost_mode == "multiply":
        boosted = F.col("score") * fs
    elif boost_mode == "sum":
        boosted = F.col("score") + fs
    else:
        boosted = fs
    out = F.when(matched, F.round(boosted, round_dp)).otherwise(F.col("score"))
    return j.select("doc_id", out.alias("score"))


def function_score_sql(
    base_sql: str,
    meta_table: str,
    functions: list[dict],
    score_mode: str = "sum",
    boost_mode: str = "multiply",
    round_dp: int = 5,
) -> str:
    """DuckDB twin of ``function_score`` over a (doc_id, score) base
    subquery — filter conditions, value expressions, rounding points, and
    the no-match passthrough mirrored branch for branch."""

    def cond_sql(flt):
        if flt is None:
            return "TRUE"
        conds = []
        if "eq" in flt:
            conds.append(f"m.{flt['field']} = {flt['eq']!r}")
        if "gte" in flt:
            conds.append(f"m.{flt['field']} >= {flt['gte']!r}")
        if "lte" in flt:
            conds.append(f"m.{flt['field']} <= {flt['lte']!r}")
        return " AND ".join(conds) or "TRUE"

    def value_sql(fn):
        w = float(fn.get("weight", 1.0))
        if "decay" in fn:
            dc = fn["decay"]
            typ, origin, offset, c, _ = _decay_consts(dc)
            raw = (
                f"coalesce(m.{dc['field']}::DOUBLE, "
                f"{float(dc.get('missing', origin))!r})"
            )
            dist = f"greatest(abs(({raw}) - {origin!r}) - {offset!r}, 0.0)"
            if typ == "gauss":
                x = f"exp(-(({dist}) * ({dist})) / {c!r})"
            elif typ == "exp":
                x = f"exp({c!r} * ({dist}))"
            else:
                x = f"greatest(({c!r} - ({dist})) / {c!r}, 0.0)"
            return f"({x}) * {w!r}"
        if "field_value_factor" not in fn:
            return f"{w!r}"
        fvf = fn["field_value_factor"]
        x = (
            f"coalesce(m.{fvf['field']}::DOUBLE, {float(fvf.get('missing', 1.0))!r})"
            f" * {float(fvf.get('factor', 1.0))!r}"
        )
        mod = fvf.get("modifier", "none")
        if mod == "ln1p":
            x = f"ln(({x}) + 1.0)"
        elif mod == "sqrt":
            x = f"sqrt({x})"
        elif mod == "square":
            x = f"({x}) * ({x})"
        elif mod == "reciprocal":
            x = f"1.0 / ({x})"
        return f"({x}) * {w!r}"

    conds = [cond_sql(fn.get("filter")) for fn in functions]
    vals = [f"round({value_sql(fn)}, {round_dp})" for fn in functions]
    matched = " OR ".join(f"({c})" for c in conds)
    if score_mode == "sum":
        fs = " + ".join(
            f"CASE WHEN {c} THEN {v} ELSE 0.0 END" for c, v in zip(conds, vals)
        )
    elif score_mode == "multiply":
        fs = " * ".join(
            f"CASE WHEN {c} THEN {v} ELSE 1.0 END" for c, v in zip(conds, vals)
        )
    else:
        fs = "greatest(" + ", ".join(
            f"CASE WHEN {c} THEN {v} END" for c, v in zip(conds, vals)
        ) + ")" if len(vals) > 1 else f"CASE WHEN {conds[0]} THEN {vals[0]} END"
    fs = f"round({fs}, {round_dp})"
    if boost_mode == "multiply":
        boosted = f"b.score * {fs}"
    elif boost_mode == "sum":
        boosted = f"b.score + {fs}"
    else:
        boosted = fs
    return f"""
SELECT b.doc_id,
       CASE WHEN {matched} THEN round({boosted}, {round_dp}) ELSE b.score END AS score
FROM ({base_sql}) b LEFT JOIN {meta_table} m USING (doc_id)"""


def _rank_feature_col(feat, function: str, pivot: float, scaling: float, exponent: float):
    """The three ES rank_feature value functions over a non-negative
    feature column (ES: `rank_feature` query, feature S):

    * saturation: S / (S + pivot)           (default; bounded in [0, 1))
    * log:        ln(scaling + S)
    * sigmoid:    S^exp / (S^exp + pivot^exp)
    """
    s = feat.cast("double")
    if function == "saturation":
        return s / (s + F.lit(float(pivot)))
    if function == "log":
        return F.log(F.lit(float(scaling)) + s)
    if function == "sigmoid":
        num = F.pow(s, F.lit(float(exponent)))
        return num / (num + F.lit(float(pivot) ** float(exponent)))
    raise ValueError(f"unknown rank_feature function {function!r}")


def rank_feature(
    scored: DataFrame,
    metadata: DataFrame,
    field: str,
    function: str = "saturation",
    boost: float = 1.0,
    pivot: float = 1.0,
    scaling: float = 1.0,
    exponent: float = 1.0,
    missing: float = 0.0,
    round_dp: int = 5,
) -> DataFrame:
    """Elasticsearch ``rank_feature`` as a bool-should clause: the query
    score PLUS boost·fn(feature) — static per-doc signals (pagerank,
    freshness, length priors) folded into relevance without rescoring.
    Unlike ``function_score`` (arbitrary filter-gated arithmetic), the
    rank_feature functions are monotone and bounded, so the boost can
    never invert the relevance order between docs with equal features.

    Determinism contract mirrors function_score: the feature value rounds
    at ``round_dp`` before the add, the sum rounds once more — the SQL twin
    (``rank_feature_sql``) aligns bit-for-bit for saturation (division
    only); log/sigmoid involve libm and are pytest-verified instead.

    Plan at 100 TB: one LEFT join of candidate-sized ``scored`` against the
    feature column (broadcast when the candidate set is small), then pure
    column exprs — no shuffle beyond the join."""
    feat = F.coalesce(F.col(field).cast("double"), F.lit(float(missing)))
    val = F.round(
        F.lit(float(boost)) * _rank_feature_col(feat, function, pivot, scaling, exponent),
        round_dp,
    )
    j = scored.join(metadata.select("doc_id", field), "doc_id", "left")
    return j.select(
        "doc_id", F.round(F.col("score") + val, round_dp).alias("score")
    )


def rank_feature_sql(
    base_sql: str,
    meta_table: str,
    field: str,
    function: str = "saturation",
    boost: float = 1.0,
    pivot: float = 1.0,
    scaling: float = 1.0,
    exponent: float = 1.0,
    missing: float = 0.0,
    round_dp: int = 5,
) -> str:
    """DuckDB twin of ``rank_feature`` — same functions, same rounding
    points."""
    s = f"coalesce(m.{field}::DOUBLE, {float(missing)!r})"
    if function == "saturation":
        v = f"({s}) / (({s}) + {float(pivot)!r})"
    elif function == "log":
        v = f"ln({float(scaling)!r} + ({s}))"
    elif function == "sigmoid":
        num = f"pow({s}, {float(exponent)!r})"
        v = f"({num}) / (({num}) + {float(pivot) ** float(exponent)!r})"
    else:
        raise ValueError(f"unknown rank_feature function {function!r}")
    val = f"round({float(boost)!r} * ({v}), {round_dp})"
    return f"""
SELECT b.doc_id, round(b.score + {val}, {round_dp}) AS score
FROM ({base_sql}) b LEFT JOIN {meta_table} m USING (doc_id)"""


def random_score(
    scored: DataFrame,
    seed: int = 0,
    weight: float = 1.0,
    boost_mode: str = "sum",
    round_dp: int = 5,
) -> DataFrame:
    """Elasticsearch ``function_score`` ``random_score`` with a seed:
    a DETERMINISTIC per-doc uniform [0, 1) — md5(doc_id:seed), the same
    engine-portable unit hash the sampling ops use — folded into the query
    score (``sum`` jitters ties apart for exploration; ``replace`` gives a
    seeded random shuffle of the match set). Reproducible across runs,
    partitionings, and engines — unlike ``F.rand(seed)``, whose draw
    depends on the physical partition index, this survives AQE re-plans
    and executor loss at 100 TB."""
    from .ops.sampling import hash_unit

    if boost_mode not in ("sum", "multiply", "replace"):
        raise ValueError(f"unknown boost_mode {boost_mode!r}")
    r = F.round(F.lit(float(weight)) * hash_unit(F.col("doc_id"), seed), round_dp)
    if boost_mode == "sum":
        out = F.col("score") + r
    elif boost_mode == "multiply":
        out = F.col("score") * r
    else:
        out = r
    return scored.select("doc_id", F.round(out, round_dp).alias("score"))


def random_score_sql(
    base_sql: str,
    seed: int = 0,
    weight: float = 1.0,
    boost_mode: str = "sum",
    round_dp: int = 5,
) -> str:
    """DuckDB twin of ``random_score`` — identical md5 unit-hash arithmetic."""
    from .ops.sampling import _hash_unit_sql

    r = f"round({float(weight)!r} * ({_hash_unit_sql('b.doc_id', seed)}), {round_dp})"
    if boost_mode == "sum":
        out = f"b.score + {r}"
    elif boost_mode == "multiply":
        out = f"b.score * {r}"
    else:
        out = r
    return f"""
SELECT b.doc_id, round({out}, {round_dp}) AS score
FROM ({base_sql}) b"""


PIN_BASE = 1.0e9  # far above any BM25 score; position-decremented per pin


def pinned_topk(
    spark: SparkSession,
    scored: DataFrame,
    pinned_ids: list[int],
    k: int,
    valid_docs: DataFrame | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Elasticsearch ``pinned`` query: the given doc ids are promoted above
    every organic result IN THE GIVEN ORDER (first pin outranks the rest),
    organic results fill the remaining slots by relevance. Scores follow
    ES's scheme — pins get a constant far above the organic range,
    decremented by pin position — so one ORDER BY serves both segments.

    A pinned doc that also matches organically appears ONCE, at its pinned
    position (the anti-join drops its organic row). ``valid_docs``
    (optional, any frame with doc_id) drops pins that don't exist in the
    corpus — ES silently skips unknown ids the same way.

    Plan: the pin list is a |pins|-row literal frame (broadcast),
    organic = scored LEFT ANTI pins, union, TakeOrderedAndProject — no
    extra shuffle over plain top-k."""
    if not pinned_ids:
        raise ValueError("pinned_ids must hold ≥1 doc id")
    if len(set(pinned_ids)) != len(pinned_ids):
        raise ValueError("pinned_ids must be distinct")
    pins = spark.createDataFrame(
        [(int(d), i) for i, d in enumerate(pinned_ids)], "doc_id long, pos int"
    )
    if valid_docs is not None:
        pins = pins.join(valid_docs.select("doc_id"), "doc_id", "left_semi")
    pin_rows = pins.select(
        "doc_id", F.round(F.lit(PIN_BASE) - F.col("pos"), round_dp).alias("score")
    )
    organic = scored.join(F.broadcast(pins.select("doc_id")), "doc_id", "left_anti")
    organic = organic.select("doc_id", F.round("score", round_dp).alias("score"))
    return topk(pin_rows.unionByName(organic), k)


def has_parent_topk(
    parent_scored: DataFrame,
    docs_df: DataFrame,
    parent_col: str,
    k: int,
    score: bool = True,
    round_dp: int | None = None,
) -> DataFrame:
    """Elasticsearch ``has_parent``: return CHILD docs whose parent entity
    matches a parent-level query, each child inheriting its parent's score
    (``score=True``) or a constant 0.0 (``score=False``, ES's default
    filter semantics). The inverse direction of ``parent_topk``
    (has_child): there children elect parents; here parent relevance
    fans OUT to children.

    ``parent_scored``: (parent_col, score) — typically ``parent_topk``
    output or any parent-level scoring. Plan: parent side is small
    (entity cardinality ≪ docs) → broadcast join against the child table,
    TakeOrderedAndProject for the cut; the child table is touched once,
    no shuffle on it."""
    pscore = (
        F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
    )
    parents = parent_scored.select(
        F.col(parent_col).alias("parent"),
        (pscore if score else F.lit(0.0)).alias("score"),
    )
    children = docs_df.select(
        "doc_id", F.col(parent_col).alias("parent")
    ).join(F.broadcast(parents), "parent")
    return (
        children.select("doc_id", F.col("parent").alias(parent_col), "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
