"""Driver-contract query definitions: paired (Spark callable, DuckDB oracle
SQL) per implemented operator from SURVEY.md §2 plus the training-data
pipeline ops. Consumed by /root/repo/__spark_entry__.py.

Column names and rounding are pinned identically on both sides: the driver
sorts columns by name and hashes values, so every computed column is aliased
the same way in the DataFrame code and the SQL.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops import classify, dedup, multimodal, packing, similarity, sketch, termstats, textstats
from .postings import dictionary, doc_stats, term_frequencies
from .scoring import (
    bm25_score,
    bm25_score_batch,
    boolean_and,
    cosine_score,
    inner_product_score,
    parse_query,
)
from .tokenizer import STOPWORDS, TOKEN_PATTERN, duckdb_tokens_cte, tokenize_raw_expr
from .tweetparser import entity_tokens_sql

ROUND_DP = 5

BM25_QUERY = "spark join stream"
INNER_QUERY = "hash merge sort table"
COSINE_QUERY = "window group order"
AND_QUERY = "hash merge sort"
BATCH_QUERIES = {
    "q01": BM25_QUERY,
    "q02": INNER_QUERY,
    "q03": COSINE_QUERY,
    "q04": "customer order line",
}
BATCH_K = 10

_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


def _term_normalization_sql() -> str:
    from .lemma import lemma_sql_case
    from .stemming import stem_sql_case

    words = ", ".join(
        f"('{w}')" for line in NORMALIZATION_FIXTURE for w in line.split()
    )
    return f"""
SELECT term,
       {stem_sql_case('term')} AS stem,
       {lemma_sql_case('term')} AS lemma
FROM (SELECT DISTINCT term FROM (
  SELECT term FROM ({_TF_SQL})
  UNION ALL SELECT * FROM (VALUES {words}) fx(term)))
"""


def _tmpdir(prefix: str) -> str:
    """mkdtemp + registered cleanup — driver runs no longer leak temp state
    (each correctness run used to leave 4+ orphaned index/stream dirs)."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


_SHARED_INDEX: dict[tuple[str, bool], str] = {}


def _shared_index(spark: SparkSession, sf_dir: str, positional: bool = False):
    """ONE index build per (sf_dir, positional) per process, shared by every
    segment-path entry (wand_topk / wand_batch_topk / phrase_index_topk) —
    a driver correctness run used to rebuild the same index three times."""
    from .query.engine import SearchEngine

    key = (sf_dir, positional)
    path = _SHARED_INDEX.get(key)
    if path is None:
        path = _tmpdir("seidx_shared_") + "/idx"
        eng = SearchEngine(spark, path)
        eng.build_index_from_df(
            _docs(spark, sf_dir), id_col="doc_id", text_col="text",
            range_bits=3, n_buckets=8, with_positions=positional,
            store_source=True,  # exercised by search_fetch_topk
        )
        _SHARED_INDEX[key] = path
        return eng
    return SearchEngine(spark, path)


_TRIGRAM: dict[str, str] = {}
TRIGRAM_PATTERN = "merge (sort|join)"
TRIGRAM_K = 200


def _trigram_index(spark: SparkSession, sf_dir: str) -> str:
    """ONE trigram index per sf_dir per process (same sharing rule as
    _shared_index)."""
    from .trigram import build_trigram_index

    path = _TRIGRAM.get(sf_dir)
    if path is None:
        path = _tmpdir("seidx_trigram_") + "/tg"
        build_trigram_index(_docs(spark, sf_dir), path, n_buckets=16)
        _TRIGRAM[sf_dir] = path
    return path


def q_trigram_regexp(spark, sf_dir):
    """Zoekt-style trigram-accelerated regex search over RAW source text:
    required-trigram candidates (conservative AND/OR literal algebra,
    property-tested) from the bucket-pruned postings scan, exact-regex
    verify on candidates only — identical result to the full regex scan
    the SQL twin runs, reading only the required trigrams' partitions."""
    from .trigram import trigram_search

    out = trigram_search(
        spark, _trigram_index(spark, sf_dir), _docs(spark, sf_dir),
        TRIGRAM_PATTERN, k=TRIGRAM_K,
    )
    return out.select("doc_id")


GREP_BATCH = {
    "g1": "merge (sort|join)",
    "g2": "customer",
    "g3": "hash (scan )?join",
}
GREP_BATCH_K = 100


def q_grep_batch(spark, sf_dir):
    """Batched grep: the whole pattern batch in ONE postings scan + ONE
    column-valued-rlike verify pass — (pattern_id, doc_id), first k docs
    per pattern."""
    from .trigram import trigram_search_batch

    return trigram_search_batch(
        spark, _trigram_index(spark, sf_dir), _docs(spark, sf_dir),
        GREP_BATCH, k=GREP_BATCH_K,
    )


def _grep_batch_sql() -> str:
    parts = [
        f"""
SELECT '{pid}' AS pattern_id, doc_id FROM documents
WHERE regexp_matches(text, '{pat}')
ORDER BY doc_id LIMIT {GREP_BATCH_K}"""
        for pid, pat in sorted(GREP_BATCH.items())
    ]
    return " UNION ALL ".join(f"({p})" for p in parts)


def q_grep_facet(spark, sf_dir):
    """Facet counts over the FULL grep match set (matches per lang) —
    pruned candidates + regex verify, no k cut, one hash agg."""
    from .trigram import trigram_match_counts

    return trigram_match_counts(
        spark, _trigram_index(spark, sf_dir), _docs(spark, sf_dir),
        TRIGRAM_PATTERN, by="lang",
    )


GREP_LINES_K, GREP_LINES_CAP = 20, 3


def q_grep_lines(spark, sf_dir):
    """grep -n over the corpus: matching lines with 1-based line numbers
    from trigram-pruned candidate docs, capped per doc — the code-search
    result surface (doc, line_no, line)."""
    from .trigram import trigram_search_lines

    return trigram_search_lines(
        spark, _trigram_index(spark, sf_dir), _docs(spark, sf_dir),
        TRIGRAM_PATTERN, k=GREP_LINES_K, max_lines_per_doc=GREP_LINES_CAP,
    )


_SHARDED: dict[str, str] = {}
N_SHARDS = 3


def _sharded_engine(spark: SparkSession, sf_dir: str):
    """ONE sharded layout (N_SHARDS hash-routed independent indexes) per
    sf_dir per process — the scatter-gather serving surface."""
    from .query.sharded import ShardedEngine

    base = _SHARDED.get(sf_dir)
    if base is None:
        base = _tmpdir("seidx_sharded_")
        eng = ShardedEngine.build(
            spark, _docs(spark, sf_dir), base, N_SHARDS,
            range_bits=2, n_buckets=4,
        )
        _SHARDED[sf_dir] = base
        return eng
    return ShardedEngine.open(spark, base)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # use_arrow_udf=False → pure-Catalyst tokenizer in driver checks (identical
    # semantics to the Arrow UDF; equivalence is pytest-enforced)
    return term_frequencies(_docs(spark, sf_dir), "doc_id", "text", use_arrow_udf=False)


_TF_SQL = f"""
SELECT doc_id, term, count(*)::BIGINT AS tf
FROM ({duckdb_tokens_cte("documents", "doc_id", "text")})
GROUP BY doc_id, term
"""

_STATS_SQL = f"""
SELECT doc_id, sum(tf)::BIGINT AS doc_len, max(tf)::BIGINT AS max_tf,
       count(*)::BIGINT AS distinct_terms,
       sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)::BIGINT AS singleton_terms
FROM ({_TF_SQL}) GROUP BY doc_id
"""

_DICT_SQL = f"""
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM ({_TF_SQL}) GROUP BY term
"""


def _scoring_ctx(spark, sf_dir):
    tf = _tf(spark, sf_dir)
    stats = doc_stats(tf)
    dct = dictionary(tf)
    row = stats.agg(F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a")).collect()[0]
    return tf, stats, dct, int(row["n"]), float(row["a"])


def _bm25_sql(query: str, k1: float = 1.5, b: float = 0.75,
              tf_sql: str | None = None,
              weights: dict[str, float] | None = None) -> str:
    """``weights``: per-term idf multiplier (query-string ``term^w``
    boosts). Use power-of-two boosts in driver entries — scaling a float64
    by 2^n is exact, so the engine's idf*boost fold and this SQL's
    in-expression multiply are bit-identical."""
    qterms = [t for t, _ in parse_query(query)]
    if weights:
        q_cte = "q(term, w) AS (VALUES " + ", ".join(
            f"('{t}', {float(weights.get(t, 1.0))!r})" for t in qterms
        ) + ")"
        wmul = " * q.w"
    else:
        terms = ", ".join(f"'{t}'" for t in qterms)
        q_cte = f"q AS (SELECT unnest([{terms}]) AS term)"
        wmul = ""
    return f"""
WITH tf AS ({tf_sql or _TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
{q_cte}
SELECT tf.doc_id AS doc_id,
       round(sum(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)){wmul}
                 * (tf.tf * ({k1} + 1.0))
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))), {ROUND_DP}) AS score
FROM tf
JOIN q USING (term)
JOIN dict d USING (term)
JOIN stats s ON s.doc_id = tf.doc_id
CROSS JOIN corpus c
GROUP BY tf.doc_id
"""


def _inner_sql(query: str) -> str:
    qterms = parse_query(query)
    qrows = ", ".join(f"('{t}', {qtf})" for t, qtf in qterms)
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term, qtf) AS (VALUES {qrows})
SELECT tf.doc_id AS doc_id,
       round(sum((tf.tf / s.doc_len) * log2(c.n / d.df) * q.qtf), {ROUND_DP}) AS score
FROM tf
JOIN q USING (term)
JOIN dict d USING (term)
JOIN stats s ON s.doc_id = tf.doc_id
CROSS JOIN corpus c
GROUP BY tf.doc_id
"""


def _cosine_sql(query: str) -> str:
    qterms = parse_query(query)
    qrows = ", ".join(f"('{t}', {qtf})" for t, qtf in qterms)
    q_w2 = float(sum(qtf * qtf for _, qtf in qterms))
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
w AS (SELECT tf.doc_id, (tf.tf / s.doc_len) * log2(c.n / d.df) AS tfidf, tf.term
      FROM tf JOIN dict d USING (term) JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c),
dw AS (SELECT doc_id, sum(tfidf * tfidf) AS doc_w2 FROM w GROUP BY 1),
q(term, qtf) AS (VALUES {qrows}),
inner_s AS (
  SELECT w.doc_id, sum(w.tfidf * q.qtf) AS inner_score
  FROM w JOIN q USING (term) GROUP BY w.doc_id)
SELECT i.doc_id AS doc_id,
       round(i.inner_score / sqrt(dw.doc_w2 * {q_w2}), {ROUND_DP}) AS score
FROM inner_s i JOIN dw USING (doc_id)
"""


def _bm25_batch_sql(queries: dict[str, str], k: int, k1: float = 1.5, b: float = 0.75) -> str:
    qrows = ", ".join(
        f"('{qid}', '{t}', {qtf})"
        for qid, q in sorted(queries.items())
        for t, qtf in parse_query(q)
    )
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(query_id, term, qtf) AS (VALUES {qrows}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         round(sum(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
                   * (tf.tf * ({k1} + 1.0))
                   / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))), {ROUND_DP}) AS score
  FROM tf
  JOIN q USING (term)
  JOIN dict d USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id
  CROSS JOIN corpus c
  GROUP BY q.query_id, tf.doc_id)
SELECT query_id, doc_id, score, rank FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::BIGINT AS rank
  FROM scored)
WHERE rank <= {k}
"""


def _bm25_reference_sql(query: str, k1: float = 3.0, b: float = 0.6) -> str:
    """R1 quirk BM25 (``Part C/ranker.py:62-86``): normalized tf, log2 idf,
    numerator ntf·(ntf·(k+1)) — the reference's shipped formula as-is."""
    terms = ", ".join(f"'{t}'" for t, _ in parse_query(query))
    ntf = "(tf.tf / s.doc_len)"
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (SELECT unnest([{terms}]) AS term)
SELECT tf.doc_id AS doc_id,
       round(sum(log2(c.n / d.df)
                 * ({ntf} * ({ntf} * ({k1} + 1.0)))
                 / ({ntf} + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))), {ROUND_DP}) AS score
FROM tf JOIN q USING (term) JOIN dict d USING (term)
JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c
GROUP BY tf.doc_id
"""


def _blended_partc_sql(query: str, k1: float = 3.0, b: float = 0.6) -> str:
    """R5 (``Part C/ranker.py:28-32``): 0.9·BM25_ref + 0.1·inner-product."""
    qrows = ", ".join(f"('{t}', {qtf})" for t, qtf in parse_query(query))
    ntf = "(tf / doc_len)"
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term, qtf) AS (VALUES {qrows}),
cand AS (
  SELECT tf.doc_id, tf.tf, s.doc_len, d.df, c.n, c.avgdl, q.qtf
  FROM tf JOIN q USING (term) JOIN dict d USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c),
bm AS (
  SELECT doc_id,
         sum(log2(n / df) * ({ntf} * ({ntf} * ({k1} + 1.0)))
             / ({ntf} + {k1} * (1.0 - {b} + {b} * doc_len / avgdl))) AS s
  FROM cand GROUP BY 1),
ip AS (SELECT doc_id, sum({ntf} * log2(n / df) * qtf) AS s FROM cand GROUP BY 1)
SELECT coalesce(bm.doc_id, ip.doc_id) AS doc_id,
       round(0.9 * coalesce(bm.s, 0) + 0.1 * coalesce(ip.s, 0), {ROUND_DP}) AS score
FROM bm FULL JOIN ip ON bm.doc_id = ip.doc_id
"""


def _blended_parta_sql(query: str) -> str:
    """R6+R8+R9 legacy Part A (``Part A/ranker.py:22-27``,
    ``Part A/searcher.py:70``, ``Part A/merger.py:68-81``): 0.8/0.2
    index-time doc norm (rounded 3dp, unsquared quirk), 0.6/0.4 query-time
    posting weight (rounded 3dp before idf), 0.5·cosine + 0.5·inner."""
    qterms = parse_query(query)
    qrows = ", ".join(f"('{t}', {qtf})" for t, qtf in qterms)
    q_w2 = float(sum(qtf * qtf for _, qtf in qterms))
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len, max(tf) AS max_tf FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
dw AS (
  SELECT tf.doc_id,
         round(sum((0.8 * (tf.tf / s.max_tf) + 0.2 * (tf.tf / s.doc_len))
                   * log10(c.n / d.df)), 3) AS doc_w
  FROM tf JOIN dict d USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c
  GROUP BY 1),
q(term, qtf) AS (VALUES {qrows}),
w AS (
  SELECT tf.doc_id, tf.term,
         round(0.6 * (tf.tf / s.max_tf) + 0.4 * (tf.tf / s.doc_len), 3)
           * log10(c.n / d.df) AS w
  FROM tf JOIN q USING (term) JOIN dict d USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c),
ip AS (SELECT w.doc_id, sum(w.w * q.qtf) AS ip FROM w JOIN q USING (term) GROUP BY 1)
SELECT ip.doc_id AS doc_id,
       round(0.5 * (ip.ip / sqrt(dw.doc_w * {q_w2})) + 0.5 * ip.ip, {ROUND_DP}) AS score
FROM ip JOIN dw ON dw.doc_id = ip.doc_id
"""


def _and_sql(query: str) -> str:
    terms = sorted({t for t, _ in parse_query(query)})
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
SELECT doc_id FROM ({_TF_SQL})
WHERE term IN ({tl})
GROUP BY doc_id HAVING count(*) = {len(terms)}
"""


# ---------------------------------------------------------------- callables

def q_doc_tf(spark, sf_dir):
    return _tf(spark, sf_dir)


def q_doc_stats(spark, sf_dir):
    return doc_stats(_tf(spark, sf_dir))


def q_dictionary(spark, sf_dir):
    return dictionary(_tf(spark, sf_dir))


def q_corpus_stats(spark, sf_dir):
    return doc_stats(_tf(spark, sf_dir)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("doc_len"), ROUND_DP).alias("avgdl"),
    )


def q_top_terms(spark, sf_dir):
    return (
        dictionary(_tf(spark, sf_dir))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(20)
    )


HH_K, HH_M = 15, 64


def q_heavy_hitters(spark, sf_dir):
    """Certified heavy hitters: per-batch truncated summaries + candidate-
    only exact verification (the top-k path whose shuffle carries ≤
    m·batches keys instead of the vocabulary). The certificate makes the
    approximate structure exactly testable — on this corpus E = 0 and the
    output IS the exact weighted top-k the SQL twin computes."""
    out, info = sketch.heavy_hitters(
        _tf(spark, sf_dir), "term", k=HH_K, m=HH_M, weight_col="tf"
    )
    assert info["certified"], info  # the driver gate relies on exactness
    return out


def q_bm25_scores(spark, sf_dir):
    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl)
    return scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))


def q_bm25_batch_topk(spark, sf_dir):
    """Batched multi-query BM25 top-k: one job for the whole query batch.
    Rank is computed over the ROUNDED score (+doc_id tie-break) so the rank
    column is engine-independent."""
    from pyspark.sql import Window

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score_batch(spark, tf, stats, dct, BATCH_QUERIES, n, avgdl)
    rounded = scored.select(
        "query_id", "doc_id", F.round("score", ROUND_DP).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        rounded.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BATCH_K)
    )


# fixed LTR blend for the scoring driver entry: power-of-two weights so the
# engine's float fold and the SQL twin's in-expression multiply are
# bit-identical (same rule as query-string boosts)
LTR_WEIGHTS = {
    "bm25": 2.0, "coverage": 0.5, "idf_sum": 0.25, "_intercept": 0.125,
}
LTR_K = 10


def q_ltr_features(spark, sf_dir):
    """LTR feature logging (ES `sltr` feature sets): per-(query, doc)
    bm25 / idf_sum / tf_sum / matched / coverage / doc_len_norm / log_tf
    for the whole query batch in ONE broadcast-join aggregation — the
    input table for the closed-form ridge trainer (ltr.ltr_train_linear,
    pytest-verified against numpy lstsq)."""
    from .ltr import ltr_features

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    return ltr_features(
        spark, tf, stats, dct, BATCH_QUERIES, n, avgdl, round_dp=ROUND_DP
    )


def q_ltr_topk(spark, sf_dir):
    """Linear LTR scoring pass over the logged features with a FIXED
    learned blend (power-of-two weights; the runtime-trained path is
    pytest-verified — data-dependent weights can't live in a static SQL
    oracle). Rank decided on the rounded score like the other batch
    entries."""
    from .ltr import ltr_features, ltr_score

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    feats = ltr_features(
        spark, tf, stats, dct, BATCH_QUERIES, n, avgdl, round_dp=ROUND_DP
    )
    return ltr_score(feats, LTR_WEIGHTS, k=LTR_K, round_dp=ROUND_DP)


def _ltr_features_sql(queries: dict[str, str], k1=1.5, b=0.75) -> str:
    qrows = ", ".join(
        f"('{qid}', '{t}', {len(parse_query(q))})"
        for qid, q in sorted(queries.items())
        for t, _ in parse_query(q)
    )
    idf = "ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))"
    s_bm25 = (
        f"{idf} * (tf.tf * ({k1} + 1.0))"
        f" / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))"
    )
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(query_id, term, qlen) AS (VALUES {qrows})
SELECT q.query_id AS query_id, tf.doc_id AS doc_id,
       round(sum({s_bm25}), {ROUND_DP}) AS bm25,
       round(sum({idf}), {ROUND_DP}) AS idf_sum,
       sum(tf.tf)::BIGINT AS tf_sum,
       count(*)::BIGINT AS matched,
       round(count(*)::DOUBLE / q.qlen, {ROUND_DP}) AS coverage,
       round(s.doc_len / c.avgdl, {ROUND_DP}) AS doc_len_norm,
       round(ln(1.0 + sum(tf.tf)::DOUBLE / s.doc_len), {ROUND_DP}) AS log_tf
FROM tf
JOIN q USING (term)
JOIN dict d USING (term)
JOIN stats s ON s.doc_id = tf.doc_id
CROSS JOIN corpus c
GROUP BY q.query_id, tf.doc_id, q.qlen, s.doc_len, c.n, c.avgdl
"""


def _ltr_topk_sql(queries: dict[str, str], weights: dict, k: int) -> str:
    feats = _ltr_features_sql(queries)
    terms = [repr(float(weights.get("_intercept", 0.0))) + "::DOUBLE"]
    for c, w in sorted(weights.items()):
        if c != "_intercept":
            terms.append(f"{float(w)!r} * {c}")
    score = " + ".join(terms)
    return f"""
WITH f AS ({feats}),
scored AS (SELECT query_id, doc_id, round({score}, {ROUND_DP}) AS score
           FROM f),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id ASC) AS rank
      FROM scored)
SELECT query_id, doc_id, score, rank::BIGINT AS rank
FROM r WHERE rank <= {k}
"""


def q_inner_scores(spark, sf_dir):
    tf, stats, dct, n, _ = _scoring_ctx(spark, sf_dir)
    scored = inner_product_score(spark, tf, stats, dct, INNER_QUERY, n)
    return scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))


def q_cosine_scores(spark, sf_dir):
    tf, stats, dct, n, _ = _scoring_ctx(spark, sf_dir)
    scored = cosine_score(spark, tf, stats, dct, COSINE_QUERY, n)
    return scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))


LM_MU = 2000.0
COLLAPSE_FIELD = "source"
COLLAPSE_K = 10
RECENCY_HALF_LIFE = 90.0
RECENCY_AGE_MOD = 365  # documents carry no timestamp: age := doc_id % 365
RECENCY_K = 20


def q_lm_dirichlet(spark, sf_dir):
    """Query-likelihood with Dirichlet smoothing (Lucene LMDirichlet form)."""
    from .scoring import lm_dirichlet_score

    tf, stats, dct, n, _ = _scoring_ctx(spark, sf_dir)
    total_cf = int(dct.agg(F.sum("cf").alias("c")).collect()[0]["c"])
    scored = lm_dirichlet_score(spark, tf, stats, dct, BM25_QUERY, total_cf, mu=LM_MU)
    return scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))


def _lm_dirichlet_sql(query: str, mu: float) -> str:
    qrows = ", ".join(f"('{t}', {qtf})" for t, qtf in parse_query(query))
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
dict AS (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY 1),
corpus AS (SELECT sum(cf) AS c FROM dict),
q(term, qtf) AS (VALUES {qrows})
SELECT tf.doc_id AS doc_id,
       round(sum(q.qtf * greatest(0.0,
                 ln(1.0 + tf.tf / ({mu} * d.cf / c.c))
                 + ln({mu} / (s.doc_len + {mu})))), {ROUND_DP}) AS score
FROM tf
JOIN q USING (term)
JOIN dict d USING (term)
JOIN stats s ON s.doc_id = tf.doc_id
CROSS JOIN corpus c
GROUP BY tf.doc_id
"""


def q_lm_jelinek_mercer(spark, sf_dir):
    """Query-likelihood with Jelinek-Mercer smoothing (Lucene
    LMJelinekMercerSimilarity, λ=0.1 short-query default)."""
    from .scoring import LM_LAMBDA, lm_jelinek_mercer_score

    tf, stats, dct, n, _ = _scoring_ctx(spark, sf_dir)
    total_cf = int(dct.agg(F.sum("cf").alias("c")).collect()[0]["c"])
    scored = lm_jelinek_mercer_score(
        spark, tf, stats, dct, BM25_QUERY, total_cf, lam=LM_LAMBDA
    )
    return scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))


def _lm_jm_sql(query: str, lam: float) -> str:
    qrows = ", ".join(f"('{t}', {qtf})" for t, qtf in parse_query(query))
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
dict AS (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY 1),
corpus AS (SELECT sum(cf) AS c FROM dict),
q(term, qtf) AS (VALUES {qrows})
SELECT tf.doc_id AS doc_id,
       round(sum(q.qtf * ln(1.0 + ((1.0 - {lam!r}) * tf.tf / s.doc_len)
                 / ({lam!r} * (d.cf / c.c)))), {ROUND_DP}) AS score
FROM tf
JOIN q USING (term)
JOIN dict d USING (term)
JOIN stats s ON s.doc_id = tf.doc_id
CROSS JOIN corpus c
GROUP BY tf.doc_id
"""


def q_collapse_topk(spark, sf_dir):
    """Field collapsing: best doc per source, then global top-k. Collapse
    runs over the ROUNDED score so rank decisions are engine-independent."""
    from .scoring import collapse_topk

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl)
    return collapse_topk(
        scored, _docs(spark, sf_dir), COLLAPSE_FIELD, COLLAPSE_K, round_dp=ROUND_DP
    )


def _collapse_sql(query: str, field: str, k: int) -> str:
    return f"""
WITH scored AS ({_bm25_sql(query)}),
j AS (SELECT d.{field} AS {field}, s.doc_id, s.score
      FROM scored s JOIN documents d USING (doc_id)),
r AS (SELECT *, row_number() OVER (PARTITION BY {field}
                                   ORDER BY score DESC, doc_id ASC) AS rn FROM j)
SELECT {field}, doc_id, score FROM r WHERE rn = 1
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


INNER_HITS = 3


def q_collapse_inner_hits(spark, sf_dir):
    """collapse + inner_hits: top COLLAPSE_K groups by their best doc,
    each with its ≤INNER_HITS best docs and the in-group rank."""
    from .scoring import collapse_inner_hits

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl)
    return collapse_inner_hits(
        scored, _docs(spark, sf_dir), COLLAPSE_FIELD, COLLAPSE_K,
        inner_size=INNER_HITS, round_dp=ROUND_DP,
    )


def _collapse_inner_hits_sql(query: str, field: str, k: int, inner: int) -> str:
    return f"""
WITH scored AS ({_bm25_sql(query)}),
j AS (SELECT d.{field} AS {field}, s.doc_id, s.score
      FROM scored s JOIN documents d USING (doc_id)),
r AS (SELECT *, row_number() OVER (PARTITION BY {field}
                                   ORDER BY score DESC, doc_id ASC) AS inner_rank
      FROM j),
topg AS (SELECT {field} FROM r WHERE inner_rank = 1
         ORDER BY score DESC, doc_id ASC LIMIT {k})
SELECT r.{field}, r.doc_id, r.score, r.inner_rank::BIGINT AS inner_rank
FROM r JOIN topg USING ({field})
WHERE r.inner_rank <= {inner}
"""


PARENT_MODE = "sum"
PARENT_K = 10


def q_parent_topk(spark, sf_dir):
    """Parent-entity ranking (ES has_child, score_mode=sum): sources
    ranked by the summed BM25 of their matching docs, with the matching-
    child count. Per-child scores rounded pre-agg for engine-independent
    rank decisions."""
    from .scoring import parent_topk

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl)
    return parent_topk(
        scored, _docs(spark, sf_dir), COLLAPSE_FIELD, PARENT_K,
        score_mode=PARENT_MODE, round_dp=ROUND_DP,
    )


HP_PARENTS, HP_K = 3, 40


def q_has_parent_topk(spark, sf_dir):
    """ES has_parent: children of the top-3 BM25-ranked sources, each
    inheriting its parent's score — parent relevance fanned out to child
    docs (the inverse of parent_topk/has_child)."""
    from .scoring import has_parent_topk, parent_topk

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl)
    docs = _docs(spark, sf_dir)
    parents = parent_topk(
        scored, docs, COLLAPSE_FIELD, HP_PARENTS,
        score_mode=PARENT_MODE, round_dp=ROUND_DP,
    ).select(COLLAPSE_FIELD, "score")
    return has_parent_topk(
        parents, docs, COLLAPSE_FIELD, HP_K, round_dp=ROUND_DP
    )


def _has_parent_sql(query: str, field: str, n_parents: int, k: int) -> str:
    inner = _parent_sql(query, field, n_parents, PARENT_MODE)
    return f"""
WITH parents AS (SELECT {field}, score FROM ({inner}) p)
SELECT d.doc_id AS doc_id, d.{field} AS {field}, p.score AS score
FROM documents d JOIN parents p USING ({field})
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _parent_sql(query: str, field: str, k: int, mode: str) -> str:
    agg = {"max": "max(score)", "sum": "sum(score)", "avg": "avg(score)"}[mode]
    return f"""
WITH scored AS ({_bm25_sql(query)}),
j AS (SELECT d.{field} AS {field}, round(s.score, {ROUND_DP}) AS score
      FROM scored s JOIN documents d USING (doc_id))
SELECT {field}, round({agg}, {ROUND_DP}) AS score,
       count(*)::BIGINT AS n_children
FROM j GROUP BY {field}
ORDER BY score DESC, {field} ASC LIMIT {k}
"""


def q_recency_topk(spark, sf_dir):
    """Exponential time-decay blend. The corpus has no timestamp column, so
    age is derived deterministically as doc_id % RECENCY_AGE_MOD on both
    sides — the operator itself takes any (doc_id, age) relation."""
    from .scoring import recency_blend, topk

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl).select(
        "doc_id", F.round("score", ROUND_DP).alias("score")
    )
    age = _docs(spark, sf_dir).select(
        "doc_id", (F.col("doc_id") % RECENCY_AGE_MOD).cast("double").alias("age")
    )
    blended = recency_blend(scored, age, RECENCY_HALF_LIFE, round_dp=ROUND_DP)
    return topk(blended, RECENCY_K)


def _recency_sql(query: str, half_life: float, age_mod: int, k: int) -> str:
    import math as _math

    lam = _math.log(2.0) / half_life
    return f"""
WITH scored AS ({_bm25_sql(query)})
SELECT doc_id,
       round(score * exp(-({lam!r}) * (doc_id % {age_mod})), {ROUND_DP}) AS score
FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


FS_FUNCTIONS = [
    # even-digit weights + boost_mode=sum: no decimal-midpoint risk (see
    # scoring.function_score docstring)
    {"field_value_factor": {"field": "n_chars", "factor": 0.001,
                            "modifier": "ln1p"}, "weight": 1.0},
    {"weight": 0.4, "filter": {"field": "lang", "eq": "en"}},
]
FS_K = 25


PIN_IDS = [7, 3, 999999999, 11]  # third id doesn't exist -> silently skipped


def q_pinned_topk(spark, sf_dir):
    """ES pinned query: the pin list outranks every organic hit in list
    order (ES's constant-minus-position scores), organic BM25 fills the
    rest; unknown pinned ids are skipped like ES does."""
    from .scoring import pinned_topk

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl)
    return pinned_topk(
        spark, scored, PIN_IDS, FS_K,
        valid_docs=_docs(spark, sf_dir), round_dp=ROUND_DP,
    )


def _pinned_sql(query: str, pinned_ids: list[int], k: int) -> str:
    from .scoring import PIN_BASE

    pins = ", ".join(f"({d}, {i})" for i, d in enumerate(pinned_ids))
    return f"""
WITH pins(doc_id, pos) AS (VALUES {pins}),
valid AS (SELECT p.doc_id, p.pos FROM pins p
          WHERE p.doc_id IN (SELECT doc_id FROM documents)),
unioned AS (
  SELECT doc_id, round({PIN_BASE!r} - pos, {ROUND_DP}) AS score FROM valid
  UNION ALL
  SELECT doc_id, score FROM ({_bm25_sql(query)})
  WHERE doc_id NOT IN (SELECT doc_id FROM valid))
SELECT doc_id, score FROM unioned
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


RS_SEED, RS_WEIGHT = 42, 0.5


def q_random_score_topk(spark, sf_dir):
    """ES random_score (seeded): BM25 + weight·md5-unit-hash(doc_id:seed) —
    deterministic exploration jitter, reproducible across engines and
    partitionings (F.rand would not be)."""
    from .scoring import random_score, topk

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl).select(
        "doc_id", F.round("score", ROUND_DP).alias("score")
    )
    return topk(
        random_score(scored, seed=RS_SEED, weight=RS_WEIGHT, round_dp=ROUND_DP),
        FS_K,
    )


def _random_score_sql(query: str, k: int) -> str:
    from .scoring import random_score_sql

    inner = random_score_sql(
        _bm25_sql(query), seed=RS_SEED, weight=RS_WEIGHT, round_dp=ROUND_DP
    )
    return f"""
SELECT doc_id, score FROM ({inner}) t
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


RF_PIVOT, RF_BOOST = 200.0, 2.0


def q_rank_feature_topk(spark, sf_dir):
    """ES rank_feature (saturation): BM25 + boost·n_chars/(n_chars+pivot) —
    a monotone bounded static-signal boost (length prior here; pagerank or
    freshness in production). Saturation is division-only, so the DuckDB
    twin hash-aligns at 5dp."""
    from .scoring import rank_feature, topk

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl).select(
        "doc_id", F.round("score", ROUND_DP).alias("score")
    )
    meta = _docs(spark, sf_dir).select("doc_id", "n_chars")
    boosted = rank_feature(
        scored, meta, "n_chars", function="saturation",
        boost=RF_BOOST, pivot=RF_PIVOT, round_dp=ROUND_DP,
    )
    return topk(boosted, FS_K)


def _rank_feature_sql(query: str, k: int) -> str:
    from .scoring import rank_feature_sql

    inner = rank_feature_sql(
        _bm25_sql(query), "documents", "n_chars", function="saturation",
        boost=RF_BOOST, pivot=RF_PIVOT, round_dp=ROUND_DP,
    )
    return f"""
SELECT doc_id, score FROM ({inner}) t
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def q_function_score_topk(spark, sf_dir):
    """ES function_score: BM25 relevance boosted by a length prior
    (ln1p(0.001·n_chars)) plus a +0.4 English bump — functions summed,
    added to the query score; docs matching no function pass through
    unchanged. One candidate-sized LEFT join + column exprs, no extra
    shuffle per function."""
    from .scoring import function_score, topk

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl).select(
        "doc_id", F.round("score", ROUND_DP).alias("score")
    )
    meta = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    boosted = function_score(
        scored, meta, FS_FUNCTIONS, score_mode="sum", boost_mode="sum",
        round_dp=ROUND_DP,
    )
    return topk(boosted, FS_K)


def _function_score_sql(query: str, k: int) -> str:
    from .scoring import function_score_sql

    inner = function_score_sql(
        _bm25_sql(query), "documents", FS_FUNCTIONS,
        score_mode="sum", boost_mode="sum", round_dp=ROUND_DP,
    )
    return f"""
SELECT doc_id, score FROM ({inner}) t
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


DECAY_FUNCTIONS = [
    {"decay": {"type": "gauss", "field": "n_chars", "origin": 256.0,
               "scale": 128.0, "decay": 0.5}, "weight": 2.0},
    {"decay": {"type": "linear", "field": "n_chars", "origin": 0.0,
               "scale": 1024.0, "offset": 64.0, "decay": 0.25},
     "weight": 1.0},
]
DECAY_K = 30


def q_decay_score_topk(spark, sf_dir):
    """ES decay scoring (function_score gauss + linear on n_chars, summed,
    added to BM25): value 1 at the origin, exactly `decay` at `scale`
    away — document-length proximity priors as pure column math."""
    from .scoring import function_score, topk

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl).select(
        "doc_id", F.round("score", ROUND_DP).alias("score")
    )
    meta = _docs(spark, sf_dir).select("doc_id", "n_chars")
    boosted = function_score(
        scored, meta, DECAY_FUNCTIONS, score_mode="sum", boost_mode="sum",
        round_dp=ROUND_DP,
    )
    return topk(boosted, DECAY_K)


def _decay_score_sql(query: str, k: int) -> str:
    from .scoring import function_score_sql

    inner = function_score_sql(
        _bm25_sql(query), "documents", DECAY_FUNCTIONS,
        score_mode="sum", boost_mode="sum", round_dp=ROUND_DP,
    )
    return f"""
SELECT doc_id, score FROM ({inner}) t
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def q_hit_counts(spark, sf_dir):
    """Batched total-hits counting: (query_id, or_hits, and_hits) for the
    whole batch in one job."""
    from .scoring import hit_counts

    return hit_counts(spark, _tf(spark, sf_dir), BATCH_QUERIES)


def _hit_counts_sql(queries: dict[str, str]) -> str:
    qrows = ", ".join(
        f"('{qid}', '{t}', {len(parse_query(q))})"
        for qid, q in sorted(queries.items())
        for t, _ in parse_query(q)
    )
    return f"""
WITH tf AS ({_TF_SQL}),
q(query_id, term, n_terms) AS (VALUES {qrows}),
pd AS (SELECT q.query_id, tf.doc_id, count(*) AS matched, max(q.n_terms) AS n_terms
       FROM tf JOIN q USING (term) GROUP BY 1, 2)
SELECT query_id,
       count(*)::BIGINT AS or_hits,
       sum(CASE WHEN matched = n_terms THEN 1 ELSE 0 END)::BIGINT AS and_hits
FROM pd GROUP BY query_id
"""


def q_bm25_reference(spark, sf_dir):
    from .scoring import bm25_reference_score

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_reference_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl)
    return scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))


def q_blended_partc(spark, sf_dir):
    from .scoring import blended_score_partc

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = blended_score_partc(spark, tf, stats, dct, BM25_QUERY, n, avgdl)
    return scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))


def q_blended_parta(spark, sf_dir):
    from .scoring import blended_score_parta

    tf, stats, dct, n, _ = _scoring_ctx(spark, sf_dir)
    scored = blended_score_parta(spark, tf, stats, dct, INNER_QUERY, n)
    return scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))


GLOVE_DIM = 8


def _glove_vectors_for(terms: list[str]) -> dict[str, list[float]]:
    from .expansion import hash_term_vectors

    return hash_term_vectors(sorted(terms), dim=GLOVE_DIM)


def q_glove_rerank(spark, sf_dir):
    """R7 'best' variant: 0.1·BM25_glove + 0.9·inner, euclidean re-rank
    against the query embedding. Embeddings are the deterministic md5-derived
    stand-in over the index vocabulary (hash_term_vectors) so the DuckDB twin
    reproduces the whole pipeline including the re-rank."""
    from . import glove

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    vocab = {r["term"] for r in dct.select("term").collect()}
    # include the query's own terms so an OOV query word contributes the same
    # hash vector on BOTH sides (the SQL twin derives qvec from query terms
    # alone — without this a query term absent from the corpus would diverge)
    vocab |= {t for t, _ in parse_query(BM25_QUERY)}
    vectors = _glove_vectors_for(sorted(vocab))
    scored = glove.glove_rerank(spark, tf, stats, dct, BM25_QUERY, n, avgdl, vectors)
    return scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))


def _glove_rerank_sql(query: str, dim: int = GLOVE_DIM, k1: float = 1.5, b: float = 0.8) -> str:
    from .glove import query_vector

    qterms = parse_query(query)
    qrows = ", ".join(f"('{t}', {qtf})" for t, qtf in qterms)
    # query embedding computed by the same driver-side code the Spark entry
    # uses, inlined as literals (vocabulary = every index term, so all query
    # words that reach the dictionary are in-vocab)
    qvec = query_vector(query, _glove_vectors_for([t for t, _ in qterms]))
    qvals = ", ".join(f"({i}, {v!r})" for i, v in enumerate(qvec))
    hashval = f"(('0x' || substr(md5(tf.term), (d2.dim % 16) * 2 + 1, 2))::INT / 128.0 - 1.0)"
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term, qtf) AS (VALUES {qrows}),
cand AS (
  SELECT tf.doc_id, tf.tf, s.doc_len, d.df, c.n, c.avgdl, q.qtf
  FROM tf JOIN q USING (term) JOIN dict d USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c),
bm AS (
  SELECT doc_id,
         sum(log2(n / df) * (tf * (tf * ({k1} + 1.0)))
             / (tf + {k1} * (1.0 - {b} + {b} * doc_len / avgdl))) AS bm
  FROM cand GROUP BY 1),
ip AS (SELECT doc_id, sum((tf / doc_len) * log2(n / df) * qtf) AS ip FROM cand GROUP BY 1),
total AS (
  SELECT coalesce(bm.doc_id, ip.doc_id) AS doc_id,
         0.1 * coalesce(bm.bm, 0) + 0.9 * coalesce(ip.ip, 0) AS total
  FROM bm FULL JOIN ip ON bm.doc_id = ip.doc_id),
dvec AS (
  SELECT tf.doc_id, d2.dim, sum({hashval}) AS s
  FROM tf, (SELECT unnest(range(0, {dim})) AS dim) d2
  GROUP BY 1, 2),
qv(dim, v) AS (VALUES {qvals}),
eu AS (
  SELECT dv.doc_id,
         sqrt(sum((dv.s / st.doc_len - qv.v) * (dv.s / st.doc_len - qv.v))) AS eu
  FROM dvec dv
  JOIN stats st ON st.doc_id = dv.doc_id
  JOIN qv ON qv.dim = dv.dim
  GROUP BY 1),
scored AS (
  SELECT t.doc_id, t.total, 1.0 / e.eu AS rank
  FROM total t JOIN eu e ON e.doc_id = t.doc_id),
m AS (SELECT max(rank) AS mr, max(total) AS mt FROM scored)
SELECT doc_id,
       round(0.95 * (rank / m.mr) + 0.05 * (total / m.mt), {ROUND_DP}) AS score
FROM scored, m
"""


def q_boolean_and(spark, sf_dir):
    return boolean_and(spark, _tf(spark, sf_dir), AND_QUERY)


PHRASE_QUERY = "customer order"
PHRASE_K = 15


def q_phrase_topk(spark, sf_dir):
    """Exact-phrase top-k; ranked on the ROUNDED score (+doc_id tie-break)
    so the k-boundary is engine-independent."""
    from .scoring import phrase_match_col

    from .tokenizer import tokenize_py

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    terms = tokenize_py(PHRASE_QUERY)  # phrase ORDER preserved (no sort)
    matches = (
        _docs(spark, sf_dir)
        .filter(phrase_match_col(F.col("text"), terms))
        .select("doc_id")
    )
    scored = bm25_score(spark, tf, stats, dct, " ".join(terms), n, avgdl).select(
        "doc_id", F.round("score", ROUND_DP).alias("score")
    )
    return (
        scored.join(matches, "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(PHRASE_K)
    )


def _phrase_sql(phrase: str, k: int) -> str:
    from .tokenizer import tokenize_py

    terms = tokenize_py(phrase)  # phrase ORDER preserved (no sort)
    needle = " " + " ".join(terms) + " "
    toks = (
        f"[t FOR t IN regexp_extract_all(lower(text), '{TOKEN_PATTERN}') "
        f"IF t NOT IN ({_STOP_SQL})]"
    )
    bm25 = _bm25_sql(" ".join(terms))
    return f"""
WITH scored AS ({bm25}),
matches AS (
  SELECT doc_id FROM (
    SELECT doc_id, ' ' || array_to_string({toks}, ' ') || ' ' AS joined
    FROM documents)
  WHERE position('{needle}' IN joined) > 0)
SELECT s.doc_id AS doc_id, s.score AS score
FROM scored s JOIN matches USING (doc_id)
ORDER BY s.score DESC, s.doc_id ASC
LIMIT {k}
"""


def q_wand_batch_topk(spark, sf_dir):
    """Batched segment search (one job for the whole query batch — the
    cluster throughput shape) must reproduce the relational batch-BM25 SQL
    oracle exactly: per query, fetch a tie buffer, re-rank on the ROUNDED
    score, cut at k (same boundary discipline as bm25_batch_topk)."""
    from pyspark.sql import Window

    eng = _shared_index(spark, sf_dir)
    out = eng.search_batch(BATCH_QUERIES, k=BATCH_K + 15)
    rows = [
        (qid, int(d), float(s))
        for qid, hits in out.items()
        for d, s in hits
    ]
    df = spark.createDataFrame(rows, "query_id string, doc_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("query_id", "doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BATCH_K)
    )


def q_sharded_batch_topk(spark, sf_dir):
    """Sharded scatter-gather (3 hash-routed independent shard indexes,
    every shard scoring under GLOBAL n/avgdl/df — ES DFS_QUERY_THEN_FETCH
    made mandatory) must reproduce the SAME relational batch-BM25 truth as
    the single-index entries: sharding is a layout choice, not a semantics
    change. Same tie-buffer discipline as wand_batch_topk."""
    from pyspark.sql import Window

    eng = _sharded_engine(spark, sf_dir)
    out = eng.search_batch(BATCH_QUERIES, k=BATCH_K + 15)
    rows = [
        (qid, int(d), float(s))
        for qid, hits in out.items()
        for d, s in hits
    ]
    df = spark.createDataFrame(rows, "query_id string, doc_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("query_id", "doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BATCH_K)
    )


def q_phrase_index_topk(spark, sf_dir):
    """Index-NATIVE exact phrase: positional segments → AND intersect →
    adjacency verify on decoded positions → BM25. Checked against the SAME
    text-scan SQL oracle as phrase_topk — the index path must reproduce the
    text-derived truth exactly (rounded re-rank, tie buffer past k)."""
    from pyspark.sql import Window

    eng = _shared_index(spark, sf_dir, positional=True)
    rows = eng.search_phrase(PHRASE_QUERY, k=PHRASE_K + 10)
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in rows] or [], "doc_id long, score double"
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PHRASE_K)
        .drop("rn")
    )


SPAN_LIMIT = 16  # first-match ends at sf0.01 span 2..89 → 12/26 docs pass


def q_span_first_topk(spark, sf_dir):
    """Lucene SpanFirstQuery (index-native): the phrase must match ending
    within the first SPAN_LIMIT filtered tokens — the lead-paragraph/
    title-zone primitive. Same text-scan SQL truth as phrase, with the
    matcher cut at the end position."""
    from pyspark.sql import Window

    eng = _shared_index(spark, sf_dir, positional=True)
    rows = eng.search_span_first(PHRASE_QUERY, SPAN_LIMIT, k=PHRASE_K + 10)
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in rows] or [], "doc_id long, score double"
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PHRASE_K)
        .drop("rn")
    )


def _span_first_sql(phrase: str, limit: int, k: int) -> str:
    from .tokenizer import tokenize_py

    terms = tokenize_py(phrase)  # phrase ORDER preserved (no sort)
    m = len(terms)
    tl = ", ".join(f"'{t}'" for t in terms)
    toks = (
        f"[t FOR t IN regexp_extract_all(lower(text), '{TOKEN_PATTERN}') "
        f"IF t NOT IN ({_STOP_SQL})]"
    )
    bm25 = _bm25_sql(" ".join(terms))
    # 1-based window start i; span END index i+m-1 must be ≤ limit, which
    # bounds i ≤ limit-m+1 (== the kernel's 0-based last+1 ≤ limit cut)
    return f"""
WITH scored AS ({bm25}),
matches AS (
  SELECT doc_id FROM (SELECT doc_id, {toks} AS a FROM documents)
  WHERE len([i FOR i IN generate_series(1, least(len(a) - {m - 1}, {limit - m + 1}))
             IF list_slice(a, i, i + {m - 1}) = [{tl}]]) > 0)
SELECT s.doc_id AS doc_id, s.score AS score
FROM scored s JOIN matches USING (doc_id)
ORDER BY s.score DESC, s.doc_id ASC
LIMIT {k}
"""


COMMON_QUERY = "dup join stream"  # df at sf0.01: dup 25, join/stream ~390
COMMON_CUTOFF = 0.5  # fraction of n_docs → only 'dup' is low-frequency
COMMON_K = 20


def q_common_terms_topk(spark, sf_dir):
    """Lucene/ES CommonTermsQuery (index-native): low-df terms drive
    matching, ALL terms drive scoring — the no-stopword-list way to keep
    high-df terms from exploding the match set. The SQL twin derives the
    low/common split from the same df/cutoff arithmetic."""
    from pyspark.sql import Window

    eng = _shared_index(spark, sf_dir)
    rows = eng.search_common_terms(COMMON_QUERY, COMMON_CUTOFF, k=COMMON_K + 10)
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in rows] or [], "doc_id long, score double"
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= COMMON_K)
        .drop("rn")
    )


def _common_terms_sql(query: str, cutoff: float, k: int) -> str:
    from .tokenizer import tokenize_py

    qterms = ", ".join(f"'{t}'" for t in sorted(set(tokenize_py(query))))
    toks = (
        f"[t FOR t IN regexp_extract_all(lower(text), '{TOKEN_PATTERN}') "
        f"IF t NOT IN ({_STOP_SQL})]"
    )
    bm25 = _bm25_sql(query)
    return f"""
WITH scored AS ({bm25}),
tok AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
qtok AS (SELECT doc_id, term FROM tok WHERE term IN ({qterms})),
dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtok GROUP BY 1),
low AS (SELECT term FROM dfq
        WHERE df < {cutoff} * (SELECT count(*) FROM documents)),
matched AS (SELECT DISTINCT doc_id FROM qtok
            WHERE term IN (SELECT term FROM low))
SELECT s.doc_id AS doc_id, s.score AS score
FROM scored s JOIN matched USING (doc_id)
ORDER BY s.score DESC, s.doc_id ASC
LIMIT {k}
"""


BM25F_QUERY = "small gear large"  # 'small'/'large' live in BOTH part fields
BM25F_K = 20
BM25F_K1, BM25F_B, BM25F_WN, BM25F_WT = 1.2, 0.75, 2.0, 1.0


def q_bm25f_topk(spark, sf_dir):
    """BM25F fielded retrieval over the part table's two text fields
    (p_name weight 2, p_type weight 1): per-field length norm → weighted tf
    → one saturation, document-level df. The (k1+1) numerator makes the
    single-field case reduce exactly to BM25 (tests/test_fielded.py)."""
    from pyspark.sql import Window

    from .fielded import bm25f_score

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    scored = bm25f_score(
        spark, part, "p_partkey",
        {"p_name": BM25F_WN, "p_type": BM25F_WT},
        BM25F_QUERY, k1=BM25F_K1, b=BM25F_B,
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BM25F_K)
        .drop("rn")
    )


def q_combined_fields_topk(spark, sf_dir):
    """ES combined_fields over the part table: the two fields merged into
    ONE synthetic field (weighted tf sum, weighted length) before a single
    BM25 saturation — term-centric, vs BM25F's field-centric norms and
    best_fields' dis_max."""
    from pyspark.sql import Window

    from .fielded import combined_fields_score

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    scored = combined_fields_score(
        spark, part, "p_partkey",
        {"p_name": BM25F_WN, "p_type": BM25F_WT},
        BM25F_QUERY, k1=BM25F_K1, b=BM25F_B,
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BM25F_K)
        .drop("rn")
    )


def _combined_fields_sql(query: str, k: int) -> str:
    from .tokenizer import tokenize_py

    terms = ", ".join(f"'{t}'" for t in sorted(set(tokenize_py(query))))

    def toks(col: str) -> str:
        return (
            f"[t FOR t IN regexp_extract_all(lower({col}), '{TOKEN_PATTERN}') "
            f"IF t NOT IN ({_STOP_SQL})]"
        )

    return f"""
WITH n AS (SELECT count(*) AS n FROM part),
raw AS (
  SELECT p_partkey AS doc_id, 'p_name' AS field, unnest({toks('p_name')}) AS term FROM part
  UNION ALL
  SELECT p_partkey AS doc_id, 'p_type' AS field, unnest({toks('p_type')}) AS term FROM part),
wtf AS (SELECT doc_id, term,
               sum(CASE field WHEN 'p_name' THEN {BM25F_WN} ELSE {BM25F_WT} END) AS wtf
        FROM raw GROUP BY 1, 2),
ctf AS (SELECT doc_id, term, wtf AS ctf FROM wtf),
clen AS (SELECT doc_id, sum(wtf) AS clen FROM wtf GROUP BY 1),
avgd AS (SELECT sum(clen) * 1.0 / (SELECT n FROM n) AS avgdl FROM clen),
q AS (SELECT unnest([{terms}]) AS term),
dictc AS (SELECT term, count(*) AS df FROM ctf JOIN q USING (term) GROUP BY 1),
scored AS (
  SELECT c.doc_id AS doc_id,
         round(sum(ln(1.0 + ((SELECT n FROM n) - d.df + 0.5) / (d.df + 0.5))
                   * ({BM25F_K1} + 1.0) * c.ctf
                   / (c.ctf + {BM25F_K1} * (1.0 - {BM25F_B}
                      + {BM25F_B} * l.clen / (SELECT avgdl FROM avgd)))), {ROUND_DP}) AS score
  FROM ctf c JOIN q USING (term)
  JOIN dictc d USING (term)
  JOIN clen l ON l.doc_id = c.doc_id
  GROUP BY 1)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def _bm25f_sql(query: str, k: int) -> str:
    from .tokenizer import tokenize_py

    terms = ", ".join(f"'{t}'" for t in sorted(set(tokenize_py(query))))

    def toks(col: str) -> str:
        return (
            f"[t FOR t IN regexp_extract_all(lower({col}), '{TOKEN_PATTERN}') "
            f"IF t NOT IN ({_STOP_SQL})]"
        )

    return f"""
WITH n AS (SELECT count(*) AS n FROM part),
raw AS (
  SELECT p_partkey AS doc_id, 'p_name' AS field, unnest({toks('p_name')}) AS term FROM part
  UNION ALL
  SELECT p_partkey AS doc_id, 'p_type' AS field, unnest({toks('p_type')}) AS term FROM part),
ftf AS (SELECT doc_id, field, term, count(*) AS tf FROM raw GROUP BY 1, 2, 3),
flen AS (SELECT doc_id, field, sum(tf) AS flen FROM ftf GROUP BY 1, 2),
avgf AS (SELECT field, sum(flen) * 1.0 / (SELECT n FROM n) AS avgfl FROM flen GROUP BY 1),
q AS (SELECT unnest([{terms}]) AS term),
dictf AS (SELECT term, count(DISTINCT doc_id) AS df FROM ftf JOIN q USING (term) GROUP BY 1),
wtf AS (
  SELECT f.doc_id, f.term,
         sum((CASE f.field WHEN 'p_name' THEN {BM25F_WN} ELSE {BM25F_WT} END)
             * f.tf / (1.0 + {BM25F_B} * (l.flen / a.avgfl - 1.0))) AS wtf
  FROM ftf f JOIN q USING (term)
  JOIN flen l ON l.doc_id = f.doc_id AND l.field = f.field
  JOIN avgf a ON a.field = f.field
  GROUP BY 1, 2),
scored AS (
  SELECT w.doc_id AS doc_id,
         round(sum(ln(1.0 + ((SELECT n FROM n) - d.df + 0.5) / (d.df + 0.5))
                   * ({BM25F_K1} + 1.0) * w.wtf / ({BM25F_K1} + w.wtf)), {ROUND_DP}) AS score
  FROM wtf w JOIN dictf d USING (term)
  GROUP BY 1)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


MM_TIE = 0.4  # even last digit: tie·(5dp sub-score) can't hit a decimal midpoint


def q_multi_match_topk(spark, sf_dir):
    """ES multi_match type=best_fields over the part table's two text
    fields: each field scored as an independent BM25 sub-query (field df,
    field avgdl) × its boost, then per doc best + 0.4·(rest) — dis_max
    semantics, one union + one groupBy(max, sum). Contrast with
    bm25f_topk, which pools tfs under one saturation."""
    from pyspark.sql import Window

    from .fielded import multi_match_best_fields

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    scored = multi_match_best_fields(
        spark, part, "p_partkey",
        {"p_name": BM25F_WN, "p_type": BM25F_WT},
        BM25F_QUERY, tie_breaker=MM_TIE, k1=BM25F_K1, b=BM25F_B,
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BM25F_K)
        .drop("rn")
    )


def _multi_match_sql(query: str, k: int) -> str:
    from .tokenizer import tokenize_py

    terms = ", ".join(f"'{t}'" for t in sorted(set(tokenize_py(query))))

    def toks(col: str) -> str:
        return (
            f"[t FOR t IN regexp_extract_all(lower({col}), '{TOKEN_PATTERN}') "
            f"IF t NOT IN ({_STOP_SQL})]"
        )

    def field_cte(fld: str, w: float) -> str:
        return f"""
tf_{fld} AS (
  SELECT p_partkey AS doc_id, term, count(*) AS tf
  FROM (SELECT p_partkey, unnest({toks(fld)}) AS term FROM part) r(p_partkey, term)
  GROUP BY 1, 2),
len_{fld} AS (SELECT doc_id, sum(tf) AS doc_len FROM tf_{fld} GROUP BY 1),
avg_{fld} AS (SELECT sum(doc_len) * 1.0 / (SELECT n FROM n) AS avgdl FROM len_{fld}),
dict_{fld} AS (SELECT term, count(*) AS df FROM tf_{fld} GROUP BY 1),
scored_{fld} AS (
  SELECT t.doc_id,
         round({w} * sum(ln(1.0 + ((SELECT n FROM n) - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * ({BM25F_K1} + 1.0))
               / (t.tf + {BM25F_K1} * (1.0 - {BM25F_B} + {BM25F_B} * l.doc_len / a.avgdl))),
               {ROUND_DP}) AS score
  FROM tf_{fld} t JOIN dict_{fld} d USING (term)
  JOIN len_{fld} l ON l.doc_id = t.doc_id CROSS JOIN avg_{fld} a
  WHERE t.term IN ({terms})
  GROUP BY 1)"""

    return f"""
WITH n AS (SELECT count(*) AS n FROM part),{field_cte('p_name', BM25F_WN)},{field_cte('p_type', BM25F_WT)}
SELECT doc_id, round(mx + {MM_TIE} * (sm - mx), {ROUND_DP}) AS score
FROM (SELECT doc_id, max(score) AS mx, sum(score) AS sm FROM
      (SELECT * FROM scored_p_name UNION ALL SELECT * FROM scored_p_type) u
      GROUP BY 1) z
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


WILDCARD_PATTERN = "s*"  # matches 6 corpus terms; cap keeps the top 4 by df
WILDCARD_MAX_EXP = 4
WILDCARD_K = 40


def q_wildcard_topk(spark, sf_dir):
    """Dictionary-backed wildcard search (Lucene WildcardQuery analogue):
    glob pattern → matching dictionary terms capped at max_expansions by
    (df desc, term asc) → BM25 OR over the expansion on the segment path.
    The cap is deliberately smaller than the match set (6 terms match
    ``s*``), so a wrong expansion ordering is a hash mismatch."""
    eng = _shared_index(spark, sf_dir)
    return _topk_rounded(
        spark,
        eng.search_wildcard(
            WILDCARD_PATTERN, k=WILDCARD_K + 25, max_expansions=WILDCARD_MAX_EXP
        ),
        WILDCARD_K,
    )


RX_PATTERN = "s(ort|tream)|merge"  # matches sort/stream/merge; cap keeps 2
RX_MAX_EXP = 2
RX_K = 40


def q_regexp_topk(spark, sf_dir):
    """Dictionary-backed regexp search (Lucene RegexpQuery analogue):
    anchored full-term regex → matching dictionary terms capped at
    max_expansions by (df desc, term asc) → BM25 OR over the expansion.
    The pattern exercises alternation (no prefix pushdown possible) and
    the cap is smaller than the 3-term match set, so both the anchoring
    and the expansion ordering are in the hash."""
    eng = _shared_index(spark, sf_dir)
    return _topk_rounded(
        spark,
        eng.search_regexp(RX_PATTERN, k=RX_K + 25, max_expansions=RX_MAX_EXP),
        RX_K,
    )


def _regexp_sql(rx: str, max_exp: int, k: int,
                k1: float = 1.5, b: float = 0.75) -> str:
    """SQL twin: same implicit full-term anchoring, same (df desc,
    term asc) cap, then plain BM25 over the expanded term set."""
    body = rx.lower()
    body = body[1:] if body.startswith("^") else body
    anchored = "^(?:" + (body[:-1] if body.endswith("$") else body) + ")$"
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (SELECT term FROM dict WHERE regexp_matches(term, '{anchored}')
      ORDER BY df DESC, term ASC LIMIT {max_exp}),
scored AS (
  SELECT tf.doc_id AS doc_id,
         round(sum(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
                   * (tf.tf * ({k1} + 1.0))
                   / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))), {ROUND_DP}) AS score
  FROM tf
  JOIN q USING (term)
  JOIN dict d USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id
  CROSS JOIN corpus c
  GROUP BY tf.doc_id)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def _wildcard_sql(pattern: str, max_exp: int, k: int,
                  k1: float = 1.5, b: float = 0.75) -> str:
    """SQL twin: same glob→regex translation, same (df desc, term asc) cap,
    then plain BM25 over the expanded term set."""
    import re

    rx = "^" + "".join(
        ".*" if c == "*" else "." if c == "?" else re.escape(c)
        for c in pattern.lower()
    ) + "$"
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (SELECT term FROM dict WHERE regexp_matches(term, '{rx}')
      ORDER BY df DESC, term ASC LIMIT {max_exp}),
scored AS (
  SELECT tf.doc_id AS doc_id,
         round(sum(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
                   * (tf.tf * ({k1} + 1.0))
                   / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))), {ROUND_DP}) AS score
  FROM tf
  JOIN q USING (term)
  JOIN dict d USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id
  CROSS JOIN corpus c
  GROUP BY tf.doc_id)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


FUZZY_TERM = "sprt"  # d1: sort (boost .75); d2: part, spark (boost .5, df tie)
FUZZY_MAX_EDITS = 2
FUZZY_MAX_EXP = 2  # < match set (3), so cap ordering is hash-checked
FUZZY_K = 40


def q_fuzzy_topk(spark, sf_dir):
    """Dictionary-backed fuzzy search (Lucene FuzzyQuery analogue):
    Levenshtein expansion capped by (dist asc, df desc, term asc), each
    match weighted by the classic similarity boost
    1 - dist/min(len(q), len(t)) folded into idf. 'sprt' matches sort/part/
    spark; part and spark tie on df so the term-asc tiebreak, the cap, AND
    the per-term boosts are all visible in the value hash."""
    eng = _shared_index(spark, sf_dir)
    return _topk_rounded(
        spark,
        eng.search_fuzzy(
            FUZZY_TERM, k=FUZZY_K + 25,
            max_edits=FUZZY_MAX_EDITS, max_expansions=FUZZY_MAX_EXP,
        ),
        FUZZY_K,
    )


def _fuzzy_sql(term: str, max_edits: int, max_exp: int, k: int,
               k1: float = 1.5, b: float = 0.75) -> str:
    """SQL twin: same length band, thresholded distance, boost formula,
    and (dist asc, df desc, term asc) cap; BM25 with idf scaled by boost."""
    qlen = len(term)
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (
  SELECT term, df, levenshtein(term, '{term}') AS dist,
         1.0 - levenshtein(term, '{term}')::DOUBLE
               / least(length(term), {qlen}) AS boost
  FROM dict
  WHERE abs(length(term) - {qlen}) <= {max_edits}
    AND levenshtein(term, '{term}') <= {max_edits}
    AND 1.0 - levenshtein(term, '{term}')::DOUBLE
        / least(length(term), {qlen}) > 0
  ORDER BY dist ASC, df DESC, term ASC LIMIT {max_exp}),
scored AS (
  SELECT tf.doc_id AS doc_id,
         round(sum(q.boost
                   * ln(1.0 + (c.n - q.df + 0.5) / (q.df + 0.5))
                   * (tf.tf * ({k1} + 1.0))
                   / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))), {ROUND_DP}) AS score
  FROM tf
  JOIN q USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id
  CROSS JOIN corpus c
  GROUP BY tf.doc_id)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


MLT_DOC_ID = 285  # 29 distinct terms incl. rare 'dup' — idf must dominate
MLT_MAX_TERMS = 5  # < 29, so the tf·idf selection ordering is hash-checked
MLT_K = 40


def q_mlt_topk(spark, sf_dir):
    """MoreLikeThis: top tf·idf terms of a source document → BM25 OR over
    the selection, source excluded. max_terms far below the doc's distinct
    term count makes the selection ordering itself part of the hash; the
    rare high-idf term 'dup' must beat every high-tf common term."""
    eng = _shared_index(spark, sf_dir)
    text = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") == MLT_DOC_ID)
        .select("text")
        .collect()[0][0]
    )
    return _topk_rounded(
        spark,
        eng.more_like_this(
            text, k=MLT_K + 25, max_terms=MLT_MAX_TERMS,
            exclude_doc_id=MLT_DOC_ID,
        ),
        MLT_K,
    )


def _mlt_sql(doc_id: int, max_terms: int, k: int,
             k1: float = 1.5, b: float = 0.75) -> str:
    """SQL twin: same tf·idf selection (rounded to 6 dp, term-asc ties),
    plain BM25 over the selected terms, source doc excluded."""
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df,
                ln(1.0 + ((SELECT count(*) FROM stats) - count(*) + 0.5)
                       / (count(*) + 0.5)) AS idf
         FROM tf GROUP BY 1),
sel AS (
  SELECT s.term
  FROM tf s JOIN dict d USING (term)
  WHERE s.doc_id = {doc_id}
  ORDER BY round(s.tf * d.idf, 6) DESC, s.term ASC
  LIMIT {max_terms}),
scored AS (
  SELECT tf.doc_id AS doc_id,
         round(sum(d.idf
                   * (tf.tf * ({k1} + 1.0))
                   / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))), {ROUND_DP}) AS score
  FROM tf
  JOIN sel USING (term)
  JOIN dict d USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id
  CROSS JOIN corpus c
  WHERE tf.doc_id != {doc_id}
  GROUP BY tf.doc_id)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


QS_QUERY = '+sort stream "merge sort" lang:en -dup'
QS_K = 20


def q_query_string_topk(spark, sf_dir):
    """Lucene-style query string composing every clause type in one query:
    SHOULD (stream) + MUST (+sort) + exact phrase ("merge sort", positional
    index) + metadata filter (lang:en) + MUST_NOT (-dup). 9 docs satisfy
    the composition at sf0.01, so the hash checks constraint intersection,
    the in-kernel veto, AND the BM25 scoring over the positive-term
    union."""
    eng = _shared_index(spark, sf_dir, positional=True)
    docs = _docs(spark, sf_dir)
    rows = eng.search_query_string(QS_QUERY, k=QS_K + 10, metadata=docs)
    return _topk_rounded(spark, rows, QS_K)


QS_BOOST_QUERY = 'stream^2 scan^0.5 sort -dup n_chars:[150 TO 400]'
QS_BOOST_K = 20


def q_query_string_boosted(spark, sf_dir):
    """Query string exercising the round-3 extensions: per-term boosts
    (^2 and ^0.5 — powers of two, so the engine's idf fold and the SQL
    twin's in-expression multiply are bit-identical) + a numeric
    ``field:[lo TO hi]`` range filter + MUST_NOT. Boost changes the
    RANKING (stream-heavy docs outrank scan-heavy ones), so the hash
    checks the boosted scores, not just the filtered set."""
    eng = _shared_index(spark, sf_dir, positional=True)
    docs = _docs(spark, sf_dir)
    rows = eng.search_query_string(QS_BOOST_QUERY, k=QS_BOOST_K + 10,
                                   metadata=docs)
    return _topk_rounded(spark, rows, QS_BOOST_K)


def _query_string_sql(qs: str, k: int) -> str:
    """Generic SQL twin built from the SAME parse as the engine: BM25 over
    the positive-term union, constrained by phrase/must/filter, MUST_NOT
    excluded."""
    from .querylang import parse_query_string
    from .tokenizer import tokenize_py

    p = parse_query_string(qs)
    scored = _bm25_sql(" ".join(p.positive_terms), weights=p.boosts or None)
    toks = (
        f"[t FOR t IN regexp_extract_all(lower(text), '{TOKEN_PATTERN}') "
        f"IF t NOT IN ({_STOP_SQL})]"
    )
    joins, preds = [], []
    for i, ph in enumerate(p.phrases):
        needle = " " + " ".join(tokenize_py(ph)) + " "
        joins.append(
            f"""JOIN (SELECT doc_id FROM (
    SELECT doc_id, ' ' || array_to_string({toks}, ' ') || ' ' AS joined
    FROM documents)
  WHERE position('{needle}' IN joined) > 0) ph{i} USING (doc_id)"""
        )
    if p.must:
        terms = ", ".join(f"'{t}'" for t in sorted(set(p.must)))
        joins.append(
            f"""JOIN (SELECT doc_id FROM tfq WHERE term IN ({terms})
  GROUP BY doc_id HAVING count(DISTINCT term) = {len(set(p.must))}) mt USING (doc_id)"""
        )
    for f, v in p.filters:
        preds.append(
            f"s.doc_id IN (SELECT doc_id FROM documents WHERE {f} = '{v}')"
        )
    for f, lo, hi in p.ranges:
        conds = []
        if lo is not None:
            conds.append(f"{f} >= {lo}")
        if hi is not None:
            conds.append(f"{f} <= {hi}")
        preds.append(
            "s.doc_id IN (SELECT doc_id FROM documents WHERE "
            + " AND ".join(conds) + ")"
        )
    if p.must_not:
        terms = ", ".join(f"'{t}'" for t in sorted(set(p.must_not)))
        preds.append(
            f"s.doc_id NOT IN (SELECT DISTINCT doc_id FROM tfq WHERE term IN ({terms}))"
        )
    where = ("WHERE " + "\n  AND ".join(preds)) if preds else ""
    return f"""
WITH tfq AS ({_TF_SQL}),
scored AS ({scored})
SELECT s.doc_id AS doc_id, s.score AS score
FROM scored s
{chr(10).join(joins)}
{where}
ORDER BY s.score DESC, s.doc_id ASC
LIMIT {k}
"""


FACET_QUERY = "dup stream"  # dup is rare (df≈25), stream common — skewed union


def q_facet_lang_or(spark, sf_dir):
    """Facet counts over the FULL OR-match set (Solr/ES facet semantics):
    matched doc_ids from the index kernels ⋈ document metadata, grouped by
    lang. Distributed end-to-end — the match set never hits the driver."""
    eng = _shared_index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return eng.facet_counts(FACET_QUERY, docs, "lang", mode="or")


def q_facet_source_and(spark, sf_dir):
    """Same surface in AND mode: the intersection kernel (rare-term
    candidate set) feeds the facet aggregation, grouped by source."""
    eng = _shared_index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return eng.facet_counts(FACET_QUERY, docs, "source", mode="and")


def q_facet_stats(spark, sf_dir):
    """Numeric stats aggregation (ES `stats`) over the FULL OR-match set:
    n/min/max/sum/avg of n_chars per lang. avg rounded for cross-engine
    hashing; the integer columns are exact."""
    eng = _shared_index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = eng.facet_stats(FACET_QUERY, docs, "n_chars", by="lang", mode="or")
    return out.select(
        "lang", "n", "min", "max", "sum", F.round("avg", ROUND_DP).alias("avg")
    )


def _facet_stats_sql(query_terms: list[str], stat_col: str, by: str) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT d.{by} AS {by},
       count(*)::BIGINT AS n,
       min(d.{stat_col}) AS min,
       max(d.{stat_col}) AS max,
       sum(d.{stat_col})::BIGINT AS sum,
       round(avg(d.{stat_col}), {ROUND_DP}) AS avg
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1
"""


def _facet_sql(query_terms: list[str], facet_col: str, mode: str) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    if mode == "and":
        matched = f"""SELECT doc_id FROM tf WHERE term IN ({terms})
  GROUP BY doc_id HAVING count(DISTINCT term) = {len(query_terms)}"""
    else:
        matched = f"SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})"
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS ({matched})
SELECT d.{facet_col} AS {facet_col}, count(*) AS n
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1
"""


COMPOSITE_KEYS = ["lang", "source"]
COMPOSITE_SIZE = 10
COMPOSITE_AFTER = ("de", "src5")  # mid-space cursor → page 2 shape


DS_MAX_PER, DS_SIZE = 3, 25


def q_diversified_sampler(spark, sf_dir):
    """ES diversified_sampler: best-scoring sample of the match set, capped
    at max_docs_per_value docs per source so one hot source can't dominate
    downstream aggregations. Scores round BEFORE the cap/cut windows so
    the sample boundary is engine-independent."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return eng.diversified_sampler(
        FACET_QUERY, docs, "source",
        max_docs_per_value=DS_MAX_PER, shard_size=DS_SIZE, round_dp=ROUND_DP,
    )


def _diversified_sampler_sql(query: str, field: str, max_per: int, size: int) -> str:
    return f"""
WITH scored AS ({_bm25_sql(query)}),
j AS (SELECT s.doc_id, s.score, d.{field}
      FROM scored s JOIN documents d USING (doc_id)),
capped AS (SELECT *, row_number() OVER (
             PARTITION BY {field} ORDER BY score DESC, doc_id ASC) AS rn
           FROM j)
SELECT doc_id, score, {field} FROM capped WHERE rn <= {max_per}
ORDER BY score DESC, doc_id ASC LIMIT {size}
"""


def q_facet_composite(spark, sf_dir):
    """Composite aggregation (ES composite): page through the FULL
    (lang, source) bucket space of the match set in key order, resuming
    strictly after a cursor — deep facet pagination with bounded pages."""
    eng = _shared_index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = eng.facet_composite(
        FACET_QUERY, docs, COMPOSITE_KEYS,
        size=COMPOSITE_SIZE, after=COMPOSITE_AFTER, mode="or",
    )
    return out.withColumn("n", F.col("n").cast("long"))


def _facet_composite_sql(
    query_terms: list[str], keys: list[str], size: int, after: tuple
) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    kl = ", ".join(keys)
    cursor = ", ".join(f"'{v}'" for v in after)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
b AS (SELECT {", ".join(f"d.{k} AS {k}" for k in keys)}, count(*)::BIGINT AS n
      FROM matched m JOIN documents d USING (doc_id)
      GROUP BY {kl})
SELECT * FROM b WHERE ({kl}) > ({cursor})
ORDER BY {kl} LIMIT {size}
"""


RANGE_BUCKETS = [
    # (name, lo, hi) — half-open [lo, hi); None = unbounded. 'mid' overlaps
    # 'short' and 'long' is empty-adjacent: exercises ES's overlap +
    # keep-empty semantics (sf0.01 n_chars spans 48..553)
    ("short", None, 200),
    ("mid", 150, 400),
    ("long", 400, None),
    ("beyond", 1000, 2000),
    ("all", None, None),
]

FILTER_BUCKETS = {
    # independent named predicates (ES filters agg): overlap + empty kept
    "english": "lang = 'en'",
    "longdoc": "n_chars >= 300",
    "en_long": "lang = 'en' AND n_chars >= 300",
    "never": "n_chars < 0",
}

ADJ_FILTERS = {
    # disjoint langs (de&en bucket must vanish) + one crossing predicate
    "de": "lang = 'de'",
    "en": "lang = 'en'",
    "long": "n_chars >= 300",
}

RARE_QUERY = "dup"  # df≈25 at sf0.01 → per-source counts 1..3
RARE_MAX_DOC_COUNT = 2  # splits the source space 16/17 (non-vacuous)


def q_facet_range(spark, sf_dir):
    """Range aggregation (ES `range`): user-defined, possibly OVERLAPPING
    half-open buckets over n_chars of the match set — every bucket lands
    in one conditional-sum hash aggregation pass (a doc counts into each
    bucket containing it, so groupBy cannot express this), empty buckets
    kept at 0 like ES."""
    eng = _shared_index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return eng.facet_range(FACET_QUERY, docs, "n_chars", RANGE_BUCKETS)


def _facet_range_sql(query_terms, col, ranges) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)

    def cond(lo, hi):
        c = []
        if lo is not None:
            c.append(f"v >= {lo}")
        if hi is not None:
            c.append(f"v < {hi}")
        return " AND ".join(c) or "TRUE"

    counts = ", ".join(
        f"count(*) FILTER (WHERE {cond(lo, hi)})::BIGINT AS \"{name}\""
        for name, lo, hi in ranges
    )
    unions = "\nUNION ALL ".join(
        f"SELECT '{name}' AS bucket, \"{name}\" AS n FROM agg"
        for name, _, _ in ranges
    )
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
j AS (SELECT d.{col} AS v FROM matched m JOIN documents d USING (doc_id)),
agg AS (SELECT {counts} FROM j)
{unions}
"""


def q_facet_filters(spark, sf_dir):
    """Filters aggregation (ES `filters`): independent named boolean
    buckets over the match set's metadata — a doc counts toward EVERY
    filter it satisfies; one conditional-sum aggregation, empty buckets
    kept."""
    eng = _shared_index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return eng.facet_filters(FACET_QUERY, docs, FILTER_BUCKETS)


def _facet_filters_sql(query_terms, filters: dict) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    counts = ", ".join(
        f"count(*) FILTER (WHERE {expr})::BIGINT AS \"{name}\""
        for name, expr in filters.items()
    )
    unions = "\nUNION ALL ".join(
        f"SELECT '{name}' AS \"filter\", \"{name}\" AS n FROM agg"
        for name in filters
    )
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
j AS (SELECT d.* FROM matched m JOIN documents d USING (doc_id)),
agg AS (SELECT {counts} FROM j)
{unions}
"""


def q_facet_rare_terms(spark, sf_dir):
    """Rare-terms aggregation (ES `rare_terms`): the long-tail buckets a
    top-n terms facet cannot surface — sources appearing in ≤2 matched
    docs of the rare-term query's match set. Exact distributed groupBy +
    post-filter (ES's CuckooFilter approximation is a named trade we
    don't need: the agg is distributed and the tail output is bounded)."""
    eng = _shared_index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return eng.facet_rare_terms(
        RARE_QUERY, docs, "source", max_doc_count=RARE_MAX_DOC_COUNT
    )


def _facet_rare_terms_sql(query_terms, col, max_doc_count: int) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT d.{col} AS {col}, count(*)::BIGINT AS n
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1 HAVING count(*) <= {max_doc_count}
"""


def q_facet_adjacency(spark, sf_dir):
    """Adjacency-matrix aggregation (ES `adjacency_matrix`): counts for
    each named filter and each pairwise intersection (key 'a&b'), empty
    intersections omitted — all n(n+1)/2 buckets in ONE aggregation pass.
    de&en must vanish (disjoint langs); the lang&long crossings stay."""
    eng = _shared_index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return eng.facet_adjacency_matrix(FACET_QUERY, docs, ADJ_FILTERS)


def _facet_adjacency_sql(query_terms, filters: dict) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    names = sorted(filters)
    cells = []
    for i, a in enumerate(names):
        for b in names[i:]:
            key = a if a == b else f"{a}&{b}"
            cells.append(
                (key, f"count(*) FILTER (WHERE ({filters[a]}) AND "
                      f"({filters[b]}))::BIGINT")
            )
    counts = ", ".join(f'{expr} AS "{key}"' for key, expr in cells)
    unions = "\nUNION ALL ".join(
        f"SELECT '{key}' AS key, \"{key}\" AS n FROM agg" for key, _ in cells
    )
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
j AS (SELECT d.* FROM matched m JOIN documents d USING (doc_id)),
agg AS (SELECT {counts} FROM j)
SELECT * FROM ({unions}) WHERE n > 0
"""


def q_facet_matrix_stats(spark, sf_dir):
    """Matrix-stats aggregation (ES `matrix_stats`): pairwise sample
    covariance + Pearson correlation between n_chars and the regex token
    count over the match set — one single-pass distributed moment
    aggregation (covar_samp/corr partials are mergeable), one row per
    unordered field pair."""
    from .ops import textstats

    eng = _shared_index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    meta = docs.join(
        textstats.token_count(docs).select("doc_id", "n_re_tokens"), "doc_id"
    )
    out = eng.facet_matrix_stats(FACET_QUERY, meta, ["n_chars", "n_re_tokens"])
    return out.select(
        "field_a", "field_b", "n",
        F.round("mean_a", ROUND_DP).alias("mean_a"),
        F.round("mean_b", ROUND_DP).alias("mean_b"),
        F.round("covariance", ROUND_DP).alias("covariance"),
        F.round("correlation", ROUND_DP).alias("correlation"),
    )


def _facet_matrix_stats_sql(query_terms) -> str:
    from .ops.textstats import token_count_sql

    terms = ", ".join(f"'{t}'" for t in query_terms)
    pairs = [("n_chars", "n_chars"), ("n_chars", "n_re_tokens"),
             ("n_re_tokens", "n_re_tokens")]
    cells = ", ".join(
        f"round(covar_samp({a}, {b}), {ROUND_DP}) AS cov_{a}_{b}, "
        f"round(corr({a}, {b}), {ROUND_DP}) AS cor_{a}_{b}"
        for a, b in pairs
    )
    means = ", ".join(
        f"round(avg({c}), {ROUND_DP}) AS mean_{c}"
        for c in ("n_chars", "n_re_tokens")
    )
    unions = "\nUNION ALL ".join(
        f"SELECT '{a}' AS field_a, '{b}' AS field_b, n, mean_{a} AS mean_a, "
        f"mean_{b} AS mean_b, cov_{a}_{b} AS covariance, "
        f"cor_{a}_{b} AS correlation FROM agg"
        for a, b in pairs
    )
    return f"""
WITH tf AS ({_TF_SQL}),
tc AS ({token_count_sql("documents")}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
j AS (SELECT d.n_chars, t.n_re_tokens
      FROM matched m JOIN documents d USING (doc_id)
      JOIN tc t USING (doc_id)),
agg AS (SELECT count(*)::BIGINT AS n, {means}, {cells} FROM j)
{unions}
"""


HIST_INTERVAL = 100.0  # n_chars histogram bucket width
TV_MOD = 97  # term-vector docs: doc_id % TV_MOD == 0 (deterministic set)
SIG_TOP_N = 20


def q_facet_histogram(spark, sf_dir):
    """Histogram aggregation (ES `histogram`) over the FULL OR-match set:
    n_chars bucketed at width 100, counted per bucket — matched ids from
    the index kernels ⋈ metadata, one hash agg with map-side partials."""
    eng = _shared_index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return eng.facet_histogram(FACET_QUERY, docs, "n_chars", HIST_INTERVAL)


def q_term_vectors(spark, sf_dir):
    """Per-doc term vectors decoded straight off the index (Lucene
    TermVectors analogue): (doc_id, term, tf, dl) for a deterministic
    allow-set — hash-checked against the text-scan tf truth, proving the
    index stores exactly what the tokenizer produced."""
    eng = _shared_index(spark, sf_dir)
    ids = [
        r[0]
        for r in _docs(spark, sf_dir)
        .filter(F.col("doc_id") % TV_MOD == 0)
        .select("doc_id")
        .collect()
    ]
    return eng.term_vectors(ids)


def q_significant_terms(spark, sf_dir):
    """Significant-terms aggregation (ES JLH): terms overrepresented in
    the FACET_QUERY match set vs the corpus, fg_df from postings ⋈ match
    set, bg_df/N from the dictionary, score rounded to 6 dp pre-ordering
    for deterministic top-n selection."""
    eng = _shared_index(spark, sf_dir)
    return eng.significant_terms(FACET_QUERY, top_n=SIG_TOP_N)


def _facet_histogram_sql(query_terms: list[str], stat_col: str,
                         interval: float) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT floor(d.{stat_col} / {interval!r}) * {interval!r} AS bucket,
       count(*) AS n
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1
"""


DATE_HIST_EPOCH = "2024-01-01"
DATE_HIST_MOD = 540  # docs carry no timestamp: ts := epoch + (doc_id % 540) days
DATE_HIST_UNIT = "month"
PCTL_PS = [0.25, 0.5, 0.75, 0.95]
RRF_K = 20
RRF_WINDOW = 50


def _date_meta(spark, sf_dir) -> DataFrame:
    """Deterministic per-doc timestamp (documents carry none): epoch +
    (doc_id % 540) days — pure integer arithmetic, identical in the SQL
    twin, spanning ~18 months so the monthly histogram has >1 bucket."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(
            f"cast(date_add(date '{DATE_HIST_EPOCH}', "
            f"cast(doc_id % {DATE_HIST_MOD} as int)) as timestamp)"
        ).alias("ts"),
    )


def q_facet_date_histogram(spark, sf_dir):
    """Calendar-bucketed date_histogram (ES `date_histogram`,
    calendar_interval=month) over the FULL OR-match set: matched ids ⋈
    timestamp metadata, date_trunc to month, count per bucket; bucket
    returned as a DATE-cast string (engine-independent)."""
    eng = _shared_index(spark, sf_dir)
    return eng.facet_date_histogram(
        FACET_QUERY, _date_meta(spark, sf_dir), "ts", unit=DATE_HIST_UNIT
    )


def _facet_date_histogram_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
meta AS (SELECT doc_id,
                CAST(DATE '{DATE_HIST_EPOCH}'
                     + CAST(doc_id % {DATE_HIST_MOD} AS INT) AS TIMESTAMP) AS ts
         FROM documents)
SELECT CAST(CAST(date_trunc('{DATE_HIST_UNIT}', mt.ts) AS DATE) AS VARCHAR) AS bucket,
       count(*) AS n
FROM matched m JOIN meta mt USING (doc_id)
GROUP BY 1
"""


SDIFF_LAG = 2
MULTI_TERMS_K = 12


def q_facet_serial_diff(spark, sf_dir):
    """ES serial_diff pipeline agg: lag-2 differencing over the monthly
    histogram (NULL first two buckets, like ES); the window runs on the
    |buckets|-row aggregated frame."""
    eng = _shared_index(spark, sf_dir)
    return eng.facet_date_histogram_serial_diff(
        FACET_QUERY, _date_meta(spark, sf_dir), "ts",
        unit=DATE_HIST_UNIT, lag=SDIFF_LAG,
    )


def _facet_serial_diff_sql(query_terms: list[str]) -> str:
    inner = _facet_date_histogram_sql(query_terms)
    return f"""
SELECT bucket, n, n - lag(n, {SDIFF_LAG}) OVER (ORDER BY bucket) AS sdiff
FROM ({inner}) h
"""


def q_facet_stats_bucket(spark, sf_dir):
    """ES stats_bucket (generalizes avg/sum/min/max_bucket): one row of
    stats over the sibling monthly histogram's bucket counts."""
    eng = _shared_index(spark, sf_dir)
    return eng.facet_stats_bucket(
        FACET_QUERY, _date_meta(spark, sf_dir), "ts",
        unit=DATE_HIST_UNIT, round_dp=ROUND_DP,
    )


def _facet_stats_bucket_sql(query_terms: list[str]) -> str:
    inner = _facet_date_histogram_sql(query_terms)
    return f"""
SELECT count(*)::BIGINT AS buckets, min(n) AS min_n, max(n) AS max_n,
       sum(n) AS sum_n, round(avg(n), {ROUND_DP}) AS avg_n
FROM ({inner}) h
"""


PB_PS = [0.25, 0.5, 0.9]


def q_facet_percentiles_bucket(spark, sf_dir):
    """ES percentiles_bucket: exact PERCENTILE_CONT percentiles of the
    sibling monthly histogram's bucket counts (one row, p25/p50/p90)."""
    eng = _shared_index(spark, sf_dir)
    return eng.facet_percentiles_bucket(
        FACET_QUERY, _date_meta(spark, sf_dir), "ts", PB_PS,
        unit=DATE_HIST_UNIT, round_dp=ROUND_DP,
    )


def _facet_percentiles_bucket_sql(query_terms: list[str]) -> str:
    inner = _facet_date_histogram_sql(query_terms)
    cols = ", ".join(
        f"round(quantile_cont(n, {p}), {ROUND_DP}) AS p{int(p * 100):02d}"
        for p in PB_PS
    )
    return f"SELECT {cols} FROM ({inner}) h"


def q_facet_multi_terms(spark, sf_dir):
    """ES multi_terms: compound-key (lang, source) buckets of the match
    set, top-k by count with deterministic (count desc, keys asc) ties."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return eng.facet_multi_terms(
        FACET_QUERY, docs, ["lang", "source"], k=MULTI_TERMS_K
    )


def _facet_multi_terms_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT d.lang AS lang, d.source AS source, count(*)::BIGINT AS n
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1, 2
ORDER BY n DESC, lang ASC, source ASC
LIMIT {MULTI_TERMS_K}
"""


PIPE_WINDOW = 3


def q_facet_pipeline(spark, sf_dir):
    """ES pipeline aggs over the monthly date histogram: cumulative_sum,
    derivative (first bucket NULL, like ES), moving_fn avg over a
    trailing 3-bucket window. Windows run on the |buckets|-row aggregated
    frame — single-partition there is correct by construction."""
    eng = _shared_index(spark, sf_dir)
    return eng.facet_date_histogram_pipeline(
        FACET_QUERY, _date_meta(spark, sf_dir), "ts",
        unit=DATE_HIST_UNIT, window=PIPE_WINDOW, round_dp=ROUND_DP,
    )


def _facet_pipeline_sql(query_terms: list[str]) -> str:
    inner = _facet_date_histogram_sql(query_terms)
    return f"""
SELECT bucket, n,
       sum(n) OVER (ORDER BY bucket) AS cum_n,
       n - lag(n) OVER (ORDER BY bucket) AS diff_n,
       round(avg(n) OVER (ORDER BY bucket
             ROWS BETWEEN {PIPE_WINDOW - 1} PRECEDING AND CURRENT ROW),
             {ROUND_DP}) AS moving_avg
FROM ({inner}) h
"""


def q_facet_percentiles(spark, sf_dir):
    """Percentiles aggregation (ES `percentiles`, exact PERCENTILE_CONT
    semantics rather than the t-digest approximation — the oracle is
    DuckDB quantile_cont, the same SQL-standard linear interpolation) of
    n_chars per lang over the FULL OR-match set."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = eng.facet_percentiles(
        FACET_QUERY, docs, "n_chars", PCTL_PS, by="lang", mode="or"
    )
    pcols = [c for c in out.columns if c.startswith("p")]
    return out.select(
        "lang", "n", *[F.round(c, ROUND_DP).alias(c) for c in pcols]
    )


def _facet_percentiles_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    pexprs = ",\n       ".join(
        f"round(quantile_cont(d.n_chars, {p!r}), {ROUND_DP}) AS "
        f"p{str(round(p * 100, 4)).rstrip('0').rstrip('.')}"
        for p in PCTL_PS
    )
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT d.lang AS lang, count(*)::BIGINT AS n,
       {pexprs}
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1
"""


PRANK_VALUES = [150.0, 300.0, 450.0]


def q_facet_percentile_ranks(spark, sf_dir):
    """percentile_ranks (ES — the inverse of percentiles): % of the match
    set's n_chars at or below each probe value, per lang. Exact count
    ratio, one hash agg."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = eng.facet_percentile_ranks(
        FACET_QUERY, docs, "n_chars", PRANK_VALUES, by="lang", mode="or"
    )
    rcols = [c for c in out.columns if c.startswith("rank_")]
    return out.select(
        "lang", "n", *[F.round(c, ROUND_DP).alias(c) for c in rcols]
    )


def _facet_percentile_ranks_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    rexprs = ",\n       ".join(
        f"round(100.0 * sum(CASE WHEN d.n_chars <= {float(v)!r} THEN 1 ELSE 0 END)"
        f" / count(*), {ROUND_DP}) AS "
        f"rank_{str(round(float(v), 4)).rstrip('0').rstrip('.')}"
        for v in PRANK_VALUES
    )
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT d.lang AS lang, count(*)::BIGINT AS n,
       {rexprs}
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1
"""


def q_facet_weighted_avg(spark, sf_dir):
    """weighted_avg (ES): Σ(value·weight)/Σ(weight) of n_chars per lang
    over the FULL OR-match set, weight = (doc_id % 7) + 1 — the ES script
    weight as a JVM column expression, deterministic in both engines."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = eng.facet_weighted_avg(
        FACET_QUERY, docs, "n_chars",
        (F.col("doc_id") % 7 + 1), by="lang", mode="or",
    )
    return out.select(
        "lang", "n", F.round("weighted_avg", ROUND_DP).alias("weighted_avg")
    )


def _facet_weighted_avg_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT d.lang AS lang, count(*)::BIGINT AS n,
       round(sum(d.n_chars::DOUBLE * ((d.doc_id % 7) + 1))
             / sum(((d.doc_id % 7) + 1)::DOUBLE), {ROUND_DP}) AS weighted_avg
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1
"""


def q_facet_boxplot(spark, sf_dir):
    """boxplot (ES): min/q1/q2/q3/max/iqr of n_chars per lang over the
    FULL OR-match set — exact PERCENTILE_CONT quartiles (oracle: DuckDB
    quantile_cont), one distributed aggregation."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = eng.facet_boxplot(FACET_QUERY, docs, "n_chars", by="lang", mode="or")
    return out.select(
        "lang", "n", "min", "max",
        *[F.round(c, ROUND_DP).alias(c) for c in ("q1", "q2", "q3", "iqr")],
    )


def _facet_boxplot_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT d.lang AS lang, count(*)::BIGINT AS n,
       min(d.n_chars) AS min, max(d.n_chars) AS max,
       round(quantile_cont(d.n_chars, 0.25), {ROUND_DP}) AS q1,
       round(quantile_cont(d.n_chars, 0.5), {ROUND_DP}) AS q2,
       round(quantile_cont(d.n_chars, 0.75), {ROUND_DP}) AS q3,
       round(quantile_cont(d.n_chars, 0.75)
             - quantile_cont(d.n_chars, 0.25), {ROUND_DP}) AS iqr
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1
"""


def q_facet_mad(spark, sf_dir):
    """median_absolute_deviation (ES): median(|x − median(x)|) of n_chars
    per lang over the FULL OR-match set. Exact two-pass (inner median
    aggregated first, |groups|-row broadcast back), vs ES's one-pass
    t-digest approximation — exactness is the oracle contract."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = eng.facet_median_absolute_deviation(
        FACET_QUERY, docs, "n_chars", by="lang", mode="or"
    )
    return out.select("lang", "n", F.round("mad", ROUND_DP).alias("mad"))


def _facet_mad_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
j AS (SELECT d.lang, d.n_chars FROM matched m JOIN documents d USING (doc_id)),
med AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM j GROUP BY 1)
SELECT j.lang AS lang, count(*)::BIGINT AS n,
       round(quantile_cont(abs(j.n_chars::DOUBLE - med.med), 0.5),
             {ROUND_DP}) AS mad
FROM j JOIN med USING (lang)
GROUP BY 1
"""


def q_facet_string_stats(spark, sf_dir):
    """string_stats (ES): count, min/max/avg length, and Shannon entropy
    (bits) of the pooled character distribution of matched docs' text,
    per lang — ES's show_distribution entropy over the FULL OR-match
    set."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = eng.facet_string_stats(FACET_QUERY, docs, "text", by="lang", mode="or")
    return out.select(
        "lang", "n", "min_length", "max_length",
        F.round("avg_length", ROUND_DP).alias("avg_length"),
        F.round("entropy", ROUND_DP).alias("entropy"),
    )


def _facet_string_stats_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
j AS (SELECT d.lang, d.text FROM matched m JOIN documents d USING (doc_id)),
lens AS (SELECT lang, count(*)::BIGINT AS n,
                min(length(text)) AS min_length,
                max(length(text)) AS max_length,
                avg(length(text)) AS avg_length
         FROM j GROUP BY 1),
chars AS (SELECT lang, unnest(string_split(text, '')) AS ch FROM j),
cc AS (SELECT lang, ch, count(*)::DOUBLE AS cnt FROM chars
       WHERE ch <> '' GROUP BY 1, 2),
ent AS (SELECT lang,
               log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt) AS entropy
        FROM cc GROUP BY 1)
SELECT lens.lang AS lang, n, min_length, max_length,
       round(avg_length, {ROUND_DP}) AS avg_length,
       round(ent.entropy, {ROUND_DP}) AS entropy
FROM lens JOIN ent USING (lang)
"""


TOPM_SIZE = 5


def q_facet_top_metrics(spark, sf_dir):
    """top_metrics (ES): lang/source of the 5 longest matched docs
    (sort n_chars desc, ties doc_id asc — deterministic cut), via
    TakeOrderedAndProject per-partition heaps."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return eng.facet_top_metrics(
        FACET_QUERY, docs, "n_chars", ["lang", "source"],
        size=TOPM_SIZE, ascending=False, mode="or",
    )


def _facet_top_metrics_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT d.doc_id AS doc_id, d.n_chars AS n_chars,
       d.lang AS lang, d.source AS source
FROM matched m JOIN documents d USING (doc_id)
ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT {TOPM_SIZE}
"""


def q_facet_t_test(spark, sf_dir):
    """t_test (ES, Welch/heteroscedastic — the ES default): t statistic
    and Welch df between the en and de populations' n_chars within the
    FULL OR-match set; one conditional-aggregate pass, no second scan."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = eng.facet_t_test(
        FACET_QUERY, docs, "n_chars", "lang", "en", "de", mode="or"
    )
    return out.select(
        "n_a", "n_b",
        F.round("mean_a", ROUND_DP).alias("mean_a"),
        F.round("mean_b", ROUND_DP).alias("mean_b"),
        F.round("t", ROUND_DP).alias("t"),
        F.round("df", ROUND_DP).alias("df"),
    )


def _facet_t_test_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
j AS (SELECT d.lang, d.n_chars::DOUBLE AS v
      FROM matched m JOIN documents d USING (doc_id)),
agg AS (SELECT
  count(*) FILTER (lang = 'en')::BIGINT AS n_a,
  count(*) FILTER (lang = 'de')::BIGINT AS n_b,
  avg(v) FILTER (lang = 'en') AS mean_a,
  avg(v) FILTER (lang = 'de') AS mean_b,
  var_samp(v) FILTER (lang = 'en') AS va,
  var_samp(v) FILTER (lang = 'de') AS vb
FROM j)
SELECT n_a, n_b,
       round(mean_a, {ROUND_DP}) AS mean_a,
       round(mean_b, {ROUND_DP}) AS mean_b,
       round((mean_a - mean_b) / sqrt(va / n_a + vb / n_b), {ROUND_DP}) AS t,
       round(pow(va / n_a + vb / n_b, 2)
             / (pow(va / n_a, 2) / (n_a - 1)
                + pow(vb / n_b, 2) / (n_b - 1)), {ROUND_DP}) AS df
FROM agg
"""


BSEL_HAVING_N, BSEL_HAVING_SUM = 19, 6300
BSORT_SIZE, BSORT_FROM = 5, 2


def _facet_buckets_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
b AS (SELECT d.source AS source, count(*)::BIGINT AS n,
             sum(d.n_chars)::BIGINT AS sum, avg(d.n_chars) AS avg
      FROM matched m JOIN documents d USING (doc_id)
      GROUP BY 1)"""


def q_facet_bucket_selector(spark, sf_dir):
    """bucket_selector (ES pipeline agg): keep only the source buckets
    whose aggregates pass the having-script — predicates on EXACT integer
    metrics (n, sum) so the keep/drop decision is engine-independent."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = eng.facet_bucket_selector(
        FACET_QUERY, docs, "source", "n_chars",
        (F.col("n") >= BSEL_HAVING_N) & (F.col("sum") > BSEL_HAVING_SUM),
        mode="or",
    )
    return out.select(
        "source", "n", "sum", F.round("avg", ROUND_DP).alias("avg")
    )


def _facet_bucket_selector_sql(query_terms: list[str]) -> str:
    return f"""{_facet_buckets_sql(query_terms)}
SELECT source, n, sum, round(avg, {ROUND_DP}) AS avg
FROM b WHERE n >= {BSEL_HAVING_N} AND sum > {BSEL_HAVING_SUM}
"""


def q_facet_bucket_sort(spark, sf_dir):
    """bucket_sort (ES pipeline agg): source buckets ordered by their
    summed n_chars (an exact integer — rank decisions are engine-
    independent), paginated from=2 size=5, ties on the bucket key."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = eng.facet_bucket_sort(
        FACET_QUERY, docs, "source", "n_chars",
        sort_by="sum", ascending=False, size=BSORT_SIZE, from_=BSORT_FROM,
        mode="or",
    )
    return out.select(
        "source", "n", "sum", F.round("avg", ROUND_DP).alias("avg"),
        F.col("bucket_rank").cast("long").alias("bucket_rank"),
    )


def _facet_bucket_sort_sql(query_terms: list[str]) -> str:
    return f"""{_facet_buckets_sql(query_terms)}
SELECT source, n, sum, round(avg, {ROUND_DP}) AS avg, bucket_rank
FROM (SELECT *, row_number() OVER (ORDER BY sum DESC, source ASC)::BIGINT
             AS bucket_rank
      FROM b) r
WHERE bucket_rank > {BSORT_FROM} AND bucket_rank <= {BSORT_FROM + BSORT_SIZE}
"""


def q_facet_geo_bounds(spark, sf_dir):
    """geo_bounds (ES): bounding box (top/left/bottom/right) of the match
    set's points — min/max only, exactly reproducible cross-engine."""
    eng = _shared_index(spark, sf_dir)
    return eng.facet_geo_bounds(FACET_QUERY, _geo_docs(spark, sf_dir), mode="or")


_GEO_META_SQL = """
SELECT doc_id,
       (doc_id * 7919 % 18000) / 100.0 - 90.0 AS lat,
       (doc_id * 104729 % 36000) / 100.0 - 180.0 AS lon
FROM documents"""


def _facet_geo_bounds_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
g AS ({_GEO_META_SQL})
SELECT count(*)::BIGINT AS n, max(lat) AS top, min(lon) AS "left",
       min(lat) AS bottom, max(lon) AS "right"
FROM matched m JOIN g USING (doc_id)
"""


def q_facet_geo_centroid(spark, sf_dir):
    """geo_centroid (ES): flat arithmetic mean lat/lon of the match set's
    points (ES's own definition), rounded for cross-engine hashing."""
    eng = _shared_index(spark, sf_dir)
    return eng.facet_geo_centroid(
        FACET_QUERY, _geo_docs(spark, sf_dir), round_dp=ROUND_DP, mode="or"
    )


def _facet_geo_centroid_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
g AS ({_GEO_META_SQL})
SELECT count(*)::BIGINT AS n, round(avg(lat), {ROUND_DP}) AS lat,
       round(avg(lon), {ROUND_DP}) AS lon
FROM matched m JOIN g USING (doc_id)
"""


DATE_RANGES = [
    ("early", None, "2024-07-01"),
    ("mid", "2024-07-01", "2025-01-01"),
    ("late", "2025-01-01", None),
]


def q_facet_date_range(spark, sf_dir):
    """date_range (ES): counts per named range (from inclusive, to
    exclusive, open ends) over the match set's derived timestamps — all
    ranges in ONE conditional-aggregation pass, empty ranges included."""
    eng = _shared_index(spark, sf_dir)
    return eng.facet_date_range(
        FACET_QUERY, _date_meta(spark, sf_dir), "ts", DATE_RANGES, mode="or"
    )


def _facet_date_range_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    arms = []
    for key, lo, hi in DATE_RANGES:
        conds = []
        if lo is not None:
            conds.append(f"j.ts >= TIMESTAMP '{lo} 00:00:00'")
        if hi is not None:
            conds.append(f"j.ts < TIMESTAMP '{hi} 00:00:00'")
        cond = " AND ".join(conds) or "TRUE"
        arms.append(
            f"SELECT '{key}' AS range_key, "
            f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS n FROM j"
        )
    union = "\nUNION ALL\n".join(arms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
meta AS (SELECT doc_id,
                CAST(DATE '{DATE_HIST_EPOCH}'
                     + CAST(doc_id % {DATE_HIST_MOD} AS INT) AS TIMESTAMP) AS ts
         FROM documents),
j AS (SELECT mt.ts AS ts FROM matched m JOIN meta mt USING (doc_id))
{union}
"""


AUTO_HIST_TARGET = 24


def q_facet_auto_date_histogram(spark, sf_dir):
    """auto_date_histogram (ES): smallest ladder interval fitting the
    match-set span into ≤24 buckets (fixed-second ladder — documented
    deviation from ES's calendar steps, keeps edges exactly SQL-
    reproducible), then one histogram pass."""
    eng = _shared_index(spark, sf_dir)
    return eng.facet_auto_date_histogram(
        FACET_QUERY, _date_meta(spark, sf_dir), "ts",
        target_buckets=AUTO_HIST_TARGET, mode="or",
    )


def _facet_auto_date_histogram_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    ladder = ", ".join(
        f"({s})" for s in (1, 10, 60, 300, 1800, 3600, 10800, 43200,
                           86400, 604800, 2592000, 31536000)
    )
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
meta AS (SELECT doc_id,
                CAST(DATE '{DATE_HIST_EPOCH}'
                     + CAST(doc_id % {DATE_HIST_MOD} AS INT) AS TIMESTAMP) AS ts
         FROM documents),
ep AS (SELECT floor(epoch(mt.ts))::BIGINT AS e
       FROM matched m JOIN meta mt USING (doc_id)),
span AS (SELECT max(e) - min(e) AS s FROM ep),
iv AS (SELECT coalesce(min(i), 31536000)::BIGINT AS interval
       FROM (VALUES {ladder}) t(i), span
       WHERE s // i + 1 <= {AUTO_HIST_TARGET})
SELECT (e // interval) * interval AS bucket, count(*)::BIGINT AS n,
       interval AS interval_sec
FROM ep, iv
GROUP BY 1, 3
"""


def q_facet_extended_stats(spark, sf_dir):
    """Extended stats (ES `extended_stats`): stats + sum_sq/var_pop/
    stddev_pop of n_chars per lang over the FULL OR-match set. Moments are
    rounded; the driver canonicalizer compares at 6 significant digits, so
    the engines' different single-pass variance algorithms agree."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = eng.facet_extended_stats(FACET_QUERY, docs, "n_chars", by="lang")
    return out.select(
        "lang", "n", "min", "max", "sum",
        F.round("avg", ROUND_DP).alias("avg"),
        F.col("sum_sq").cast("long").alias("sum_sq"),
        F.round("variance", 3).alias("variance"),
        F.round("std_dev", 3).alias("std_dev"),
    )


def _facet_extended_stats_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT d.lang AS lang, count(*)::BIGINT AS n,
       min(d.n_chars) AS min, max(d.n_chars) AS max,
       sum(d.n_chars)::BIGINT AS sum,
       round(avg(d.n_chars), {ROUND_DP}) AS avg,
       sum(d.n_chars * d.n_chars)::BIGINT AS sum_sq,
       round(var_pop(d.n_chars), 3) AS variance,
       round(stddev_pop(d.n_chars), 3) AS std_dev
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1
"""


def q_facet_cardinality(spark, sf_dir):
    """Distinct-count aggregation (ES `cardinality`) over the FULL
    OR-match set: exact count-distinct of source per lang. The HLL++
    variant (approx=True) is the named 100 TB trade; the oracle checks
    the exact path."""
    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return eng.facet_cardinality(FACET_QUERY, docs, "source", by="lang")


def _facet_cardinality_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT d.lang AS lang, count(DISTINCT d.source)::BIGINT AS n_distinct
FROM matched m JOIN documents d USING (doc_id)
GROUP BY 1
"""


TOP_HITS_N = 3


def q_top_hits(spark, sf_dir):
    """Top-hits-per-group aggregation (ES `top_hits` in a terms bucket):
    the 3 best BM25 hits per lang — generalizes field collapsing; every
    group returns its leaders. Ranks over the ROUNDED score so hit_rank is
    engine-independent."""
    from .scoring import top_hits

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl)
    docs = _docs(spark, sf_dir)
    return top_hits(scored, docs, "lang", TOP_HITS_N, round_dp=ROUND_DP)


def _top_hits_sql(query: str, n_hits: int) -> str:
    bm = _bm25_sql(query).strip()
    return f"""
WITH bm AS (SELECT * FROM ({bm}))
SELECT lang, doc_id, score, hit_rank FROM (
  SELECT d.lang AS lang, bm.doc_id AS doc_id, bm.score AS score,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY bm.score DESC, bm.doc_id ASC)::BIGINT AS hit_rank
  FROM bm JOIN documents d USING (doc_id))
WHERE hit_rank <= {n_hits}
"""


DECON_W = 5
DECON_PRED = "doc_id % 31 = 0"  # deterministic stand-in benchmark set


def q_decontamination(spark, sf_dir):
    """Benchmark decontamination (the GPT-3/PaLM/Llama n-gram procedure):
    flag train docs sharing ≥1 distinct 5-gram with any doc of a
    deterministic stand-in benchmark set (doc_id % 31 == 0 of the same
    corpus — superset self-pairs at overlap_frac 1.0 are the built-in
    sanity signal). Benchmark shingles broadcast; the corpus side is one
    map-side pass."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.expr(DECON_PRED))
    return dedup.contaminated_pairs(docs, bench, w=DECON_W, min_overlap=1)


SAMPLE_RATE = 0.35
SAMPLE_SEED = 7
STRAT_RATES = {"en": 0.2, "fr": 0.6, "zh": 1.0}
STRAT_DEFAULT = 0.05


def q_sample_deterministic(spark, sf_dir):
    """Deterministic hash-based Bernoulli sample (training-data curation):
    membership = md5(doc_id‖seed) threshold — a pure function of the row
    id, so the selected SET is identical at any parallelism and on any
    engine (the oracle reproduces it row-for-row, not statistically).
    Spark's own `DataFrame.sample` is seeded per-partition and cannot make
    this guarantee."""
    from .ops.sampling import sample_rate

    docs = _docs(spark, sf_dir)
    return sample_rate(docs, SAMPLE_RATE, seed=SAMPLE_SEED).select(
        "doc_id", "lang"
    )


DSIR_N = 60
DSIR_SEED = 7
DSIR_BUCKETS = 256
DSIR_TARGET = "lang = 'en'"


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    bag-of-features log-likelihood ratio of target (lang='en') vs raw, per
    doc — two hash aggregations and a broadcast of the 256-row λ model."""
    from .ops.selection import dsir_weights

    docs = _docs(spark, sf_dir)
    return dsir_weights(docs, DSIR_TARGET, n_buckets=DSIR_BUCKETS).select(
        "doc_id", F.round("logw", 5).alias("logw")
    )


def q_dsir_select(spark, sf_dir):
    """DSIR selection: Gumbel-top-N over the importance weights — an exact
    seeded sample without replacement ∝ softmax(logw), deterministic in
    both engines (the Gumbel noise is an md5 hash of (doc_id, seed))."""
    from .ops.selection import dsir_select

    docs = _docs(spark, sf_dir)
    return dsir_select(
        docs, DSIR_TARGET, DSIR_N, seed=DSIR_SEED, n_buckets=DSIR_BUCKETS
    )


def _dsir_weights_sql() -> str:
    from .ops.selection import dsir_weights_sql

    return dsir_weights_sql(
        "documents", f"d.{DSIR_TARGET}", n_buckets=DSIR_BUCKETS
    )


def _dsir_select_sql() -> str:
    from .ops.selection import dsir_select_sql

    return dsir_select_sql(
        "documents", f"d.{DSIR_TARGET}", DSIR_N, seed=DSIR_SEED,
        n_buckets=DSIR_BUCKETS,
    )


RESAMPLE_RATES = {"en": 2.3, "de": 0.5, "es": 1.0}


def q_resample_stratified(spark, sf_dir):
    """Epoch repeat factors (resampling WITH replacement): en rows appear
    2 or 3 times (frac decided by the seeded unit hash), de is halved,
    everything else passes through once — one narrow pass implements the
    whole mixture recipe; `copy` indexes the repeats."""
    from .ops.sampling import resample_stratified

    docs = _docs(spark, sf_dir)
    return resample_stratified(
        docs, RESAMPLE_RATES, by="lang", seed=SAMPLE_SEED
    ).select("doc_id", "lang", "copy")


def _resample_sql() -> str:
    from .ops.sampling import resample_stratified_sql

    inner = resample_stratified_sql(
        "(SELECT doc_id, lang FROM documents)",
        RESAMPLE_RATES, by="lang", seed=SAMPLE_SEED,
    )
    return f"SELECT doc_id, lang, copy FROM ({inner}) r"


def q_sample_stratified(spark, sf_dir):
    """Per-stratum deterministic sampling (domain/language rebalancing):
    lang-keyed keep rates as one stateless CASE-threshold filter pass —
    the 10^12-row remix is a single map stage, no shuffle."""
    from .ops.sampling import sample_stratified

    docs = _docs(spark, sf_dir)
    return sample_stratified(
        docs, STRAT_RATES, by="lang", seed=SAMPLE_SEED,
        default_rate=STRAT_DEFAULT,
    ).select("doc_id", "lang")


MIX_WEIGHTS = {
    "src0": 0.45, "src1": 0.25, "src2": 0.15,
    "src3": 0.08, "src4": 0.05, "src5": 0.02,
}
MIX_BUDGET = 9_000.0
MIX_EPOCHS = 2.0


def q_mixture_plan(spark, sf_dir):
    """Token-budget data recipe (LLaMA/DoReMi mixing step): waterfill the
    budget over sources by target weight, saturating low-capacity sources
    at max_epochs and redistributing — closed form via two window cumsums
    over |sources| rows; the only corpus-scale work is one map-side-combined
    token-count aggregation."""
    from .ops.sampling import mixture_plan

    return mixture_plan(
        _docs(spark, sf_dir), MIX_BUDGET, MIX_WEIGHTS, max_epochs=MIX_EPOCHS,
    )


def _mixture_plan_sql() -> str:
    from .ops.sampling import mixture_plan_sql

    return mixture_plan_sql(
        "documents", MIX_BUDGET, MIX_WEIGHTS, max_epochs=MIX_EPOCHS,
    )


def q_mixture_apply(spark, sf_dir):
    """Materialized data recipe: waterfilled plan → per-source epoch
    rates → deterministic repeat/subsample expansion (narrow explode, no
    shuffle). The only corpus-scale work is one token-count aggregation
    plus one stateless expansion pass."""
    from .ops.sampling import mixture_apply

    return mixture_apply(
        _docs(spark, sf_dir), MIX_BUDGET, MIX_WEIGHTS, max_epochs=MIX_EPOCHS,
        seed=11,
    ).select("doc_id", "source", "copy")


def _mixture_apply_sql() -> str:
    from .ops.sampling import mixture_apply_sql

    inner = mixture_apply_sql(
        "documents", MIX_BUDGET, MIX_WEIGHTS, max_epochs=MIX_EPOCHS, seed=11,
    )
    return f"SELECT doc_id, source, copy FROM ({inner})"


def _sample_sql(rate_by_lang: dict | None) -> str:
    from .ops.sampling import _DENOM, _HEX_DIGITS

    h = (
        f"CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || "
        f"':{SAMPLE_SEED}'), 1, {_HEX_DIGITS})) AS UBIGINT)"
    )
    if rate_by_lang is None:
        pred = f"{h} / {_DENOM!r} < {float(SAMPLE_RATE)!r}"
    else:
        case = "CASE lang " + " ".join(
            f"WHEN '{k}' THEN {float(v)!r}" for k, v in sorted(rate_by_lang.items())
        ) + f" ELSE {float(STRAT_DEFAULT)!r} END"
        pred = f"{h} / {_DENOM!r} < {case}"
    return f"SELECT doc_id, lang FROM documents WHERE {pred}"


def q_split_by_group(spark, sf_dir):
    """Leakage-safe train/valid/test split keyed on the GROUP (source)
    so near-duplicate rows of one origin never straddle splits — a
    stateless md5-threshold CASE, zero shuffle."""
    from .ops.sampling import split_by_group

    return split_by_group(_docs(spark, sf_dir), by="source", seed=SAMPLE_SEED).select(
        "doc_id", "source", "split"
    )


SHUFFLE_SHARDS_N = 4


def q_shuffle_shards(spark, sf_dir):
    """Deterministic global corpus shuffle: shard + within-shard position
    are pure md5 functions of doc_id — the training-shard writer's
    coordinates, identical at any parallelism (SQL twin is exact)."""
    from .ops.sampling import shuffle_shards

    return shuffle_shards(
        _docs(spark, sf_dir), SHUFFLE_SHARDS_N, seed=SAMPLE_SEED
    ).select("doc_id", "shard", "pos")


SORTED_K = 15


def q_sorted_search(spark, sf_dir):
    """Field-sorted retrieval (ES sort-by-field): the FACET_QUERY match
    set ordered by n_chars descending, top-15 — TakeOrderedAndProject
    over the match set, never a global sort. Rank over the (value,
    doc_id) order so the column set is engine-independent."""
    from pyspark.sql import Window

    eng = _shared_index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    hits = eng.search_sorted(
        FACET_QUERY, docs, "n_chars", k=SORTED_K, ascending=False
    )
    df = spark.createDataFrame(
        [(int(d), int(v)) for d, v in hits], "doc_id long, n_chars long"
    )
    w = Window.partitionBy().orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return df.withColumn("rank", F.row_number().over(w).cast("long"))


def _sorted_search_sql(query_terms: list[str]) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms}))
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)::BIGINT AS rank
FROM matched m JOIN documents d USING (doc_id)
ORDER BY n_chars DESC, doc_id ASC
LIMIT {SORTED_K}
"""


PERC_QUERIES = [
    ("p1", "spark join stream", "or"),
    ("p2", "hash merge sort", "and"),
    ("p3", "customer order line", "and"),
    ("p4", "window group order", "or"),
    ("p5", "the of and", "or"),  # stopword-only → matches nothing
]


def q_percolate(spark, sf_dir):
    """Reverse search (ES percolator / Lucene Monitor): stored queries
    with per-query or/and modes, streamed documents — (doc_id, query_id)
    for every match. Saved-query term set broadcasts; the corpus side is
    one tokenize → semi-join → count pass."""
    from .percolate import percolate

    q = spark.createDataFrame(
        PERC_QUERIES, "query_id string, query string, mode string"
    )
    return percolate(_docs(spark, sf_dir), q)


def _percolate_sql() -> str:
    from .percolate import percolate_sql

    vals = ", ".join(f"('{i}', '{q}', '{m}')" for i, q, m in PERC_QUERIES)
    return percolate_sql("documents", vals)


PII_FIXTURE = [
    (1, "contact alice.smith+spam@example.co.uk or bob@test.io today"),
    (2, "server at 192.168.1.254 and 10.0.0.1 port 8080"),
    (3, "ssn 123-45-6789 phone +1-555-867-5309 and 5551234567"),
    (4, "no personal data in this document at all"),
    (5, "mixed: eve@corp.example, 172.16.254.3, call 020-7946-0958"),
]


def _pii_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(PII_FIXTURE, "doc_id long, text string")


def _pii_fixture_cte() -> str:
    vals = ", ".join(f"({i}, '{t}')" for i, t in PII_FIXTURE)
    return f"pii_docs(doc_id, text) AS (VALUES {vals})"


def q_pii_counts(spark, sf_dir):
    """PII detection counts (Dolma/CCNet scrub-stage analogue): per-doc
    email/ssn/ipv4/phone hit counts over a literal fixture (the sf corpus
    is synthetic lowercase prose — no PII to find; same fixture discipline
    as entity/code tokens). Portable-regex subset so Java, RE2, and
    Python agree match-for-match."""
    from .ops.pii import pii_counts

    return pii_counts(_pii_fixture_df(spark))


def q_pii_redact(spark, sf_dir):
    """PII redaction: typed placeholders in the pinned most-specific-first
    order; the full scrubbed text is hash-checked, so both engines must
    agree on every match boundary."""
    from .ops.pii import redact_pii

    return redact_pii(_pii_fixture_df(spark)).select("doc_id", "text")


def _pii_sql(kind: str) -> str:
    from .ops.pii import pii_counts_sql, redact_pii_sql

    body = (pii_counts_sql if kind == "counts" else redact_pii_sql)("pii_docs")
    return f"WITH {_pii_fixture_cte()}\n{body}"


def q_repetition_stats(spark, sf_dir):
    """Gopher/Dolma repetition quality signals (Rae et al. 2021 §A1.1):
    dup-token / top-2-gram / dup-2-gram / dup-line fractions per doc —
    the threshold inputs of every production training-data quality
    filter. Array HOFs for distincts; the 2-gram mode is two hash aggs
    keyed on (doc, gram) then doc."""
    return textstats.repetition_stats(_docs(spark, sf_dir))


def q_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion (ES `rrf` retriever) of two independent
    rankings of the same query — lexical BM25 and vector-space cosine —
    fused scale-free on RANKS (score(d) = Σ 1/(60 + rank)), the principled
    hybrid the reference's fixed-weight score blends are not. Both input
    rankings are rounded to ROUND_DP before ranking (engine-independent
    ranks), the RRF contribution is an exact function of the integer rank,
    and the fused sum of two exactly-representable doubles is
    order-independent, so the whole pipeline hashes identically to the
    SQL twin."""
    from .fusion import rrf_fuse

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    bm = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl).select(
        "doc_id", F.round("score", ROUND_DP).alias("score")
    )
    cos = cosine_score(spark, tf, stats, dct, BM25_QUERY, n).select(
        "doc_id", F.round("score", ROUND_DP).alias("score")
    )
    fused = rrf_fuse([bm, cos], k=RRF_K, window=RRF_WINDOW)
    return fused.select(
        "doc_id", F.round("score", ROUND_DP).alias("score"), "rank"
    )


def _rrf_fusion_sql(query: str) -> str:
    bm = _bm25_sql(query).strip()
    cos = _cosine_sql(query).strip()
    return f"""
WITH bm AS (SELECT * FROM ({bm})),
cos AS (SELECT * FROM ({cos})),
contrib AS (
  SELECT doc_id, 1.0 / (60 + r) AS c FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r FROM bm)
  WHERE r <= {RRF_WINDOW}
  UNION ALL
  SELECT doc_id, 1.0 / (60 + r) AS c FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r FROM cos)
  WHERE r <= {RRF_WINDOW}
),
fused AS (SELECT doc_id, sum(c) AS s FROM contrib GROUP BY 1)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, round(s, {ROUND_DP}) AS score,
         row_number() OVER (ORDER BY s DESC, doc_id ASC)::BIGINT AS rank
  FROM fused)
WHERE rank <= {RRF_K}
"""


GEO_LAT0, GEO_LON0 = 10.0, 20.0
GEO_K = 25
GEO_RADIUS_KM = 4000.0


def _geo_docs(spark, sf_dir) -> DataFrame:
    """Deterministic per-doc coordinates (documents carry none): pure
    int64 arithmetic on doc_id, identical in the SQL twin, covering the
    full lat/lon range."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        (F.expr("doc_id * 7919 % 18000") / 100.0 - 90.0).alias("lat"),
        (F.expr("doc_id * 104729 % 36000") / 100.0 - 180.0).alias("lon"),
    )


def q_geo_topk(spark, sf_dir):
    """k nearest docs by great-circle distance with a radius prune (ES
    `geo_distance` sort): sargable bounding-box filter first (the part a
    geo-cell layout prunes on), exact haversine decides membership,
    distance ROUNDED before ordering so the rank is engine-independent.
    The oracle is a box-free full-scan haversine — the box being
    conservative is therefore hash-checked, not assumed."""
    from .ops.geo import geo_distance_topk

    geo = _geo_docs(spark, sf_dir)
    return geo_distance_topk(
        geo, GEO_LAT0, GEO_LON0, GEO_K,
        radius_km=GEO_RADIUS_KM, round_dp=ROUND_DP,
    )


GEOTILE_ZOOM = 4


def q_geotile_grid(spark, sf_dir):
    """ES geotile_grid: doc counts per web-mercator z/x/y tile (zoom 4) —
    the heat-map primitive; pure column math + one hash aggregation."""
    from .ops.geo import geotile_grid

    return geotile_grid(_geo_docs(spark, sf_dir), GEOTILE_ZOOM)


def _geotile_grid_sql() -> str:
    from .ops.geo import geotile_grid_sql

    return geotile_grid_sql(
        """(SELECT doc_id,
           (doc_id * 7919 % 18000) / 100.0 - 90.0 AS lat,
           (doc_id * 104729 % 36000) / 100.0 - 180.0 AS lon
           FROM documents)""",
        GEOTILE_ZOOM,
    )


def _geo_topk_sql() -> str:
    return f"""
WITH geo AS (
  SELECT doc_id,
         (doc_id * 7919 % 18000) / 100.0 - 90.0 AS lat,
         (doc_id * 104729 % 36000) / 100.0 - 180.0 AS lon
  FROM documents),
d AS (
  SELECT doc_id,
         2.0 * 6371.0088 * asin(sqrt(
             pow(sin(radians(lat - {GEO_LAT0!r}) / 2), 2)
             + cos(radians({GEO_LAT0!r})) * cos(radians(lat))
               * pow(sin(radians(lon - {GEO_LON0!r}) / 2), 2)
         )) AS dist
  FROM geo)
SELECT doc_id, round(dist, {ROUND_DP}) AS dist_km FROM d
WHERE dist <= {GEO_RADIUS_KM!r}
ORDER BY round(dist, {ROUND_DP}) ASC, doc_id ASC
LIMIT {GEO_K}
"""


GEO_PAIR_RADIUS_KM = 700.0
_GEO_LAYOUTS: dict[str, str] = {}


def _geo_layout(spark, sf_dir: str) -> str:
    """Write the stored geo layout once per sf_dir per process."""
    path = _GEO_LAYOUTS.get(sf_dir)
    if path is None:
        from .ops.geo import geo_write

        path = _tmpdir("segeo_") + "/geo"
        geo_write(_geo_docs(spark, sf_dir), path, cell_deg=10.0)
        _GEO_LAYOUTS[sf_dir] = path
    return path


def q_geo_stored_topk(spark, sf_dir):
    """The 100 TB geo read path: radius top-k over a MATERIALIZED
    cell-partitioned layout (the intersecting-cell filter partition-prunes
    the scan — plan-tested in tests/test_geo.py) — must equal the box-free
    full-scan haversine oracle exactly."""
    from .ops.geo import geo_stored_topk

    return geo_stored_topk(
        spark, _geo_layout(spark, sf_dir), GEO_LAT0, GEO_LON0, GEO_K,
        radius_km=GEO_RADIUS_KM, round_dp=ROUND_DP,
    )


def q_geo_pairs(spark, sf_dir):
    """All doc pairs within 700 km of each other (ST_DWithin-style
    distance self-join) via the grid-cell equi-join — no cross join; the
    oracle below IS the brute-force cross join, so the cell routing
    (including antimeridian wrap and polar widening) is hash-checked
    against exhaustive truth. Distances rounded so float ordering is
    engine-independent."""
    from .ops.geo import geo_distance_join

    geo = _geo_docs(spark, sf_dir)
    return geo_distance_join(
        geo, GEO_PAIR_RADIUS_KM, round_dp=ROUND_DP
    ).orderBy("id_a", "id_b")


def _geo_pairs_sql() -> str:
    return f"""
WITH geo AS (
  SELECT doc_id,
         (doc_id * 7919 % 18000) / 100.0 - 90.0 AS lat,
         (doc_id * 104729 % 36000) / 100.0 - 180.0 AS lon
  FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(2.0 * 6371.0088 * asin(sqrt(
           pow(sin(radians(b.lat - a.lat) / 2), 2)
           + cos(radians(a.lat)) * cos(radians(b.lat))
             * pow(sin(radians(b.lon - a.lon) / 2), 2)
       )), {ROUND_DP}) AS dist_km
FROM geo a JOIN geo b ON a.doc_id < b.doc_id
WHERE round(2.0 * 6371.0088 * asin(sqrt(
          pow(sin(radians(b.lat - a.lat) / 2), 2)
          + cos(radians(a.lat)) * cos(radians(b.lat))
            * pow(sin(radians(b.lon - a.lon) / 2), 2)
      )), {ROUND_DP}) <= {GEO_PAIR_RADIUS_KM!r}
ORDER BY id_a, id_b
"""


def _term_vectors_sql(mod: int) -> str:
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1)
SELECT tf.doc_id AS doc_id, tf.term AS term, tf.tf AS tf, s.dl AS dl
FROM tf JOIN stats s USING (doc_id)
WHERE tf.doc_id % {mod} = 0
"""


def _significant_terms_sql(query_terms: list[str], top_n: int) -> str:
    # expression shape mirrors the engine exactly (fg_df/fg_total etc. as
    # BIGINT/DOUBLE divisions) so the float64 arithmetic is bit-identical
    terms = ", ".join(f"'{t}'" for t in query_terms)
    fgp = "(f.fg_df / CAST(t.fg_total AS DOUBLE))"
    bgp = "(b.bg_df / CAST(c.n AS DOUBLE))"
    return f"""
WITH tf AS ({_TF_SQL}),
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({terms})),
corpus AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
tot AS (SELECT count(*) AS fg_total FROM matched),
fg AS (SELECT term, count(*)::BIGINT AS fg_df
       FROM tf JOIN matched USING (doc_id) GROUP BY term),
bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM tf GROUP BY term)
SELECT f.term AS term, f.fg_df AS fg_df, b.bg_df AS bg_df,
       round(({fgp} - {bgp}) * ({fgp} / {bgp}), 6) AS score
FROM fg f JOIN bg b USING (term) CROSS JOIN tot t CROSS JOIN corpus c
ORDER BY score DESC, term ASC
LIMIT {top_n}
"""


UPDATE_MOD = 50  # docs with doc_id % 50 == 0 get replaced in place
UPDATE_TEXT = "dup merge dup sort vector"
UPDATE_QUERY = "dup merge stream"
UPDATE_K = 40
_UPDATE_INDEX: dict[str, str] = {}


def _update_index(spark, sf_dir):
    """Epoch-layout index over the sf corpus with doc_id % UPDATE_MOD == 0
    replaced in place via update_docs — built once per driver run."""
    from .query.engine import SearchEngine
    from .streaming.ingest import append_docs

    path = _UPDATE_INDEX.get(sf_dir)
    if path is None:
        path = _tmpdir("seidx_upd_") + "/idx"
        docs = _docs(spark, sf_dir)
        append_docs(docs, path, n_buckets=8, range_bits=3)
        eng = SearchEngine(spark, path)
        updates = docs.filter(F.col("doc_id") % UPDATE_MOD == 0).select(
            "doc_id", F.lit(UPDATE_TEXT).alias("text")
        )
        eng.update_docs(updates)
        _UPDATE_INDEX[sf_dir] = path
        return eng
    return SearchEngine(spark, path)


def q_update_search(spark, sf_dir):
    """In-place document update (Lucene updateDocument semantics): updated
    docs score ONLY their new version (old postings die via the epoch
    watermark), while corpus statistics count both versions until
    compaction — the standard until-merge behaviour, mirrored exactly by
    the twin's stats-corpus/live-corpus split. Hash equality proves both
    the replacement AND the documented stats drift."""
    eng = _update_index(spark, sf_dir)
    return _topk_rounded(
        spark, eng.search(UPDATE_QUERY, k=UPDATE_K + 25), UPDATE_K
    )


def _update_sql(query_terms: list[str], k: int,
                k1: float = 1.5, b: float = 0.75) -> str:
    from .tokenizer import duckdb_tokens_cte

    terms = ", ".join(f"'{t}'" for t in query_terms)
    # each VERSION of a doc is its own pseudo-doc for statistics (vid) —
    # that's exactly what the engine's per-epoch dictionary merge sums
    tf_stats = duckdb_tokens_cte("stats_corpus", "vid", "text")
    tf_live = duckdb_tokens_cte("live_corpus", "doc_id", "text")
    return f"""
WITH upd AS (
  SELECT doc_id, '{UPDATE_TEXT}' AS text FROM documents
  WHERE doc_id % {UPDATE_MOD} = 0),
stats_corpus AS (
  SELECT doc_id * 2 AS vid, text FROM documents
  UNION ALL SELECT doc_id * 2 + 1 AS vid, text FROM upd),
live_corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {UPDATE_MOD} <> 0
  UNION ALL SELECT doc_id, text FROM upd),
tfs AS (SELECT doc_id AS vid, term, count(*)::BIGINT AS tf FROM ({tf_stats})
        GROUP BY 1, term),
tfl AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM ({tf_live})
        GROUP BY doc_id, term),
-- stats count BOTH versions of an updated doc (until-merge semantics)
corpus AS (
  SELECT count(*) AS n, sum(doc_len) AS tot,
         sum(doc_len) / count(*) AS avgdl
  FROM (SELECT vid, sum(tf) AS doc_len FROM tfs GROUP BY 1) x),
dict AS (SELECT term, count(*) AS df FROM tfs GROUP BY 1),
live_stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tfl GROUP BY 1),
scored AS (
  SELECT t.doc_id AS doc_id,
         round(sum(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
                   * (t.tf * ({k1} + 1.0))
                   / (t.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))), {ROUND_DP}) AS score
  FROM tfl t
  JOIN (SELECT unnest([{terms}]) AS term) q USING (term)
  JOIN dict d USING (term)
  JOIN live_stats s ON s.doc_id = t.doc_id
  CROSS JOIN corpus c
  GROUP BY t.doc_id)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


PAGE_QUERY = "spark stream join"
PAGE_SIZE = 25


def q_search_after(spark, sf_dir):
    """Deep pagination (Elasticsearch search_after semantics): page 2 is
    fetched with only the (score, doc_id) cursor of page 1's last hit — no
    offset re-scan, no server-side scroll state, and the cursor filter runs
    inside the kernels BEFORE group-local top-k so any page depth stays
    exact. The entry returns page1 ⧺ page2: hash-equality with the plain
    top-50 SQL proves the pages tile the ranking seamlessly (no overlap, no
    gap) without depending on where the float page boundary lands."""
    eng = _shared_index(spark, sf_dir)
    page1 = eng.search(PAGE_QUERY, k=PAGE_SIZE)
    cursor = page1[-1]
    page2 = eng.search(PAGE_QUERY, k=PAGE_SIZE + 15, after=cursor)
    return _topk_rounded(spark, page1 + page2, 2 * PAGE_SIZE)


SNIPPET_QUERY = "dup stream spark"
SNIPPET_WINDOW = 6


def q_snippets(spark, sf_dir):
    """Best-window snippet offsets over the FULL OR-match set from the
    positional index (Lucene highlighter analogue): per matching doc, the
    window-token span with the most distinct query terms (ties: more total
    matches, then leftmost). start/end/n_terms/n_matches are all integers,
    so the window-selection logic is hash-checked end to end."""
    eng = _shared_index(spark, sf_dir, positional=True)
    return eng.snippets(SNIPPET_QUERY, window=SNIPPET_WINDOW)


def _snippet_sql(query_terms: list[str], window: int) -> str:
    """SQL twin: tokenizer positions via generate_subscripts (1-based →
    -1), anchor windows at every match, count matches and distinct terms
    per window with correlated subqueries, pick the per-doc best by
    (n_terms desc, n_matches desc, start asc)."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    toks = (
        f"[t FOR t IN regexp_extract_all(lower(text), '{TOKEN_PATTERN}') "
        f"IF t NOT IN ({_STOP_SQL})]"
    )
    return f"""
WITH pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS p
  FROM (SELECT doc_id, {toks} AS toks FROM documents)),
m AS (SELECT doc_id, term, p FROM pos WHERE term IN ({terms})),
win AS (
  SELECT a.doc_id, a.p AS start,
         max(b.p) AS "end",
         count(DISTINCT b.term) AS n_terms,
         count(*) AS n_matches
  FROM m a JOIN m b ON a.doc_id = b.doc_id
       AND b.p >= a.p AND b.p < a.p + {window}
  GROUP BY a.doc_id, a.p),
best AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id
    ORDER BY n_terms DESC, n_matches DESC, start ASC) AS rn
  FROM win)
SELECT doc_id, start, "end", n_terms, n_matches FROM best WHERE rn = 1
"""


SUGGEST_PREFIX = "s"  # completes to 6 terms; n=4 makes the df cap observable
SUGGEST_N = 4


def q_suggest(spark, sf_dir):
    """Autocomplete: top-df completions of a prefix from the dictionary
    (df desc, term asc), prefix pushed down to the parquet scan."""
    eng = _shared_index(spark, sf_dir)
    rows = eng.suggest(SUGGEST_PREFIX, n=SUGGEST_N)
    return spark.createDataFrame(rows, "term string, df long")


def _suggest_sql(prefix: str, n: int) -> str:
    return f"""
WITH tf AS ({_TF_SQL}),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
SELECT term, df FROM dict
WHERE term LIKE '{prefix}%'
ORDER BY df DESC, term ASC
LIMIT {n}
"""


EXPLAIN_QUERY = "dup stream"
EXPLAIN_DOCS = [7, 45, 285, 400]


def q_explain_scores(spark, sf_dir):
    """Lucene-style explain(): per-(doc, term) BM25 breakdown — tf/dl from
    the decoded postings, df/idf from the dictionary, contribution as a JVM
    expression. Hash-checks the entire scoring decomposition, not just the
    top-k sums."""
    eng = _shared_index(spark, sf_dir)
    df = eng.explain(EXPLAIN_QUERY, EXPLAIN_DOCS)
    return df.select(
        "doc_id",
        "term",
        "tf",
        "dl",
        "df",
        F.round("idf", ROUND_DP).alias("idf"),
        F.round("contribution", ROUND_DP).alias("contribution"),
    )


def _explain_sql(query_terms: list[str], doc_ids: list[int],
                 k1: float = 1.5, b: float = 0.75) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    ids = ", ".join(str(d) for d in doc_ids)
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df,
                ln(1.0 + ((SELECT count(*) FROM stats) - count(*) + 0.5)
                       / (count(*) + 0.5)) AS idf
         FROM tf GROUP BY 1)
SELECT t.doc_id AS doc_id, t.term AS term, t.tf AS tf, s.doc_len AS dl,
       d.df AS df, round(d.idf, {ROUND_DP}) AS idf,
       round(d.idf * (t.tf * ({k1} + 1.0))
             / (t.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl)),
             {ROUND_DP}) AS contribution
FROM tf t
JOIN stats s ON s.doc_id = t.doc_id
JOIN dict d ON d.term = t.term
CROSS JOIN corpus c
WHERE t.doc_id IN ({ids}) AND t.term IN ({terms})
"""


NEAR_WINDOW = 3


def q_near_topk(spark, sf_dir):
    """Index-native proximity (NEAR): the phrase terms within a 3-token
    window of the filtered stream, any order — a strict superset of the
    exact phrase's matches, scored by the same BM25, so the oracle is the
    phrase oracle with adjacency relaxed to |Δpos| ≤ window (positions via
    DuckDB generate_subscripts on the tokenizer twin)."""
    from pyspark.sql import Window

    eng = _shared_index(spark, sf_dir, positional=True)
    rows = eng.search_near(PHRASE_QUERY, window=NEAR_WINDOW, k=PHRASE_K + 10)
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in rows] or [], "doc_id long, score double"
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PHRASE_K)
        .drop("rn")
    )


def _near_sql(query: str, window: int, k: int) -> str:
    """Unordered 2-term NEAR twin: tokenizer positions via
    generate_subscripts, pairwise |Δpos| ≤ window, BM25 join like phrase."""
    from .tokenizer import tokenize_py

    t1, t2 = sorted(set(tokenize_py(query)))
    toks = (
        f"[t FOR t IN regexp_extract_all(lower(text), '{TOKEN_PATTERN}') "
        f"IF t NOT IN ({_STOP_SQL})]"
    )
    bm25 = _bm25_sql(" ".join(sorted(set(tokenize_py(query)))))
    return f"""
WITH scored AS ({bm25}),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM (SELECT doc_id, {toks} AS toks FROM documents)),
matches AS (
  SELECT DISTINCT a.doc_id FROM pos a JOIN pos b USING (doc_id)
  WHERE a.term = '{t1}' AND b.term = '{t2}' AND abs(a.p - b.p) <= {window})
SELECT s.doc_id AS doc_id, s.score AS score
FROM scored s JOIN matches USING (doc_id)
ORDER BY s.score DESC, s.doc_id ASC
LIMIT {k}
"""


SPAN_NEAR_WINDOW = 4


def q_span_near_topk(spark, sf_dir):
    """Lucene SpanNearQuery with in_order=true: the query terms in QUERY
    order with last-first position span ≤ window on the filtered token
    stream — ordered proximity, strictly between exact phrase (adjacency)
    and unordered NEAR. Candidates/decode/BM25 identical to phrase; the
    chain DP in score_group_near verifies order (query/phrase.py:354-374).
    Parity: Lucene SpanNearQuery / the reference's phrase searcher relaxed
    by slop."""
    from pyspark.sql import Window

    eng = _shared_index(spark, sf_dir, positional=True)
    rows = eng.search_near(
        PHRASE_QUERY, window=SPAN_NEAR_WINDOW, ordered=True, k=PHRASE_K + 10
    )
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in rows] or [], "doc_id long, score double"
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PHRASE_K)
        .drop("rn")
    )


def _span_near_sql(query: str, window: int, k: int) -> str:
    """Ordered 2-term span-near twin: positions in query order
    (b.p > a.p) with span b.p - a.p ≤ window, BM25 join like phrase."""
    from .tokenizer import tokenize_py

    t1, t2 = tokenize_py(query)  # QUERY order, not sorted
    toks = (
        f"[t FOR t IN regexp_extract_all(lower(text), '{TOKEN_PATTERN}') "
        f"IF t NOT IN ({_STOP_SQL})]"
    )
    bm25 = _bm25_sql(" ".join(sorted(set(tokenize_py(query)))))
    return f"""
WITH scored AS ({bm25}),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM (SELECT doc_id, {toks} AS toks FROM documents)),
matches AS (
  SELECT DISTINCT a.doc_id FROM pos a JOIN pos b USING (doc_id)
  WHERE a.term = '{t1}' AND b.term = '{t2}'
    AND b.p > a.p AND b.p - a.p <= {window})
SELECT s.doc_id AS doc_id, s.score AS score
FROM scored s JOIN matches USING (doc_id)
ORDER BY s.score DESC, s.doc_id ASC
LIMIT {k}
"""


# every suffix rule + irregular + guard case fires at least once (the sf
# corpus vocabulary alone is ~29 code tokens with few suffixes)
NORMALIZATION_FIXTURE = (
    "studies wolves classes matches wishes boxes quizzes policemen dogs",
    "went children women mice feet people better worst said goes running",
    "amen gas class sses ties ss ionization relational fulness statements",
    "ingly hopelessly tested testing arguments management achievement",
)


PRF_K_DOCS, PRF_M_TERMS, PRF_BETA = 10, 5, 0.4


def q_bm25_prf(spark, sf_dir):
    """Pseudo-relevance-feedback BM25 (§2.11 corpus-driven rewriter): base
    top-k docs → pooled expansion terms → weighted rescore. Fully
    SQL-expressible, so the whole two-stage pipeline is value-hash-checked."""
    from .scoring import bm25_prf_score

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    out = bm25_prf_score(
        spark, tf, stats, dct, BM25_QUERY, n, avgdl,
        k_docs=PRF_K_DOCS, m_terms=PRF_M_TERMS, beta=PRF_BETA,
    )
    return out.select("doc_id", F.round("score", ROUND_DP).alias("score"))


def _bm25_prf_sql(query: str, k1: float = 1.5, b: float = 0.75) -> str:
    terms = ", ".join(f"'{t}'" for t, _ in parse_query(query))
    score = (
        f"ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))"
        f" * (tf.tf * ({k1} + 1.0))"
        f" / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))"
    )
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q AS (SELECT unnest([{terms}]) AS term),
base AS (
  SELECT tf.doc_id AS doc_id, round(sum({score}), 6) AS score
  FROM tf JOIN q USING (term) JOIN dict d USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c
  GROUP BY tf.doc_id),
topd AS (SELECT doc_id FROM base ORDER BY score DESC, doc_id ASC LIMIT {PRF_K_DOCS}),
pooled AS (
  SELECT tf.term AS term,
         round(sum((tf.tf / s.doc_len) * log10(c.n / d.df)), 6) AS w
  FROM tf JOIN topd USING (doc_id) JOIN dict d ON d.term = tf.term
  JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c
  GROUP BY tf.term),
expq AS (
  SELECT term, 1.0 AS w FROM q
  UNION ALL
  SELECT term, {PRF_BETA} AS w FROM (
    SELECT term FROM pooled WHERE term NOT IN (SELECT term FROM q)
    ORDER BY w DESC, term ASC LIMIT {PRF_M_TERMS}))
SELECT tf.doc_id AS doc_id,
       round(sum(expq.w * {score}), {ROUND_DP}) AS score
FROM tf JOIN expq USING (term) JOIN dict d ON d.term = tf.term
JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c
GROUP BY tf.doc_id
"""


def q_bm25_thesaurus(spark, sf_dir):
    """§2.11 thesaurus expansion end-to-end with the BUNDLED synonym
    resource (the reference's ``search_engine_3``/``search_engine_5``
    shape, ``Part C/searcher_thesaurus.py:40``): query terms keep weight
    1.0, bundled synonyms enter at 0.2, and the weighted BM25 rescore is
    value-hash-checked — the oracle receives the SAME (term, weight) pairs
    as a VALUES table (they are loader-derived config from the static TSV,
    an input to scoring, not an output of it)."""
    from .expansion import make_thesaurus_rewriter, rewrite_query
    from .scoring import bm25_weighted_score

    weighted = rewrite_query(INNER_QUERY, make_thesaurus_rewriter())
    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    out = bm25_weighted_score(spark, tf, stats, dct, weighted, n, avgdl)
    return out.select("doc_id", F.round("score", ROUND_DP).alias("score"))


#: misspellings of INNER_QUERY terms covering the spell bands: "hashh"
#: (delete fix), "mergw" (replace fix), "tabel" (adjacent transposition —
#: damerau distance 1), "sort" (in-vocab passthrough)
SPELL_QUERY = "hashh mergw sort tabel"


def q_bm25_spell(spark, sf_dir):
    """§2.11 spell rewriter end-to-end (the reference's ``search_engine_2``
    shape, ``Part C/searcher_spell_checker.py:39`` + ``SpellChecker.py``):
    OOV query terms are corrected to the nearest in-vocabulary term within
    edit distance ≤2, ranked corpus-frequency-first like pyspellchecker's
    word-probability rule, then scored with BM25. UNLIKE ``bm25_thesaurus``
    (whose expansion pairs are static config shipped to the oracle), the
    CORRECTION itself is independently verified: the DuckDB oracle
    re-derives each correction from the same parquet corpus with its own
    ``damerau_levenshtein`` ranking — adjacent transposition counts 1 on
    both sides (``_edits1`` includes transposes). The two candidate
    geometries agree on the analyzer's ``[a-z_0-9]`` alphabet for this
    entry's pinned query (asserted against the real sf0.01 vocab in
    tests/test_synonyms.py); known corner divergences on OTHER inputs —
    vocab terms reachable only through characters outside the ``_edits1``
    alphabet, or OSA-vs-chain composites like ca→ac→abc (chain distance 2,
    OSA 3) — would surface as a driver hash mismatch, which is the point
    of the independent oracle.

    Scale note: the vocab collect here mirrors the reference's driver-side
    pyspellchecker dictionary (bounded by |vocab|, not |corpus|); the
    DISTRIBUTED twin of this resolution is ``didyoumean``'s length-banded
    pruned join, already a driver entry."""
    from .expansion import make_spell_rewriter, rewrite_query
    from .scoring import bm25_weighted_score

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    vocab_pdf = dct.select("term", "cf").toPandas()
    rw = make_spell_rewriter(
        set(vocab_pdf["term"]),
        dict(zip(vocab_pdf["term"], vocab_pdf["cf"].astype(int))),
    )
    weighted = rewrite_query(SPELL_QUERY, rw)
    out = bm25_weighted_score(spark, tf, stats, dct, weighted, n, avgdl)
    return out.select("doc_id", F.round("score", ROUND_DP).alias("score"))


def _bm25_spell_sql(query: str, k1: float = 1.5, b: float = 0.75) -> str:
    """Independent-correction oracle for ``q_bm25_spell``: DuckDB picks each
    query term's correction itself — in-vocab terms pass through, OOV terms
    resolve to the vocab term minimizing (damerau_levenshtein, -cf, term)
    within distance 2 — then scores plain BM25 over the corrected set."""
    qvals = ", ".join(f"('{t.replace(chr(39), chr(39) * 2)}')"
                      for t in sorted(set(query.split())))
    score = (
        f"ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))"
        f" * (tf.tf * ({k1} + 1.0))"
        f" / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))"
    )
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY 1),
q(qterm) AS (VALUES {qvals}),
corr AS (
  SELECT qterm, coalesce(
    (SELECT d.term FROM dict d WHERE d.term = q.qterm),
    (SELECT d.term FROM dict d
      WHERE damerau_levenshtein(q.qterm, d.term) <= 2
      ORDER BY damerau_levenshtein(q.qterm, d.term) ASC, d.cf DESC, d.term ASC
      LIMIT 1),
    qterm) AS term
  FROM q),
expq AS (SELECT DISTINCT term FROM corr)
SELECT tf.doc_id AS doc_id,
       round(sum({score}), {ROUND_DP}) AS score
FROM tf JOIN expq USING (term) JOIN dict d ON d.term = tf.term
JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c
GROUP BY tf.doc_id
"""


def _bm25_thesaurus_sql(query: str, k1: float = 1.5, b: float = 0.75) -> str:
    from .expansion import make_thesaurus_rewriter, rewrite_query

    weighted = rewrite_query(query, make_thesaurus_rewriter())
    # escape single quotes: a synonym entry like "don't" must not break
    # the VALUES literal (latent today — the bundled TSV is quote-free)
    vals = ", ".join(
        f"""('{t.replace("'", "''")}', {float(w)!r})"""
        for t, w in sorted(weighted)
    )
    score = (
        f"ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))"
        f" * (tf.tf * ({k1} + 1.0))"
        f" / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl))"
    )
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
expq AS (SELECT * FROM (VALUES {vals}) e(term, w))
SELECT tf.doc_id AS doc_id,
       round(sum(expq.w * {score}), {ROUND_DP}) AS score
FROM tf JOIN expq USING (term) JOIN dict d ON d.term = tf.term
JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c
GROUP BY tf.doc_id
"""


def q_term_normalization(spark, sf_dir):
    """T16 + T17 over the real corpus vocabulary UNION a rule-covering word
    fixture: every distinct term with its stem and lemma — upgrades both
    opt-in normalizers from pytest-only golden checks to a full driver
    value-hash against the DuckDB CASE-chain twins."""
    from .lemma import lemma_expr
    from .stemming import stem_expr

    extra = spark.createDataFrame(
        [(w,) for line in NORMALIZATION_FIXTURE for w in line.split()],
        "term string",
    )
    terms = _tf(spark, sf_dir).select("term").union(extra).distinct()
    return terms.select(
        "term",
        F.element_at(stem_expr(F.array(F.col("term"))), 1).alias("stem"),
        F.element_at(lemma_expr(F.array(F.col("term"))), 1).alias("lemma"),
    )


def q_porter2_stem(spark, sf_dir):
    """Snowball-exact Porter2 stemming (T16 parity mode; ``porter2.py``,
    the published-algorithm twin of the reference's nltk SnowballStemmer,
    ``Part C/stemmer.py:4-14``): stem the published golden vocabulary with
    the Arrow UDF. The oracle serves the PUBLISHED stems as a VALUES
    table — transcribed from the snowballstem.org spec/sample, never
    computed here — so the driver hash match certifies snowball-exact
    output without needing a DuckDB stemmer (fts extension is offline)."""
    from .porter2 import GOLDEN, porter2_term_udf

    terms = spark.createDataFrame([(w,) for w, _ in GOLDEN], "term string")
    return terms.select("term", porter2_term_udf(F.col("term")).alias("stem"))


def _porter2_stem_sql() -> str:
    from .porter2 import GOLDEN

    vals = ", ".join(f"('{w}', '{s}')" for w, s in GOLDEN)
    return f"SELECT term, stem FROM (VALUES {vals}) t(term, stem)"


def q_porter2_corpus(spark, sf_dir):
    """Porter2 over the real corpus vocabulary — rows-only driver check
    (the iterative Snowball algorithm has no SQL twin; value correctness
    is certified by ``porter2_stem``'s published-vector hash match and
    tests/test_porter2.py)."""
    from .porter2 import porter2_term_udf

    return (
        _tf(spark, sf_dir)
        .select("term")
        .distinct()
        .select("term", porter2_term_udf(F.col("term")).alias("stem"))
    )


def q_exact_dedup(spark, sf_dir):
    return dedup.exact_dedup(_docs(spark, sf_dir))


LOCALITY_BITS = 4


def q_locality_ids(spark, sf_dir):
    """Locality doc-ID assignment (URL-/path-ordered docIDs): dense global
    ranks in (lang, old_id) order packed as (range << 60 | within-rank) —
    posting delta gaps drop from ~9 varbytes to 1-2 while doc_range
    parallelism stays balanced. Distributed via range-repartition +
    broadcast offset cumsum (no partitionless window)."""
    from .corpus import locality_ids

    docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "old_id")
    out = locality_ids(docs, order_cols=("lang", "old_id"),
                       range_bits=LOCALITY_BITS)
    return out.select("lang", "old_id", "doc_id")


def q_impact_ids(spark, sf_dir):
    """Impact-ordered docID assignment (static index sorting / Lucene
    IndexSorter analogue): dense global ranks by ascending n_chars — the
    BM25-impact proxy (short docs carry the largest length-normalized
    score bounds) — so every term's high-impact docs cluster in its first
    posting blocks and block-max WAND prunes the tail (decode-count drop
    pytest-measured in test_impact_order). Same packed (range << 60 |
    within-rank) layout and two-job rank machinery as locality_ids."""
    from .corpus import impact_ids

    docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "old_id")
    out = impact_ids(
        docs.select("n_chars", "old_id"), "n_chars", tiebreak=("old_id",),
        descending=False, range_bits=LOCALITY_BITS,
    )
    return out.select("n_chars", "old_id", "doc_id")


def _impact_ids_sql() -> str:
    from .corpus import impact_ids_sql

    return impact_ids_sql(
        "(SELECT n_chars, doc_id AS old_id FROM documents) t",
        "n_chars",
        tiebreak=("old_id",),
        descending=False,
        range_bits=LOCALITY_BITS,
        out_cols=("n_chars", "old_id"),
    )


def _locality_ids_sql() -> str:
    from .corpus import locality_ids_sql

    return locality_ids_sql(
        "(SELECT lang, doc_id AS old_id FROM documents) t",
        order_cols=("lang", "old_id"),
        range_bits=LOCALITY_BITS,
    )


def q_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), w=3, tau=0.2)


LINE_W = 12  # the corpus has no newlines: derive "lines" as 12-token chunks


def _chunk_lines(docs) -> DataFrame:
    """Deterministic (doc_id, line_no, line) derivation: consecutive
    12-token chunks (the corpus has no newlines); the tiny vocabulary makes
    cross-document chunk collisions common, so the dedup actually bites."""
    return dedup.chunk_lines(docs, LINE_W)


_CHUNK_LINES_SQL = dedup.chunk_lines_sql("documents", LINE_W)


def q_line_dedup(spark, sf_dir):
    """Corpus-wide exact line dedup (CCNet/RefinedWeb boilerplate pass):
    first occurrence of each distinct line survives, with its corpus-wide
    duplicate count. One hash agg with map-side combine — no self-join."""
    return dedup.line_dedup(_chunk_lines(_docs(spark, sf_dir)))


EVENT_WINDOW_S = 3600


FETCH_K = 15


def q_search_fetch_topk(spark, sf_dir):
    """Query-then-fetch over the doc store: WAND top-k, then the stored
    source rows point-fetched by id from the doc_part-partitioned store
    (scan pruned to the hit partitions, pytest numFiles-gated) — the full
    hit payload (id, rank, score, text) hash-checked against a relational
    BM25 twin joined to the corpus."""
    eng = _shared_index(spark, sf_dir)
    raw = eng.search(BM25_QUERY, k=FETCH_K + 25)  # tie buffer past k
    reranked = sorted(
        ((d, round(sc, ROUND_DP)) for d, sc in raw),
        key=lambda t: (-t[1], t[0]),
    )[:FETCH_K]
    text = {
        r["doc_id"]: r["text"]
        for r in eng.fetch([d for d, _ in reranked]).collect()
    }
    rows = [
        (d, rank, sc, text[d])
        for rank, (d, sc) in enumerate(reranked, 1)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, rank int, score double, text string"
    )


def _search_fetch_sql() -> str:
    return f"""
WITH ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM ({_bm25_sql(BM25_QUERY)})
  ORDER BY score DESC, doc_id ASC LIMIT {FETCH_K})
SELECT r.doc_id, r.rank::INT AS rank, r.score, d.text
FROM ranked r JOIN documents d USING (doc_id)
"""


def q_event_window_agg(spark, sf_dir):
    """Tumbling-window event analytics (streaming/analytics.py): 1-hour
    (window, event_type) counts + value sums over the events table — the
    SAME transformation the Structured-Streaming path runs behind a
    watermark (unified batch/stream API; identity pytest-proven). One hash
    agg with map-side combine; timestamps stringified engine-independent."""
    from .streaming.analytics import windowed_event_counts

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out = windowed_event_counts(ev, f"{EVENT_WINDOW_S} seconds")
    return out.select(
        F.col("window_start").cast("string").alias("window_start"),
        F.col("window_end").cast("string").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def _event_window_sql() -> str:
    from .streaming.analytics import windowed_event_counts_sql

    inner = windowed_event_counts_sql("events", EVENT_WINDOW_S)
    return f"""
SELECT CAST(window_start AS VARCHAR) AS window_start,
       CAST(window_end AS VARCHAR) AS window_end,
       event_type, n_events, sum_value
FROM ({inner}) t
"""


def q_range_join(spark, sf_dir):
    """Bucketized range join (ops/temporal.py): every error event matched
    to ITS user session (intervals from sessionize over the same stream) —
    time-cell equi-join + residual filter, never an inequality join;
    DuckDB twin is the plain IEJoin over the gaps-and-islands sessions."""
    from .ops.temporal import range_join
    from .streaming.analytics import sessionize

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    sessions = sessionize(ev, SESSION_GAP_S).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    out = range_join(
        errors, sessions, keys=("user_id",), start_col="session_start",
        end_col="session_end", bucket="30 minutes",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("ts"),
        F.col("session_start").cast("string").alias("session_start"),
        F.col("session_end").cast("string").alias("session_end"),
        "n_events",
    )


def _range_join_sql() -> str:
    from .ops.temporal import range_join_sql
    from .streaming.analytics import sessionize_sql

    inner = range_join_sql(
        "SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'",
        f"SELECT user_id, session_start, session_end, n_events FROM ({sessionize_sql('events', SESSION_GAP_S)}) s",
        keys=("user_id",),
        start_col="session_start",
        end_col="session_end",
    )
    return f"""
SELECT event_id, user_id, CAST(ts AS VARCHAR) AS ts,
       CAST(session_start AS VARCHAR) AS session_start,
       CAST(session_end AS VARCHAR) AS session_end,
       n_events
FROM ({inner}) t
"""


PR_ITER = 4


BOOL_TREE = {
    "must": [
        {"term": "spark"},
        {"should": [{"term": "join"}, {"term": "stream"}],
         "minimum_should_match": 1},
    ],
    "should": [{"term": "window"}, {"term": "merge"}],
    "must_not": [{"term": "error"}],
    "filter": [{"range": {"field": "n_chars", "gte": 100, "lte": 3000}}],
}


def q_bool_query(spark, sf_dir):
    """Nested boolean DSL (ES `bool` query, boolquery.py): must + nested
    should(msm) + top-level should + must_not + range filter in one tree,
    compiled to one relational job — node-for-node mirrored in the SQL
    twin (scores rounded per node on both engines)."""
    from .boolquery import BoolContext, bool_score

    docs = _docs(spark, sf_dir)
    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    ctx = BoolContext(spark, tf, stats, dct, n, avgdl, metadata=docs)
    return bool_score(ctx, BOOL_TREE)


def _bool_query_sql() -> str:
    from .boolquery import bool_score_sql

    return bool_score_sql(BOOL_TREE, _TF_SQL)


BOOL_K = 25


def q_bool_index_topk(spark, sf_dir):
    """The SAME nested bool tree evaluated INDEX-NATIVELY: term leaves
    score from the built segments (engine.scored_docs — full per-clause
    frames, no premature top-k), combined by the shared eval_tree
    combinators; hash-checked against the identical relational SQL twin
    (index BM25 == relational BM25, so the trees align bit-for-bit after
    per-node rounding)."""
    eng = _shared_index(spark, sf_dir)
    hits = eng.search_bool(BOOL_TREE, k=BOOL_K, metadata=_docs(spark, sf_dir))
    return spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits] or [], "doc_id long, score double"
    )


def _bool_index_sql() -> str:
    from .boolquery import bool_score_sql

    return f"""
SELECT doc_id, score FROM ({bool_score_sql(BOOL_TREE, _TF_SQL)}) t
ORDER BY score DESC, doc_id ASC LIMIT {BOOL_K}
"""


DISMAX_TREE = {
    "dis_max": [
        {"must": [{"term": "spark"}, {"term": "join"}]},
        {"must": [{"term": "stream"}]},
        {"must": [{"term": "window"}, {"term": "merge"}]},
    ],
    # even last digit: tie·(5dp score) then has an EVEN 6th decimal — never
    # a decimal midpoint, so Spark's and DuckDB's round() can't disagree
    # (an odd tie like 0.3 hits .xxxxx5 whenever a sub-score ends in 5)
    "tie_breaker": 0.4,
}

BOOSTING_TREE = {
    "positive": {
        "must": [{"term": "spark"}],
        "should": [{"term": "join"}, {"term": "stream"}],
    },
    "negative": {"should": [{"term": "error"}, {"term": "warning"}]},
    "negative_boost": 0.2,
}


def q_bool_dismax(spark, sf_dir):
    """ES dis_max query (boolquery.py): disjunction-max over three
    sub-queries — score = best sub + 0.4 · (other matching subs), one
    union + groupBy(max, sum) instead of a join chain; hash-checked
    against the branch-mirrored SQL twin."""
    from .boolquery import BoolContext, bool_score

    docs = _docs(spark, sf_dir)
    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    ctx = BoolContext(spark, tf, stats, dct, n, avgdl, metadata=docs)
    return bool_score(ctx, DISMAX_TREE)


def _bool_dismax_sql() -> str:
    from .boolquery import bool_score_sql

    return bool_score_sql(DISMAX_TREE, _TF_SQL)


def q_bool_boosting(spark, sf_dir):
    """ES boosting query (boolquery.py): positive bool query demoted —
    not excluded — by a negative match set (score × 0.2 on negative
    hits), the soft alternative to must_not; one left join against the
    negative frame."""
    from .boolquery import BoolContext, bool_score

    docs = _docs(spark, sf_dir)
    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    ctx = BoolContext(spark, tf, stats, dct, n, avgdl, metadata=docs)
    return bool_score(ctx, BOOSTING_TREE)


def _bool_boosting_sql() -> str:
    from .boolquery import bool_score_sql

    return bool_score_sql(BOOSTING_TREE, _TF_SQL)


def q_pagerank(spark, sf_dir):
    """PageRank authority over the document-similarity graph (ops/graph):
    MinHash-band pairs symmetrized into edges, 4 power iterations with
    per-iteration rounding on BOTH engines (float order can't drift the
    trajectories) — an iterative algorithm hash-checked against UNROLLED
    iteration CTEs (standard SQL forbids aggregates in recursive terms)."""
    from .ops import graph

    pairs = dedup.minhash_band_pairs(_docs(spark, sf_dir))
    return graph.pagerank(graph.symmetric_edges(pairs), n_iter=PR_ITER)


def _pagerank_sql() -> str:
    from .ops import graph

    psql = dedup.minhash_band_pairs_sql("documents")
    esql = (
        f"SELECT doc_a AS src, doc_b AS dst FROM ({psql}) p "
        f"UNION SELECT doc_b, doc_a FROM ({psql}) q"
    )
    return graph.pagerank_sql(esql, n_iter=PR_ITER)


IMPORT_FIXTURE = [
    (1, "import os.path and from collections import deque"),
    (2, "#include <stdio.h> plus #include \"local/util.h\""),
    (3, "const x = require(''lodash/fp''); import React from react"),
    (4, "no imports; the important word importance unimportable"),
]


def q_code_imports(spark, sf_dir):
    """Import/include/require mining (ops/code.py): the raw dependency-
    graph edges of a code corpus, portable-regex families hash-checked
    vs the RE2 twin over a literal fixture."""
    from .ops.code import imports

    rows = [(i, t.replace("''", "'")) for i, t in IMPORT_FIXTURE]
    return imports(spark.createDataFrame(rows, "doc_id long, text string"))


def _code_imports_sql() -> str:
    from .ops.code import imports_sql

    vals = ", ".join(f"({i}, '{t}')" for i, t in IMPORT_FIXTURE)
    return (
        f"WITH imp_docs(doc_id, text) AS (VALUES {vals})\n"
        + imports_sql("imp_docs")
    )


def q_definitions(spark, sf_dir):
    """Definition mining (ops/code.py): function/type definition sites
    over the code fixture (the sf corpus is prose) — lang-agnostic
    portable-regex families, hash-checked vs the RE2 twin."""
    from .ops.code import definitions

    return definitions(_code_fixture_df(spark))


def _definitions_sql() -> str:
    from .ops.code import definitions_sql

    vals = ", ".join(f"({i}, '{t}')" for i, t in CODE_FIXTURE)
    return (
        f"WITH code_docs(doc_id, text) AS (VALUES {vals})\n"
        + definitions_sql("code_docs")
    )


# Definition-dense fixture for the stored symbol layout (shared prefixes,
# one name defined across four files, a duplicate def site inside doc 5,
# every keyword family) — the sf corpus is prose, so symbol entries run on
# this like code_definitions does on CODE_FIXTURE.
SYMBOL_FIXTURE = [
    (1, "def parse_tokens(s): pass\nclass ParseTree: pass"),
    (2, "def parse_tokens(s, opts): pass\ndef parse_header(h): pass"),
    (3, "fn parse_tokens(input) {}\nstruct ParseTree {}"),
    (4, "class ParseError(Exception): pass\ndef parse_header(h): pass"),
    (5, "def parse_tokens(x): return x\ndef parse_tokens(x, y): return y"),
    (6, "func mergeRuns(rs) {}\ninterface Runner {}"),
    (7, "function renderPage(doc) {}\nenum Color { RED }"),
    (8, "trait Parser {}\nfn parse_header(h) {}"),
    (9, "class Runner: pass\ndef run(self): pass"),
    (10, "no definitions in this file at all"),
    # reference-only docs (mention parse_tokens, never define it)
    (11, "result = parse_tokens(raw) if raw else None"),
    (12, "tokens = parse_tokens(line); count = len(tokens)"),
    (13, "parse_tokens twice: parse_tokens(x) and parse_tokens(y)"),
]
SYMBOL_LOOKUP_NAME = "parse_tokens"
SYMBOL_PREFIX = "parse"
SYMBOL_PREFIX_K = 5

_SYMBOL_LAYOUT: list[str] = []


def _symbol_layout(spark) -> str:
    """ONE symbol layout build per process (same sharing rule as
    _shared_index — the fixture is sf-independent)."""
    from .ops.code import symbol_write

    if not _SYMBOL_LAYOUT:
        path = _tmpdir("sesym_") + "/symbols"
        symbol_write(
            spark.createDataFrame(SYMBOL_FIXTURE, "doc_id long, text string"),
            path,
            n_buckets=16,
        )
        _SYMBOL_LAYOUT.append(path)
    return _SYMBOL_LAYOUT[0]


def q_symbol_lookup(spark, sf_dir):
    """Go-to-definition over the STORED symbol layout (ops/code.py
    symbol_write/symbol_lookup): every def site of one name, read from a
    single md5-bucket partition (partition-pruned; plan-tested in
    tests/test_symbols.py). Duplicate sites preserved (doc 5 defines the
    name twice = two rows)."""
    from .ops.code import symbol_lookup

    return symbol_lookup(spark, _symbol_layout(spark), SYMBOL_LOOKUP_NAME)


def q_symbol_prefix(spark, sf_dir):
    """Go-to-symbol suggest over the name-sorted stats sublayout: top-k
    symbols by prefix, widest file spread first (StringStartsWith pushed
    to the parquet scan; row-group pruning via the sorted layout)."""
    from .ops.code import symbol_prefix_topk

    return symbol_prefix_topk(
        spark, _symbol_layout(spark), SYMBOL_PREFIX, k=SYMBOL_PREFIX_K
    )


def _symbol_defs_cte() -> str:
    from .ops.code import definitions_sql

    vals = ", ".join(
        "({}, '{}')".format(i, t.replace("\n", "' || chr(10) || '"))
        for i, t in SYMBOL_FIXTURE
    )
    return (
        f"WITH sym_docs(doc_id, text) AS (VALUES {vals}),\n"
        f"sym_defs AS ({definitions_sql('sym_docs')})"
    )


def _symbol_lookup_sql() -> str:
    return (
        _symbol_defs_cte()
        + f"\nSELECT doc_id, kind, name FROM sym_defs "
        f"WHERE name = '{SYMBOL_LOOKUP_NAME}'"
    )


def _symbol_prefix_sql() -> str:
    return (
        _symbol_defs_cte()
        + f""",
sym_stats AS (
  SELECT name, kind, count(*)::BIGINT AS n_defs,
         count(DISTINCT doc_id)::BIGINT AS n_files
  FROM sym_defs GROUP BY 1, 2)
SELECT name, kind, n_defs, n_files FROM sym_stats
WHERE name LIKE '{SYMBOL_PREFIX}%'
ORDER BY n_files DESC, n_defs DESC, name ASC, kind ASC
LIMIT {SYMBOL_PREFIX_K}"""
    )


def q_symbol_references(spark, sf_dir):
    """Find-references (ops/code.py references): whole-word mentions per
    doc minus definition sites — def-only docs land at n_refs 0, the
    reference-only docs 11-13 carry their mention counts. At scale the
    scan is candidate-restricted via the trigram index (composition
    pytest-proven); here the fixture corpus is the scan."""
    from .ops.code import references

    return references(
        spark.createDataFrame(SYMBOL_FIXTURE, "doc_id long, text string"),
        SYMBOL_LOOKUP_NAME,
    )


def _symbol_references_sql() -> str:
    return (
        _symbol_defs_cte()
        + f""",
mentions AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\b{SYMBOL_LOOKUP_NAME}\\b'))::BIGINT
           AS n_mentions
  FROM sym_docs),
dcnt AS (
  SELECT doc_id, count(*)::BIGINT AS n_defs FROM sym_defs
  WHERE name = '{SYMBOL_LOOKUP_NAME}' GROUP BY 1)
SELECT m.doc_id, m.n_mentions,
       coalesce(d.n_defs, 0)::BIGINT AS n_defs,
       (m.n_mentions - coalesce(d.n_defs, 0))::BIGINT AS n_refs
FROM mentions m LEFT JOIN dcnt d USING (doc_id)
WHERE m.n_mentions > 0"""
    )


SYMBOL_BOOST = 2.0  # power-of-two: float fold bit-identical to the SQL twin


def q_symbol_boosted_topk(spark, sf_dir):
    """Symbol-aware ranking (ops/code.py symbol_boost — Zoekt ranks
    definition hits above plain content hits): relational BM25 over the
    code-analyzed fixture, then +boost per distinct query term among the
    analyzed subtokens of each doc's defined names. parseQueryString's doc
    defines three of the four query terms → it must outrank every
    pure-content hit."""
    from pyspark.sql import Window

    from .ops.code import definitions, symbol_boost
    from .tokenizer import analyze_text_expr

    docs = _code_fixture_df(spark)
    analyzed = docs.withColumn("text", analyze_text_expr(F.col("text"), "code"))
    tf = term_frequencies(analyzed, "doc_id", "text", use_arrow_udf=False)
    stats = doc_stats(tf)
    dct = dictionary(tf)
    row = stats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a")
    ).collect()[0]
    scored = bm25_score(
        spark, tf, stats, dct, CODE_QUERY, int(row["n"]), float(row["a"])
    )
    boosted = symbol_boost(
        scored.select("doc_id", F.round("score", ROUND_DP).alias("score")),
        definitions(docs),
        CODE_QUERY,
        boost=SYMBOL_BOOST,
    )
    w = Window.partitionBy().orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        boosted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= CODE_K)
    )


def _symbol_boosted_sql() -> str:
    from .ops.code import definitions_sql
    from .tokenizer import STOPWORDS, TOKEN_PATTERN, analyze_py, duckdb_code_split

    vals = ", ".join(f"({i}, '{t}')" for i, t in CODE_FIXTURE)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    qterms = ", ".join(f"'{t}'" for t in sorted(set(analyze_py(CODE_QUERY, "code"))))
    boosted = f"b.score + {SYMBOL_BOOST!r} * coalesce(n_sym, 0)"
    return f"""
WITH bm AS ({_bm25_sql(CODE_QUERY, tf_sql=_code_tf_sql())}),
code_docs2(doc_id, text) AS (VALUES {vals}),
defs AS ({definitions_sql('code_docs2')}),
sub AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower({duckdb_code_split('name')}),
                  '{TOKEN_PATTERN}')) AS term
    FROM defs) s(doc_id, term)
  WHERE term NOT IN ({stop_list})),
qt AS (SELECT unnest([{qterms}]) AS term),
bst AS (SELECT doc_id, count(DISTINCT term)::BIGINT AS n_sym
        FROM sub JOIN qt USING (term) GROUP BY 1)
SELECT b.doc_id AS doc_id, {boosted} AS score,
       row_number() OVER (ORDER BY {boosted} DESC, b.doc_id ASC)::BIGINT AS rank
FROM bm b LEFT JOIN bst USING (doc_id)
ORDER BY score DESC, doc_id ASC
LIMIT {CODE_K}
"""


# Multi-line source-file fixture for the quality/license ops (the sf
# corpus is single-line prose, so a corpus-side check of line-shape
# stats would be vacuous — same call as entity_tokens/code_tokens).
# Covers: SPDX permissive + copyleft, every phrase family, LGPL-vs-GPL
# ordering, a >120-char line, a >1000-char minified line (keep=false),
# an empty doc (alnum guard), and a license-free file.
CODEQ_FIXTURE = [
    (1, "// SPDX-License-Identifier: MIT\ndef parse(x):\n    return x"),
    (2, "Licensed under the Apache License, Version 2.0\nfunc main() {}\nshort"),
    (3, "Permission is granted under the MIT License to any person\nclass Reader: pass"),
    (4, "This program is free software under the GNU General Public License v3\nint main(void) { return 0; }"),
    (5, "GNU Lesser General Public License applies to this library\nmodule exports"),
    (6, "Redistribution permitted under the BSD License terms\n" + "x" * 150 + "\nend"),
    (7, "minified blob: " + "a1" * 600),
    (8, "plain file with no license header\njust two ordinary lines of code"),
    (9, "# SPDX-License-Identifier: GPL-3.0-only\nstruct Node { int v; };"),
    (10, "covered by the Mozilla Public License 2.0\nlet tail ="),
    (11, ""),
    (12, "ISC License\npermission to use copy modify distribute"),
]


def _codeq_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(CODEQ_FIXTURE, "doc_id long, text string")


def _codeq_vals() -> str:
    # newlines embedded as chr(10) so the VALUES literal stays one-line
    return ", ".join(
        "({}, '{}')".format(
            i, t.replace("'", "''").replace("\n", "' || chr(10) || '")
        )
        for i, t in CODEQ_FIXTURE
    )


def q_code_quality(spark, sf_dir):
    """StarCoder-style per-file quality stats + keep verdict
    (ops/code.py): line-shape and alnum-density filters a code training
    corpus thresholds before training, hash-checked vs the DuckDB twin
    over the multi-line fixture."""
    from .ops.code import code_quality_filter

    return code_quality_filter(_codeq_fixture_df(spark))


def _code_quality_sql() -> str:
    from .ops.code import code_quality_filter_sql

    return (
        f"WITH codeq_docs(doc_id, text) AS (VALUES {_codeq_vals()})\n"
        + code_quality_filter_sql("codeq_docs")
    )


def q_license_detect(spark, sf_dir):
    """License tagging (ops/code.py): SPDX wins, then phrase heuristics
    (LGPL before GPL), permissive = Stack-style allowlist membership."""
    from .ops.code import license_detect

    return license_detect(_codeq_fixture_df(spark))


def _license_detect_sql() -> str:
    from .ops.code import license_detect_sql

    return (
        f"WITH codeq_docs(doc_id, text) AS (VALUES {_codeq_vals()})\n"
        + license_detect_sql("codeq_docs")
    )


WINNOW_K, WINNOW_W, WINNOW_MIN_SHARED = 4, 5, 2


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS, Schleimer et al. 2003): per-doc local fingerprint
    set — k-gram hashes, windowed min with rightmost tie-break; guarantees
    detection of any shared run ≥ w+k−1 tokens. Per-doc windows only —
    the single shuffle is the doc repartition, hashes fixed-width strings
    before it."""
    from .ops.code import winnow_fingerprints

    return winnow_fingerprints(
        _docs(spark, sf_dir), k=WINNOW_K, w=WINNOW_W
    )


def _winnow_fps_sql() -> str:
    from .ops.code import winnow_fingerprints_sql

    return winnow_fingerprints_sql("documents", WINNOW_K, WINNOW_W)


FORK_TAU, FORK_MIN_SHARED = 0.001, 2


def q_fork_pairs(spark, sf_dir):
    """Repo-level fork detection (StarCoder dedup above file level):
    source pairs ranked by winnowing-fingerprint containment
    shared/min(|A|,|B|), boilerplate fingerprints capped out. tau is set
    permissively here (the sf sources are unrelated, so containments are
    tiny); the fork-vs-unrelated discrimination is pytest-tested on a
    constructed fork corpus."""
    from .ops.code import fork_pairs

    return fork_pairs(
        _docs(spark, sf_dir), "source", k=WINNOW_K, w=WINNOW_W,
        tau=FORK_TAU, min_shared=FORK_MIN_SHARED, round_dp=ROUND_DP,
    )


def _fork_pairs_sql() -> str:
    from .ops.code import fork_pairs_sql

    return fork_pairs_sql(
        _winnow_fps_sql(), "documents", "source",
        tau=FORK_TAU, min_shared=FORK_MIN_SHARED, round_dp=ROUND_DP,
    )


def q_winnow_pairs(spark, sf_dir):
    """Code-clone pair detection over the winnowing fingerprints: pairs
    ranked by distinct shared fingerprint hashes (one hash equi-join, the
    MOSS index shape)."""
    from .ops.code import winnow_fingerprints, winnow_pairs

    fps = winnow_fingerprints(_docs(spark, sf_dir), k=WINNOW_K, w=WINNOW_W)
    return winnow_pairs(fps, min_shared=WINNOW_MIN_SHARED)


def _winnow_pairs_sql() -> str:
    from .ops.code import winnow_pairs_sql

    return winnow_pairs_sql(_winnow_fps_sql(), WINNOW_MIN_SHARED)


# Multi-line prose fixture for the C4 cleanup rules (the sf corpus is
# single-line punctuation-free prose, so every corpus doc would trivially
# fail the line filters — fixture makes each rule observable). Covers:
# a clean keeper, a short-line drop, a no-punctuation drop, a <3-kept-lines
# page drop, lorem-ipsum boilerplate, curly-brace code page, quote-ending
# lines, empty doc, and whitespace-padded lines.
C4_FIXTURE = [
    (1, "This is the first good sentence of the page.\n"
        "Here is another line that clearly ends with punctuation!\n"
        "And a third full sentence keeps the whole page alive.\n"
        "Finally a fourth one so the page is comfortably kept."),
    (2, "Too short.\nAlso tiny!\nMenu Home About Contact\n"
        "Only this single line is long enough to survive the word filter."),
    (3, "this line has plenty of words but no terminal punctuation\n"
        "neither does this second one despite also being quite long"),
    (4, "One surviving sentence is not enough to keep a page.\n"
        "A second surviving sentence is still not quite enough."),
    (5, "Lorem ipsum dolor sit amet, consectetur adipiscing elit sed do.\n"
        "Even with three other perfectly fine long sentences right here.\n"
        "The boilerplate phrase above disqualifies the entire page.\n"
        "So none of these otherwise acceptable lines can save it."),
    (6, "function main() { return 0; } is code and pages with braces go.\n"
        "Another long and well punctuated line follows the code line.\n"
        "And one more long sentence that would otherwise be retained."),
    (7, "She said the quote should also count as terminal \"punctuation\"\n"
        "A plain long sentence follows the quoted line right here.\n"
        "Then the page closes with one more complete long sentence."),
    (8, ""),
    (9, "   Leading whitespace must be trimmed before the checks run.   \n"
        "Trailing spaces after the period should not break the rule.   \n"
        "A final ordinary sentence completes this whitespace page."),
]


def _c4_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(C4_FIXTURE, "doc_id long, text string")


def _c4_vals() -> str:
    return ", ".join(
        "({}, '{}')".format(
            i, t.replace("'", "''").replace("\n", "' || chr(10) || '")
        )
        for i, t in C4_FIXTURE
    )


def q_c4_clean(spark, sf_dir):
    """C4 heuristic cleanup (Raffel et al. 2020 §2.2): per-line terminal
    punctuation + ≥5-word filters, ≥3-surviving-lines page rule, lorem
    ipsum / curly-brace boilerplate page drops — all whole-stage-codegen
    string/array exprs, zero shuffle (scan-bound at 10^12 pages)."""
    from .ops.textstats import c4_clean

    return c4_clean(_c4_fixture_df(spark))


def _c4_clean_sql() -> str:
    from .ops.textstats import c4_clean_sql

    return (
        f"WITH c4_docs(doc_id, text) AS (VALUES {_c4_vals()})\n"
        + c4_clean_sql("c4_docs")
    )


RETENTION_PERIOD_S = 86_400


def q_retention(spark, sf_dir):
    """Cohort retention matrix over the events table: first-event day =
    cohort, (cohort, days-since, active-user count) — one min agg + one
    distinct + one count agg, no raw-stream joins."""
    from .streaming.analytics import retention_cohorts

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return retention_cohorts(ev, RETENTION_PERIOD_S)


def _retention_sql() -> str:
    from .streaming.analytics import retention_cohorts_sql

    return retention_cohorts_sql("events", RETENTION_PERIOD_S)


HIST_W = 2.5


def q_value_histogram(spark, sf_dir):
    """Mergeable fixed-bin histogram sketch over event values (the
    quantile twin of cms_counters): one map-side-combined hash agg,
    counter-exact vs the floor-bin twin."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return sketch.hist_build(ev, "value", HIST_W)


FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_HORIZON = 7200


def __funnel_sql() -> str:
    from .streaming.analytics import funnel_sql

    return funnel_sql("events", FUNNEL_STEPS, FUNNEL_HORIZON)


def q_funnel(spark, sf_dir):
    """Ordered-funnel conversion view→click→purchase within 2 h of the
    first view: greedy earliest-qualifying chaining, one keyed equi-join
    per step — per-step user counts hash-checked vs the chained-CTE
    frontier twin."""
    from .streaming.analytics import funnel

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return funnel(ev, FUNNEL_STEPS, FUNNEL_HORIZON)


CMS_D, CMS_W = 4, 512


def q_cms_counters(spark, sf_dir):
    """Count-Min sketch counters over the corpus token stream (d=4 md5
    hash rows × 512 columns) — the distributed-sketch TABLE itself
    hash-checked counter-for-counter (determinism makes the approximate
    structure exactly testable); merge across corpora = counter sum."""
    return sketch.cms_build(_docs(spark, sf_dir), CMS_D, CMS_W)


DYM_QUERY = "sow lin"  # misspellings with MANY near-vocab candidates, so
# the beam genuinely competes (5 surviving phrases hash-checked)


def q_didyoumean(spark, sf_dir):
    """Did-you-mean phrase suggestion: per-term Levenshtein candidates
    from the vocabulary, whole-phrase beam ranking under the corpus
    bigram LM — corrections that co-occur beat merely-close ones.
    Unrolled-CTE DuckDB twin with identical rounding/tie-breaks."""
    from .didyoumean import suggest_phrase

    return suggest_phrase(_docs(spark, sf_dir), DYM_QUERY)


BPE_K = 8
_BPE_CACHE: dict = {}


def _shared_bpe(spark, sf_dir):
    """ONE BPE train per sf_dir per process — both bpe_* driver entries
    read from it (same pattern as _shared_index)."""
    if sf_dir not in _BPE_CACHE:
        from .ops import bpe

        _BPE_CACHE[sf_dir] = bpe.bpe_train(
            _docs(spark, sf_dir), BPE_K, min_pair_count=2
        )
    return _BPE_CACHE[sf_dir]


def q_bpe_merges(spark, sf_dir):
    """Distributed BPE vocabulary training: ONE corpus pass to (word,
    cnt), then K merge rounds over the |vocab|-row table (pair-count agg
    + 1-row argmax collect + map-side replace each). Checked against a
    K-stage unrolled-CTE DuckDB twin — merge sequence identical."""
    from .ops import bpe

    merges, _state = _shared_bpe(spark, sf_dir)
    return bpe.merges_df(spark, merges)


def q_bpe_vocab(spark, sf_dir):
    """The learned subword vocabulary (final symbols weighted by word
    counts) after BPE_K merges."""
    from .ops import bpe

    _merges, state = _shared_bpe(spark, sf_dir)
    return bpe.bpe_vocab(state)


HLL_P = 10


def q_hll_registers(spark, sf_dir):
    """HyperLogLog registers over the corpus term stream (vocabulary-
    cardinality sketch): ≤2^p rows, merge = per-bucket max. Integer/string
    hash arithmetic only, so the registers hash-match DuckDB bit-for-bit."""
    toks = _docs(spark, sf_dir).select(
        F.explode(tokenize_raw_expr(F.col("text"))).alias("term")
    )
    return sketch.hll_build(toks, "term", p=HLL_P)


def q_hll_estimate(spark, sf_dir):
    """The HLL cardinality estimate (one row) — integer-exact register
    sum makes it aggregation-order independent and engine-identical."""
    toks = _docs(spark, sf_dir).select(
        F.explode(tokenize_raw_expr(F.col("text"))).alias("term")
    )
    return sketch.hll_estimate(sketch.hll_build(toks, "term", p=HLL_P), p=HLL_P)


def _hll_tokens_table() -> str:
    return f"(SELECT term FROM ({duckdb_tokens_cte('documents', 'doc_id', 'text')}) t0) tt"


AUTH_W = 0.5
AUTH_K = 20


def q_authority_topk(spark, sf_dir):
    """Authority-blended retrieval: BM25 relevance × (1 + w·pagerank/max)
    — the classic text+link-authority web ranking, composed from two
    already-oracled signals and re-ranked; near-dup cluster members gain
    authority from their neighbors."""
    from .ops import graph
    from .scoring import authority_blend

    docs = _docs(spark, sf_dir)
    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score(spark, tf, stats, dct, BM25_QUERY, n, avgdl).select(
        "doc_id", F.round("score", ROUND_DP).alias("score")
    )  # round BEFORE blending — the SQL twin's relevance input is rounded
    pr = graph.pagerank(
        graph.symmetric_edges(dedup.minhash_band_pairs(docs)), n_iter=PR_ITER
    )
    blended = authority_blend(scored, pr, AUTH_W, round_dp=ROUND_DP)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        blended.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= AUTH_K)
        .drop("rn")
    )


def _authority_sql() -> str:
    from .ops import graph

    psql = dedup.minhash_band_pairs_sql("documents")
    esql = (
        f"SELECT doc_a AS src, doc_b AS dst FROM ({psql}) p "
        f"UNION SELECT doc_b, doc_a FROM ({psql}) q"
    )
    prsql = graph.pagerank_sql(esql, n_iter=PR_ITER)
    return f"""
WITH pr AS ({prsql}),
mx AS (SELECT max(rank) AS m FROM pr),
blended AS (
  SELECT b.doc_id,
         round(b.score * (1.0 + {AUTH_W} * coalesce(pr.rank / mx.m, 0.0)),
               {ROUND_DP}) AS score
  FROM ({_bm25_sql(BM25_QUERY)}) b
  LEFT JOIN pr ON pr.node = b.doc_id, mx)
SELECT doc_id, score FROM blended
ORDER BY score DESC, doc_id ASC LIMIT {AUTH_K}
"""


def q_asof_join(spark, sf_dir):
    """As-of join (ops/temporal.py): every click joined to the user's
    latest prior-or-equal view — ONE keyed window pass over the tagged
    union (linear), never an inequality join; hash-checked against
    DuckDB's NATIVE ASOF LEFT JOIN."""
    from .ops.temporal import asof_join

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(clicks, views, right_cols=("event_id", "value"))
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("ts"),
        F.col("matched_ts").cast("string").alias("matched_ts"),
        "matched_event_id",
        "matched_value",
    )


def _asof_join_sql() -> str:
    from .ops.temporal import asof_join_sql

    inner = asof_join_sql(
        "SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'",
        "SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view'",
        right_cols=("event_id", "value"),
    )
    return f"""
SELECT event_id, user_id, CAST(ts AS VARCHAR) AS ts,
       CAST(matched_ts AS VARCHAR) AS matched_ts,
       matched_event_id, matched_value
FROM ({inner}) t
"""


TREND_N = 3


def q_event_trending(spark, sf_dir):
    """Trending types per hour window: windowed counts + a rank window
    PARTITIONED by time window (parallel across windows, no global sort;
    plan shares the event_window_agg agg shape)."""
    from .streaming.analytics import top_types_per_window

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out = top_types_per_window(ev, f"{EVENT_WINDOW_S} seconds", TREND_N)
    return out.select(
        F.col("window_start").cast("string").alias("window_start"),
        F.col("window_end").cast("string").alias("window_end"),
        "rank",
        "event_type",
        "n_events",
    )


def _event_trending_sql() -> str:
    from .streaming.analytics import top_types_per_window_sql

    inner = top_types_per_window_sql("events", EVENT_WINDOW_S, TREND_N)
    return f"""
SELECT CAST(window_start AS VARCHAR) AS window_start,
       CAST(window_end AS VARCHAR) AS window_end,
       rank, event_type, n_events
FROM ({inner}) t
"""


SESSION_GAP_S = 1800


def q_event_sessions(spark, sf_dir):
    """Gap-based sessionization (F.session_window, 30-min gap) per user
    over the events table — hash-checked against the classic
    gaps-and-islands SQL rewrite (lag-break + running sum), proving the
    session-window semantics (end = last event + gap, break at diff >=
    gap) match exactly."""
    from .streaming.analytics import sessionize

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out = sessionize(ev, SESSION_GAP_S)
    return out.select(
        "user_id",
        F.col("session_start").cast("string").alias("session_start"),
        F.col("session_end").cast("string").alias("session_end"),
        "n_events",
        "sum_value",
    )


def _event_sessions_sql() -> str:
    from .streaming.analytics import sessionize_sql

    inner = sessionize_sql("events", SESSION_GAP_S)
    return f"""
SELECT user_id,
       CAST(session_start AS VARCHAR) AS session_start,
       CAST(session_end AS VARCHAR) AS session_end,
       n_events, sum_value
FROM ({inner}) t
"""


PIPE_KW = dict(
    langs=("de", "en", "es"),
    min_quality=2.5,
    line_chunk=LINE_W,
    w=3,
    tau=0.2,
    contam_w=5,
    rates={"de": 0.9, "en": 0.5},
    seed=7,
)


def q_prepare_pipeline(spark, sf_dir):
    """END-TO-END training-data preparation (ops/pipeline.py): language
    filter → quality ≥ 2.5 → chunk-line boilerplate dedup → exact dedup →
    MinHash near-dup (tau 0.2) → decontamination vs the doc_id%31 stand-in
    benchmark → stratified sampling — one declarative composition of the
    already-oracle-checked stage operators, hash-checked END TO END
    against the composed DuckDB twin (stage bugs can't hide behind
    per-stage checks: order and hand-offs are verified too)."""
    from .ops import pipeline

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.expr(DECON_PRED))
    return pipeline.prepare_training_data(docs, bench=bench, **PIPE_KW)


def _prepare_pipeline_sql() -> str:
    from .ops import pipeline

    return pipeline.prepare_training_data_sql(
        "documents", bench_pred=DECON_PRED, **PIPE_KW
    )


PACK_CAP = 40
PACK_GROUPS = 7


def q_pack_docs(spark, sf_dir):
    """Sequence packing (concat-and-chunk): per deterministic group, docs
    concatenate in doc_id order and the token stream cuts into 40-token
    bins; each row is a (bin, doc) overlap with the doc-relative span."""
    return packing.pack_docs(_docs(spark, sf_dir), PACK_CAP, n_groups=PACK_GROUPS)


CHUNK_SIZE, CHUNK_STRIDE = 32, 24


def q_chunk_docs(spark, sf_dir):
    """Sliding-window chunking (the embedding/long-context splitter):
    32-token windows every 24 tokens — overlapping, tail kept, no token
    dropped; md5-of-window makes the rows hashable cross-engine."""
    return packing.chunk_docs(
        _docs(spark, sf_dir), CHUNK_SIZE, CHUNK_STRIDE
    )


def q_minhash_pairs(spark, sf_dir):
    return dedup.minhash_band_pairs(_docs(spark, sf_dir))


def q_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir))


def q_token_count(spark, sf_dir):
    return textstats.token_count(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    return textstats.fingerprint(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    return textstats.lang_id(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    return textstats.quality_score(_docs(spark, sf_dir))


def q_gopher_quality(spark, sf_dir):
    """Gopher document-level quality rules (Rae et al. 2021 §A1.1): every
    rule an observable column + combined keep verdict, one codegen map pass."""
    return textstats.gopher_quality(_docs(spark, sf_dir))


SIGTEXT_TERMS = ["spark", "stream"]


def q_significant_text(spark, sf_dir):
    """Significant terms of a query's HIT SET vs the corpus background
    (ES significant_text): JLH over the OR-match foreground, query terms
    excluded — the text-scan twin of the index-native
    q_significant_terms."""
    return termstats.significant_text(_docs(spark, sf_dir), SIGTEXT_TERMS, top_n=10)


def q_significant_terms_by_category(spark, sf_dir):
    """Per-language significant terms (ES significant_terms, JLH): two df
    aggregations + broadcast category sizes; scores rounded pre-rank."""
    return termstats.significant_terms(_docs(spark, sf_dir), top_n=5)


def q_keyword_tfidf(spark, sf_dir):
    """Per-doc top-3 TF-IDF keywords — one tf agg + |vocab| join + window."""
    return termstats.keyword_tfidf(_docs(spark, sf_dir), k=3)


def q_collocations(spark, sf_dir):
    """Top PMI collocations over the adjacent-bigram stream (map-side
    zip_with bigrams, three count aggs)."""
    return termstats.collocations(_docs(spark, sf_dir), min_count=5, top_n=25)


def q_perplexity(spark, sf_dir):
    """CCNet-style add-α bigram-LM perplexity per doc, trained on the
    corpus itself — the standard quality-filter signal."""
    return termstats.perplexity(_docs(spark, sf_dir))


def q_media_metadata(spark, sf_dir):
    return multimodal.media_metadata(multimodal.text_as_media(_docs(spark, sf_dir)))


def q_media_decode(spark, sf_dir):
    return multimodal.decode_media(multimodal.text_as_media(_docs(spark, sf_dir)))


def q_media_frames(spark, sf_dir):
    return multimodal.frame_sample(multimodal.text_as_media(_docs(spark, sf_dir)))


def q_media_features(spark, sf_dir):
    """Feature-extraction plumbing, exploded to hashable scalar rows
    (doc_id, dim, value) — full value-hash check vs the sha256-math twin."""
    return multimodal.extract_features_long(multimodal.text_as_media(_docs(spark, sf_dir)))


# The sf documents table is all-lowercase → zero Capitalized pairs; a 0-row
# oracle match is vacuous, so the entity operator is checked over a
# deterministic literal fixture on BOTH sides (same pattern as the literal
# query vectors used by the similarity entries).
ENTITY_FIXTURE = [
    (1, "President Biden met Angela Merkel in Berlin today"),
    (2, "Angela Merkel praised President Biden after the summit"),
    (3, "lower case text with no entities at all"),
    (4, "Grand Canyon appears exactly once so it is dropped"),
    (5, "President Biden again and Pacific Ocean with Pacific Ocean twice in one doc"),
]


CODE_FIXTURE = [
    (1, "def parseQueryString(raw): return QueryStringParser.parse(raw)"),
    (2, "class HTTPServerConnection: def open_socket(self): pass"),
    (3, "query_string = buildQueryString(params); parse_query(query_string)"),
    (4, "XMLHttpRequest sends the asyncRequest payload to httpServer"),
    (5, "def mergeSortedRuns(runs): return heapMerge(runs)"),
    (6, "snake_case_names and camelCaseNames interoperate fine"),
    (7, "parseURL extracts hostName and queryString from rawURL"),
    (8, "getFooBar setFooBar fooBarBaz foo_bar_qux"),
    (9, "StringBuilder appendString reverseString stringLength"),
    (10, "the parser parses parsed parsing tokens"),
]
CODE_QUERY = "parse query string server"
CODE_K = 10


def _code_fixture_df(spark) -> DataFrame:
    return spark.createDataFrame(CODE_FIXTURE, "doc_id long, text string")


def _code_split_cte() -> str:
    from .tokenizer import duckdb_code_split

    vals = ", ".join(f"({i}, '{t}')" for i, t in CODE_FIXTURE)
    return (
        f"code_docs(doc_id, text) AS (VALUES {vals}),\n"
        f"code_split AS (SELECT doc_id, {duckdb_code_split('text')} AS text "
        f"FROM code_docs)"
    )


def _code_tf_sql() -> str:
    return f"""
WITH {_code_split_cte()}
SELECT doc_id, term, count(*)::BIGINT AS tf
FROM ({duckdb_tokens_cte("code_split", "doc_id", "text")})
GROUP BY doc_id, term
"""


def q_chain_tokens(spark, sf_dir):
    """Analyzer CHAIN (code+stem): identifier splitting then suffix
    stemming as one TEXT→TEXT composition — tf over the code fixture,
    hash-checked against the composed DuckDB twin (same chain in SQL)."""
    from .tokenizer import analyze_text_expr

    df = _code_fixture_df(spark).withColumn(
        "text", analyze_text_expr(F.col("text"), "code+stem")
    )
    return term_frequencies(df, "doc_id", "text", use_arrow_udf=False)


def _chain_tf_sql() -> str:
    from .tokenizer import duckdb_analyze_text

    vals = ", ".join(f"({i}, '{t}')" for i, t in CODE_FIXTURE)
    return f"""
WITH code_docs(doc_id, text) AS (VALUES {vals}),
chained AS (SELECT doc_id, {duckdb_analyze_text("text", "code+stem")} AS text
            FROM code_docs)
SELECT doc_id, term, count(*)::BIGINT AS tf
FROM ({duckdb_tokens_cte("chained", "doc_id", "text")})
GROUP BY doc_id, term
"""


def q_code_tokens(spark, sf_dir):
    """Code-analyzer token stream (camelCase / ACRONYMWord / snake_case
    identifier splitting — Lucene WordDelimiter analogue, the analysis a
    SOURCE-CODE corpus needs so 'parse' matches parseQueryString): tf over
    a literal fixture (the sf corpus is lowercase prose — a corpus-side
    check would be vacuous; same call as entity_tokens). The DuckDB twin
    applies the identical three split rules as RE2 regexp_replace."""
    from .tokenizer import analyze_text_expr

    df = _code_fixture_df(spark).withColumn(
        "text", analyze_text_expr(F.col("text"), "code")
    )
    return term_frequencies(df, "doc_id", "text", use_arrow_udf=False)


def q_code_search_topk(spark, sf_dir):
    """Index-NATIVE search over a code-analyzed index: build with
    analyzer='code' (split pinned in meta), query analyzed by the SAME
    analyzer via the engine, full WAND path — hash-checked against a
    relational BM25 twin whose tf comes from the SQL code-split. Proves
    the analyzer round-trips build→meta→query identically."""
    from pyspark.sql import Window

    from .query.engine import SearchEngine

    path = _tmpdir("seidx_code_")
    eng = SearchEngine(spark, path)
    eng.build_index_from_df(
        _code_fixture_df(spark), id_col="doc_id", text_col="text",
        n_buckets=2, range_bits=1, analyzer="code",
    )
    hits = eng.search(CODE_QUERY, k=CODE_K)
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits], "doc_id long, score double"
    )
    w = Window.partitionBy().orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


def q_reindex_code_topk(spark, sf_dir):
    """Reindex (ES ``_reindex`` analogue): a STANDARD-analyzer index with a
    doc store is rebuilt AS a code-analyzer index from its own stored
    source rows — no original table — then searched through the full WAND
    path. The twin is the same relational code-split BM25 as
    ``code_search_topk``: passing it proves the stored pre-analysis text
    round-trips exactly (reindex ≡ fresh build under the new analyzer)."""
    from pyspark.sql import Window

    from .index.build import reindex
    from .query.engine import SearchEngine

    src = _tmpdir("seidx_ri_src_")
    SearchEngine(spark, src).build_index_from_df(
        _code_fixture_df(spark), id_col="doc_id", text_col="text",
        n_buckets=2, range_bits=1, store_source=True,
    )
    dst = _tmpdir("seidx_ri_dst_")
    reindex(spark, src, dst, analyzer="code")
    hits = SearchEngine(spark, dst).search(CODE_QUERY, k=CODE_K)
    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits], "doc_id long, score double"
    )
    w = Window.partitionBy().orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


def _code_search_sql() -> str:
    return f"""
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank
FROM ({_bm25_sql(CODE_QUERY, tf_sql=_code_tf_sql())})
ORDER BY score DESC, doc_id ASC
LIMIT {CODE_K}
"""


def q_entity_tokens(spark, sf_dir):
    from .tweetparser import entity_tokens

    df = spark.createDataFrame(ENTITY_FIXTURE, "doc_id long, text string")
    return entity_tokens(df, min_df=2)


def q_tweet_tokens(spark, sf_dir):
    """Tweet-mode tokenizer (SURVEY §2.2 T5-T14) term frequencies — the
    534-line rule parser re-expressed; rule pipeline not SQL-expressible →
    rows-only driver check; golden cases pytest-enforced."""
    from .tweetparser import tweet_tokenize

    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", F.explode(tweet_tokenize(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


STREAM_DOC_CUT = 200  # deterministic drop subset: doc_id < cut


def q_streaming_ingest(spark, sf_dir):
    """Structured-Streaming incremental index (availableNow drain of a temp
    corpus drop) — returns the MERGED streamed dictionary (term, df, cf),
    which DuckDB reproduces from the same doc subset: a full value-hash check
    of the foreachBatch encode+merge path, not just a row count."""
    import os

    from . import streaming as st
    from .index.build import IndexMeta

    base = _tmpdir("se_stream_")
    drops, idx, ckpt = f"{base}/drops", f"{base}/idx", f"{base}/ckpt"
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < STREAM_DOC_CUT)
    docs.write.mode("overwrite").parquet(drops)
    st.incremental_index(
        st.stream_corpus(spark, drops, docs.schema), idx, ckpt, n_buckets=4, range_bits=2
    )
    meta = IndexMeta.load(idx)
    return (
        spark.read.parquet(os.path.join(idx, meta.dictionary_dir))
        .select("term", "df", "cf")
    )


_QUERY_VEC = [float((i * 37 % 19) - 9) / 9.0 for i in range(64)]  # deterministic


def q_emb_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(_embs(spark, sf_dir), _QUERY_VEC, k=25)


def q_knn_filtered(spark, sf_dir):
    """ES knn+filter: pre-filter on metadata, then exact cosine top-k —
    always k MATCHING rows (a post-filtered global top-k would under-fill)."""
    return similarity.knn_filtered(
        _embs(spark, sf_dir), _QUERY_VEC, "label IN (0, 2)", k=25
    )


def q_emb_neardup(spark, sf_dir):
    # allow_full_scan: this entry IS the small-corpus exactness baseline the
    # LSH-composed path (emb_neardup_lsh) is judged against
    return similarity.cosine_neardup(_embs(spark, sf_dir), tau=0.3, allow_full_scan=True)


def q_emb_neardup_lsh(spark, sf_dir):
    """Scale path: LSH-bucket candidates → pair-driven cosine verify (no
    cross join anywhere — plan-tested)."""
    return similarity.cosine_neardup_lsh(_embs(spark, sf_dir), tau=0.3, n_planes=8, dim=64)


SEMDEDUP_TAU = 0.3  # max pairwise cosine on this corpus is 0.513 — 227/273 split


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): IVF-cluster the embeddings, drop
    within-cluster cosine-τ near-duplicates keeping the centroid-FARTHEST
    point of each duplicate edge (the paper's diversity rule). Pair space
    is Σ|cluster|², never n² — the clustering IS the blocking."""
    return similarity.semantic_dedup(_embs(spark, sf_dir), tau=SEMDEDUP_TAU)


def q_nb_classify(spark, sf_dir):
    """Multinomial Naive Bayes trained distributed (two hash aggs — no
    iteration, no driver weights) on the lang labels, then self-classified:
    per-(doc, class) log-likelihood sums with add-1 smoothing, argmax
    pinned by rounding before the window (labels on this synthetic corpus
    share one token pool, so accuracy is near-prior — the entry checks the
    MATH end-to-end, not separability; tests/test_classify.py covers
    accuracy on a separable corpus)."""
    docs = _docs(spark, sf_dir)
    return classify.nb_predict(classify.nb_train(docs, "lang"), docs)


MAXSIM_TERMS = ["spark", "join", "stream", "shuffle"]


def q_maxsim_topk(spark, sf_dir):
    """Late-interaction retrieval (ColBERT MaxSim): each query token takes
    its best-matching doc token's dot product; per-doc score is the sum.
    Token embeddings are the in-engine md5 stand-in (the real-encoder swap
    point is one expression), so the ENTIRE pipeline — embedding, |q|
    map-side dots, max/sum aggs, top-k — is hash-checked vs DuckDB."""
    tf, _, _, _, _ = _scoring_ctx(spark, sf_dir)
    return similarity.maxsim_topk(tf, MAXSIM_TERMS, k=20)


RERANK_N = 40
RERANK_K = 15


def q_maxsim_rerank(spark, sf_dir):
    """Retrieve-then-rerank (the ColBERT serving shape) end-to-end against
    one SQL truth: BM25/WAND retrieves RERANK_N candidates from the real
    index, then MaxSim re-scores ONLY those candidates from their stored
    term vectors (engine.search_rerank_maxsim). The oracle recomputes both
    phases relationally — BM25 top-N as a candidate semi-join over the
    text-derived tf, then the same md5 token embeddings — so the index
    read, the candidate cut, AND the late-interaction math are all
    hash-checked in one entry."""
    eng = _shared_index(spark, sf_dir)
    hits = eng.search_rerank_maxsim(
        BM25_QUERY, k=RERANK_K, n_candidates=RERANK_N
    )
    return spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits], "doc_id long, score double"
    )


DUP_SPAN_W = 8


def q_dup_spans(spark, sf_dir):
    """Exact-substring duplicate spans (Lee et al. 2022 primitive):
    maximal ≥8-token runs appearing verbatim in two docs, found with
    positional shingles + diagonal gaps-and-islands (window + agg — no
    suffix array, no per-pair Python). Full self-join form here (the
    small-corpus exactness baseline; the scale path passes MinHash band
    survivors as ``candidates``)."""
    return dedup.duplicate_spans(_docs(spark, sf_dir), w=DUP_SPAN_W)


def q_dup_span_scrub(spark, sf_dir):
    """Span scrub: doc_b tokens covered by any duplicated span are
    dropped and the text rebuilt from the kept tokens in order — the
    write-side of exact-substring dedup."""
    docs = _docs(spark, sf_dir)
    spans = dedup.duplicate_spans(docs, w=DUP_SPAN_W)
    return dedup.scrub_duplicate_spans(docs, spans)


def _dup_span_scrub_sql() -> str:
    spans = dedup.duplicate_spans_sql("documents", w=DUP_SPAN_W)
    toks = dedup._TOKS_SQL.format(text="text")
    return f"""
WITH spans AS ({spans}),
covered AS (
  SELECT DISTINCT doc_b AS doc_id, p AS pos
  FROM spans, unnest(range(start_b, start_b + span_len)) AS r(p)),
toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM (SELECT doc_id, {toks} AS t FROM documents),
       unnest(range(1, len(t) + 1)) AS r(i)),
kept AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS scrubbed
  FROM toks ANTI JOIN covered USING (doc_id, pos)
  GROUP BY doc_id)
SELECT d.doc_id AS doc_id, coalesce(k.scrubbed, '') AS scrubbed_text
FROM documents d LEFT JOIN kept k USING (doc_id)
"""


def q_dedup_pipeline(spark, sf_dir):
    """End-to-end near-dup dedup: banding candidates → n-gram Jaccard verify
    → connected components keeper assignment."""
    return dedup.dedup_pipeline(_docs(spark, sf_dir), w=3, tau=0.2)


def q_dedup_keep_best(spark, sf_dir):
    """Keeper policy layer: same clusters as dedup_pipeline, but each
    cluster keeps its highest-quality member (rounded quality ties →
    smallest doc_id) instead of the min-id label artifact."""
    docs = _docs(spark, sf_dir)
    assign = dedup.dedup_pipeline(docs, w=3, tau=0.2)
    q = textstats.quality_score(docs).select(
        "doc_id", F.col("quality").alias("score")
    )
    return dedup.reassign_keepers(assign, q)


def _dedup_keep_best_sql() -> str:
    return f"""
WITH comp AS (SELECT * FROM ({dedup.dedup_pipeline_sql("documents", w=3, tau=0.2)}) t),
q AS (SELECT doc_id, quality FROM ({textstats.quality_score_sql("documents")}) t2),
lab AS (
  SELECT c.doc_id, c.keep_doc_id, coalesce(q.quality, -1e308) AS s
  FROM comp c LEFT JOIN q USING (doc_id)),
best AS (
  SELECT keep_doc_id, doc_id AS new_keeper FROM (
    SELECT keep_doc_id, doc_id,
           row_number() OVER (PARTITION BY keep_doc_id
                              ORDER BY s DESC, doc_id ASC) AS rn
    FROM lab)
  WHERE rn = 1)
SELECT c.doc_id, b.new_keeper AS keep_doc_id
FROM comp c JOIN best b USING (keep_doc_id)
"""


def q_lsh_buckets(spark, sf_dir):
    return similarity.lsh_assign(_embs(spark, sf_dir), n_planes=8, dim=64)


def q_lsh_topk(spark, sf_dir):
    return similarity.lsh_topk(_embs(spark, sf_dir), _QUERY_VEC, k=10, hamming=1)


def q_ivf_assign(spark, sf_dir):
    return similarity.ivf_assign(_embs(spark, sf_dir), n_lists=16, dim=64)


def q_ivf_topk(spark, sf_dir):
    return similarity.ivf_topk(_embs(spark, sf_dir), _QUERY_VEC, k=10, nprobe=4)


_ANN_LAYOUTS: dict[tuple[str, str], str] = {}


def _ann_layout(spark, sf_dir: str, kind: str) -> str:
    """Write the stored ANN layout once per (sf_dir, kind) per process."""
    key = (sf_dir, kind)
    path = _ANN_LAYOUTS.get(key)
    if path is None:
        path = _tmpdir(f"seann_{kind}_") + "/" + kind
        if kind == "lsh":
            similarity.lsh_write(_embs(spark, sf_dir), path, n_planes=8, dim=64)
        elif kind == "sq":
            similarity.sq_write(_embs(spark, sf_dir), path)
        elif kind == "bq":
            similarity.bq_write(_embs(spark, sf_dir), path)
        elif kind == "pq":
            similarity.pq_write(_embs(spark, sf_dir), path)
        elif kind == "ivfpq":
            similarity.ivfpq_write(
                _embs(spark, sf_dir), path,
                codebooks=similarity._pq_default_books(8, 16, 64),
            )
        else:
            similarity.ivf_write(_embs(spark, sf_dir), path, n_lists=16, dim=64)
        _ANN_LAYOUTS[key] = path
    return path


def q_lsh_stored_topk(spark, sf_dir):
    """The 100 TB ANN read path: query a MATERIALIZED bucket-partitioned
    layout (partition-pruned scan, no per-query re-assignment) — must equal
    the compute-per-query lsh_topk oracle exactly."""
    return similarity.lsh_stored_topk(
        spark, _ann_layout(spark, sf_dir, "lsh"), _QUERY_VEC, k=10, hamming=1
    )


def q_ivf_stored_topk(spark, sf_dir):
    """Same for IVF: list_id-partitioned layout + persisted centroids."""
    return similarity.ivf_stored_topk(
        spark, _ann_layout(spark, sf_dir, "ivf"), _QUERY_VEC, k=10, nprobe=4
    )


PQ_K = 15


def q_pq_codes(spark, sf_dir):
    """Product-quantization codes (m=8 subspaces × 16 codewords — 16×
    compression): per-subspace argmin with pinned tie-breaks, exploded to
    hashable (vec_id, sub, code) rows."""
    codes = similarity.pq_encode(_embs(spark, sf_dir))
    return codes.select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    ).select("vec_id", "sub", "code")


def q_pq_topk(spark, sf_dir):
    """Asymmetric-distance (ADC) top-k: per-subspace LUT lookups summed in
    a pinned order — the compressed-domain scan."""
    return similarity.pq_topk(_embs(spark, sf_dir), _QUERY_VEC, k=PQ_K)


def q_pq_stored_topk(spark, sf_dir):
    """ADC over the MATERIALIZED m-bytes-per-vector layout (codebooks
    pinned in the meta sidecar) — must equal pq_topk exactly."""
    return similarity.pq_stored_topk(
        spark, _ann_layout(spark, sf_dir, "pq"), _QUERY_VEC, k=PQ_K
    )


def q_ivfpq_topk(spark, sf_dir):
    """The FAISS-IVFPQ composition: coarse centroid prune (partition-
    pruned stored layout, nprobe=4 of 16 lists) + residual PQ codes +
    ADC with the per-list centroid inner-product term. Oracle recomputes
    assignment/residual/codes from the raw table — value-identical."""
    return similarity.ivfpq_stored_topk(
        spark, _ann_layout(spark, sf_dir, "ivfpq"), _QUERY_VEC, k=PQ_K, nprobe=4
    )


SQ_K = 25


def q_sq_quantize(spark, sf_dir):
    """SQ8 codec pinned bit-for-bit: exploded (vec_id, dim, qval) rows."""
    quant = similarity.sq_quantize(_embs(spark, sf_dir))
    return quant.select(
        "vec_id", F.posexplode("qvec").alias("dim", "qval")
    ).select("vec_id", "dim", "qval")


def q_sq_topk(spark, sf_dir):
    """Approximate cosine top-k over int8-quantized vectors (quantize on
    the fly — the recall baseline for the stored layout)."""
    return similarity.sq_topk(_embs(spark, sf_dir), _QUERY_VEC, k=SQ_K)


def q_sq_stored_topk(spark, sf_dir):
    """The compression read path: int8 parquet layout, scale column pruned
    (cosine is scale-invariant) — must equal sq_topk exactly."""
    return similarity.sq_stored_topk(
        spark, _ann_layout(spark, sf_dir, "sq"), _QUERY_VEC, k=SQ_K
    )


BQ_K = 10
BQ_RERANK = 50


def q_bq_topk(spark, sf_dir):
    """1-bit binary quantization (ES BBQ shape): Hamming coarse top-50 over
    packed sign bits (bit_count(xor) on int64 words — 32x fewer bytes than
    float32), exact-cosine rerank to top-10. Oracle recomputes per-dim
    midrange thresholds and bit disagreements relationally."""
    return similarity.bq_topk(
        _embs(spark, sf_dir), _QUERY_VEC, k=BQ_K, rerank=BQ_RERANK
    )


def q_bq_stored_topk(spark, sf_dir):
    """The stored BQ read path: coarse pass scans ONLY the bits column of
    the materialized layout (plan-tested), thresholds persisted in the meta
    sidecar — must equal bq_topk exactly."""
    return similarity.bq_stored_topk(
        spark, _ann_layout(spark, sf_dir, "bq"), _QUERY_VEC,
        k=BQ_K, rerank=BQ_RERANK,
    )


PP_FIXED = "table"
PP_PREFIX = "s"
PP_MAXEXP = 4
PP_K = 25


def q_phrase_prefix_topk(spark, sf_dir):
    """ES match_phrase_prefix ("table s…"): dictionary expands the prefix
    under the (df desc, term asc) cap — max_expansions=4 < the 6 s-terms,
    so the cap ordering is in the hash — and the positional kernel
    verifies fixed-term adjacency + completion. Score = fixed BM25 + best
    completing expansion. Tie buffer + rounded re-rank."""
    eng = _shared_index(spark, sf_dir, positional=True)
    hits = eng.search_phrase_prefix(
        f"{PP_FIXED} {PP_PREFIX}", k=PP_K + 15, max_expansions=PP_MAXEXP
    )
    return _topk_rounded(spark, hits, PP_K)


def _phrase_prefix_sql() -> str:
    toks = (
        f"[t FOR t IN regexp_extract_all(lower(text), '{TOKEN_PATTERN}') "
        f"IF t NOT IN ({_STOP_SQL})]"
    )
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
exp AS (
  SELECT term FROM dict WHERE term LIKE '{PP_PREFIX}%'
  ORDER BY df DESC, term ASC LIMIT {PP_MAXEXP}),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM (SELECT doc_id, {toks} AS toks FROM documents)),
comp AS (
  SELECT DISTINCT a.doc_id, b.term AS e
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
  WHERE a.term = '{PP_FIXED}' AND b.term IN (SELECT term FROM exp)),
u AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf * 2.5) / (tf.tf + 1.5 * (0.25 + 0.75 * s.doc_len / c.avgdl)) AS su
  FROM tf JOIN dict d USING (term)
  JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c),
bestexp AS (
  SELECT comp.doc_id, max(u.su) AS es
  FROM comp JOIN u ON u.doc_id = comp.doc_id AND u.term = comp.e
  GROUP BY comp.doc_id)
SELECT doc_id, score FROM (
  SELECT b.doc_id, round(f.su + b.es, {ROUND_DP}) AS score
  FROM bestexp b JOIN u f ON f.doc_id = b.doc_id AND f.term = '{PP_FIXED}')
ORDER BY score DESC, doc_id ASC
LIMIT {PP_K}
"""


RESCORE_Q2 = "table scan"
RESCORE_WINDOW = 60
RESCORE_K = 20
RESCORE_RW = 2.0  # power of two → qw·p + rw·s is float-exact in both engines


def q_rescore_topk(spark, sf_dir):
    """ES rescore API (two-phase): primary BM25 window of RESCORE_WINDOW
    through the segment path, secondary BM25 over ONLY that window
    (doc_filter allow-set), total-mode combine qw·p + rw·s (non-matching
    window docs keep qw·p). Tie buffer + rounded re-rank."""
    eng = _shared_index(spark, sf_dir)
    hits = eng.rescore(
        BM25_QUERY,
        RESCORE_Q2,
        k=RESCORE_K + 15,
        window_size=RESCORE_WINDOW,
        rescore_query_weight=RESCORE_RW,
    )
    return _topk_rounded(spark, hits, RESCORE_K)


def _rescore_sql() -> str:
    t1 = ", ".join(f"'{t}'" for t, _ in parse_query(BM25_QUERY))
    t2 = ", ".join(f"'{t}'" for t, _ in parse_query(RESCORE_Q2))
    bm = (
        "SELECT tf.doc_id, sum(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))"
        " * (tf.tf * 2.5) / (tf.tf + 1.5 * (0.25 + 0.75 * s.doc_len / c.avgdl)))"
        " AS score FROM tf JOIN q{i} q USING (term) JOIN dict d USING (term)"
        " JOIN stats s ON s.doc_id = tf.doc_id CROSS JOIN corpus c"
        " GROUP BY tf.doc_id"
    )
    return f"""
WITH tf AS ({_TF_SQL}),
stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q1 AS (SELECT unnest([{t1}]) AS term),
q2 AS (SELECT unnest([{t2}]) AS term),
prim AS ({bm.format(i=1)}),
win AS (
  SELECT doc_id, score FROM (
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
    FROM prim)
  WHERE rn <= {RESCORE_WINDOW}),
sec AS ({bm.format(i=2)})
SELECT doc_id, score FROM (
  SELECT w.doc_id,
         round(w.score + {RESCORE_RW!r} * coalesce(s.score, 0.0), {ROUND_DP}) AS score
  FROM win w LEFT JOIN sec s ON s.doc_id = w.doc_id)
ORDER BY score DESC, doc_id ASC
LIMIT {RESCORE_K}
"""


WAND_K = 50


def q_wand_topk(spark, sf_dir):
    """Flagship segment path: build index → block-max WAND top-k. The
    expected output IS SQL-expressible (BM25 top-k, same math as _bm25_sql +
    ORDER BY/LIMIT), so this entry gets a full driver hash check: fetch a tie
    buffer past k from the exact-score kernel, then re-rank on the ROUNDED
    score (+doc_id tie-break) so the k-boundary is engine-independent (same
    pattern as bm25_batch_topk)."""
    from pyspark.sql import Window

    eng = _shared_index(spark, sf_dir)
    raw = eng.search_df(BM25_QUERY, k=WAND_K + 25)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        raw.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= WAND_K)
        .drop("rn")
    )


LM_INDEX_K = 40


def q_lm_index_topk(spark, sf_dir):
    """Index-native LM Dirichlet: the SAME segment index (blocks carry raw
    tf/dl; cf from the dictionary, C from meta) scored with the per-term u
    override — must reproduce the relational/DuckDB LM ranking exactly.
    Tie buffer + rounded re-rank as in wand_topk."""
    from pyspark.sql import Window

    eng = _shared_index(spark, sf_dir)
    raw = eng.search_df(BM25_QUERY, k=LM_INDEX_K + 25, scorer="lm", mu=LM_MU)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        raw.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= LM_INDEX_K)
        .drop("rn")
    )


NOT_EXCLUDE = "hash window"
NOT_K = 40


def q_boolean_not(spark, sf_dir):
    """Boolean NOT (Lucene MUST_NOT; absent in the reference's query
    surface): BM25 OR over the positive terms with documents containing ANY
    excluded term vetoed inside the kernel — the excluded terms' blocks land
    in the same doc_range group (range salting keys on doc_id), so the veto
    costs extra block decodes, not an anti-join shuffle. Tie buffer past k +
    rounded re-rank, same boundary discipline as every top-k entry."""
    eng = _shared_index(spark, sf_dir)
    hits = eng.search(BM25_QUERY, k=NOT_K + 25, exclude=NOT_EXCLUDE)
    return _topk_rounded(spark, hits, NOT_K)


def _boolean_not_sql() -> str:
    ex = ", ".join(f"'{t}'" for t, _ in parse_query(NOT_EXCLUDE))
    return f"""
SELECT doc_id, score FROM ({_bm25_sql(BM25_QUERY)})
WHERE doc_id NOT IN (
  SELECT DISTINCT doc_id FROM ({_TF_SQL}) WHERE term IN ({ex}))
ORDER BY score DESC, doc_id ASC
LIMIT {NOT_K}
"""


MSM_QUERY = "dup spark merge stream"
MSM_M = 2
MSM_K = 40


def q_min_should_match(spark, sf_dir):
    """minimum_should_match (ES bool should + msm; absent in reference):
    BM25 OR over 4 terms where a result must match ≥2 DISTINCT query
    terms. The hit-count filter runs inside the exhaustive kernel (the
    doc_range salting makes per-doc term counts complete in-group); the
    score of a surviving doc is its plain OR score. Tie buffer + rounded
    re-rank as in every top-k entry."""
    eng = _shared_index(spark, sf_dir)
    hits = eng.search(MSM_QUERY, k=MSM_K + 25, min_should_match=MSM_M)
    return _topk_rounded(spark, hits, MSM_K)


def _min_should_match_sql() -> str:
    terms = ", ".join(f"'{t}'" for t, _ in parse_query(MSM_QUERY))
    return f"""
SELECT doc_id, score FROM ({_bm25_sql(MSM_QUERY)})
WHERE doc_id IN (
  SELECT doc_id FROM (SELECT DISTINCT doc_id, term FROM ({_TF_SQL})
                      WHERE term IN ({terms}))
  GROUP BY doc_id HAVING count(*) >= {MSM_M})
ORDER BY score DESC, doc_id ASC
LIMIT {MSM_K}
"""


# -- document deletion (tombstones + compaction) ------------------------------
# Deterministic dead set: every doc_id ≡ 0 (mod DELETE_MOD) — dense enough
# that the base query's top-k MUST contain dead docs, so a broken tombstone
# filter is observable as a hash mismatch. The subset cap keeps the two
# extra index builds cheap in a driver correctness run.
DELETE_MOD = 7
DELETE_SUBSET = 3000
DELETE_K = 40
_DELETES_IDX: dict[tuple[str, bool], str] = {}


def _deletes_engine(spark, sf_dir: str, compacted: bool):
    """Index over doc_id < DELETE_SUBSET with doc_id % DELETE_MOD == 0
    tombstoned; ``compacted=True`` additionally folds the tombstones into a
    physical rewrite (stats + dictionary rebuilt). One build per
    (sf_dir, compacted) per process."""
    from .query.engine import SearchEngine
    from .streaming.ingest import compact_streamed_index

    key = (sf_dir, compacted)
    path = _DELETES_IDX.get(key)
    if path is None:
        path = _tmpdir("seidx_del_") + "/idx"
        corpus = _docs(spark, sf_dir).filter(F.col("doc_id") < DELETE_SUBSET)
        eng = SearchEngine(spark, path)
        eng.build_index_from_df(
            corpus, id_col="doc_id", text_col="text", range_bits=3, n_buckets=8
        )
        dead = [
            int(r["doc_id"])
            for r in corpus.filter(F.col("doc_id") % DELETE_MOD == 0)
            .select("doc_id")
            .collect()
        ]
        eng.delete_docs(dead)
        if compacted:
            compact_streamed_index(spark, path)
        _DELETES_IDX[key] = path
        return eng
    return SearchEngine(spark, path)


def _topk_rounded(spark, hits, k: int) -> DataFrame:
    """(doc_id, score) list → rounded re-rank cut at k (the tie-buffer
    discipline every top-k driver entry uses)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits] or [], "doc_id long, score double"
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        df.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def q_delete_search(spark, sf_dir):
    """Lucene-style tombstoned deletes: dead docs vanish from results
    IMMEDIATELY while segments stay immutable — so the oracle is BM25 under
    FULL-corpus statistics with dead docs excluded only from the result set
    (until-merge semantics; `tests/test_deletes.py`)."""
    eng = _deletes_engine(spark, sf_dir, compacted=False)
    return _topk_rounded(
        spark, eng.search(BM25_QUERY, k=DELETE_K + 25), DELETE_K
    )


FILTER_LANG = "en"


def q_filtered_search(spark, sf_dir):
    """Metadata-filtered search: restrict the segment path to an allow-set
    derived from a metadata predicate (lang = 'en') while scores keep
    corpus-wide statistics — so the oracle is plain full-corpus BM25 with
    the predicate applied to the RESULT set only. Reuses the shared index
    (filters never mutate it)."""
    eng = _shared_index(spark, sf_dir)
    allow = (
        _docs(spark, sf_dir)
        .filter(F.col("lang") == FILTER_LANG)
        .select("doc_id")
    )
    return _topk_rounded(
        spark,
        eng.search(BM25_QUERY, k=DELETE_K + 25, doc_filter=allow),
        DELETE_K,
    )


def q_delete_compact_search(spark, sf_dir):
    """Deletes folded by compaction: the physical rewrite drops dead
    postings AND rebuilds n_docs/avgdl/df/idf, so the oracle is BM25
    computed from scratch over the SURVIVING corpus only."""
    eng = _deletes_engine(spark, sf_dir, compacted=True)
    return _topk_rounded(
        spark, eng.search(BM25_QUERY, k=DELETE_K + 25), DELETE_K
    )


# -- rank_eval / terms_set / simhash near-dup (round 3, continued) ----------
RANK_EVAL_K = 10
RANK_EVAL_MOD = 3  # deterministic labels: y_true = 1 iff doc_id % MOD == 0

TS_QUERY = "hash merge sort table"
TS_K = 25


def _ranked_batch(spark, sf_dir):
    """(query, doc_id, rank) top-RANK_EVAL_K per batch query, rank over the
    ROUNDED score (+doc_id tie-break) — engine-independent ranks, same
    discipline as q_bm25_batch_topk."""
    from pyspark.sql import Window

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    scored = bm25_score_batch(spark, tf, stats, dct, BATCH_QUERIES, n, avgdl)
    rounded = scored.select(
        F.col("query_id").alias("query"),
        "doc_id",
        F.round("score", ROUND_DP).alias("score"),
    )
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        rounded.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= RANK_EVAL_K)
        .select("query", "doc_id", "rank")
    )


def q_rank_eval(spark, sf_dir):
    """ES ``_rank_eval`` panel: per-query P@k, recall, AP, nDCG@k, RR over
    the batch queries' BM25 top-k against deterministic labels (doc_id ≡ 0
    mod RANK_EVAL_MOD → relevant). The label rule is corpus-wide, so recall
    denominators and IDCG depths are non-trivial (relevant set ≫ k) and a
    metric that ignored unretrieved relevants would hash-mismatch."""
    from .metrics import rank_eval

    results = _ranked_batch(spark, sf_dir)
    labels = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .filter(F.pmod(F.col("doc_id"), F.lit(RANK_EVAL_MOD)) == 0)
        .crossJoin(
            spark.createDataFrame(
                [(q,) for q in sorted(BATCH_QUERIES)], "query string"
            )
        )
        .select("query", "doc_id", F.lit(1).alias("y_true"))
    )
    panel = rank_eval(results, labels, RANK_EVAL_K)
    return panel.select(
        "query",
        *[F.round(c, ROUND_DP).alias(c) for c in ("p_at_k", "recall", "ap", "ndcg", "rr")],
    )


def _rank_eval_sql() -> str:
    k, mod = RANK_EVAL_K, RANK_EVAL_MOD
    return f"""
WITH ranked AS (
  SELECT query_id AS query, doc_id, rank,
         CASE WHEN doc_id % {mod} = 0 THEN 1 ELSE 0 END AS rel
  FROM ({_bm25_batch_sql(BATCH_QUERIES, k)})),
nrel AS (SELECT count(*)::DOUBLE AS n_rel FROM documents WHERE doc_id % {mod} = 0),
idcg AS (
  SELECT sum(1.0 / log2(i + 1.0)) AS idcg
  FROM (SELECT unnest(range(1, least({k}, (SELECT n_rel FROM nrel)::BIGINT) + 1)) AS i)),
prec AS (
  SELECT query, doc_id, rank, rel,
         sum(rel) OVER (PARTITION BY query ORDER BY rank) / rank::DOUBLE AS p_r
  FROM ranked)
SELECT query,
       round(sum(rel) / {k}.0, {ROUND_DP}) AS p_at_k,
       round(sum(rel) / (SELECT n_rel FROM nrel), {ROUND_DP}) AS recall,
       round(coalesce(sum(CASE WHEN rel = 1 THEN p_r END), 0.0)
             / (SELECT n_rel FROM nrel), {ROUND_DP}) AS ap,
       round(coalesce(sum(rel / log2(rank + 1.0)), 0.0)
             / (SELECT idcg FROM idcg), {ROUND_DP}) AS ndcg,
       round(coalesce(1.0 / min(CASE WHEN rel = 1 THEN rank END), 0.0), {ROUND_DP}) AS rr
FROM prec GROUP BY query
"""


def q_terms_set_topk(spark, sf_dir):
    """ES ``terms_set``: match ≥ m(doc) of the 4 query terms where m is a
    PER-DOC field (required = doc_id mod 3 + 1 → thresholds 1/2/3 all
    exercised); score = plain BM25 OR. Rounded re-rank cut at TS_K."""
    from pyspark.sql import Window
    from .scoring import terms_set_score

    tf, stats, dct, n, avgdl = _scoring_ctx(spark, sf_dir)
    required = _docs(spark, sf_dir).select(
        "doc_id", (F.pmod(F.col("doc_id"), F.lit(3)) + 1).alias("required")
    )
    scored = terms_set_score(
        spark, tf, stats, dct, TS_QUERY, required, n, avgdl
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.select("doc_id", F.round("score", ROUND_DP).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TS_K)
        .drop("rn")
    )


def _terms_set_sql() -> str:
    terms = ", ".join(f"'{t}'" for t, _ in parse_query(TS_QUERY))
    return f"""
SELECT doc_id, score FROM (
  SELECT s.doc_id, s.score FROM ({_bm25_sql(TS_QUERY)}) s
  JOIN (SELECT doc_id, count(DISTINCT term) AS matched
        FROM ({_TF_SQL}) WHERE term IN ({terms}) GROUP BY doc_id) m
    ON m.doc_id = s.doc_id
  WHERE m.matched >= greatest(s.doc_id % 3 + 1, 1))
ORDER BY score DESC, doc_id ASC
LIMIT {TS_K}
"""


SIMHASH_NEARDUP_D = 6


def q_simhash_neardup(spark, sf_dir):
    """SimHash Hamming-distance near-dup pairs (Manku WWW'07 banding):
    d=SIMHASH_NEARDUP_D over the 60-bit signatures — d+1 bit-band buckets
    generate candidates, bit_count(xor) verifies exactly. d=6 is the
    selective band on the synthetic corpus (mean pairwise distance ≈19,
    so ≤6 isolates template near-dups without going quadratic)."""
    return dedup.simhash_neardup(_docs(spark, sf_dir), d=SIMHASH_NEARDUP_D)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "doc_tf": q_doc_tf,
        "doc_stats": q_doc_stats,
        "dictionary": q_dictionary,
        "corpus_stats": q_corpus_stats,
        "top_terms": q_top_terms,
        "heavy_hitters": q_heavy_hitters,
        "bm25_scores": q_bm25_scores,
        "bm25_batch_topk": q_bm25_batch_topk,
        "lm_dirichlet": q_lm_dirichlet,
        "lm_jelinek_mercer": q_lm_jelinek_mercer,
        "lm_index_topk": q_lm_index_topk,
        "collapse_topk": q_collapse_topk,
        "collapse_inner_hits": q_collapse_inner_hits,
        "function_score_topk": q_function_score_topk,
        "decay_score_topk": q_decay_score_topk,
        "rank_feature_topk": q_rank_feature_topk,
        "random_score_topk": q_random_score_topk,
        "pinned_topk": q_pinned_topk,
        "parent_topk": q_parent_topk,
        "has_parent_topk": q_has_parent_topk,
        "recency_topk": q_recency_topk,
        "hit_counts": q_hit_counts,
        "inner_scores": q_inner_scores,
        "cosine_scores": q_cosine_scores,
        "bm25_reference": q_bm25_reference,
        "blended_partc": q_blended_partc,
        "blended_parta": q_blended_parta,
        "glove_rerank": q_glove_rerank,
        "boolean_and": q_boolean_and,
        "phrase_topk": q_phrase_topk,
        "phrase_index_topk": q_phrase_index_topk,
        "span_first_topk": q_span_first_topk,
        "common_terms_topk": q_common_terms_topk,
        "near_topk": q_near_topk,
        "span_near_topk": q_span_near_topk,
        "ltr_features": q_ltr_features,
        "ltr_topk": q_ltr_topk,
        "bm25f_topk": q_bm25f_topk,
        "combined_fields_topk": q_combined_fields_topk,
        "multi_match_topk": q_multi_match_topk,
        "wildcard_topk": q_wildcard_topk,
        "regexp_topk": q_regexp_topk,
        "trigram_regexp": q_trigram_regexp,
        "grep_lines": q_grep_lines,
        "grep_facet": q_grep_facet,
        "fork_pairs": q_fork_pairs,
        "grep_batch": q_grep_batch,
        "fuzzy_topk": q_fuzzy_topk,
        "mlt_topk": q_mlt_topk,
        "facet_lang_or": q_facet_lang_or,
        "facet_source_and": q_facet_source_and,
        "facet_stats": q_facet_stats,
        "facet_histogram": q_facet_histogram,
        "facet_composite": q_facet_composite,
        "diversified_sampler": q_diversified_sampler,
        "facet_range": q_facet_range,
        "facet_filters": q_facet_filters,
        "facet_rare_terms": q_facet_rare_terms,
        "facet_adjacency": q_facet_adjacency,
        "facet_matrix_stats": q_facet_matrix_stats,
        "facet_date_histogram": q_facet_date_histogram,
        "facet_pipeline": q_facet_pipeline,
        "facet_serial_diff": q_facet_serial_diff,
        "facet_stats_bucket": q_facet_stats_bucket,
        "facet_percentiles_bucket": q_facet_percentiles_bucket,
        "facet_multi_terms": q_facet_multi_terms,
        "facet_percentiles": q_facet_percentiles,
        "facet_percentile_ranks": q_facet_percentile_ranks,
        "facet_weighted_avg": q_facet_weighted_avg,
        "facet_boxplot": q_facet_boxplot,
        "facet_mad": q_facet_mad,
        "facet_string_stats": q_facet_string_stats,
        "facet_top_metrics": q_facet_top_metrics,
        "facet_t_test": q_facet_t_test,
        "facet_cardinality": q_facet_cardinality,
        "facet_extended_stats": q_facet_extended_stats,
        "facet_bucket_selector": q_facet_bucket_selector,
        "facet_bucket_sort": q_facet_bucket_sort,
        "facet_geo_bounds": q_facet_geo_bounds,
        "facet_geo_centroid": q_facet_geo_centroid,
        "facet_date_range": q_facet_date_range,
        "facet_auto_date_histogram": q_facet_auto_date_histogram,
        "top_hits": q_top_hits,
        "rrf_fusion": q_rrf_fusion,
        "decontamination": q_decontamination,
        "geo_topk": q_geo_topk,
        "geo_pairs": q_geo_pairs,
        "geotile_grid": q_geotile_grid,
        "geo_stored_topk": q_geo_stored_topk,
        "sample_deterministic": q_sample_deterministic,
        "sample_stratified": q_sample_stratified,
        "mixture_plan": q_mixture_plan,
        "mixture_apply": q_mixture_apply,
        "dsir_weights": q_dsir_weights,
        "dsir_select": q_dsir_select,
        "resample_stratified": q_resample_stratified,
        "split_by_group": q_split_by_group,
        "shuffle_shards": q_shuffle_shards,
        "code_tokens": q_code_tokens,
        "chain_tokens": q_chain_tokens,
        "code_search_topk": q_code_search_topk,
        "term_vectors": q_term_vectors,
        "significant_terms": q_significant_terms,
        "query_string_topk": q_query_string_topk,
        "query_string_boosted": q_query_string_boosted,
        "explain_scores": q_explain_scores,
        "suggest": q_suggest,
        "snippets": q_snippets,
        "search_after": q_search_after,
        "update_search": q_update_search,
        "boolean_not": q_boolean_not,
        "min_should_match": q_min_should_match,
        "terms_set_topk": q_terms_set_topk,
        "rescore_topk": q_rescore_topk,
        "phrase_prefix_topk": q_phrase_prefix_topk,
        "rank_eval": q_rank_eval,
        "simhash_neardup": q_simhash_neardup,
        "wand_batch_topk": q_wand_batch_topk,
        "sharded_batch_topk": q_sharded_batch_topk,
        "bm25_prf": q_bm25_prf,
        "term_normalization": q_term_normalization,
        "porter2_stem": q_porter2_stem,
        "porter2_corpus": q_porter2_corpus,
        "bm25_thesaurus": q_bm25_thesaurus,
        "bm25_spell": q_bm25_spell,
        "dedup_exact": q_exact_dedup,
        "locality_ids": q_locality_ids,
        "impact_ids": q_impact_ids,
        "reindex_code_topk": q_reindex_code_topk,
        "line_dedup": q_line_dedup,
        "pack_docs": q_pack_docs,
        "chunk_docs": q_chunk_docs,
        "prepare_pipeline": q_prepare_pipeline,
        "search_fetch_topk": q_search_fetch_topk,
        "event_window_agg": q_event_window_agg,
        "event_sessions": q_event_sessions,
        "event_trending": q_event_trending,
        "bool_query": q_bool_query,
        "bool_index_topk": q_bool_index_topk,
        "bool_dismax": q_bool_dismax,
        "bool_boosting": q_bool_boosting,
        "pagerank": q_pagerank,
        "authority_topk": q_authority_topk,
        "cms_counters": q_cms_counters,
        "hll_registers": q_hll_registers,
        "hll_estimate": q_hll_estimate,
        "bpe_merges": q_bpe_merges,
        "bpe_vocab": q_bpe_vocab,
        "didyoumean": q_didyoumean,
        "value_histogram": q_value_histogram,
        "funnel": q_funnel,
        "retention_cohorts": q_retention,
        "code_definitions": q_definitions,
        "symbol_lookup": q_symbol_lookup,
        "symbol_prefix": q_symbol_prefix,
        "symbol_boosted_topk": q_symbol_boosted_topk,
        "symbol_references": q_symbol_references,
        "code_imports": q_code_imports,
        "code_quality": q_code_quality,
        "license_detect": q_license_detect,
        "winnow_fingerprints": q_winnow_fingerprints,
        "winnow_pairs": q_winnow_pairs,
        "c4_clean": q_c4_clean,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "dedup_ngram_jaccard": q_ngram_jaccard,
        "dedup_minhash_pairs": q_minhash_pairs,
        "dedup_pipeline": q_dedup_pipeline,
        "dedup_keep_best": q_dedup_keep_best,
        "dup_spans": q_dup_spans,
        "maxsim_topk": q_maxsim_topk,
        "maxsim_rerank": q_maxsim_rerank,
        "nb_classify": q_nb_classify,
        "dup_span_scrub": q_dup_span_scrub,
        "simhash": q_simhash,
        "token_count": q_token_count,
        "fingerprint": q_fingerprint,
        "lang_id": q_lang_id,
        "quality_score": q_quality,
        "gopher_quality": q_gopher_quality,
        "repetition_stats": q_repetition_stats,
        "significant_terms_by_category": q_significant_terms_by_category,
        "significant_text": q_significant_text,
        "keyword_tfidf": q_keyword_tfidf,
        "collocations": q_collocations,
        "perplexity": q_perplexity,
        "sorted_search": q_sorted_search,
        "percolate": q_percolate,
        "pii_counts": q_pii_counts,
        "pii_redact": q_pii_redact,
        "entity_tokens": q_entity_tokens,
        "tweet_tokens": q_tweet_tokens,
        "streaming_ingest": q_streaming_ingest,
        "media_metadata": q_media_metadata,
        "media_decode": q_media_decode,
        "media_frames": q_media_frames,
        "media_features": q_media_features,
        "emb_cosine_topk": q_emb_cosine_topk,
        "knn_filtered": q_knn_filtered,
        "emb_neardup": q_emb_neardup,
        "emb_neardup_lsh": q_emb_neardup_lsh,
        "semantic_dedup": q_semantic_dedup,
        "lsh_buckets": q_lsh_buckets,
        "lsh_topk": q_lsh_topk,
        "ivf_assign": q_ivf_assign,
        "ivf_topk": q_ivf_topk,
        "lsh_stored_topk": q_lsh_stored_topk,
        "ivf_stored_topk": q_ivf_stored_topk,
        "sq_quantize": q_sq_quantize,
        "sq_topk": q_sq_topk,
        "sq_stored_topk": q_sq_stored_topk,
        "ann_bq_topk": q_bq_topk,
        "bq_stored_topk": q_bq_stored_topk,
        "pq_codes": q_pq_codes,
        "pq_topk": q_pq_topk,
        "pq_stored_topk": q_pq_stored_topk,
        "ivfpq_topk": q_ivfpq_topk,
        "wand_topk": q_wand_topk,
        "delete_search": q_delete_search,
        "filtered_search": q_filtered_search,
        "delete_compact_search": q_delete_compact_search,
    }


def oracle_sql() -> dict[str, str]:
    from . import didyoumean as _dym
    from .ops import bpe as _bpe
    from .ops.sampling import shuffle_shards_sql, split_by_group_sql

    return {
        "doc_tf": _TF_SQL,
        "doc_stats": _STATS_SQL,
        "dictionary": _DICT_SQL,
        "corpus_stats": f"SELECT count(*)::BIGINT AS n_docs, round(avg(doc_len), {ROUND_DP}) AS avgdl FROM ({_STATS_SQL})",
        "top_terms": f"SELECT term, df, cf FROM ({_DICT_SQL}) ORDER BY cf DESC, term ASC LIMIT 20",
        "heavy_hitters": f"""
SELECT item, cnt,
       row_number() OVER (ORDER BY cnt DESC, item ASC)::BIGINT AS rank
FROM (SELECT term AS item, sum(tf)::BIGINT AS cnt FROM ({_TF_SQL})
      GROUP BY term) t
ORDER BY cnt DESC, item ASC LIMIT {HH_K}
""",
        "bm25_scores": _bm25_sql(BM25_QUERY),
        "bm25_batch_topk": _bm25_batch_sql(BATCH_QUERIES, BATCH_K),
        "lm_dirichlet": _lm_dirichlet_sql(BM25_QUERY, LM_MU),
        "lm_jelinek_mercer": _lm_jm_sql(BM25_QUERY, 0.1),
        # index-native LM must reproduce the relational LM truth
        "lm_index_topk": f"""
SELECT doc_id, score FROM ({_lm_dirichlet_sql(BM25_QUERY, LM_MU)})
ORDER BY score DESC, doc_id ASC LIMIT {LM_INDEX_K}
""",
        "collapse_topk": _collapse_sql(BM25_QUERY, COLLAPSE_FIELD, COLLAPSE_K),
        "collapse_inner_hits": _collapse_inner_hits_sql(
            BM25_QUERY, COLLAPSE_FIELD, COLLAPSE_K, INNER_HITS
        ),
        "function_score_topk": _function_score_sql(BM25_QUERY, FS_K),
        "decay_score_topk": _decay_score_sql(BM25_QUERY, DECAY_K),
        "rank_feature_topk": _rank_feature_sql(BM25_QUERY, FS_K),
        "random_score_topk": _random_score_sql(BM25_QUERY, FS_K),
        "pinned_topk": _pinned_sql(BM25_QUERY, PIN_IDS, FS_K),
        "parent_topk": _parent_sql(BM25_QUERY, COLLAPSE_FIELD, PARENT_K, PARENT_MODE),
        "has_parent_topk": _has_parent_sql(
            BM25_QUERY, COLLAPSE_FIELD, HP_PARENTS, HP_K
        ),
        "recency_topk": _recency_sql(
            BM25_QUERY, RECENCY_HALF_LIFE, RECENCY_AGE_MOD, RECENCY_K
        ),
        "hit_counts": _hit_counts_sql(BATCH_QUERIES),
        "inner_scores": _inner_sql(INNER_QUERY),
        "cosine_scores": _cosine_sql(COSINE_QUERY),
        "boolean_and": _and_sql(AND_QUERY),
        "phrase_topk": _phrase_sql(PHRASE_QUERY, PHRASE_K),
        # index-native phrase must reproduce the text-scan truth exactly
        "phrase_index_topk": _phrase_sql(PHRASE_QUERY, PHRASE_K),
        "span_first_topk": _span_first_sql(PHRASE_QUERY, SPAN_LIMIT, PHRASE_K),
        "common_terms_topk": _common_terms_sql(COMMON_QUERY, COMMON_CUTOFF, COMMON_K),
        "near_topk": _near_sql(PHRASE_QUERY, NEAR_WINDOW, PHRASE_K),
        "span_near_topk": _span_near_sql(
            PHRASE_QUERY, SPAN_NEAR_WINDOW, PHRASE_K
        ),
        "ltr_features": _ltr_features_sql(BATCH_QUERIES),
        "ltr_topk": _ltr_topk_sql(BATCH_QUERIES, LTR_WEIGHTS, LTR_K),
        "bm25f_topk": _bm25f_sql(BM25F_QUERY, BM25F_K),
        "combined_fields_topk": _combined_fields_sql(BM25F_QUERY, BM25F_K),
        "multi_match_topk": _multi_match_sql(BM25F_QUERY, BM25F_K),
        "wildcard_topk": _wildcard_sql(
            WILDCARD_PATTERN, WILDCARD_MAX_EXP, WILDCARD_K
        ),
        "regexp_topk": _regexp_sql(RX_PATTERN, RX_MAX_EXP, RX_K),
        "trigram_regexp": f"""
SELECT doc_id FROM documents
WHERE regexp_matches(text, '{TRIGRAM_PATTERN}')
ORDER BY doc_id LIMIT {TRIGRAM_K}
""",
        "grep_facet": f"""
SELECT lang, count(*)::BIGINT AS n FROM documents
WHERE regexp_matches(text, '{TRIGRAM_PATTERN}')
GROUP BY lang ORDER BY n DESC, lang ASC
""",
        "grep_lines": f"""
WITH hits AS (SELECT doc_id, text FROM documents
              WHERE regexp_matches(text, '{TRIGRAM_PATTERN}')
              ORDER BY doc_id LIMIT {GREP_LINES_K}),
lines AS (SELECT doc_id,
                 generate_subscripts(string_split(text, chr(10)), 1)::BIGINT
                   AS line_no,
                 unnest(string_split(text, chr(10))) AS line
          FROM hits)
SELECT doc_id, line_no, line FROM lines
WHERE regexp_matches(line, '{TRIGRAM_PATTERN}')
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY line_no)
        <= {GREP_LINES_CAP}
ORDER BY doc_id, line_no
""",
        "fuzzy_topk": _fuzzy_sql(
            FUZZY_TERM, FUZZY_MAX_EDITS, FUZZY_MAX_EXP, FUZZY_K
        ),
        "mlt_topk": _mlt_sql(MLT_DOC_ID, MLT_MAX_TERMS, MLT_K),
        "facet_lang_or": _facet_sql(FACET_QUERY.split(), "lang", "or"),
        "facet_composite": _facet_composite_sql(FACET_QUERY.split(), COMPOSITE_KEYS, COMPOSITE_SIZE, COMPOSITE_AFTER),
        "diversified_sampler": _diversified_sampler_sql(
            FACET_QUERY, "source", DS_MAX_PER, DS_SIZE
        ),
        "facet_range": _facet_range_sql(FACET_QUERY.split(), "n_chars", RANGE_BUCKETS),
        "facet_filters": _facet_filters_sql(FACET_QUERY.split(), FILTER_BUCKETS),
        "facet_rare_terms": _facet_rare_terms_sql([RARE_QUERY], "source", RARE_MAX_DOC_COUNT),
        "facet_adjacency": _facet_adjacency_sql(FACET_QUERY.split(), ADJ_FILTERS),
        "facet_matrix_stats": _facet_matrix_stats_sql(FACET_QUERY.split()),
        "facet_source_and": _facet_sql(FACET_QUERY.split(), "source", "and"),
        "facet_stats": _facet_stats_sql(FACET_QUERY.split(), "n_chars", "lang"),
        "facet_histogram": _facet_histogram_sql(
            FACET_QUERY.split(), "n_chars", HIST_INTERVAL
        ),
        "facet_date_histogram": _facet_date_histogram_sql(FACET_QUERY.split()),
        "facet_pipeline": _facet_pipeline_sql(FACET_QUERY.split()),
        "facet_serial_diff": _facet_serial_diff_sql(FACET_QUERY.split()),
        "facet_stats_bucket": _facet_stats_bucket_sql(FACET_QUERY.split()),
        "facet_percentiles_bucket": _facet_percentiles_bucket_sql(
            FACET_QUERY.split()
        ),
        "facet_multi_terms": _facet_multi_terms_sql(FACET_QUERY.split()),
        "facet_percentiles": _facet_percentiles_sql(FACET_QUERY.split()),
        "facet_percentile_ranks": _facet_percentile_ranks_sql(FACET_QUERY.split()),
        "facet_weighted_avg": _facet_weighted_avg_sql(FACET_QUERY.split()),
        "facet_boxplot": _facet_boxplot_sql(FACET_QUERY.split()),
        "facet_mad": _facet_mad_sql(FACET_QUERY.split()),
        "facet_string_stats": _facet_string_stats_sql(FACET_QUERY.split()),
        "facet_top_metrics": _facet_top_metrics_sql(FACET_QUERY.split()),
        "facet_t_test": _facet_t_test_sql(FACET_QUERY.split()),
        "facet_cardinality": _facet_cardinality_sql(FACET_QUERY.split()),
        "facet_extended_stats": _facet_extended_stats_sql(FACET_QUERY.split()),
        "facet_bucket_selector": _facet_bucket_selector_sql(FACET_QUERY.split()),
        "facet_bucket_sort": _facet_bucket_sort_sql(FACET_QUERY.split()),
        "facet_geo_bounds": _facet_geo_bounds_sql(FACET_QUERY.split()),
        "facet_geo_centroid": _facet_geo_centroid_sql(FACET_QUERY.split()),
        "facet_date_range": _facet_date_range_sql(FACET_QUERY.split()),
        "facet_auto_date_histogram": _facet_auto_date_histogram_sql(FACET_QUERY.split()),
        "top_hits": _top_hits_sql(BM25_QUERY, TOP_HITS_N),
        "rrf_fusion": _rrf_fusion_sql(BM25_QUERY),
        "decontamination": dedup.contaminated_pairs_sql(
            "documents", DECON_PRED, w=DECON_W, min_overlap=1
        ),
        "geo_topk": _geo_topk_sql(),
        "geo_pairs": _geo_pairs_sql(),
        "geotile_grid": _geotile_grid_sql(),
        "geo_stored_topk": _geo_topk_sql(),
        "sample_deterministic": _sample_sql(None),
        "sample_stratified": _sample_sql(STRAT_RATES),
        "mixture_plan": _mixture_plan_sql(),
        "mixture_apply": _mixture_apply_sql(),
        "dsir_weights": _dsir_weights_sql(),
        "dsir_select": _dsir_select_sql(),
        "resample_stratified": _resample_sql(),
        "split_by_group": (
            "SELECT doc_id, source, split FROM ("
            + split_by_group_sql("documents", by="source", seed=SAMPLE_SEED)
            + ") t"
        ),
        "shuffle_shards": (
            "SELECT doc_id, shard, pos FROM ("
            + shuffle_shards_sql(
                "documents", SHUFFLE_SHARDS_N, seed=SAMPLE_SEED
            )
            + ") t"
        ),
        "code_tokens": _code_tf_sql(),
        "chain_tokens": _chain_tf_sql(),
        "code_search_topk": _code_search_sql(),
        "term_vectors": _term_vectors_sql(TV_MOD),
        "significant_terms": _significant_terms_sql(
            FACET_QUERY.split(), SIG_TOP_N
        ),
        "query_string_topk": _query_string_sql(QS_QUERY, QS_K),
        "query_string_boosted": _query_string_sql(QS_BOOST_QUERY, QS_BOOST_K),
        "explain_scores": _explain_sql(EXPLAIN_QUERY.split(), EXPLAIN_DOCS),
        "suggest": _suggest_sql(SUGGEST_PREFIX, SUGGEST_N),
        "snippets": _snippet_sql(SNIPPET_QUERY.split(), SNIPPET_WINDOW),
        "bm25_prf": _bm25_prf_sql(BM25_QUERY),
        "term_normalization": _term_normalization_sql(),
        "porter2_stem": _porter2_stem_sql(),
        "bm25_thesaurus": _bm25_thesaurus_sql(INNER_QUERY),
        "bm25_spell": _bm25_spell_sql(SPELL_QUERY),
        "dedup_exact": dedup.exact_dedup_sql("documents"),
        "locality_ids": _locality_ids_sql(),
        "impact_ids": _impact_ids_sql(),
        "reindex_code_topk": _code_search_sql(),
        "line_dedup": dedup.line_dedup_sql(_CHUNK_LINES_SQL),
        "pack_docs": packing.pack_docs_sql("documents", PACK_CAP, PACK_GROUPS),
        "chunk_docs": packing.chunk_docs_sql("documents", CHUNK_SIZE, CHUNK_STRIDE),
        "prepare_pipeline": _prepare_pipeline_sql(),
        "search_fetch_topk": _search_fetch_sql(),
        "event_window_agg": _event_window_sql(),
        "event_sessions": _event_sessions_sql(),
        "event_trending": _event_trending_sql(),
        "bool_query": _bool_query_sql(),
        "bool_index_topk": _bool_index_sql(),
        "bool_dismax": _bool_dismax_sql(),
        "bool_boosting": _bool_boosting_sql(),
        "pagerank": _pagerank_sql(),
        "authority_topk": _authority_sql(),
        "cms_counters": sketch.cms_build_sql("documents", CMS_D, CMS_W),
        "hll_registers": sketch.hll_build_sql(_hll_tokens_table(), "term", p=HLL_P),
        "hll_estimate": sketch.hll_estimate_sql(
            sketch.hll_build_sql(_hll_tokens_table(), "term", p=HLL_P), p=HLL_P
        ),
        "bpe_merges": _bpe.bpe_train_sql("documents", BPE_K, min_pair_count=2),
        "bpe_vocab": _bpe.bpe_vocab_sql("documents", BPE_K, min_pair_count=2),
        "didyoumean": _dym.suggest_phrase_sql("documents", DYM_QUERY),
        "value_histogram": sketch.hist_build_sql("events", "value", HIST_W),
        "funnel": __funnel_sql(),
        "retention_cohorts": _retention_sql(),
        "code_definitions": _definitions_sql(),
        "symbol_lookup": _symbol_lookup_sql(),
        "symbol_prefix": _symbol_prefix_sql(),
        "symbol_boosted_topk": _symbol_boosted_sql(),
        "symbol_references": _symbol_references_sql(),
        "code_imports": _code_imports_sql(),
        "code_quality": _code_quality_sql(),
        "license_detect": _license_detect_sql(),
        "winnow_fingerprints": _winnow_fps_sql(),
        "winnow_pairs": _winnow_pairs_sql(),
        "fork_pairs": _fork_pairs_sql(),
        "grep_batch": _grep_batch_sql(),
        "c4_clean": _c4_clean_sql(),
        "asof_join": _asof_join_sql(),
        "range_join": _range_join_sql(),
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs_sql("documents", w=3, tau=0.2),
        "dedup_minhash_pairs": dedup.minhash_band_pairs_sql("documents"),
        "dedup_pipeline": dedup.dedup_pipeline_sql("documents", w=3, tau=0.2),
        "dedup_keep_best": _dedup_keep_best_sql(),
        "dup_spans": dedup.duplicate_spans_sql("documents", w=DUP_SPAN_W),
        "maxsim_topk": similarity.maxsim_topk_sql(_TF_SQL, MAXSIM_TERMS, k=20),
        "maxsim_rerank": similarity.maxsim_topk_sql(
            f"""
SELECT t.doc_id, t.term FROM ({_TF_SQL}) t
SEMI JOIN (SELECT doc_id FROM ({_bm25_sql(BM25_QUERY)})
           ORDER BY score DESC, doc_id ASC LIMIT {RERANK_N}) c
USING (doc_id)
""",
            BM25_QUERY.split(),
            k=RERANK_K,
        ),
        "nb_classify": classify.nb_train_predict_sql("documents", "documents", "lang"),
        "dup_span_scrub": _dup_span_scrub_sql(),
        "simhash": dedup.simhash_sql("documents"),
        "token_count": textstats.token_count_sql("documents"),
        "fingerprint": textstats.fingerprint_sql("documents"),
        "lang_id": textstats.lang_id_sql("documents"),
        "quality_score": textstats.quality_score_sql("documents"),
        "gopher_quality": textstats.gopher_quality_sql("documents"),
        "repetition_stats": textstats.repetition_stats_sql("documents"),
        "sorted_search": _sorted_search_sql(FACET_QUERY.split()),
        "percolate": _percolate_sql(),
        "pii_counts": _pii_sql("counts"),
        "pii_redact": _pii_sql("redact"),
        "entity_tokens": entity_tokens_sql("fixture", min_df=2).replace(
            "WITH cand AS",
            "WITH fixture(doc_id, text) AS (VALUES "
            + ", ".join(f"({i}::BIGINT, '{t}')" for i, t in ENTITY_FIXTURE)
            + "), cand AS",
            1,
        ),
        "significant_terms_by_category": termstats.significant_terms_sql(
            "documents", top_n=5
        ),
        "significant_text": termstats.significant_text_sql(
            "documents", SIGTEXT_TERMS, top_n=10
        ),
        "keyword_tfidf": termstats.keyword_tfidf_sql("documents", k=3),
        "collocations": termstats.collocations_sql(
            "documents", min_count=5, top_n=25
        ),
        "perplexity": termstats.perplexity_sql("documents"),
        # "tweet_tokens": rows-only (534-line rule parser, non-SQL-expressible)
        "streaming_ingest": f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM ({duckdb_tokens_cte(f"(SELECT * FROM documents WHERE doc_id < {STREAM_DOC_CUT}) AS sub", "doc_id", "text")})
  GROUP BY doc_id, term)
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
""",
        "media_metadata": multimodal.media_metadata_sql("documents"),
        "media_decode": multimodal.decode_media_sql("documents"),
        "media_frames": multimodal.frame_sample_sql("documents"),
        "media_features": multimodal.extract_features_sql("documents"),
        "emb_cosine_topk": similarity.cosine_topk_sql("embeddings", _QUERY_VEC, k=25),
        "knn_filtered": similarity.knn_filtered_sql(
            "embeddings", _QUERY_VEC, "label IN (0, 2)", k=25
        ),
        "emb_neardup": similarity.cosine_neardup_sql("embeddings", tau=0.3),
        "emb_neardup_lsh": similarity.cosine_neardup_lsh_sql(
            "embeddings", tau=0.3, n_planes=8, dim=64
        ),
        "lsh_buckets": similarity.lsh_assign_sql("embeddings", n_planes=8, dim=64),
        "lsh_topk": similarity.lsh_topk_sql("embeddings", _QUERY_VEC, k=10, hamming=1),
        "ivf_assign": similarity.ivf_assign_sql("embeddings", n_lists=16, dim=64),
        "ivf_topk": similarity.ivf_topk_sql("embeddings", _QUERY_VEC, k=10, nprobe=4),
        # the stored layouts must reproduce the compute-per-query truth
        "lsh_stored_topk": similarity.lsh_topk_sql(
            "embeddings", _QUERY_VEC, k=10, hamming=1
        ),
        "ivf_stored_topk": similarity.ivf_topk_sql(
            "embeddings", _QUERY_VEC, k=10, nprobe=4
        ),
        "semantic_dedup": similarity.semantic_dedup_sql(
            "embeddings", tau=SEMDEDUP_TAU
        ),
        "sq_quantize": similarity.sq_quantize_sql("embeddings"),
        "sq_topk": similarity.sq_topk_sql("embeddings", _QUERY_VEC, k=SQ_K),
        "pq_codes": (
            "SELECT vec_id, unnest(range(0, len(codes)))::INT AS sub, "
            "unnest(codes) AS code FROM ("
            + similarity.pq_encode_sql("embeddings")
            + ") enc"
        ),
        "pq_topk": similarity.pq_topk_sql("embeddings", _QUERY_VEC, k=PQ_K),
        "pq_stored_topk": similarity.pq_topk_sql("embeddings", _QUERY_VEC, k=PQ_K),
        "ivfpq_topk": similarity.ivfpq_topk_sql(
            "embeddings", _QUERY_VEC, k=PQ_K, nprobe=4,
            codebooks=similarity._pq_default_books(8, 16, 64),
        ),
        # the int8 stored layout must reproduce the on-the-fly truth
        "sq_stored_topk": similarity.sq_topk_sql("embeddings", _QUERY_VEC, k=SQ_K),
        "ann_bq_topk": similarity.bq_topk_sql(
            "embeddings", _QUERY_VEC, k=BQ_K, rerank=BQ_RERANK
        ),
        "bq_stored_topk": similarity.bq_topk_sql(
            "embeddings", _QUERY_VEC, k=BQ_K, rerank=BQ_RERANK
        ),
        "wand_topk": f"""
SELECT doc_id, score FROM ({_bm25_sql(BM25_QUERY)})
ORDER BY score DESC, doc_id ASC LIMIT {WAND_K}
""",
        "update_search": _update_sql(UPDATE_QUERY.split(), UPDATE_K),
        "boolean_not": _boolean_not_sql(),
        "min_should_match": _min_should_match_sql(),
        "terms_set_topk": _terms_set_sql(),
        "rescore_topk": _rescore_sql(),
        "phrase_prefix_topk": _phrase_prefix_sql(),
        "rank_eval": _rank_eval_sql(),
        "simhash_neardup": dedup.simhash_neardup_sql(
            "documents", d=SIMHASH_NEARDUP_D
        ),
        # two cursor-tiled pages must equal the plain top-2k
        "search_after": f"""
SELECT doc_id, score FROM ({_bm25_sql(PAGE_QUERY)})
ORDER BY score DESC, doc_id ASC LIMIT {2 * PAGE_SIZE}
""",
        # tombstones: FULL-subset stats, dead docs dropped from results only
        "delete_search": f"""
SELECT doc_id, score FROM ({_bm25_sql(BM25_QUERY, tf_sql=f"SELECT * FROM ({_TF_SQL}) WHERE doc_id < {DELETE_SUBSET}")})
WHERE doc_id % {DELETE_MOD} <> 0
ORDER BY score DESC, doc_id ASC LIMIT {DELETE_K}
""",
        # filtered search: full-corpus stats, predicate on the result set
        "filtered_search": f"""
SELECT doc_id, score FROM ({_bm25_sql(BM25_QUERY)})
WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = '{FILTER_LANG}')
ORDER BY score DESC, doc_id ASC LIMIT {DELETE_K}
""",
        # compacted: stats recomputed over the surviving corpus only
        "delete_compact_search": f"""
SELECT doc_id, score FROM ({_bm25_sql(BM25_QUERY, tf_sql=f"SELECT * FROM ({_TF_SQL}) WHERE doc_id < {DELETE_SUBSET} AND doc_id % {DELETE_MOD} <> 0")})
ORDER BY score DESC, doc_id ASC LIMIT {DELETE_K}
""",
        "bm25_reference": _bm25_reference_sql(BM25_QUERY),
        "blended_partc": _blended_partc_sql(BM25_QUERY),
        "blended_parta": _blended_parta_sql(INNER_QUERY),
        "glove_rerank": _glove_rerank_sql(BM25_QUERY),
        # segment batch path reproduces the relational batch oracle
        "wand_batch_topk": _bm25_batch_sql(BATCH_QUERIES, BATCH_K),
        # sharding is a layout choice, not a semantics change: the 3-shard
        # scatter-gather must reproduce the same single-corpus BM25 truth
        "sharded_batch_topk": _bm25_batch_sql(BATCH_QUERIES, BATCH_K),
    }
