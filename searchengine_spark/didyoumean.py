"""Did-you-mean phrase suggestion (the Elasticsearch phrase-suggester
analogue): correct a whole query phrase, not term-by-term, by ranking
candidate phrases with the corpus bigram language model so corrections
that co-occur ("spark stream") beat corrections that are merely close in
edit distance ("spars steam").

Pipeline per query position: candidate terms = vocabulary within
``max_edits`` Levenshtein of the query term (top ``per_term`` by
(distance ASC, count DESC, term ASC) — the exact term, when known, is
always rank 1 at distance 0); then a BEAM search over positions scores
partial phrases with add-α bigram log-likelihood minus an edit penalty,
keeping ``beam`` partials per step. Scores are ROUNDED at each step so
beam decisions are engine-independent (JVM vs DuckDB ``ln`` can differ in
the last ulp); the DuckDB twin unrolls the same beam steps as CTEs.

Scale shape: the vocabulary/model tables are |vocab|-sized; every
candidate scan is a length-banded, THRESHOLDED-Levenshtein pass over the
vocabulary topped by TakeOrderedAndProject (no unpartitioned window, no
full-dictionary O(len²) distance — same pruning as
``SearchEngine.expand_fuzzy``), and every beam step joins a
≤beam×per_term-row frame against the broadcast model — the corpus itself
is never touched at suggest time. Model
training (``termstats.bigram_lm_counts``) is the one corpus pass, shared
with the perplexity filter.

Reference anchor: the reference's spell layer corrects terms in isolation
(Part C ranker variants pass query terms through a static spell map);
phrase-level correction is the context-aware generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ops.termstats import bigram_lm_counts
from .tokenizer import tokenize_py

ROUND_DP = 5


def _candidates(uni: DataFrame, qterm: str, max_edits: int, per_term: int) -> DataFrame:
    """(term, c, lev): the per_term closest vocabulary terms, pruned the
    way ``SearchEngine.expand_fuzzy`` prunes: the length band
    ``|len(t) − len(q)| ≤ max_edits`` cuts the vocabulary BEFORE the
    O(len²) distance, the JVM levenshtein is THRESHOLDED at max_edits
    (early bail-out, −1 past the cap), and the global rank is an
    ``orderBy().limit()`` — Spark plans TakeOrderedAndProject (per-
    partition heap + driver merge), not an unpartitioned window, so a
    10⁸-term vocabulary never funnels through one partition. Ranking is
    identical to the DuckDB twin's full-scan row_number (lev ASC is the
    leading key, so the threshold filter cannot change the top set).
    A position with NO vocabulary term within max_edits keeps the
    ORIGINAL term as its sole candidate (the ES phrase-suggester rule) —
    without it one novel identifier emptied the whole beam and every
    suggestion."""
    base = (
        uni.filter(
            (F.length("term") >= len(qterm) - int(max_edits))
            & (F.length("term") <= len(qterm) + int(max_edits))
        )
        .withColumn(
            "lev", F.levenshtein(F.lit(qterm), F.col("term"), int(max_edits))
        )
        .filter(F.col("lev") >= 0)  # thresholded levenshtein → -1 past cap
        .orderBy(F.asc("lev"), F.desc("c"), F.asc("term"))
        .limit(int(per_term))
        .withColumn("fb", F.lit(0))
    )
    fallback = uni.sparkSession.createDataFrame(
        [(qterm, 0, 0, 1)], "term string, c long, lev int, fb int"
    )
    # this window runs over a PROVABLY bounded frame (≤ per_term + 1 rows
    # after the limit above) — the facets-style bounded-frame exemption
    n_real = F.sum(F.when(F.col("fb") == 0, 1).otherwise(0)).over(
        Window.partitionBy()
    )
    return (
        base.unionByName(fallback)
        .withColumn("_n", n_real)
        .filter((F.col("fb") == 0) | (F.col("_n") == 0))
        .drop("fb", "_n")
    )


def suggest_phrase(
    df: DataFrame,
    query: str,
    max_edits: int = 2,
    per_term: int = 5,
    beam: int = 8,
    top_n: int = 5,
    alpha: float = 0.1,
    edit_penalty: float = 1.0,
    model: tuple[DataFrame, DataFrame, int] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(phrase, score): top-``top_n`` corrected phrases for ``query``.

    score = Σ_i [ln P(w_i | w_{i-1}) − edit_penalty·lev(q_i, w_i)], with
    P from the add-α bigram LM (position 0 uses the add-α unigram) and
    per-step rounding at ROUND_DP. Ordered score DESC, phrase ASC.

    Pass ``model=`` (from ``termstats.bigram_lm_counts``) to reuse a
    trained LM; default trains on ``df``. Raises ValueError on an empty
    (all-stopword) query.
    """
    qterms = tokenize_py(query)
    if not qterms:
        raise ValueError("query has no indexable terms")
    # persist uni only when WE trained it (it feeds one _candidates scan
    # per query term); a caller-supplied model manages its own caching —
    # and either way the cache is released before returning (the result
    # is collected, beam·top_n-bounded, so nothing lazy escapes)
    own_model = model is None
    c_ab, uni, vocab = (
        model if model is not None else bigram_lm_counts(df, id_col, text_col)
    )
    if own_model:
        uni = uni.persist()
    a = float(alpha)
    n_uni = uni.agg(F.sum("c")).collect()[0][0] or 0
    pen = float(edit_penalty)

    # position 0: unigram-scored candidates
    cand0 = _candidates(uni, qterms[0], max_edits, per_term)
    state = cand0.select(
        F.col("term").alias("phrase"),
        F.col("term").alias("last"),
        F.round(
            F.log((F.col("c") + a) / F.lit(float(n_uni) + a * vocab))
            - pen * F.col("lev"),
            ROUND_DP,
        ).alias("score"),
    )
    wbeam = Window.partitionBy().orderBy(F.desc("score"), F.asc("phrase"))
    state = state.withColumn("rnk", F.row_number().over(wbeam)).filter(
        F.col("rnk") <= int(beam)
    ).drop("rnk")

    bi = c_ab.withColumnRenamed("term_a", "last").withColumnRenamed("term_b", "term")
    for qi in qterms[1:]:
        cand = _candidates(uni, qi, max_edits, per_term).withColumnRenamed(
            "c", "c_next"
        )
        ext = (
            state.crossJoin(F.broadcast(cand))
            .join(F.broadcast(bi), ["last", "term"], "left")
            .join(
                F.broadcast(uni.withColumnRenamed("term", "last")), "last", "left"
            )
            .select(
                F.concat_ws(" ", "phrase", "term").alias("phrase"),
                F.col("term").alias("last"),
                F.round(
                    F.col("score")
                    + F.log(
                        (F.coalesce(F.col("c_ab"), F.lit(0)) + a)
                        / (F.coalesce(F.col("c"), F.lit(0)) + a * vocab)
                    )
                    - pen * F.col("lev"),
                    ROUND_DP,
                ).alias("score"),
            )
        )
        state = ext.withColumn("rnk", F.row_number().over(wbeam)).filter(
            F.col("rnk") <= int(beam)
        ).drop("rnk")

    out = (
        state.select("phrase", "score")
        .orderBy(F.desc("score"), F.asc("phrase"))
        .limit(int(top_n))
    )
    rows = out.collect()
    if own_model:
        uni.unpersist()
    return df.sparkSession.createDataFrame(rows, out.schema)


def suggest_phrase_sql(
    table: str,
    query: str,
    max_edits: int = 2,
    per_term: int = 5,
    beam: int = 8,
    top_n: int = 5,
    alpha: float = 0.1,
    edit_penalty: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin: the same candidate ranking and beam steps unrolled as
    CTEs (identical rounding, tie-breaks, and smoothing constants)."""
    from .ops.termstats import _bigram_cte_ordered
    from .tokenizer import duckdb_tokens_cte

    qterms = tokenize_py(query)
    if not qterms:
        raise ValueError("query has no indexable terms")
    toks = duckdb_tokens_cte(table, id_col, text_col)
    bigrams = _bigram_cte_ordered(table, id_col, text_col)
    a = float(alpha)
    pen = float(edit_penalty)

    parts = [
        f"""{bigrams.strip().lstrip()},
uni AS (SELECT term, COUNT(*) AS c FROM ({toks}) t GROUP BY term),
c_ab AS (SELECT term_a, term_b, COUNT(*) AS c_ab
         FROM bigrams GROUP BY term_a, term_b),
consts AS (SELECT (SELECT SUM(c) FROM uni)::DOUBLE AS n_uni,
                  (SELECT COUNT(*) FROM uni)::DOUBLE AS vocab)"""
    ]
    for i, q in enumerate(qterms):
        parts.append(
            f"""cand_base_{i} AS (
  SELECT term, c, lev FROM (
    SELECT term, c, levenshtein('{q}', term) AS lev,
           ROW_NUMBER() OVER (ORDER BY levenshtein('{q}', term) ASC,
                              c DESC, term ASC) AS rnk
    FROM uni) WHERE lev <= {int(max_edits)} AND rnk <= {int(per_term)}),
cand_{i} AS (
  SELECT * FROM cand_base_{i}
  UNION ALL
  SELECT '{q}' AS term, 0 AS c, 0 AS lev
  WHERE NOT EXISTS (SELECT 1 FROM cand_base_{i}))"""
        )
    parts.append(
        f"""state_0 AS (
  SELECT phrase, last, score FROM (
    SELECT term AS phrase, term AS last,
           ROUND(ln((c + {a}) / (consts.n_uni + {a} * consts.vocab))
                 - {pen} * lev, {ROUND_DP}) AS score,
           ROW_NUMBER() OVER (
             ORDER BY ROUND(ln((c + {a}) / (consts.n_uni + {a} * consts.vocab))
                            - {pen} * lev, {ROUND_DP}) DESC, term ASC) AS rnk
    FROM cand_0 CROSS JOIN consts) WHERE rnk <= {int(beam)})"""
    )
    for i in range(1, len(qterms)):
        parts.append(
            f"""state_{i} AS (
  SELECT phrase, last, score FROM (
    SELECT s.phrase || ' ' || c.term AS phrase, c.term AS last,
           ROUND(s.score
                 + ln((COALESCE(m.c_ab, 0) + {a})
                      / (COALESCE(u.c, 0) + {a} * consts.vocab))
                 - {pen} * c.lev, {ROUND_DP}) AS score,
           ROW_NUMBER() OVER (
             ORDER BY ROUND(s.score
                            + ln((COALESCE(m.c_ab, 0) + {a})
                                 / (COALESCE(u.c, 0) + {a} * consts.vocab))
                            - {pen} * c.lev, {ROUND_DP}) DESC,
                      s.phrase || ' ' || c.term ASC) AS rnk
    FROM state_{i - 1} s
    CROSS JOIN cand_{i} c
    LEFT JOIN c_ab m ON m.term_a = s.last AND m.term_b = c.term
    LEFT JOIN uni u ON u.term = s.last
    CROSS JOIN consts) WHERE rnk <= {int(beam)})"""
        )
    last = len(qterms) - 1
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT phrase, score FROM state_{last}
ORDER BY score DESC, phrase ASC LIMIT {int(top_n)}
"""
    )
