"""Corpus-level term analytics for search + training-data curation:
significant terms per category (the Elasticsearch ``significant_terms``
aggregation re-expressed relationally), per-document TF-IDF keyword
extraction, PMI collocation mining, and an add-α bigram language-model
perplexity filter (the CCNet / Wenzek et al. 2020 quality signal: docs
whose token stream the corpus LM finds surprising are low-quality or
off-domain).

Every operator is (a) pure built-in Catalyst expressions — token streams
come from ``tokenizer.tokenize_raw_expr`` (JVM regexp, stopword-filtered,
whole-stage codegen) and all math is JVM ``ln``/arithmetic — and (b) has a
DuckDB SQL twin with identical token rules and pinned rounding for the
driver's cross-engine value-hash gate.

Scale shape (10^12 docs):
- ``significant_terms``: two hash aggregations over the (category, term)
  doc-frequency stream + one over categories; the per-term background df
  comes from the SAME pass (grouping sets would fuse them further). The
  join back is |vocab|-sized — broadcastable for any real vocabulary.
- ``keyword_tfidf``: one (doc, term) tf aggregation (the same one the
  index build runs), one |vocab| df aggregation broadcast back, one
  per-doc window top-k. No quadratic anything.
- ``collocations`` / ``bigram_lm``: the bigram stream is generated
  map-side with ``zip_with(slice, slice)`` — no shuffle before the count
  aggregations, which are all map-side combined. Model tables are
  |bigram-vocab|-sized; the perplexity join is a broadcast when the model
  fits (typical after min-count pruning) and a plain hash join otherwise.

Reference anchor: the reference engine ranks with global df/idf statistics
(Part A/indexer.py builds them; Part C/searcher.py consumes them) — these
operators reuse that exact statistics layer for corpus analytics instead
of retrieval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import duckdb_tokens_cte, tokenize_raw_expr

ROUND_DP = 5


# ---------------------------------------------------------------------------
# significant terms (per-category vs corpus background)
# ---------------------------------------------------------------------------

def significant_terms(
    df: DataFrame,
    category_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 10,
    min_doc_count: int = 2,
) -> DataFrame:
    """Top ``top_n`` significant terms per category by JLH score.

    JLH (the Elasticsearch default heuristic): with fg = df(term, cat) /
    docs(cat) and bg = df(term) / N, score = (fg − bg) · (fg / bg) — the
    product of the absolute and relative frequency lift. Terms with
    fg ≤ bg (no lift) or df(term, cat) < min_doc_count are excluded.

    Output: (category, term, doc_count, bg_count, score) — one row per
    surviving (category, term), ranked per category by score desc, term
    asc, top_n kept. Deterministic: scores rounded at ROUND_DP *before*
    ranking so the cut line is engine-independent.
    """
    doc_terms = df.select(
        F.col(category_col).alias("category"),
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize_raw_expr(F.col(text_col)))).alias("term"),
    )
    # per-(category, term) and per-term document frequencies in one stream
    fg = doc_terms.groupBy("category", "term").agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    bg = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("bg_count"))
    cat_sizes = df.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).alias("cat_docs")
    )
    n_total = df.count()

    scored = (
        fg.filter(F.col("doc_count") >= int(min_doc_count))
        .join(F.broadcast(cat_sizes), "category")
        .join(bg, "term")
        .withColumn("fg_freq", F.col("doc_count") / F.col("cat_docs"))
        .withColumn("bg_freq", F.col("bg_count") / F.lit(float(n_total)))
        .filter(F.col("fg_freq") > F.col("bg_freq"))
        .withColumn(
            "score",
            F.round(
                (F.col("fg_freq") - F.col("bg_freq"))
                * (F.col("fg_freq") / F.col("bg_freq")),
                ROUND_DP,
            ),
        )
    )
    w = Window.partitionBy("category").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(top_n))
        .select("category", "term", "doc_count", "bg_count", "score", "rnk")
    )


def significant_terms_sql(
    table: str,
    category_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 10,
    min_doc_count: int = 2,
) -> str:
    toks = duckdb_tokens_cte(table, id_col, text_col)
    return f"""
WITH toks AS ({toks}),
cats AS (SELECT {id_col} AS doc_id, {category_col} AS category FROM {table}),
doc_terms AS (
  SELECT DISTINCT c.category, t.doc_id, t.term
  FROM toks t JOIN cats c ON t.doc_id = c.doc_id),
fg AS (SELECT category, term, COUNT(*) AS doc_count
       FROM doc_terms GROUP BY category, term),
bg AS (SELECT term, COUNT(*) AS bg_count FROM doc_terms GROUP BY term),
cat_sizes AS (SELECT {category_col} AS category, COUNT(*) AS cat_docs
              FROM {table} GROUP BY 1),
n AS (SELECT COUNT(*)::DOUBLE AS n_total FROM {table}),
scored AS (
  SELECT fg.category, fg.term, fg.doc_count, bg.bg_count,
         ROUND((fg.doc_count / cat_sizes.cat_docs::DOUBLE
                - bg.bg_count / n.n_total)
               * ((fg.doc_count / cat_sizes.cat_docs::DOUBLE)
                  / (bg.bg_count / n.n_total)), {ROUND_DP}) AS score
  FROM fg JOIN cat_sizes USING (category) JOIN bg USING (term) CROSS JOIN n
  WHERE fg.doc_count >= {int(min_doc_count)}
    AND fg.doc_count / cat_sizes.cat_docs::DOUBLE > bg.bg_count / n.n_total),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY category
                               ORDER BY score DESC, term ASC) AS rnk
  FROM scored)
SELECT category, term, doc_count, bg_count, score, rnk
FROM ranked WHERE rnk <= {int(top_n)}
"""


# ---------------------------------------------------------------------------
# per-document TF-IDF keyword extraction
# ---------------------------------------------------------------------------

def keyword_tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document: tf = in-doc term count,
    idf = ln((N + 1) / (df + 1)) (+1 smoothing keeps corpus-wide terms
    finite), score = round(tf · idf). Rank per doc by score desc, term asc.

    Output: (doc_id, term, tf, score, rnk). One tf aggregation + one
    broadcast |vocab| join + one per-doc window — the same shape as the
    index build's statistics stage.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_raw_expr(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_total = df.count()
    scored = tf.join(dfreq, "term").withColumn(
        "score",
        F.round(
            F.col("tf")
            * F.log((F.lit(float(n_total)) + 1.0) / (F.col("df") + 1.0)),
            ROUND_DP,
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
        .select("doc_id", "term", "tf", "score", "rnk")
    )


def keyword_tfidf_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> str:
    toks = duckdb_tokens_cte(table, id_col, text_col)
    return f"""
WITH toks AS ({toks}),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*)::DOUBLE AS n_total FROM {table}),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * ln((n.n_total + 1.0) / (dfreq.df + 1.0)),
               {ROUND_DP}) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rnk
  FROM scored)
SELECT doc_id, term, tf, score, rnk FROM ranked WHERE rnk <= {int(k)}
"""


# ---------------------------------------------------------------------------
# adjacent-bigram stream (shared by collocations + bigram LM)
# ---------------------------------------------------------------------------

def _bigram_stream(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term_a, term_b) for every ADJACENT pair in the
    stopword-filtered token stream (adjacency is post-filter, pinned in
    both engines). Generated map-side: zip_with over two shifted slices
    of the token array — no shuffle, no UDF."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize_raw_expr(F.col(text_col)).alias("toks"),
    ).filter(F.size("toks") >= 2)
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1),"
                "         slice(toks, 2, size(toks) - 1),"
                "         (a, b) -> struct(a AS term_a, b AS term_b))"
            )
        ).alias("bg"),
    )
    return pairs.select("doc_id", "bg.term_a", "bg.term_b")


def _bigram_cte_ordered(table: str, id_col: str, text_col: str) -> str:
    """Order-faithful DuckDB bigram stream: regenerate the token LIST per
    row (regexp_extract_all preserves source order; the filtered list is
    built with a list comprehension, not an unnest + re-aggregate, so no
    reliance on SQL row order)."""
    from ..tokenizer import STOPWORDS, TOKEN_PATTERN

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
tok_lists AS (
  SELECT {id_col} AS doc_id,
         [t FOR t IN regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')
          IF t NOT IN ({stop_list})] AS l
  FROM {table}),
bigrams AS (
  SELECT doc_id, b[1] AS term_a, b[2] AS term_b
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(l)),
                                     i -> [l[i], l[i + 1]])) AS b
        FROM tok_lists WHERE len(l) >= 2) t
)"""


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

def collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Top-``top_n`` adjacent-bigram collocations by pointwise mutual
    information: PMI(a,b) = ln( (c_ab / n_bi) / ((c_a / n_uni)·(c_b /
    n_uni)) ) over the stopword-filtered token stream, bigrams with
    c_ab < min_count dropped (PMI is noise at low counts). Ordered PMI
    desc, then (term_a, term_b) asc.

    Output: (term_a, term_b, pair_count, pmi). Three map-side-combined
    count aggregations; the uni↔bi joins are |vocab|-sized.
    """
    # persist: bi feeds both the pair counts and n_bi, uni feeds the two
    # sides of the pair join and n_uni — unpersisted, the dominant
    # tokenize+explode pass ran once per consumer
    bi = _bigram_stream(df, id_col, text_col).persist()
    c_ab = bi.groupBy("term_a", "term_b").agg(
        F.count(F.lit(1)).alias("pair_count")
    )
    uni = df.select(
        F.explode(tokenize_raw_expr(F.col(text_col))).alias("term")
    ).groupBy("term").agg(F.count(F.lit(1)).alias("c")).persist()
    n_bi = bi.count()
    n_uni = uni.agg(F.sum("c")).collect()[0][0]
    scored = (
        c_ab.filter(F.col("pair_count") >= int(min_count))
        .join(uni.withColumnRenamed("term", "term_a").withColumnRenamed("c", "c_a"), "term_a")
        .join(uni.withColumnRenamed("term", "term_b").withColumnRenamed("c", "c_b"), "term_b")
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("pair_count") / F.lit(float(n_bi)))
                    / (
                        (F.col("c_a") / F.lit(float(n_uni)))
                        * (F.col("c_b") / F.lit(float(n_uni)))
                    )
                ),
                ROUND_DP,
            ),
        )
    )
    out = (
        scored.select("term_a", "term_b", "pair_count", "pmi")
        .orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
        .limit(int(top_n))
        .localCheckpoint()  # ≤ top_n rows; release the stream caches
    )
    bi.unpersist()
    uni.unpersist()
    return out


def collocations_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> str:
    toks = duckdb_tokens_cte(table, id_col, text_col)
    bigrams = _bigram_cte_ordered(table, id_col, text_col)
    return f"""
WITH {bigrams.strip().lstrip()},
c_ab AS (SELECT term_a, term_b, COUNT(*) AS pair_count
         FROM bigrams GROUP BY term_a, term_b),
uni AS (SELECT term, COUNT(*) AS c FROM ({toks}) t GROUP BY term),
n_bi AS (SELECT COUNT(*)::DOUBLE AS n FROM bigrams),
n_uni AS (SELECT SUM(c)::DOUBLE AS n FROM uni)
SELECT c_ab.term_a, c_ab.term_b, c_ab.pair_count,
       ROUND(ln((c_ab.pair_count / n_bi.n)
                / ((ua.c / n_uni.n) * (ub.c / n_uni.n))), {ROUND_DP}) AS pmi
FROM c_ab
JOIN uni ua ON c_ab.term_a = ua.term
JOIN uni ub ON c_ab.term_b = ub.term
CROSS JOIN n_bi CROSS JOIN n_uni
WHERE c_ab.pair_count >= {int(min_count)}
ORDER BY pmi DESC, term_a ASC, term_b ASC
LIMIT {int(top_n)}
"""


# ---------------------------------------------------------------------------
# add-α bigram LM perplexity (CCNet-style quality filter)
# ---------------------------------------------------------------------------

def bigram_lm_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Train the corpus bigram LM: returns (bigram counts (term_a, term_b,
    c_ab), unigram counts (term, c), vocab size V). Two map-side-combined
    aggregations; model tables are |vocab|-sized."""
    bi = _bigram_stream(df, id_col, text_col)
    c_ab = bi.groupBy("term_a", "term_b").agg(F.count(F.lit(1)).alias("c_ab"))
    uni = df.select(
        F.explode(tokenize_raw_expr(F.col(text_col))).alias("term")
    ).groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    vocab = uni.count()
    return c_ab, uni, vocab


def perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.1,
    model: tuple[DataFrame, DataFrame, int] | None = None,
) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood and perplexity
    under an add-α smoothed corpus LM — the CCNet quality signal
    (high perplexity ⇒ the corpus LM finds the doc surprising).

    P(b|a) = (c_ab + α) / (c_a + α·V); unseen contexts fall back to the
    uniform α / (α·V) = 1/V. Per doc: nll = mean over its bigram stream
    of −ln P, ppl = exp(nll), both rounded at ROUND_DP (nll first, ppl
    computed FROM the rounded nll so the pair stays consistent
    cross-engine).

    Output: (doc_id, n_bigrams, nll, ppl). Docs with < 2 tokens have no
    bigrams and are absent (the SQL twin pins the same).

    Pass ``model=`` (from :func:`bigram_lm_counts`, possibly over a
    DIFFERENT reference corpus) to score out-of-domain; default trains on
    ``df`` itself. At 10^12 docs the model is min-count-pruned and
    broadcast; the doc-side stream joins it without shuffling the corpus
    twice.
    """
    c_ab, uni, vocab = model if model is not None else bigram_lm_counts(
        df, id_col, text_col
    )
    a = float(alpha)
    bi = _bigram_stream(df, id_col, text_col)
    ll = (
        bi.join(c_ab, ["term_a", "term_b"], "left")
        .join(uni.withColumnRenamed("term", "term_a").withColumnRenamed("c", "c_a"),
              "term_a", "left")
        .withColumn(
            "logp",
            F.log(
                (F.coalesce(F.col("c_ab"), F.lit(0)) + F.lit(a))
                / (F.coalesce(F.col("c_a"), F.lit(0)) + F.lit(a * vocab))
            ),
        )
    )
    out = ll.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("logp"), ROUND_DP).alias("nll"),
    )
    return out.withColumn("ppl", F.round(F.exp(F.col("nll")), ROUND_DP)).select(
        "doc_id", "n_bigrams", "nll", "ppl"
    )


def perplexity_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.1,
) -> str:
    toks = duckdb_tokens_cte(table, id_col, text_col)
    bigrams = _bigram_cte_ordered(table, id_col, text_col)
    a = float(alpha)
    return f"""
WITH {bigrams.strip().lstrip()},
c_ab AS (SELECT term_a, term_b, COUNT(*) AS c_ab
         FROM bigrams GROUP BY term_a, term_b),
uni AS (SELECT term, COUNT(*) AS c FROM ({toks}) t GROUP BY term),
v AS (SELECT COUNT(*)::DOUBLE AS vocab FROM uni),
ll AS (
  SELECT b.doc_id,
         ln((COALESCE(m.c_ab, 0) + {a})
            / (COALESCE(u.c, 0) + {a} * v.vocab)) AS logp
  FROM bigrams b
  LEFT JOIN c_ab m ON b.term_a = m.term_a AND b.term_b = m.term_b
  LEFT JOIN uni u ON b.term_a = u.term
  CROSS JOIN v),
agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         ROUND(-AVG(logp), {ROUND_DP}) AS nll
  FROM ll GROUP BY doc_id)
SELECT doc_id, n_bigrams, nll, ROUND(exp(nll), {ROUND_DP}) AS ppl FROM agg
"""


def perplexity_filter(
    df: DataFrame,
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.1,
    model: tuple[DataFrame, DataFrame, int] | None = None,
) -> DataFrame:
    """Keep documents whose bigram-LM perplexity is ≤ ``max_ppl`` (docs
    too short to have bigrams are kept — no evidence against them).
    The standard CCNet-style curation step, composable with
    ``ops.pipeline``."""
    ppl = perplexity(df, id_col, text_col, alpha, model).select(
        F.col("doc_id").alias("__ppl_doc_id"), "ppl"
    )
    return (
        df.join(ppl, df[id_col] == ppl["__ppl_doc_id"], "left")
        .filter((F.col("ppl").isNull()) | (F.col("ppl") <= float(max_ppl)))
        .drop("__ppl_doc_id", "ppl")
    )


def significant_text(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 10,
    min_doc_count: int = 2,
) -> DataFrame:
    """Significant terms OF A QUERY'S HIT SET vs the corpus background
    (the Elasticsearch ``significant_text`` aggregation): what vocabulary
    is characteristic of documents matching ``query_terms`` (OR match)?
    Same JLH score as :func:`significant_terms` with the hit set as the
    foreground; the query terms themselves are excluded (they are
    trivially significant). Output (term, doc_count, bg_count, score, rnk).

    Scale shape: the hit set is derived from the same distinct (doc,
    term) stream as the background df — one aggregation each + a
    semi-join of the stream against the hit ids; nothing quadratic.
    """
    qset = sorted({t for t in query_terms})
    if not qset:
        raise ValueError("query_terms must be non-empty")
    doc_terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize_raw_expr(F.col(text_col)))).alias("term"),
    )
    doc_terms = doc_terms.persist()  # hit-set probe, fg, and bg all scan it
    hits = doc_terms.filter(F.col("term").isin(qset)).select("doc_id").distinct()
    n_hits = hits.count()
    n_total = df.count()
    fg = (
        doc_terms.join(hits, "doc_id")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    bg = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("bg_count"))
    scored = (
        fg.filter(~F.col("term").isin(qset))
        .filter(F.col("doc_count") >= int(min_doc_count))
        .join(bg, "term")
        .withColumn("fg_freq", F.col("doc_count") / F.lit(float(n_hits)))
        .withColumn("bg_freq", F.col("bg_count") / F.lit(float(n_total)))
        .filter(F.col("fg_freq") > F.col("bg_freq"))
        .withColumn(
            "score",
            F.round(
                (F.col("fg_freq") - F.col("bg_freq"))
                * (F.col("fg_freq") / F.col("bg_freq")),
                ROUND_DP,
            ),
        )
    )
    # top-n via orderBy+limit (TakeOrderedAndProject: bounded heap per
    # partition) — a partitionless row_number window would funnel the
    # whole |vocab|-sized scored frame through ONE task; rnk is then
    # derived on the tiny collected slice
    top = (
        scored.orderBy(F.desc("score"), F.asc("term"))
        .limit(int(top_n))
        .select("term", "doc_count", "bg_count", "score")
    )
    w = Window.partitionBy().orderBy(F.desc("score"), F.asc("term"))
    out = top.withColumn("rnk", F.row_number().over(w))
    out = out.localCheckpoint()  # ≤ top_n rows; release the token cache
    doc_terms.unpersist()
    return out


def significant_text_sql(
    table: str,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 10,
    min_doc_count: int = 2,
) -> str:
    qset = sorted({t for t in query_terms})
    qlist = ", ".join(f"'{t}'" for t in qset)
    toks = duckdb_tokens_cte(table, id_col, text_col)
    return f"""
WITH doc_terms AS (SELECT DISTINCT doc_id, term FROM ({toks}) t),
hits AS (SELECT DISTINCT doc_id FROM doc_terms WHERE term IN ({qlist})),
n AS (SELECT (SELECT COUNT(*)::DOUBLE FROM hits) AS n_hits,
             (SELECT COUNT(*)::DOUBLE FROM {table}) AS n_total),
fg AS (SELECT term, COUNT(*) AS doc_count
       FROM doc_terms JOIN hits USING (doc_id) GROUP BY term),
bg AS (SELECT term, COUNT(*) AS bg_count FROM doc_terms GROUP BY term),
scored AS (
  SELECT fg.term, fg.doc_count, bg.bg_count,
         ROUND((fg.doc_count / n.n_hits - bg.bg_count / n.n_total)
               * ((fg.doc_count / n.n_hits) / (bg.bg_count / n.n_total)),
               {ROUND_DP}) AS score
  FROM fg JOIN bg USING (term) CROSS JOIN n
  WHERE fg.term NOT IN ({qlist})
    AND fg.doc_count >= {int(min_doc_count)}
    AND fg.doc_count / n.n_hits > bg.bg_count / n.n_total),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, term ASC) AS rnk
  FROM scored)
SELECT term, doc_count, bg_count, score, rnk FROM ranked
WHERE rnk <= {int(top_n)}
"""
