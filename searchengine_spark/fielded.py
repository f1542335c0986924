"""BM25F fielded retrieval as pure column arithmetic.

Scores documents that carry SEVERAL text fields (e.g. name + type, title +
body) with per-field weights under ONE saturation, the Robertson/Zaragoza
BM25F ("Simple BM25 extension to multiple weighted fields", CIKM'04):

    tf~_{t,d,f} = tf_{t,d,f} / (1 + b·(len_{d,f}/avgl_f − 1))   field norm
    wtf_{t,d}   = Σ_f w_f · tf~_{t,d,f}                          weighted tf
    score(d)    = Σ_t idf(t) · (k1+1)·wtf / (k1 + wtf)

with idf = ln(1 + (N − df + 0.5)/(df + 0.5)) over DOCUMENT-level df (the
term occurs in any field). The (k1+1) numerator makes the single-field
weight-1.0 case reduce EXACTLY to standard BM25 (tested), so BM25F is a
strict generalization of the engine's primary scorer.

Design notes (100 TB):
  * everything is one declarative plan — per-field explode/agg with map-side
    combine, the |q|-row query side broadcast, field averages a
    |fields|-row broadcast; no Python in the hot path.
  * ``avgl_f`` divides the field-length SUM by the TOTAL corpus doc count
    (docs where the field parses empty count as length 0) — the standard
    convention, and the one the SQL twin mirrors.
  * the per-field tf subtree is referenced twice (lengths need all terms,
    scoring only the query's); Catalyst pushes the term filter below the
    aggregation on the scoring branch, and at real scale the staged-tf
    persist the index build already does (index/build.py stage A) applies
    the same way.

``multi_match_best_fields`` is the OTHER standard fielded semantics (ES
``multi_match`` type=best_fields): each field is scored as an independent
BM25 query under ITS OWN statistics (field df, field avgdl over the total
doc count), boosted by its weight, and the per-doc result is the
dis_max combine — best field + tie_breaker · (others). Where BM25F pools
term frequencies under one saturation, best_fields rewards the single
best field — the right semantics when fields are alternatives (path vs
content) rather than parts of one text.

Reference analogue: none — the reference scores a single text field
(``Part C/ranker.py``); fielded weighting is engine-hardening surface a
source-code corpus needs (filename vs file body, SURVEY.md input table).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .postings import term_frequencies
from .scoring import _ordered_sum, _query_df, bm25_score


def fielded_term_frequencies(
    df: DataFrame, id_col: str, fields: list[str]
) -> DataFrame:
    """corpus → (doc_id, field, term, tf): one tokenize+agg per field,
    unioned with a field tag. Each field uses the engine's tokenizer
    (stopword-filtered), so fielded and plain retrieval agree on terms."""
    parts = [
        term_frequencies(df, id_col=id_col, text_col=f_name).withColumn(
            "field", F.lit(f_name)
        )
        for f_name in fields
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("doc_id", "field", "term", "tf")


def bm25f_score(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    fields: dict[str, float],
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """→ (doc_id, score) unsorted, one row per doc matching ≥1 query term
    in ≥1 field. ``fields``: {column_name: weight}. Scores accumulate in
    sorted-term order (bit-stable across parallelism, same discipline as
    ``scoring.bm25_score``)."""
    if not fields:
        raise ValueError("fields must map ≥1 text column to a weight")
    ftf = fielded_term_frequencies(df, id_col, sorted(fields))

    n_corpus = df.select(F.count(F.lit(1)).alias("n"))  # 1 row, broadcast
    flen = ftf.groupBy("doc_id", "field").agg(F.sum("tf").alias("flen"))
    avgf = (
        flen.groupBy("field")
        .agg(F.sum("flen").alias("len_sum"))
        .crossJoin(F.broadcast(n_corpus))
        .select("field", (F.col("len_sum") / F.col("n")).alias("avgfl"))
    )

    q = F.broadcast(_query_df(spark, query).select("term"))
    qtf = ftf.join(q, "term")
    dictf = (
        qtf.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    w_map = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(fields.items())]
    )
    tf_norm = F.col("tf") / (1.0 + b * (F.col("flen") / F.col("avgfl") - 1.0))
    wtf = (
        qtf.join(flen, ["doc_id", "field"])
        .join(F.broadcast(avgf), "field")
        .select("doc_id", "term", (w_map[F.col("field")] * tf_norm).alias("wt"))
        .groupBy("doc_id", "term")
        .agg(F.sum("wt").alias("wtf"))
    )

    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    cand = wtf.join(F.broadcast(dictf), "term").crossJoin(F.broadcast(n_corpus))
    per_term = idf * (k1 + 1.0) * F.col("wtf") / (k1 + F.col("wtf"))
    return _ordered_sum(cand, per_term)


def combined_fields_score(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    fields: dict[str, float],
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Elasticsearch ``combined_fields`` — the THIRD standard fielded
    semantics, term-centric: the fields are merged into one SYNTHETIC
    field before any saturation.

        tf_c(t,d)  = Σ_f boost_f · tf(t,d,f)
        len_c(d)   = Σ_f boost_f · len(d,f)
        avgdl_c    = Σ_d len_c(d) / N          (all N docs, empty = 0)
        score(d)   = Σ_t idf(t) · (k1+1)·tf_c / (tf_c + k1·(1−b+b·len_c/avgdl_c))

    with document-level idf like BM25F. Contrast: BM25F normalizes each
    field's tf by ITS OWN length before weighting (a long body can't
    drown a short title); combined_fields normalizes once by the merged
    length — ES's model of "the fields are one text that happens to be
    split" (title+h1+body). best_fields treats them as alternatives.

    Same plan shape as bm25f_score: per-field tf union, map-side combines,
    |q|-row and 1-row broadcasts, sorted-term accumulation — no extra
    shuffle over plain BM25 beyond the field union."""
    if not fields:
        raise ValueError("fields must map ≥1 text column to a weight")
    ftf = fielded_term_frequencies(df, id_col, sorted(fields))
    w_map = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(fields.items())]
    )
    weighted = ftf.select(
        "doc_id", "term", (w_map[F.col("field")] * F.col("tf")).alias("wtf")
    )
    ctf = weighted.groupBy("doc_id", "term").agg(F.sum("wtf").alias("ctf"))
    clen = weighted.groupBy("doc_id").agg(F.sum("wtf").alias("clen"))

    n_corpus = df.select(F.count(F.lit(1)).alias("n"))  # 1 row, broadcast
    avg_row = clen.agg(F.sum("clen").alias("len_sum")).crossJoin(
        F.broadcast(n_corpus)
    ).select((F.col("len_sum") / F.col("n")).alias("avgdl"), "n")

    q = F.broadcast(_query_df(spark, query).select("term"))
    qctf = ctf.join(q, "term")
    dictc = (
        qctf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )  # ctf rows are per (doc, term) — count IS the doc count

    cand = (
        qctf.join(clen, "doc_id")
        .join(F.broadcast(dictc), "term")
        .crossJoin(F.broadcast(avg_row))
    )
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    # same association as scoring.bm25_score: idf * (tf*(k1+1)) / denom —
    # the weight-1 single-field case then reduces to BM25 EXACTLY (tested)
    denom = F.col("ctf") + k1 * (1.0 - b + b * F.col("clen") / F.col("avgdl"))
    per_term = idf * (F.col("ctf") * (k1 + 1.0)) / denom
    return _ordered_sum(cand, per_term)


def multi_match_best_fields(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    fields: dict[str, float],
    query: str,
    tie_breaker: float = 0.0,
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 5,
) -> DataFrame:
    """ES ``multi_match`` type=best_fields → (doc_id, score) unsorted.

    Each field is an independent BM25 sub-query with field-local df and
    field avgdl (Σ field length / TOTAL doc count — empty fields count as
    length 0, same convention as BM25F above); sub-score × weight, rounded
    to ``round_dp``, then per doc: best + tie_breaker · (sum − best).
    One union + one groupBy(max, sum) — no per-field join chain, so the
    plan is |fields| scans + 2 shuffles however many fields there are.

    Determinism contract (oracle-exact): sub-scores round BEFORE the
    combine and the tie multiply happens on rounded 5dp decimals — pick a
    tie_breaker with an even last digit (0.4, not 0.3/0.5) when the result
    must hash-match a decimal-rounding SQL twin, same rule as
    ``boolquery`` dis_max nodes."""
    if not fields:
        raise ValueError("fields must map ≥1 text column to a weight")
    n_docs = df.count()
    subs: list[DataFrame] = []
    caches: list[DataFrame] = []
    for f_name in sorted(fields):
        # persisted: the emptiness probe, the field dictionary, and the
        # BM25 scoring all consume this frame — unpersisted, each field
        # tokenized the corpus ~3 times
        tf_f = term_frequencies(df, id_col=id_col, text_col=f_name).persist()
        caches.append(tf_f)
        stats_f = tf_f.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
        len_sum = stats_f.agg(F.sum("doc_len").alias("s")).first()["s"] or 0
        if len_sum == 0:
            continue  # field tokenizes empty everywhere: no sub-query
        avgdl_f = len_sum / n_docs
        dict_f = tf_f.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        scored = bm25_score(
            spark, tf_f, stats_f, dict_f, query, n_docs, avgdl_f, k1, b
        )
        subs.append(
            scored.select(
                "doc_id",
                F.round(F.col("score") * float(fields[f_name]), round_dp).alias(
                    "score"
                ),
            )
        )
    if not subs:
        for c in caches:
            c.unpersist()
        raise ValueError("every field tokenized to nothing")
    u = subs[0]
    for s in subs[1:]:
        u = u.unionByName(s)
    agg = u.groupBy("doc_id").agg(
        F.max("score").alias("mx"), F.sum("score").alias("sm")
    )
    out = agg.select(
        "doc_id",
        F.round(
            F.col("mx") + F.lit(float(tie_breaker)) * (F.col("sm") - F.col("mx")),
            round_dp,
        ).alias("score"),
    ).localCheckpoint()  # materialize off the field caches, then drop them
    for c in caches:
        c.unpersist()
    return out
