"""R7 — the reference's "best" engine variant: GloVe-blended ranking with
euclidean re-rank (SURVEY.md §2.11, the last of the six engine variants).

Reference semantics re-expressed Spark-first:
  * model source (S6): ``model.txt`` lines ``word v1 .. vd`` → word→float32
    vector dict (``Part C/search_engine_best.py:67-89``; 147,926-term vocab).
    ``load_model_txt`` is the real loader; ``expansion.hash_term_vectors``
    stays the deterministic in-sandbox stand-in (no GloVe file shipped).
  * doc vector: Σ embedding over the doc's distinct in-vocab terms,
    normalized by doc length (``Part C/search_engine_best.py:125-141``).
  * query vector: Σ embedding over query words / |query words|
    (``Part C/searcher_glove.py:52-66``).
  * base score: 0.1·BM25 + 0.9·inner-product, where THIS variant's BM25 uses
    RAW tf (not the R1 normalized tf), k=1.5, b=0.8, idf=log2(N/df)
    (``Part C/ranker_glove.py:28-36,120-143``).
  * re-rank (``Part C/ranker_glove.py:56-97``): doc_rank = 1/euclid(doc_vec,
    query_vec); final = 0.95·(rank/max_rank) + 0.05·(base/max_base), sorted
    desc. When the query has no in-vocab word the re-rank is skipped and the
    base ordering stands. (Deviation: the reference's ``max_tfidf_score`` is
    a class attribute that leaks ACROSS queries; here both maxima are
    per-query — documented, deliberate.)

Distribution shape: the embedding table broadcasts (≤ a few hundred MB at
GloVe scale); doc vectors are one groupBy over the (doc, term) pairs of the
candidate set; the two normalization maxima are a 2-scalar agg. No
cross-join, no per-row Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .scoring import _ordered_sum, inner_product_score, parse_query
from .tokenizer import tokenize_py


def load_model_txt(path: str) -> dict[str, list[float]]:
    """S6 real model source: parse ``word v1 .. vd`` lines. Values go through
    float32 like the reference's ``np.asarray(values, "float32")`` so scores
    match a reference run bit-for-bit on the same file."""
    import numpy as np

    out: dict[str, list[float]] = {}
    dim: int | None = None
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            parts = line.rstrip("\n").strip().split(" ")
            if len(parts) < 2:
                continue
            if dim is None:
                dim = len(parts) - 1
            elif len(parts) - 1 != dim:
                # a word2vec-style "count dim" header (1-dim first line) or
                # a ragged line would silently poison every downstream
                # zip_with with NULL-padded distances
                raise ValueError(
                    f"{path}:{ln}: vector has {len(parts) - 1} dims, "
                    f"expected {dim} — not a GloVe-format model file?"
                )
            vec = np.asarray(parts[1:], dtype="float32")
            out[parts[0]] = [float(v) for v in vec]
    return out


def query_vector(query: str, vectors: dict[str, list[float]]) -> list[float] | None:
    """Driver-side query embedding: in-query-order Σ of in-vocab word vectors
    divided by the TOTAL query word count (OOV words still count in the
    denominator — reference behavior). None when no word is in-vocab."""
    words = tokenize_py(query)
    acc: list[float] | None = None
    for w in words:
        v = vectors.get(w)
        if v is None:
            continue
        acc = list(v) if acc is None else [a + b for a, b in zip(acc, v)]
    if acc is None or not words:
        return None
    return [a / len(words) for a in acc]


def doc_vectors(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    vectors: dict[str, list[float]],
) -> DataFrame:
    """(doc_id, dvec): doc-length-normalized Σ of distinct in-vocab term
    embeddings. Broadcast embedding join → per-dim sum → array re-assembly;
    all JVM-side."""
    vdf = F.broadcast(
        spark.createDataFrame(
            sorted(vectors.items()), "term string, vec array<double>"
        )
    )
    ex = (
        tf_df.select("doc_id", "term")  # tf rows are already (doc, term)-unique
        .join(vdf, "term")
        .select("doc_id", "term", F.posexplode("vec").alias("dim", "val"))
    )
    # sorted-term fold, not a bare F.sum: an unordered shuffle sum is
    # last-ulp order-dependent, and 1/euclid + max-normalization amplify
    # that into rank flips across parallelism levels — the same bit-
    # stability rule as scoring._ordered_sum
    sums = ex.groupBy("doc_id", "dim").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "val"))),
            F.lit(0.0),
            lambda acc, x: acc + x["val"],
        ).alias("s")
    )
    arr = (
        sums.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("ds"))
        .select("doc_id", F.expr("transform(ds, x -> x.s)").alias("vsum"))
    )
    return arr.join(stats_df.select("doc_id", "doc_len"), "doc_id").select(
        "doc_id",
        F.transform(F.col("vsum"), lambda v: v / F.col("doc_len")).alias("dvec"),
    )


def bm25_glove_score(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
    k1: float = 1.5,
    b: float = 0.8,
) -> DataFrame:
    """The glove variant's BM25 (``Part C/ranker_glove.py:120-143``): raw tf,
    numerator tf·(tf·(k+1)) [shipped quirk], idf=log2(N/df), k=1.5, b=0.8."""
    from .scoring import _query_df

    qdf = _query_df(spark, query)
    qstats = F.broadcast(qdf.join(dict_df, "term"))
    cand = tf_df.join(qstats, "term").join(stats_df.select("doc_id", "doc_len"), "doc_id")
    idf = F.log2(F.lit(float(n_docs)) / F.col("df"))
    num = F.col("tf") * (F.col("tf") * (k1 + 1.0))
    den = F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / avgdl)
    return _ordered_sum(cand, idf * (num / den))


def glove_rerank(
    spark: SparkSession,
    tf_df: DataFrame,
    stats_df: DataFrame,
    dict_df: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
    vectors: dict[str, list[float]],
    k: int | None = None,
) -> DataFrame:
    """Full R7 pipeline → (doc_id, score) sorted (score desc, doc_id asc),
    optionally limited to k. A doc vector exactly equal to the query vector
    would make 1/euclid infinite — the reference divides by zero there too;
    not guarded, by design."""
    bm = bm25_glove_score(spark, tf_df, stats_df, dict_df, query, n_docs, avgdl)
    ip = inner_product_score(spark, tf_df, stats_df, dict_df, query, n_docs)
    total = (
        bm.withColumnRenamed("score", "bm")
        .join(ip.withColumnRenamed("score", "ip"), "doc_id", "outer")
        .fillna(0.0)
        .select("doc_id", (0.1 * F.col("bm") + 0.9 * F.col("ip")).alias("total"))
    )
    qvec = query_vector(query, vectors)
    if qvec is None:
        ranked = total.select("doc_id", F.col("total").alias("score"))
        ranked = ranked.orderBy(F.desc("score"), F.asc("doc_id"))
        return ranked.limit(k) if k is not None else ranked

    dim = len(qvec)
    # doc vectors over the CANDIDATE set only (the left join below keeps
    # only candidates anyway): without the semi-join every query paid a
    # full-corpus explode + two corpus-wide shuffles
    cand_tf = tf_df.join(total.select("doc_id"), "doc_id", "left_semi")
    dv = doc_vectors(spark, cand_tf, stats_df, vectors)
    zeros = F.array(*[F.lit(0.0)] * dim)
    joined = total.join(dv, "doc_id", "left").select(
        "doc_id", "total", F.coalesce(F.col("dvec"), zeros).alias("dvec")
    )
    qarr = F.array(*[F.lit(float(v)) for v in qvec])
    eu = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("dvec"), qarr, lambda a, b_: (a - b_) * (a - b_)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = joined.select("doc_id", "total", (F.lit(1.0) / eu).alias("rank"))
    m = scored.agg(
        F.max("rank").alias("mr"), F.max("total").alias("mt")
    ).collect()[0]
    if m["mr"] is None:  # zero candidate docs (query words in-model but not
        # in-corpus) — nothing to normalize against, return the empty base
        ranked = total.select("doc_id", F.col("total").alias("score")).orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return ranked.limit(k) if k is not None else ranked
    max_rank, max_total = float(m["mr"]), float(m["mt"])
    final = 0.95 * (F.col("rank") / max_rank) + 0.05 * (F.col("total") / max_total)
    ranked = scored.select("doc_id", final.alias("score")).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return ranked.limit(k) if k is not None else ranked


def reference_oracle_rerank(
    docs: dict[int, dict[str, int]],
    query: str,
    vectors: dict[str, list[float]],
    k1: float = 1.5,
    b: float = 0.8,
) -> list[tuple[int, float]]:
    """Pure-Python single-process oracle of the same math (used by tests to
    pin the Spark path to the reference semantics). ``docs`` = doc_id →
    {term: tf}."""
    n = len(docs)
    df: dict[str, int] = {}
    for terms in docs.values():
        for t in terms:
            df[t] = df.get(t, 0) + 1
    lens = {d: sum(ts.values()) for d, ts in docs.items()}
    avgdl = sum(lens.values()) / n
    qterms = dict(parse_query(query))
    out: dict[int, float] = {}
    for d, ts in docs.items():
        bm = ip = 0.0
        for t in sorted(qterms):
            if t not in ts:
                continue
            tf = ts[t]
            idf = math.log2(n / df[t])
            bm += idf * (tf * (tf * (k1 + 1.0))) / (
                tf + k1 * (1.0 - b + b * lens[d] / avgdl)
            )
            ip += (tf / lens[d]) * idf * qterms[t]
        if bm or ip:
            out[d] = 0.1 * bm + 0.9 * ip
    qv = query_vector(query, vectors)
    if qv is None:
        return sorted(out.items(), key=lambda x: (-x[1], x[0]))
    ranks = {}
    for d in out:
        acc = [0.0] * len(qv)
        for t in sorted(docs[d]):
            v = vectors.get(t)
            if v is not None:
                acc = [a + b_ for a, b_ in zip(acc, v)]
        dv = [a / lens[d] for a in acc]
        eu = math.sqrt(sum((a - b_) ** 2 for a, b_ in zip(dv, qv)))
        ranks[d] = 1.0 / eu
    mr = max(ranks.values())
    mt = max(out.values())
    final = {d: 0.95 * (ranks[d] / mr) + 0.05 * (out[d] / mt) for d in out}
    return sorted(final.items(), key=lambda x: (-x[1], x[0]))
