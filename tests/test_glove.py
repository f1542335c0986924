"""R7 GloVe variant: model.txt loader, doc/query embeddings, blend + euclid
re-rank pinned to a pure-Python oracle of the reference math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark import glove
from searchengine_spark.postings import dictionary, doc_stats, term_frequencies

MODEL_LINES = [
    "spark 0.5 -0.25 0.125",
    "join -0.125 0.75 0.5",
    "stream 0.25 0.25 -0.5",
    "table 0.875 -0.5 0.0625",
    "scan -0.75 0.125 0.25",
]

CORPUS = [
    (1, "spark join stream spark"),
    (2, "join table scan scan"),
    (3, "stream stream table join"),
    (4, "scan table spark"),
    (5, "unrelated words only here"),
]


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = tmp_path_factory.mktemp("model") / "model.txt"
    p.write_text("\n".join(MODEL_LINES) + "\n")
    return glove.load_model_txt(str(p))


@pytest.fixture(scope="module")
def ctx(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    tf = term_frequencies(df, "doc_id", "text", use_arrow_udf=False)
    stats = doc_stats(tf)
    dct = dictionary(tf)
    row = stats.agg(F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a")).collect()[0]
    return tf, stats, dct, int(row["n"]), float(row["a"])


def test_model_loader_float32_roundtrip(model):
    assert set(model) == {"spark", "join", "stream", "table", "scan"}
    assert all(len(v) == 3 for v in model.values())
    assert model["spark"][0] == 0.5 and model["join"][1] == 0.75


def test_query_vector_semantics(model):
    # OOV words count in the denominator, skipped in the sum
    qv = glove.query_vector("spark oovword join", model)
    assert qv == pytest.approx(
        [(0.5 - 0.125) / 3, (-0.25 + 0.75) / 3, (0.125 + 0.5) / 3]
    )
    assert glove.query_vector("totally unknown", model) is None


def test_rerank_matches_python_oracle(spark, ctx, model):
    tf, stats, dct, n, avgdl = ctx
    docs = {}
    for d, text in CORPUS:
        counts: dict[str, int] = {}
        for t in text.split():
            counts[t] = counts.get(t, 0) + 1
        docs[d] = counts
    for query in ["spark join", "table scan stream", "spark oovword"]:
        got = [
            (r["doc_id"], r["score"])
            for r in glove.glove_rerank(
                spark, tf, stats, dct, query, n, avgdl, model
            ).collect()
        ]
        want = glove.reference_oracle_rerank(docs, query, model)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, abs=1e-9), query


def test_rerank_skipped_when_query_oov(spark, ctx, model):
    tf, stats, dct, n, avgdl = ctx
    # 'unrelated' etc. are not in the model: ordering must equal the plain
    # 0.1·BM25_glove + 0.9·inner ordering (no euclid stage)
    got = glove.glove_rerank(spark, tf, stats, dct, "unrelated words", n, avgdl, model)
    rows = got.collect()
    assert [r["doc_id"] for r in rows] == [5]
    assert rows[0]["score"] > 0


def test_doc_vectors_normalized_by_doc_len(spark, ctx, model):
    tf, stats, dct, n, avgdl = ctx
    dv = {r["doc_id"]: r["dvec"] for r in glove.doc_vectors(spark, tf, stats, model).collect()}
    # doc 4 = "scan table spark", len 3: (Σ three vectors)/3 per dim
    want = [
        (-0.75 + 0.875 + 0.5) / 3,
        (0.125 - 0.5 - 0.25) / 3,
        (0.25 + 0.0625 + 0.125) / 3,
    ]
    assert dv[4] == pytest.approx(want, abs=1e-12)
    assert 5 not in dv  # no in-vocab term → no vector row (engine coalesces)
