"""MoreLikeThis: tf·idf term selection from a source text → weighted BM25
OR over the selection, source doc excluded.

Reference parity note: the reference has no MLT; this is engine-hardening
surface kept honest by the `mlt_topk` driver entry's DuckDB twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 150)


@pytest.fixture(scope="module")
def eng(spark, corpus, tmp_path_factory):
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("midx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


def _source(corpus, doc_id):
    return corpus.filter(F.col("doc_id") == doc_id).select("text").collect()[0][0]


def test_selection_is_tfidf_top_terms(eng, corpus):
    from collections import Counter

    text = _source(corpus, 7)
    tf = Counter(tokenize_py(text))
    idf = {
        r["term"]: float(r["idf"])
        for r in eng._load_dict().collect()
    }
    ranked = sorted(tf, key=lambda t: (-round(tf[t] * idf.get(t, 0.0), 6), t))
    want_terms = sorted(ranked[:3])
    want = eng.search(" ".join(want_terms), k=10, use_wand=False,
                      rewriter=lambda _q: [(t, 1.0) for t in want_terms])
    got = eng.more_like_this(text, k=10, max_terms=3, use_wand=False)
    assert got == want


def test_source_doc_excluded(eng, corpus):
    text = _source(corpus, 7)
    with_self = eng.more_like_this(text, k=150, max_terms=5)
    assert any(d == 7 for d, _ in with_self), "source should match itself"
    without = eng.more_like_this(text, k=150, max_terms=5, exclude_doc_id=7)
    assert all(d != 7 for d, _ in without)
    assert without == [(d, s) for d, s in with_self if d != 7][: len(without)]


def test_wand_matches_exhaustive(eng, corpus):
    text = _source(corpus, 7)
    assert eng.more_like_this(text, k=12, max_terms=4, use_wand=True) == \
        eng.more_like_this(text, k=12, max_terms=4, use_wand=False)


def test_empty_and_oov_text(eng):
    assert eng.more_like_this("", k=5) == []
    assert eng.more_like_this("the and of", k=5) == []  # stopwords only
    assert eng.more_like_this("qqqq zzzz", k=5) == []  # OOV only


def test_mlt_by_id_equals_mlt_on_fetched_text(spark, tmp_path):
    """ES like-by-_id: fetch the stored text, run MLT, exclude the source.
    Must equal more_like_this on the same text verbatim."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from searchengine_spark.query.engine import SearchEngine

    corpus = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    eng = SearchEngine(spark, str(tmp_path / "mltid"))
    eng.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                            n_buckets=4, range_bits=2, store_source=True)
    src = corpus.filter(F.col("doc_id") == 7).collect()[0]["text"]
    want = eng.more_like_this(src, k=10, exclude_doc_id=7)
    got = eng.more_like_this_by_id(7, k=10)
    assert got == want
    assert all(d != 7 for d, _ in got)
    assert eng.more_like_this_by_id(10**9, k=5) == []  # unknown id

    flat = SearchEngine(spark, str(tmp_path / "mltflat"))
    flat.build_index_from_df(corpus.limit(50), id_col="doc_id",
                             text_col="text", n_buckets=2, range_bits=1)
    with _pt.raises(ValueError):
        flat.more_like_this_by_id(7)
