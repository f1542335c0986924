"""CommonTermsQuery (SearchEngine.search_common_terms): low-df terms drive
matching, all terms drive scoring — brute-force semantics on a literal
corpus, fallbacks, absolute/fractional cutoffs, and score identity with
plain search on the matched set."""

from __future__ import annotations

import pytest

from searchengine_spark.query.engine import SearchEngine

# 'noise' in 5/6 docs (common at any cutoff < 0.83); 'rare' in 2; 'gem' in 1
ROWS = [
    (1, "noise rare gem body words here"),
    (2, "noise rare other body words here"),
    (3, "noise plain body words again here"),
    (4, "noise more body words again here"),
    (5, "noise yet more body words here"),
    (6, "quiet outlier body words again here"),
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("ctidx") / "idx"))
    e.build_index_from_df(df, id_col="doc_id", text_col="text",
                          n_buckets=2, range_bits=1)
    return e


def _ids(hits):
    return sorted(d for d, _ in hits)


def test_low_terms_drive_matching(eng):
    # cutoff 0.5 → 'noise' (df 5/6) common, 'rare' (df 2/6) low:
    # match set = docs containing 'rare' only
    hits = eng.search_common_terms("noise rare", 0.5, k=10)
    assert _ids(hits) == [1, 2]
    # but scoring includes the common term: identical to plain search
    # restricted to the matched set
    plain = {d: s for d, s in eng.search("noise rare", k=10)}
    for d, s in hits:
        assert s == pytest.approx(plain[d], abs=1e-9)
    # plain OR would match all 'noise' docs too
    assert len(plain) > len(hits)


def test_absolute_cutoff(eng):
    # absolute df threshold 2: 'rare' (df 2) is NOT < 2 → common;
    # 'gem' (df 1) is low → matching on gem only
    hits = eng.search_common_terms("rare gem", 2, k=10)
    assert _ids(hits) == [1]


def test_all_common_falls_back_to_or(eng):
    got = eng.search_common_terms("noise rare", 0.01, k=10)
    assert got == eng.search("noise rare", k=10)


def test_all_low_falls_back_to_or(eng):
    got = eng.search_common_terms("noise rare", 0.99, k=10)
    assert got == eng.search("noise rare", k=10)


def test_oov_and_empty(eng):
    assert eng.search_common_terms("zzznope", 0.5, k=10) == []
    # OOV term alongside real ones is ignored by resolution, split intact
    hits = eng.search_common_terms("noise rare zzznope", 0.5, k=10)
    assert _ids(hits) == [1, 2]


def test_composes_with_doc_filter(eng, spark):
    allow = spark.createDataFrame([(2,), (3,)], "doc_id long")
    hits = eng.search_common_terms("noise rare", 0.5, k=10, doc_filter=allow)
    assert _ids(hits) == [2]


def test_sharded_common_terms_matches_single_index(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from searchengine_spark.query.sharded import ShardedEngine

    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 200)
    se = ShardedEngine.build(
        spark, corpus, str(tmp_path_factory.mktemp("ctsh")), 3,
        n_buckets=2, range_bits=1,
    )
    ref = SearchEngine(spark, str(tmp_path_factory.mktemp("ctsh_ref") / "idx"))
    ref.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                            n_buckets=2, range_bits=1)
    for q, cutoff in [("dup join stream", 0.5), ("dup join stream", 0.99),
                      ("spark join", 0.5)]:
        got = se.search_common_terms(q, cutoff, k=15)
        want = ref.search_common_terms(q, cutoff, k=15)
        assert [d for d, _ in got] == [d for d, _ in want], (q, cutoff)
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, abs=1e-9), (q, cutoff)
    # the split is non-trivial on this corpus: common-terms matches ONLY
    # the low-term ('dup') docs, far fewer than the OR match set
    ct = se.search_common_terms("dup join stream", 0.5, k=300)
    plain = se.search("dup join stream", k=300)
    assert 0 < len(ct) < len(plain)
