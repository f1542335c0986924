"""Dictionary-backed regexp queries (Lucene RegexpQuery analogue):
anchored full-term regex expansion against the term dictionary, capped
top-terms rewrite, BM25 OR over the expansion on the segment path.

Reference parity note: the reference has no regexp queries; this is
engine-hardening surface kept honest by the `regexp_topk` driver entry's
DuckDB twin (regexp_matches)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 150)
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("rxidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


def _vocab_df(eng):
    return {
        r["term"]: int(r["df"])
        for r in eng._load_dict().select("term", "df").collect()
    }


def test_expansion_is_anchored_full_term_match(eng):
    vocab = _vocab_df(eng)
    got = eng.expand_regexp("so.t", max_expansions=1000)
    want = sorted(t for t in vocab if re.fullmatch("so.t", t))
    assert got == want and got  # sort
    # NOT substring semantics: "or" alone must not match "sort"
    assert "sort" not in eng.expand_regexp("or", max_expansions=1000)


def test_alternation_groups_correctly(eng):
    vocab = _vocab_df(eng)
    got = eng.expand_regexp("sort|merge", max_expansions=1000)
    assert got == sorted(t for t in vocab if t in ("sort", "merge"))
    assert len(got) == 2


def test_alternation_after_literal_head_kills_pushdown(eng):
    # regression: "s(ort|tream)|merge" has a literal head "s" but a
    # TOP-LEVEL '|' later — pushing "s" down would drop "merge"
    vocab = _vocab_df(eng)
    got = eng.expand_regexp("s(ort|tream)|merge", max_expansions=1000)
    want = sorted(
        t for t in vocab if re.fullmatch("s(ort|tream)|merge", t)
    )
    assert got == want
    assert "merge" in got


def test_prefix_pushdown_respects_quantifier(eng):
    vocab = _vocab_df(eng)
    # 'k' is optional: the pushdown prefix must be 'spar', not 'spark'
    got = eng.expand_regexp("spark?", max_expansions=1000)
    assert got == sorted(t for t in vocab if re.fullmatch("spark?", t))
    assert "spark" in got


def test_expansion_cap_is_df_desc_term_asc(eng):
    vocab = _vocab_df(eng)
    matches = [t for t in vocab if re.fullmatch("s.*", t)]
    assert len(matches) > 3
    by_rank = sorted(matches, key=lambda t: (-vocab[t], t))
    assert eng.expand_regexp("s.*", max_expansions=3) == sorted(by_rank[:3])


def test_search_equals_or_over_expansion(eng):
    from searchengine_spark.tokenizer import tokenize_py

    terms = eng.expand_regexp("s.*", max_expansions=4)
    q = " ".join(terms)
    assert tokenize_py(q) == terms
    want = eng.search(q, k=12, use_wand=False)
    for use_wand in (False, True):
        got = eng.search_regexp("s.*", k=12, max_expansions=4,
                                use_wand=use_wand)
        assert got == want


def test_no_match_returns_empty(eng):
    assert eng.expand_regexp("zzz+") == []
    assert eng.search_regexp("zzz+", k=5) == []
