"""Dictionary-backed wildcard / prefix queries (Lucene WildcardQuery
analogue): glob expansion against the term dictionary, capped top-terms
rewrite, BM25 OR over the expansion on the segment path.

Reference parity note: the reference has no wildcard queries; this is
engine-hardening surface (API users expect `ind*` to work), kept honest by
the `wildcard_topk` driver entry's DuckDB twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 150)
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("widx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


def _vocab_df(eng):
    return {
        r["term"]: int(r["df"])
        for r in eng._load_dict().select("term", "df").collect()
    }


def test_star_expansion_matches_vocab_scan(eng):
    vocab = _vocab_df(eng)
    want = sorted(t for t in vocab if t.startswith("s"))
    assert want, "fixture corpus must contain s-terms"
    assert eng.expand_pattern("s*", max_expansions=1000) == want


def test_question_mark_is_single_char(eng):
    vocab = _vocab_df(eng)
    got = eng.expand_pattern("s?a*", max_expansions=1000)
    import re

    rx = re.compile(r"^s.a.*$")
    assert got == sorted(t for t in vocab if rx.match(t))
    assert got  # pattern chosen to match (scan/spark/...)


def test_expansion_cap_is_df_desc_term_asc(eng):
    vocab = _vocab_df(eng)
    matches = [t for t in vocab if t.startswith("s")]
    assert len(matches) > 3, "need >3 matches to observe the cap"
    by_rank = sorted(matches, key=lambda t: (-vocab[t], t))
    assert eng.expand_pattern("s*", max_expansions=3) == sorted(by_rank[:3])


def test_literal_chars_are_escaped(eng):
    # a regex metachar in the pattern must match literally (no vocab term
    # contains '.', so this expands to nothing instead of everything)
    assert eng.expand_pattern(".*") == []
    assert eng.search_wildcard(".*", k=5) == []


def test_search_equals_or_over_expansion(eng):
    terms = eng.expand_pattern("s*", max_expansions=4)
    q = " ".join(terms)
    # expanded terms are tokenizer fixed points — the OR query round-trips
    assert tokenize_py(q) == terms
    want = eng.search(q, k=12, use_wand=False)
    for use_wand in (False, True):
        got = eng.search_wildcard("s*", k=12, max_expansions=4,
                                  use_wand=use_wand)
        assert got == want


def test_suggest_is_df_ranked_prefix_completion(eng):
    vocab = _vocab_df(eng)
    matches = sorted(
        (t for t in vocab if t.startswith("s")),
        key=lambda t: (-vocab[t], t),
    )
    assert len(matches) > 3
    got = eng.suggest("s", n=3)
    assert got == [(t, vocab[t]) for t in matches[:3]]
    assert eng.suggest("zzz") == []


def test_wildcard_respects_doc_filter(eng):
    base = eng.search_wildcard("s*", k=500, max_expansions=4)
    allow = {d for d, _ in base[::3]}
    want = [(d, s) for d, s in base if d in allow][:8]
    assert eng.search_wildcard("s*", k=8, max_expansions=4,
                               doc_filter=allow) == want
