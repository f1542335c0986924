"""Dictionary-backed fuzzy queries (Lucene FuzzyQuery analogue):
Levenshtein expansion with classic similarity boosts, capped top-terms
rewrite, weighted BM25 OR over the expansion on the segment path.

Reference parity note: the reference has no fuzzy queries (its spell
rewriter corrects to ONE best term); this is engine-hardening surface kept
honest by the `fuzzy_topk` driver entry's DuckDB `levenshtein` twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 150)
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("fidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


def _vocab_df(eng):
    return {
        r["term"]: int(r["df"])
        for r in eng._load_dict().select("term", "df").collect()
    }


def _brute_expand(vocab, q, max_edits, max_exp, prefix=0):
    cand = []
    for t, df in vocab.items():
        if prefix and t[:prefix] != q[:prefix]:
            continue
        d = _lev(t, q)
        if d > max_edits:
            continue
        boost = 1.0 - d / min(len(t), len(q))
        if boost > 0:
            cand.append((d, -df, t, boost))
    cand.sort()
    return sorted((t, b) for _, _, t, b in cand[:max_exp])


def test_expansion_matches_brute_force(eng):
    vocab = _vocab_df(eng)
    for q, me in [("sprk", 1), ("sprt", 2), ("stram", 2), ("xyzzy", 2)]:
        got = eng.expand_fuzzy(q, max_edits=me, max_expansions=1000)
        want = _brute_expand(vocab, q, me, 1000)
        assert got == want, (q, me)
    assert eng.expand_fuzzy("sprt", max_edits=2, max_expansions=1000)


def test_expansion_cap_is_dist_df_term(eng):
    vocab = _vocab_df(eng)
    full = _brute_expand(vocab, "sprt", 2, 1000)
    assert len(full) > 2, "need >2 matches to observe the cap"
    assert eng.expand_fuzzy("sprt", max_edits=2, max_expansions=2) == \
        _brute_expand(vocab, "sprt", 2, 2)


def test_exact_match_gets_boost_one(eng):
    exp = dict(eng.expand_fuzzy("spark", max_edits=1, max_expansions=1000))
    assert exp["spark"] == 1.0


def test_prefix_length_restricts(eng):
    vocab = _vocab_df(eng)
    got = eng.expand_fuzzy("sprt", max_edits=2, prefix_length=1,
                           max_expansions=1000)
    assert got == _brute_expand(vocab, "sprt", 2, 1000, prefix=1)
    assert all(t.startswith("s") for t, _ in got)


def test_search_equals_weighted_or(eng):
    expanded = eng.expand_fuzzy("sprt", max_edits=2, max_expansions=2)
    want = eng.search("sprt", k=12, use_wand=False,
                      rewriter=lambda _q: expanded)
    assert want, "expansion must hit documents"
    for use_wand in (False, True):
        got = eng.search_fuzzy("sprt", k=12, max_edits=2, max_expansions=2,
                               use_wand=use_wand)
        assert got == want


def test_no_match_returns_empty(eng):
    assert eng.search_fuzzy("qqqqqqqqqq", k=5, max_edits=1) == []


def test_fuzzy_respects_doc_filter(eng):
    base = eng.search_fuzzy("sprt", k=500, max_edits=2, max_expansions=2)
    allow = {d for d, _ in base[::3]}
    want = [(d, s) for d, s in base if d in allow][:8]
    assert eng.search_fuzzy("sprt", k=8, max_edits=2, max_expansions=2,
                            doc_filter=allow) == want
