"""match_phrase_prefix (ES search-as-you-type): fixed-term adjacency with
a dictionary-expanded last slot. Checked against per-expansion phrase
search composition (score = max over completing expansions of the full
phrase's score, since the fixed-term leg is common)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = (
        spark.read.parquet(DOCS)
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("ppidx") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2, with_positions=True)
    return e


def _brute(eng, fixed: str, expansions: list[str], k: int):
    """max over expansions of phrase('fixed e') score per doc."""
    best: dict[int, float] = {}
    for e in expansions:
        for d, s in eng.search_phrase(f"{fixed} {e}", k=10_000):
            if d not in best or s > best[d]:
                best[d] = s
    out = sorted(best.items(), key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_phrase_prefix_matches_composition(eng):
    exps = eng.expand_pattern("s*", 50)
    assert len(exps) >= 3
    got = eng.search_phrase_prefix("table s", k=20, max_expansions=50)
    want = _brute(eng, "table", exps, 20)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-9


def test_phrase_prefix_cap_restricts_expansions(eng):
    """max_expansions=1 keeps only the (df desc, term asc) top completion;
    matches through other completions must vanish."""
    top1 = eng.expand_pattern("s*", 1)
    assert len(top1) == 1
    got = eng.search_phrase_prefix("table s", k=50, max_expansions=1)
    want = _brute(eng, "table", top1, 50)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_phrase_prefix_bare_prefix(eng):
    """No fixed terms: every doc containing any completion matches, scored
    by its best completion (single-term BM25)."""
    exps = eng.expand_pattern("sp*", 50)
    got = eng.search_phrase_prefix("sp", k=30, max_expansions=50)
    best: dict[int, float] = {}
    for e in exps:
        for d, s in eng.search(e, k=10_000, use_wand=False):
            if d not in best or s > best[d]:
                best[d] = s
    want = sorted(best.items(), key=lambda t: (-t[1], t[0]))[:30]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_phrase_prefix_short_prefix_survives_analysis(eng):
    """A 1-char prefix must not be dropped by the tokenizer (the fixed
    part is analyzed; the prefix is taken raw)."""
    got = eng.search_phrase_prefix("table s", k=5, max_expansions=10)
    assert got  # 'table s*' has completions in this corpus


def test_phrase_prefix_edges(eng, spark, tmp_path_factory):
    assert eng.search_phrase_prefix("zzznope qqq", k=5) == []
    assert eng.search_phrase_prefix("   ", k=5) == []
    # positions are required
    flat = SearchEngine(spark, str(tmp_path_factory.mktemp("ppflat") / "idx"))
    flat.build_index_from_df(
        spark.read.parquet(DOCS).filter(F.col("doc_id") < 50)
        .select("doc_id", "text"),
        id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
    )
    with pytest.raises(ValueError):
        flat.search_phrase_prefix("table s", k=5)
