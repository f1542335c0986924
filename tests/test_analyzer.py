"""Code analyzer (identifier splitting): the three dialect twins must
split identically, an analyzer='code' index must rank exactly like a
standard index over pre-split text, the QUERY side must analyze with the
index's pinned analyzer (meta round-trip), phrase adjacency must work
across split parts, and appends must inherit / refuse to mix analyzers.

Reference parity note: the reference tokenizes tweets; identifier
analysis is the source-code-corpus piece the north star's input schema
(repo, path, commit, lang, content) actually needs. Driver entries
`code_tokens` / `code_search_topk` hash-check both layers vs DuckDB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.tokenizer import (
    analyze_py,
    code_split_expr,
    code_split_py,
    duckdb_code_split,
)

DOCS = [
    (1, "def parseQueryString(raw): return QueryStringParser.parse(raw)"),
    (2, "class HTTPServerConnection: def open_socket(self): pass"),
    (3, "query_string = buildQueryString(params)"),
    (4, "XMLHttpRequest sends asyncRequest to httpServer"),
    (5, "plain lowercase words only here"),
]

CASES = [
    "getFooBar HTTPServer parse_query_string __init__ XMLHttpRequest v2Max",
    "CamelCaseABCDef snake_case_2 mixedUP_Case x",
    "def parseQueryString(self, rawURL): return URLParser2000.parse(rawURL)",
    "",
    "ALLCAPS loweronly 1234 _ a_b",
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_three_way_identical(spark):
    import duckdb

    df = _df(spark, [(i, t) for i, t in enumerate(CASES)])
    got_spark = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", code_split_expr(F.col("text")).alias("s")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i BIGINT, t VARCHAR)")
    for i, t in enumerate(CASES):
        con.execute("INSERT INTO c VALUES (?, ?)", [i, t])
    got_duck = dict(con.execute(f"SELECT i, {duckdb_code_split('t')} FROM c").fetchall())
    for i, t in enumerate(CASES):
        assert code_split_py(t) == got_spark[i] == got_duck[i]


def test_analyze_py_splits_identifiers():
    toks = analyze_py("getFooBar parse_query HTTPServer v2Max", "code")
    assert toks == ["get", "foo", "bar", "parse", "query",
                    "http", "server", "v2", "max"]
    # standard leaves identifiers whole (lowercased)
    assert analyze_py("getFooBar parse_query", "standard") == [
        "getfoobar", "parse_query"
    ]
    with pytest.raises(ValueError, match="analyzer"):
        analyze_py("x y", "nope")


@pytest.fixture(scope="module")
def code_eng(spark, tmp_path_factory):
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("code") / "idx"))
    e.build_index_from_df(_df(spark), id_col="doc_id", text_col="text",
                          n_buckets=2, range_bits=1, analyzer="code",
                          with_positions=True)
    return e


def test_rank_identity_to_presplit_standard_index(spark, code_eng, tmp_path):
    pre = _df(spark).withColumn("text", code_split_expr(F.col("text")))
    std = SearchEngine(spark, str(tmp_path / "std"))
    std.build_index_from_df(pre, id_col="doc_id", text_col="text",
                            n_buckets=2, range_bits=1, with_positions=True)
    for q in ["parse query string", "http server", "request"]:
        got = code_eng.search(q, k=10)
        want = std.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-12)


def test_query_side_analysis_round_trips(code_eng):
    # a camelCase QUERY must split under the index's pinned analyzer:
    # meta.analyzer drives _analyze, so this matches doc 1 and 3
    hits = {d for d, _ in code_eng.search("buildQueryString", k=10)}
    assert 3 in hits and 1 in hits  # query/string parts hit doc 1 too
    # identical to querying the split words directly
    assert code_eng.search("buildQueryString", k=10) == code_eng.search(
        "build query string", k=10
    )


def test_phrase_across_split_parts(code_eng):
    # adjacency is defined over the split stream: "query string" is a
    # phrase inside parseQueryString / buildQueryString / QueryStringParser
    hits = {d for d, _ in code_eng.search_phrase("query string", k=10)}
    assert {1, 3} <= hits and 5 not in hits
    assert code_eng.search_phrase("open socket", k=10)


def test_append_inherits_and_refuses_mixing(spark, tmp_path):
    from searchengine_spark.streaming.ingest import append_docs

    idx = str(tmp_path / "appidx")
    append_docs(_df(spark, DOCS[:3]), idx, text_col="text",
                n_buckets=2, range_bits=1, analyzer="code")
    eng = SearchEngine(spark, idx)
    # second append: analyzer pinned from meta even though caller default
    # is 'standard'
    append_docs(_df(spark, DOCS[3:]), idx, text_col="text",
                n_buckets=2, range_bits=1)
    eng.refresh()
    assert eng.meta.analyzer == "code"
    assert {d for d, _ in eng.search("asyncRequest", k=10)} == {4}
    # a direct epoch commit with a different analyzer refuses loudly
    from searchengine_spark.streaming.ingest import _commit_epoch

    with pytest.raises(ValueError, match="analyzer"):
        _commit_epoch(
            _df(spark, [(99, "more")]), idx, 99, "t",
            id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
            with_positions=False, analyzer="standard",
        )


def test_query_string_language_uses_analyzer(code_eng):
    hits = code_eng.search_query_string("+parseQueryString -socket", k=10)
    ids = {d for d, _ in hits}
    assert 1 in ids and 2 not in ids


def test_stats_and_validation(spark, code_eng, tmp_path):
    assert code_eng.meta.analyzer == "code"
    with pytest.raises(ValueError, match="analyzer"):
        SearchEngine(spark, str(tmp_path / "bad")).build_index_from_df(
            _df(spark), id_col="doc_id", text_col="text", analyzer="nope"
        )


# ----------------------------------------------------------- analyzer chains
def test_chain_three_way_identical(spark):
    """code+stem: Catalyst TEXT→TEXT chain == pure Python == DuckDB twin,
    token stream compared (duplicates preserved)."""
    import duckdb

    from searchengine_spark.tokenizer import (
        analyze_text_expr,
        duckdb_analyze_text,
        tokenize_py,
        tokenize_raw_expr,
    )

    texts = CASES + [
        "processingQueries parsedTokens runningBuilds fastened",
        "the stemming_of_inflections was tokenizedEarly",
    ]
    df = _df(spark, [(i, t) for i, t in enumerate(texts)])
    got_spark = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id",
            tokenize_raw_expr(
                analyze_text_expr(F.col("text"), "code+stem")
            ).alias("toks"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i BIGINT, t VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO c VALUES (?, ?)", [i, t])
    pre = duckdb_analyze_text("t", "code+stem")
    got_duck = dict(
        con.execute(f"SELECT i, {pre} FROM c").fetchall()
    )
    for i, t in enumerate(texts):
        want = analyze_py(t, "code+stem")
        assert got_spark[i] == want, (i, t)
        assert tokenize_py(got_duck[i]) == want, (i, t)


def test_chain_index_round_trip(spark, tmp_path):
    """A code+stem index matches inflected camelCase queries against
    differently-inflected camelCase docs, and ranks exactly like a standard
    index built over pre-chained text."""
    from searchengine_spark.tokenizer import analyze_text_expr

    docs = [
        (1, "def parseQueries(raw): return runningParsers.tokenize(raw)"),
        (2, "class BuildCache: merged_segments = compactedBlocks"),
        (3, "query parsing and token merging for builds"),
    ]
    eng = SearchEngine(spark, str(tmp_path / "chain"))
    eng.build_index_from_df(_df(spark, docs), id_col="doc_id", text_col="text",
                            n_buckets=2, range_bits=1, analyzer="code+stem")
    assert eng.meta.analyzer == "code+stem"
    # parsingQueries -> (pars, queri): conflates with parseQueries (doc 1,
    # queri) and with "parsing" (doc 3, pars)
    hits = {d for d, _ in eng.search("parsingQueries", k=10)}
    assert hits == {1, 3}
    pre = _df(spark, docs).withColumn(
        "text", analyze_text_expr(F.col("text"), "code+stem")
    )
    std = SearchEngine(spark, str(tmp_path / "stdpre"))
    std.build_index_from_df(pre, id_col="doc_id", text_col="text",
                            n_buckets=2, range_bits=1)
    for q in ["parsedQuery", "mergingBuilds", "compactedBlock"]:
        got, want = eng.search(q, k=10), std.search(
            " ".join(analyze_py(q, "code+stem")), k=10)
        assert [d for d, _ in got] == [d for d, _ in want]


def test_chain_validation():
    from searchengine_spark.tokenizer import parse_analyzer

    assert parse_analyzer("code+stem") == ("code", "stem")
    assert parse_analyzer("standard") == ("standard",)
    assert parse_analyzer("") == ("standard",)
    with pytest.raises(ValueError, match="stage"):
        parse_analyzer("code+porter")
