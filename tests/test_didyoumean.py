"""Did-you-mean phrase suggester: DuckDB-twin identity, context-aware
ranking (bigram LM beats per-term frequency), exact-phrase passthrough,
and input validation."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from searchengine_spark import didyoumean

ROWS = [
    (1, "spark stream processing fast stream spark"),
    (2, "spark stream join shuffle spark stream"),
    (3, "steam engine boiler steam pressure steam"),
    (4, "spark stream window state spark"),
    (5, "steam turbine steam engine power steam"),
    (6, "steam engine steam boiler steam valve"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    return con


def _spark_suggest(docs, q, **kw):
    return [
        (r["phrase"], r["score"])
        for r in didyoumean.suggest_phrase(docs, q, **kw).collect()
    ]


def test_twin_identity(docs, duck):
    for q in ["spak stream", "sparc strem join", "steam presure", "stean engime"]:
        s = _spark_suggest(docs, q)
        o = [
            (p, float(sc))
            for p, sc in duck.execute(
                didyoumean.suggest_phrase_sql("documents", q)
            ).fetchall()
        ]
        assert s == o, f"twin mismatch for {q!r}"


def test_context_beats_term_frequency(docs):
    """'steam' is MORE frequent than 'spark' in this corpus (12 vs 6),
    but 'spak stream' must correct to 'spark stream' because the bigram
    (steam, stream) never occurs — the whole point of phrase-level
    correction over per-term spell."""
    out = _spark_suggest(docs, "spak stream")
    assert out[0][0] == "spark stream"


def test_exact_phrase_ranks_first(docs):
    out = _spark_suggest(docs, "steam engine")
    assert out[0][0] == "steam engine"  # lev 0 + best LM → unbeatable


def test_empty_query_raises(docs):
    with pytest.raises(ValueError):
        didyoumean.suggest_phrase(docs, "the of and")


def test_model_reuse_matches_inline_training(docs):
    from searchengine_spark.ops.termstats import bigram_lm_counts

    model = bigram_lm_counts(docs)
    a = _spark_suggest(docs, "spak stream")
    b = _spark_suggest(docs, "spak stream", model=model)
    assert a == b


def test_oov_position_keeps_original_term(spark, duck_con=None):
    """A position with NO vocabulary term within max_edits keeps the
    original term (ES rule) — it used to empty the whole beam."""
    import duckdb

    from searchengine_spark.didyoumean import suggest_phrase, suggest_phrase_sql

    docs = spark.createDataFrame(
        [(1, "spark streams quickly"), (2, "spark streams daily")],
        "doc_id long, text string",
    )
    got = suggest_phrase(docs, "sparl qqqqqqqqqqq streems", top_n=3).collect()
    assert got, "beam must survive the OOV position"
    assert all("qqqqqqqqqqq" in r["phrase"] for r in got)
    # twin parity on the same corpus
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW docs AS SELECT * FROM (VALUES "
        "(1, 'spark streams quickly'), (2, 'spark streams daily')"
        ") t(doc_id, text)"
    )
    sql = suggest_phrase_sql("docs", "sparl qqqqqqqqqqq streems", top_n=3)
    oracle = con.execute(sql).fetchall()
    assert [(r["phrase"], r["score"]) for r in got] == [
        (p, s) for p, s in oracle
    ]
