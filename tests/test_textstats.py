"""Repetition quality signals (Gopher/Dolma filter family): fractions
must match a brute-force Python twin on crafted docs covering repeats,
single-token, empty, and multi-line cases; driver entry
`repetition_stats` hash-checks vs the DuckDB twin over the corpus."""

from __future__ import annotations

import pytest

from searchengine_spark.ops.textstats import repetition_stats

DOCS = [
    (1, "spam spam spam spam"),                      # all dup tokens + 2grams
    (2, "all words here are different ones"),        # no repetition
    (3, "a b a b a b"),                              # alternating: 2 distinct 2grams
    (4, "one"),                                      # single token: no 2grams
    (5, ""),                                         # empty
    (6, "line one\nline one\nline two"),             # dup lines
]


def _brute(text):
    toks = text.strip().lower().split() if text.strip() else []
    lines = [ln for ln in text.strip().split("\n")] if text.strip() else []
    # \n+ split of the spark/duck twins collapses blank lines; these
    # fixtures have none
    grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    f = lambda n, d: round(n / d, 5) if d else 0.0
    from collections import Counter

    gc = Counter(grams)
    return {
        "n_tokens": len(toks),
        "dup_token_frac": f(len(toks) - len(set(toks)), len(toks)),
        "top_2gram_frac": f(max(gc.values()) if gc else 0, len(grams)),
        "dup_2gram_frac": f(len(grams) - len(gc), len(grams)),
        "n_lines": len(lines),
        "dup_line_frac": f(len(lines) - len(set(lines)), len(lines)),
    }


def test_repetition_matches_brute(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        want = _brute(text)
        for k, v in want.items():
            assert got[doc_id][k] == pytest.approx(v, abs=1e-9), (doc_id, k)
    # sanity on the signal semantics
    assert got[1]["dup_token_frac"] == 0.75 and got[1]["top_2gram_frac"] == 1.0
    assert got[2]["dup_token_frac"] == 0.0
    assert got[3]["dup_2gram_frac"] == round(3 / 5, 5)
    assert got[4]["top_2gram_frac"] == 0.0 and got[5]["n_tokens"] == 0
    assert got[6]["dup_line_frac"] == round(1 / 3, 5)


def test_repetition_matches_duckdb(spark):
    import duckdb

    from searchengine_spark.ops.textstats import repetition_stats_sql

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(tuple(r) for r in repetition_stats(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for d, t in DOCS:
        con.execute("INSERT INTO documents VALUES (?, ?)", [d, t])
    want = sorted(con.execute(repetition_stats_sql("documents")).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# C4 heuristic cleanup (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------


def test_c4_clean_matches_python_twin(spark):
    from searchengine_spark.entry_queries import C4_FIXTURE
    from searchengine_spark.ops.textstats import c4_clean, c4_clean_py

    df = spark.createDataFrame(C4_FIXTURE, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert set(got) == {d for d, _ in C4_FIXTURE}
    for doc_id, text in C4_FIXTURE:
        clean, n_lines, n_kept, boiler, keep = c4_clean_py(text)
        r = got[doc_id]
        assert r["clean_text"] == clean, doc_id
        assert r["n_lines"] == n_lines, doc_id
        assert r["n_kept"] == n_kept, doc_id
        assert r["has_boiler"] == boiler, doc_id
        assert r["keep"] == keep, doc_id
    # each rule is observable: keeper, short lines, no punct, <3 kept,
    # lorem ipsum, braces, quote-terminal, empty, whitespace-trim
    verdicts = {d: got[d]["keep"] for d, _ in C4_FIXTURE}
    assert verdicts == {
        1: True, 2: False, 3: False, 4: False, 5: False,
        6: False, 7: True, 8: False, 9: True,
    }
    assert got[5]["has_boiler"] and got[6]["has_boiler"]
    assert got[9]["n_kept"] == 3  # trim before checks


def test_c4_clean_matches_duckdb(spark):
    import duckdb

    from searchengine_spark.entry_queries import (
        C4_FIXTURE,
        _c4_clean_sql,
        q_c4_clean,
    )

    got = sorted(
        (tuple(r) for r in q_c4_clean(spark, "").collect()),
    )
    want = sorted(tuple(r) for r in duckdb.sql(_c4_clean_sql()).fetchall())
    assert got == want


def test_c4_clean_plan_is_shuffle_free(spark):
    from searchengine_spark.entry_queries import C4_FIXTURE
    from searchengine_spark.ops.textstats import c4_clean

    df = spark.createDataFrame(C4_FIXTURE, "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021 §A1.1)
# ---------------------------------------------------------------------------

_KEEPER = (
    "the quick brown fox jumps over that lazy dog to have fun with friends "
    "and colleagues of note while the other animals watch from afar " * 3
)
GOPHER_FIXTURE = [
    (1, _KEEPER),                                 # clean keeper
    (2, "the cat sat and that was all of it."),   # < 50 words
    (3, " ".join(["extraordinarily"] * 60)),      # mean word len > 10 (+ stops)
    (4, _KEEPER + " " + " ".join(["#"] * 9)),     # '#' ratio > 0.1
    (5, "\n".join(["• " + _KEEPER[:80]] * 10)),   # > 90% bullet lines
    (6, _KEEPER + "\n" + "\n".join(               # > 30% ellipsis lines
        ["so the story trails off here..."] * 3)),
    (7, _KEEPER + " " + " ".join(["12345"] * 30)),  # alpha frac < 0.8
    (8, " ".join(["cat dog fox run"] * 15)),      # stop_hits < 2
    (9, ""),                                      # empty
    (10, _KEEPER + " …… " + " ".join(["x…"] * 8)),  # '…' ratio > 0.1
]


def test_gopher_quality_matches_python_twin(spark):
    from searchengine_spark.ops.textstats import gopher_quality, gopher_quality_py

    df = spark.createDataFrame(GOPHER_FIXTURE, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}
    for doc_id, text in GOPHER_FIXTURE:
        want = gopher_quality_py(text)
        have = {k: v for k, v in got[doc_id].items() if k != "doc_id"}
        assert have == want, (doc_id, have, want)
    verdicts = {d: got[d]["keep"] for d, _ in GOPHER_FIXTURE}
    assert verdicts == {
        1: True, 2: False, 3: False, 4: False, 5: False,
        6: False, 7: False, 8: False, 9: False, 10: False,
    }
    # each non-keeper fails through its intended rule
    assert got[2]["n_words"] < 50
    assert got[3]["mean_word_len"] > 10
    assert got[4]["hash_ratio"] > 0.1
    assert got[5]["bullet_frac"] > 0.9
    assert got[6]["ellipsis_line_frac"] > 0.3
    assert got[7]["alpha_frac"] < 0.8
    assert got[8]["stop_hits"] < 2
    assert got[10]["ellipsis_ratio"] > 0.1


def test_gopher_quality_matches_duckdb(spark):
    import duckdb

    from searchengine_spark.ops.textstats import gopher_quality, gopher_quality_sql

    df = spark.createDataFrame(GOPHER_FIXTURE, "doc_id long, text string")
    got = sorted(tuple(r) for r in gopher_quality(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for d, t in GOPHER_FIXTURE:
        con.execute("INSERT INTO documents VALUES (?, ?)", [d, t])
    want = sorted(tuple(r) for r in con.execute(gopher_quality_sql("documents")).fetchall())
    assert got == want


def test_gopher_quality_plan_is_shuffle_free(spark):
    from searchengine_spark.ops.textstats import gopher_quality

    df = spark.createDataFrame(GOPHER_FIXTURE, "doc_id long, text string")
    plan = gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
