"""code_quality / code_quality_filter / license_detect (ops/code.py):
pure-Python twin identity over the multi-line synthetic code corpus
(corpus.py content has real newlines, unlike the sf prose), DuckDB twin
identity, threshold verdicts, and plan shape (scan-only, no shuffle)."""

from __future__ import annotations

import math

import pytest

from searchengine_spark.corpus import corpus_df
from searchengine_spark.ops import code


def _round_half_up(x: float, dp: int) -> float:
    # Spark's round() is HALF_UP; Python's round() is half-even
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(10) ** -dp, ROUND_HALF_UP))


def _py_quality(doc_id: int, text: str, long_line: int = 120, dp: int = 4):
    lines = text.split("\n")
    n = len(lines)
    lens = [len(ln) for ln in lines]
    alnum = sum(1 for c in text if c.isalnum() and c.isascii())
    return (
        doc_id,
        n,
        max(lens),
        _round_half_up((len(text) - (n - 1)) / n, dp),
        _round_half_up(alnum / len(text), dp) if text else 0.0,
        _round_half_up(sum(1 for x in lens if x > long_line) / n, dp),
    )


@pytest.fixture(scope="module")
def docs(spark):
    df = corpus_df(spark, 60, seed=21).selectExpr(
        "doc_id", "content AS text"
    )
    return df.cache()


def test_quality_matches_python_twin(docs):
    got = {
        r["doc_id"]: (
            r["doc_id"], r["n_lines"], r["max_line_len"],
            r["avg_line_len"], r["alnum_frac"], r["frac_long_lines"],
        )
        for r in code.code_quality(docs).collect()
    }
    for row in docs.collect():
        want = _py_quality(row["doc_id"], row["text"])
        assert got[row["doc_id"]] == pytest.approx(want), row["doc_id"]


def test_quality_matches_duckdb_twin(docs):
    import duckdb

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("codeq_docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(
            code.code_quality_filter_sql("codeq_docs")
        ).fetchall()
    )
    got = sorted(tuple(r) for r in code.code_quality_filter(docs).collect())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == pytest.approx(w)


def test_filter_verdicts(spark):
    fixture = [
        (1, "short\nlines\nonly"),                      # keep
        (2, "x" * 1200),                                # max_line_len > 1000
        (3, "!!! ??? ... ;;; ***"),                     # alnum_frac < 0.25
        (4, ("y" * 150 + "\n") * 4 + "z"),              # avg > 100
        (5, ""),                                        # empty → alnum 0 → drop
    ]
    df = spark.createDataFrame(fixture, "doc_id long, text string")
    keep = {r["doc_id"]: r["keep"] for r in code.code_quality_filter(df).collect()}
    assert keep == {1: True, 2: False, 3: False, 4: False, 5: False}


def test_empty_doc_guard(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = code.code_quality(df).collect()[0]
    assert r["n_lines"] == 1 and r["max_line_len"] == 0
    assert r["alnum_frac"] == 0.0 and not math.isnan(r["avg_line_len"])


LIC_CASES = [
    (1, "// SPDX-License-Identifier: MIT\ncode", "mit", True),
    (2, "// SPDX-License-Identifier: GPL-3.0-only\ncode", "gpl-3.0-only", False),
    (3, "Licensed under the Apache License, Version 2.0", "apache-2.0", True),
    (4, "released under the MIT License", "mit", True),
    # LGPL phrase contains the GPL phrase — priority order must pick lgpl
    (5, "GNU Lesser General Public License v2.1", "lgpl-2.1", False),
    (6, "GNU General Public License version 3", "gpl-3.0", False),
    (7, "under the BSD License", "bsd-3-clause", True),
    (8, "Mozilla Public License 2.0", "mpl-2.0", False),
    (9, "ISC License", "isc", True),
    (10, "no license text at all", "unknown", False),
    # SPDX beats a later phrase mention
    (11, "SPDX-License-Identifier: Apache-2.0\nsee the MIT License file", "apache-2.0", True),
]


def test_license_mapping(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in LIC_CASES], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["license"], r["permissive"])
           for r in code.license_detect(df).collect()}
    for i, _, lic, perm in LIC_CASES:
        assert got[i] == (lic, perm), i


def test_license_matches_duckdb_twin(spark):
    import duckdb

    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in LIC_CASES], "doc_id long, text string"
    )
    con = duckdb.connect()
    con.register("lic_docs", df.toPandas())
    want = sorted(con.execute(code.license_detect_sql("lic_docs")).fetchall())
    got = sorted(tuple(r) for r in code.license_detect(df).collect())
    assert got == want


def test_scan_only_plans(docs):
    # all three surfaces are per-row projections: no Exchange may appear
    for plan_df in (
        code.code_quality_filter(docs),
        code.license_detect(docs),
        code.code_profile(docs),
    ):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_profile_equals_composed_ops(docs):
    prof = {tuple(r) for r in code.code_profile(docs).collect()}
    joined = code.code_quality_filter(docs).join(
        code.license_detect(docs), "doc_id"
    )
    # column order: profile puts license before keep — align by name
    cols = code.code_profile(docs).columns
    composed = {tuple(r) for r in joined.select(*cols).collect()}
    assert prof == composed
