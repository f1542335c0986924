"""Definition mining (ops/code.py): three-dialect identity and symbol
stats."""

from __future__ import annotations

from searchengine_spark.ops import code

CASES = [
    (1, "def parse(x): pass\nclass Parser: ..."),
    (2, "func mergeRuns(a, b) { }\nstruct Node { }"),
    (3, "function handleClick(e) {}\ninterface Shape {}\nenum Color {}"),
    (4, "fn build_index(c: &Corpus) -> Index {}\ntrait Scorer {}"),
    (5, "no definitions here, just defected classics and defenders"),
    (7, "#ifdef DEBUG\n#undef MAX\ntypedef int foo;"),
    (6, "def dup(): ...\ndef dup(): ..."),  # same name twice = two rows
]


def test_three_way_identity(spark):
    import duckdb

    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["kind"], r["name"])
        for r in code.definitions(df).collect()
    )
    want_py = sorted(
        (i, kind, name) for i, t in CASES for kind, name in code.definitions_py(t)
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want_duck = sorted(map(tuple, con.execute(
        "SELECT doc_id, kind, name FROM (" + code.definitions_sql("t") + ")"
    ).fetchall()))
    assert got == want_py == want_duck
    assert (5, "function", "defected") not in got  # keyword must be whole-word-ish
    assert not [g for g in got if g[0] == 7], got  # ifdef/typedef are NOT defs
    assert got.count((6, "function", "dup")) == 2


def test_symbol_stats(spark):
    df = spark.createDataFrame(
        [(1, "def f(): ..."), (2, "def f(): ...\ndef f(): ..."), (3, "class f: ...")],
        "doc_id long, text string",
    )
    got = {
        (r["name"], r["kind"]): (r["n_defs"], r["n_files"])
        for r in code.symbol_stats(code.definitions(df)).collect()
    }
    assert got == {("f", "function"): (3, 2), ("f", "type"): (1, 1)}


IMPORT_CASES = [
    (1, "import os.path\nfrom collections import deque"),
    (2, '#include <stdio.h>\n#include "local/util.h"'),
    (3, "const x = require('lodash/fp'); import React from 'react'"),
    (4, "no imports; the important word importance unimportable"),
]


def test_imports_three_way_identity(spark):
    import duckdb

    df = spark.createDataFrame(IMPORT_CASES, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["kind"], r["module"])
        for r in code.imports(df).collect()
    )
    want_py = sorted(
        (i, k, m) for i, t in IMPORT_CASES for k, m in code.imports_py(t)
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want_duck = sorted(map(tuple, con.execute(
        "SELECT doc_id, kind, module FROM (" + code.imports_sql("t") + ")"
    ).fetchall()))
    assert got == want_py == want_duck
    by_doc = {}
    for d, k, m in got:
        by_doc.setdefault(d, []).append((k, m))
    assert ("import", "os.path") in by_doc[1] and ("from", "collections") in by_doc[1]
    assert ("include", "stdio.h") in by_doc[2] and ("include", "local/util.h") in by_doc[2]
    assert ("require", "lodash/fp") in by_doc[3] and ("import", "React") in by_doc[3]
    assert 4 not in by_doc  # 'important'/'importance' must not match


def test_fork_pairs_detects_renamed_fork(spark):
    """A fork (same content, files renamed/one modified) must pair with
    its origin at high containment; an unrelated repo must not; a header
    shared by ALL repos is boilerplate-capped out of pair generation."""
    from searchengine_spark.ops.code import fork_pairs

    header = "copyright license header apache version two"
    bodies = [
        "merge sort implementation with stable partition logic here",
        "hash join build probe side with bloom filter pushdown",
        "window aggregate frame pointer chasing elimination pass",
        "columnar scan vectorized decode dictionary runlength",
    ]
    rows = []
    for i, b in enumerate(bodies):  # origin repo A
        rows.append((100 + i, "A", f"{header} {b}"))
    for i, b in enumerate(bodies[:3]):  # fork B: 3 of 4 files kept
        rows.append((200 + i, "B", f"{header} {b}"))
    rows.append((203, "B", f"{header} totally rewritten custom kernel code"))
    for i in range(4):  # unrelated repo C shares ONLY the header
        rows.append((300 + i, "C",
                     f"{header} unrelated text number {i} about nothing"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    out = fork_pairs(
        df, "source", k=3, w=3, tau=0.4, min_shared=2, max_groups_per_fp=2
    ).collect()
    pairs = {(r["group_a"], r["group_b"]): r["containment"] for r in out}
    assert ("A", "B") in pairs and pairs[("A", "B")] >= 0.4
    assert ("A", "C") not in pairs and ("B", "C") not in pairs

    # without the boilerplate cap the header fingerprints would link C too
    uncapped = fork_pairs(
        df, "source", k=3, w=3, tau=0.01, min_shared=1,
        max_groups_per_fp=1000,
    ).collect()
    ug = {(r["group_a"], r["group_b"]) for r in uncapped}
    assert ("A", "C") in ug  # the cap is what kept C out above

    import pytest as _pt

    with _pt.raises(ValueError):
        fork_pairs(df, "source", tau=0.0)
