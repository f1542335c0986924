"""Sequence packing (ops/packing.py) and exact line dedup (ops/dedup.py).

Packing invariants checked against a pure-Python re-pack of the same
deterministic order; line dedup against a brute-force first-occurrence
scan.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from searchengine_spark.ops import dedup, packing

DOCS = [
    (0, "a b c d e"),
    (1, "f g"),
    (2, "h i j k l m n o p q r s t u v w x y z aa bb cc"),  # > cap: spans bins
    (3, "a b c d e"),  # exact duplicate of doc 0
    (7, "zz"),
]
CAP = 8
GROUPS = 3


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _expected_pack():
    groups = defaultdict(list)
    for doc_id, text in sorted(DOCS):
        n = len(text.split(" "))
        groups[doc_id % GROUPS].append((doc_id, n))
    rows = set()
    for gid, docs in groups.items():
        off = 0
        for doc_id, n in docs:
            start, end = off, off + n
            for b in range(start // CAP, (end - 1) // CAP + 1):
                rows.add(
                    (
                        gid,
                        b,
                        doc_id,
                        max(0, b * CAP - start),
                        min(n, (b + 1) * CAP - start),
                    )
                )
            off = end
    return rows


def test_pack_docs_matches_python_oracle(docs_df):
    got = {
        tuple(r)
        for r in packing.pack_docs(docs_df, CAP, n_groups=GROUPS)
        .select("group_id", "bin_no", "doc_id", "tok_start", "tok_end")
        .collect()
    }
    assert got == _expected_pack()


def test_pack_docs_bins_full_except_last(docs_df):
    rows = packing.pack_docs(docs_df, CAP, n_groups=GROUPS).collect()
    fill = defaultdict(int)
    for r in rows:
        fill[(r.group_id, r.bin_no)] += r.tok_end - r.tok_start
    last = {g: max(b for gg, b in fill if gg == g) for g, _ in fill}
    for (g, b), tok in fill.items():
        if b < last[g]:
            assert tok == CAP, f"non-terminal bin ({g},{b}) holds {tok} != {CAP}"
        else:
            assert 0 < tok <= CAP


def test_pack_docs_covers_every_token(docs_df):
    rows = packing.pack_docs(docs_df, CAP, n_groups=GROUPS).collect()
    spans = defaultdict(list)
    for r in rows:
        spans[r.doc_id].append((r.tok_start, r.tok_end))
    for doc_id, text in DOCS:
        got = sorted(spans[doc_id])
        n = len(text.split(" "))
        assert got[0][0] == 0 and got[-1][1] == n
        for (_, e1), (s2, _) in zip(got, got[1:]):
            assert e1 == s2  # contiguous, no gap or overlap


def test_pack_docs_rejects_bad_cap(docs_df):
    with pytest.raises(ValueError):
        packing.pack_docs(docs_df, 0)


LINES = [
    (10, "dup shared\nunique ten\ndup shared"),
    (11, "unique eleven\ndup shared"),
    (12, "dup shared\n\nunique twelve"),
]


def test_line_dedup_first_occurrence_wins(spark):
    df = spark.createDataFrame(LINES, "doc_id long, text string")
    got = {
        (r.doc_id, r.line_no, r.line, r.n_dups)
        for r in dedup.line_dedup(dedup.split_lines(df)).collect()
    }
    # first occurrence of "dup shared" is (10, 0); empty line in doc 12 dropped
    assert got == {
        (10, 0, "dup shared", 4),
        (10, 1, "unique ten", 1),
        (11, 0, "unique eleven", 1),
        (12, 2, "unique twelve", 1),
    }


def test_line_dedup_docs_rejoins_in_order(spark):
    df = spark.createDataFrame(LINES, "doc_id long, text string")
    got = dict(
        (r.doc_id, r.text) for r in dedup.line_dedup_docs(df).collect()
    )
    assert got == {
        10: "dup shared\nunique ten",
        11: "unique eleven",
        12: "unique twelve",
    }


# ------------------------------------------------------------ chunk_docs
def test_chunk_docs_windows(spark):
    """32/24-style sliding windows on a toy doc: starts every stride,
    tail kept, no token dropped, short docs give one chunk, empty none."""
    from searchengine_spark.ops.packing import chunk_docs

    df = spark.createDataFrame(
        [(1, "a1 b2 c3 d4 e5"), (2, "x1 y2"), (3, ""), (4, "z9")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"])
        for r in chunk_docs(df, size=3, stride=2).collect()
    )
    assert rows == [(1, 0, 3), (1, 1, 3), (1, 2, 1), (2, 0, 2), (4, 0, 1)]


def test_chunk_docs_coverage_and_overlap(spark):
    """Every token index is covered; consecutive windows overlap by
    size - stride tokens (verified via the md5 of reconstructed slices)."""
    import hashlib

    from searchengine_spark.ops.packing import chunk_docs

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame([(7, " ".join(toks))], "doc_id long, text string")
    out = {r["chunk_id"]: r for r in chunk_docs(df, size=4, stride=3).collect()}
    # starts 0,3,6,9 → sizes 4,4,4,1
    assert {c: out[c]["n_tokens"] for c in out} == {0: 4, 1: 4, 2: 4, 3: 1}
    for c, r in out.items():
        want = hashlib.md5(" ".join(toks[c * 3:c * 3 + 4]).encode()).hexdigest()
        assert r["chunk_md5"] == want


def test_chunk_docs_disjoint_default_and_validation(spark):
    import pytest as _pt

    from searchengine_spark.ops.packing import chunk_docs

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(7)))], "doc_id long, text string"
    )
    rows = chunk_docs(df, size=3).collect()  # stride defaults to size
    assert sorted(r["n_tokens"] for r in rows) == [1, 3, 3]
    with _pt.raises(ValueError):
        chunk_docs(df, size=0)
    with _pt.raises(ValueError):
        chunk_docs(df, size=3, stride=4)  # gaps would drop tokens


def test_chunk_docs_is_shuffle_free(spark):
    """The chunker must stay a narrow transform — no Exchange in the plan
    (at 100 TB it runs at scan speed; the writer controls partitioning)."""
    from searchengine_spark.ops.packing import chunk_docs

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = chunk_docs(df, 32, 24)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
