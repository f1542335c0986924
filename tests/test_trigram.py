"""Trigram-accelerated regex search (trigram.py): the required-trigram
extractor must be CONSERVATIVE (every regex match contains all claimed
trigrams — property-tested against Python re over random pattern/text
pairs), and trigram_search must equal the brute-force full regex scan
while reading only the required trigrams' bucket partitions."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from searchengine_spark.trigram import (
    build_trigram_index,
    required_trigrams,
    trigram_search,
)

PATTERN_CASES = {
    # pattern → expected required trigrams
    "merge (sort|join)": {"mer", "erg", "rge", "ge "},
    "(foo|foobar)": {"foo"},
    "foo.*barz": {"foo", "bar", "arz"},
    "abc?": set(),           # 'c' optional → run "ab" too short
    "ab+cd": set(),          # "abbcd" matches without "abc"
    "abcd+": {"abc", "bcd"},  # 'd' repeats but ≥1 is present: both required
    "ab{1,3}cd": set(),      # repeatable 'b' breaks the run
    "ab{0,3}cd": set(),      # and optional 'b' drops it entirely
    "[Tt]odor": {"odo", "dor"},
    "a.*b": set(),
    r"foo\d+bar": {"foo", "bar"},
    "^merge sort$": {"mer", "erg", "rge", "ge ", "e s", " so", "sor", "ort"},
    "(?:hash)join": {"has", "ash", "joi", "oin"},
    "(abc)+xyz": {"abc", "xyz"},
    "(abc)*xyz": {"xyz"},
    "plain": {"pla", "lai", "ain"},
    # constructs outside the algebra degrade to EMPTY (full-scan), never
    # to a wrong literal requirement
    "(?i)grep": set(),        # inline flag: GREP matches, has no 'gre'
    "(?i:grep)x": set(),
    "(?=foo)bar": set(),      # lookahead
    r"[x\]]abc": {"abc"},     # escaped ']' must not close the class early
}


@pytest.mark.parametrize("pattern,want", sorted(PATTERN_CASES.items()))
def test_required_trigrams_cases(pattern, want):
    assert required_trigrams(pattern) == want


def test_unbalanced_patterns_refused():
    for bad in ("a(bc", "a)b(", "a[bc"):
        with pytest.raises(ValueError):
            required_trigrams(bad)


def test_extractor_is_conservative_property():
    """For random (pattern, text) pairs: text matches pattern ⇒ text
    contains every required trigram. 2k seeded trials over a pattern
    grammar exercising every operator the parser handles."""
    rng = random.Random(1234)
    alphabet = "abcxyz"

    def rand_literal(lo=1, hi=5):
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(lo, hi)))

    def rand_pattern(depth=0):
        parts = []
        for _ in range(rng.randint(1, 3)):
            r = rng.random()
            if r < 0.45 or depth >= 2:
                parts.append(rand_literal())
            elif r < 0.65:
                parts.append(f"({rand_pattern(depth + 1)}|{rand_pattern(depth + 1)})")
            elif r < 0.75:
                parts.append(f"({rand_pattern(depth + 1)}){rng.choice('?*+')}")
            elif r < 0.85:
                parts.append(rand_literal(1, 2) + rng.choice("?*+"))
            elif r < 0.95:
                parts.append("[" + rand_literal(1, 3) + "]")
            else:
                parts.append(".")
        return "".join(parts)

    checked = 0
    for _ in range(400):
        pat = rand_pattern()
        try:
            creg = re.compile(pat)
            req = required_trigrams(pat)
        except (re.error, ValueError):
            continue
        for _ in range(5):
            text = "".join(rng.choice(alphabet + " ") for _ in range(rng.randint(5, 40)))
            if creg.search(text):
                checked += 1
                for t in req:
                    assert t in text, (pat, req, text)
    assert checked > 100  # the property actually exercised matches


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def tg_path(spark, docs, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tg") / "idx")
    build_trigram_index(docs, p, n_buckets=16)
    return p


@pytest.mark.parametrize(
    "pattern",
    ["merge (sort|join)", "customer", "stream[a-z]* merge", "hash (scan )?join"],
)
def test_search_equals_brute_force(spark, docs, tg_path, pattern):
    got = [r["doc_id"] for r in trigram_search(
        spark, tg_path, docs, pattern, k=1000
    ).collect()]
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("text").rlike(pattern)).select("doc_id").collect()
    )[:1000]
    assert got == want
    assert len(got) > 0, f"vacuous pattern {pattern!r}"


def test_full_scan_gated(spark, docs, tg_path):
    with pytest.raises(ValueError, match="allow_full_scan"):
        trigram_search(spark, tg_path, docs, "a.?b", k=10)
    got = [r["doc_id"] for r in trigram_search(
        spark, tg_path, docs, "a.?b", k=50, allow_full_scan=True
    ).collect()]
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("text").rlike("a.?b")).select("doc_id").collect()
    )[:50]
    assert got == want


def test_postings_scan_is_partition_pruned(spark, docs, tg_path):
    """The candidate scan must read only the required trigrams' bucket
    partitions — numFiles < total, PartitionFilters on bucket."""
    from searchengine_spark.trigram import _buckets_for, _meta_path
    import json

    req = sorted(required_trigrams("merge (sort|join)"))
    n_buckets = json.load(open(_meta_path(tg_path)))["n_buckets"]
    buckets = _buckets_for(spark, req, n_buckets)
    pruned = (
        spark.read.parquet(tg_path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("trigram").isin(req))
    )
    pruned.collect()
    leaf = pruned._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    scanned = int(leaf.metrics().apply("numFiles").value())
    total = len(spark.read.parquet(tg_path).inputFiles())
    assert 0 < scanned < total, (scanned, total)


def test_fold_case_layout(spark, docs, tmp_path):
    """fold_case layout: 'MERGE (SORT|JOIN)' finds the lowercase corpus
    matches (verify runs (?i)); the same pattern on the case-exact layout
    finds nothing."""
    from searchengine_spark.trigram import build_trigram_index as build

    ci = str(tmp_path / "tg_ci")
    build(docs, ci, n_buckets=8, fold_case=True)
    got = [r["doc_id"] for r in trigram_search(
        spark, ci, docs, "MERGE (SORT|JOIN)", k=1000
    ).collect()]
    want = sorted(
        r["doc_id"]
        for r in docs.filter(
            F.col("text").rlike("(?i)MERGE (SORT|JOIN)")
        ).select("doc_id").collect()
    )[:1000]
    assert got == want and len(got) > 0


def test_case_exact_layout_misses_uppercase(spark, docs, tg_path):
    got = trigram_search(spark, tg_path, docs, "MERGE (SORT|JOIN)", k=10)
    assert got.count() == 0  # corpus is lowercase; case-exact finds nothing


def test_where_predicate_composes(spark, docs, tg_path):
    got = [r["doc_id"] for r in trigram_search(
        spark, tg_path, docs, "merge (sort|join)", k=1000, where="lang = 'en'"
    ).collect()]
    want = sorted(
        r["doc_id"]
        for r in docs.filter("lang = 'en'")
        .filter(F.col("text").rlike("merge (sort|join)"))
        .select("doc_id").collect()
    )[:1000]
    assert got == want and len(got) > 0


def test_trigram_append_equals_full_rebuild(spark, docs, tmp_path):
    from searchengine_spark.trigram import trigram_append

    inc = str(tmp_path / "tg_inc")
    full = str(tmp_path / "tg_full")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    build_trigram_index(half_a, inc, n_buckets=8)
    trigram_append(half_b, inc)
    build_trigram_index(docs, full, n_buckets=8)
    pat = "merge (sort|join)"
    got = [r["doc_id"] for r in trigram_search(spark, inc, docs, pat, k=1000).collect()]
    want = [r["doc_id"] for r in trigram_search(spark, full, docs, pat, k=1000).collect()]
    assert got == want and len(got) > 0


def test_batch_grep_equals_sequential(spark, docs, tg_path):
    from searchengine_spark.trigram import trigram_search_batch

    pats = {
        "p1": "merge (sort|join)",
        "p2": "customer",
        "p3": "hash (scan )?join",
    }
    out = trigram_search_batch(spark, tg_path, docs, pats, k=1000).collect()
    got = {}
    for r in out:
        got.setdefault(r["pattern_id"], []).append(r["doc_id"])
    for pid, pat in pats.items():
        want = [
            r["doc_id"]
            for r in trigram_search(spark, tg_path, docs, pat, k=1000).collect()
        ]
        assert sorted(got.get(pid, [])) == want, pid


def test_batch_grep_rejects_unplannable(spark, docs, tg_path):
    from searchengine_spark.trigram import trigram_search_batch

    with pytest.raises(ValueError, match="allow_full_scan"):
        trigram_search_batch(spark, tg_path, docs, {"p": "a.?b"})
    with pytest.raises(ValueError, match="empty pattern batch"):
        trigram_search_batch(spark, tg_path, docs, {})


def test_grep_lines_multiline(spark, tmp_path):
    """grep -n semantics on a multi-line corpus: matching lines with
    1-based line numbers, capped per doc, brute-checked with Python re."""
    from searchengine_spark.trigram import trigram_search_lines

    rows = [
        (1, "def foo():\n    return merge_sort(x)\n# merge sort here\npass"),
        (2, "no match at all\njust text"),
        (3, "merge sort\nmerge sort\nmerge sort\nmerge sort"),
        (4, "tail line merge sort"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "tg_ml")
    build_trigram_index(df, p, n_buckets=4)
    got = [
        (r["doc_id"], r["line_no"], r["line"])
        for r in trigram_search_lines(
            spark, p, df, "merge.sort", k=10, max_lines_per_doc=2
        ).collect()
    ]
    want = []
    for doc_id, text in rows:
        n = 0
        for i, line in enumerate(text.split("\n"), 1):
            if re.search("merge.sort", line) and n < 2:
                want.append((doc_id, i, line))
                n += 1
    assert got == want
    assert (3, 3, "merge sort") not in got  # per-doc cap enforced


def test_stream_trigram_append_matches_batch(spark, docs, tmp_path):
    """Streamed trigram ingestion: empty-initialized layout + two
    micro-batches == a batch build over the union, through the unchanged
    search path."""
    from searchengine_spark.trigram import stream_trigram_append

    src = str(tmp_path / "dsrc")
    inc = str(tmp_path / "tg_stream")
    full = str(tmp_path / "tg_batch2")
    half_a = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    half_b = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")

    build_trigram_index(docs.limit(0), inc, n_buckets=8)  # sidecar only
    half_a.coalesce(1).write.mode("append").parquet(src)
    q = stream_trigram_append(spark, src, inc, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        half_b.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    build_trigram_index(docs, full, n_buckets=8)
    pat = "merge (sort|join)"
    got = [r["doc_id"] for r in trigram_search(spark, inc, docs, pat, k=1000).collect()]
    want = [r["doc_id"] for r in trigram_search(spark, full, docs, pat, k=1000).collect()]
    assert got == want and len(got) > 0


def test_inline_flag_pattern_full_scan_is_exact(spark, tmp_path):
    """(?i) used to leak lowercase trigrams as required and silently DROP
    uppercase matches; it must now degrade to the (gated) full scan and
    return them."""
    docs = spark.createDataFrame(
        [(1, "THE GREP TOOL"), (2, "plain grep here"), (3, "nothing")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "tg")
    build_trigram_index(docs, p, n_buckets=4)
    with pytest.raises(ValueError, match="full regex scan"):
        trigram_search(spark, p, docs, "(?i)grep", k=10)
    got = sorted(
        r["doc_id"]
        for r in trigram_search(
            spark, p, docs, "(?i)grep", k=10, allow_full_scan=True
        ).collect()
    )
    assert got == [1, 2]


def test_short_docs_produce_no_postings(spark, tmp_path):
    """Docs under 3 chars have no trigrams: sequence(1, len-2) used to
    step DOWNWARD and mint junk '', 1- and 2-char rows."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, "abc")], "doc_id long, text string"
    )
    p = str(tmp_path / "tg")
    build_trigram_index(docs, p, n_buckets=2)
    rows = spark.read.parquet(p).collect()
    assert [(r["doc_id"], r["trigram"]) for r in rows] == [(3, "abc")]


def test_append_layout_conflicts_are_refused(spark, tmp_path):
    from searchengine_spark.trigram import trigram_append

    docs = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    # epoch layout → flat append refused
    p1 = str(tmp_path / "stream_tg")
    build_trigram_index(docs.limit(0), p1, n_buckets=2)
    import os

    os.makedirs(os.path.join(p1, "epoch=0"))
    with pytest.raises(ValueError, match="stream-maintained"):
        trigram_append(docs, p1)
    # flat layout → stream append refused
    from searchengine_spark.trigram import stream_trigram_append

    p2 = str(tmp_path / "flat_tg")
    build_trigram_index(docs, p2, n_buckets=2)
    with pytest.raises(ValueError, match="flat"):
        stream_trigram_append(
            spark, str(tmp_path / "src"), p2, str(tmp_path / "ckpt")
        )


def test_search_on_empty_init_layout_returns_empty(spark, tmp_path):
    """The documented streaming init (empty build) leaves only the sidecar;
    searching during the startup window must return empty, not crash."""
    docs = spark.createDataFrame([(1, "merge sort")], "doc_id long, text string")
    p = str(tmp_path / "tg")
    build_trigram_index(docs.limit(0), p, n_buckets=2)
    assert trigram_search(spark, p, docs, "merge", k=5).collect() == []
