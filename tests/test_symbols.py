"""Stored symbol layout (go-to-definition as storage): ``symbol_write``
persists the definitions table partitioned by name bucket plus a
name-sorted stats sublayout; readers must (a) match the compute-per-query
``definitions`` path, and (b) prove in the PHYSICAL PLAN that an exact
lookup partition-prunes to one bucket and a prefix suggest pushes
StringStartsWith into the scan — the properties that keep point lookups
O(1/n_buckets) on a billions-of-rows definitions table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops import code as C

from test_ann_stored import files_scanned, plan_of


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(120):
        body = f"def sym_{i}(x): return x\nclass Type{i % 7}: pass"
        if i % 10 == 0:
            # a second def site of the SAME name in the same file
            body += f"\ndef sym_{i}(x, y): return y"
        rows.append((i, body))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def sym_path(spark, corpus, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("symbols") / "layout")
    C.symbol_write(corpus, p, n_buckets=16)
    return p


def test_bucket_twin_agrees_with_spark(spark):
    names = [f"sym_{i}" for i in range(50)] + ["Type0", "parseQueryString"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r["name"]: r["b"]
        for r in df.select("name", C._sym_bucket_col("name", 16).alias("b")).collect()
    }
    for n in names:
        assert got[n] == C.symbol_bucket_py(n, 16), n


def test_lookup_matches_definitions(spark, corpus, sym_path):
    for name in ("sym_3", "sym_10", "Type2"):
        stored = sorted(
            (r["doc_id"], r["kind"], r["name"])
            for r in C.symbol_lookup(spark, sym_path, name).collect()
        )
        computed = sorted(
            (r["doc_id"], r["kind"], r["name"])
            for r in C.definitions(corpus).filter(F.col("name") == name).collect()
        )
        assert stored == computed and stored


def test_lookup_preserves_duplicate_sites(spark, sym_path):
    # doc 10 defines sym_10 twice — both sites must survive the layout
    rows = C.symbol_lookup(spark, sym_path, "sym_10").collect()
    assert len(rows) == 2
    assert {r["doc_id"] for r in rows} == {10}


def test_lookup_scan_is_partition_pruned(spark, sym_path):
    import os

    meta = C.read_symbol_meta(sym_path)
    b = C.symbol_bucket_py("sym_3", meta["n_buckets"])
    defs = spark.read.parquet(os.path.join(sym_path, "defs"))
    pruned = defs.filter((F.col("sym_bucket") == b) & (F.col("name") == "sym_3"))
    plan = plan_of(pruned)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "sym_bucket" in pf[0], plan
    total = len(defs.inputFiles())
    assert 0 < files_scanned(pruned) < total


def test_prefix_topk_order_and_pushdown(spark, corpus, sym_path):
    top = C.symbol_prefix_topk(spark, sym_path, "Type", k=3).collect()
    # Type0..Type6 over 120 docs: Type0 lands in ~18 files (i%7==0), the
    # rest ~17 — widest spread first, name ties broken ascending
    assert [r["name"] for r in top] == ["Type0", "Type1", "Type2"]
    assert top[0]["n_files"] >= top[1]["n_files"]
    expected = (
        C.definitions(corpus)
        .filter(F.col("name").startswith("Type"))
        .groupBy("name", "kind")
        .agg(
            F.count(F.lit(1)).alias("n_defs"),
            F.countDistinct("doc_id").alias("n_files"),
        )
        .orderBy(F.desc("n_files"), F.desc("n_defs"), "name", "kind")
        .limit(3)
        .collect()
    )
    assert [tuple(r) for r in top] == [tuple(r) for r in expected]
    plan = plan_of(C.symbol_prefix_topk(spark, sym_path, "Type", k=3))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "StartsWith" in pushed[0], plan


def test_prefix_topk_no_match_is_empty(spark, sym_path):
    assert C.symbol_prefix_topk(spark, sym_path, "zzz_none", k=5).count() == 0


def test_symbol_boost_promotes_definition_doc(spark):
    # doc 1 DEFINES parseQueryString (subtokens parse/query/string); doc 2
    # only mentions the words. Equal content scores → the boost must rank
    # doc 1 first; doc 3 (no defs, no match) stays unboosted.
    docs = spark.createDataFrame(
        [
            (1, "def parseQueryString(raw): pass"),
            (2, "parse the query string by hand"),
            (3, "unrelated content here"),
        ],
        "doc_id long, text string",
    )
    scored = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 0.5)], "doc_id long, score double"
    )
    out = {
        r["doc_id"]: r["score"]
        for r in C.symbol_boost(
            scored, C.definitions(docs), "parse query string", boost=2.0
        ).collect()
    }
    assert out == {1: 7.0, 2: 1.0, 3: 0.5}  # 1.0 + 2.0 * 3 matched terms


def test_symbol_boost_stopword_only_query_is_identity(spark):
    docs = spark.createDataFrame(
        [(1, "def the_thing(): pass")], "doc_id long, text string"
    )
    scored = spark.createDataFrame([(1, 3.0)], "doc_id long, score double")
    out = C.symbol_boost(scored, C.definitions(docs), "the of and", boost=2.0)
    assert [(r["doc_id"], r["score"]) for r in out.collect()] == [(1, 3.0)]


def test_references_counts_and_def_exclusion(spark):
    docs = spark.createDataFrame(
        [
            (1, "def parse_tokens(s): pass"),                      # def only
            (2, "x = parse_tokens(y)"),                            # ref only
            (3, "parse_tokens(a); parse_tokens(b)"),               # two refs
            (4, "parse_tokensish is a different identifier"),      # \b guard
            (5, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_mentions"], r["n_defs"], r["n_refs"])
        for r in C.references(docs, "parse_tokens").collect()
    }
    assert out == {1: (1, 1, 0), 2: (1, 0, 1), 3: (2, 0, 2)}


def test_references_trigram_candidates_composition(spark, tmp_path):
    from searchengine_spark.trigram import build_trigram_index, trigram_search

    rows = [(i, f"filler text number {i}") for i in range(40)]
    rows += [(100, "def parse_tokens(s): pass"), (101, "y = parse_tokens(x)")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "tg")
    build_trigram_index(docs, idx, n_buckets=4)
    cand = trigram_search(
        spark, idx, docs, r"\bparse_tokens\b", k=1000
    )
    full = sorted(tuple(r) for r in C.references(docs, "parse_tokens").collect())
    pruned = sorted(
        tuple(r)
        for r in C.references(docs, "parse_tokens", candidates=cand).collect()
    )
    assert pruned == full and len(full) == 2


def test_references_rejects_non_identifier(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        C.references(docs, "a.b*")


def test_symbol_append_equals_rebuild(spark, tmp_path):
    """Appended layout must be reader-identical to a fresh build over the
    union (same contract as ann_append / trigram_append)."""
    base = spark.createDataFrame(
        [(i, f"def sym_{i}(x): pass") for i in range(40)],
        "doc_id long, text string",
    )
    extra = spark.createDataFrame(
        [(100 + i, f"def sym_{i % 5}(y): pass\nclass Late{i}: pass")
         for i in range(10)],
        "doc_id long, text string",
    )
    inc = str(tmp_path / "inc")
    C.symbol_write(base, inc, n_buckets=8)
    C.symbol_append(extra, inc)
    full = str(tmp_path / "full")
    C.symbol_write(base.unionByName(extra), full, n_buckets=8)
    for name in ("sym_3", "Late7"):
        a = sorted(tuple(r) for r in C.symbol_lookup(spark, inc, name).collect())
        b = sorted(tuple(r) for r in C.symbol_lookup(spark, full, name).collect())
        assert a == b and a
    a = [tuple(r) for r in C.symbol_prefix_topk(spark, inc, "sym_", k=5).collect()]
    b = [tuple(r) for r in C.symbol_prefix_topk(spark, full, "sym_", k=5).collect()]
    assert a == b
