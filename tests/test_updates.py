"""Document append + in-place update (Lucene addDocuments/updateDocument
analogues): batch epoch appends through the streaming commit protocol, and
updates as epoch-watermarked tombstones + a new-version epoch — the old
version dies at decode time, the new one scores; compaction physically
drops superseded postings and restores exact statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.streaming.ingest import append_docs, compact_streamed_index

ROWS_V0 = [
    (1, "spark join spark filter"),
    (2, "stream window stream stream"),
    (3, "join filter window batch"),
    (4, "spark stream join window"),
]
DOC2_V1 = "merge sort merge column"  # update: doc 2 loses stream/window


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def eng(spark, tmp_path):
    idx = str(tmp_path / "idx")
    append_docs(_df(spark, ROWS_V0), idx, n_buckets=2, range_bits=1,
                with_positions=True)
    return SearchEngine(spark, idx)


def test_append_matches_batch_build(spark, tmp_path, eng):
    e2 = SearchEngine(spark, str(tmp_path / "idx2"))
    e2.build_index_from_df(_df(spark, ROWS_V0), id_col="doc_id",
                           text_col="text", n_buckets=2, range_bits=1)
    for q in ["spark", "stream window", "join filter"]:
        assert eng.search(q, k=10) == e2.search(q, k=10)


def test_second_append_extends_the_corpus(spark, eng):
    append_docs(_df(spark, [(5, "spark spark spark")]), eng.index_dir)
    hits = dict(eng.search("spark", k=10))
    assert 5 in hits
    assert set(hits) == {1, 4, 5}


def test_append_refuses_batch_layout(spark, tmp_path):
    e = SearchEngine(spark, str(tmp_path / "bidx"))
    e.build_index_from_df(_df(spark, ROWS_V0), id_col="doc_id",
                          text_col="text", n_buckets=2, range_bits=1)
    with pytest.raises(ValueError, match="epoch.layout"):
        append_docs(_df(spark, [(9, "spark")]), e.index_dir)
    with pytest.raises(ValueError, match="epoch.layout"):
        e.update_docs(_df(spark, [(1, "spark")]))


def test_update_replaces_the_searchable_version(spark, eng):
    assert 2 in dict(eng.search("stream", k=10))
    eng.update_docs(_df(spark, [(2, DOC2_V1)]))
    # old terms no longer reach doc 2; new terms do, exactly once
    assert 2 not in dict(eng.search("stream", k=10))
    merge_hits = eng.search("merge", k=10)
    assert [d for d, _ in merge_hits] == [2]
    # conjunctive + matched-set + explain all see only the new version
    assert 2 in dict(eng.search("merge sort", k=10, mode="and"))
    assert {r[0] for r in eng.matching_docs("merge").collect()} == {2}
    exp = eng.explain("merge", [2]).collect()
    assert len(exp) == 1 and exp[0]["tf"] == 2  # merge appears twice in v1


def test_update_switches_the_position_stream(spark, eng):
    eng.update_docs(_df(spark, [(2, DOC2_V1)]))
    assert [d for d, _ in eng.search_phrase("merge sort", k=10)] == [2]
    assert all(d != 2 for d, _ in eng.search_phrase("stream window", k=10))
    snip = {r["doc_id"]: (r["start"], r["end"])
            for r in eng.snippets("merge sort", window=2).collect()}
    assert snip[2] == (0, 1)  # v1 positions, not v0's


def test_sequential_updates_last_one_wins(spark, eng):
    eng.update_docs(_df(spark, [(2, DOC2_V1)]))
    eng.update_docs(_df(spark, [(2, "vector vector agg")]))
    assert 2 not in dict(eng.search("merge", k=10))
    assert [d for d, _ in eng.search("vector", k=10)] == [2]


def test_delete_overrides_update(spark, eng):
    eng.update_docs(_df(spark, [(2, DOC2_V1)]))
    eng.delete_docs([2])
    assert eng.search("merge", k=10) == []
    assert 2 not in dict(eng.search("stream", k=10))


def test_compaction_restores_exact_stats(spark, tmp_path, eng):
    eng.update_docs(_df(spark, [(2, DOC2_V1)]))
    pre = eng.search("spark join", k=10)
    compact_streamed_index(spark, eng.index_dir)
    eng.refresh()
    # identical to a fresh build whose doc 2 always had the new text
    rows = [(d, DOC2_V1 if d == 2 else t) for d, t in ROWS_V0]
    fresh = SearchEngine(spark, str(tmp_path / "fidx"))
    fresh.build_index_from_df(_df(spark, rows), id_col="doc_id",
                              text_col="text", n_buckets=2, range_bits=1,
                              with_positions=True)
    for q in ["spark", "merge sort", "join window", "stream"]:
        assert eng.search(q, k=10) == fresh.search(q, k=10), q
        assert eng.search_phrase(q, k=10) == fresh.search_phrase(q, k=10), q
    assert eng.meta.n_docs == 4
    assert pre  # compaction changed stats, so scores may differ from pre


# ---------------------------------------------------------- update_by_query
def test_update_by_query_with_corpus_df(spark, eng):
    """corpus_df path (external source of truth): every doc matching
    'stream' gets its text rewritten; matching docs score under the NEW
    text, non-matching docs are untouched."""
    corpus = _df(spark, ROWS_V0)
    matched = {r["doc_id"] for r in eng.matching_docs("stream").collect()}
    assert matched == {2, 4}
    n = eng.update_by_query(
        "stream",
        lambda df: df.withColumn("text", F.lit("rewritten doc only")),
        corpus_df=corpus,
    )
    assert n == 2
    # old text gone, new text scores
    assert {d for d, _ in eng.search("stream", k=10)} == set()
    assert {d for d, _ in eng.search("rewritten", k=10)} == {2, 4}
    # non-matching docs untouched
    assert {d for d, _ in eng.search("filter", k=10)} == {1, 3}


def test_update_by_query_store_path_refreshes_fetch(spark, tmp_path):
    """Doc-store path: matched docs are transformed FROM the store, the
    postings replace in place, and the store's affected partitions are
    rewritten so fetch returns exactly one — current — version per doc."""
    from searchengine_spark.streaming.ingest import compact_streamed_index

    idx = str(tmp_path / "sidx")
    eng = SearchEngine(spark, idx)
    eng.build_index_from_df(
        _df(spark, ROWS_V0), id_col="doc_id", text_col="text",
        n_buckets=2, range_bits=1, store_source=True,
    )
    compact_streamed_index(spark, idx)  # convert to epoch layout
    eng = SearchEngine(spark, idx)

    n = eng.update_by_query(
        "stream",
        lambda df: df.withColumn(
            "text", F.concat(F.col("text"), F.lit(" patched"))
        ),
    )
    assert n == 2
    # postings: the appended token is searchable, old tokens remain (concat)
    assert {d for d, _ in eng.search("patched", k=10)} == {2, 4}
    assert {d for d, _ in eng.search("stream", k=10)} == {2, 4}
    # store: ONE row per updated doc, carrying the new text
    rows = eng.fetch([2, 4]).collect()
    assert len(rows) == 2
    assert all(r["text"].endswith("patched") for r in rows)
    # untouched doc's stored row survives the partition rewrite
    (r1,) = eng.fetch([1]).collect()
    assert r1["text"] == ROWS_V0[0][1]


def test_update_by_query_no_match_is_noop(spark, eng):
    assert eng.update_by_query(
        "nosuchtoken", lambda df: df, corpus_df=_df(spark, ROWS_V0)
    ) == 0


def test_update_by_query_guards_dropped_columns(spark, tmp_path):
    from searchengine_spark.streaming.ingest import compact_streamed_index

    idx = str(tmp_path / "gidx")
    eng = SearchEngine(spark, idx)
    eng.build_index_from_df(
        _df(spark, ROWS_V0), id_col="doc_id", text_col="text",
        n_buckets=2, range_bits=1, store_source=True,
    )
    compact_streamed_index(spark, idx)
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError, match="required columns"):
        eng.update_by_query("stream", lambda df: df.drop("text"))
