"""Sharded scatter-gather search: N independent shard indexes must be
rank- AND score-identical to one index over the union corpus, because the
gather phase scores every shard under GLOBAL statistics (ES
DFS_QUERY_THEN_FETCH made mandatory).

Reference parity note: the reference is single-process; sharding is the
100 TB-mandatory piece it lacks. Exactness is enforced here against the
single-index build and in the `sharded_topk` driver entry against the
same DuckDB BM25 twin the single-index entries use."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.query.sharded import ShardedEngine, shard_of

QUERIES = ["spark stream", "merge sort table", "dup stream", "spark"]
N_SHARDS = 3


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .cache()
    )


@pytest.fixture(scope="module")
def single(spark, corpus, tmp_path_factory):
    e = SearchEngine(spark, str(tmp_path_factory.mktemp("single") / "idx"))
    e.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                          n_buckets=4, range_bits=2)
    return e


@pytest.fixture(scope="module")
def sharded(spark, corpus, tmp_path_factory):
    return ShardedEngine.build(
        spark, corpus, str(tmp_path_factory.mktemp("shards")), N_SHARDS,
        n_buckets=4, range_bits=2,
    )


def _assert_hits_equal(got, want):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12, abs=1e-12)


def test_routing_is_disjoint_and_covering(spark, corpus, sharded):
    all_ids = {r[0] for r in corpus.select("doc_id").collect()}
    shard_ids = []
    for s in sharded.shards:
        got = {r[0] for r in s.term_vectors(list(all_ids))
               .select("doc_id").distinct().collect()}
        shard_ids.append(got)
    union = set().union(*shard_ids)
    assert union == all_ids
    assert sum(len(s) for s in shard_ids) == len(all_ids)  # disjoint
    # every shard got a meaningful slice (hash routing is uniform-ish)
    assert all(len(s) > len(all_ids) // (N_SHARDS * 3) for s in shard_ids)
    # routing expression is reproducible from the id alone
    want0 = {
        r[0]
        for r in corpus.select("doc_id")
        .filter(shard_of(F.col("doc_id"), N_SHARDS) == 0)
        .collect()
    }
    assert shard_ids[0] == want0


def test_global_stats_match_single_index(single, sharded):
    n, avgdl, df = sharded.global_stats(["spark", "stream", "merge"])
    assert n == single.meta.n_docs
    assert avgdl == pytest.approx(single.meta.avgdl, rel=1e-12)
    for t in ("spark", "stream", "merge"):
        (row,) = [r for r in single._resolve_terms(t)]
        assert df[t] == int(row["df"])


@pytest.mark.parametrize("query", QUERIES)
def test_search_identical_to_single_index(single, sharded, query):
    want = single.search(query, k=15)
    got = sharded.search(query, k=15)
    _assert_hits_equal(got, want)
    assert got


def test_wand_equals_exhaustive_under_global_stats(sharded):
    # block-max bounds are rebound under global avgdl — pruning must stay
    # exact on every shard
    for query in QUERIES:
        got = sharded.search(query, k=15, use_wand=True)
        want = sharded.search(query, k=15, use_wand=False)
        _assert_hits_equal(got, want)


def test_batch_identical_to_single_index(single, sharded):
    qb = {f"q{i}": q for i, q in enumerate(QUERIES)}
    want = single.search_batch(qb, k=10)
    got = sharded.search_batch(qb, k=10)
    assert set(got) == set(want)
    for qid in qb:
        _assert_hits_equal(got[qid], want[qid])


def test_and_mode_composes(single, sharded):
    want = single.search("spark stream", k=10, mode="and")
    got = sharded.search("spark stream", k=10, mode="and")
    _assert_hits_equal(got, want)
    assert got


def test_oov_and_guards(sharded):
    assert sharded.search("zzzznotaterm") == []
    eng = sharded.shards[0]
    gs = sharded.global_stats(["spark"])
    # a WEIGHT-mapping rewriter now composes (boosts refold onto global
    # idf); a rewriter that ADDS a term with no global df must fail LOUDLY
    # rather than silently dropping it
    assert eng.search("spark", global_stats=gs, rewriter=lambda t: t)
    with pytest.raises(ValueError, match="lacks terms"):
        eng.search(
            "spark", global_stats=gs,
            rewriter=lambda qt: list(qt) + [("stream", 0.5)],
        )
    with pytest.raises(ValueError, match="global_stats"):
        eng.search("spark", global_stats=gs, scorer="lm")


def test_boost_refolds_onto_global_idf(single, sharded):
    # ^2 boost under global stats must exactly double that term's
    # contribution — identical to the single-index boosted search
    boosts = {"spark": 2.0}
    rw = lambda qt: [(t, boosts.get(t, 1.0)) for t, _ in qt]  # noqa: E731
    want = single.search("spark stream", k=10, rewriter=rw)
    gs = sharded.global_stats(["spark", "stream"])
    lists = [s.search("spark stream", k=10, global_stats=gs, rewriter=rw)
             for s in sharded.shards]
    got = sharded._merge(lists, 10)
    _assert_hits_equal(got, want)


def test_query_string_identical_to_single_index(single, sharded, corpus):
    qs = '+spark stream^2 -table'
    want = single.search_query_string(qs, k=10)
    got = sharded.search_query_string(qs, k=10)
    _assert_hits_equal(got, want)
    assert got
    # with a metadata filter clause (full corpus table on both sides)
    qs2 = "spark stream lang:en"
    want2 = single.search_query_string(qs2, k=10, metadata=corpus)
    got2 = sharded.search_query_string(qs2, k=10, metadata=corpus)
    _assert_hits_equal(got2, want2)


def test_open_roundtrip(spark, sharded, single):
    base = os.path.dirname(sharded.shards[0].index_dir)
    reopened = ShardedEngine.open(spark, base)
    assert len(reopened.shards) == N_SHARDS
    _assert_hits_equal(
        reopened.search("spark stream", k=10),
        single.search("spark stream", k=10),
    )


def test_stats_aggregates_shards(spark, corpus, sharded, single):
    st = sharded.stats()
    assert st["n_shards"] == N_SHARDS
    assert st["n_docs"] == single.meta.n_docs == corpus.count()
    assert st["avgdl"] == pytest.approx(single.meta.avgdl, rel=1e-12)
    assert st["n_blocks"] == sum(p["n_blocks"] for p in st["shards"])
    assert st["size_bytes"] > 0 and st["n_deleted"] == 0
    # per-shard stats carry the layout fields
    assert all(p["n_buckets"] == 4 and p["n_terms"] for p in st["shards"])


def test_append_update_delete_route_correctly(spark, tmp_path_factory):
    full = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    first, rest = full.filter(F.col("doc_id") < 80), full.filter(
        (F.col("doc_id") >= 80)
    )
    base = str(tmp_path_factory.mktemp("shmaint"))
    se = ShardedEngine.build(
        spark, first, base, N_SHARDS, n_buckets=4, range_bits=2,
        epoch_layout=True,
    )
    n_app = se.append(rest)
    assert n_app == rest.count()

    ref = SearchEngine(
        spark, str(tmp_path_factory.mktemp("shmaint_ref") / "idx")
    )
    ref.build_index_from_df(full, id_col="doc_id", text_col="text",
                            n_buckets=4, range_bits=2)
    for q in QUERIES[:2]:
        _assert_hits_equal(se.search(q, k=10), ref.search(q, k=10))

    # delete routes each id to its owning shard only
    victims = [d for d, _ in se.search(QUERIES[0], k=3)]
    n_del = se.delete(victims)
    assert n_del == len(victims)
    got = {d for d, _ in se.search(QUERIES[0], k=20)}
    assert not (got & set(victims))
    st = se.stats()
    assert st["n_deleted"] == len(victims)
    # tombstones landed only on owning shards (total == len, not N× len)
    assert sum(p["n_deleted"] for p in st["shards"]) == len(victims)

    # update: replace one surviving doc's text, ranks pick up the new text
    target = next(iter(got))
    upd = spark.createDataFrame(
        [(target, "zzzuniqueterm zzzuniqueterm")], "doc_id long, text string"
    )
    assert se.update(upd) == 1
    hits = se.search("zzzuniqueterm", k=5)
    assert [d for d, _ in hits] == [target]



def test_phrase_and_near_identical_to_single_index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("shpos"))
    se = ShardedEngine.build(
        spark, corpus, base, N_SHARDS, n_buckets=4, range_bits=2,
        with_positions=True,
    )
    ref = SearchEngine(spark, str(tmp_path_factory.mktemp("shpos_ref") / "idx"))
    ref.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                            n_buckets=4, range_bits=2, with_positions=True)
    for q in ["spark stream", "merge sort"]:
        got = se.search_phrase(q, k=10)
        want = ref.search_phrase(q, k=10)
        _assert_hits_equal(got, want)
        gotn = se.search_near(q, window=4, k=10)
        wantn = ref.search_near(q, window=4, k=10)
        _assert_hits_equal(gotn, wantn)
        for limit in (3, 12, 1000):
            gots = se.search_span_first(q, limit, k=10)
            wants = ref.search_span_first(q, limit, k=10)
            _assert_hits_equal(gots, wants)
    assert se.search_phrase("spark stream", k=10)  # nonempty on this corpus
    assert se.search_phrase("zzznope stream", k=10) == []
    # limit→∞ reduces to phrase, sharded too
    _assert_hits_equal(
        se.search_span_first("spark stream", 10_000, k=10),
        se.search_phrase("spark stream", k=10),
    )


def test_single_pass_build_identical_to_naive(spark, corpus, tmp_path_factory):
    """single_pass=True (one corpus scan via the _shard-partitioned staging
    dir) must produce byte-equivalent retrieval to the naive n-scans build,
    and must clean its staging dir up."""
    base_sp = str(tmp_path_factory.mktemp("sp"))
    base_nv = str(tmp_path_factory.mktemp("nv"))
    sp = ShardedEngine.build(spark, corpus, base_sp, N_SHARDS,
                             n_buckets=4, range_bits=2, single_pass=True)
    nv = ShardedEngine.build(spark, corpus, base_nv, N_SHARDS,
                             n_buckets=4, range_bits=2, single_pass=False)
    assert not os.path.exists(os.path.join(base_sp, "_staging"))
    assert [s.meta.n_docs for s in sp.shards] == [
        s.meta.n_docs for s in nv.shards
    ]
    for q in QUERIES:
        _assert_hits_equal(sp.search(q, k=20), nv.search(q, k=20))


def test_sharded_suggest_matches_single_index(spark, tmp_path):
    """Autocomplete across shards must equal a single-index suggest over
    the union corpus (dfs sum across shards)."""
    from searchengine_spark.query.engine import SearchEngine
    from searchengine_spark.query.sharded import ShardedEngine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    single = SearchEngine(spark, str(tmp_path / "one"))
    single.build_index_from_df(docs, id_col="doc_id", text_col="text",
                               n_buckets=2, range_bits=2)
    seng = ShardedEngine.build(spark, docs, str(tmp_path / "many"), 3,
                               id_col="doc_id", text_col="text",
                               n_buckets=2, range_bits=2)
    for prefix, n in (("s", 5), ("sp", 3), ("zz", 5)):
        assert seng.suggest(prefix, n) == single.suggest(prefix, n)


def test_sharded_wildcard_and_fuzzy_match_single_index(spark, tmp_path):
    """Expansion modes across shards == single index over the union: the
    expansion set is union+global-df-capped and every shard scores under
    global statistics."""
    from searchengine_spark.query.engine import SearchEngine
    from searchengine_spark.query.sharded import ShardedEngine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    single = SearchEngine(spark, str(tmp_path / "one"))
    single.build_index_from_df(docs, id_col="doc_id", text_col="text",
                               n_buckets=2, range_bits=2)
    seng = ShardedEngine.build(spark, docs, str(tmp_path / "many"), 3,
                               id_col="doc_id", text_col="text",
                               n_buckets=2, range_bits=2)
    for pat in ("s*", "*am", "jo?n"):
        got = seng.search_wildcard(pat, k=10)
        want = single.search_wildcard(pat, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], pat
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)
    for term in ("sprak", "jion"):
        got = seng.search_fuzzy(term, k=10, max_edits=2)
        want = single.search_fuzzy(term, k=10, max_edits=2)
        assert [d for d, _ in got] == [d for d, _ in want], term
    for rx in ("s(ort|tream)|merge", "jo.n"):
        got = seng.search_regexp(rx, k=10)
        want = single.search_regexp(rx, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], rx


def test_sharded_bool_matches_single_index(spark, corpus, single, sharded):
    """Nested bool trees across shards == single index over the union:
    term leaves score under gathered global stats (5dp-rounded per node on
    both sides), filter/range/must_not resolve shard-locally because doc
    sets are shard-disjoint."""
    trees = [
        {"must": [{"term": "spark"}], "should": [{"term": "stream"}]},
        {"should": [{"term": "spark"}, {"term": "merge"}],
         "minimum_should_match": 2},
        {"must": [{"term": "stream"}],
         "must_not": [{"term": "merge"}]},
        {"must": [{"term": "spark"}],
         "filter": [{"range": {"field": "n_chars", "gte": 50}}]},
    ]
    meta_df = corpus.select("doc_id", "n_chars")
    for tree in trees:
        got = sharded.search_bool(tree, k=15, metadata=meta_df)
        want = single.search_bool(tree, k=15, metadata=meta_df)
        _assert_hits_equal(got, want)
    # an all-OOV tree returns [] without a per-shard scatter
    assert sharded.search_bool({"must": [{"term": "zzqqxx"}]}, k=5) == []


def test_sharded_snippets_match_single_index(spark, corpus, tmp_path):
    """Highlighting across shards == single positional index: snippets are
    per-doc (no corpus statistics), so the union of per-shard frames is the
    full answer."""
    single = SearchEngine(spark, str(tmp_path / "pos1"))
    single.build_index_from_df(corpus, id_col="doc_id", text_col="text",
                               n_buckets=2, range_bits=2,
                               with_positions=True)
    seng = ShardedEngine.build(spark, corpus, str(tmp_path / "posN"), 3,
                               n_buckets=2, range_bits=2,
                               with_positions=True)
    for q in ("spark stream", "merge"):
        got = sorted(map(tuple, seng.snippets(q, window=6).collect()))
        want = sorted(map(tuple, single.snippets(q, window=6).collect()))
        assert got == want and got, q


def test_alias_multi_index_search_matches_single(spark, corpus, single, tmp_path):
    """ES index alias / multi-index search: INDEPENDENT per-slice indexes
    (here split by n_chars tertile — NOT hash-routed) behind the alias are
    rank+score identical to one index over the union, because the gather
    phase is routing-agnostic. Maintenance is refused; fetch falls back to
    asking every member."""
    parts = [
        corpus.filter(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    dirs = []
    for i, part in enumerate(parts):
        d = str(tmp_path / f"member{i}")
        SearchEngine(spark, d).build_index_from_df(
            part, id_col="doc_id", text_col="text",
            n_buckets=2, range_bits=2, store_source=True,
        )
        dirs.append(d)
    al = ShardedEngine.alias(spark, dirs)
    for q in QUERIES:
        _assert_hits_equal(al.search(q, k=12), single.search(q, k=12))
    batch = al.search_batch({"a": QUERIES[0], "b": QUERIES[2]}, k=8)
    for qid, q in (("a", QUERIES[0]), ("b", QUERIES[2])):
        _assert_hits_equal(batch[qid], single.search(q, k=8))
    assert al.suggest("s", 5) == single.suggest("s", 5)
    # unrouted fetch: every member asked, ids resolve wherever they live
    ids = [r[0] for r in corpus.select("doc_id").limit(5).collect()]
    got = {r["doc_id"] for r in al.fetch(ids).collect()}
    assert got == set(ids)
    # routed maintenance refused
    with pytest.raises(ValueError, match="alias"):
        al.delete([1, 2])
    with pytest.raises(ValueError, match="alias"):
        al.append(corpus.limit(1))
    with pytest.raises(ValueError, match="alias"):
        al.update(corpus.limit(1))


def test_alias_refuses_mixed_analyzers(spark, corpus, tmp_path):
    a = str(tmp_path / "std")
    b = str(tmp_path / "code")
    SearchEngine(spark, a).build_index_from_df(
        corpus.limit(20), id_col="doc_id", text_col="text",
        n_buckets=2, range_bits=1)
    SearchEngine(spark, b).build_index_from_df(
        corpus.limit(20), id_col="doc_id", text_col="text",
        n_buckets=2, range_bits=1, analyzer="code")
    with pytest.raises(ValueError, match="analyzers"):
        ShardedEngine.alias(spark, [a, b])


def test_sharded_bool_pure_filter_tree_no_duplicates(spark, corpus, single,
                                                     sharded):
    """A tree whose matching is driven ONLY by metadata leaves (no term
    leaf constrains the base) must not report the same metadata row from
    every shard: the scatter restricts the frame to each shard's own doc
    set first. Regression: unrestricted, every shard evaluated the full
    frame and the merge returned each doc N_SHARDS times."""
    meta_df = corpus.select("doc_id", "n_chars")
    trees = [
        {"filter": [{"range": {"field": "n_chars", "gte": 0}}]},
        {"should": [{"range": {"field": "n_chars", "gte": 100}}]},
        # mixed: the range leaf alone admits docs the term leaf doesn't
        {"should": [{"term": "spark"},
                    {"range": {"field": "n_chars", "gte": 150}}]},
    ]
    n_docs = corpus.count()
    for tree in trees:
        got = sharded.search_bool(tree, k=n_docs + 50, metadata=meta_df)
        ids = [d for d, _ in got]
        assert len(ids) == len(set(ids)), tree  # no duplicates
        want = single.search_bool(tree, k=n_docs + 50, metadata=meta_df)
        _assert_hits_equal(got, want)


def test_sharded_suggest_sums_df_below_any_fixed_cutoff(spark, tmp_path):
    """dfs SUM across shards, so the true global top-1 can rank below any
    fixed per-shard fetch cutoff in EVERY shard — the gather must read the
    full per-shard prefix match set. Constructed so 'parkt' (global df 6)
    is only 3rd within each shard behind two shard-local df-5/4 terms: the
    old n·shards over-fetch returned 'parka' for n=1."""
    ids = list(range(90))
    amap = {
        r["id"]: r["s"]
        for r in spark.createDataFrame([(i,) for i in ids], "id long")
        .select("id", shard_of(F.col("id"), 2).alias("s"))
        .collect()
    }
    s0 = [i for i in ids if amap[i] == 0]
    s1 = [i for i in ids if amap[i] == 1]
    assert len(s0) >= 12 and len(s1) >= 12
    plan = [
        ("parka", s0[:5]), ("parkb", s0[5:9]), ("parkt", s0[9:12]),
        ("parkc", s1[:5]), ("parkd", s1[5:9]), ("parkt", s1[9:12]),
    ]
    rows = [(i, f"{term} uniquefiller{i}") for term, docs in plan
            for i in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seng = ShardedEngine.build(spark, df, str(tmp_path / "sg"), 2,
                               n_buckets=2, range_bits=1)
    single = SearchEngine(spark, str(tmp_path / "sg_one"))
    single.build_index_from_df(df, id_col="doc_id", text_col="text",
                               n_buckets=2, range_bits=1)
    assert seng.suggest("park", 1) == [("parkt", 6)]
    for n in (1, 2, 5):
        assert seng.suggest("park", n) == single.suggest("park", n)


def test_alias_bool_pure_filter_restricts_to_member_docs(spark, corpus,
                                                         single, tmp_path):
    """Alias members are arbitrary disjoint indexes (no routing
    expression), so the pure-filter scatter restriction semi-joins each
    member's docstats sidecar instead of hash-filtering. Same invariant
    as the routed test: no duplicates, identical to the single index."""
    dirs = []
    for i in range(3):
        part = corpus.filter(F.col("doc_id") % 3 == i)
        d = str(tmp_path / f"bm{i}")
        SearchEngine(spark, d).build_index_from_df(
            part, id_col="doc_id", text_col="text",
            n_buckets=2, range_bits=2,
        )
        dirs.append(d)
    al = ShardedEngine.alias(spark, dirs)
    meta_df = corpus.select("doc_id", "n_chars")
    n_docs = corpus.count()
    for tree in [
        {"filter": [{"range": {"field": "n_chars", "gte": 0}}]},
        {"should": [{"term": "spark"},
                    {"range": {"field": "n_chars", "gte": 150}}]},
    ]:
        got = al.search_bool(tree, k=n_docs + 50, metadata=meta_df)
        ids = [d for d, _ in got]
        assert len(ids) == len(set(ids)), tree
        want = single.search_bool(tree, k=n_docs + 50, metadata=meta_df)
        _assert_hits_equal(got, want)


def test_open_orders_shards_numerically(spark, tmp_path):
    """shard-10 sorts lexicographically before shard-2: with >=10 shards
    the opened list order must still match the hash routing or deletes/
    appends/fetches target the wrong shard."""
    import os

    from searchengine_spark.corpus import corpus_df
    from searchengine_spark.query.sharded import ShardedEngine

    base = str(tmp_path / "many")
    docs = corpus_df(spark, 120, seed=3)
    built = ShardedEngine.build(spark, docs, base, 12, n_buckets=2,
                                range_bits=1, text_col="content")
    opened = ShardedEngine.open(spark, base)
    assert [os.path.basename(s.index_dir) for s in opened.shards] == [
        f"shard-{i}" for i in range(12)
    ]
    assert built.search("merge", k=5) == opened.search("merge", k=5)
