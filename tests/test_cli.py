"""CLI surface (spark-submit entry): package / build / search in-process."""

from __future__ import annotations

import json
import os
import zipfile

import pytest

from searchengine_spark import cli


def test_package_zip(tmp_path, capsys):
    out = str(tmp_path / "dist" / "pkg.zip")
    cli.main(["package", "--out", out])
    assert os.path.exists(out)
    names = zipfile.ZipFile(out).namelist()
    assert "searchengine_spark/cli.py" in names
    assert "searchengine_spark/index/build.py" in names
    assert json.loads(capsys.readouterr().out)["packaged"] == out


def test_build_then_search(tmp_path, capsys, spark):
    idx = str(tmp_path / "idx")
    cli.main(
        [
            "build", "--synthetic", "150", "--index", idx,
            "--buckets", "4", "--range-bits", "2", "--fresh",
        ]
    )
    built = json.loads(capsys.readouterr().out)
    assert built["n_docs"] == 150 and built["docs_per_sec"] > 0

    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "5"])
    res = json.loads(capsys.readouterr().out)
    assert res["hits"] and len(res["hits"]) <= 5
    scores = [h["score"] for h in res["hits"]]
    assert scores == sorted(scores, reverse=True)

    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "5", "--mode", "and"])
    res_and = json.loads(capsys.readouterr().out)
    and_scores = [h["score"] for h in res_and["hits"]]
    assert and_scores == sorted(and_scores, reverse=True)


def test_eval_harness(tmp_path, capsys, spark):
    """§3.3 harness parity: build → query file → qrels join → MAP/P@k/recall."""
    idx = str(tmp_path / "eidx")
    cli.main(["build", "--synthetic", "120", "--index", idx,
              "--buckets", "4", "--range-bits", "2", "--fresh"])
    capsys.readouterr()

    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "3"])
    top = json.loads(capsys.readouterr().out)["hits"]
    assert top

    qtsv = tmp_path / "queries.tsv"
    qtsv.write_text(
        "query_id\tinformation_need\tkeywords\n"
        "1\tfind index merge docs\tindex merge\n"
        "2\tfind posting block docs\tposting block\n"
    )
    qcsv = tmp_path / "qrels.csv"
    qcsv.write_text(
        "query,doc_id,y_true\n"
        + f"1,{top[0]['doc_id']},1\n"
        + f"1,{top[1]['doc_id']},0\n"
        + "2,999999999,1\n"  # relevant doc never retrieved → recall < 1 for q2
    )
    cli.main(["eval", "--index", idx, "--queries", str(qtsv), "--qrels", str(qcsv), "-k", "20"])
    out = json.loads(capsys.readouterr().out)
    assert out["n_queries"] == 2
    assert 0.0 < out["map"] <= 1.0
    for key in ("p_at_5", "p_at_10", "p_at_50", "recall"):
        assert out[key] is None or 0.0 <= out[key] <= 1.0


def test_lifecycle_delete_compact(tmp_path, capsys, spark):
    """Index lifecycle via CLI: append (creates) -> delete -> compact; the
    deleted doc is gone from queries immediately and physically after
    compaction, with stats rebuilt exactly."""
    from searchengine_spark.corpus import corpus_df

    docs = corpus_df(spark, 80)
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    idx = str(tmp_path / "lidx")

    cli.main(["append", "--input", src, "--index", idx,
              "--id-col", "doc_id", "--text-col", "content",
              "--buckets", "4", "--range-bits", "2"])
    appended = json.loads(capsys.readouterr().out)
    assert appended["epoch"] == 0 and appended["n_docs"] == 80

    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "3"])
    top = json.loads(capsys.readouterr().out)["hits"]
    assert top
    victim = top[0]["doc_id"]

    cli.main(["delete", "--index", idx, "--ids", str(victim)])
    assert json.loads(capsys.readouterr().out)["n_docs"] == 1

    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "3"])
    after = json.loads(capsys.readouterr().out)["hits"]
    assert victim not in [h["doc_id"] for h in after]

    cli.main(["compact", "--index", idx])
    compacted = json.loads(capsys.readouterr().out)
    assert compacted["n_docs"] == 79

    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "3"])
    post = json.loads(capsys.readouterr().out)["hits"]
    assert victim not in [h["doc_id"] for h in post]


def test_stats_command(tmp_path, capsys, spark):
    idx = str(tmp_path / "sidx")
    cli.main(
        [
            "build", "--synthetic", "120", "--index", idx,
            "--buckets", "4", "--range-bits", "2", "--fresh",
        ]
    )
    capsys.readouterr()
    cli.main(["stats", "--index", idx])
    st = json.loads(capsys.readouterr().out)
    assert st["n_docs"] == 120 and st["n_terms"] > 0
    assert st["n_segments"] == 4 and st["size_bytes"] > 0
    assert st["n_deleted"] == 0 and not st["has_positions"]


def test_sample_and_decontaminate_commands(tmp_path, capsys, spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    bench = str(tmp_path / "bench.parquet")
    docs.filter("doc_id % 31 = 0").write.parquet(bench)

    out = str(tmp_path / "sampled.parquet")
    cli.main(["sample", "--input", src, "--output", out, "--rate", "0.3"])
    res = json.loads(capsys.readouterr().out)
    n_total = docs.count()
    assert 0 < res["n_rows"] < n_total

    out2 = str(tmp_path / "strat.parquet")
    cli.main(
        ["sample", "--input", src, "--output", out2,
         "--rates", "en=1.0,de=0.5", "--by", "lang"]
    )
    res2 = json.loads(capsys.readouterr().out)
    got = spark.read.parquet(out2)
    langs = {r[0] for r in got.select("lang").distinct().collect()}
    assert langs == {"en", "de"} and res2["n_rows"] == got.count()

    cli.main(["decontaminate", "--input", src, "--bench", bench, "--ngram", "5"])
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_flagged_docs"] >= docs.filter("doc_id % 31 = 0").count()

    clean = str(tmp_path / "clean.parquet")
    cli.main(
        ["decontaminate", "--input", src, "--bench", bench,
         "--ngram", "5", "--output", clean]
    )
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["n_kept"] == n_total - rep["n_flagged_docs"]


def test_sample_temperature(tmp_path, capsys, spark):
    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "temp.parquet")
    cli.main(["sample", "--input", src, "--output", out,
              "--by", "lang", "--temperature", "0.3", "--total", "200"])
    rep = json.loads(capsys.readouterr().out)
    docs = spark.read.parquet(src)
    counts = {r["lang"]: r["count"]
              for r in docs.groupBy("lang").count().collect()}
    hi = max(counts, key=counts.get)
    lo = min(counts, key=counts.get)
    # flattening: the dominant stratum is sampled at the LOWEST rate
    assert rep["rates"][hi] == min(rep["rates"].values())
    assert rep["rates"][lo] > rep["rates"][hi]
    assert 100 < rep["n_rows"] < 320  # Bernoulli slack around 200
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        cli.main(["sample", "--input", src, "--output", out,
                  "--by", "lang", "--temperature", "0.3"])


def test_codestats_command(tmp_path, capsys, spark):
    from searchengine_spark.corpus import corpus_df

    src = str(tmp_path / "code.parquet")
    corpus_df(spark, 40, seed=9).selectExpr(
        "doc_id", "content AS text"
    ).write.parquet(src)

    cli.main(["codestats", "--input", src])
    rep = json.loads(capsys.readouterr().out)
    # every synthetic file carries the apache license boilerplate line
    assert rep["n_docs"] == 40
    assert rep["by_license"] == {"apache-2.0": 40}
    assert rep["n_permissive"] == 40

    out = str(tmp_path / "kept.parquet")
    cli.main(["codestats", "--input", src, "--output", out,
              "--filter", "--permissive-only"])
    rep2 = json.loads(capsys.readouterr().out)
    got = spark.read.parquet(out)
    assert got.count() == rep2["n_keep_quality"] > 0
    cols = set(got.columns)
    assert {"doc_id", "keep", "license", "permissive"} <= cols


def test_build_with_code_analyzer(tmp_path, capsys, spark):
    src = str(tmp_path / "code.parquet")
    spark.createDataFrame(
        [(1, "def parseQueryString(raw): pass"),
         (2, "class HTTPServerConnection: pass"),
         (3, "plain words only")],
        "doc_id long, text string",
    ).write.parquet(src)
    idx = str(tmp_path / "cidx")
    cli.main(["build", "--input", src, "--index", idx, "--id-col", "doc_id",
              "--text-col", "text", "--buckets", "2", "--range-bits", "1",
              "--analyzer", "code"])
    capsys.readouterr()
    # camelCase query analyzed under the pinned analyzer → matches doc 1
    cli.main(["search", "--index", idx, "--query", "parseQueryString", "-k", "3"])
    hits = json.loads(capsys.readouterr().out)["hits"]
    assert hits and hits[0]["doc_id"] == 1
    cli.main(["stats", "--index", idx])
    assert json.loads(capsys.readouterr().out)["n_docs"] == 3


def test_build_store_source_and_fetch(tmp_path, capsys):
    idx = str(tmp_path / "fidx")
    cli.main(["build", "--synthetic", "120", "--index", idx,
              "--buckets", "2", "--range-bits", "2", "--store-source"])
    capsys.readouterr()
    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "3",
              "--fetch"])
    res = json.loads(capsys.readouterr().out)
    assert res["hits"]
    for h in res["hits"]:
        assert "content" in h and "repo" in h  # stored source attached


def test_update_by_query_command(tmp_path, capsys, spark):
    """CLI _update_by_query: regexp-replace the text of every matching doc
    in place; the rewritten term becomes searchable, the old one is gone
    from the updated docs."""
    from pyspark.sql import functions as F

    from searchengine_spark.corpus import corpus_df

    docs = corpus_df(spark, 60).select(
        "doc_id", F.col("content").alias("text")
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    idx = str(tmp_path / "uidx")

    cli.main(["append", "--input", src, "--index", idx,
              "--id-col", "doc_id", "--text-col", "text",
              "--buckets", "4", "--range-bits", "2"])
    capsys.readouterr()

    cli.main(["search", "--index", idx, "--query", "merge", "-k", "60"])
    before = {h["doc_id"] for h in json.loads(capsys.readouterr().out)["hits"]}
    assert before

    cli.main(["update-by-query", "--index", idx, "--query", "merge",
              "--replace", "merge=>quackle", "--input", src])
    assert json.loads(capsys.readouterr().out)["n_docs"] == len(before)

    cli.main(["search", "--index", idx, "--query", "quackle", "-k", "60"])
    after = {h["doc_id"] for h in json.loads(capsys.readouterr().out)["hits"]}
    assert after == before

    cli.main(["search", "--index", idx, "--query", "merge", "-k", "60"])
    residual = {h["doc_id"] for h in json.loads(capsys.readouterr().out)["hits"]}
    assert not (residual & before)


def test_build_locality_order(tmp_path, capsys):
    idx = str(tmp_path / "lidx")
    cli.main(["build", "--synthetic", "120", "--index", idx,
              "--buckets", "2", "--range-bits", "2",
              "--locality-order", "repo,path,commit"])
    built = json.loads(capsys.readouterr().out)
    assert built["n_docs"] == 120
    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "3"])
    res = json.loads(capsys.readouterr().out)
    assert res["hits"]


def test_build_impact_order(tmp_path, capsys):
    """--impact-order reassigns ids by static impact (strided packing) and
    the index stays searchable with identical hit CONTENT: search results
    map to the same synthetic rows as a plain hash-id build."""
    idx = str(tmp_path / "iidx")
    cli.main(["build", "--synthetic", "120", "--index", idx,
              "--buckets", "2", "--range-bits", "2",
              "--impact-order", "length(content):asc"])
    built = json.loads(capsys.readouterr().out)
    assert built["n_docs"] == 120
    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "3"])
    res = json.loads(capsys.readouterr().out)
    assert res["hits"]
    # strided packing: some hit must live outside range 0 once k covers
    # several ranges (ids are dense per range, high bits = range)
    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "50"])
    res = json.loads(capsys.readouterr().out)
    ranges = {(h["doc_id"] >> 62) & 3 for h in res["hits"]}
    assert len(ranges) > 1


def test_build_impact_order_rejects_bad_spec(tmp_path, capsys):
    with pytest.raises(SystemExit):
        cli.main(["build", "--synthetic", "10", "--index",
                  str(tmp_path / "x"), "--impact-order", "n:sideways"])
    with pytest.raises(SystemExit):
        cli.main(["build", "--synthetic", "10", "--index",
                  str(tmp_path / "y"), "--impact-order", "a",
                  "--locality-order", "repo"])


def test_sharded_bool_mode(tmp_path, capsys):
    """--sharded --mode bool: scatter-gather bool trees from the CLI match
    the single-index bool mode over the same corpus."""
    one = str(tmp_path / "bone")
    many = str(tmp_path / "bmany")
    cli.main(["build", "--synthetic", "150", "--index", one,
              "--buckets", "2", "--range-bits", "2"])
    cli.main(["build", "--synthetic", "150", "--index", many,
              "--buckets", "2", "--range-bits", "2", "--shards", "3"])
    capsys.readouterr()
    tree = json.dumps({"must": [{"term": "index"}],
                       "should": [{"term": "merge"}]})
    cli.main(["search", "--index", one, "--query", tree,
              "-k", "8", "--mode", "bool"])
    want = json.loads(capsys.readouterr().out)["hits"]
    cli.main(["search", "--index", many, "--query", tree,
              "-k", "8", "--mode", "bool", "--sharded"])
    got = json.loads(capsys.readouterr().out)["hits"]
    assert [h["doc_id"] for h in got] == [h["doc_id"] for h in want]
    assert [h["score"] for h in got] == [h["score"] for h in want]
    assert got


def test_alias_search(tmp_path, capsys):
    """--alias: comma-separated independent index dirs (disjoint id spaces
    — synthetic xxhash ids vs testdata sequential ids) behind one query."""
    a, b = str(tmp_path / "ia"), str(tmp_path / "ib")
    cli.main(["build", "--synthetic", "60", "--index", a,
              "--buckets", "2", "--range-bits", "1"])
    cli.main(["build", "--input", "/root/testdata/sf0.001/documents.parquet",
              "--id-col", "doc_id", "--text-col", "text", "--index", b,
              "--buckets", "2", "--range-bits", "1"])
    capsys.readouterr()
    cli.main(["search", "--index", f"{a},{b}", "--query", "index merge",
              "-k", "8", "--alias"])
    res = json.loads(capsys.readouterr().out)
    assert res["hits"] and res["shards"] == 2


def test_reindex_command(tmp_path, capsys):
    src = str(tmp_path / "rsrc")
    cli.main(["build", "--synthetic", "80", "--index", src,
              "--buckets", "2", "--range-bits", "1", "--store-source"])
    capsys.readouterr()
    cli.main(["reindex", "--from", src, "--to", str(tmp_path / "rdst"),
              "--analyzer", "code", "--positions"])
    out = json.loads(capsys.readouterr().out)
    assert out["n_docs"] == 80
    assert out["analyzer"] == "code" and out["has_positions"]
    cli.main(["search", "--index", str(tmp_path / "rdst"),
              "--query", "index merge", "-k", "3"])
    res = json.loads(capsys.readouterr().out)
    assert res["hits"]
    cli.main(["stats", "--index", str(tmp_path / "rdst")])
    st = json.loads(capsys.readouterr().out)
    assert st["analyzer"] == "code" and st["has_positions"] and st["has_source"]


def test_prepare_command(tmp_path, capsys, spark):
    src = str(tmp_path / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    out = str(tmp_path / "prepared")
    cli.main(["prepare", "--input", src, "--output", out,
              "--langs", "en,de,es", "--min-quality", "2.5",
              "--line-chunk", "12", "--ngram", "3", "--tau", "0.2",
              "--rates", "en=0.5,de=0.9", "--seed", "7"])
    res = json.loads(capsys.readouterr().out)
    assert res["n_in"] == 500 and 0 < res["n_out"] < 500
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "lang", "text"}
    assert got.count() == res["n_out"]


def test_split_command(tmp_path, capsys, spark):
    out = str(tmp_path / "split")
    cli.main(
        [
            "split", "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out, "--by", "source",
            "--fractions", "train=0.8,valid=0.1,test=0.1",
        ]
    )
    res = json.loads(capsys.readouterr().out)
    assert sum(res["counts"].values()) == 500
    # leakage-safe: re-reading, every source maps to exactly one split
    from pyspark.sql import functions as F

    df = spark.read.parquet(out)
    assert (
        df.groupBy("source").agg(F.countDistinct("split").alias("n"))
        .agg(F.max("n")).collect()[0][0] == 1
    )


def test_bpe_train_command(tmp_path, capsys, spark):
    out = str(tmp_path / "bpe")
    cli.main(
        [
            "bpe-train", "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out, "--merges", "6",
        ]
    )
    res = json.loads(capsys.readouterr().out)
    assert res["n_merges"] == 6 and res["n_vocab"] > 0
    merges = spark.read.parquet(f"{out}/merges")
    assert merges.count() == 6
    assert set(merges.columns) == {"rank", "lhs", "rhs", "pair_count"}


def test_bpe_encode_command(tmp_path, capsys, spark):
    src = "/root/testdata/sf0.001/documents.parquet"
    bdir = str(tmp_path / "bpe")
    cli.main(["bpe-train", "--input", src, "--output", bdir, "--merges", "8"])
    trained = json.loads(capsys.readouterr().out)
    assert trained["n_merges"] == 8

    out = str(tmp_path / "enc.parquet")
    cli.main(["bpe-encode", "--input", src, "--bpe", bdir, "--output", out])
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_docs"] == 500 and rep["n_merges"] == 8
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "pos", "piece"}
    assert rep["n_pieces"] == got.count() > 0
    # round-trip: concatenating a doc's pieces in pos order reproduces its
    # tokenized text (BPE segments, never alters, the token stream)
    from pyspark.sql import functions as F

    from searchengine_spark.tokenizer import tokenize_py

    doc = spark.read.parquet(src).filter("doc_id = 7").collect()[0]
    pieces = [
        r["piece"]
        for r in got.filter("doc_id = 7").orderBy("pos").collect()
    ]
    toks = tokenize_py(doc["text"])
    joined = "".join(pieces)
    assert joined.replace("</w>", "") == "".join(toks)
    assert joined.count("</w>") == len(toks)  # one word-end marker per token


def test_didyoumean_command(capsys, spark):
    cli.main(
        [
            "didyoumean", "--input", "/root/testdata/sf0.001/documents.parquet",
            "--query", "sow lin", "-k", "3",
        ]
    )
    res = json.loads(capsys.readouterr().out)
    assert res["suggestions"], "expected at least one suggestion"
    scores = [s["score"] for s in res["suggestions"]]
    assert scores == sorted(scores, reverse=True)


def test_snapshot_restore_commands(tmp_path, capsys):
    idx = str(tmp_path / "idx")
    cli.main(
        [
            "build", "--synthetic", "120", "--index", idx,
            "--buckets", "4", "--range-bits", "2", "--fresh",
        ]
    )
    capsys.readouterr()
    repo = str(tmp_path / "repo")
    cli.main(["snapshot", "--index", idx, "--repo", repo, "--name", "s1"])
    info = json.loads(capsys.readouterr().out)
    assert info["n_files"] > 0
    cli.main(["snapshot", "--repo", repo, "--verify", "s1"])
    assert json.loads(capsys.readouterr().out)["ok"]
    cli.main(["snapshot", "--repo", repo, "--list"])
    assert [s["name"] for s in json.loads(capsys.readouterr().out)["snapshots"]] == ["s1"]
    tgt = str(tmp_path / "restored")
    cli.main(["restore", "--repo", repo, "--name", "s1", "--target", tgt])
    assert json.loads(capsys.readouterr().out)["restored"] == tgt
    cli.main(["search", "--index", tgt, "--query", "index merge", "-k", "3"])
    restored_hits = json.loads(capsys.readouterr().out)["hits"]
    cli.main(["search", "--index", idx, "--query", "index merge", "-k", "3"])
    original_hits = json.loads(capsys.readouterr().out)["hits"]
    assert restored_hits and restored_hits == original_hits


def test_symbols_and_refs_commands(tmp_path, capsys, spark):
    """symbols-build → defs / symbols / refs (with and without the
    trigram-candidate restriction) end-to-end."""
    src = str(tmp_path / "code.parquet")
    spark.createDataFrame(
        [
            (1, "def parse_tokens(s): pass"),
            (2, "x = parse_tokens(y); parse_tokens(z)"),
            (3, "class ParseTree: pass"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    sym = str(tmp_path / "sym")
    cli.main(["symbols-build", "--input", src, "--output", sym,
              "--buckets", "8", "--text-col", "text"])
    assert json.loads(capsys.readouterr().out)["built"] == sym

    cli.main(["defs", "--symbols", sym, "--name", "parse_tokens"])
    d = json.loads(capsys.readouterr().out)
    assert d["sites"] == [{"doc_id": 1, "kind": "function"}]

    cli.main(["symbols", "--symbols", sym, "--prefix", "Parse", "-n", "5"])
    s = json.loads(capsys.readouterr().out)
    assert [x["name"] for x in s["symbols"]] == ["ParseTree"]

    cli.main(["refs", "--input", src, "--name", "parse_tokens",
              "--text-col", "text"])
    full = json.loads(capsys.readouterr().out)
    assert full["docs"] == [
        {"doc_id": 2, "n_refs": 2, "n_defs": 0},
        {"doc_id": 1, "n_refs": 0, "n_defs": 1},
    ]

    tg = str(tmp_path / "tg")
    cli.main(["grep-build", "--input", src, "--index", tg,
              "--text-col", "text"])
    capsys.readouterr()
    cli.main(["refs", "--input", src, "--name", "parse_tokens",
              "--text-col", "text", "--grep-index", tg])
    pruned = json.loads(capsys.readouterr().out)
    assert pruned["docs"] == full["docs"]
