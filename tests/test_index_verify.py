"""Index integrity checker (index/verify.py): a pristine build passes all
tiers including the deep block decode + df crosscheck; targeted corruptions
of each artifact (meta counts, dictionary df, segment payload bytes,
missing directory) are detected; epoch layouts skip the df crosscheck
honestly instead of failing it."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from searchengine_spark.corpus import corpus_df
from searchengine_spark.index.build import build_index
from searchengine_spark.index.verify import verify_index


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vfy") / "idx")
    corpus = corpus_df(spark, 220, seed=5)
    build_index(spark, corpus, p, id_col="doc_id", text_col="content",
                range_bits=2, n_buckets=4, fresh=True)
    return p


def _copy(idx, tmp_path, name):
    dst = str(tmp_path / name)
    shutil.copytree(idx, dst)
    return dst


def test_clean_index_passes_deep(spark, idx):
    report = verify_index(spark, idx, deep=True)
    assert report["ok"], report
    assert report["checks"]["blocks_decoded"] > 0
    assert report["checks"]["df_crosscheck"] == "0 mismatched terms"
    for c in ("bad_ndocs", "bad_bounds", "bad_maxtf", "bad_order"):
        assert report["checks"][c] == 0


def test_meta_count_drift_detected(spark, idx, tmp_path):
    bad = _copy(idx, tmp_path, "drift")
    mp = os.path.join(bad, "meta.json")
    meta = json.load(open(mp))
    meta["n_docs"] += 7
    json.dump(meta, open(mp, "w"))
    report = verify_index(spark, bad)
    assert not report["ok"]
    assert any("n_docs" in e for e in report["errors"])


def test_missing_dictionary_detected(spark, idx, tmp_path):
    bad = _copy(idx, tmp_path, "nodict")
    shutil.rmtree(os.path.join(bad, "dictionary"))
    report = verify_index(spark, bad)
    assert not report["ok"]
    assert any("dictionary directory missing" in e for e in report["errors"])


def test_dictionary_df_corruption_detected(spark, idx, tmp_path):
    """Rewrite the dictionary with one term's df bumped — only the DEEP
    df crosscheck (segments re-aggregation) can see it."""
    bad = _copy(idx, tmp_path, "baddf")
    ddir = os.path.join(bad, "dictionary")
    # materialize rows BEFORE touching the dir: caching the same path would
    # alias verify's fresh read (Spark cache matches by logical plan) and
    # hide the on-disk change
    rows = spark.read.parquet(ddir).collect()
    dct = spark.createDataFrame(rows)
    first_term = min(r["term"] for r in rows)
    fixed = dct.withColumn(
        "df",
        F.when(F.col("term") == first_term, F.col("df") + 1).otherwise(
            F.col("df")
        ),
    )
    tmp_out = str(tmp_path / "dict_rewrite")
    fixed.write.mode("overwrite").parquet(tmp_out)
    shutil.rmtree(ddir)
    shutil.move(tmp_out, ddir)
    assert verify_index(spark, bad)["ok"]  # shallow tiers can't see it
    report = verify_index(spark, bad, deep=True)
    assert not report["ok"]
    assert any("df != dictionary df" in e for e in report["errors"])


def test_segment_payload_corruption_detected(spark, idx, tmp_path):
    """Truncate tf_bytes in one block — deep decode flags the invariant
    (decoded max_tf no longer matches the stored header or varbyte dies)."""
    bad = _copy(idx, tmp_path, "badseg")
    sdir = os.path.join(bad, "segments")
    rows = spark.read.parquet(sdir).collect()  # no cache: see df test note
    seg = spark.createDataFrame(rows, spark.read.parquet(sdir).schema)
    victim = seg.orderBy("term", "bucket", "block_id").first()
    patched = seg.withColumn(
        "max_tf",
        F.when(
            (F.col("term") == victim["term"])
            & (F.col("bucket") == victim["bucket"])
            & (F.col("block_id") == victim["block_id"]),
            F.col("max_tf") + 5,
        ).otherwise(F.col("max_tf")),
    )
    tmp_out = str(tmp_path / "seg_rewrite")
    patched.write.mode("overwrite").partitionBy("bucket").parquet(tmp_out)
    shutil.rmtree(sdir)
    shutil.move(tmp_out, sdir)
    report = verify_index(spark, bad, deep=True)
    assert not report["ok"]
    assert any("bad_maxtf" in e for e in report["errors"])


def test_epoch_layout_skips_df_crosscheck(spark, idx, tmp_path):
    """A tombstoned index must not FAIL the df crosscheck (df drifts by
    design until compaction) — it reports the check as skipped."""
    bad = _copy(idx, tmp_path, "tomb")
    os.makedirs(os.path.join(bad, "tombstones"), exist_ok=True)
    report = verify_index(spark, bad, deep=True)
    assert report["ok"], report
    assert "skipped" in report["checks"]["df_crosscheck"]


def test_cli_verify(idx, tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "searchengine_spark.cli", "verify",
         "--index", idx],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["ok"]


def test_streamed_index_verifies_clean(spark, tmp_path):
    """Epoch layouts never write docstats — verification must report ok
    (stats live in meta), not a false 'directory missing' corruption."""
    from searchengine_spark.index.verify import verify_index
    from searchengine_spark.streaming.ingest import append_docs

    idx = str(tmp_path / "sidx")
    docs = spark.createDataFrame(
        [(i, f"spark stream number {i}") for i in range(30)],
        "doc_id long, text string",
    )
    append_docs(docs, idx, n_buckets=2, range_bits=1)
    rep = verify_index(spark, idx, deep=True)
    assert rep["ok"], rep
    assert "epoch layout" in str(rep["checks"].get("docstats", ""))
