"""Locality doc-ID assignment (corpus.locality_ids): rank packing math,
determinism across parallelism, and the compression payoff — path-ordered
ids must shrink the delta-gap payload vs random xxhash64 ids on the same
corpus while leaving scores untouched.
"""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_spark import corpus
from searchengine_spark.index.build import build_index, read_manifest
from searchengine_spark.query.engine import SearchEngine

N_FILES = 600
RANGE_BITS = 4


@pytest.fixture(scope="module")
def code_df(spark):
    return corpus.corpus_df(spark, N_FILES, seed=11)


def test_ids_unique_dense_and_range_balanced(spark, code_df):
    out = corpus.locality_ids(code_df, range_bits=RANGE_BITS).toPandas()
    assert len(out) == N_FILES
    u = out["doc_id"].values.astype("int64").view("uint64")
    assert len(set(u)) == N_FILES
    ranges = u >> np.uint64(64 - RANGE_BITS)
    counts = np.bincount(ranges.astype(int), minlength=1 << RANGE_BITS)
    cap = -(-N_FILES // (1 << RANGE_BITS))
    assert counts.max() <= cap and counts[counts > 0].min() >= 1
    # path order preserved inside each range: sort by id == sort by key
    out["u"] = u
    by_id = out.sort_values("u")[["repo", "path", "commit"]].values.tolist()
    by_key = out.sort_values(["repo", "path", "commit"])[
        ["repo", "path", "commit"]
    ].values.tolist()
    assert by_id == by_key  # packing is order-preserving globally


def test_deterministic_across_parallelism(spark, code_df):
    a = corpus.locality_ids(code_df, range_bits=RANGE_BITS, n_partitions=2)
    b = corpus.locality_ids(code_df, range_bits=RANGE_BITS, n_partitions=13)
    pa = a.select("repo", "path", "commit", "doc_id").toPandas()
    pb = b.select("repo", "path", "commit", "doc_id").toPandas()
    m = pa.merge(pb, on=["repo", "path", "commit"])
    assert len(m) == N_FILES
    assert (m["doc_id_x"] == m["doc_id_y"]).all()


def _seg_bytes(idx_dir: str) -> int:
    return sum(
        r["bytes"] for r in read_manifest(idx_dir) if r["kind"] == "segment"
    )


def test_locality_ids_shrink_index_and_preserve_scores(spark, code_df, tmp_path):
    hash_dir, loc_dir = str(tmp_path / "hash"), str(tmp_path / "loc")
    loc_df = corpus.locality_ids(code_df, range_bits=RANGE_BITS)
    build_index(spark, code_df, hash_dir, id_col="doc_id", text_col="content",
                range_bits=RANGE_BITS, n_buckets=4, fresh=True)
    build_index(spark, loc_df, loc_dir, id_col="doc_id", text_col="content",
                range_bits=RANGE_BITS, n_buckets=4, fresh=True)
    b_hash, b_loc = _seg_bytes(hash_dir), _seg_bytes(loc_dir)
    # tf/dl streams are identical; the doc-gap stream collapses from ~9-byte
    # random u64 gaps to 1-2-byte consecutive-rank gaps.
    assert b_loc < b_hash * 0.85, f"locality {b_loc} vs hash {b_hash}"

    # same corpus, same stats -> same scores; only the ids differ.
    key_of_hash = {
        r["doc_id"]: (r["repo"], r["path"]) for r in code_df.select(
            "doc_id", "repo", "path").collect()
    }
    key_of_loc = {
        r["doc_id"]: (r["repo"], r["path"]) for r in loc_df.select(
            "doc_id", "repo", "path").collect()
    }
    e_hash, e_loc = SearchEngine(spark, hash_dir), SearchEngine(spark, loc_dir)
    for q in ["index merge buffer", "def import return", "query score rank"]:
        rh = e_hash.search(q, k=12)  # [(doc_id, score)]
        rl = e_loc.search(q, k=12)
        assert [round(s, 6) for _, s in rh] == [round(s, 6) for _, s in rl]
        assert {key_of_hash[d] for d, _ in rh} == {key_of_loc[d] for d, _ in rl}
