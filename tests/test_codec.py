from __future__ import annotations

import random

import numpy as np

from searchengine_spark.index.codec import (
    bm25_u,
    decode_block,
    encode_blocks,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_edges():
    for arr in [
        [],
        [0],
        [127],
        [128],
        [1, 2, 3],
        [2**63, 2**64 - 1, 0, 1],
        [300, 16384, 2097152],
    ]:
        a = np.array(arr, dtype=np.uint64)
        assert list(varbyte_decode(varbyte_encode(a))) == arr


def test_varbyte_roundtrip_property():
    rng = random.Random(42)
    for _ in range(50):
        n = rng.randint(1, 500)
        vals = [rng.randint(0, 2**rng.randint(1, 64) - 1) for _ in range(n)]
        a = np.array(vals, dtype=np.uint64)
        got = varbyte_decode(varbyte_encode(a))
        assert got.tolist() == vals


def test_encode_decode_blocks_roundtrip():
    rng = np.random.default_rng(7)
    n = 1000
    docs = np.unique(rng.integers(0, 2**63, n * 2, dtype=np.uint64))[:n]
    tfs = rng.integers(1, 50, n).astype(np.uint64)
    dls = rng.integers(10, 500, n).astype(np.uint64)
    k1, b, avgdl = 1.5, 0.75, 123.4
    blocks = encode_blocks(docs, tfs, dls, k1, b, avgdl, block_size=128)
    assert len(blocks) == (n + 127) // 128
    got_docs, got_tfs, got_dls = [], [], []
    for blk in blocks:
        d, t, dl = decode_block(blk["first_doc"], blk["n_docs"], blk["doc_bytes"], blk["tf_bytes"], blk["dl_bytes"])
        got_docs.append(d)
        got_tfs.append(t)
        got_dls.append(dl)
        u = bm25_u(t, dl, k1, b, avgdl)
        assert abs(blk["max_u"] - u.max()) < 1e-12
        assert blk["last_doc"] == int(d[-1].view(np.int64))
    assert np.concatenate(got_docs).tolist() == docs.tolist()
    assert np.concatenate(got_tfs).tolist() == tfs.tolist()
    assert np.concatenate(got_dls).tolist() == dls.tolist()


def test_max_u_bounds_scores():
    tf = np.array([1, 3, 10], dtype=np.uint64)
    dl = np.array([10, 20, 400], dtype=np.uint64)
    u = bm25_u(tf, dl, 1.5, 0.75, 100.0)
    assert (u <= 1.5 + 1.0 + 1e-12).all()
    assert u.max() == max(u)
