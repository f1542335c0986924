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


def test_encode_terms_blocks_matches_per_term():
    """The vectorized multi-term kernel must be BYTE-identical to the
    per-term reference encoder, including single-doc terms, block-boundary
    terms, and the cross-term delta exclusions."""
    import numpy as np

    from searchengine_spark.index.codec import encode_blocks, encode_terms_blocks

    rng = np.random.default_rng(7)
    k1, b, avgdl, bs = 1.5, 0.75, 37.5, 8
    docs_l, tfs_l, dls_l, starts, ends = [], [], [], [], []
    pos = 0
    for n in [1, 7, 8, 9, 23, 2, 40]:  # straddle block boundaries
        d = np.sort(rng.choice(np.arange(1, 10_000, dtype=np.uint64), n, replace=False))
        docs_l.append(d)
        tfs_l.append(rng.integers(1, 50, n).astype(np.uint64))
        dls_l.append(rng.integers(10, 500, n).astype(np.uint64))
        starts.append(pos)
        pos += n
        ends.append(pos)
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l)
    dls = np.concatenate(dls_l)

    got = encode_terms_blocks(
        docs, tfs, dls, np.array(starts), np.array(ends), k1, b, avgdl, bs
    )
    gi = 0
    for ti, (s, e) in enumerate(zip(starts, ends)):
        expected = encode_blocks(docs[s:e], tfs[s:e], dls[s:e], k1, b, avgdl, bs)
        for bi, blk in enumerate(expected):
            assert got["term_idx"][gi] == ti
            assert got["block_id"][gi] == bi
            assert int(got["n_docs"][gi]) == blk["n_docs"]
            assert int(got["first_doc"][gi]) == blk["first_doc"]
            assert int(got["last_doc"][gi]) == blk["last_doc"]
            assert float(got["max_u"][gi]) == blk["max_u"]
            assert got["doc_bytes"][gi] == blk["doc_bytes"]
            assert got["tf_bytes"][gi] == blk["tf_bytes"]
            assert got["dl_bytes"][gi] == blk["dl_bytes"]
            gi += 1
    assert gi == len(got["block_id"])
