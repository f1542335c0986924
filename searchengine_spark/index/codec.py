"""Delta-gap + varbyte posting-block codec with per-block max-score metadata.

Numpy-vectorized throughout (north star: no per-row Python). The reference
persists postings as pickled Python lists (``Part A/utils.py:36-42``,
``Part A/indexer.py:93``); this codec is the scale-path replacement: postings
sorted by unsigned doc_id, cut into BLOCK_SIZE-doc blocks, each block storing

  * ``first_doc``   — absolute uint64 (column, not payload) → blocks are
                      independently decodable, so they can be concatenated
                      across doc-range salts and pruned individually
  * ``doc_bytes``   — varbyte(deltas of the remaining n-1 docs)
  * ``tf_bytes``    — varbyte(tf per doc)
  * ``dl_bytes``    — varbyte(doc_len per doc; denormalized into the posting
                      at build time like Part A — kills the query-time
                      doc-stats join, SURVEY.md §2.4 J3)
  * ``max_u``       — max over the block of the tf/dl-dependent BM25 factor
                      u(tf,dl) = tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl));
                      block max score = idf(term)·max_u, with idf from the
                      dictionary → block-max WAND needs no extra join.

Varbyte: little-endian 7-bit groups, MSB=1 means "more bytes follow".
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_U7 = np.uint64(7)
_MASK7 = np.uint64(0x7F)


def varbyte_encode_with_counts(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized varbyte encode of a uint64 array → (packed bytes,
    per-value byte counts). The counts let callers slice the packed stream
    at arbitrary value boundaries without re-encoding."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    mat = np.empty((n, 10), dtype=np.uint8)
    tmp = v.copy()
    for i in range(10):
        mat[:, i] = (tmp & _MASK7).astype(np.uint8)
        tmp >>= _U7
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nb += (tmp != 0)
        tmp >>= _U7
    idx = np.arange(10)
    used = idx[None, :] < nb[:, None]
    cont = idx[None, :] < (nb - 1)[:, None]
    mat = mat | (cont.astype(np.uint8) << 7)
    return mat[used].tobytes(), nb


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a uint64 array."""
    return varbyte_encode_with_counts(values)[0]


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode → uint64 array (exact, no float path)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = b < 128
    n_vals = int(is_end.sum())
    val_idx = np.zeros(len(b), dtype=np.int64)
    np.cumsum(is_end[:-1], out=val_idx[1:])
    starts = np.flatnonzero(np.concatenate(([True], is_end[:-1])))
    pos = np.arange(len(b), dtype=np.int64) - starts[val_idx]
    out = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(out, val_idx, (b & np.uint8(0x7F)).astype(np.uint64) << (pos.astype(np.uint64) * _U7))
    return out


def bm25_u(tf: np.ndarray, dl: np.ndarray, k1: float, b: float, avgdl: float) -> np.ndarray:
    """Term-independent BM25 factor; score = idf · u."""
    tf = tf.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


def encode_blocks(
    docs_u64: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Sorted-by-doc posting arrays → list of block dicts.

    Caller guarantees ``docs_u64`` strictly increasing (uint64 order).
    """
    n = len(docs_u64)
    out = []
    for start in range(0, n, block_size):
        d = docs_u64[start : start + block_size]
        t = tfs[start : start + block_size]
        dl = dls[start : start + block_size]
        deltas = np.diff(d)
        u = bm25_u(t, dl, k1, b, avgdl)
        out.append(
            {
                "n_docs": int(len(d)),
                "first_doc": int(d[0].view(np.int64)) if d.dtype == np.uint64 else int(d[0]),
                "last_doc": int(d[-1].view(np.int64)) if d.dtype == np.uint64 else int(d[-1]),
                "max_u": float(u.max()),
                "max_tf": int(t.max()),
                "min_dl": int(dl.min()),
                "doc_bytes": varbyte_encode(deltas),
                "tf_bytes": varbyte_encode(t.astype(np.uint64)),
                "dl_bytes": varbyte_encode(dl.astype(np.uint64)),
            }
        )
    return out


def encode_terms_blocks(
    docs_u64: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    term_starts: np.ndarray,
    term_ends: np.ndarray,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
    positions_flat: np.ndarray | None = None,
) -> dict:
    """Fully vectorized multi-term block encoder.

    Input: posting arrays sorted by (term, doc) — contiguous per-term slices
    [term_starts[i], term_ends[i]) with term_ends[i] == term_starts[i+1],
    anchored at 0 and covering the whole array (term_starts[0] == 0 and
    term_ends[-1] == len) — the tf/dl byte-offset math encodes the full
    streams, so an unanchored slice would silently misalign payloads.
    Output: dict of per-block columns (term_idx, block_id, n_docs, first_doc,
    last_doc, max_u, doc_bytes, tf_bytes, dl_bytes) — byte-identical to
    calling ``encode_blocks`` per term (property-tested), but with every loop
    replaced by numpy except the final per-block byte-slicing. This is the
    stage-C hot kernel: per-block work is two memoryview slices, not a pandas
    group round-trip.
    """
    n = len(docs_u64)
    if len(term_starts) and (
        int(term_starts[0]) != 0 or int(term_ends[-1]) != n
    ):
        raise ValueError(
            "term slices must anchor at 0 and cover the posting arrays "
            f"(got starts[0]={int(term_starts[0])}, ends[-1]="
            f"{int(term_ends[-1])}, n={n})"
        )
    lens = (term_ends - term_starts).astype(np.int64)
    nb_blocks = (lens + block_size - 1) // block_size
    total = int(nb_blocks.sum())
    term_of_block = np.repeat(np.arange(len(lens)), nb_blocks)
    block_id = np.arange(total) - np.repeat(np.cumsum(nb_blocks) - nb_blocks, nb_blocks)
    bstart = term_starts[term_of_block] + block_id * block_size
    bend = np.minimum(bstart + block_size, term_ends[term_of_block])

    u = bm25_u(tfs, dls, k1, b, avgdl)
    max_u = np.maximum.reduceat(u, bstart) if total else np.zeros(0)
    # avgdl-independent bound ingredients: u is ↑ in tf and ↓ in dl, so
    # u(max_tf, min_dl, any_avgdl) ≥ max block u under that avgdl — this is
    # what keeps block-max pruning SAFE when epochs encoded under different
    # running avgdl are queried together (streaming/ingest.py)
    max_tf = np.maximum.reduceat(tfs, bstart).astype(np.int64) if total else np.zeros(0, np.int64)
    min_dl = np.minimum.reduceat(dls, bstart).astype(np.int64) if total else np.zeros(0, np.int64)

    signed = docs_u64.view(np.int64)
    first_doc = signed[bstart]
    last_doc = signed[bend - 1]
    n_docs = (bend - bstart).astype(np.int32)

    # deltas: d[i] = docs[i+1] - docs[i]; block rows [s, e) need d[s .. e-2]
    # (block-first docs are carried in first_doc, not the payload)
    d_all = np.diff(docs_u64) if n > 1 else np.zeros(0, dtype=np.uint64)
    keep = np.ones(max(n - 1, 0), dtype=bool)
    keep[bend[:-1] - 1] = False  # drop the cross-block/cross-term gaps
    if total and bend[-1] - 1 < len(keep):
        keep[bend[-1] - 1] = False
    deltas = d_all[keep]

    doc_buf, doc_nb = varbyte_encode_with_counts(deltas)
    tf_buf, tf_nb = varbyte_encode_with_counts(tfs.astype(np.uint64))
    dl_buf, dl_nb = varbyte_encode_with_counts(dls.astype(np.uint64))

    # byte offsets per block for each stream
    def offsets(nb_per_value: np.ndarray, counts_per_block: np.ndarray) -> np.ndarray:
        ends_vals = np.cumsum(counts_per_block)
        starts_vals = ends_vals - counts_per_block
        cum = np.concatenate(([0], np.cumsum(nb_per_value)))
        return cum[starts_vals], cum[ends_vals]

    dv_counts = (n_docs.astype(np.int64) - 1)
    doc_s, doc_e = offsets(doc_nb, dv_counts)
    tf_s, tf_e = offsets(tf_nb, n_docs.astype(np.int64))
    dl_s, dl_e = offsets(dl_nb, n_docs.astype(np.int64))

    mv_doc, mv_tf, mv_dl = memoryview(doc_buf), memoryview(tf_buf), memoryview(dl_buf)
    doc_bytes = [bytes(mv_doc[s:e]) for s, e in zip(doc_s, doc_e)]
    tf_bytes = [bytes(mv_tf[s:e]) for s, e in zip(tf_s, tf_e)]
    dl_bytes = [bytes(mv_dl[s:e]) for s, e in zip(dl_s, dl_e)]

    pos_bytes = None
    if positions_flat is not None:
        # positional stream: per posting row, tf position values (indices in
        # the filtered token stream), delta-gapped WITHIN the row, first one
        # absolute. Row boundaries are implicit — they are the tf values the
        # tf stream already carries, so decode needs no extra metadata.
        cumtf = np.concatenate(([0], np.cumsum(tfs, dtype=np.int64)))
        pf = np.ascontiguousarray(positions_flat, dtype=np.uint64)
        pd_ = pf.copy()
        if len(pf) > 1:
            pd_[1:] = pf[1:] - pf[:-1]  # wraps across rows; overwritten below
        row_starts = cumtf[:-1]
        pd_[row_starts] = pf[row_starts]
        pos_buf, pos_nb = varbyte_encode_with_counts(pd_)
        cumnb = np.concatenate(([0], np.cumsum(pos_nb)))
        ps = cumnb[cumtf[bstart]]
        pe = cumnb[cumtf[bend]]
        mv_pos = memoryview(pos_buf)
        pos_bytes = [bytes(mv_pos[s:e]) for s, e in zip(ps, pe)]

    return {
        "term_idx": term_of_block,
        "block_id": block_id.astype(np.int32),
        "n_docs": n_docs,
        "first_doc": first_doc,
        "last_doc": last_doc,
        "max_u": max_u.astype(np.float64),
        "max_tf": max_tf,
        "min_dl": min_dl,
        "doc_bytes": doc_bytes,
        "tf_bytes": tf_bytes,
        "dl_bytes": dl_bytes,
        "pos_bytes": pos_bytes,
    }


def decode_block_positions(tfs: np.ndarray, pos_bytes: bytes):
    """positional stream of one block → (flat absolute positions, cumtf).
    Row r (the block's r-th posting) owns ``flat[cumtf[r]:cumtf[r+1]]`` —
    ascending 0-based indices in the doc's filtered token stream."""
    flat = varbyte_decode(pos_bytes)
    cumtf = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
    if len(flat) == 0:
        return flat, cumtf
    c = np.cumsum(flat, dtype=np.uint64)
    starts = cumtf[:-1]
    base = np.repeat(c[starts] - flat[starts], tfs.astype(np.int64))
    return c - base, cumtf


def decode_block(first_doc: int, n_docs: int, doc_bytes: bytes, tf_bytes: bytes, dl_bytes: bytes):
    """block → (docs_u64, tfs, dls) numpy arrays."""
    first = np.uint64(np.int64(first_doc).view(np.uint64))
    deltas = varbyte_decode(doc_bytes)
    docs = np.empty(n_docs, dtype=np.uint64)
    docs[0] = first
    if n_docs > 1:
        docs[1:] = first + np.cumsum(deltas, dtype=np.uint64)
    tfs = varbyte_decode(tf_bytes)
    dls = varbyte_decode(dl_bytes)
    return docs, tfs, dls
