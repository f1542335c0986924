"""Index-native exact-phrase top-k over the positional segment stream.

The relational path (``scoring.phrase_topk``) verifies adjacency by
re-tokenizing the corpus text — a full scan per phrase. With a positional
index (``build_index(with_positions=True)``) the phrase never touches raw
text: candidates come from posting-list intersection (AND), adjacency is
verified on the decoded position streams, and scoring is the same BM25 sum
the ``_bm25_sql`` oracle defines — so an index phrase query is
rank-identical to the relational/SQL phrase (tested).

Verification is fully vectorized via a global position space: candidate doc
j's positions map to ``(j << 32) | pos``; a phrase of terms t_0..t_{m-1}
matches wherever successive ``np.intersect1d(valid + 1, P_i)`` stay
non-empty (the +1 can never cross a doc boundary — doc slots are 2^32
apart). Repeated phrase terms need no special casing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..index.codec import bm25_u, decode_block, decode_block_positions
from .wand import DocMask, _blocks_by_term, _keep


def _ragged_gather(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Indices selecting rows' ragged slices: concat of
    [starts[i], starts[i]+counts[i]) for every i — pure numpy."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    excl = np.cumsum(counts) - counts
    return np.repeat(starts, counts) + (np.arange(total) - np.repeat(excl, counts))


def score_group_phrase(
    pdf: pd.DataFrame,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    phrase_terms: list[str],
    mask: DocMask | None = None,
) -> pd.DataFrame:
    """One doc_range group → ≤k (doc_id, score) rows for docs containing the
    phrase (adjacent in the filtered token stream), BM25-scored over the
    phrase's DISTINCT terms in ascending-term order (bit-identical to the
    relational scorer / SQL oracle). ``mask``: decode-time doc mask
    (tombstones and/or filtered-search allow-set) applied to the candidate
    intersection."""
    distinct = sorted(set(phrase_terms))
    per_term: dict[str, tuple] = {}
    for term, sub in _blocks_by_term(pdf).items():
        docs_l, tfs_l, dls_l, pos_l = [], [], [], []
        for row in sub.itertuples(index=False):
            d, t, dl = decode_block(
                row.first_doc, row.n_docs, row.doc_bytes, row.tf_bytes, row.dl_bytes
            )
            flat, _ = decode_block_positions(t, row.pos_bytes)
            docs_l.append(d)
            tfs_l.append(t)
            dls_l.append(dl)
            pos_l.append(flat)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        flat = np.concatenate(pos_l)
        # searchsorted below needs GLOBALLY doc-sorted postings; interleaved
        # streamed epochs violate block-order sortedness, so re-sort the
        # concatenation (ragged position slices permuted with their rows)
        if len(docs) > 1 and np.any(docs[1:] < docs[:-1]):
            order = np.argsort(docs, kind="stable")
            cumtf = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
            sel = _ragged_gather(cumtf[order], tfs[order].astype(np.int64))
            docs, tfs, dls, flat = docs[order], tfs[order], dls[order], flat[sel]
        per_term[term] = (docs, tfs, dls, flat)
    if any(t not in per_term for t in distinct):
        return pd.DataFrame({"doc_id": np.zeros(0, np.int64), "score": np.zeros(0)})

    # AND candidates across distinct terms
    common = per_term[distinct[0]][0]
    for t in distinct[1:]:
        common = np.intersect1d(common, per_term[t][0], assume_unique=True)
        if len(common) == 0:
            return pd.DataFrame({"doc_id": np.zeros(0, np.int64), "score": np.zeros(0)})
    keep = _keep(common, mask)
    if keep is not None:
        common = common[keep]
    if len(common) == 0:
        return pd.DataFrame({"doc_id": np.zeros(0, np.int64), "score": np.zeros(0)})

    # positional verify in the (doc_slot << 32 | pos) space
    def gpos(term: str) -> np.ndarray:
        docs, tfs, _, flat = per_term[term]
        rows = np.searchsorted(docs, common)
        cumtf = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
        cnt = tfs[rows].astype(np.int64)
        sel = _ragged_gather(cumtf[rows], cnt)
        slots = np.repeat(np.arange(len(common), dtype=np.uint64) << np.uint64(32), cnt)
        return slots + flat[sel]

    valid = gpos(phrase_terms[0])
    for term in phrase_terms[1:]:
        valid = np.intersect1d(valid + np.uint64(1), gpos(term))
        if len(valid) == 0:
            return pd.DataFrame({"doc_id": np.zeros(0, np.int64), "score": np.zeros(0)})
    match_slots = np.unique(valid >> np.uint64(32)).astype(np.int64)
    matched = common[match_slots]

    # BM25 over distinct terms, ascending order (same floats as the oracle)
    acc = np.zeros(len(matched), dtype=np.float64)
    for t in distinct:
        docs, tfs, dls, _ = per_term[t]
        rows = np.searchsorted(docs, matched)
        acc += idf[t] * bm25_u(tfs[rows], dls[rows], k1, b, avgdl)
    signed = matched.view(np.int64)
    order = np.lexsort((signed, -acc))[:k]
    return pd.DataFrame({"doc_id": signed[order], "score": acc[order]})
