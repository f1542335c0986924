"""Per-doc-range scoring kernels over encoded posting blocks.

Two exact-equivalent kernels, both operating on one doc_range group (all
blocks of all query terms whose postings fall in that unsigned-doc-id range —
ranges are disjoint, so per-range top-k candidates compose into the global
top-k):

  * ``score_group_vectorized`` — decode every candidate block, numpy
    score+aggregate. Exact OR/AND semantics, no pruning; the throughput
    baseline at small selectivity.
  * ``score_group_wand``       — Block-Max WAND (Ding & Suel, WSDM'11):
    doc-at-a-time pivoting on per-term upper bounds (idf·max_u(term)) with
    per-block upper bounds for block skipping; bounded min-heap of size k.

Both accumulate each doc's score over its matching terms in ascending-term
order, so scores are bit-identical to each other and to the Python oracle
(SURVEY.md §7 rank determinism). Tie-break everywhere: (score desc,
signed doc_id asc). Pruning uses *strict* bounds so exact score ties (common
with shared boilerplate terms) are never pruned away.

Reference analogue: term-at-a-time candidate accumulation
``Part C/searcher.py:74-112`` (OR), and the 2000-doc candidate cap
``Part A/searcher.py:19,80-82`` which WAND replaces with principled pruning.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from ..index.codec import bm25_u, decode_block


def _u2s(doc: int) -> int:
    """unsigned doc value → signed int64 (the stored doc_id)."""
    return doc - (1 << 64) if doc >= (1 << 63) else doc


def _blocks_by_term(pdf: pd.DataFrame) -> dict[str, pd.DataFrame]:
    return {
        term: sub.sort_values(["doc_range", "block_id"])
        for term, sub in pdf.groupby("term", sort=True)
    }


def _decode_term(sub: pd.DataFrame):
    docs_l, tfs_l, dls_l = [], [], []
    for row in sub.itertuples(index=False):
        d, t, dl = decode_block(row.first_doc, row.n_docs, row.doc_bytes, row.tf_bytes, row.dl_bytes)
        docs_l.append(d)
        tfs_l.append(t)
        dls_l.append(dl)
    return np.concatenate(docs_l), np.concatenate(tfs_l), np.concatenate(dls_l)


def score_group_vectorized(
    pdf: pd.DataFrame,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    mode: str = "or",
) -> pd.DataFrame:
    """Exact OR (or AND) top-k within one doc_range group. Columns in:
    BLOCK_SCHEMA; out: (doc_id:int64, score:float64)."""
    terms = sorted(pdf["term"].unique())
    per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for term, sub in _blocks_by_term(pdf).items():
        docs, tfs, dls = _decode_term(sub)
        per_term[term] = (docs, idf[term] * bm25_u(tfs, dls, k1, b, avgdl))

    all_docs = np.concatenate([per_term[t][0] for t in terms])
    uniq, inv = np.unique(all_docs, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    hits = np.zeros(len(uniq), dtype=np.int64)
    off = 0
    # ascending-term accumulation order == oracle float order
    for t in terms:
        docs, scores = per_term[t]
        seg = inv[off : off + len(docs)]
        acc[seg] += scores
        hits[seg] += 1
        off += len(docs)
    if mode == "and":
        keep = hits == len(terms)
        uniq, acc = uniq[keep], acc[keep]
    signed = uniq.view(np.int64)
    idx = np.lexsort((signed, -acc))[:k]
    return pd.DataFrame({"doc_id": signed[idx], "score": acc[idx]})


class _TermCursor:
    """Cursor over one term's doc-sorted blocks with lazy decode."""

    __slots__ = ("term", "blocks", "ub", "bi", "docs", "scores", "pi", "exhausted")

    def __init__(self, term: str, sub: pd.DataFrame, term_ub: float):
        self.term = term
        self.blocks = list(sub.itertuples(index=False))
        self.ub = term_ub
        self.bi = 0
        self.docs = None
        self.scores = None
        self.pi = 0
        self.exhausted = not self.blocks

    def cur_doc(self) -> int:
        """Smallest unsigned doc this cursor can still produce (no decode needed)."""
        if self.docs is not None:
            return int(self.docs[self.pi])
        row = self.blocks[self.bi]
        return int(np.int64(row.first_doc).view(np.uint64))

    def block_max(self, idf: float) -> float:
        return idf * float(self.blocks[self.bi].max_u)

    def block_last(self) -> int:
        return int(np.int64(self.blocks[self.bi].last_doc).view(np.uint64))

    def _decode(self, idf, k1, b, avgdl):
        if self.docs is None:
            row = self.blocks[self.bi]
            d, t, dl = decode_block(row.first_doc, row.n_docs, row.doc_bytes, row.tf_bytes, row.dl_bytes)
            self.docs = d
            self.scores = idf * bm25_u(t, dl, k1, b, avgdl)

    def skip_to(self, target: int, idf, k1, b, avgdl) -> None:
        """Advance to first doc >= target: block-granular skip (no decode),
        then in-block binary search."""
        while not self.exhausted and self.block_last() < target:
            self.bi += 1
            self.docs = None
            self.pi = 0
            if self.bi >= len(self.blocks):
                self.exhausted = True
                return
        if self.exhausted:
            return
        self._decode(idf, k1, b, avgdl)
        self.pi = int(np.searchsorted(self.docs, np.uint64(target), side="left"))
        if self.pi >= len(self.docs):  # can't happen if block_last >= target
            self.skip_to(target, idf, k1, b, avgdl)

    def at(self, doc: int) -> bool:
        return (not self.exhausted) and self.docs is not None and int(self.docs[self.pi]) == doc


class _TopK:
    """Bounded min-heap with (score desc, signed doc asc) ordering."""

    def __init__(self, k: int):
        self.k = k
        self.heap: list[tuple[float, int]] = []  # (score, -signed_doc)

    def consider(self, doc_unsigned: int, score: float) -> None:
        item = (score, -_u2s(doc_unsigned))
        if len(self.heap) < self.k:
            heapq.heappush(self.heap, item)
        elif item > self.heap[0]:
            heapq.heapreplace(self.heap, item)

    def theta(self) -> float:
        return self.heap[0][0] if len(self.heap) >= self.k else -np.inf

    def to_pdf(self) -> pd.DataFrame:
        items = sorted(self.heap, key=lambda x: (-x[0], -x[1]))
        return pd.DataFrame(
            {"doc_id": np.array([-nd for _, nd in items], dtype=np.int64),
             "score": np.array([s for s, _ in items], dtype=np.float64)}
        )


def score_group_wand(
    pdf: pd.DataFrame,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    mode: str = "or",
) -> pd.DataFrame:
    """Block-Max WAND top-k within one doc_range group; result identical to
    ``score_group_vectorized`` (tested, incl. exact-tie cases)."""
    terms = sorted(pdf["term"].unique())
    cursors = [
        _TermCursor(term, sub, idf[term] * float(sub["max_u"].max()))
        for term, sub in _blocks_by_term(pdf).items()
    ]
    topk = _TopK(k)

    def score_doc(doc: int) -> float:
        s = 0.0
        for c in cursors:  # ascending term order (cursors built sorted)
            if c.exhausted:
                continue
            if c.cur_doc() <= doc:
                c.skip_to(doc, idf[c.term], k1, b, avgdl)
            if c.at(doc):
                s += float(c.scores[c.pi])
        return s

    def advance_past(doc: int) -> None:
        for c in cursors:
            if not c.exhausted and c.cur_doc() <= doc:
                c.skip_to(doc + 1, idf[c.term], k1, b, avgdl)

    if mode == "and":
        while True:
            live = [c for c in cursors if not c.exhausted]
            if len(live) < len(terms):
                break
            target = max(c.cur_doc() for c in live)
            for c in cursors:
                c.skip_to(target, idf[c.term], k1, b, avgdl)
            if any(c.exhausted for c in cursors):
                break
            if all(c.at(target) for c in cursors):
                s = 0.0
                for c in cursors:
                    s += float(c.scores[c.pi])
                topk.consider(target, s)
                advance_past(target)
        return topk.to_pdf()

    # ---- OR mode: block-max WAND ------------------------------------------
    while True:
        live = sorted((c for c in cursors if not c.exhausted), key=_TermCursor.cur_doc)
        if not live:
            break
        th = topk.theta()
        acc_ub = 0.0
        pivot_i = None
        for i, c in enumerate(live):
            acc_ub += c.ub
            if acc_ub >= th:  # >= : exact ties can still win via doc_id tie-break
                pivot_i = i
                break
        if pivot_i is None:
            break  # Σ all ubs < θ strictly — nothing left can enter the heap
        pivot_doc = live[pivot_i].cur_doc()
        if live[0].cur_doc() < pivot_doc:
            # docs below the pivot are covered only by the strict prefix whose
            # Σ ub < θ strictly → can never enter the heap: skip them.
            for c in live:
                if c.cur_doc() < pivot_doc:
                    c.skip_to(pivot_doc, idf[c.term], k1, b, avgdl)
            continue
        # all prefix cursors sit exactly at pivot_doc
        counted = [c for c in live if c.cur_doc() == pivot_doc]
        bm = sum(c.block_max(idf[c.term]) for c in counted)
        if bm < th:  # strict: a tie could still win on doc_id
            safe_to = min(c.block_last() for c in counted)
            uncounted = [c for c in live if c.cur_doc() > pivot_doc]
            if uncounted:
                safe_to = min(safe_to, min(c.cur_doc() for c in uncounted) - 1)
            for c in counted:
                c.skip_to(safe_to + 1, idf[c.term], k1, b, avgdl)
            continue
        s = score_doc(pivot_doc)
        topk.consider(pivot_doc, s)
        advance_past(pivot_doc)
    return topk.to_pdf()
