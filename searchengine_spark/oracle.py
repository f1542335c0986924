"""Pure-Python single-process rank-identity oracle.

Mirrors the reference's in-memory build→search lifecycle
(``Part C/search_engine_1.py`` build_index_from_parquet + search →
``Part C/searcher.py`` → ``Part C/ranker.py``) but with the engine's pinned
semantics: the code-mode tokenizer, standard BM25 (k1=1.5, b=0.75,
idf = ln(1+(N-df+0.5)/(df+0.5))), and the deterministic tie-break
(score desc, doc_id asc). Every Spark execution path (relational scorer,
segment+WAND) must match this oracle's top-k docIDs and scores to 1e-9
(BASELINE.md rank-identity row).
"""

from __future__ import annotations

import math
from collections import Counter

from . import BM25_B, BM25_K1
from .tokenizer import tokenize_py


class OracleIndex:
    def __init__(self) -> None:
        self.tf: dict[object, Counter] = {}       # doc_id -> {term: tf}
        self.doc_len: dict[object, int] = {}
        self.df: Counter = Counter()
        self.postings: dict[str, list] = {}       # term -> [(doc_id, tf)]

    @classmethod
    def build(cls, rows: list[tuple[object, str]]) -> "OracleIndex":
        """rows: [(doc_id, text)]"""
        idx = cls()
        for doc_id, text in rows:
            counts = Counter(tokenize_py(text))
            if not counts:
                continue  # T19: drop empty parses
            idx.tf[doc_id] = counts
            idx.doc_len[doc_id] = sum(counts.values())
            for term, tf in counts.items():
                idx.df[term] += 1
                idx.postings.setdefault(term, []).append((doc_id, tf))
        for plist in idx.postings.values():
            plist.sort()
        return idx

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
        if not self.doc_len:  # empty corpus: every scorer returns []
            return 0.0
        return sum(self.doc_len.values()) / len(self.doc_len)

    def idf(self, term: str) -> float:
        return math.log(1.0 + (self.n_docs - self.df[term] + 0.5) / (self.df[term] + 0.5))

    def bm25_topk(
        self, query: str, k: int, k1: float = BM25_K1, b: float = BM25_B
    ) -> list[tuple[object, float]]:
        """OR-mode BM25 top-k. Per-doc sum runs in sorted-term order so scores
        are bit-stable (SURVEY.md §7 rank-determinism note)."""
        qterms = sorted(Counter(tokenize_py(query)).items())
        scores: dict[object, float] = {}
        avgdl = self.avgdl
        for term, _qtf in qterms:
            if term not in self.postings:
                continue
            idf = self.idf(term)
            for doc_id, tf in self.postings[term]:
                dl = self.doc_len[doc_id]
                s = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def bm25_reference_topk(
        self, query: str, k: int | None = None, k1: float = 3.0, b: float = 0.6
    ) -> list[tuple[object, float]]:
        """Reference-parity BM25 (``Part C/ranker.py:62-86``): normalized tf,
        idf=log2(N/df), numerator ntf·(ntf·(k+1)); dynamic k = round(0.9·n)
        when k is None (``Part C/ranker.py:38-40``)."""
        qterms = sorted(Counter(tokenize_py(query)).items())
        scores: dict[object, float] = {}
        avgdl = self.avgdl
        n = self.n_docs
        for term, _qtf in qterms:
            if term not in self.postings:
                continue
            idf = math.log2(n / self.df[term])
            for doc_id, tf in self.postings[term]:
                dl = self.doc_len[doc_id]
                ntf = tf / dl
                num = ntf * (ntf * (k1 + 1.0))
                den = ntf + k1 * (1.0 - b + b * dl / avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * (num / den)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        if k is None:
            k = round(0.9 * len(ranked))
        return ranked[:k]

    def inner_product(self, query: str) -> dict[object, float]:
        """R3 with Part C weights: tfidf = (tf/dl)·log2(N/df), Σ tfidf·qtf."""
        qterms = sorted(Counter(tokenize_py(query)).items())
        scores: dict[object, float] = {}
        for term, qtf in qterms:
            if term not in self.postings:
                continue
            idf = math.log2(self.n_docs / self.df[term])
            for doc_id, tf in self.postings[term]:
                w = (tf / self.doc_len[doc_id]) * idf
                scores[doc_id] = scores.get(doc_id, 0.0) + w * qtf
        return scores

    def blended_partc_topk(self, query: str, k: int) -> list[tuple[object, float]]:
        """R5: 0.9·BM25_ref + 0.1·inner (``Part C/ranker.py:28-32``)."""
        bm = dict(self.bm25_reference_topk(query, k=10**9))
        ip = self.inner_product(query)
        docs = set(bm) | set(ip)
        blended = {d: 0.9 * bm.get(d, 0.0) + 0.1 * ip.get(d, 0.0) for d in docs}
        ranked = sorted(blended.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def boolean_and(self, query: str) -> list[object]:
        qterms = sorted(set(tokenize_py(query)))
        if not qterms:
            return []
        docsets = [set(d for d, _ in self.postings.get(t, [])) for t in qterms]
        return sorted(set.intersection(*docsets)) if docsets else []
