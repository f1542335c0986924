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
        self.cf: Counter = Counter()
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
                idx.cf[term] += tf
                idx.postings.setdefault(term, []).append((doc_id, tf))
        for plist in idx.postings.values():
            plist.sort()
        return idx

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
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

    def boolean_and(self, query: str) -> list[object]:
        qterms = sorted(set(tokenize_py(query)))
        if not qterms:
            return []
        docsets = [set(d for d, _ in self.postings.get(t, [])) for t in qterms]
        return sorted(set.intersection(*docsets)) if docsets else []
