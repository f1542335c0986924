"""Lucene-style query-string front-end: one text box that composes the
engine's primitives (Lucene classic QueryParser / Elasticsearch
``query_string`` subset).

Supported syntax (flat boolean — no nesting or OR groups):

    spark stream            bare terms        → SHOULD (BM25 OR scoring)
    +dup                    '+' prefix        → MUST   (doc contains it)
    -window                 '-' prefix        → MUST_NOT (boolean NOT)
    "customer order"        quotes            → exact phrase constraint
                                                (needs a positional index)
    lang:en                 field:value       → metadata equality filter

Semantics pinned by ``SearchEngine.search_query_string`` (and the
``query_string_topk`` driver oracle): BM25 scores the union of SHOULD +
MUST + phrase terms; MUST / phrase / filter clauses restrict the result
set without changing scores; MUST_NOT vetoes in-kernel. Tokens are run
through the engine tokenizer, so a clause that tokenizes to nothing (a
stopword ``+the``) is dropped rather than emptying the result — same
policy as Lucene's analyzer-then-parse pipeline.

The reference has no query language (plain text OR queries only,
``Part C/searcher.py:38``); this is engine-hardening surface.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .tokenizer import tokenize_py

_TOKEN_RE = re.compile(r'[+-]?"[^"]*"|\S+')


@dataclass
class ParsedQueryString:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)
    filters: list[tuple[str, str]] = field(default_factory=list)

    @property
    def positive_terms(self) -> list[str]:
        """Terms that contribute to the BM25 score, in first-seen order."""
        seen: dict[str, None] = {}
        for t in self.should + self.must:
            seen.setdefault(t)
        for ph in self.phrases:
            for t in tokenize_py(ph):
                seen.setdefault(t)
        return list(seen)


def parse_query_string(qs: str) -> ParsedQueryString:
    """qs → clause lists. Terms are tokenizer-normalized here (lowercase,
    stopword-dropped); phrases keep their raw text — the phrase machinery
    tokenizes them itself so adjacency is defined over the filtered
    stream."""
    out = ParsedQueryString()
    for raw in _TOKEN_RE.findall(qs):
        op = ""
        if raw[0] in "+-" and len(raw) > 1:
            op, raw = raw[0], raw[1:]
        if raw.startswith('"'):
            ph = raw.strip('"').strip()
            if op == "-":
                raise ValueError("negated phrases are not supported")
            if ph and tokenize_py(ph):
                out.phrases.append(ph)
            continue
        if ":" in raw and not op:
            f, v = raw.split(":", 1)
            if f and v:
                out.filters.append((f, v))
                continue
        toks = tokenize_py(raw)
        if not toks:
            continue  # stopword-only clause: dropped, never empties results
        dst = {"": out.should, "+": out.must, "-": out.must_not}[op]
        dst.extend(toks)
    return out
