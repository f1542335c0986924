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
    stream^2                '^' suffix        → per-term boost (scales the
                                                term's idf; Lucene boost)
    "merge sort"^2          phrase boost      → boosts every phrase term
    n_chars:[100 TO 400]    field:[lo TO hi]  → metadata range filter
                                                (inclusive; '*' = open end)

Semantics pinned by ``SearchEngine.search_query_string`` (and the
``query_string_topk`` / ``query_string_boosted`` driver oracles): BM25
scores the union of SHOULD + MUST + phrase terms, each term's idf scaled
by its boost (max-combined across clauses mentioning the term); MUST /
phrase / filter / range clauses restrict the result set without changing
scores; MUST_NOT vetoes in-kernel. Tokens are run through the engine
tokenizer, so a clause that tokenizes to nothing (a stopword ``+the``)
is dropped rather than emptying the result — same policy as Lucene's
analyzer-then-parse pipeline.

The reference has no query language (plain text OR queries only,
``Part C/searcher.py:38``); this is engine-hardening surface.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .tokenizer import analyze_py, tokenize_py

# order matters: range filter (contains spaces) > quoted phrase > bare token
_TOKEN_RE = re.compile(
    r'\S+:\[[^\]]*\]'                 # field:[lo TO hi]
    r'|[+-]?"[^"]*"(?:\^\S+)?'        # "phrase"[^boost]
    r'|\S+'                           # term / +term / -term / field:value
)
_RANGE_RE = re.compile(r'^([^:]+):\[\s*(\S+)\s+TO\s+(\S+)\s*\]$', re.IGNORECASE)


@dataclass
class ParsedQueryString:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)
    filters: list[tuple[str, str]] = field(default_factory=list)
    neg_filters: list[tuple[str, str]] = field(default_factory=list)
    ranges: list[tuple[str, str | None, str | None]] = field(default_factory=list)
    boosts: dict[str, float] = field(default_factory=dict)
    analyzer: str = "standard"  # pinned at parse time; phrase re-analysis uses it

    @property
    def positive_terms(self) -> list[str]:
        """Terms that contribute to the BM25 score, in first-seen order."""
        seen: dict[str, None] = {}
        for t in self.should + self.must:
            seen.setdefault(t)
        for ph in self.phrases:
            for t in analyze_py(ph, self.analyzer):
                seen.setdefault(t)
        return list(seen)


def _split_boost(raw: str) -> tuple[str, float]:
    """``stream^2`` → ('stream', 2.0); no/invalid suffix → (raw, 1.0).
    A malformed boost (``term^fast``) falls through as literal text, same
    as Lucene's lenient parse — the '^…' then dies in the tokenizer."""
    head, sep, tail = raw.rpartition("^")
    if sep:
        try:
            return head, float(tail)
        except ValueError:
            pass
    return raw, 1.0


def parse_query_string(qs: str, analyzer: str = "standard") -> ParsedQueryString:
    """qs → clause lists. Terms are tokenizer-normalized here (lowercase,
    stopword-dropped) under ``analyzer`` — pass the INDEX's pinned
    analyzer so e.g. a code index parses `+getFooBar` into the same parts
    it indexed; phrases keep their raw text — the phrase machinery
    tokenizes them itself so adjacency is defined over the filtered
    stream. Boosts are max-combined per normalized term."""
    out = ParsedQueryString(analyzer=analyzer)

    def boost_all(toks: list[str], w: float) -> None:
        # record EVERY mention: an unboosted clause carries the implicit
        # 1.0, and the contract is max-combine across ALL clauses
        # mentioning the term — 'stream stream^0.5' must boost by 1.0,
        # not 0.5. Entries equal to 1.0 are identity downstream.
        if w < 0.0:
            raise ValueError(f"negative boost: ^{w}")
        for t in toks:
            out.boosts[t] = max(out.boosts.get(t, 0.0), w)

    for raw in _TOKEN_RE.findall(qs):
        m = _RANGE_RE.match(raw)
        if m:
            f, lo, hi = m.group(1), m.group(2), m.group(3)
            out.ranges.append((f, None if lo == "*" else lo,
                               None if hi == "*" else hi))
            continue
        op = ""
        if raw[0] in "+-" and len(raw) > 1:
            op, raw = raw[0], raw[1:]
        if raw.startswith('"'):
            rest = raw[1:]
            ph, _, tail = rest.partition('"')
            ph = ph.strip()
            if op == "-":
                raise ValueError("negated phrases are not supported")
            boost = _split_boost(tail)[1] if tail.startswith("^") else 1.0
            ptoks = analyze_py(ph, analyzer)
            if ph and ptoks:
                out.phrases.append(ph)
                boost_all(ptoks, boost)
            continue
        if ":" in raw and not raw.startswith('"'):
            f, v = raw.split(":", 1)
            if f and v:
                # +field:value is a (redundant) required filter; -field:value
                # excludes docs where the field equals the value — silently
                # parsing these as text terms required the literal WORDS
                # 'field' and 'value' in the document body
                if op == "-":
                    out.neg_filters.append((f, v))
                else:
                    out.filters.append((f, v))
                continue
        raw, boost = _split_boost(raw)
        toks = analyze_py(raw, analyzer)
        if not toks:
            continue  # stopword-only clause: dropped, never empties results
        if op == "-" and boost != 1.0:
            raise ValueError("a MUST_NOT clause cannot carry a boost "
                             "(it never contributes to the score)")
        dst = {"": out.should, "+": out.must, "-": out.must_not}[op]
        dst.extend(toks)
        boost_all(toks, boost)
    return out
