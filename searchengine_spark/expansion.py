"""Query-expansion hooks (SURVEY.md §2.11 — the reference's six engine
variants differ only here; ``Part C/searcher_spell_checker.py``,
``searcher_thesaurus.py``, ``searcher_word_net.py``, ``searcher_glove.py``).

In the reference these mutate the query-term dict before candidate
generation; here they are driver-side *query rewriters*: a rewriter maps the
parsed query terms to ``[(term, weight)]``. The engine folds the weight into
the per-term idf (score contribution = weight·idf·u), which keeps both the
relational and the WAND paths unchanged.

nltk/spacy are not available in this environment, so:
  * spell-check is a pure-Python edit-distance-≤2 match against the index
    vocabulary (deterministic; same role as ``Part C/SpellChecker.py:10-24``)
  * thesaurus/WordNet are a static synonym dict with the reference's 0.2
    expansion weight (``Part C/searcher_thesaurus.py:40``); a bundled
    hand-authored English resource (``resources/synonyms_en.tsv``, loaded
    by ``load_synonyms``/``make_thesaurus_rewriter``) makes the variants
    runnable without external data
  * GloVe embedding expansion (``Part C/searcher_glove.py:68-100``) is out of
    scope per SURVEY.md §1.1 (model row) — the hook signature supports it.
"""

from __future__ import annotations

from collections.abc import Callable

from .scoring import parse_query

Rewriter = Callable[[list[tuple[str, int]]], list[tuple[str, float]]]

EXPANSION_WEIGHT = 0.2  # reference weight for expanded terms


def identity_rewriter(qterms: list[tuple[str, int]]) -> list[tuple[str, float]]:
    return [(t, 1.0) for t, _ in qterms]


def _edits1(word: str) -> set[str]:
    letters = "abcdefghijklmnopqrstuvwxyz_0123456789"
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = [a + b[1:] for a, b in splits if b]
    transposes = [a + b[1] + b[0] + b[2:] for a, b in splits if len(b) > 1]
    replaces = [a + c + b[1:] for a, b in splits if b for c in letters]
    inserts = [a + c + b for a, b in splits for c in letters]
    return set(deletes + transposes + replaces + inserts)


def make_spell_rewriter(
    vocab: set[str], freq: dict[str, int] | None = None
) -> Rewriter:
    """OOV terms → closest in-vocab term at edit distance ≤2. Deterministic
    ranking: distance-1 beats distance-2; within a distance band,
    HIGHEST corpus frequency wins when ``freq`` is given (the reference's
    pyspellchecker rule — ``Part C/SpellChecker.py:10-24`` ranks
    candidates by word probability; pass the dictionary's cf), ties and
    the no-freq fallback break lexicographically."""

    def best(cands: set[str]) -> str:
        if freq is None:
            return min(cands)
        return min(cands, key=lambda t: (-freq.get(t, 0), t))

    def correct(term: str) -> str:
        if term in vocab:
            return term
        e1 = _edits1(term) & vocab
        if e1:
            return best(e1)
        # distance 2: collect matches across ALL intermediates before
        # choosing — returning the first intermediate's best match picked
        # whichever candidate an arbitrary iteration order reached first,
        # not the documented minimum
        e2: set[str] = set()
        for cand in _edits1(term):
            e2 |= _edits1(cand) & vocab
        if e2:
            return best(e2)
        return term

    def rewrite(qterms: list[tuple[str, int]]) -> list[tuple[str, float]]:
        return [(correct(t), 1.0) for t, _ in qterms]

    return rewrite


def load_synonyms(path: str | None = None) -> dict[str, list[str]]:
    """Load a synonym resource: one group per line, terms tab-separated
    ('#' comments and blanks ignored); every term maps to the OTHER terms
    of every group it appears in (groups sharing a term union, duplicates
    dropped, output lists sorted — deterministic expansions). Default is
    the BUNDLED hand-authored English resource
    (``resources/synonyms_en.tsv``), which makes the reference's
    thesaurus/WordNet searcher variants (``Part C/searcher_thesaurus.py:40``,
    ``Part C/searcher_word_net.py:40-41``) runnable out of the box — the
    reference reaches py-thesaurus/nltk-WordNet at query time; this is a
    static in-repo equivalent of that lookup."""
    import os

    if path is None:
        path = os.path.join(
            os.path.dirname(__file__), "resources", "synonyms_en.tsv"
        )
    groups: list[list[str]] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            terms = [t.strip().lower() for t in line.split("\t") if t.strip()]
            if len(terms) >= 2:
                groups.append(terms)
    out: dict[str, set[str]] = {}
    for terms in groups:
        uniq = set(terms)
        for t in uniq:
            out.setdefault(t, set()).update(uniq - {t})
    return {t: sorted(syns) for t, syns in sorted(out.items())}


def make_thesaurus_rewriter(
    weight: float = EXPANSION_WEIGHT, path: str | None = None
) -> Rewriter:
    """The ``search_engine_3``/``search_engine_5`` parity rewriter: bundled
    synonym expansion at the reference's 0.2 weight."""
    return make_synonym_rewriter(load_synonyms(path), weight)


def make_synonym_rewriter(
    synonyms: dict[str, list[str]], weight: float = EXPANSION_WEIGHT
) -> Rewriter:
    """Append synonym terms at reduced weight (thesaurus/WordNet shape)."""

    def rewrite(qterms: list[tuple[str, int]]) -> list[tuple[str, float]]:
        out: dict[str, float] = {}
        for t, _ in qterms:
            out[t] = max(out.get(t, 0.0), 1.0)
            for syn in synonyms.get(t, []):
                if syn not in out:
                    out[syn] = weight
        return sorted(out.items())

    return rewrite


def make_embedding_rewriter(
    vectors: dict[str, list[float]],
    n_neighbors: int = 2,
    max_query_terms: int = 5,
    weight: float = EXPANSION_WEIGHT,
) -> Rewriter:
    """GloVe-style expansion (``Part C/searcher_glove.py:68-100`` shape):
    queries with fewer than ``max_query_terms`` terms get each term's
    ``n_neighbors`` nearest vocabulary terms by euclidean distance appended
    at reduced weight. Deterministic: ties broken by (distance, term).

    ``vectors`` is the word-embedding table (term → float list). In the
    reference this is the 100k-row GloVe ``model.txt`` loaded in-process; on
    a cluster the same dict arrives via a broadcast (queries are rewritten
    driver-side either way). Brute-force scan per query term — |vocab| · dim
    flops, driver-side, exactly like the reference."""

    def neighbors(term: str) -> list[str]:
        v = vectors.get(term)
        if v is None:
            return []
        scored = []
        for cand, cv in vectors.items():
            if cand == term:
                continue
            d = sum((a - b) ** 2 for a, b in zip(v, cv))
            scored.append((d, cand))
        scored.sort()
        return [c for _, c in scored[:n_neighbors]]

    def rewrite(qterms: list[tuple[str, int]]) -> list[tuple[str, float]]:
        out: dict[str, float] = {t: 1.0 for t, _ in qterms}
        if len(qterms) < max_query_terms:
            for t, _ in qterms:
                for nb in neighbors(t):
                    if nb not in out:
                        out[nb] = weight
        return sorted(out.items())

    return rewrite


def hash_term_vectors(vocab: list[str], dim: int = 16) -> dict[str, list[float]]:
    """Deterministic stand-in embedding table (md5-derived floats in [-1, 1))
    — the container has no GloVe model; swapping in a real ``model.txt``
    loader touches only this function's caller."""
    import hashlib

    out = {}
    for term in vocab:
        digest = hashlib.md5(term.encode()).digest()
        out[term] = [digest[i % 16] / 128.0 - 1.0 for i in range(dim)]
    return out


def rewrite_query(query: str, rewriter: Rewriter | None) -> list[tuple[str, float]]:
    qterms = parse_query(query)
    if rewriter is None:
        return [(t, 1.0) for t, _ in qterms]
    out: dict[str, float] = {}
    for term, wgt in rewriter(qterms):
        out[term] = max(out.get(term, 0.0), wgt)  # dedup, keep max weight
    return sorted(out.items())
