"""Index-native exact-phrase and proximity (NEAR) top-k over the positional
segment stream.

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

``score_group_near`` generalizes the same space to proximity search:
unordered NEAR(w) (all terms within a w-token span, any order) via a
sliding-window label-coverage sweep, ordered NEAR(w) (terms in query order
within w) via a prefix-max chain-start DP — both O(total positions), no
per-doc Python loop. Doc isolation is free for the same reason as phrase:
slots are 2^32 apart and w << 2^32, and the unordered sweep additionally
clamps each window's left bound to its slot start so a short prefix can
never read the previous doc's positions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..index.codec import bm25_u, decode_block, decode_block_positions
from .wand import DocMask, _blocks_by_term, _keep

_EMPTY = {"doc_id": np.zeros(0, np.int64), "score": np.zeros(0)}


def _ragged_gather(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Indices selecting rows' ragged slices: concat of
    [starts[i], starts[i]+counts[i]) for every i — pure numpy."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    excl = np.cumsum(counts) - counts
    return np.repeat(starts, counts) + (np.arange(total) - np.repeat(excl, counts))


def _decode_positional(
    pdf: pd.DataFrame, mask: "DocMask | None" = None
) -> dict[str, tuple]:
    """Decode every term's blocks in this group into globally doc-sorted
    (docs, tfs, dls, flat_positions) streams. Interleaved streamed epochs
    violate block-order sortedness, so the concatenation is re-sorted (the
    ragged position slices permuted with their rows) when needed. ``mask``
    applies ONLY the per-block update-tombstone filter here (superseded
    versions of updated docs must vanish BEFORE position streams
    concatenate, or adjacency could match across mixed versions); plain
    tombstones/allow-sets stay at the callers' doc-level ``_keep``."""
    from .wand import _alive_in_epoch, _block_epoch

    per_term: dict[str, tuple] = {}
    for term, sub in _blocks_by_term(pdf).items():
        docs_l, tfs_l, dls_l, pos_l = [], [], [], []
        for row in sub.itertuples(index=False):
            d, t, dl = decode_block(
                row.first_doc, row.n_docs, row.doc_bytes, row.tf_bytes, row.dl_bytes
            )
            flat, _ = decode_block_positions(t, row.pos_bytes)
            alive = _alive_in_epoch(d, _block_epoch(row), mask)
            if alive is not None:
                rows_kept = np.flatnonzero(alive)
                cumtf = np.concatenate(([0], np.cumsum(t.astype(np.int64))))
                sel = _ragged_gather(cumtf[rows_kept], t[rows_kept].astype(np.int64))
                d, t, dl, flat = d[alive], t[alive], dl[alive], flat[sel]
            docs_l.append(d)
            tfs_l.append(t)
            dls_l.append(dl)
            pos_l.append(flat)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        flat = np.concatenate(pos_l)
        if len(docs) > 1 and np.any(docs[1:] < docs[:-1]):
            order = np.argsort(docs, kind="stable")
            cumtf = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
            sel = _ragged_gather(cumtf[order], tfs[order].astype(np.int64))
            docs, tfs, dls, flat = docs[order], tfs[order], dls[order], flat[sel]
        per_term[term] = (docs, tfs, dls, flat)
    return per_term


def _and_candidates(
    per_term: dict[str, tuple], distinct: list[str], mask: DocMask | None
) -> np.ndarray:
    """Posting-list intersection across the distinct terms, then the
    decode-time doc mask (tombstones / filtered-search allow-set)."""
    common = per_term[distinct[0]][0]
    for t in distinct[1:]:
        common = np.intersect1d(common, per_term[t][0], assume_unique=True)
        if len(common) == 0:
            return common
    keep = _keep(common, mask)
    if keep is not None:
        common = common[keep]
    return common


def _gpos(per_term: dict[str, tuple], term: str, common: np.ndarray) -> np.ndarray:
    """``term``'s positions inside the candidate docs, mapped to the global
    ``(candidate_slot << 32) | pos`` space (sorted by construction)."""
    docs, tfs, _, flat = per_term[term]
    rows = np.searchsorted(docs, common)
    cumtf = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
    cnt = tfs[rows].astype(np.int64)
    sel = _ragged_gather(cumtf[rows], cnt)
    slots = np.repeat(np.arange(len(common), dtype=np.uint64) << np.uint64(32), cnt)
    return slots + flat[sel]


def _score_matched(
    per_term: dict[str, tuple],
    distinct: list[str],
    matched: np.ndarray,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
) -> pd.DataFrame:
    """BM25 over the distinct terms in ascending-term order — the same float
    accumulation order as the relational scorer / SQL oracle."""
    acc = np.zeros(len(matched), dtype=np.float64)
    for t in distinct:
        docs, tfs, dls, _ = per_term[t]
        rows = np.searchsorted(docs, matched)
        acc += idf[t] * bm25_u(tfs[rows], dls[rows], k1, b, avgdl)
    signed = matched.view(np.int64)
    order = np.lexsort((signed, -acc))[:k]
    return pd.DataFrame({"doc_id": signed[order], "score": acc[order]})


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
    per_term = _decode_positional(pdf, mask)
    if any(t not in per_term for t in distinct):
        return pd.DataFrame(_EMPTY)
    common = _and_candidates(per_term, distinct, mask)
    if len(common) == 0:
        return pd.DataFrame(_EMPTY)

    valid = _gpos(per_term, phrase_terms[0], common)
    for term in phrase_terms[1:]:
        valid = np.intersect1d(valid + np.uint64(1), _gpos(per_term, term, common))
        if len(valid) == 0:
            return pd.DataFrame(_EMPTY)
    match_slots = np.unique(valid >> np.uint64(32)).astype(np.int64)
    matched = common[match_slots]
    return _score_matched(per_term, distinct, matched, idf, k1, b, avgdl, k)


def score_group_span_first(
    pdf: pd.DataFrame,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    phrase_terms: list[str],
    limit: int,
    mask: DocMask | None = None,
) -> pd.DataFrame:
    """Lucene SpanFirstQuery: the phrase (single term = 1-word phrase) must
    match with its span ENDING within the first ``limit`` tokens of the
    filtered stream — span.end = last-word position + 1 ≤ limit, positions
    being post-stopword indices like phrase/NEAR. The lead-paragraph /
    title-zone primitive. Same candidate intersection, adjacency chain,
    scoring, and tie-break as ``score_group_phrase``; the only addition is
    the end-position cut before slot extraction."""
    distinct = sorted(set(phrase_terms))
    per_term = _decode_positional(pdf, mask)
    if any(t not in per_term for t in distinct):
        return pd.DataFrame(_EMPTY)
    common = _and_candidates(per_term, distinct, mask)
    if len(common) == 0:
        return pd.DataFrame(_EMPTY)

    valid = _gpos(per_term, phrase_terms[0], common)
    for term in phrase_terms[1:]:
        valid = np.intersect1d(valid + np.uint64(1), _gpos(per_term, term, common))
        if len(valid) == 0:
            return pd.DataFrame(_EMPTY)
    # span end = local last-word position + 1; doc slots are 2^32 apart so
    # the low 32 bits are exactly the local position
    local = (valid & np.uint64(0xFFFFFFFF)).astype(np.int64)
    valid = valid[local + 1 <= limit]
    if len(valid) == 0:
        return pd.DataFrame(_EMPTY)
    match_slots = np.unique(valid >> np.uint64(32)).astype(np.int64)
    matched = common[match_slots]
    return _score_matched(per_term, distinct, matched, idf, k1, b, avgdl, k)


def score_group_phrase_prefix(
    pdf: pd.DataFrame,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    fixed_terms: list[str],
    expansions: list[str],
    mask: DocMask | None = None,
) -> pd.DataFrame:
    """ES ``match_phrase_prefix``: the phrase's last slot matches ANY of
    ``expansions`` (the dictionary completions of the typed prefix). A doc
    matches iff the fixed terms chain adjacently and some expansion sits
    at the next position.

    Scoring convention (pinned — Lucene's MultiPhraseQuery blends union
    freqs instead, which no SQL twin can reproduce bit-exactly): BM25 over
    the DISTINCT fixed terms in ascending order, plus the MAX over
    COMPLETING expansions (those that actually extend the phrase in this
    doc) of idf_e·u_e — float max is evaluation-order independent, so the
    score is deterministic across partitionings and engines.

    ``fixed_terms`` may be empty (a bare-prefix query): every doc
    containing any expansion matches, scored by the best expansion."""
    distinct_fixed = sorted(set(fixed_terms))
    per_term = _decode_positional(pdf, mask)
    if any(t not in per_term for t in distinct_fixed):
        return pd.DataFrame(_EMPTY)
    exps = [e for e in sorted(set(expansions)) if e in per_term]
    if not exps:
        return pd.DataFrame(_EMPTY)

    targets: np.ndarray | None = None
    if fixed_terms:
        common = _and_candidates(per_term, distinct_fixed, mask)
        if len(common) == 0:
            return pd.DataFrame(_EMPTY)
        valid = _gpos(per_term, fixed_terms[0], common)
        for term in fixed_terms[1:]:
            valid = np.intersect1d(valid + np.uint64(1), _gpos(per_term, term, common))
            if len(valid) == 0:
                return pd.DataFrame(_EMPTY)
        targets = (valid + np.uint64(1)).astype(np.int64)  # expansion slot
    else:
        common = np.unique(np.concatenate([per_term[e][0] for e in exps]))
        keep = _keep(common, mask)
        if keep is not None:
            common = common[keep]
        if len(common) == 0:
            return pd.DataFrame(_EMPTY)

    best = np.full(len(common), -np.inf)
    for e in exps:
        ge = _gpos_union(per_term, e, common)
        if len(ge) == 0:
            continue
        if targets is not None:
            pos = np.searchsorted(targets, ge)
            hit = (pos < len(targets)) & (
                targets[np.minimum(pos, len(targets) - 1)] == ge
            )
            ge = ge[hit]
            if len(ge) == 0:
                continue
        slots_e = np.unique(ge >> np.int64(32)).astype(np.int64)
        docs_e, tfs_e, dls_e, _ = per_term[e]
        rows = np.searchsorted(docs_e, common[slots_e])
        u = idf[e] * bm25_u(tfs_e[rows], dls_e[rows], k1, b, avgdl)
        np.maximum.at(best, slots_e, u)
    match_slots = np.flatnonzero(best > -np.inf)
    if len(match_slots) == 0:
        return pd.DataFrame(_EMPTY)
    matched = common[match_slots]

    acc = np.zeros(len(matched), dtype=np.float64)
    for t in distinct_fixed:  # ascending order == oracle accumulation
        docs, tfs, dls, _ = per_term[t]
        rows = np.searchsorted(docs, matched)
        acc += idf[t] * bm25_u(tfs[rows], dls[rows], k1, b, avgdl)
    acc += best[match_slots]
    signed = matched.view(np.int64)
    order = np.lexsort((signed, -acc))[:k]
    return pd.DataFrame({"doc_id": signed[order], "score": acc[order]})


def score_group_near(
    pdf: pd.DataFrame,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    terms: list[str],
    window: int,
    ordered: bool = False,
    mask: DocMask | None = None,
) -> pd.DataFrame:
    """One doc_range group → ≤k (doc_id, score) rows for docs where the
    query terms co-occur within a ``window``-token span of the filtered
    token stream (positions are post-stopword indices, like phrase):

    * unordered (default): ∃ one position per DISTINCT term with
      max-min ≤ window. Verified by a sliding-window sweep over the merged
      label-tagged position stream — per right endpoint r, the window
      [max(pos_r - window, doc start), pos_r] must cover all labels, which
      the per-label prefix-count arrays answer in O(1) per endpoint.
    * ordered: ∃ positions p_0 < p_1 < … < p_{m-1}, one per QUERY term in
      query order (repeats kept), with p_{m-1} - p_0 ≤ window. Verified by
      a chain DP: f(p) = the maximal chain start over chains ending at p,
      computed per term as a prefix-max of the previous term's f gathered
      via searchsorted; positions with f(p) < p - window are pruned each
      step (the span never shrinks). Phrase ≡ ordered NEAR with adjacency
      instead of <, window = m-1.

    Scoring and tie-break are identical to phrase: BM25 over the distinct
    terms, (score desc, doc_id asc)."""
    distinct = sorted(set(terms))
    per_term = _decode_positional(pdf, mask)
    if any(t not in per_term for t in distinct):
        return pd.DataFrame(_EMPTY)
    common = _and_candidates(per_term, distinct, mask)
    if len(common) == 0:
        return pd.DataFrame(_EMPTY)

    if len(distinct) == 1 and not (ordered and len(terms) > 1):
        # single distinct term: every candidate trivially matches
        matched = common
    elif ordered:
        # chain DP over the QUERY-order terms (duplicates kept). Global
        # positions are < len(common)·2^32 (slots are candidate indices),
        # so int64 arithmetic is exact; cross-doc chains are impossible
        # because window < 2^32 ≤ inter-slot distance.
        prev = _gpos(per_term, terms[0], common).astype(np.int64)
        f = prev.copy()  # chain of length 1 starts at itself
        for term in terms[1:]:
            cur = _gpos(per_term, term, common).astype(np.int64)
            if len(prev) == 0 or len(cur) == 0:
                return pd.DataFrame(_EMPTY)
            best = np.maximum.accumulate(f)
            idx = np.searchsorted(prev, cur, side="left") - 1
            fc = np.where(idx >= 0, best[np.maximum(idx, 0)], np.int64(-1))
            keep = (idx >= 0) & (fc >= cur - window)
            prev, f = cur[keep], fc[keep]
            if len(prev) == 0:
                return pd.DataFrame(_EMPTY)
        matched = common[np.unique(prev >> np.int64(32))]
    else:
        m = len(distinct)
        pos_parts = [_gpos(per_term, t, common).astype(np.int64) for t in distinct]
        G = np.concatenate(pos_parts)
        L = np.repeat(np.arange(m), [len(p) for p in pos_parts])
        order = np.argsort(G, kind="stable")
        G, L = G[order], L[order]
        # left bound per endpoint, clamped to the doc's slot start so a
        # position < window into a doc can't pull in the previous doc
        lb = np.maximum(G - window, (G >> np.int64(32)) << np.int64(32))
        li = np.searchsorted(G, lb, side="left")
        ok = np.ones(len(G), dtype=bool)
        r1 = np.arange(1, len(G) + 1)
        for c in range(m):
            C = np.concatenate(([0], np.cumsum(L == c)))
            ok &= (C[r1] - C[li]) > 0
        if not ok.any():
            return pd.DataFrame(_EMPTY)
        matched = common[np.unique(G[ok] >> np.int64(32))]

    if len(matched) == 0:
        return pd.DataFrame(_EMPTY)
    return _score_matched(per_term, distinct, matched, idf, k1, b, avgdl, k)


SNIPPET_SCHEMA = "doc_id long, start long, end long, n_terms long, n_matches long"

_SNIPPET_EMPTY = {
    "doc_id": np.zeros(0, np.int64),
    "start": np.zeros(0, np.int64),
    "end": np.zeros(0, np.int64),
    "n_terms": np.zeros(0, np.int64),
    "n_matches": np.zeros(0, np.int64),
}


def _gpos_union(per_term: dict[str, tuple], term: str, docs_u: np.ndarray) -> np.ndarray:
    """``term``'s positions across the docs it shares with ``docs_u`` (a
    sorted union — the term need not cover every doc, unlike ``_gpos``'s
    intersection contract), in the global ``(slot << 32) | pos`` space."""
    docs, tfs, _, flat = per_term[term]
    slot = np.searchsorted(docs_u, docs)
    has = (slot < len(docs_u)) & (
        docs_u[np.minimum(slot, max(len(docs_u) - 1, 0))] == docs
    )
    rows = np.nonzero(has)[0]
    if len(rows) == 0:
        return np.zeros(0, np.int64)
    cumtf = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
    cnt = tfs[rows].astype(np.int64)
    sel = _ragged_gather(cumtf[rows], cnt)
    slots = np.repeat(slot[rows].astype(np.int64) << np.int64(32), cnt)
    return slots + flat[sel].astype(np.int64)


def snippet_group(
    pdf: pd.DataFrame,
    terms: list[str],
    window: int,
    mask: DocMask | None = None,
) -> pd.DataFrame:
    """Best-window snippet kernel (Lucene highlighter analogue) for one
    doc_range group: for every doc matching ≥1 query term, pick the
    ``window``-token span holding the most DISTINCT query terms (ties:
    more total matches, then leftmost), anchored at a match position.
    Returns one row per doc: (doc_id, start, end, n_terms, n_matches)
    where start/end are the first/last matched 0-based token positions
    inside the chosen span — the offsets a text-side highlighter slices.

    Fully vectorized sweep over the ``(slot << 32) | pos`` space: every
    anchor's span count is two searchsorted's per term (windows can't
    cross doc slots — window << 2^32), the per-doc winner is one lexsort.
    O(P log P) for P total positions, no per-doc Python loop."""
    per_term = _decode_positional(pdf, mask)
    present = sorted(t for t in set(terms) if t in per_term)
    if not present:
        return pd.DataFrame(_SNIPPET_EMPTY)
    docs_u = np.unique(np.concatenate([per_term[t][0] for t in present]))
    keep = _keep(docs_u, mask)
    if keep is not None:
        docs_u = docs_u[keep]
    if len(docs_u) == 0:
        return pd.DataFrame(_SNIPPET_EMPTY)
    pos_parts = [_gpos_union(per_term, t, docs_u) for t in present]
    G = np.concatenate(pos_parts)
    G.sort(kind="stable")
    hi = np.searchsorted(G, G + window, side="left")
    n_matches = hi - np.arange(len(G))
    n_terms = np.zeros(len(G), dtype=np.int64)
    for P in pos_parts:
        n_terms += np.searchsorted(P, G + window, side="left") > np.searchsorted(
            P, G, side="left"
        )
    # per-slot best anchor: (n_terms desc, n_matches desc, position asc)
    slot = G >> np.int64(32)
    order = np.lexsort((G, -n_matches, -n_terms, slot))
    first = np.unique(slot[order], return_index=True)[1]
    best = order[first]
    starts = G[best] & np.int64(0xFFFFFFFF)
    ends = G[hi[best] - 1] & np.int64(0xFFFFFFFF)
    return pd.DataFrame(
        {
            "doc_id": docs_u[slot[best]].astype(np.uint64).view(np.int64),
            "start": starts,
            "end": ends,
            "n_terms": n_terms[best],
            "n_matches": n_matches[best],
        }
    )
