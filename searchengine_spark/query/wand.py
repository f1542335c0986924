"""Per-doc-range scoring kernels over encoded posting blocks.

Two exact-equivalent kernels, both operating on one doc_range group (all
blocks of all query terms whose postings fall in that unsigned-doc-id range —
ranges are disjoint, so per-range top-k candidates compose into the global
top-k):

  * ``score_group_vectorized`` — decode every candidate block, numpy
    score+aggregate. Exact OR/AND semantics, no pruning; the throughput
    baseline at small selectivity.
  * ``score_group_wand``       — the pruned paths: OR = vectorized
    interval-sweep Block-Max pruning (after Ding & Suel's block-max idea,
    WSDM'11, re-shaped for numpy); AND = vectorized rare-term-driven
    candidate intersection with block skipping (``_and_vectorized``).

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

from typing import NamedTuple

import numpy as np
import pandas as pd

from ..index.codec import bm25_u, decode_block


def _blocks_by_term(pdf: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Per-term blocks in UNSIGNED first_doc order. For a batch index this
    equals (doc_range, block_id) order; for a multi-epoch streamed index it
    is the only ordering that keeps cursor-based iteration monotone (epochs'
    blocks interleave within a doc_range)."""
    out: dict[str, pd.DataFrame] = {}
    for term, sub in pdf.groupby("term", sort=True):
        fd = sub["first_doc"].to_numpy(dtype=np.int64).view(np.uint64)
        out[term] = sub.iloc[np.argsort(fd, kind="stable")]
    return out


def _decode_term(sub: pd.DataFrame, mask: "DocMask | None" = None):
    """Decode one term's blocks. ``mask`` here applies ONLY the per-block
    update-tombstone filter (epoch-dependent, so it cannot wait for the
    term-concatenated array); plain tombstones and allow-sets stay at the
    callers' term-level ``_keep``."""
    docs_l, tfs_l, dls_l = [], [], []
    for row in sub.itertuples(index=False):
        d, t, dl = decode_block(row.first_doc, row.n_docs, row.doc_bytes, row.tf_bytes, row.dl_bytes)
        alive = _alive_in_epoch(d, _block_epoch(row), mask)
        if alive is not None:
            d, t, dl = d[alive], t[alive], dl[alive]
        docs_l.append(d)
        tfs_l.append(t)
        dls_l.append(dl)
    return np.concatenate(docs_l), np.concatenate(tfs_l), np.concatenate(dls_l)


def _not_excluded(docs: np.ndarray, excluded: np.ndarray | None) -> np.ndarray | None:
    """Boolean keep-mask against a SORTED uint64 tombstone array (None if
    nothing to drop). Tombstoned docs are filtered at decode time in every
    kernel — segments stay immutable (Lucene-style deletes: corpus stats
    keep counting deleted docs until compaction physically removes them)."""
    if excluded is None or len(excluded) == 0:
        return None
    pos = np.searchsorted(excluded, docs)
    hit = (pos < len(excluded)) & (
        excluded[np.minimum(pos, len(excluded) - 1)] == docs
    )
    return ~hit if hit.any() else None


class DocMask(NamedTuple):
    """Decode-time document mask shipped in the kernel closure:
    ``excluded`` = sorted-u64 tombstones (deletes), ``included`` = sorted-u64
    allow-set (metadata-filtered search: only these docs may score; corpus
    statistics intentionally stay corpus-wide, the standard filtered-search
    semantics). Both are the deliberate small-state path — ~10^7 ids ≈ 80 MB
    closure is the practical bound; arbitrary large predicates belong on the
    relational scorer as joins (`scoring.bm25_score` + semi-join).

    ``upd``/``upd_wm`` carry UPDATE tombstones (Lucene updateDocument
    semantics): ``upd`` is a sorted-u64 array of re-added doc_ids and
    ``upd_wm`` the parallel int64 epoch watermarks — a posting for
    ``upd[i]`` is dead iff its block's epoch ≤ ``upd_wm[i]``, so the doc's
    OLD version (committed at or before the update) vanishes while the NEW
    version (a later epoch) scores. Unlike ``excluded`` this filter is
    per-BLOCK (epoch is a block property), so it runs inside the decode
    loops, not on term-concatenated arrays."""

    excluded: "np.ndarray | None" = None
    included: "np.ndarray | None" = None
    upd: "np.ndarray | None" = None
    upd_wm: "np.ndarray | None" = None


def _alive_in_epoch(
    docs: np.ndarray, epoch: "int | None", mask: "DocMask | None"
) -> np.ndarray | None:
    """Keep-mask (or None) for one BLOCK's decoded docs under the update
    tombstones: drops postings of updated docs whose block epoch is at or
    below the doc's update watermark (the superseded version). ``epoch`` is
    the block's epoch partition value; None (a batch-built index with no
    epoch layout) means updates cannot exist — kept total by treating every
    watermark as covering it (an updated doc's old version in a pre-epoch
    layout is unreachable anyway because update_docs requires the epoch
    layout)."""
    if mask is None or mask.upd is None or len(mask.upd) == 0:
        return None
    pos = np.searchsorted(mask.upd, docs)
    pos_c = np.minimum(pos, len(mask.upd) - 1)
    hit = (pos < len(mask.upd)) & (mask.upd[pos_c] == docs)
    if epoch is not None:
        hit &= np.int64(epoch) <= mask.upd_wm[pos_c]
    return ~hit if hit.any() else None


def _block_epoch(row) -> "int | None":
    """Epoch partition value of a block row (None for batch layouts)."""
    e = getattr(row, "epoch", None)
    return None if e is None else int(e)


def _keep(docs: np.ndarray, mask: "DocMask | None") -> np.ndarray | None:
    """Boolean keep-mask for one decoded posting run under ``mask`` (None =
    keep everything). Block max_u pruning bounds stay valid: filtering only
    shrinks a block's doc set, so stored maxima remain upper bounds."""
    if mask is None:
        return None
    keep = _not_excluded(docs, mask.excluded)
    inc = mask.included
    if inc is not None:
        pos = np.searchsorted(inc, docs)
        hit = (
            ((pos < len(inc)) & (inc[np.minimum(pos, max(len(inc) - 1, 0))] == docs))
            if len(inc)
            else np.zeros(len(docs), dtype=bool)
        )
        keep = hit if keep is None else (keep & hit)
        if keep.all():
            return None
    return keep


def _empty_result() -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": np.zeros(0, dtype=np.int64), "score": np.zeros(0, dtype=np.float64)}
    )


def _empty_batch_result() -> pd.DataFrame:
    return pd.DataFrame(
        {"query_id": [], "doc_id": np.zeros(0, np.int64), "score": np.zeros(0)}
    )


def _after_filter(
    signed: np.ndarray, acc: np.ndarray, after: "tuple[int, float] | None"
) -> np.ndarray:
    """Keep-mask for search_after pagination: rows strictly AFTER the
    cursor in result order (score desc, signed doc_id asc). The cursor is a
    ``(doc_id, score)`` RESULT tuple — exactly what ``search`` returns, so
    ``hits[-1]`` is a valid cursor verbatim. Cursor scores come from a
    previous page of the same float pipeline, so the equality compare is
    bit-exact. Filtering happens BEFORE the group-local top-k — that's what
    makes per-group truncation safe at any page depth."""
    if after is None:
        return np.ones(len(acc), dtype=bool)
    a_d, a_s = int(after[0]), float(after[1])
    return (acc < a_s) | ((acc == a_s) & (signed > a_d))


MATCH_SCHEMA = "doc_id long"
EXPLAIN_SCHEMA = "doc_id long, term string, tf long, dl long"


def explain_group(pdf: pd.DataFrame, mask: DocMask | None = None) -> pd.DataFrame:
    """Raw per-(doc, term) posting facts for one doc_range group — the
    decode half of a Lucene-style ``explain()``. Scoring arithmetic happens
    JVM-side afterwards (idf join + saturation expression), so this kernel
    only surfaces what is physically in the index: tf and dl per posting,
    restricted to ``mask.included`` (the docs being explained)."""
    by_term = _blocks_by_term(pdf)
    parts: list[pd.DataFrame] = []
    for term in sorted(by_term):
        docs, tfs, dls = _decode_term(by_term[term], mask)
        keep = _keep(docs, mask)
        if keep is not None:
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        if len(docs) == 0:
            continue
        parts.append(
            pd.DataFrame(
                {
                    "doc_id": docs.astype(np.uint64).view(np.int64),
                    "term": term,
                    "tf": tfs.astype(np.int64),
                    "dl": dls.astype(np.int64),
                }
            )
        )
    if not parts:
        return pd.DataFrame(
            {
                "doc_id": np.zeros(0, np.int64),
                "term": pd.Series([], dtype=str),
                "tf": np.zeros(0, np.int64),
                "dl": np.zeros(0, np.int64),
            }
        )
    return pd.concat(parts, ignore_index=True)


def matched_group(
    pdf: pd.DataFrame,
    mode: str,
    n_query_terms: int,
    mask: DocMask | None = None,
) -> pd.DataFrame:
    """Matched-SET kernel (no scoring): all doc_ids in one doc_range group
    that match the query terms under ``mode`` ("or" = union, "and" =
    intersection). Unlike the top-k kernels this returns the FULL match —
    the input to set-shaped downstream ops (facet counts, match
    cardinality) that aggregate distributively afterwards, so nothing here
    is k-bounded. Same cross-range AND guard as the scoring kernels: a
    group missing any query term can contain no conjunctive match."""
    by_term = _blocks_by_term(pdf)
    if mode == "and" and len(by_term) < n_query_terms:
        return pd.DataFrame({"doc_id": np.zeros(0, dtype=np.int64)})
    per_term: list[np.ndarray] = []
    for term in sorted(by_term):
        docs, _, _ = _decode_term(by_term[term], mask)
        keep = _keep(docs, mask)
        if keep is not None:
            docs = docs[keep]
        per_term.append(np.unique(docs))
    if mode == "and":
        out = per_term[0]
        for d in per_term[1:]:
            out = np.intersect1d(out, d, assume_unique=True)
            if len(out) == 0:
                break
    else:
        out = np.unique(np.concatenate(per_term)) if per_term else np.zeros(0, "uint64")
    return pd.DataFrame({"doc_id": out.astype(np.uint64).view(np.int64)})


def lm_u_fn(denom: float, mu: float):
    """Per-term LM-Dirichlet u factor (see ``scoring.lm_dirichlet_score``):
    u(tf, dl) = max(0, ln(1 + tf/denom) + ln(μ/(dl+μ))) with
    denom = μ·cf_t/C precomputed driver-side. Same operation order as the
    relational scorer so both paths agree to float precision."""

    def u(tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        return np.maximum(
            0.0, np.log(1.0 + tfs / denom) + np.log(mu / (dls + mu))
        )

    return u


def score_group_vectorized(
    pdf: pd.DataFrame,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    mode: str = "or",
    n_query_terms: int | None = None,
    mask: DocMask | None = None,
    after: "tuple[int, float] | None" = None,
    exclude_terms: "frozenset[str] | None" = None,
    u_fns: "dict[str, object] | None" = None,
    min_match: int | None = None,
) -> pd.DataFrame:
    """Exact OR (or AND) top-k within one doc_range group. Columns in:
    BLOCK_SCHEMA; out: (doc_id:int64, score:float64). ``mask``: decode-time
    doc mask — tombstones and/or filtered-search allow-set (see ``DocMask``).
    ``after``: search_after cursor, a (doc_id, score) result tuple — only
    rows strictly after it in result order survive the group-local top-k.

    ``exclude_terms``: boolean NOT (Lucene MUST_NOT) — a doc containing ANY
    of these terms is dropped. Their blocks arrive in the same pdf (same
    doc_range: range salting keys on doc_id, so a doc's postings for every
    term land in one group — the veto is complete with zero extra shuffle)
    but contribute no score; exclusion wins over a term that is also a
    positive query term. The per-block update watermark applies to the
    veto decode too: a SUPERSEDED version's occurrence of an excluded term
    must not veto the live doc.

    ``n_query_terms``: the FULL query's POSITIVE term count. AND semantics
    are global — a doc_range group holding blocks for only a subset of the
    query terms can contain no conjunctive match (its docs lack the absent
    terms entirely), so the group must return empty. Without this guard the
    kernel silently ANDed the present subset (found round 3: a doc with
    only 'apple' surfaced for 'apple AND banana' from a range 'banana'
    never reaches).

    ``min_match``: minimum_should_match (ES) — an OR doc survives only if
    it matches ≥ min_match DISTINCT positive query terms (mode="or" only;
    AND is min_match == |q| by construction). Complete in-group: see the
    inline comment at the filter.

    ``u_fns``: per-term override of the tf/dl → u factor (per-posting score
    = idf[t] · u_fns[t](tfs, dls) instead of idf[t] · bm25_u(…)) — how
    non-BM25 scorers (LM Dirichlet: weight = qtf, see ``lm_u_fn``) run on
    the same decoded postings. Exhaustive kernel only: the stored per-block
    ``max_u`` is the BM25 bound, so block-max pruning stays BM25-specific
    (Lucene similarly requires scorer-specific impacts for WAND)."""
    ex = exclude_terms or frozenset()
    by_term = _blocks_by_term(pdf)
    terms = sorted(t for t in by_term if t not in ex)
    if mode == "and" and n_query_terms is not None and len(terms) < n_query_terms:
        return _empty_result()
    if not terms:
        return _empty_result()
    not_docs: np.ndarray | None = None
    if ex:
        parts = [
            _decode_term(by_term[t], mask)[0] for t in sorted(ex) if t in by_term
        ]
        if parts:
            not_docs = np.unique(np.concatenate(parts))
    per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for term in terms:
        docs, tfs, dls = _decode_term(by_term[term], mask)
        keep = _keep(docs, mask)
        if keep is not None:
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        u = u_fns[term](tfs, dls) if u_fns is not None else bm25_u(tfs, dls, k1, b, avgdl)
        per_term[term] = (docs, idf[term] * u)

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
    elif min_match is not None and min_match > 1:
        # minimum_should_match: ≥m DISTINCT positive query terms. The count
        # is complete within this group because doc_range salting keys on
        # doc_id — every term's postings for a doc land in the same group
        # (same property the NOT veto and the global-AND guard rely on).
        keep = hits >= min_match
        uniq, acc = uniq[keep], acc[keep]
    if not_docs is not None:
        keep = _not_excluded(uniq, not_docs)
        if keep is not None:
            uniq, acc = uniq[keep], acc[keep]
    signed = uniq.view(np.int64)
    if after is not None:
        keep = _after_filter(signed, acc, after)
        signed, acc = signed[keep], acc[keep]
    idx = np.lexsort((signed, -acc))[:k]
    return pd.DataFrame({"doc_id": signed[idx], "score": acc[idx]})


def score_group_multi(
    pdf: pd.DataFrame,
    idfs: dict[str, dict[str, float]],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    prune: bool = False,
    mode: str = "or",
    mask: DocMask | None = None,
) -> pd.DataFrame:
    """Batched exact OR scoring for MANY queries over one doc_range group:
    every term's blocks are decoded ONCE and shared by all queries touching
    it — the per-query cost collapses to one numpy accumulate + top-k. Output
    (query_id, doc_id, score), ≤k rows per query; per-query floats are
    bit-identical to ``score_group_vectorized`` (same multiply-then-add
    sequence in ascending-term order).

    ``prune=True`` runs each query through the interval-sweep block-max
    kernel instead, with the block DECODE cache shared across the batch
    (idf-independent (docs, u) arrays): on idf-skewed corpora a query stops
    after its θ cutoff and skips blocks outright — <100% of its blocks
    decoded (pytest-proven) — while tie-breaks and float order stay
    identical to the exhaustive batch. On uniform corpora pruning cannot
    engage (bounds are flat), so exhaustive stays the throughput default.

    ``mode='and'`` runs each query's conjunctive kernel with the shared
    decode cache; a query whose term set is not fully present in this group
    contributes nothing (global-AND guard — the engine additionally empties
    queries with out-of-dictionary terms before the job)."""
    if mode == "and":
        raw_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        term_rows = {t: sub for t, sub in pdf.groupby("term", sort=False)}
        outs = []
        for qid in sorted(idfs):
            idf = idfs[qid]
            subs = [term_rows[t] for t in sorted(idf) if t in term_rows]
            if not subs or len(subs) < len(idf):
                continue  # a term has no blocks here → no conjunctive match
            res = _and_vectorized(
                pd.concat(subs), idf, k1, b, avgdl, k, raw_cache, mask
            )
            res.insert(0, "query_id", qid)
            outs.append(res)
        if not outs:
            return _empty_batch_result()
        return pd.concat(outs, ignore_index=True)

    if prune:
        raw_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        term_rows = {t: sub for t, sub in pdf.groupby("term", sort=False)}
        outs = []
        for qid in sorted(idfs):
            idf = idfs[qid]
            subs = [term_rows[t] for t in sorted(idf) if t in term_rows]
            if not subs:
                continue
            qpdf = pd.concat(subs)
            if int(qpdf["n_docs"].sum()) <= max(1024, 8 * k):
                res = score_group_vectorized(
                    qpdf, idf, k1, b, avgdl, k, mask=mask
                )
            else:
                res = _or_sweep(qpdf, idf, k1, b, avgdl, k, raw_cache, mask)
            res.insert(0, "query_id", qid)
            outs.append(res)
        if not outs:
            return _empty_batch_result()
        return pd.concat(outs, ignore_index=True)

    all_terms = sorted(pdf["term"].unique())
    per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for term, sub in _blocks_by_term(pdf).items():
        docs, tfs, dls = _decode_term(sub, mask)
        keep = _keep(docs, mask)
        if keep is not None:
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        per_term[term] = (docs, bm25_u(tfs, dls, k1, b, avgdl))
    # ONE unique over the union doc set; every query reuses the per-term
    # inverse slices — the per-query cost drops to memset + fancy adds, no
    # per-query sort (was the dominant batch cost)
    uniq, inv = np.unique(
        np.concatenate([per_term[t][0] for t in all_terms]), return_inverse=True
    )
    signed_all = uniq.view(np.int64)
    inv_of: dict[str, np.ndarray] = {}
    off = 0
    for t in all_terms:
        n_t = len(per_term[t][0])
        inv_of[t] = inv[off : off + n_t]
        off += n_t
    out_q: list[str] = []
    out_d: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    acc = np.zeros(len(uniq), dtype=np.float64)
    touched = np.zeros(len(uniq), dtype=bool)
    for qid in sorted(idfs):
        idf = idfs[qid]
        terms = [t for t in all_terms if t in idf]
        if not terms:
            continue
        acc[:] = 0.0
        touched[:] = False
        for t in terms:  # ascending-term accumulation == single-query kernel
            iv = inv_of[t]
            acc[iv] += idf[t] * per_term[t][1]
            touched[iv] = True
        tidx = np.flatnonzero(touched)
        sc = acc[tidx]
        sg = signed_all[tidx]
        idx = np.lexsort((sg, -sc))[:k]
        out_q.extend([qid] * len(idx))
        out_d.append(sg[idx])
        out_s.append(sc[idx])
    if not out_q:
        return _empty_batch_result()
    return pd.DataFrame(
        {
            "query_id": out_q,
            "doc_id": np.concatenate(out_d),
            "score": np.concatenate(out_s),
        }
    )


def _and_vectorized(
    pdf: pd.DataFrame,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    raw_cache: dict[int, tuple[np.ndarray, np.ndarray]] | None = None,
    mask: DocMask | None = None,
    after: "tuple[int, float] | None" = None,
) -> pd.DataFrame:
    """Vectorized conjunctive (AND) kernel with rare-term-driven block
    skipping — replaces the round-2 Python doc-at-a-time cursor loop.

    1. decode the SMALLEST term fully: its docs are the only possible
       matches (candidate set, sorted).
    2. for each remaining term in ascending-size order, decode ONLY the
       blocks whose [first_doc, last_doc] range contains a surviving
       candidate (two searchsorted calls over all blocks — no per-block
       Python), then keep candidates present in that term via one
       merge-membership pass; surviving state shrinks monotonically.
    3. final score = Σ over ASCENDING term order of idf·u (bit-identical
       to the exhaustive kernel's accumulation); top-k by (score desc,
       signed doc_id asc).

    Overlap-safe: blocks may interleave across streamed epochs — only
    per-term doc UNIQUENESS is assumed (append-only ingest invariant), and
    each term's decoded docs are sorted here, not trusted. ``raw_cache``
    (pdf row label → decoded (docs, u)) lets a batch caller share decodes
    across queries, same contract as ``_or_sweep``."""
    if raw_cache is None:
        raw_cache = {}
    by_term = _blocks_by_term(pdf)
    terms = sorted(by_term)
    sizes = {t: int(by_term[t]["n_docs"].sum()) for t in terms}
    filt_order = sorted(terms, key=lambda t: (sizes[t], t))

    def decode_rows(sub: pd.DataFrame, positions: np.ndarray):
        docs_l, u_l = [], []
        labels = sub.index.to_numpy()
        rows = list(sub.itertuples(index=False))
        for j in positions:
            lbl = int(labels[j])
            raw = raw_cache.get(lbl)
            if raw is None:
                r = rows[int(j)]
                dd, tt, ll = decode_block(
                    r.first_doc, r.n_docs, r.doc_bytes, r.tf_bytes, r.dl_bytes
                )
                alive = _alive_in_epoch(dd, _block_epoch(r), mask)
                if alive is not None:
                    dd, tt, ll = dd[alive], tt[alive], ll[alive]
                keep = _keep(dd, mask)
                if keep is not None:
                    dd, tt, ll = dd[keep], tt[keep], ll[keep]
                raw = (dd, bm25_u(tt, ll, k1, b, avgdl))
                raw_cache[lbl] = raw
            docs_l.append(raw[0])
            u_l.append(raw[1])
        return np.concatenate(docs_l), np.concatenate(u_l)

    rare = filt_order[0]
    d0, u0 = decode_rows(by_term[rare], np.arange(len(by_term[rare])))
    srt = np.argsort(d0)  # uint64 order
    cand = d0[srt]
    scores: dict[str, np.ndarray] = {rare: (idf[rare] * u0)[srt]}
    for t in filt_order[1:]:
        sub = by_term[t]
        first = sub["first_doc"].to_numpy(dtype=np.int64).view(np.uint64)
        last = sub["last_doc"].to_numpy(dtype=np.int64).view(np.uint64)
        lo = np.searchsorted(cand, first, side="left")
        hi = np.searchsorted(cand, last, side="right")
        need = np.flatnonzero(lo < hi)  # block holds ≥1 surviving candidate
        if len(need) == 0:
            return _empty_result()
        dt, ut_raw = decode_rows(sub, need)
        if len(dt) == 0:
            # every overlapping block decoded empty under the mask
            # (deletes/updates/doc_filter) — the fancy-index membership
            # below would index dt[-1] of a size-0 array; the exhaustive
            # kernel returns empty here, so must we
            return _empty_result()
        ut = idf[t] * ut_raw
        s2 = np.argsort(dt)
        dt, ut = dt[s2], ut[s2]
        pos = np.searchsorted(dt, cand)
        ok = (pos < len(dt)) & (dt[np.minimum(pos, len(dt) - 1)] == cand)
        if not ok.any():
            return _empty_result()
        cand = cand[ok]
        for prev in scores:
            scores[prev] = scores[prev][ok]
        scores[t] = ut[pos[ok]]

    acc = np.zeros(len(cand), dtype=np.float64)
    for t in terms:  # ascending-term accumulation == exhaustive kernel
        acc += scores[t]
    signed = cand.view(np.int64)
    if after is not None:
        keep = _after_filter(signed, acc, after)
        signed, acc = signed[keep], acc[keep]
    idx = np.lexsort((signed, -acc))[:k]
    return pd.DataFrame({"doc_id": signed[idx], "score": acc[idx]})


_U64_MAX = (1 << 64) - 1


def score_group_wand(
    pdf: pd.DataFrame,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    mode: str = "or",
    n_query_terms: int | None = None,
    mask: DocMask | None = None,
) -> pd.DataFrame:
    """Block-Max WAND top-k within one doc_range group; result identical to
    ``score_group_vectorized`` (tested, incl. exact-tie cases).

    OR mode is a fully VECTORIZED block-max formulation (replaces the classic
    doc-at-a-time CPython pivot loop, which benchmarked slower than the
    exhaustive numpy kernel — pruning only pays once the per-iteration
    constant factor is gone):

      1. interval sweep: all block [first_doc, last_doc] ranges decompose the
         doc-id axis into intervals; one numpy event sweep gives each
         interval's score upper bound Σ idf·block_max_u over active blocks.
         Rare terms enter the sweep as exact per-doc point impacts instead of
         block ranges (hybrid events) — see the inline comment.
      2. score intervals in DESCENDING bound order, a chunk at a time: decode
         only blocks overlapping the chunk (cached), accumulate exact scores
         with unique + fancy-index adds in ascending-term order.
      3. after each chunk θ = k-th best exact score so far; stop as soon as
         the next interval's bound is strictly below θ — every unscored doc
         lies in some remaining interval and is bounded by it, so it can
         neither beat θ nor tie-win (strict inequality).

    Python cost is O(#chunks) ≈ O(#blocks/64) — each doc and block is touched
    only by numpy. Accumulation per doc happens in ascending-term order, so
    scores are bit-identical to the exhaustive kernel and the Python oracle.
    Small groups (θ can't fill before the end) skip straight to the
    exhaustive kernel — measured crossover, see BENCH_SCALING.md."""
    terms = sorted(pdf["term"].unique())

    if mode == "and":
        # global-AND guard: a group missing any query term can't match
        if n_query_terms is not None and len(terms) < n_query_terms:
            return _empty_result()
        return _and_vectorized(pdf, idf, k1, b, avgdl, k, mask=mask)

    # ---- OR mode: interval-sweep block-max pruning ------------------------
    if int(pdf["n_docs"].sum()) <= max(1024, 8 * k):
        return score_group_vectorized(
            pdf, idf, k1, b, avgdl, k, mode, mask=mask
        )
    return _or_sweep(pdf, idf, k1, b, avgdl, k, {}, mask)


def _or_sweep(
    pdf: pd.DataFrame,
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    raw_cache: dict[int, tuple[np.ndarray, np.ndarray]],
    mask: DocMask | None = None,
) -> pd.DataFrame:
    """The vectorized interval-sweep block-max OR kernel (steps 1-3 of the
    ``score_group_wand`` docstring). ``raw_cache`` maps pdf row LABELS to the
    decoded (docs, u) arrays (idf-independent) so a batch caller can share
    one decode across many queries touching the same blocks; pass ``{}`` for
    the single-query path."""
    # global block table in ascending-(term, doc) order
    sub = pdf.sort_values(["term", "doc_range", "block_id"])
    rows = list(sub.itertuples(index=False))
    labels = sub.index.to_numpy()
    first = sub["first_doc"].to_numpy(dtype=np.int64).view(np.uint64)
    last = sub["last_doc"].to_numpy(dtype=np.int64).view(np.uint64)
    ubs = sub["term"].map(idf).to_numpy(dtype=np.float64) * sub["max_u"].to_numpy(
        dtype=np.float64
    )
    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def decode_j(j: int) -> tuple[np.ndarray, np.ndarray]:
        ent = decoded.get(j)
        if ent is None:
            lbl = int(labels[j])
            raw = raw_cache.get(lbl)
            if raw is None:
                r = rows[j]
                d, t, dl = decode_block(
                    r.first_doc, r.n_docs, r.doc_bytes, r.tf_bytes, r.dl_bytes
                )
                alive = _alive_in_epoch(d, _block_epoch(r), mask)
                if alive is not None:
                    d, t, dl = d[alive], t[alive], dl[alive]
                keep = _keep(d, mask)
                if keep is not None:
                    d, t, dl = d[keep], t[keep], dl[keep]
                raw = (d, bm25_u(t, dl, k1, b, avgdl))
                raw_cache[lbl] = raw
            ent = (raw[0], float(idf[rows[j].term]) * raw[1])
            decoded[j] = ent
        return ent

    # 1. event sweep → per-interval upper bound. HYBRID events: a RARE term's
    # few postings are decoded up front and enter the sweep as exact per-doc
    # point impacts (width-1), so a sparse high-idf block spanning the whole
    # id range cannot poison every interval's bound — this is what recovers
    # classic WAND's "skip between the rare term's postings" behaviour.
    # Common terms stay as [first, last] ranges bounded by idf·block_max_u.
    per_term = sub.groupby("term")["n_docs"].sum()
    sparse_terms = set(per_term[per_term <= max(256, 2 * k)].index)
    sparse_mask = sub["term"].isin(sparse_terms).to_numpy()
    dense_idx = np.flatnonzero(~sparse_mask)
    def _excl_end(last_arr: np.ndarray) -> np.ndarray:
        # exclusive end boundary last+1 WITHOUT uint64 wraparound: for
        # last == U64_MAX the block has no end event (weight 0 below keeps it
        # active through the final interval) but U64_MAX itself must still
        # enter bnd so the trailing region is a real interval — otherwise a
        # trailing block whose first_doc equals the max boundary would get
        # bi_start == n_int and silently vanish from every chunk and bound.
        return np.where(
            last_arr == np.uint64(_U64_MAX),
            np.uint64(_U64_MAX),
            last_arr + np.uint64(1),
        )

    ev_start = [first[dense_idx]]
    ev_end = [_excl_end(last[dense_idx])]
    ev_w = [ubs[dense_idx]]
    # conservative clamp: a block ending at U64_MAX stays active to the end
    end_w = [np.where(last[dense_idx] == np.uint64(_U64_MAX), 0.0, -ubs[dense_idx])]
    for j in np.flatnonzero(sparse_mask):
        d, s = decode_j(int(j))
        ev_start.append(d)
        ev_end.append(_excl_end(d))
        ev_w.append(s)
        end_w.append(np.where(d == np.uint64(_U64_MAX), 0.0, -s))
    starts = np.concatenate(ev_start)
    ends = np.concatenate(ev_end)
    bnd = np.unique(np.concatenate([starts, ends]))
    n_int = len(bnd) - 1
    if n_int <= 0:
        return _empty_result()
    delta = np.zeros(len(bnd) + 1, dtype=np.float64)
    # start indices clamped to the last interval: a start exactly at the max
    # boundary (only possible for the U64_MAX corner, where its end weight is
    # 0) merges into the final interval instead of falling off the sweep
    si = np.minimum(np.searchsorted(bnd, starts, side="left"), n_int - 1)
    np.add.at(delta, si, np.concatenate(ev_w))
    np.add.at(delta, np.searchsorted(bnd, ends, side="left"), np.concatenate(end_w))
    ub_sum = np.cumsum(delta)[:n_int]  # bound for interval [bnd[i], bnd[i+1])

    # block j is active over intervals [bi_start[j], bi_end[j]]; the clamps
    # cover the U64_MAX corner (a doc_id of exactly 2^64-1 — possible from
    # xxhash64 — would otherwise index one past the last interval)
    bi_start = np.minimum(np.searchsorted(bnd, first, side="left"), n_int - 1)
    bi_end = np.minimum(np.searchsorted(bnd, last, side="right") - 1, n_int - 1)

    # 2./3. descending-bound chunks with exact scoring and θ cutoff
    order = np.argsort(-ub_sum, kind="stable")
    got_docs: list[np.ndarray] = []
    got_scores: list[np.ndarray] = []
    n_scored = 0
    theta = -np.inf
    # first chunk small so θ exists BEFORE most intervals are touched (a
    # block interval holds ≤ BLOCK_SIZE docs, so 4 intervals ≈ up to ~512
    # docs — fills any practical k); the floor matters: on an
    # impact-ordered index (corpus.impact_ids) the winners sit in ~1 block
    # per group, so the first chunk IS the decode cost. Growth keeps
    # iterations O(log) when flat bounds prevent pruning.
    chunk_sz = 4
    ptr = 0
    while ptr < n_int:
        if n_scored >= k and ub_sum[order[ptr]] < theta:
            break  # strict: a bound tying θ could still win on doc_id
        chunk = order[ptr : ptr + chunk_sz]
        ptr += chunk_sz
        # geometric growth: iteration overhead stays O(log) when θ cannot
        # prune (flat bounds), full pruning granularity when it can
        chunk_sz *= 4
        if n_scored >= k:
            chunk = chunk[ub_sum[chunk] >= theta]
            if len(chunk) == 0:
                break
        in_chunk = np.zeros(n_int, dtype=bool)
        in_chunk[chunk] = True
        cum = np.concatenate(([0], np.cumsum(in_chunk)))
        need = np.flatnonzero(cum[bi_end + 1] - cum[bi_start] > 0)
        parts = []
        for j in need:  # ascending block order == ascending term order
            d, s = decode_j(int(j))
            keep = in_chunk[
                np.minimum(np.searchsorted(bnd, d, side="right") - 1, n_int - 1)
            ]
            if keep.any():
                parts.append((d[keep], s[keep]))
        if parts:
            all_docs = np.concatenate([p[0] for p in parts])
            uniq, inv = np.unique(all_docs, return_inverse=True)
            acc = np.zeros(len(uniq), dtype=np.float64)
            off = 0
            for d, s in parts:
                # docs unique within a part → plain fancy-index add; per-doc
                # adds arrive in ascending-term order (bit-stable)
                acc[inv[off : off + len(d)]] += s
                off += len(d)
            got_docs.append(uniq)
            got_scores.append(acc)
            n_scored += len(uniq)
            if n_scored >= k:
                allsc = np.concatenate(got_scores)
                theta = float(np.partition(allsc, len(allsc) - k)[len(allsc) - k])
    if not got_docs:
        return _empty_result()
    docs = np.concatenate(got_docs)
    scores = np.concatenate(got_scores)
    signed = docs.view(np.int64)
    idx = np.lexsort((signed, -scores))[:k]
    return pd.DataFrame({"doc_id": signed[idx], "score": scores[idx]})
