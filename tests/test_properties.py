"""Property-based tests (hypothesis): codec roundtrips, tokenizer
implementation equivalence, multi-term encoder identity, stemmer invariants.
These cover the input space the fixed-seed tests can't enumerate."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.index.codec import (
    decode_block,
    encode_blocks,
    encode_terms_blocks,
    varbyte_decode,
    varbyte_encode,
)
from searchengine_spark.stemming import stem_py
from searchengine_spark.tokenizer import tokenize_py

# ------------------------------------------------------------------ varbyte

u64 = st.integers(min_value=0, max_value=2**64 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(u64, max_size=300))
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(u64, min_size=1, max_size=200))
def test_varbyte_length_bound(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = varbyte_encode(arr)
    assert len(buf) <= 10 * len(vals)
    # every encoded value terminates (last byte of stream has MSB clear)
    assert buf[-1] < 128


# ------------------------------------------------------------- block codec

posting_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**63 - 2),  # doc id (signed range)
        st.integers(min_value=1, max_value=10_000),  # tf
        st.integers(min_value=1, max_value=100_000),  # dl
    ),
    min_size=1,
    max_size=400,
    unique_by=lambda t: t[0],
)


@settings(max_examples=100, deadline=None)
@given(posting_lists, st.integers(min_value=1, max_value=64))
def test_block_roundtrip(postings, block_size):
    postings.sort()
    docs = np.array([p[0] for p in postings], dtype=np.uint64)
    tfs = np.array([p[1] for p in postings], dtype=np.uint64)
    dls = np.array([p[2] for p in postings], dtype=np.uint64)
    blocks = encode_blocks(docs, tfs, dls, 1.5, 0.75, 50.0, block_size)
    out_d, out_t, out_dl = [], [], []
    for blk in blocks:
        d, t, dl = decode_block(
            blk["first_doc"], blk["n_docs"], blk["doc_bytes"], blk["tf_bytes"], blk["dl_bytes"]
        )
        assert len(d) == blk["n_docs"]
        assert int(d[-1].view(np.int64)) == blk["last_doc"]
        out_d += d.tolist()
        out_t += t.tolist()
        out_dl += dl.tolist()
    assert out_d == docs.tolist()
    assert out_t == tfs.tolist()
    assert out_dl == dls.tolist()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(posting_lists, min_size=1, max_size=5),
    st.integers(min_value=1, max_value=32),
)
def test_multi_term_encoder_identity(term_lists, block_size):
    """encode_terms_blocks ≡ per-term encode_blocks for arbitrary shapes."""
    docs_l, tfs_l, dls_l, starts, ends = [], [], [], [], []
    pos = 0
    for plist in term_lists:
        plist.sort()
        docs_l += [p[0] for p in plist]
        tfs_l += [p[1] for p in plist]
        dls_l += [p[2] for p in plist]
        starts.append(pos)
        pos += len(plist)
        ends.append(pos)
    docs = np.array(docs_l, dtype=np.uint64)
    tfs = np.array(tfs_l, dtype=np.uint64)
    dls = np.array(dls_l, dtype=np.uint64)
    got = encode_terms_blocks(
        docs, tfs, dls, np.array(starts), np.array(ends), 1.5, 0.75, 40.0, block_size
    )
    gi = 0
    for ti, (s, e) in enumerate(zip(starts, ends)):
        for bi, blk in enumerate(
            encode_blocks(docs[s:e], tfs[s:e], dls[s:e], 1.5, 0.75, 40.0, block_size)
        ):
            assert got["term_idx"][gi] == ti and got["block_id"][gi] == bi
            assert got["doc_bytes"][gi] == blk["doc_bytes"]
            assert got["tf_bytes"][gi] == blk["tf_bytes"]
            assert got["dl_bytes"][gi] == blk["dl_bytes"]
            assert float(got["max_u"][gi]) == blk["max_u"]
            gi += 1
    assert gi == len(got["block_id"])


# ---------------------------------------------------------------- tokenizer

@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_tokenizer_total_and_stable(text):
    toks = tokenize_py(text)
    assert toks == tokenize_py(text)
    for t in toks:
        assert len(t) >= 2 and t == t.lower()
        assert t not in ("the", "and", "of")


# ------------------------------------------------------------------ stemmer

@settings(max_examples=300, deadline=None)
@given(st.from_regex(r"[a-z]{1,20}", fullmatch=True))
def test_stemmer_invariants(word):
    out = stem_py(word)
    assert out == stem_py(out) or len(stem_py(out)) <= len(out)  # shrinks or stable-ish
    assert len(out) <= len(word) + 1  # 'ies'→'i', 'ement'→'e' never grow >1
    assert out.islower() or out == word


# -------------------------------------------------------------- AND kernel

_and_docs = st.dictionaries(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),  # signed doc ids
    st.fixed_dictionaries(
        {},
        optional={
            "a": st.integers(1, 5),
            "b": st.integers(1, 5),
            "c": st.integers(1, 5),
        },
    ).filter(lambda ts: ts),  # every doc carries ≥1 term
    min_size=1,
    max_size=60,
)


@settings(max_examples=40, deadline=None)
@given(_and_docs, st.integers(min_value=1, max_value=10))
def test_and_kernel_matches_bruteforce(docs, k):
    """The vectorized conjunctive kernel == brute-force set intersection +
    ascending-term score sum, on random corpora whose per-term posting runs
    are SPLIT into two interleaved 'epochs' (overlapping block ranges — the
    streamed-index shape) and tiny blocks (forces multi-block skipping)."""
    import pandas as pd

    from searchengine_spark.index.codec import bm25_u as _u
    from searchengine_spark.query import wand as W

    k1, b, avgdl = 1.5, 0.75, max(
        1.0, sum(sum(ts.values()) for ts in docs.values()) / len(docs)
    )
    terms = sorted({t for ts in docs.values() for t in ts})
    idf = {t: 1.0 + i * 0.37 for i, t in enumerate(terms)}
    dls = {d: sum(ts.values()) for d, ts in docs.items()}

    rows = []
    for t in terms:
        posting = sorted(
            (int(np.int64(d).astype(np.uint64)), docs[d][t], dls[d])
            for d in docs
            if t in docs[d]
        )
        for run in (posting[0::2], posting[1::2]):  # interleaved epochs
            if not run:
                continue
            darr = np.array([p[0] for p in run], dtype=np.uint64)
            tarr = np.array([p[1] for p in run], dtype=np.uint64)
            larr = np.array([p[2] for p in run], dtype=np.uint64)
            for i, blk in enumerate(
                encode_blocks(darr, tarr, larr, k1, b, avgdl, block_size=3)
            ):
                rows.append(
                    {"term": t, "doc_range": 0, "block_id": i, **blk}
                )
    pdf = pd.DataFrame(rows)

    inter = [d for d, ts in docs.items() if all(t in ts for t in terms)]
    expect = {
        d: sum(
            idf[t] * float(_u(np.array([docs[d][t]]), np.array([dls[d]]),
                             k1, b, avgdl)[0])
            for t in terms
        )
        for d in inter
    }

    got_and = W.score_group_wand(
        pdf, idf, k1, b, avgdl, k, mode="and", n_query_terms=len(terms)
    )
    got_vec = W.score_group_vectorized(
        pdf, idf, k1, b, avgdl, k, mode="and", n_query_terms=len(terms)
    )
    assert got_and.equals(got_vec)
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert list(got_and["doc_id"]) == [d for d, _ in want]
    for (_, ws), gs in zip(want, got_and["score"]):
        assert abs(ws - gs) < 1e-9


# ----------------------------------------------------- sequence packing twin

pack_corpus = st.lists(
    st.tuples(
        # negative ids matter: xxhash64 doc ids are negative half the time
        # and pmod (Spark) vs sign-of-dividend % (naive SQL) diverge there
        st.integers(min_value=-10_000, max_value=10_000),
        st.integers(min_value=1, max_value=50),      # n_tok
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(max_examples=50, deadline=None)
@given(pack_corpus, st.integers(min_value=1, max_value=17),
       st.integers(min_value=1, max_value=5))
def test_pack_docs_sql_twin_matches_python(docs, cap, n_groups):
    """The DuckDB twin (same span arithmetic the Spark op uses) must equal
    a from-scratch Python re-pack on random doc lengths — catches bin
    boundary off-by-ones (doc ends exactly on a bin edge, 1-token docs,
    docs spanning many bins)."""
    import duckdb

    from searchengine_spark.ops.packing import pack_docs_sql

    rows = [(i, " ".join(["tk"] * n)) for i, n in docs]
    expected = set()
    groups: dict[int, list[tuple[int, int]]] = {}
    for i, n in sorted(docs):
        groups.setdefault(i % n_groups, []).append((i, n))
    for gid, ds in groups.items():
        off = 0
        for i, n in ds:
            start, end = off, off + n
            for b in range(start // cap, (end - 1) // cap + 1):
                expected.add(
                    (gid, b, i, max(0, b * cap - start), min(n, (b + 1) * cap - start))
                )
            off = end
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = set(map(tuple, con.execute(pack_docs_sql("t", cap, n_groups)).fetchall()))
    assert got == expected


# ------------------------------------------------------- line dedup twin

line_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1_000),
        st.lists(st.sampled_from(["aa", "bb", "cc", ""]), max_size=6),
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


@settings(max_examples=50, deadline=None)
@given(line_docs)
def test_line_dedup_sql_twin_matches_python(docs):
    """First-occurrence-wins over a tiny line alphabet (forcing heavy
    cross-doc collisions) vs a brute-force scan."""
    import duckdb

    from searchengine_spark.ops.dedup import line_dedup_sql

    rows = [(i, "\n".join(lines)) for i, lines in docs]
    # brute force: global first occurrence by (doc_id, line_no); empty dropped
    occ: dict[str, list[tuple[int, int]]] = {}
    for i, lines in sorted(docs):
        for no, ln in enumerate(lines):
            if ln:
                occ.setdefault(ln, []).append((i, no))
    expected = {
        (min(v)[0], min(v)[1], ln, len(v)) for ln, v in occ.items()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    lines_sql = (
        "SELECT doc_id, (g.i - 1)::BIGINT AS line_no, ln[g.i] AS line "
        "FROM (SELECT doc_id, string_split(text, chr(10)) AS ln FROM t), "
        "LATERAL (SELECT unnest(generate_series(1, len(ln))) AS i) g "
        "WHERE length(ln[g.i]) > 0"
    )
    got = set(map(tuple, con.execute(line_dedup_sql(lines_sql)).fetchall()))
    assert got == expected
