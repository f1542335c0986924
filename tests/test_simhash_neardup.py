"""SimHash Hamming near-dup join (Manku/Jain/Sarma WWW'07 banding).

Exactness claim under test: the (d+1)-band blocking is LOSSLESS — every
pair within Hamming distance d shares at least one exact band value
(pigeonhole) — so `simhash_neardup` must equal the brute-force all-pairs
popcount filter, pair for pair and distance for distance."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.ops.dedup import (
    SIMHASH_BITS,
    _simhash_bands,
    simhash,
    simhash_neardup,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _brute_pairs(sigs: dict[int, int], d: int) -> dict[tuple[int, int], int]:
    ids = sorted(sigs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= d:
                out[(a, b)] = h
    return out


def _corpus(spark, n=200):
    return (
        spark.read.parquet(DOCS)
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def test_band_decomposition_covers_all_bits():
    for d in range(0, 16):
        bands = _simhash_bands(d)
        assert len(bands) == d + 1
        assert sum(w for _, _, w in bands) == SIMHASH_BITS
        # contiguous, non-overlapping
        pos = 0
        for _, start, width in bands:
            assert start == pos and width >= 1
            pos += width


def test_neardup_equals_bruteforce(spark):
    df = _corpus(spark)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    for d in (3, 6, 10):
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_neardup(df, d=d).collect()
        }
        assert got == _brute_pairs(sigs, d), f"mismatch at d={d}"


def test_neardup_monotone_in_d(spark):
    df = _corpus(spark)
    p3 = {(r["doc_a"], r["doc_b"]) for r in simhash_neardup(df, d=3).collect()}
    p8 = {(r["doc_a"], r["doc_b"]) for r in simhash_neardup(df, d=8).collect()}
    assert p3 <= p8


def test_neardup_accepts_precomputed_signatures(spark):
    df = _corpus(spark, 120)
    sig = simhash(df)
    via_sig = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup(signatures=sig, d=6).collect()
    }
    via_df = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup(df, d=6).collect()
    }
    assert via_sig == via_df


def test_neardup_bucket_cap_bounds_pairs(spark):
    """Identical docs all land in one bucket per band; max_bucket keeps the
    smallest ids so the pair count is bounded by C(cap,2) per band."""
    rows = [(i, "alpha beta gamma delta common tokens") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = simhash_neardup(df, d=0).collect()
    assert len(full) == 30 * 29 // 2  # all identical → every pair, ham 0
    capped = simhash_neardup(df, d=0, max_bucket=5).collect()
    ids = {r["doc_a"] for r in capped} | {r["doc_b"] for r in capped}
    assert len(capped) == 5 * 4 // 2
    assert ids == set(range(5))  # smallest doc_ids kept, like minhash cap


def test_neardup_hamming_zero_is_exact_signature_match(spark):
    rows = [
        (1, "spark join stream table"),
        (2, "spark join stream table"),
        (3, "completely different words entirely unrelated content here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = simhash_neardup(df, d=0).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in got] == [(1, 2, 0)]


def test_simhash_mapside_identical_and_shuffle_free(spark):
    """The narrow-projection signature (the streaming-safe form) is
    bit-identical to the two-aggregation relational form and plans with
    zero Exchange."""
    from searchengine_spark.ops.dedup import simhash_mapside

    df = _corpus(spark, 250)
    a = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_mapside(df).collect()}
    assert a == b
    plan = simhash_mapside(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
