"""Deterministic hash-based sampling: membership must be a pure function
of the row id (identical set at any parallelism), nested across rates,
stratified by exact per-stratum thresholds, and rate-solving must hit
target mixes. The driver entries `sample_deterministic` /
`sample_stratified` hash-check the exact selected SET against DuckDB —
row-for-row, not statistically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops.sampling import (
    rates_for_targets,
    sample_rate,
    sample_stratified,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


def test_partition_independence(spark, docs):
    a = {r[0] for r in sample_rate(docs, 0.2, seed=3).select("doc_id").collect()}
    b = {
        r[0]
        for r in sample_rate(docs.repartition(17), 0.2, seed=3)
        .select("doc_id")
        .collect()
    }
    assert a == b and a


def test_nested_rates(spark, docs):
    small = {r[0] for r in sample_rate(docs, 0.1).select("doc_id").collect()}
    big = {r[0] for r in sample_rate(docs, 0.3).select("doc_id").collect()}
    assert small < big


def test_rate_accuracy(spark, docs):
    n = docs.count()
    got = sample_rate(docs, 0.5).count()
    assert abs(got / n - 0.5) < 0.1


def test_seed_changes_set(spark, docs):
    a = {r[0] for r in sample_rate(docs, 0.3, seed=1).select("doc_id").collect()}
    b = {r[0] for r in sample_rate(docs, 0.3, seed=2).select("doc_id").collect()}
    assert a != b and abs(len(a) - len(b)) < 0.5 * len(a)


def test_stratified_equals_per_stratum_rate(spark, docs):
    rates = {"en": 0.4, "de": 1.0}
    got = {
        r[0]
        for r in sample_stratified(docs, rates, by="lang", seed=5)
        .select("doc_id")
        .collect()
    }
    want = set()
    for lang, rate in rates.items():
        sub = docs.filter(F.col("lang") == lang)
        want |= {r[0] for r in sample_rate(sub, rate, seed=5).select("doc_id").collect()}
    assert got == want and got
    # default_rate=0: other strata fully dropped
    langs = {
        r[0]
        for r in sample_stratified(docs, rates, by="lang", seed=5)
        .select("lang")
        .distinct()
        .collect()
    }
    assert langs == {"en", "de"}


def test_rates_for_targets_hits_mix(spark, docs):
    targets = {"en": 0.5, "de": 0.5}
    rates = rates_for_targets(docs, targets, by="lang", total=60)
    got = sample_stratified(docs, rates, by="lang").groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    # each stratum ≈ 30 docs (hash sampling is Bernoulli, allow slack)
    for lang in targets:
        assert 15 <= counts.get(lang, 0) <= 45


def test_temperature_targets(spark, docs):
    from searchengine_spark.ops.sampling import targets_for_temperature

    counts = {r["lang"]: r["count"]
              for r in docs.groupBy("lang").count().collect()}
    # alpha=1 reproduces natural frequency exactly
    nat = targets_for_temperature(docs, "lang", alpha=1.0)
    total = sum(counts.values())
    for k, n in counts.items():
        assert nat[k] == pytest.approx(n / total)
    # alpha=0 is uniform
    uni = targets_for_temperature(docs, "lang", alpha=0.0)
    for v in uni.values():
        assert v == pytest.approx(1.0 / len(counts))
    # alpha=0.3 flattens: low-resource share rises, high-resource falls,
    # relative order preserved, sums to 1
    t = targets_for_temperature(docs, "lang", alpha=0.3)
    assert sum(t.values()) == pytest.approx(1.0)
    lo = min(counts, key=counts.get)
    hi = max(counts, key=counts.get)
    assert t[lo] > nat[lo] and t[hi] < nat[hi]
    assert t[hi] >= t[lo]
    # composes with rates_for_targets
    rates = rates_for_targets(docs, t, by="lang", total=100)
    assert set(rates) == set(t) and all(0 < r <= 1.0 for r in rates.values())
    with pytest.raises(ValueError):
        targets_for_temperature(docs, "lang", alpha=-0.5)


def test_rates_validation(spark, docs):
    with pytest.raises(ValueError):
        sample_rate(docs, 1.5)
    with pytest.raises(ValueError):
        sample_stratified(docs, {"en": -0.1}, by="lang")


def test_split_by_group_no_leakage(spark, docs):
    """Every group lands wholly in one split; fractions are roughly
    honored; assignment is deterministic and matches the DuckDB twin."""
    import duckdb

    from searchengine_spark.ops.sampling import split_by_group, split_by_group_sql

    out = split_by_group(docs, by="source", seed=3)
    # leakage-safe: each source maps to exactly one split
    per_group = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert per_group == 1
    # deterministic across parallelism
    a = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_by_group(docs.repartition(7), by="source", seed=3)
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    # DuckDB twin reproduces the exact assignment
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    o = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT doc_id, split FROM ("
            + split_by_group_sql("documents", by="source", seed=3)
            + ") t"
        ).fetchall()
    }
    assert a == o


def test_split_by_group_fraction_validation(spark, docs):
    from searchengine_spark.ops.sampling import split_by_group

    with pytest.raises(ValueError):
        split_by_group(docs, by="source", fractions={"train": 0.5, "test": 0.1})


# ----------------------------------------------------- resample (rate > 1)
def test_resample_rate_repeat_factors(spark):
    """rate = 2.3: every row appears 2 or 3 times, the 3rd copy decided by
    the same unit hash sample_rate uses; copies are indexed 0..n-1."""
    from searchengine_spark.ops.sampling import (
        hash_unit, resample_rate, sample_rate,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = resample_rate(df, 2.3, seed=5).collect()
    per = {}
    for r in out:
        per.setdefault(r["doc_id"], []).append(r["copy"])
    assert set(per) == set(range(200))  # floor ≥ 1 → nobody drops out
    u = {
        r["doc_id"]: r["u"]
        for r in df.select("doc_id", hash_unit(F.col("doc_id"), 5).alias("u")).collect()
    }
    for d, copies in per.items():
        want = 3 if u[d] < 0.3 else 2
        assert sorted(copies) == list(range(want)), d
    # the fractional third copies ARE the rate-0.3 Bernoulli subset
    bern = {r["doc_id"] for r in sample_rate(df, 0.3, seed=5).collect()}
    assert {d for d, c in per.items() if len(c) == 3} == bern


def test_resample_stratified_mixture(spark):
    """Upsample en 2x exactly, drop de, pass fr through (default 1.0)."""
    from searchengine_spark.ops.sampling import resample_stratified

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = resample_stratified(df, {"en": 2.0, "de": 0.0}, by="lang").collect()
    langs = {}
    for r in out:
        langs.setdefault(r["lang"], []).append(r["doc_id"])
    assert "de" not in langs
    assert len(langs["en"]) == 60 and len(set(langs["en"])) == 30  # 2 copies
    assert len(langs["fr"]) == 30 == len(set(langs["fr"]))
    import pytest as _pt

    with _pt.raises(ValueError):
        resample_stratified(df, {"en": -1.0}, by="lang")


def test_resample_monotone_threshold(spark):
    """Same seed: the copy multiset at rate r is contained in the multiset
    at r' > r — mixtures can be re-weighted without reshuffling history."""
    from searchengine_spark.ops.sampling import resample_rate

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")

    def multiset(rate):
        out = {}
        for r in resample_rate(df, rate, seed=9).collect():
            out[r["doc_id"]] = out.get(r["doc_id"], 0) + 1
        return out

    low, high = multiset(1.2), multiset(1.7)
    assert all(low[d] <= high.get(d, 0) for d in low)


# ------------------------------------------------------- shuffle_shards
def test_shuffle_shards_is_permutation(spark, docs):
    """Every row lands in exactly one (shard, pos) cell; pos is dense
    1..|shard| within each shard."""
    from searchengine_spark.ops.sampling import shuffle_shards

    out = shuffle_shards(docs, 4, seed=3).select("doc_id", "shard", "pos")
    rows = out.collect()
    assert len(rows) == docs.count()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shuffle_shards_partition_independent(spark, docs):
    """The permutation is identical at any input partitioning — the whole
    point vs orderBy(rand); also stable across repeated runs."""
    from searchengine_spark.ops.sampling import shuffle_shards

    base = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in shuffle_shards(docs, 4, seed=3).collect()
    }
    repart = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in shuffle_shards(docs.repartition(13), 4, seed=3).collect()
    }
    assert base == repart


def test_shuffle_shards_balanced_and_seeded(spark, docs):
    """Shards are hash-balanced (within 4 sigma of uniform) and a
    different seed produces a different permutation."""
    from searchengine_spark.ops.sampling import shuffle_shards

    n = docs.count()
    sizes = {
        r["shard"]: r["c"]
        for r in shuffle_shards(docs, 4, seed=3)
        .groupBy("shard").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    exp = n / 4
    for c in sizes.values():
        assert abs(c - exp) < 4 * (exp ** 0.5) + 1
    a = {r["doc_id"]: r["pos"] for r in shuffle_shards(docs, 4, seed=3).collect()}
    b = {r["doc_id"]: r["pos"] for r in shuffle_shards(docs, 4, seed=4).collect()}
    assert a != b


def test_shuffle_shards_validation(spark, docs):
    import pytest as _pt

    from searchengine_spark.ops.sampling import shuffle_shards

    with _pt.raises(ValueError):
        shuffle_shards(docs, 0)


# ---------------------------------------------------------------------------
# mixture_plan: token-budget waterfilling
# ---------------------------------------------------------------------------

# sources with engineered token counts: "w" repeated n times per doc
_MIX_TOKENS = {"a": 120, "b": 400, "c": 60, "d": 900}
_MIX_WEIGHTS = {"a": 0.4, "b": 0.3, "c": 0.2, "d": 0.1}


def _mix_df(spark):
    rows = [
        (i, src, " ".join(["w"] * n))
        for i, (src, n) in enumerate(_MIX_TOKENS.items())
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mixture_plan_matches_iterative_twin(spark):
    from searchengine_spark.ops.sampling import mixture_plan, mixture_plan_py

    for budget, eps in [(700.0, 1.0), (700.0, 2.0), (300.0, 1.0), (5000.0, 3.0)]:
        got = {
            r["source"]: r["alloc_tokens"]
            for r in mixture_plan(
                _mix_df(spark), budget, _MIX_WEIGHTS, max_epochs=eps
            ).collect()
        }
        want = mixture_plan_py(_MIX_TOKENS, budget, _MIX_WEIGHTS, max_epochs=eps)
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-4, (budget, eps, k, got, want)
        total_cap = sum(n * eps for n in _MIX_TOKENS.values())
        assert abs(sum(got.values()) - min(budget, total_cap)) < 1e-3


def test_mixture_plan_invariants(spark):
    from searchengine_spark.ops.sampling import mixture_plan

    rows = mixture_plan(
        _mix_df(spark), 700.0, _MIX_WEIGHTS, max_epochs=2.0
    ).collect()
    for r in rows:
        cap = r["tokens_avail"] * 2.0
        assert r["alloc_tokens"] <= cap + 1e-6
        assert r["epochs"] <= 2.0 + 1e-6
        assert abs(r["share"] - r["alloc_tokens"] / 700.0) < 1e-4
    # c (60 tokens, weight .2 → target 140 > cap 120) must saturate
    byc = {r["source"]: r for r in rows}
    assert abs(byc["c"]["alloc_tokens"] - 120.0) < 1e-6
    assert abs(byc["c"]["epochs"] - 2.0) < 1e-6


def test_mixture_plan_matches_duckdb(spark):
    import duckdb

    from searchengine_spark.ops.sampling import mixture_plan, mixture_plan_sql

    df = _mix_df(spark)
    got = sorted(
        tuple(r)
        for r in mixture_plan(df, 700.0, _MIX_WEIGHTS, max_epochs=2.0).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, source VARCHAR, text VARCHAR)"
    )
    for row in df.collect():
        con.execute("INSERT INTO documents VALUES (?, ?, ?)", list(row))
    want = sorted(
        tuple(r)
        for r in con.execute(
            mixture_plan_sql("documents", 700.0, _MIX_WEIGHTS, max_epochs=2.0)
        ).fetchall()
    )
    assert got == want


def test_mixture_apply_matches_duckdb(spark):
    import duckdb

    from searchengine_spark.ops.sampling import mixture_apply, mixture_apply_sql

    df = _mix_df(spark)
    got = sorted(
        tuple(r)
        for r in mixture_apply(
            df, 700.0, _MIX_WEIGHTS, max_epochs=2.0, seed=3
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, source VARCHAR, text VARCHAR)"
    )
    for row in df.collect():
        con.execute("INSERT INTO documents VALUES (?, ?, ?)", list(row))
    want = sorted(
        tuple(r)
        for r in con.execute(
            mixture_apply_sql("documents", 700.0, _MIX_WEIGHTS, max_epochs=2.0, seed=3)
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_mixture_apply_epochs_semantics(spark):
    from searchengine_spark.ops.sampling import mixture_apply, mixture_plan

    # many single-token docs per source so fractional epochs are visible
    rows = []
    i = 0
    for src, n in [("a", 50), ("b", 200)]:
        for _ in range(n):
            rows.append((i, src, "w"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    weights = {"a": 0.5, "b": 0.5}
    plan = {
        r["source"]: r
        for r in mixture_plan(df, 200.0, weights, max_epochs=2.0).collect()
    }
    out = mixture_apply(df, 200.0, weights, max_epochs=2.0).groupBy("source").count()
    counts = {r["source"]: r["count"] for r in out.collect()}
    # a saturates at 2 epochs -> exactly 100 copies; b gets 100/200=0.5
    # epochs -> a hash-subset, so |b| is near 100 but not exact
    assert counts["a"] == 100
    assert abs(plan["b"]["epochs"] - 0.5) < 1e-6
    assert 70 <= counts["b"] <= 130
    # every copy index within floor(epochs)
    from pyspark.sql import functions as F

    mx = (
        mixture_apply(df, 200.0, weights, max_epochs=2.0)
        .groupBy("source")
        .agg(F.max("copy").alias("m"))
        .collect()
    )
    assert {r["source"]: r["m"] for r in mx} == {"a": 1, "b": 0}
