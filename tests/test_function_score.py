"""function_score (ES function-score query): field_value_factor +
filter-gated weights, score_mode/boost_mode combinations, no-match
passthrough — verified against a brute-force Python twin and the SQL
builder on DuckDB."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from searchengine_spark.scoring import function_score, function_score_sql

SCORED = [(1, 2.5), (2, 1.25), (3, 0.75), (4, 3.0), (5, 0.5)]
META = [
    (1, "en", 100),
    (2, "de", 400),
    (3, "en", 900),
    (4, "fr", 50),
    (5, "en", 2500),
]

FNS = [
    {"field_value_factor": {"field": "n_chars", "factor": 0.001,
                            "modifier": "ln1p"}, "weight": 1.0},
    {"weight": 0.4, "filter": {"field": "lang", "eq": "en"}},
]


@pytest.fixture(scope="module")
def frames(spark):
    scored = spark.createDataFrame(SCORED, "doc_id long, score double")
    meta = spark.createDataFrame(META, "doc_id long, lang string, n_chars long")
    return scored, meta


def _brute(score_mode, boost_mode, fns=FNS, dp=5):
    meta = {d: (lang, n) for d, lang, n in META}
    out = {}
    for d, s in SCORED:
        lang, n = meta[d]
        vals, conds = [], []
        for fn in fns:
            flt = fn.get("filter")
            c = True
            if flt is not None:
                if "eq" in flt:
                    c = c and (lang if flt["field"] == "lang" else n) == flt["eq"]
                if "gte" in flt:
                    c = c and n >= flt["gte"]
                if "lte" in flt:
                    c = c and n <= flt["lte"]
            conds.append(c)
            w = float(fn.get("weight", 1.0))
            if "field_value_factor" in fn:
                fvf = fn["field_value_factor"]
                x = n * fvf.get("factor", 1.0)
                if fvf.get("modifier") == "ln1p":
                    x = math.log(x + 1.0)
                elif fvf.get("modifier") == "sqrt":
                    x = math.sqrt(x)
                vals.append(round(x * w, dp))
            else:
                vals.append(round(w, dp))
        if not any(conds):
            out[d] = s
            continue
        mv = [v for c, v in zip(conds, vals) if c]
        if score_mode == "sum":
            fs = sum(v for c, v in zip(conds, vals) if c)
        elif score_mode == "multiply":
            fs = 1.0
            for v in mv:
                fs *= v
        else:
            fs = max(mv)
        fs = round(fs, dp)
        if boost_mode == "multiply":
            out[d] = round(s * fs, dp)
        elif boost_mode == "sum":
            out[d] = round(s + fs, dp)
        else:
            out[d] = fs
    return out


@pytest.mark.parametrize("score_mode", ["sum", "multiply", "max"])
@pytest.mark.parametrize("boost_mode", ["multiply", "sum", "replace"])
def test_function_score_matches_brute_force(frames, score_mode, boost_mode):
    scored, meta = frames
    got = {
        r["doc_id"]: r["score"]
        for r in function_score(
            scored, meta, FNS, score_mode=score_mode, boost_mode=boost_mode
        ).collect()
    }
    want = _brute(score_mode, boost_mode)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), (d, score_mode, boost_mode)


def test_no_match_keeps_score_unchanged(frames):
    """A doc matching no function passes through untouched in every
    boost_mode — including replace."""
    scored, meta = frames
    fns = [{"weight": 9.0, "filter": {"field": "lang", "eq": "zz"}}]
    for bm in ("multiply", "sum", "replace"):
        got = {
            r["doc_id"]: r["score"]
            for r in function_score(scored, meta, fns, boost_mode=bm).collect()
        }
        assert got == dict(SCORED)


def test_range_filter_gates(frames):
    scored, meta = frames
    fns = [{"weight": 2.0, "filter": {"field": "n_chars", "gte": 100, "lte": 900}}]
    got = {
        r["doc_id"]: r["score"]
        for r in function_score(
            scored, meta, fns, boost_mode="multiply"
        ).collect()
    }
    base = dict(SCORED)
    for d in got:
        n = next(n for dd, _, n in META if dd == d)
        if 100 <= n <= 900:
            assert got[d] == pytest.approx(round(base[d] * 2.0, 5), abs=1e-9)
        else:
            assert got[d] == base[d]


def test_sql_twin_matches(spark, frames):
    scored, meta = frames
    got = sorted(
        (r["doc_id"], r["score"])
        for r in function_score(
            scored, meta, FNS, score_mode="sum", boost_mode="sum"
        ).collect()
    )
    con = duckdb.connect()
    con.register("base_t", scored.toPandas())
    con.register("meta_t", meta.toPandas())
    sql = function_score_sql(
        "SELECT doc_id, score FROM base_t", "meta_t", FNS,
        score_mode="sum", boost_mode="sum",
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_validation(frames):
    scored, meta = frames
    with pytest.raises(ValueError):
        function_score(scored, meta, [])
    with pytest.raises(ValueError):
        function_score(scored, meta, FNS, score_mode="median")
    with pytest.raises(ValueError):
        function_score(scored, meta, FNS, boost_mode="avg")
    with pytest.raises(ValueError):
        function_score(
            scored, meta,
            [{"field_value_factor": {"field": "n_chars", "modifier": "log7"}}],
        ).collect()


# ------------------------------------------------------------ rank_feature
def _rf_brute(function, boost, pivot, scaling=1.0, exponent=1.0, dp=5):
    meta = {d: n for d, _, n in META}
    out = {}
    for d, s in SCORED:
        f = float(meta[d])
        if function == "saturation":
            v = f / (f + pivot)
        elif function == "log":
            v = math.log(scaling + f)
        else:
            v = f**exponent / (f**exponent + pivot**exponent)
        out[d] = round(s + round(boost * v, dp), dp)
    return out


@pytest.mark.parametrize(
    "function,kw",
    [
        ("saturation", {"pivot": 200.0, "boost": 2.0}),
        ("log", {"scaling": 1.0, "boost": 0.5}),
        ("sigmoid", {"pivot": 300.0, "exponent": 2.0, "boost": 1.5}),
    ],
)
def test_rank_feature_functions(spark, frames, function, kw):
    from searchengine_spark.scoring import rank_feature

    scored, meta = frames
    got = {
        r["doc_id"]: r["score"]
        for r in rank_feature(scored, meta, "n_chars", function=function, **kw).collect()
    }
    want = _rf_brute(function, kw.get("boost", 1.0), kw.get("pivot", 1.0),
                     kw.get("scaling", 1.0), kw.get("exponent", 1.0))
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-5), (d, function)


def test_rank_feature_monotone_and_bounded(spark, frames):
    """Saturation stays in [0, boost): equal-score docs order by feature,
    and the boost can never exceed `boost` no matter the feature value."""
    from searchengine_spark.scoring import rank_feature

    scored = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 1.0)], "doc_id long, score double"
    )
    meta = spark.createDataFrame(
        [(1, 10), (2, 10_000), (3, 10_000_000_000)], "doc_id long, n_chars long"
    )
    rows = {
        r["doc_id"]: r["score"]
        for r in rank_feature(
            scored, meta, "n_chars", boost=2.0, pivot=200.0
        ).collect()
    }
    # 5dp rounding lets the asymptote be REACHED (sat(1e10) rounds to 1.0)
    # but never exceeded: 1.0 + boost is the hard ceiling
    assert rows[1] < rows[2] <= rows[3] <= 3.0


def test_rank_feature_missing_feature(spark, frames):
    from searchengine_spark.scoring import rank_feature

    scored, _ = frames
    meta = spark.createDataFrame(
        [(1, 100)], "doc_id long, n_chars long"
    )  # docs 2-5 unmatched -> missing=0 -> saturation(0)=0 -> score unchanged
    rows = {
        r["doc_id"]: r["score"]
        for r in rank_feature(scored, meta, "n_chars", pivot=200.0).collect()
    }
    assert rows[2] == 1.25 and rows[5] == 0.5
    assert rows[1] > 2.5


def test_rank_feature_sql_twin(spark, frames):
    from searchengine_spark.scoring import rank_feature, rank_feature_sql

    scored, meta = frames
    got = sorted(
        (r["doc_id"], r["score"])
        for r in rank_feature(
            scored, meta, "n_chars", pivot=200.0, boost=2.0
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE base_t(doc_id BIGINT, score DOUBLE)")
    con.executemany("INSERT INTO base_t VALUES (?, ?)", SCORED)
    con.execute("CREATE TABLE meta_t(doc_id BIGINT, lang VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO meta_t VALUES (?, ?, ?)", META)
    sql = rank_feature_sql(
        "SELECT doc_id, score FROM base_t", "meta_t", "n_chars",
        pivot=200.0, boost=2.0,
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_rank_feature_unknown_function(frames):
    from searchengine_spark.scoring import rank_feature

    scored, meta = frames
    with pytest.raises(ValueError):
        rank_feature(scored, meta, "n_chars", function="tanh").collect()


# ------------------------------------------------------------ random_score
def test_random_score_deterministic_and_seeded(spark, frames):
    from searchengine_spark.scoring import random_score

    scored, _ = frames
    a = {r["doc_id"]: r["score"] for r in random_score(scored, seed=7).collect()}
    b = {r["doc_id"]: r["score"] for r in random_score(scored, seed=7).collect()}
    assert a == b  # same seed, same draw — across jobs
    c = {r["doc_id"]: r["score"] for r in random_score(scored, seed=8).collect()}
    assert a != c  # a different seed changes the draw
    # repartitioning must not change the draw (F.rand would fail this)
    d = {
        r["doc_id"]: r["score"]
        for r in random_score(scored.repartition(7), seed=7).collect()
    }
    assert a == d


def test_random_score_sql_twin(spark, frames):
    from searchengine_spark.scoring import random_score, random_score_sql

    scored, _ = frames
    got = sorted(
        (r["doc_id"], r["score"])
        for r in random_score(scored, seed=3, weight=0.5).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE base_t(doc_id BIGINT, score DOUBLE)")
    con.executemany("INSERT INTO base_t VALUES (?, ?)", SCORED)
    sql = random_score_sql("SELECT doc_id, score FROM base_t", seed=3, weight=0.5)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_random_score_replace_is_bounded(spark, frames):
    from searchengine_spark.scoring import random_score

    scored, _ = frames
    rows = random_score(scored, seed=1, boost_mode="replace").collect()
    assert all(0.0 <= r["score"] < 1.0 for r in rows)
    import pytest as _pt
    with _pt.raises(ValueError):
        random_score(scored, boost_mode="avg")


def test_decay_functions_match_python(spark):
    """gauss/exp/linear decay on numeric distance vs pure-Python math:
    value 1 at origin(±offset), exactly `decay` at `scale` away, linear
    clamps to 0 past s'."""
    import math

    from searchengine_spark.scoring import function_score

    rows = [(i, float(v)) for i, v in enumerate([0, 64, 128, 192, 256, 512, 1024, 2000])]
    scored = spark.createDataFrame(
        [(i, 1.0) for i, _ in rows], "doc_id long, score double"
    )
    meta = spark.createDataFrame(rows, "doc_id long, x double")

    def py_decay(typ, v, origin, scale, offset, decay):
        d = max(0.0, abs(v - origin) - offset)
        if typ == "gauss":
            s2 = -scale * scale / (2.0 * math.log(decay))
            return math.exp(-(d * d) / (2.0 * s2))
        if typ == "exp":
            return math.exp(math.log(decay) / scale * d)
        sp = scale / (1.0 - decay)
        return max((sp - d) / sp, 0.0)

    for typ in ("gauss", "exp", "linear"):
        spec = {"decay": {"type": typ, "field": "x", "origin": 128.0,
                          "scale": 256.0, "offset": 32.0, "decay": 0.5}}
        out = {
            r["doc_id"]: r["score"]
            for r in function_score(
                scored, meta, [spec], score_mode="sum", boost_mode="replace",
                round_dp=9,
            ).collect()
        }
        for i, v in rows:
            want = round(
                round(py_decay(typ, v, 128.0, 256.0, 32.0, 0.5), 9), 9
            )
            assert abs(out[i] - want) < 1e-9, (typ, v)
        # contract points: 1 inside the offset, `decay` at scale away
        assert abs(out[2] - 1.0) < 1e-9          # x=128 == origin
        at_scale = py_decay(typ, 128.0 + 32.0 + 256.0, 128.0, 256.0, 32.0, 0.5)
        assert abs(at_scale - 0.5) < 1e-12


def test_decay_validation_and_missing(spark):
    import pytest as _pt

    from searchengine_spark.scoring import function_score

    scored = spark.createDataFrame([(1, 2.0)], "doc_id long, score double")
    meta = spark.createDataFrame([(1, None)], "doc_id long, x double")
    # missing defaults to origin → no decay, value == weight
    out = function_score(
        scored, meta,
        [{"decay": {"type": "gauss", "field": "x", "origin": 10.0,
                    "scale": 5.0}, "weight": 4.0}],
        score_mode="sum", boost_mode="replace",
    ).collect()[0]["score"]
    assert abs(out - 4.0) < 1e-9
    for bad in (
        {"type": "gauss", "field": "x", "origin": 0.0, "scale": 0.0},
        {"type": "gauss", "field": "x", "origin": 0.0, "scale": 1.0, "decay": 1.0},
        {"type": "cosine", "field": "x", "origin": 0.0, "scale": 1.0},
    ):
        with _pt.raises(ValueError):
            function_score(scored, meta, [{"decay": bad}]).collect()
