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
