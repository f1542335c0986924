"""Tweet-mode parser parity ops (SURVEY.md §2.2 T5-T15)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark import tweetparser as tp


# ------------------------------------------------------- pure-Python spec
@pytest.mark.parametrize(
    ("text", "expected"),
    [
        # T7 hashtag split + whole tag
        ("#StayHome_Now everyone", ["#stayhome_now", "stay", "home", "now", "everyone"]),
        # T8 mention passthrough
        ("thanks @WHO team", ["@who", "thanks", "team"]),
        # T9 URL host/path, www stripped, excluded host dropped
        (
            "see https://www.example.org/covid/stats now",
            ["example.org", "covid", "stats", "see", "now"],
        ),
        ("link https://t.co/xyz1 ok", ["link", "ok"]),
        # T10 scale words and percents
        ("about 3 thousand cases", ["about", "3K", "cases"]),
        ("up 55 percent today", ["up", "55%", "today"]),
        ("cost 2500000 dollars", ["cost", "dollars", "2.5M"]),
        # T11 month-year date token
        ("since Jun 2008 rising", ["since", "jun2008", "rising"]),
        # T12 domain normalization
        ("covid And Corona cases", ["coronavirus", "coronavirus", "cases"]),
        # T14 RT + tweet-id removal
        ("RT 1234567890123456789 big news", ["big", "news"]),
    ],
)
def test_tweet_tokenize_cases(text, expected):
    assert sorted(tp.tweet_tokenize_py(text)) == sorted(expected)


def test_acronym_hashtag_split():
    toks = tp.tweet_tokenize_py("#COVID19Update")
    assert "#covid19update" in toks
    assert "covid" in toks and "update" in toks


def test_udf_matches_python(spark):
    texts = [
        "RT @user #LockDown2020 is 99 percent https://www.site.com/a_b done",
        "plain words only",
        "Jun 2021 and 4 million masks",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        r["doc_id"]: sorted(r["toks"])
        for r in df.select("doc_id", tp.tweet_tokenize(F.col("text")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == sorted(tp.tweet_tokenize_py(t)), t


# -------------------------------------------------------------------- T15
def test_entity_tokens_two_pass(spark):
    rows = [
        (1, "President Biden spoke in Washington today"),
        (2, "President Biden visited Europe"),
        (3, "Nothing capitalized here at all"),
        (4, "Grand Canyon is large"),  # appears once → dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["entity"]) for r in tp.entity_tokens(df).collect()}
    assert out == {(1, "President Biden"), (2, "President Biden")}


def test_entity_tokens_matches_duckdb(spark):
    import duckdb

    rows = [
        (1, "Alpha Beta and Alpha Beta again plus Gamma Delta"),
        (2, "Gamma Delta appears twice overall"),
        (3, "McDonald Trump should not leak Donald"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r["doc_id"], r["entity"]) for r in tp.entity_tokens(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    exp = sorted(
        tuple(r) for r in con.execute(tp.entity_tokens_sql("docs")).fetchall()
    )
    assert got == exp
