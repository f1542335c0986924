"""prepare_training_data (ops/pipeline.py): stage semantics on a
hand-built fixture where every stage's effect is enumerable, plus stage
toggles and the composed-SQL twin (the driver entry covers the sf-corpus
hash check; here we pin WHICH doc each stage kills and WHY).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops import pipeline

# fixture: doc 1 survives everything. Designed kills:
#   2 -> wrong language
#   3 -> one-token text, quality below threshold
#   4 -> exact duplicate of 1 (higher id loses)
#   5 -> near-duplicate of 1 (one word differs; Jaccard over 1-grams > tau)
#   6 -> contaminated (contains the benchmark doc's 3-gram)
#   7 -> survives (hash_unit(7, seed 34) = 0.204 < en rate 0.3)
#   8 -> sampled out (hash_unit(8, seed 34) = 0.870 >= 0.3)
# doc 1: hash_unit(1, seed 34) = 0.164 < 0.3 -> survives sampling too
ROWS = [
    (1, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "zz", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3, "en", "tiny"),
    (4, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (5, "en", "alpha beta gamma delta epsilon zeta eta theta iota OMEGA"),
    (6, "en", "benchmark question one answer two padding words here now ok"),
    (7, "en", "unique seven content words go here totally fresh stream one"),
    (8, "en", "unique eight content words flow here wholly novel stream two"),
]
BENCH = [(100, "en", "benchmark question one answer two")]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, lang string, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(BENCH, "doc_id long, lang string, text string")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_full_chain_kills_each_doc_for_its_reason(docs, bench):
    out = pipeline.prepare_training_data(
        docs, langs=("en",), min_quality=1.5, neardup=True, w=1, tau=0.8,
        bench=bench, contam_w=3, rates={"en": 0.3}, seed=34,
    )
    assert _ids(out) == [1, 7]


def test_stage_toggles(docs, bench):
    # only exact dedup is unconditional: it kills 2 and 4 (both are
    # byte-identical to doc 1; lang plays no role in the text digest)
    assert _ids(pipeline.prepare_training_data(docs, neardup=False)) == [
        1, 3, 5, 6, 7, 8
    ]
    # near-dup additionally kills 5 (Jaccard 9/11 >= 0.8 vs doc 1)
    assert _ids(
        pipeline.prepare_training_data(docs, neardup=True, w=1, tau=0.8)
    ) == [1, 3, 6, 7, 8]
    # decontamination alone kills 6
    assert _ids(
        pipeline.prepare_training_data(
            docs, neardup=False, bench=bench, contam_w=3)
    ) == [1, 3, 5, 7, 8]


def test_line_dedup_stage_rewrites_text(spark):
    rows = [
        (1, "en", "one two three four copy copy copy copy"),
        (2, "en", "five six seven eight copy copy copy copy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in pipeline.prepare_training_data(
            df, line_chunk=4, neardup=False
        ).collect()
    }
    # the shared 4-token chunk survives only in doc 1 (first occurrence)
    assert out[1] == "one two three four copy copy copy copy"
    assert out[2] == "five six seven eight"


def test_sql_twin_matches_on_fixture(spark, docs):
    import duckdb

    out = pipeline.prepare_training_data(
        docs, langs=("en",), min_quality=1.5, line_chunk=4,
        neardup=True, w=1, tau=0.8, rate=0.9, seed=3,
    ).toPandas()
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    sql = pipeline.prepare_training_data_sql(
        "t", langs=("en",), min_quality=1.5, line_chunk=4,
        neardup=True, w=1, tau=0.8, rate=0.9, seed=3,
    )
    odf = con.execute(sql).df()
    key = lambda d: sorted(map(tuple, d[sorted(d.columns)].itertuples(index=False, name=None)))
    assert key(out) == key(odf)
