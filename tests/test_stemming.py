"""T16 opt-in stemmer: pure / UDF / Catalyst-expr three-way equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.stemming import stem_expr, stem_py, stem_tokens_udf

CASES = [
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("running", "runn"),
    ("joined", "join"),
    ("quickly", "quick"),
    ("tables", "table"),
    ("national", "nation"),        # ational guard fails, tional falls through
    ("rational", "ration"),        # same fall-through (ational guard fails on 'r')
    ("conditional", "condition"),
    ("optimization", "optimize"),
    ("agreement", "agree"),        # 'ement' → 'e': agre + e
    ("ss", "ss"),                  # too short for any rule
    ("ing", "ing"),                # suffix-only token stays
    ("xs", "xs"),                  # no vowel in stem → unchanged
]


@pytest.mark.parametrize(("word", "expected"), CASES)
def test_stem_py_cases(word, expected):
    assert stem_py(word) == expected


def test_one_rule_only():
    # 'ments' fires (→'ment'); the later 'ment' rule must NOT also fire
    assert stem_py("payments") == "payment"


def test_three_way_equality(spark):
    words = [w for w, _ in CASES] + ["payments", "flying", "cries", "classes"]
    df = spark.createDataFrame([(words,)], "toks array<string>")
    via_expr = df.select(stem_expr(F.col("toks")).alias("s")).collect()[0]["s"]
    via_udf = df.select(stem_tokens_udf(F.col("toks")).alias("s")).collect()[0]["s"]
    via_py = [stem_py(w) for w in words]
    assert via_expr == via_py
    assert via_udf == via_py


def test_stem_index_surfaces_survive_reanalysis(spark, tmp_path):
    """stem is NOT idempotent (classes→class→clas): surfaces that re-feed
    already-analyzed terms (phrase, MLT, common-terms, query-string must)
    must pass them through verbatim, not re-analyze — re-analysis turned
    them into dictionary misses that silently emptied results."""
    from searchengine_spark.query.engine import SearchEngine

    docs = spark.createDataFrame(
        [
            (1, "merge classes quickly"),
            (2, "merge payments daily"),
            (3, "unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    eng = SearchEngine(spark, idx)
    eng.build_index_from_df(
        docs, id_col="doc_id", text_col="text",
        n_buckets=2, range_bits=1, analyzer="stem", with_positions=True,
    )
    # phrase over a stem-analyzed index: 'classes' indexes as 'class';
    # re-analysis would look up stem('class')='clas' and find nothing
    assert {d for d, _ in eng.search_phrase("merge classes", k=5)} == {1}
    # scorer='lm' builds qtf under the index analyzer (was a KeyError)
    assert eng.search("merge classes", k=5, scorer="lm")
    # MLT re-feeds selected (analyzed) terms
    assert eng.more_like_this("merge classes quickly", k=5)


@pytest.mark.parametrize("plural,singular", [
    ("arguments", "argument"), ("organizations", "organization"),
    ("statements", "statement"), ("achievements", "achievement"),
    ("testings", "testing"), ("things", "thing"), ("moments", "moment"),
    ("classes", "class"), ("payments", "payment"),
])
def test_plural_and_singular_conflate(plural, singular):
    """The point of a stemmer: both forms of one word land on ONE index
    term (the old table sent 'arguments'→'argument' but 'argument'→'argu',
    so the two forms never matched each other)."""
    assert stem_py(plural) == stem_py(singular), (
        stem_py(plural), stem_py(singular)
    )


def test_final_ss_is_not_a_plural():
    assert stem_py("class") == "class"
    assert stem_py("dress") == "dress"
