"""Porter2 (Snowball English) golden tests — vectors from the PUBLISHED
algorithm spec (snowballstem.org, "The English (Porter2) stemming
algorithm": the spec's own per-rule examples and exceptional-form lists)
plus classic pairs from the site's public sample vocabulary. This is the
snowball-exact parity mode for the reference's nltk SnowballStemmer
(``Part C/stemmer.py:4-14``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.porter2 import (
    porter2_term_udf,
    porter2_tokens_udf,
    stem_en,
    stem_tokens_en,
)

# --- the spec's exceptional forms (verbatim from the algorithm text) -------
EXCEPTIONAL = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

# --- invariant after step 1a (verbatim from the algorithm text) ------------
POST_1A_INVARIANT = [
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
]

# --- the spec's per-rule examples ------------------------------------------
SPEC_RULES = {
    # step 1a
    "ties": "tie", "cries": "cri", "gas": "gas", "this": "this",
    "gaps": "gap", "kiwis": "kiwi",
    # step 1b (at/bl/iz → +e; doubles → drop; short word → +e)
    "agreed": "agre", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail", "filing": "file",
    "hoping": "hope",
    # step 1c
    "cry": "cri", "by": "by", "say": "say",
    # region special-prefixes (gener/commun/arsen)
    "generate": "generat", "generates": "generat", "generated": "generat",
    "generating": "generat", "general": "general", "generally": "general",
    "generic": "generic", "generically": "generic", "generous": "generous",
    "generously": "generous",
    # longest-match-no-fallback discipline (step 2/3 miss R1, step 4 fires)
    "rational": "ration",
}

# --- classic sample-vocabulary pairs (snowballstem.org demo output) --------
SAMPLE_VOCAB = {
    "consign": "consign", "consigned": "consign", "consigning": "consign",
    "consignment": "consign", "consist": "consist", "consisted": "consist",
    "consistency": "consist", "consistent": "consist",
    "consistently": "consist", "consisting": "consist", "consists": "consist",
    "consolation": "consol", "consolations": "consol",
    "consolatory": "consolatori", "console": "consol", "consoled": "consol",
    "consoles": "consol", "consolidate": "consolid",
    "consolidated": "consolid", "consolidating": "consolid",
    "consoling": "consol", "consols": "consol", "consonant": "conson",
    "consort": "consort", "consorted": "consort", "consorting": "consort",
    "conspicuous": "conspicu", "conspicuously": "conspicu",
    "conspiracy": "conspiraci", "conspirator": "conspir",
    "conspirators": "conspir", "conspire": "conspir", "conspired": "conspir",
    "conspiring": "conspir", "constable": "constabl", "constables": "constabl",
    "constance": "constanc", "constancy": "constanc", "constant": "constant",
    "knack": "knack", "knackeries": "knackeri", "knacks": "knack",
    "knag": "knag", "knave": "knave", "knaves": "knave",
    "knavish": "knavish", "kneaded": "knead", "kneading": "knead",
    "knee": "knee", "kneel": "kneel", "kneeled": "kneel",
    "kneeling": "kneel", "kneels": "kneel", "knees": "knee",
    "knell": "knell", "knelt": "knelt", "knew": "knew",
    "knife": "knife", "knight": "knight", "knightly": "knight",
    "knights": "knight", "knit": "knit", "knits": "knit",
    "knitted": "knit", "knitting": "knit", "knives": "knive",
    "knob": "knob", "knobs": "knob", "knock": "knock",
    "knocked": "knock", "knocker": "knocker", "knockers": "knocker",
    "knocking": "knock", "knocks": "knock", "knot": "knot", "knots": "knot",
}


@pytest.mark.parametrize("word,expected", sorted(EXCEPTIONAL.items()))
def test_exceptional_forms(word, expected):
    assert stem_en(word) == expected


@pytest.mark.parametrize("word", POST_1A_INVARIANT)
def test_post_1a_invariants(word):
    assert stem_en(word) == word


@pytest.mark.parametrize("word,expected", sorted(SPEC_RULES.items()))
def test_spec_rule_examples(word, expected):
    assert stem_en(word) == expected


@pytest.mark.parametrize("word,expected", sorted(SAMPLE_VOCAB.items()))
def test_sample_vocabulary(word, expected):
    assert stem_en(word) == expected


def test_short_words_and_edges():
    assert stem_en("a") == "a"
    assert stem_en("be") == "be"
    assert stem_en("'cause") == "caus"  # initial apostrophe stripped
    assert stem_en("dog's") == "dog"  # step 0
    assert stem_tokens_en(None) is None
    assert stem_tokens_en(["running", None]) == ["run", None]


def test_udfs_match_pure_python(spark):
    words = sorted(set(SPEC_RULES) | set(SAMPLE_VOCAB) | set(EXCEPTIONAL))
    df = spark.createDataFrame([(w,) for w in words], "term string")
    got = {
        r["term"]: r["stem"]
        for r in df.select(
            "term", porter2_term_udf(F.col("term")).alias("stem")
        ).collect()
    }
    assert got == {w: stem_en(w) for w in words}

    arr = spark.createDataFrame([(words,)], "toks array<string>")
    (row,) = arr.select(porter2_tokens_udf(F.col("toks")).alias("s")).collect()
    assert row["s"] == [stem_en(w) for w in words]


def test_porter2_analyzer_stage_builds_and_searches(spark, tmp_path):
    """End-to-end: an index built under the porter2 analyzer conflates
    morphological variants at query time (query analyzed under the SAME
    pinned stage — Lucene's analyzer rule)."""
    from searchengine_spark.query.engine import SearchEngine

    rows = [
        (1, "the knights were knocking and consolidating"),
        (2, "a knight knocked to consolidate the merger"),
        (3, "streaming joins and windows"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    eng = SearchEngine(spark, str(tmp_path / "p2idx"))
    eng.build_index_from_df(
        df, id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
        analyzer="porter2",
    )
    assert {d for d, _ in eng.search("knight knocks", k=10, mode="and")} == {1, 2}
    assert {d for d, _ in eng.search("consolidated", k=10)} == {1, 2}
    assert {d for d, _ in eng.search("window", k=10)} == {3}


def test_porter2_has_no_duckdb_twin():
    from searchengine_spark.tokenizer import duckdb_analyze_text

    with pytest.raises(ValueError, match="porter2"):
        duckdb_analyze_text("text", analyzer="porter2")


def test_code_porter2_chain(spark, tmp_path):
    """'code+porter2': identifier splitting then snowball stemming — the
    chain a stemmed source-code index wants. camelCase query parts conflate
    with morphological variants in other docs."""
    from searchengine_spark.query.engine import SearchEngine

    rows = [
        (1, "def mergeSortedRuns(): pass"),
        (2, "merging the sorted run lists"),
        (3, "binary heap utilities"),
    ]
    eng = SearchEngine(spark, str(tmp_path / "cp2idx"))
    eng.build_index_from_df(
        spark.createDataFrame(rows, "doc_id long, text string"),
        id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
        analyzer="code+porter2",
    )
    # 'mergeSorted' → code-split 'merge sorted' → stems 'merg sort';
    # doc 2's 'merging'/'sorted' stem identically
    assert {d for d, _ in eng.search("mergeSorted", k=10, mode="and")} == {1, 2}
    assert {d for d, _ in eng.search("heaps", k=10)} == {3}


def test_stem_en_total_on_arbitrary_strings():
    """Robustness: the stemmer is TOTAL — any unicode input returns a str
    without raising (the tokenizer normally feeds it [a-z0-9_]+ tokens,
    but rewriters and user code may not)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40))
    def run(word):
        out = stem_en(word)
        assert isinstance(out, str)
        # lowercase-ascii words never grow by more than the +e rules allow
        if word.isascii() and word.isalpha():
            assert len(out) <= len(word) + 1

    run()
