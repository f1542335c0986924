"""T17 lemmatization (opt-in, deterministic spacy stand-in): golden lemmas
and 3-way equality of the pure-Python / Arrow-UDF / Catalyst-expr surfaces —
the same contract the stemmer is held to (test_stemming.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark import lemma as L

GOLDEN = {
    # irregulars
    "went": "go", "children": "child", "was": "be", "people": "person",
    "better": "good", "women": "woman",
    # suffix rules → DICTIONARY forms (contrast: the stemmer gives 'studi')
    "studies": "study", "wolves": "wolf", "classes": "class",
    "matches": "match", "boxes": "box", "dogs": "dog",
    "policemen": "policeman",
    # guards
    "class": "class",   # -s rule must not fire on -ss
    "amen": "amen",     # -men rule min-stem-length guard
    "gas": "gas",       # stem too short
    "spark": "spark",   # no rule
}


def test_golden_lemmas():
    for w, want in GOLDEN.items():
        assert L.lemma_py(w) == want, w


def test_three_surfaces_equal(spark):
    words = sorted(GOLDEN) + ["quizzes", "wishes", "takes", "coming", "runs"]
    df = spark.createDataFrame([(words,)], "toks array<string>")
    via_expr = df.select(L.lemma_expr(F.col("toks")).alias("out")).first()["out"]
    via_udf = df.select(L.lemma_tokens_udf(F.col("toks")).alias("out")).first()["out"]
    via_py = L.lemma_tokens_py(words)
    assert list(via_expr) == via_py
    assert list(via_udf) == via_py


def test_differs_from_stemmer_where_it_should():
    from searchengine_spark.stemming import stem_py

    # the lemmatizer restores dictionary forms; the stemmer truncates
    assert L.lemma_py("studies") == "study" and stem_py("studies") == "studi"
    assert L.lemma_py("went") == "go" and stem_py("went") == "went"
