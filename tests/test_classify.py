"""Multinomial NB: distributed train+predict must match a pure-Python
reference exactly (same α-smoothing; OOV-only docs get the prior
argmax, never dropped), and
self-classification on the synthetic lang-labelled corpus must beat the
majority baseline by a wide margin."""

from __future__ import annotations

import math
import re

import pytest

from searchengine_spark.ops.classify import nb_predict, nb_train
from searchengine_spark.tokenizer import STOPWORDS, TOKEN_PATTERN


def _toks(text):
    return [t for t in re.findall(TOKEN_PATTERN, text.lower()) if t not in STOPWORDS]


def _brute(train, test, alpha=1.0):
    from collections import Counter, defaultdict

    cls_docs, cls_tokens, tok_cnt = Counter(), Counter(), defaultdict(Counter)
    vocab = set()
    for _, text, label in train:
        ts = _toks(text)
        cls_docs[label] += 1
        cls_tokens[label] += len(ts)
        tok_cnt[label].update(ts)
        vocab.update(ts)
    n, v = len(train), len(vocab)
    out = {}
    for did, text, _ in test:
        ts = [t for t in _toks(text) if t in vocab]
        # empty ts (OOV-only doc): the sum vanishes and the prediction is
        # the prior argmax — the doc still gets a row
        best = None
        for label in sorted(cls_docs):
            s = math.log(cls_docs[label] / n)
            for t in ts:
                s += math.log(
                    (tok_cnt[label][t] + alpha) / (cls_tokens[label] + alpha * v)
                )
            s = round(s, 5)
            if best is None or s > best[1] or (s == best[1] and label < best[0]):
                best = (label, s)
        out[did] = best
    return out


TRAIN = [
    (1, "der hund läuft schnell durch den wald", "de"),
    (2, "die katze schläft auf dem sofa gemütlich", "de"),
    (3, "the dog runs quickly through the forest", "en"),
    (4, "a cat sleeps on the comfortable sofa", "en"),
    (5, "le chien court vite dans la forêt", "fr"),
    (6, "le chat dort sur le canapé confortable", "fr"),
]
TEST = [
    (11, "der hund schläft auf dem sofa", "de"),
    (12, "the cat runs through the forest", "en"),
    (13, "le chien dort dans la forêt", "fr"),
    (14, "hund katze wald sofa", "de"),
]


def test_nb_matches_python_reference(spark):
    tr = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
    te = spark.createDataFrame(TEST, "doc_id long, text string, lang string")
    model = nb_train(tr, "lang")
    got = {
        r["doc_id"]: (r["pred"], r["score"]) for r in nb_predict(model, te).collect()
    }
    want = _brute(TRAIN, TEST)
    assert got.keys() == want.keys()
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-5)


def test_nb_separable_corpus_high_accuracy(spark):
    # deterministic 3-class corpus: distinct class token pools + shared noise
    pools = {
        "a": ["alpha", "apex", "anchor", "atlas"],
        "b": ["bravo", "basalt", "boulder", "binder"],
        "c": ["cedar", "cobalt", "canyon", "cipher"],
    }
    noise = ["data", "value", "common", "word"]
    rows = []
    for i in range(240):
        label = "abc"[i % 3]
        p = pools[label]
        toks = [p[(i * 7 + j) % 4] for j in range(6)] + [noise[(i + j) % 4] for j in range(3)]
        rows.append((i, " ".join(toks), label))
    train = [r for r in rows if r[0] % 2 == 0]
    test = [r for r in rows if r[0] % 2 == 1]
    tr = spark.createDataFrame(train, "doc_id long, text string, lang string")
    te = spark.createDataFrame(test, "doc_id long, text string, lang string")
    pred = nb_predict(nb_train(tr, "lang"), te)
    joined = pred.join(te.select("doc_id", "lang"), "doc_id")
    assert joined.filter("pred = lang").count() / joined.count() > 0.95


def test_nb_oov_only_doc_predicts_prior_argmax(spark):
    """A doc whose tokens are all out-of-vocabulary must NOT vanish from
    the output (a curation pipeline joining predictions back would lose it
    silently): the standard multinomial-NB answer for an empty feature
    vector is the prior argmax — with TRAIN's equal class priors, the
    label-asc tie-break ('de') at score round(ln(2/6), 5)."""
    tr = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
    te = spark.createDataFrame(
        [(99, "completely unknownwords zzzqqq", "en"),
         (12, "the cat runs through the forest", "en")],
        "doc_id long, text string, lang string",
    )
    model = nb_train(tr, "lang")
    rows = {r["doc_id"]: r for r in nb_predict(model, te).collect()}
    assert set(rows) == {12, 99}
    assert rows[99]["pred"] == "de"
    assert rows[99]["score"] == pytest.approx(round(math.log(2 / 6), 5))
    want = _brute(TRAIN, [(99, "completely unknownwords zzzqqq", "en")])
    assert (rows[99]["pred"], rows[99]["score"]) == want[99]


def test_nb_sql_twin_keeps_oov_docs(spark):
    """The DuckDB twin must mirror the prior-argmax convention row for
    row, or the driver's hash compare would split on any empty-text doc."""
    import duckdb

    import pandas as pd

    from searchengine_spark.ops.classify import nb_train_predict_sql

    tr_pd = pd.DataFrame(TRAIN, columns=["doc_id", "text", "lang"])
    te_pd = pd.DataFrame(
        TEST + [(99, "completely unknownwords zzzqqq", "en")],
        columns=["doc_id", "text", "lang"],
    )
    con = duckdb.connect()
    con.register("tr_tbl", tr_pd)
    con.register("te_tbl", te_pd)
    got_sql = {
        (int(d), p, float(s))
        for d, p, s in con.execute(
            nb_train_predict_sql("tr_tbl", "te_tbl", "lang")
        ).fetchall()
    }
    tr = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
    te = spark.createDataFrame(
        TEST + [(99, "completely unknownwords zzzqqq", "en")],
        "doc_id long, text string, lang string",
    )
    got_spark = {
        (int(r["doc_id"]), r["pred"], float(r["score"]))
        for r in nb_predict(nb_train(tr, "lang"), te).collect()
    }
    assert got_sql == got_spark


def test_empty_training_docs_count_in_priors(spark):
    """Docs with no tokens still belong to their class: priors must come
    from source-frame doc counts (token-stream counting dropped them and
    the priors stopped summing to 1)."""
    import math

    from searchengine_spark.ops.classify import nb_train

    rows = (
        [(i, "a", "") for i in range(30)]
        + [(100 + i, "a", "real text here") for i in range(20)]
        + [(200 + i, "b", "other words entirely") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = nb_train(df, label_col="lang")
    priors = {
        r["label"]: r["prior_log"] for r in model.class_stats.collect()
    }
    assert abs(priors["a"] - math.log(50 / 100)) < 1e-12
    assert abs(priors["b"] - math.log(50 / 100)) < 1e-12
