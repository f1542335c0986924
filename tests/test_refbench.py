"""The reference's OWN acceptance benchmark, end-to-end on its real data
(``Part C/test_part_c_students_old.py:99-195`` protocol): build < 60 s,
every query answered < 10 s, labels inner-joined, MAP/P@k/recall via the
faithful ``Part C/metrics.py`` re-implementation.

Published best-engine band (``Part C/test_results.txt``): MAP 0.6767 pure
BM25 / ~0.706 cosine-inner blends — WITH the GloVe model (not shipped in the
repo) powering query expansion and the euclidean re-rank. Our run is the
shipped code's no-model degradation path (base ordering only), so the
assertions pin "within a documented distance of the published band", plus
golden tests for the metric math itself.
"""

from __future__ import annotations

import pandas as pd
import pytest

from searchengine_spark import refbench as R

# ---------------------------------------------------------------- metrics
# Golden checks of the Part C/metrics.py semantics (labeled-only AP with
# relevant-retrieved denominator; order-preserving inner join).


def _toy_labeled():
    # query 1: ranked labeled docs y = [1, 0, 1]  → AP = (1/1 + 2/3)/2 = 5/6
    # query 2: ranked labeled docs y = [0, 1]     → AP = (1/2)/1 = 1/2
    return pd.DataFrame(
        {
            "query": [1, 1, 1, 2, 2],
            "tweet": ["a", "b", "c", "d", "e"],
            "y_true": [1, 0, 1, 0, 1],
        }
    )


def test_ref_map_golden():
    assert R.ref_map(_toy_labeled()) == pytest.approx((5 / 6 + 1 / 2) / 2)


def test_ref_map_zero_relevant_query_counts_as_zero():
    lab = pd.concat(
        [_toy_labeled(), pd.DataFrame({"query": [3], "tweet": ["f"], "y_true": [0]})]
    )
    assert R.ref_map(lab) == pytest.approx((5 / 6 + 1 / 2 + 0.0) / 3)


def test_ref_precision_and_head():
    lab = _toy_labeled()
    assert R.ref_precision(lab) == pytest.approx((2 / 3 + 1 / 2) / 2)
    # head(1): q1 → [1] mean 1.0; q2 → [0] mean 0.0
    assert R.ref_precision(lab, head=1) == pytest.approx(0.5)


def test_ref_recall_uses_full_label_totals():
    lab = _toy_labeled()
    labels = pd.DataFrame(
        {
            "query": [1, 1, 1, 1, 2, 2],
            "tweet": ["a", "b", "c", "x", "d", "e"],
            "y_true": [1, 0, 1, 1, 0, 1],
        }
    )
    # q1: retrieved 2 of 3 relevant; q2: 1 of 1
    assert R.ref_recall(lab, labels) == pytest.approx((2 / 3 + 1.0) / 2)


def test_label_join_preserves_rank_order_and_drops_unlabeled():
    ranked = pd.DataFrame({"query": [1, 1, 1], "tweet": ["c", "zz", "a"]})
    labels = pd.DataFrame(
        {"query": [1, 1], "tweet": ["a", "c"], "y_true": [1, 0]}
    )
    lab = R.label_results(ranked, labels)
    assert list(lab["tweet"]) == ["c", "a"]  # 'zz' dropped, order kept
    assert list(lab["y_true"]) == [0, 1]


# ------------------------------------------------------------- end-to-end

needs_data = pytest.mark.skipif(
    not R.data_available(), reason="reference benchmark data not present"
)


@pytest.fixture(scope="module")
def report(spark):
    return R.run_refbench(spark)


@needs_data
def test_protocol_time_bounds(report):
    # Part C harness: index build < 60 s, each query < 10 s
    assert report["n_docs"] == 8726
    assert report["n_queries"] == 35
    assert report["build_sec"] < 60
    assert report["single_query_sec"] < 10
    assert report["per_query_sec"] < 10


@needs_data
def test_every_query_returns_results(report):
    for name, m in report["scorers"].items():
        assert m["queries_with_results"] == 35, name
        assert m["n_results"] > 0, name


@needs_data
def test_map_within_published_band(report):
    """Base-ordering MAP must land near the published numbers; the residual
    gap is the missing (unshipped) GloVe model + documented parser
    deviations. Measured on 2026-08-17: cosine 0.666, bm25 0.610 (nltk
    stopwords); cosine 0.681, bm25 0.612 (minimal stopwords)."""
    sc = report["scorers"]
    assert sc["cosine"]["map"] >= R.PUBLISHED_MAP_BLEND - 0.06
    assert sc["bm25"]["map"] >= R.PUBLISHED_MAP_BM25 - 0.08
    for name, m in sc.items():
        assert 0.0 < m["map"] <= 1.0, name
        assert 0.0 <= m["precision"] <= 1.0, name
        assert m["recall"] >= 0.9, name  # we retrieve nearly every labeled
        # relevant doc (reference's own recall was 0.67-0.73)


@needs_data
def test_metric_internal_consistency(report):
    for name, m in report["scorers"].items():
        # P@5 of a decent ranking beats overall labeled precision of the
        # full (junk-tailed) list for at least the blend scorers
        assert m["p_at_5"] > 0.4, name


@needs_data
def test_stemmed_config_runs_the_full_protocol(spark):
    """The reference's opt-in ``toStem`` switch (``Part A/configuration.py:11``
    → SnowballStemmer), run through the snowball-exact porter2 UDF on both
    index and query sides. No published band exists (the reference's
    published runs used toStem=False); measured 2026-08-21: cosine MAP
    0.6655 vs 0.6811 unstemmed — stemming slightly HURTS this benchmark,
    matching the reference's own choice of default-off. Asserted: the
    protocol completes inside the reference's bounds with sane metrics."""
    out = R.run_refbench(spark, stem=True)
    assert out["stem"] is True
    assert out["build_sec"] < 60  # the reference harness bound
    sc = out["scorers"]
    assert sc["cosine"]["map"] >= 0.60
    assert sc["bm25"]["map"] >= 0.55
    for m in sc.values():
        assert m["recall"] >= 0.95
        assert m["queries_with_results"] == 35


@needs_data
def test_variant_family_parity(spark):
    """Engine variants 2/3/5 (spell/thesaurus/WordNet rewriters around the
    shipped ranker.py scorer) through the real benchmark. Shipped-code
    semantics: expansion weights are discarded (qtf=1), score =
    0.9·BM25(k=3,b=0.6) (the inner term is the always-0 shipped bug), top
    round(0.9·n) cutoff. Measured 2026-08-21 with the bundled synonym
    resource: base/spell MAP 0.6103 (no query term is misspelled, so spell
    ≡ base — same as the reference), thesaurus/wordnet MAP 0.6105 with
    recall +0.04-0.11pp, *_w02 (documented 0.2 weight honored) P@5 +0.6pp.
    Expansion barely moves MAP on these claim-like queries — consistent
    with the reference's own published findings (best configs don't use
    expansion)."""
    out = R.run_refbench_variants(spark)
    v = out["variants"]
    assert set(v) == {
        "base", "spell", "thesaurus", "thesaurus_w02", "wordnet",
        "wordnet_w02",
    }
    # no misspelled query terms → spell is rank-identical to base
    assert v["spell"]["map"] == v["base"]["map"]
    assert v["spell"]["n_results"] == v["base"]["n_results"]
    # expansion fired: terms added, result set grew, recall cannot drop
    for name in ("thesaurus", "wordnet"):
        assert v[name]["n_expanded_terms"] > 50
        assert v[name]["n_results"] > v["base"]["n_results"]
        assert v[name]["recall"] >= v["base"]["recall"]
        # weighted config reranks only (same candidate set)
        assert v[f"{name}_w02"]["n_results"] == v[name]["n_results"]
    # wordnet caps expansions at 2/term → strictly fewer than thesaurus
    assert (
        v["wordnet"]["n_expanded_terms"] < v["thesaurus"]["n_expanded_terms"]
    )
    # the family stays in the base scorer's quality band (±0.02 MAP): the
    # point of the table is the measured DELTA, not a quality jump
    for name, m in v.items():
        assert abs(m["map"] - v["base"]["map"]) < 0.02, name
        assert m["recall"] >= 0.9, name
