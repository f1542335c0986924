"""Bundled synonym resource (`resources/synonyms_en.tsv`) — makes the
reference's thesaurus/WordNet searcher variants (`Part C/
searcher_thesaurus.py:40`, `searcher_word_net.py:40-41`) runnable without
external data: loader semantics, and the 0.2-weight expansion changing
ranking exactly the way the reference's rule does (synonym-only docs enter
the result set below exact-term docs)."""

from __future__ import annotations

import subprocess
import sys

from searchengine_spark.expansion import (
    EXPANSION_WEIGHT,
    load_synonyms,
    make_thesaurus_rewriter,
)
from searchengine_spark.query.engine import SearchEngine

ROWS = [
    (1, "the fast train left early"),          # exact query term
    (2, "a quick rapid response fleet"),       # synonyms only
    (3, "slow freight and heavy cargo"),       # unrelated
    (4, "fast quick service all day"),         # exact + synonym
]


def test_loader_groups_are_bidirectional_and_merged():
    syn = load_synonyms()
    assert "quick" in syn["fast"] and "fast" in syn["quick"]
    # 'fast' appears in several groups — memberships union, self excluded
    assert "speedy" in syn["fast"] and "swift" in syn["fast"]
    assert "fast" not in syn["fast"]
    assert all(lst == sorted(lst) for lst in syn.values())
    assert len(syn) > 300  # a real resource, not a stub


def test_rewriter_weights_match_reference_rule():
    rw = make_thesaurus_rewriter()
    out = dict(rw([("fast", 1)]))
    assert out["fast"] == 1.0
    assert out["quick"] == EXPANSION_WEIGHT
    # an expanded term that is ALSO a query term keeps full weight
    out2 = dict(rw([("fast", 1), ("quick", 1)]))
    assert out2["quick"] == 1.0


def test_expansion_changes_ranking_like_the_reference(spark, tmp_path):
    eng = SearchEngine(spark, str(tmp_path / "syn_idx"))
    eng.build_index_from_df(
        spark.createDataFrame(ROWS, "doc_id long, text string"),
        id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
    )
    plain = [d for d, _ in eng.search("fast", k=10)]
    assert set(plain) == {1, 4}  # no synonym docs without expansion
    expanded = eng.search("fast", k=10, rewriter=make_thesaurus_rewriter())
    ids = [d for d, _ in expanded]
    assert 2 in ids  # synonym-only doc now matches…
    scores = dict(expanded)
    # …but at the reduced 0.2 weight it cannot outrank an exact-term doc
    assert scores[2] < min(scores[1], scores[4])


def test_cli_synonyms_flag(spark, tmp_path):
    idx = str(tmp_path / "cli_syn_idx")
    eng = SearchEngine(spark, idx)
    eng.build_index_from_df(
        spark.createDataFrame(ROWS, "doc_id long, text string"),
        id_col="doc_id", text_col="text", n_buckets=2, range_bits=1,
    )
    out = subprocess.run(
        [sys.executable, "-m", "searchengine_spark.cli", "search",
         "--index", idx, "--query", "fast", "-k", "10",
         "--synonyms", "bundled"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json

    hits = json.loads(out.stdout.strip().splitlines()[-1])["hits"]
    assert {h["doc_id"] for h in hits} == {1, 2, 4}


def test_spell_rewriter_frequency_ranking():
    """Reference parity (`Part C/SpellChecker.py:10-24`): among equal-
    distance corrections the corpus-frequent word wins; without a
    frequency table the lexicographic fallback holds."""
    from searchengine_spark.expansion import make_spell_rewriter

    vocab = {"stream", "streak", "strean_x", "dream"}
    # 'strea' → distance-1 of both 'stream' and 'streak'
    no_freq = make_spell_rewriter(vocab)
    assert dict(no_freq([("strea", 1)])) == {"streak": 1.0}  # lexicographic
    freq = make_spell_rewriter(vocab, {"stream": 900, "streak": 3})
    assert dict(freq([("strea", 1)])) == {"stream": 1.0}  # frequency wins
    # in-vocab terms never rewritten, distance-2 also frequency-ranked
    assert dict(freq([("dream", 1)])) == {"dream": 1.0}
    f2 = make_spell_rewriter({"brook", "broke"}, {"broke": 5, "brook": 50})
    assert dict(f2([("brxxk", 1)])) == {"brook": 1.0}


def test_thesaurus_oracle_sql_escapes_quoted_synonyms(monkeypatch, tmp_path):
    """ADVICE r4 (low): a synonym containing an apostrophe must be escaped
    in the oracle's VALUES literal (latent — the bundled TSV is quote-free).
    Route a quoted entry through a custom resource file and check duckdb
    parses the generated SQL."""
    import duckdb

    from searchengine_spark import entry_queries as eq

    tsv = tmp_path / "syn.tsv"
    tsv.write_text("join\tdon't\n")
    import searchengine_spark.expansion as ex
    real = ex.make_thesaurus_rewriter
    monkeypatch.setattr(
        ex, "make_thesaurus_rewriter", lambda *a, **k: real(path=str(tsv))
    )
    sql = eq._bm25_thesaurus_sql("join")
    assert "'don''t'" in sql and "'don't'" not in sql.replace("''", "")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, "
        "'don''t join late'::VARCHAR AS text"
    )
    assert con.execute(sql).fetchall()  # parses and runs end-to-end


def test_spell_entry_corrections_match_duckdb_geometry(spark):
    """The bm25_spell driver entry's premise, pinned locally: the Python
    _edits1-chain candidate geometry (transposition = 1 edit) must agree
    with DuckDB's damerau_levenshtein ranking for the entry's query against
    the real sf0.01 vocabulary."""
    import duckdb

    from searchengine_spark.entry_queries import SPELL_QUERY, _tf
    from searchengine_spark.expansion import make_spell_rewriter, rewrite_query
    from searchengine_spark.postings import dictionary

    dct = dictionary(_tf(spark, "/root/testdata/sf0.01")).toPandas()
    rw = make_spell_rewriter(
        set(dct["term"]), dict(zip(dct["term"], dct["cf"].astype(int)))
    )
    py = {t for t, _ in rewrite_query(SPELL_QUERY, rw)}

    con = duckdb.connect()
    con.register("dict_df", dct)
    sql_corr = set()
    for qt in set(SPELL_QUERY.split()):
        row = con.execute(
            "SELECT coalesce("
            "(SELECT term FROM dict_df WHERE term = ?),"
            "(SELECT term FROM dict_df WHERE damerau_levenshtein(?, term) <= 2"
            " ORDER BY damerau_levenshtein(?, term), cf DESC, term LIMIT 1),"
            "?)",
            [qt, qt, qt, qt],
        ).fetchone()
        sql_corr.add(row[0])
    assert py == sql_corr
    assert {"hash", "merge", "sort", "table"} == py  # the intended targets
