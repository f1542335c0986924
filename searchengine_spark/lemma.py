"""Opt-in English lemmatizer (SURVEY.md §2.2 T17).

The reference wires spacy behind ``toLemm`` (default False,
``Part C/parser_module.py:228-239`` — one ``nlp(word)`` call PER TOKEN, the
slowest possible shape). spacy is not in this container, so this is the
documented deterministic stand-in, mirroring the stemmer's contract
(stemming.py): a table of irregular forms plus ordered suffix rules that
produce DICTIONARY forms ("studies"→"study", "wolves"→"wolf") — unlike the
stemmer, which produces stems ("studies"→"studi"). Off by default exactly
like the reference; swap the table for a real model's output at the same
call sites when one is available.

Three pytest-equal surfaces, same as the stemmer: a pure function (the
oracle), an Arrow ``pandas_udf`` (batch path), and a Catalyst-only
expression (map lookup + coalesce'd suffix rules — stays in whole-stage
codegen, LINEAR expression tree; see ``stemming.stem_expr`` on why not a
when-chain).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# irregular lemmas (closed-class, the part no suffix rule can get right)
IRREGULAR: dict[str, str] = {
    "is": "be", "are": "be", "am": "be", "was": "be", "were": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "went": "go", "gone": "go", "goes": "go", "going": "go",
    "said": "say", "says": "say",
    "made": "make", "making": "make",
    "took": "take", "taken": "take", "taking": "take",
    "came": "come", "coming": "come",
    "saw": "see", "seen": "see",
    "got": "get", "gotten": "get", "getting": "get",
    "ran": "run", "running": "run",
    "children": "child", "men": "man", "women": "woman",
    "mice": "mouse", "feet": "foot", "teeth": "tooth", "people": "person",
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
}

_VOWEL = re.compile(r"[aeiouy]")

# ordered suffix rules: (suffix, replacement, min_stem_len); first match
# fires (guard fail keeps the word — same one-rule discipline as the stemmer)
RULES: tuple[tuple[str, str, int], ...] = (
    ("ies", "y", 2),      # studies → study
    ("ves", "f", 2),      # wolves → wolf
    ("sses", "ss", 1),    # classes → class
    ("ches", "ch", 2),    # matches → match
    ("shes", "sh", 2),    # wishes → wish
    ("xes", "x", 2),      # boxes → box
    ("zes", "z", 2),      # quizzes → quizz (approximate, documented)
    ("men", "man", 3),    # policemen → policeman ('amen' guarded by min len)
    ("s", "", 3),         # dogs → dog (not 'ss' — guarded below)
)


def lemma_py(word: str) -> str:
    irr = IRREGULAR.get(word)
    if irr is not None:
        return irr
    for suf, rep, min_len in RULES:
        if word.endswith(suf):
            if suf == "s" and word.endswith("ss"):
                return word
            stem = word[: len(word) - len(suf)]
            if len(stem) >= min_len and _VOWEL.search(stem):
                return stem + rep
            return word
    return word


def lemma_tokens_py(tokens: list[str]) -> list[str]:
    # NULL elements map to None like the Catalyst twin, not a crash
    return [lemma_py(t) if t is not None else None for t in tokens]


@F.pandas_udf(ArrayType(StringType()))
def lemma_tokens_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(
        lambda ts: [lemma_py(t) for t in ts] if ts is not None else ts
    )


def lemma_expr(token_array: Column) -> Column:
    """Catalyst-only lemmatizer over an array<string> column: irregular
    lookup via a literal map, then the coalesce'd per-rule candidates
    (linear tree — see stemming.stem_expr)."""
    irr_map = F.create_map(
        *[F.lit(x) for kv in sorted(IRREGULAR.items()) for x in kv]
    )

    def one(tok: Column) -> Column:
        cands = []
        for suf, rep, min_len in RULES:
            stem = F.substring(tok, F.lit(1), F.length(tok) - F.lit(len(suf)))
            guard = (F.length(stem) >= min_len) & stem.rlike("[aeiouy]")
            ruled = F.when(guard, F.concat(stem, F.lit(rep))).otherwise(tok)
            if suf == "s":
                ruled = F.when(tok.endswith("ss"), tok).otherwise(ruled)
            cands.append(F.when(tok.endswith(suf), ruled))
        return F.coalesce(irr_map.getItem(tok), *cands, tok)

    return F.transform(token_array, one)


def lemma_sql_case(col: str) -> str:
    """DuckDB twin of ``lemma_py``: irregular lookup (inline VALUES map)
    then the suffix CASE chain. Powers the driver's `term_normalization`
    hash check."""
    irr = ", ".join(f"('{k}', '{v}')" for k, v in sorted(IRREGULAR.items()))
    whens = []
    for suf, rep, min_len in RULES:
        stem = f"substr({col}, 1, length({col}) - {len(suf)})"
        guard = f"length({stem}) >= {min_len} AND regexp_matches({stem}, '[aeiouy]')"
        ruled = f"CASE WHEN {guard} THEN {stem} || '{rep}' ELSE {col} END"
        if suf == "s":
            ruled = f"CASE WHEN {col} LIKE '%ss' THEN {col} ELSE {ruled} END"
        whens.append(f"WHEN {col} LIKE '%{suf}' THEN {ruled}")
    chain = "CASE " + " ".join(whens) + f" ELSE {col} END"
    return (
        f"coalesce((SELECT lemma FROM (VALUES {irr}) irr(word, lemma) "
        f"WHERE irr.word = {col}), {chain})"
    )
