"""Opt-in English suffix stemmer (SURVEY.md §2.2 T16).

The reference wires an nltk SnowballStemmer behind ``toStem`` (default False,
``Part A/configuration.py:11``; applied at ``parse_sentence:219-227`` /
``Part C/stemmer.py:4-14``). nltk is not in this container, so this is a
self-contained Porter-step-1-style suffix stripper: deterministic, pure
string rules, the same role (conflating plurals/participles) without claiming
snowball-exact output — documented approximate parity, off by default exactly
like the reference.

Exposed as a pure function (oracle/tests), an Arrow pandas_udf, and a
Catalyst-only expression (regexp_replace chain) that stays in whole-stage
codegen for the hot path. All three are pytest-equal.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_VOWEL = re.compile(r"[aeiouy]")

# ordered suffix rules: (suffix, replacement, min_stem_len). Every plural
# suffix maps to the SAME target as its singular ('arguments' and
# 'argument' must land on one index term — the old table sent them to
# 'argument' and 'argu', so the two forms of one word never matched each
# other); the bare -ment strip is gone for the same reason (a single-pass
# stemmer can't strip 's' then 'ment' like iterated Porter does).
_RULES: tuple[tuple[str, str, int], ...] = (
    ("sses", "ss", 1),
    ("ies", "i", 1),
    ("izations", "ize", 2),
    ("ational", "ate", 2),
    ("tional", "tion", 2),
    ("ization", "ize", 2),
    ("fulness", "ful", 2),
    ("ousness", "ous", 2),
    ("iveness", "ive", 2),
    ("ements", "e", 3),
    ("ement", "e", 3),
    ("ments", "ment", 2),
    ("ingly", "", 3),
    ("edly", "", 3),
    ("ings", "", 3),
    ("ing", "", 3),
    ("ed", "", 3),
    ("ly", "", 3),
    ("ss", "ss", 1),  # identity: final 's' preceded by 's' is not a plural
    # ('class' must not become 'clas' while 'classes' → 'class')
    ("s", "", 3),
)


def stem_py(word: str) -> str:
    """First suffix rule whose match AND guard (stem keeps a vowel and
    ``min_stem_len`` chars) both hold fires; a matched suffix with a
    failed guard FALLS THROUGH to later rules ('things' fails the 'ings'
    guard but must still conflate with 'thing' via the 's' rule — the old
    stop-on-match semantics froze it)."""
    for suf, rep, min_len in _RULES:
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if len(stem) >= min_len and _VOWEL.search(stem):
                return stem + rep
    return word


def stem_tokens_py(tokens: list[str]) -> list[str]:
    # a NULL element maps to None like the Catalyst twin (stem_expr), not
    # an AttributeError that kills the whole job
    return [stem_py(t) if t is not None else None for t in tokens]


@F.pandas_udf(ArrayType(StringType()))
def stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(
        lambda ts: (
            [stem_py(t) if t is not None else None for t in ts]
            if ts is not None
            else ts
        )
    )


def stem_expr(token_array: Column) -> Column:
    """Catalyst-only stemmer over an array<string> column: one
    regexp_replace chain per element via transform — codegen-friendly,
    rule-for-rule identical to ``stem_py`` (pytest-equal).

    'First rule whose suffix AND guard both hold' (guard failure falls
    through, matching stem_py) maps to a single ``coalesce`` over
    independent per-rule candidates: candidate_i is NULL unless rule i's
    suffix matches AND its guard passes, in which case it is the stemmed
    token. First non-null wins. Crucially this keeps the expression tree
    LINEAR in the rule count — a sequential when-chain that re-references
    the accumulated expression per rule grows 3^n nodes and OOMs the
    driver at analysis time (observed; see git history)."""

    def one(tok: Column) -> Column:
        cands = []
        for suf, rep, min_len in _RULES:
            stem = F.substring(tok, F.lit(1), F.length(tok) - F.lit(len(suf)))
            guard = (F.length(stem) >= min_len) & stem.rlike("[aeiouy]")
            cands.append(
                F.when(
                    tok.endswith(suf) & guard, F.concat(stem, F.lit(rep))
                )
            )
        return F.coalesce(*cands, tok)

    return F.transform(token_array, one)


def stem_sql_case(col: str) -> str:
    """DuckDB twin of ``stem_py`` as one CASE chain (first rule whose
    suffix AND guard both hold fires; guard failure falls through — same
    discipline). Powers the driver's `term_normalization` hash check."""
    whens = []
    for suf, rep, min_len in _RULES:
        stem = f"substr({col}, 1, length({col}) - {len(suf)})"
        guard = f"length({stem}) >= {min_len} AND regexp_matches({stem}, '[aeiouy]')"
        whens.append(
            f"WHEN {col} LIKE '%{suf}' AND {guard} THEN {stem} || '{rep}'"
        )
    return "CASE " + " ".join(whens) + f" ELSE {col} END"
