"""Vectorized regex tokenizer + stopword filter.

Reference analogue: ``Part A/parser_module.py:109-142`` (``parse_sentence``
whitespace split + punctuation strip + len>1 filter) and the stopword filter
at ``Part A/parser_module.py:14,124``. The reference's tweet-specific rules
(hashtags, mentions, URLs, numbers — SURVEY.md §2.2 T5-T15) are out of scope
for the code-mode engine; the token spec here is the identifier-style regex
mandated by the north star.

The token spec is deliberately tiny and engine-portable so that the DuckDB
correctness oracle can reproduce it exactly in ANSI SQL:

    tokens(text) = [t for t in findall('[a-z_][a-z0-9_]+', lower(text))
                    if t not in STOPWORDS]

Three implementations, all semantically identical:
  * ``tokenize_expr``   — pure Catalyst (regexp_extract_all + array_except):
                          whole-stage-codegen'd, zero Python. Preferred in the
                          hot path.
  * ``tokenize_udf``    — Arrow pandas_udf (the north-star-mandated vectorized
                          UDF surface; no per-row Python UDF anywhere).
  * ``tokenize_py``     — pure-Python, used by the rank-identity oracle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Single char tokens are excluded by the regex itself (len >= 2), mirroring the
# reference's len>1 rule (Part A/parser_module.py:124).
TOKEN_PATTERN = "[a-z_][a-z0-9_]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# Small fixed stopword list (english function words + noise); kept tiny and
# explicit so the SQL oracle can inline it. Reference uses nltk's english set
# (Part A/parser_module.py:14); ours is code-mode.
STOPWORDS: tuple[str, ...] = (
    "the", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "as", "are", "was", "be", "this", "that",
)
_STOPSET = frozenset(STOPWORDS)


def tokenize_py(text: str) -> list[str]:
    """Pure-Python tokenizer — the oracle's ground truth."""
    return [t for t in _TOKEN_RE.findall(text.lower()) if t not in _STOPSET]


def tokenize_expr(col: Column) -> Column:
    """Catalyst-native tokenizer: stays inside whole-stage codegen."""
    toks = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)
    return F.array_except(toks, F.array(*[F.lit(s) for s in STOPWORDS]))


def _dedupe_keep_order(ts: list[str]) -> list[str]:
    seen: set[str] = set()
    out = []
    for t in ts:
        if t not in _STOPSET and t not in seen:
            seen.add(t)
            out.append(t)
    return out


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched tokenizer (north-star UDF surface).

    ``array_except`` (used by tokenize_expr) dedupes keeping first-occurrence
    order, so this one does too — the two are exactly interchangeable
    (tested). tf computation uses the *non-deduped* stream instead; see
    ``postings.term_frequencies`` / ``tokenize_raw_udf``.
    """
    return texts.str.lower().str.findall(TOKEN_PATTERN).map(_dedupe_keep_order)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_raw_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched tokenizer preserving duplicates (for tf counting)."""
    return texts.str.lower().str.findall(TOKEN_PATTERN).map(
        lambda ts: [t for t in ts if t not in _STOPSET]
    )


def tokenize_raw_expr(col: Column) -> Column:
    """Catalyst tokenizer preserving duplicates: regexp_extract_all + filter.

    ``array_except`` would dedupe, so stopwords are removed with a lambda
    ``filter`` instead (still codegen-friendly HigherOrderFunction).
    """
    toks = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(toks, lambda t: ~F.array_contains(stop_arr, t))


def duckdb_tokens_cte(table: str, id_col: str, text_col: str) -> str:
    """DuckDB SQL producing the identical (doc, term) token stream
    (duplicates preserved) — the shared CTE for every oracle query."""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        f"SELECT {id_col} AS doc_id, t.term AS term "
        f"FROM (SELECT {id_col}, unnest(regexp_extract_all(lower({text_col}), "
        f"'{TOKEN_PATTERN}')) AS term FROM {table}) AS t({id_col}, term) "
        f"WHERE t.term NOT IN ({stop_list})"
    )
