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


# --------------------------------------------------------- code analyzer
# Identifier splitting for source-code corpora (Lucene's WordDelimiter /
# intra-word analysis, the piece a code search engine needs so that query
# "parse" matches `parseQueryString`, `parse_query`, and `HTTPParser`):
# a TEXT→TEXT preprocessing applied BEFORE the standard tokenizer, so the
# entire downstream pipeline (tf, postings, positions, phrase adjacency,
# oracles) is byte-identical to tokenizing pre-split text. Three dialect
# twins of the same three rules — kept to features Java regex, Python re,
# and DuckDB RE2 implement identically (char classes + backrefs only):
#   1. acronym boundary   ([A-Z]+)([A-Z][a-z])  HTTPServer → HTTP Server
#   2. case boundary      ([a-z0-9])([A-Z])     fooBar2Max → foo Bar2 Max
#   3. underscores → space                      snake_case → snake case
# Split runs on the ORIGINAL case (boundaries need it); the standard
# tokenizer then lowercases. Single-letter parts (getX → get X) drop via
# the existing len≥2 token rule — same as Lucene's default minimum.
_CODE_RULES: tuple[tuple[str, str], ...] = (
    (r"([A-Z]+)([A-Z][a-z])", " "),
    (r"([a-z0-9])([A-Z])", " "),
)
_CODE_RES = [(re.compile(p), r"\1 \2") for p, _ in _CODE_RULES]

ANALYZERS = ("standard", "code", "stem", "porter2")


def parse_analyzer(analyzer: str) -> tuple[str, ...]:
    """'+'-separated analyzer chain → validated stage tuple. Stages apply
    left to right as TEXT→TEXT transforms before the standard tokenizer:
    ``code`` splits identifiers, ``stem`` tokenizes + suffix-stems +
    rejoins (so downstream tokenization/positions see the stemmed stream),
    ``porter2`` is the snowball-exact variant of ``stem`` (Arrow UDF —
    see ``porter2.py``; no DuckDB twin, so its oracle checks are
    golden-vector pytest + rows-only), ``standard`` is identity.
    'code+stem' = split identifiers, then stem the resulting parts — the
    chain a stemmed code index wants."""
    stages = tuple(s for s in analyzer.split("+") if s)
    for s in stages:
        if s not in ANALYZERS:
            raise ValueError(f"unknown analyzer stage {s!r}; stages: {ANALYZERS}")
    return stages or ("standard",)


def code_split_py(text: str) -> str:
    for rx, repl in _CODE_RES:
        text = rx.sub(repl, text)
    return text.replace("_", " ")


def code_split_expr(col: Column) -> Column:
    for pat, _ in _CODE_RULES:
        col = F.regexp_replace(col, pat, "$1 $2")
    return F.replace(col, F.lit("_"), F.lit(" "))


def duckdb_code_split(expr: str) -> str:
    """DuckDB twin of ``code_split_expr`` over a SQL expression string."""
    for pat, _ in _CODE_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '\\1 \\2', 'g')"
    return f"replace({expr}, '_', ' ')"


def analyze_py(text: str, analyzer: str = "standard") -> list[str]:
    """Analyzer-aware pure-Python tokenizer (query side + oracles)."""
    from .stemming import stem_py

    for stage in parse_analyzer(analyzer):
        if stage == "code":
            text = code_split_py(text)
        elif stage == "stem":
            text = " ".join(stem_py(t) for t in tokenize_py(text))
        elif stage == "porter2":
            from .porter2 import stem_en

            text = " ".join(stem_en(t) for t in tokenize_py(text))
    return tokenize_py(text)


def analyze_text_expr(col: Column, analyzer: str = "standard") -> Column:
    """Analyzer chain as a column transform (TEXT→TEXT): identity for
    standard, identifier splitting for code, tokenize+stem+rejoin for stem
    (duplicate-preserving, so downstream tf/positions are over the stemmed
    stream). Applied once at build/append entry so every downstream
    tokenize call is unchanged. Chains compose left to right: 'code+stem'."""
    from .stemming import stem_expr

    for stage in parse_analyzer(analyzer):
        if stage == "code":
            col = code_split_expr(col)
        elif stage == "stem":
            col = F.array_join(stem_expr(tokenize_raw_expr(col)), " ")
        elif stage == "porter2":
            from .porter2 import porter2_text_udf

            col = porter2_text_udf()(col)
    return col


def duckdb_analyze_text(expr: str, analyzer: str = "standard") -> str:
    """DuckDB twin of ``analyze_text_expr`` over a SQL expression string."""
    from .stemming import stem_sql_case

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    for stage in parse_analyzer(analyzer):
        if stage == "code":
            expr = duckdb_code_split(expr)
        elif stage == "porter2":
            raise ValueError(
                "the porter2 stage has no DuckDB twin (iterative Snowball "
                "algorithm) — its correctness gate is the golden-vector "
                "pytest (tests/test_porter2.py) and rows-only driver checks"
            )
        elif stage == "stem":
            toks = (
                f"list_filter(regexp_extract_all(lower({expr}), "
                f"'{TOKEN_PATTERN}'), tk -> tk NOT IN ({stop_list}))"
            )
            expr = (
                f"coalesce(array_to_string(list_transform({toks}, "
                f"tk -> {stem_sql_case('tk')}), ' '), '')"
            )
    return expr


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
