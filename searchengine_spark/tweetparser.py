"""Tweet-mode parser parity ops (SURVEY.md §2.2 T5-T15).

The reference's 534-line rule-based tweet tokenizer
(``Part C/parser_module.py``, near-identical ``Part A/parser_module.py``)
normalizes hashtags, mentions, URLs, numbers, dates and domain terms before
indexing. The code-mode engine replaces all of it with the identifier regex
(tokenizer.py), but a user of the reference switching to this repo may still
want tweet semantics — so each rule family is re-expressed here as an
explicit, documented operator. Semantics are reference-inspired but pinned by
THIS module's docstrings/tests (the reference's exact behavior is
order-dependent and partly buggy — e.g. its curse masking T13 discards its own
result, ``Part A/parser_module.py:512`` — and is deliberately not reproduced
bug-for-bug).

Implementation: one pure-Python pipeline (``tweet_tokenize_py``) — the
testable spec — wrapped in an Arrow ``pandas_udf`` for the DataFrame surface
(precompiled module-level regexes, batch-at-a-time transfer). The entity rule
(T15) is cross-doc stateful in the reference (first-seen order); here it is a
deterministic two-pass DataFrame op: candidates → df≥2 filter → join back
(SURVEY.md §2.2 T15 mapping).

Reference analogues per op:
  T5/T9  URL cleanup + host/path tokens      Part A/parser_module.py:254-269,414-432
  T6     special-token extraction (#,@,url)  Part A/parser_module.py:361-370
  T7     hashtag camel/underscore split      Part A/parser_module.py:391-405
  T8     mention passthrough                 Part A/parser_module.py:407-412
  T10    number normalization (K/M/B, %)     Part A/parser_module.py:372-387,434-507
  T11    month-year date tokens              Part A/parser_module.py:338-359
  T12    domain normalization (covid→coronavirus)  Part A/parser_module.py:299-307,49-69
  T14    RT / tweet-id / bracket removal     Part A/parser_module.py:86-96,322-327
  T15    adjacent-capitalized entity pairs   Part A/parser_module.py:516-549
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .tokenizer import STOPWORDS

_STOPSET = frozenset(STOPWORDS)

# The reference filters with nltk's English stopword list
# (``Part C/parser_module.py:14`` — ``stopwords.words('english')``). nltk is
# not a dependency here, so the standard 179-entry list is inlined (it is
# public, stable since nltk 3.x). Used by the tweet-mode pipeline when
# reference-faithful filtering matters (refbench.py); the code-mode engine
# keeps its minimal 17-word set (tokenizer.py).
NLTK_STOPWORDS = frozenset("""
i me my myself we our ours ourselves you you're you've you'll you'd your
yours yourself yourselves he him his himself she she's her hers herself it
it's its itself they them their theirs themselves what which who whom this
that that'll these those am is are was were be been being have has had
having do does did doing a an the and but if or because as until while of
at by for with about against between into through during before after
above below to from up down in out on off over under again further then
once here there when where why how all any both each few more most other
some such no nor not only own same so than too very s t can will just don
don't should should've now d ll m o re ve y ain aren aren't couldn
couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven haven't
isn isn't ma mightn mightn't mustn mustn't needn needn't shan shan't
shouldn shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
""".split())

# ---------------------------------------------------------------- patterns
_URL_RE = re.compile(r"https?://\S+", re.I)  # HTTP:// too
_HASHTAG_RE = re.compile(r"#\w+")
_MENTION_RE = re.compile(r"@\w+")
_TWEET_ID_RE = re.compile(r"\b\d{19,20}\b")
_RT_RE = re.compile(r"^RT\s+|\bRT\b")
_CAMEL_RE = re.compile(r"[A-Z]{2,}(?![a-z])|\d+|[A-Z]?[a-z0-9]+")
_WORD_RE = re.compile(r"[A-Za-z][A-Za-z0-9_']*")
_NUM_RE = re.compile(r"\b\d+(?:\.\d+)?\b")
_PCT_RE = re.compile(r"\b(\d+(?:\.\d+)?)\s*(?:%|percent|percentage)\b", re.I)
_SCALE_RE = re.compile(r"\b(\d+(?:\.\d+)?)\s+(thousand|million|billion)\b", re.I)
_MONTHS = "jan feb mar apr may jun jul aug sep oct nov dec".split()
_MONTHS_FULL = (
    "january february march april may june july august september october "
    "november december".split()
)
# EXACT month names only (short or full), like the reference's explicit
# alternation (``Part A/parser_module.py:345-357``) — a stem + [a-z]* suffix
# over-matched ANY word starting with a month stem ('novel 2019' →
# 'nov2019', destroying the real token; 'decade 2020' → 'dec2020')
_DATE_RE = re.compile(
    r"\b(" + "|".join(_MONTHS_FULL + _MONTHS) + r")\s+(\d{4})\b", re.I
)

_SCALE_SUFFIX = {"thousand": "K", "million": "M", "billion": "B"}

# T12 domain map (reference: covid synonyms → one canonical term)
DOMAIN_MAP = {
    "covid": "coronavirus",
    "covid19": "coronavirus",
    "covid_19": "coronavirus",
    "sarscov2": "coronavirus",
    "corona": "coronavirus",
}

# T9 hosts dropped entirely (reference keeps an excluded-host list)
EXCLUDED_HOSTS = frozenset({"t.co", "bit.ly", "tinyurl.com"})


def _bucket_number(tok: str) -> str:
    """T10: 123 → '123'; 1234 → '1.2K'; 5600000 → '5.6M'; 7e9 → '7B'.
    Trailing '.0' is dropped (1000 → '1K')."""
    v = float(tok)
    for thresh, suf in ((1e9, "B"), (1e6, "M"), (1e3, "K")):
        if v >= thresh:
            s = f"{v / thresh:.1f}".rstrip("0").rstrip(".")
            return s + suf
    return tok if "." not in tok else f"{v:g}"


def _url_tokens(url: str) -> list[str]:
    """T9: scheme dropped, 'www.' stripped, host kept unless excluded,
    path split on non-word chars."""
    body = re.sub(r"^https?://", "", url, flags=re.I).rstrip("/")
    host, _, path = body.partition("/")
    host = host.lower().removeprefix("www.")  # lower FIRST: 'WWW.' must
    # strip too, and the EXCLUDED_HOSTS check below is lowercase
    if host in EXCLUDED_HOSTS:
        return []
    out = [host] if host else []
    out += [p.lower() for p in re.split(r"[^\w]+", path) if len(p) > 1]
    return out


def _hashtag_tokens(tag: str) -> list[str]:
    """T7: '#StayHome_Now' → ['#stayhome_now', 'stay', 'home', 'now']
    (whole lowercased tag + camel/underscore parts of len>1)."""
    body = tag[1:]
    parts = [p.lower() for seg in body.split("_") for p in _CAMEL_RE.findall(seg)]
    return [tag.lower()] + [p for p in parts if len(p) > 1]


def tweet_tokenize_py(text: str, stopset: frozenset[str] = _STOPSET) -> list[str]:
    """The tweet-mode token spec (pure Python = oracle for the UDF).

    Order: pull special tokens (URLs/hashtags/mentions) → date tokens →
    percent/scale normalization → strip RT + 19-20-digit tweet ids → plain words
    (len>1, lowercased, domain-normalized) → number bucketing.

    ``stopset`` defaults to the engine's minimal set; pass
    ``NLTK_STOPWORDS`` for reference-faithful filtering (refbench.py)."""
    toks: list[str] = []
    rest = text

    # specials FIRST: date/pct/scale substitution on raw text could eat a
    # hashtag body ('#May 2020' → bare '#', the '#may' token lost) or
    # splice spaces inside a URL path ('/95%x')
    for url in _URL_RE.findall(rest):
        toks += _url_tokens(url)
    rest = _URL_RE.sub(" ", rest)

    for tag in _HASHTAG_RE.findall(rest):
        toks += _hashtag_tokens(tag)
    rest = _HASHTAG_RE.sub(" ", rest)

    toks += [m.lower() for m in _MENTION_RE.findall(rest)]  # T8 passthrough
    rest = _MENTION_RE.sub(" ", rest)

    rest = _DATE_RE.sub(lambda m: f" {m.group(1)[:3].lower()}{m.group(2)} ", rest)
    rest = _PCT_RE.sub(lambda m: f" {m.group(1)}% ", rest)
    rest = _SCALE_RE.sub(
        lambda m: f" {m.group(1)}{_SCALE_SUFFIX[m.group(2).lower()]} ", rest
    )

    rest = _TWEET_ID_RE.sub(" ", rest)  # T14
    rest = _RT_RE.sub(" ", rest)  # T14

    for w in _WORD_RE.findall(rest):
        lw = w.lower()
        if len(lw) <= 1 or lw in stopset:  # T3 (reference: nltk english set)
            continue
        toks.append(DOMAIN_MAP.get(lw, lw))  # T12

    # normalized forms like 3.4K / 55% were injected with spaces around them
    for m in re.findall(r"\b\d+(?:\.\d+)?(?:K|M|B|%)", rest):
        toks.append(m)
    for n in _NUM_RE.findall(re.sub(r"\d+(?:\.\d+)?(?:K|M|B|%)", " ", rest)):
        toks.append(_bucket_number(n))

    return toks


@F.pandas_udf(ArrayType(StringType()))
def tweet_tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched tweet-mode tokenizer (T5-T14)."""
    return texts.map(lambda t: tweet_tokenize_py(t) if isinstance(t, str) else [])


@F.pandas_udf(ArrayType(StringType()))
def tweet_tokenize_nltk_udf(texts: pd.Series) -> pd.Series:
    """Same pipeline with the reference-faithful nltk stopword set."""
    return texts.map(
        lambda t: tweet_tokenize_py(t, NLTK_STOPWORDS) if isinstance(t, str) else []
    )


def tweet_tokenize(col: Column, nltk_stopwords: bool = False) -> Column:
    return tweet_tokenize_nltk_udf(col) if nltk_stopwords else tweet_tokenize_udf(col)


# ------------------------------------------------------------------- T15
# single literal space (not \s+) so the DuckDB oracle's matched substring is
# byte-identical to the Python-joined pair
_ENTITY_RE = re.compile(r"\b([A-Z][a-z]+) ([A-Z][a-z]+)\b")


@F.pandas_udf(ArrayType(StringType()))
def _entity_candidates_udf(texts: pd.Series) -> pd.Series:
    return texts.map(
        lambda t: [f"{a} {b}" for a, b in _ENTITY_RE.findall(t)]
        if isinstance(t, str)
        else []
    )


def entity_tokens(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_df: int = 2
) -> DataFrame:
    """T15 as a deterministic two-pass DataFrame op: adjacent Capitalized
    pairs kept only when they appear in ≥ ``min_df`` distinct docs.
    Returns (doc_id, entity). The reference's single-pass version depends on
    document arrival order (first sighting is discarded); this two-pass form
    is order-independent — the Spark-correct semantics (SURVEY.md §2.2 T18
    note applies equally here)."""
    cand = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_entity_candidates_udf(F.col(text_col))).alias("entity"),
    ).distinct()
    keep = (
        cand.groupBy("entity")
        .agg(F.count(F.lit(1)).alias("entity_df"))
        .filter(F.col("entity_df") >= min_df)
    )
    return cand.join(F.broadcast(keep.select("entity")), "entity").select("doc_id", "entity")


def entity_tokens_sql(table: str, id_col: str = "doc_id", text_col: str = "text",
                      min_df: int = 2) -> str:
    """DuckDB twin of entity_tokens (regex is RE2-compatible on both sides)."""
    return f"""
WITH cand AS (
  SELECT DISTINCT {id_col} AS doc_id,
         unnest(regexp_extract_all({text_col}, '\\b([A-Z][a-z]+ [A-Z][a-z]+)\\b')) AS entity
  FROM {table}),
keep AS (
  SELECT entity FROM cand GROUP BY entity HAVING count(*) >= {min_df})
SELECT doc_id, entity FROM cand JOIN keep USING (entity)
"""
