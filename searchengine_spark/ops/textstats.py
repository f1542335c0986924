"""Text-analysis operators for large-scale training-data pipelines:
language-ID (marker-word heuristic), quality scoring, token counting,
document fingerprinting.

Every operator has (a) a Spark implementation using only built-in JVM
expressions (whole-stage codegen, no Python in the hot path) and (b) a
DuckDB SQL generator producing the semantically identical query for the
driver's correctness gate. All floats are rounded at a pinned precision so
the cross-engine value-hash is stable.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import STOPWORDS, TOKEN_PATTERN, duckdb_tokens_cte, tokenize_raw_expr

ROUND_DP = 5

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # deterministic marker-word sets; argmax hit-count, tie-break lang asc
    "en": ("the", "and", "of", "to", "in", "is", "a", "value", "fast"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por"),
}

_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


def _ws_tokens_expr(text_col: str):
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, 0).otherwise(F.size(F.split(t, r"\s+")))


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_re_tokens): whitespace token count + regex
    (BPE-ish identifier) token count after stopword removal."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        _ws_tokens_expr(text_col).cast("long").alias("n_ws_tokens"),
        F.size(tokenize_raw_expr(F.col(text_col))).cast("long").alias("n_re_tokens"),
    )


def token_count_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
SELECT {id_col} AS doc_id,
       CASE WHEN trim({text_col}) = '' THEN 0
            ELSE len(string_split_regex(trim({text_col}), '\\s+')) END::BIGINT AS n_ws_tokens,
       len([t FOR t IN regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')
            IF t NOT IN ({_STOP_SQL})])::BIGINT AS n_re_tokens
FROM {table}
"""


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher/Dolma filter family —
    Rae et al. 2021 §A1.1: repetitious documents are low-quality training
    data): per doc
      * n_tokens, dup_token_frac  — 1 − distinct/total whitespace tokens
      * top_2gram_frac            — share of 2-grams taken by the most
                                     frequent one (0 when < 2 tokens)
      * dup_2gram_frac            — 1 − distinct/total 2-grams
      * n_lines, dup_line_frac    — same over newline-split lines
    Callers threshold these (Gopher drops dup_line_frac > 0.30,
    top_2gram_frac > 0.20, …) — the thresholds are corpus policy, the
    signals are the operator.

    Scale shape: token/line distincts are array HOFs (no shuffle); the
    2-gram mode needs a count-per-gram aggregation — explode → two hash
    aggs with map-side combine, keyed on (doc_id, gram) then doc_id, so
    skew follows document length, not corpus size. No Python anywhere."""
    t = F.lower(F.trim(F.col(text_col)))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    lines_src = F.trim(F.col(text_col))
    lines = F.when(
        F.length(lines_src) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(lines_src, r"\n+"))
    # deliberately NOT cached: the two consumers re-derive the token arrays
    # from the source scan (cheap codegen); caching materialized arrays
    # (~text-sized) per call would leak executor storage across calls
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"), lines.alias("lns")
    )
    frac = lambda num, den: F.when(  # noqa: E731 — tiny local combinator
        den > 0, F.round(num / den, ROUND_DP)
    ).otherwise(F.lit(0.0))
    scalar = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("nd_tok"),
        F.size("lns").cast("long").alias("n_lines"),
        F.size(F.array_distinct("lns")).alias("nd_ln"),
    )
    # unique lambda arg name (g2i): sibling-lambda cross-binding hazard in
    # pyspark 4.1 — SQL-parsed lambdas with distinct names are the safe form
    grams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "g2i -> concat(toks[g2i - 1], ' ', toks[g2i]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    gstats = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n2"),
            F.max("c").alias("topc"),
            F.count(F.lit(1)).alias("nd2"),
        )
    )
    out = scalar.join(gstats, "doc_id", "left")
    n2 = F.coalesce(F.col("n2"), F.lit(0))
    return out.select(
        "doc_id",
        "n_tokens",
        frac(F.col("n_tokens") - F.col("nd_tok"), F.col("n_tokens")).alias(
            "dup_token_frac"
        ),
        frac(F.coalesce(F.col("topc"), F.lit(0)), n2).alias("top_2gram_frac"),
        frac(n2 - F.coalesce(F.col("nd2"), F.lit(0)), n2).alias("dup_2gram_frac"),
        "n_lines",
        frac(F.col("n_lines") - F.col("nd_ln"), F.col("n_lines")).alias(
            "dup_line_frac"
        ),
    )


def repetition_stats_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    toks = (
        f"CASE WHEN trim({text_col}) = '' THEN [] "
        f"ELSE string_split_regex(lower(trim({text_col})), '\\s+') END"
    )
    lns = (
        f"CASE WHEN trim({text_col}) = '' THEN [] "
        f"ELSE string_split_regex(trim({text_col}), '\\n+') END"
    )
    return f"""
WITH base AS (SELECT {id_col} AS doc_id, {toks} AS toks, {lns} AS lns FROM {table}),
scalar AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         len(list_distinct(toks))::BIGINT AS nd_tok,
         len(lns)::BIGINT AS n_lines,
         len(list_distinct(lns))::BIGINT AS nd_ln
  FROM base),
grams AS (
  SELECT doc_id, toks[i - 1] || ' ' || toks[i] AS g
  FROM base, unnest(range(2, len(toks) + 1)) AS r(i)),
gstats AS (
  SELECT doc_id, sum(c)::BIGINT AS n2, max(c)::BIGINT AS topc,
         count(*)::BIGINT AS nd2
  FROM (SELECT doc_id, g, count(*)::BIGINT AS c FROM grams GROUP BY 1, 2)
  GROUP BY 1)
SELECT s.doc_id AS doc_id, s.n_tokens AS n_tokens,
       CASE WHEN s.n_tokens > 0
            THEN round((s.n_tokens - s.nd_tok) / s.n_tokens, {ROUND_DP})
            ELSE 0.0 END AS dup_token_frac,
       CASE WHEN coalesce(g.n2, 0) > 0
            THEN round(coalesce(g.topc, 0) / g.n2, {ROUND_DP})
            ELSE 0.0 END AS top_2gram_frac,
       CASE WHEN coalesce(g.n2, 0) > 0
            THEN round((g.n2 - coalesce(g.nd2, 0)) / g.n2, {ROUND_DP})
            ELSE 0.0 END AS dup_2gram_frac,
       s.n_lines AS n_lines,
       CASE WHEN s.n_lines > 0
            THEN round((s.n_lines - s.nd_ln) / s.n_lines, {ROUND_DP})
            ELSE 0.0 END AS dup_line_frac
FROM scalar s LEFT JOIN gstats g USING (doc_id)
"""


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized token stream
    (reference analogue: none — pipeline op). Docs with identical token
    streams collide by construction."""
    toks = tokenize_raw_expr(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", toks)).alias("fp"),
    )


def fingerprint_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
SELECT {id_col} AS doc_id,
       md5(array_to_string([t FOR t IN regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')
                            IF t NOT IN ({_STOP_SQL})], ' ')) AS fp
FROM {table}
"""


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker hits over the
    whitespace-lowered token stream; tie-break lang asc; no hits → 'und'."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # generic argmax over the marker table (extending _LANG_MARKERS now
    # actually adds a language — the old code computed every language's
    # hits and then hardcoded the en/es decision): max hits wins, ties
    # break lang ASC, all-zero → 'und'
    langs = sorted(_LANG_MARKERS)

    def _hit(markers: tuple[str, ...]):
        mk = tuple(markers)
        # single-arg lambda: a second (default) parameter would be bound
        # as the element INDEX by F.filter
        return F.size(F.filter(words, lambda w: w.isin(*mk)))

    hits = {lang: _hit(_LANG_MARKERS[lang]) for lang in langs}
    best = hits[langs[0]]
    for lang in langs[1:]:
        best = F.greatest(best, hits[lang])
    pred = F.when(best == 0, "und")
    for lang in langs:  # lang asc: first language reaching the max wins
        pred = pred.when(hits[lang] == best, lang)
    return df.select(
        F.col(id_col).alias("doc_id"), pred.alias("lang_pred")
    )


def lang_id_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    def marker_sql(markers: tuple[str, ...]) -> str:
        lst = ", ".join(f"'{m}'" for m in markers)
        return (
            f"len([w FOR w IN string_split_regex(lower(trim({text_col})), '\\s+') "
            f"IF w IN ({lst})])"
        )

    langs = sorted(_LANG_MARKERS)
    exprs = {lang: marker_sql(_LANG_MARKERS[lang]) for lang in langs}
    best = "greatest(" + ", ".join(exprs[lang] for lang in langs) + ")"
    whens = " ".join(
        f"WHEN {exprs[lang]} = {best} THEN '{lang}'" for lang in langs
    )
    return f"""
SELECT {id_col} AS doc_id,
       CASE WHEN {best} = 0 THEN 'und' {whens} END AS lang_pred
FROM {table}
"""


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + combined score (length / stopword ratio /
    punctuation ratio), all built-in expressions."""
    toks = tokenize_raw_expr(F.col(text_col))
    lowered = F.lower(F.col(text_col))
    n_tok = F.size(toks)
    ws = _ws_tokens_expr(text_col)
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    stop_ratio = stop_hits / F.greatest(ws, F.lit(1))
    stripped = F.regexp_replace(lowered, "[a-z0-9 \\n\\t_]", "")
    punct_ratio = F.length(stripped) / F.greatest(F.length(lowered), F.lit(1))
    quality = (1.0 - stop_ratio) * F.log(1.0 + n_tok) / (1.0 + punct_ratio)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(stop_ratio, ROUND_DP).alias("stop_ratio"),
        F.round(punct_ratio, ROUND_DP).alias("punct_ratio"),
        F.round(quality, ROUND_DP).alias("quality"),
    )


def quality_score_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = (
        f"[t FOR t IN regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}') "
        f"IF t NOT IN ({_STOP_SQL})]"
    )
    ws = f"CASE WHEN trim({text_col}) = '' THEN 0 ELSE len(string_split_regex(trim({text_col}), '\\s+')) END"
    stop_hits = (
        f"len([w FOR w IN string_split_regex(lower(trim({text_col})), '\\s+') "
        f"IF w IN ({_STOP_SQL})])"
    )
    return f"""
SELECT {id_col} AS doc_id,
       len({toks})::BIGINT AS n_tokens,
       round({stop_hits} / greatest({ws}, 1), {ROUND_DP}) AS stop_ratio,
       round(length(regexp_replace(lower({text_col}), '[a-z0-9 \\n\\t_]', '', 'g'))
             / greatest(length(lower({text_col})), 1), {ROUND_DP}) AS punct_ratio,
       round((1.0 - {stop_hits} / greatest({ws}, 1))
             * ln(1.0 + len({toks}))
             / (1.0 + length(regexp_replace(lower({text_col}), '[a-z0-9 \\n\\t_]', '', 'g'))
                      / greatest(length(lower({text_col})), 1)), {ROUND_DP}) AS quality
FROM {table}
"""


# ---------------------------------------------------------------------------
# C4 heuristic cleanup (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning…" §2.2 — the public C4 pipeline rules):
#   * keep only lines ending in terminal punctuation (. ! ? ")
#   * keep only lines with ≥ 5 whitespace words
#   * drop the whole page if < 3 lines survive
#   * drop pages containing "lorem ipsum" (case-insensitive) or "{"
# Everything is string/array expressions inside whole-stage codegen — one
# map pass, zero shuffle; at 10^12 pages this stage is scan-bound.
# ---------------------------------------------------------------------------

C4_MIN_WORDS = 5
C4_MIN_LINES = 3
_C4_PUNCT = "('.', '!', '?', '\"')"


def c4_clean(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, clean_text, n_lines, n_kept, has_boiler, keep): C4 line
    filters + page verdict. ``clean_text`` is the surviving lines joined
    with newlines (empty when none survive); ``has_boiler`` flags the
    lorem-ipsum / curly-brace page rules; ``keep`` is the full C4 verdict."""
    lines = f"split({text_col}, '\\n')"
    kept = (
        f"filter({lines}, c4l -> "
        f"right(trim(c4l), 1) IN {_C4_PUNCT} "
        f"AND size(filter(split(trim(c4l), ' '), c4w -> c4w <> ''))"
        f" >= {C4_MIN_WORDS})"
    )
    boiler = (
        f"(contains(lower({text_col}), 'lorem ipsum') "
        f"OR contains({text_col}, '{{'))"
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"array_join({kept}, '\\n')").alias("clean_text"),
        F.expr(f"size({lines})").alias("n_lines"),
        F.expr(f"size({kept})").alias("n_kept"),
        F.expr(boiler).alias("has_boiler"),
        F.expr(
            f"size({kept}) >= {C4_MIN_LINES} AND NOT {boiler}"
        ).alias("keep"),
    )


def c4_clean_py(text: str) -> tuple[str, int, int, bool, bool]:
    """Pure-Python reference of the identical rules (test twin)."""
    lines = text.split("\n")
    kept = [
        ln for ln in lines
        if ln.strip()[-1:] in (".", "!", "?", '"')
        and len([w for w in ln.strip().split(" ") if w]) >= C4_MIN_WORDS
    ]
    boiler = "lorem ipsum" in text.lower() or "{" in text
    return (
        "\n".join(kept), len(lines), len(kept), boiler,
        len(kept) >= C4_MIN_LINES and not boiler,
    )


def c4_clean_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin — same rules as list expressions."""
    lines = f"string_split({text_col}, chr(10))"
    kept = (
        f"list_filter({lines}, c4l -> "
        f"right(trim(c4l), 1) IN {_C4_PUNCT} "
        f"AND len(list_filter(string_split(trim(c4l), ' '), c4w -> c4w <> ''))"
        f" >= {C4_MIN_WORDS})"
    )
    boiler = (
        f"(contains(lower({text_col}), 'lorem ipsum') "
        f"OR contains({text_col}, '{{'))"
    )
    return f"""
SELECT {id_col} AS doc_id,
       coalesce(array_to_string({kept}, chr(10)), '') AS clean_text,
       len({lines})::INT AS n_lines,
       len({kept})::INT AS n_kept,
       {boiler} AS has_boiler,
       (len({kept}) >= {C4_MIN_LINES} AND NOT {boiler}) AS keep
FROM {table}
"""

# ---------------------------------------------------------------------------
# Gopher document-level quality rules (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", Appendix A1.1
# — the non-repetition half; ``repetition_stats`` above covers the
# dup-line / dup-ngram half). A page is kept iff:
#   * 50 <= word count <= 100,000
#   * 3 <= mean word length <= 10
#   * '#' symbol-to-word ratio <= 0.1 and ellipsis-to-word ratio <= 0.1
#   * <= 90% of lines start with a bullet ('•', '-', '*')
#   * <= 30% of lines end with an ellipsis ('…' or '...')
#   * >= 80% of words contain at least one alphabetic character
#   * >= 2 of the 8 required stop words appear
# One map pass of string/array expressions — whole-stage codegen, zero
# shuffle; scan-bound at 10^12 pages like the C4 stage above.
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_BULLETS = "('•', '-', '*')"


def gopher_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, hash_ratio, ellipsis_ratio,
    bullet_frac, ellipsis_line_frac, alpha_frac, stop_hits, keep): every
    Gopher rule as an observable column plus the combined verdict."""
    words = f"filter(split(trim({text_col}), '\\\\s+'), gqw -> gqw <> '')"
    nw = f"size({words})"
    nw1 = f"greatest({nw}, 1)"
    mean_len = (
        f"round(aggregate({words}, 0L, (gqa, gqx) -> gqa + length(gqx))"
        f" / cast({nw1} AS double), {ROUND_DP})"
    )
    n_hash = f"(length({text_col}) - length(replace({text_col}, '#', '')))"
    n_ell = (
        f"((length({text_col}) - length(replace({text_col}, '…', '')))"
        f" + (length({text_col}) - length(replace({text_col}, '...', ''))) DIV 3)"
    )
    lines = f"filter(split({text_col}, '\\n'), gql -> trim(gql) <> '')"
    nl1 = f"greatest(size({lines}), 1)"
    bullet = (
        f"round(size(filter({lines}, gqb -> left(trim(gqb), 1) IN"
        f" {_GOPHER_BULLETS})) / cast({nl1} AS double), {ROUND_DP})"
    )
    ell_line = (
        f"round(size(filter({lines}, gqe -> right(trim(gqe), 1) = '…'"
        f" OR right(trim(gqe), 3) = '...')) / cast({nl1} AS double), {ROUND_DP})"
    )
    alpha = (
        f"round(size(filter({words}, gqv -> gqv rlike '[a-zA-Z]'))"
        f" / cast({nw1} AS double), {ROUND_DP})"
    )
    stops_arr = "array(" + ", ".join(f"'{s}'" for s in GOPHER_STOPS) + ")"
    lwords = f"filter(split(lower(trim({text_col})), '\\\\s+'), gqy -> gqy <> '')"
    stop_hits = f"size(filter({stops_arr}, gqs -> array_contains({lwords}, gqs)))"
    keep = (
        f"{nw} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}"
        f" AND {mean_len} BETWEEN {GOPHER_MIN_MEAN_LEN} AND {GOPHER_MAX_MEAN_LEN}"
        f" AND {n_hash} / cast({nw1} AS double) <= {GOPHER_MAX_SYMBOL_RATIO}"
        f" AND {n_ell} / cast({nw1} AS double) <= {GOPHER_MAX_SYMBOL_RATIO}"
        f" AND {bullet} <= {GOPHER_MAX_BULLET_FRAC}"
        f" AND {ell_line} <= {GOPHER_MAX_ELLIPSIS_FRAC}"
        f" AND {alpha} >= {GOPHER_MIN_ALPHA_FRAC}"
        f" AND {stop_hits} >= {GOPHER_MIN_STOP_HITS}"
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(nw).cast("long").alias("n_words"),
        F.expr(mean_len).alias("mean_word_len"),
        F.expr(f"round({n_hash} / cast({nw1} AS double), {ROUND_DP})").alias("hash_ratio"),
        F.expr(f"round({n_ell} / cast({nw1} AS double), {ROUND_DP})").alias("ellipsis_ratio"),
        F.expr(bullet).alias("bullet_frac"),
        F.expr(ell_line).alias("ellipsis_line_frac"),
        F.expr(alpha).alias("alpha_frac"),
        F.expr(stop_hits).cast("long").alias("stop_hits"),
        F.expr(keep).alias("keep"),
    )


def gopher_quality_py(text: str) -> dict:
    """Pure-Python reference of the identical rules (test twin)."""
    dp = 10 ** ROUND_DP

    def rnd(x: float) -> float:
        return int(x * dp + 0.5) / dp  # HALF_UP like Spark/DuckDB round()

    # ASCII \s split like the Spark/DuckDB twins — Python str.split()
    # also treats unicode whitespace (\xa0 in scraped HTML) as a
    # separator and would disagree on n_words/mean_word_len/keep
    words = [w for w in _re.split(r"[ \t\n\r\f\v]+", text.strip()) if w]
    nw, nw1 = len(words), max(len(words), 1)
    mean_len = rnd(sum(len(w) for w in words) / nw1)
    n_hash = text.count("#")
    n_ell = text.count("…") + text.count("...")
    lines = [ln for ln in text.split("\n") if ln.strip()]
    nl1 = max(len(lines), 1)
    bullet = rnd(
        sum(1 for ln in lines if ln.strip()[:1] in ("•", "-", "*")) / nl1
    )
    ell_line = rnd(
        sum(
            1
            for ln in lines
            if ln.strip().endswith("…") or ln.strip().endswith("...")
        )
        / nl1
    )
    alpha = rnd(
        sum(1 for w in words if any(c.isascii() and c.isalpha() for c in w))
        / nw1
    )
    lwords = set(text.strip().lower().split())
    stop_hits = sum(1 for s in GOPHER_STOPS if s in lwords)
    keep = (
        GOPHER_MIN_WORDS <= nw <= GOPHER_MAX_WORDS
        and GOPHER_MIN_MEAN_LEN <= mean_len <= GOPHER_MAX_MEAN_LEN
        and n_hash / nw1 <= GOPHER_MAX_SYMBOL_RATIO
        and n_ell / nw1 <= GOPHER_MAX_SYMBOL_RATIO
        and bullet <= GOPHER_MAX_BULLET_FRAC
        and ell_line <= GOPHER_MAX_ELLIPSIS_FRAC
        and alpha >= GOPHER_MIN_ALPHA_FRAC
        and stop_hits >= GOPHER_MIN_STOP_HITS
    )
    return {
        "n_words": nw,
        "mean_word_len": mean_len,
        "hash_ratio": rnd(n_hash / nw1),
        "ellipsis_ratio": rnd(n_ell / nw1),
        "bullet_frac": bullet,
        "ellipsis_line_frac": ell_line,
        "alpha_frac": alpha,
        "stop_hits": stop_hits,
        "keep": keep,
    }


def gopher_quality_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin — same rules as list expressions."""
    words = f"list_filter(string_split_regex(trim({text_col}), '\\s+'), gqw -> gqw <> '')"
    nw = f"len({words})"
    nw1 = f"greatest({nw}, 1)"
    mean_len = (
        f"round(coalesce(list_sum(list_transform({words}, gqx -> length(gqx))), 0)"
        f" / {nw1}::DOUBLE, {ROUND_DP})"
    )
    n_hash = f"(length({text_col}) - length(replace({text_col}, '#', '')))"
    n_ell = (
        f"((length({text_col}) - length(replace({text_col}, '…', '')))"
        f" + (length({text_col}) - length(replace({text_col}, '...', ''))) // 3)"
    )
    lines = f"list_filter(string_split({text_col}, chr(10)), gql -> trim(gql) <> '')"
    nl1 = f"greatest(len({lines}), 1)"
    bullet = (
        f"round(len(list_filter({lines}, gqb -> left(trim(gqb), 1) IN"
        f" {_GOPHER_BULLETS})) / {nl1}::DOUBLE, {ROUND_DP})"
    )
    ell_line = (
        f"round(len(list_filter({lines}, gqe -> right(trim(gqe), 1) = '…'"
        f" OR right(trim(gqe), 3) = '...')) / {nl1}::DOUBLE, {ROUND_DP})"
    )
    alpha = (
        f"round(len(list_filter({words}, gqv -> regexp_matches(gqv, '[a-zA-Z]')))"
        f" / {nw1}::DOUBLE, {ROUND_DP})"
    )
    stops_list = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPS) + "]"
    lwords = (
        f"list_filter(string_split_regex(lower(trim({text_col})), '\\s+'),"
        f" gqy -> gqy <> '')"
    )
    stop_hits = f"len(list_filter({stops_list}, gqs -> list_contains({lwords}, gqs)))"
    keep = (
        f"{nw} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}"
        f" AND {mean_len} BETWEEN {GOPHER_MIN_MEAN_LEN} AND {GOPHER_MAX_MEAN_LEN}"
        f" AND {n_hash} / {nw1}::DOUBLE <= {GOPHER_MAX_SYMBOL_RATIO}"
        f" AND {n_ell} / {nw1}::DOUBLE <= {GOPHER_MAX_SYMBOL_RATIO}"
        f" AND {bullet} <= {GOPHER_MAX_BULLET_FRAC}"
        f" AND {ell_line} <= {GOPHER_MAX_ELLIPSIS_FRAC}"
        f" AND {alpha} >= {GOPHER_MIN_ALPHA_FRAC}"
        f" AND {stop_hits} >= {GOPHER_MIN_STOP_HITS}"
    )
    return f"""
SELECT {id_col} AS doc_id,
       {nw}::BIGINT AS n_words,
       {mean_len} AS mean_word_len,
       round({n_hash} / {nw1}::DOUBLE, {ROUND_DP}) AS hash_ratio,
       round({n_ell} / {nw1}::DOUBLE, {ROUND_DP}) AS ellipsis_ratio,
       {bullet} AS bullet_frac,
       {ell_line} AS ellipsis_line_frac,
       {alpha} AS alpha_frac,
       {stop_hits}::BIGINT AS stop_hits,
       ({keep}) AS keep
FROM {table}
"""
