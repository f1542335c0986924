"""Source-code structure extraction: definition mining over the corpus
content column — the symbol layer a code search engine builds on (boost
hits whose DEFINITION matches the query, power go-to-definition).

Patterns are restricted to the Java ∩ RE2 ∩ Python regex subset (like
``ops.pii``): alternations + char classes + one capture group, no
lookaround — so the Spark expression, the pure-Python twin, and the
DuckDB oracle agree match-for-match. Two language-agnostic families:

  * function-like:  (def|func|function|fn) NAME
  * type-like:      (class|struct|interface|trait|enum) NAME

One map pass of regexp_extract_all per family — zero shuffle before the
(optional) per-name aggregation; at 10^12 files this is scan-bound.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IDENT = "[A-Za-z_][A-Za-z0-9_]*"
# leading \b: without it the keywords match inside larger tokens —
# '#ifdef DEBUG' would mint a bogus function 'DEBUG', 'typedef int x'
# a function 'int'. \b is in the Java∩RE2∩Python subset.
PATTERNS: tuple[tuple[str, str], ...] = (
    ("function", rf"\b(?:def|func|function|fn)\s+({_IDENT})"),
    ("type", rf"\b(?:class|struct|interface|trait|enum)\s+({_IDENT})"),
)
_COMPILED = [(kind, re.compile(pat)) for kind, pat in PATTERNS]


def definitions(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, kind, name): every function/type definition site in the
    text, duplicates preserved (a name defined twice in one file is two
    rows — overload/shadowing signal)."""
    parts = [
        df.select(
            F.col(id_col).alias("doc_id"),
            F.lit(kind).alias("kind"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), 1)
            ).alias("name"),
        )
        for kind, pat in PATTERNS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def definitions_py(text: str) -> list[tuple[str, str]]:
    """Pure-Python twin: [(kind, name)] in pattern-then-position order."""
    out = []
    for kind, rx in _COMPILED:
        out.extend((kind, m.group(1)) for m in rx.finditer(text))
    return out


def definitions_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``definitions`` (RE2 regexp_extract_all, group 1)."""
    selects = " UNION ALL ".join(
        f"SELECT {id_col} AS doc_id, '{kind}' AS kind, "
        f"unnest(regexp_extract_all({text_col}, '{pat}', 1)) AS name "
        f"FROM {table}"
        for kind, pat in PATTERNS
    )
    return selects


def symbol_stats(defs: DataFrame) -> DataFrame:
    """(name, kind, n_defs, n_files): how often and how widely each symbol
    is defined — the duplication/shadowing report and the df table for
    symbol-boosted ranking."""
    return defs.groupBy("name", "kind").agg(
        F.count(F.lit(1)).alias("n_defs"),
        F.countDistinct("doc_id").alias("n_files"),
    )


# --------------------------------------------------------------- imports
# same portable-regex discipline; quote characters are doubled when the
# pattern is embedded in the SQL twin
IMPORT_PATTERNS: tuple[tuple[str, str], ...] = (
    ("import", r"\bimport\s+([A-Za-z_][A-Za-z0-9_.]*)"),
    ("from", r"\bfrom\s+([A-Za-z_][A-Za-z0-9_.]*)\s+import\b"),
    ("include", r"#include\s*[<\"]([A-Za-z0-9_./]+)[>\"]"),
    ("require", r"\brequire\('([A-Za-z0-9_./@-]+)'\)"),
)
_IMPORT_COMPILED = [(k, re.compile(p)) for k, p in IMPORT_PATTERNS]


def imports(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, kind, module): every import/include/require site — the
    raw edges of the dependency graph (resolve module→defining repo
    downstream and feed ``ops.graph.pagerank`` for authority-ranked code
    search)."""
    parts = [
        df.select(
            F.col(id_col).alias("doc_id"),
            F.lit(kind).alias("kind"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), 1)
            ).alias("module"),
        )
        for kind, pat in IMPORT_PATTERNS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def imports_py(text: str) -> list[tuple[str, str]]:
    out = []
    for kind, rx in _IMPORT_COMPILED:
        out.extend((kind, m.group(1)) for m in rx.finditer(text))
    return out


def imports_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``imports``."""
    return " UNION ALL ".join(
        f"SELECT {id_col} AS doc_id, '{kind}' AS kind, "
        f"unnest(regexp_extract_all({text_col}, "
        f"'{pat.replace(chr(39), chr(39) * 2)}', 1)) AS module "
        f"FROM {table}"
        for kind, pat in IMPORT_PATTERNS
    )


# ---------------------------------------------------------- quality stats
# StarCoder/BigCode-style per-file filter signals for a source-code
# training corpus: line-length shape (auto-generated/minified detection)
# and alphanumeric density (binary-blob / data-file detection). Pure JVM
# string/array expressions — one scan, zero shuffle, whole-stage codegen;
# at 10^12 files this is scan-bound like ``definitions``. Array lambdas
# are SQL-parsed with unique variable names (the Spark 4.1 sibling-lambda
# cross-bind gotcha — see ops/dedup.py minhash_signatures).

LONG_LINE = 120  # "long line" threshold for frac_long_lines


def _quality_cols(
    id_col: str, text_col: str, long_line: int = LONG_LINE, round_dp: int = 4
) -> list:
    """The aliased quality-stat Columns (shared by ``code_quality`` and
    ``code_profile`` so the profile stays one projection)."""
    lens = F.expr(
        f"transform(split({text_col}, '\\n', -1), cq_ln -> length(cq_ln))"
    )
    n_lines = F.size(lens).cast("long")
    text_len = F.length(F.col(text_col))
    alnum_len = F.length(
        F.regexp_replace(F.col(text_col), "[^A-Za-z0-9]", "")
    )
    return [
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        F.array_max(lens).cast("long").alias("max_line_len"),
        F.round(
            (text_len - (n_lines - F.lit(1))) / n_lines.cast("double"),
            round_dp,
        ).alias("avg_line_len"),
        F.round(
            F.when(text_len > 0, alnum_len / text_len.cast("double"))
            .otherwise(F.lit(0.0)),
            round_dp,
        ).alias("alnum_frac"),
        F.round(
            F.size(
                F.expr(
                    f"filter(transform(split({text_col}, '\\n', -1), "
                    f"cq_fl -> length(cq_fl)), cq_gt -> cq_gt > {int(long_line)})"
                )
            )
            / n_lines.cast("double"),
            round_dp,
        ).alias("frac_long_lines"),
    ]


def code_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    long_line: int = LONG_LINE,
    round_dp: int = 4,
) -> DataFrame:
    """(doc_id, n_lines, max_line_len, avg_line_len, alnum_frac,
    frac_long_lines): the per-file shape stats the BigCode/StarCoder
    pipeline thresholds before training. Split keeps trailing empties
    (Spark split(limit=-1) ≡ DuckDB str_split), so n_lines = newlines+1;
    avg_line_len is derived arithmetically from length(text) (newline
    chars excluded) instead of summing the per-line array."""
    return df.select(*_quality_cols(id_col, text_col, long_line, round_dp))


def code_quality_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    long_line: int = LONG_LINE,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ``code_quality`` (str_split(chr(10)) keeps trailing
    empties like Spark's split(limit=-1); regexp_extract '' on no-match
    matches Spark — probed, not assumed)."""
    lens = f"list_transform(str_split({text_col}, chr(10)), cq_ln -> length(cq_ln))"
    return f"""
SELECT {id_col} AS doc_id,
       len(str_split({text_col}, chr(10)))::BIGINT AS n_lines,
       list_max({lens})::BIGINT AS max_line_len,
       round((length({text_col}) - (len(str_split({text_col}, chr(10))) - 1))
             / len(str_split({text_col}, chr(10)))::DOUBLE, {round_dp}) AS avg_line_len,
       round(CASE WHEN length({text_col}) > 0
             THEN length(regexp_replace({text_col}, '[^A-Za-z0-9]', '', 'g'))
                  / length({text_col})::DOUBLE
             ELSE 0.0 END, {round_dp}) AS alnum_frac,
       round(len(list_filter({lens}, cq_gt -> cq_gt > {int(long_line)}))
             / len(str_split({text_col}, chr(10)))::DOUBLE, {round_dp}) AS frac_long_lines
FROM {table}
"""


# StarCoder-ish keep thresholds (The Stack v1 preprocessing):
# max line ≤ 1000 chars, mean line ≤ 100 chars, ≥ 25% alphanumeric.
QUALITY_MAX_LINE = 1000
QUALITY_MAX_AVG = 100.0
QUALITY_MIN_ALNUM = 0.25


def code_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_line: int = QUALITY_MAX_LINE,
    max_avg: float = QUALITY_MAX_AVG,
    min_alnum: float = QUALITY_MIN_ALNUM,
) -> DataFrame:
    """``code_quality`` + the boolean ``keep`` verdict under the published
    StarCoder-style thresholds. Returns stats + keep (callers filter on it
    or audit the drop set); thresholding happens on the ROUNDED stats so
    the verdict is reproducible against the SQL twin bit-for-bit."""
    stats = code_quality(df, id_col=id_col, text_col=text_col)
    return stats.withColumn(
        "keep",
        (F.col("max_line_len") <= max_line)
        & (F.col("avg_line_len") <= max_avg)
        & (F.col("alnum_frac") >= min_alnum),
    )


def code_quality_filter_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_line: int = QUALITY_MAX_LINE,
    max_avg: float = QUALITY_MAX_AVG,
    min_alnum: float = QUALITY_MIN_ALNUM,
) -> str:
    """DuckDB twin of ``code_quality_filter``."""
    inner = code_quality_sql(table, id_col=id_col, text_col=text_col)
    return f"""
SELECT *, (max_line_len <= {int(max_line)} AND avg_line_len <= {max_avg}
           AND alnum_frac >= {min_alnum}) AS keep
FROM ({inner})
"""


# ------------------------------------------------------- license detection
# License tagging for a code training corpus (The Stack keeps only
# permissive licenses): SPDX tag wins, else phrase heuristics over the
# lowercased header. Contains/regexp only — one scan, zero shuffle. Order
# matters: LGPL before GPL ('lesser general public license' contains
# 'general public license').
_SPDX_RX = r"spdx-license-identifier:\s*([a-z0-9.+-]+)"
# (phrase, tag) in priority order after SPDX
LICENSE_PHRASES: tuple[tuple[str, str], ...] = (
    ("apache license", "apache-2.0"),
    ("mit license", "mit"),
    ("lesser general public license", "lgpl-2.1"),
    ("general public license", "gpl-3.0"),
    ("bsd license", "bsd-3-clause"),
    ("mozilla public license", "mpl-2.0"),
    ("isc license", "isc"),
)
PERMISSIVE = (
    "apache-2.0", "mit", "bsd-2-clause", "bsd-3-clause", "isc",
    "unlicense", "zlib", "0bsd",
)


def _license_col(text_col: str):
    lower = F.lower(F.col(text_col))
    spdx = F.regexp_extract(lower, _SPDX_RX, 1)
    lic = F.when(spdx != "", spdx)
    for phrase, tag in LICENSE_PHRASES:
        lic = lic.when(lower.contains(phrase), F.lit(tag))
    return lic.otherwise(F.lit("unknown"))


def license_detect(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, license, permissive): SPDX identifier if present (verbatim,
    lowercased), else the first matching license phrase, else 'unknown'.
    ``permissive`` is membership in the Stack-style allowlist (unknown and
    copyleft → false)."""
    out = df.select(
        F.col(id_col).alias("doc_id"), _license_col(text_col).alias("license")
    )
    return out.withColumn("permissive", F.col("license").isin(*PERMISSIVE))


def code_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_line: int = QUALITY_MAX_LINE,
    max_avg: float = QUALITY_MAX_AVG,
    min_alnum: float = QUALITY_MIN_ALNUM,
) -> DataFrame:
    """Quality stats + keep + license + permissive in ONE projection —
    the scan-bound composition the `codestats` CLI runs. No doc_id
    self-join between the two ops: the license column is selected in the
    same pass, so the whole profile stays Exchange-free (plan-tested)."""
    cols = _quality_cols(id_col, text_col)
    out = df.select(*cols, _license_col(text_col).alias("license"))
    return (
        out.withColumn(
            "keep",
            (F.col("max_line_len") <= max_line)
            & (F.col("avg_line_len") <= max_avg)
            & (F.col("alnum_frac") >= min_alnum),
        )
        .withColumn("permissive", F.col("license").isin(*PERMISSIVE))
    )


def license_detect_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``license_detect`` (RE2; regexp_extract '' on
    no-match, same as Spark)."""
    low = f"lower({text_col})"
    whens = "\n         ".join(
        f"WHEN contains({low}, '{phrase}') THEN '{tag}'"
        for phrase, tag in LICENSE_PHRASES
    )
    perm = ", ".join(f"'{t}'" for t in PERMISSIVE)
    return f"""
SELECT doc_id, license, license IN ({perm}) AS permissive
FROM (
  SELECT {id_col} AS doc_id,
    CASE WHEN regexp_extract({low}, '{_SPDX_RX}', 1) <> ''
         THEN regexp_extract({low}, '{_SPDX_RX}', 1)
         {whens}
         ELSE 'unknown' END AS license
  FROM {table}
)
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
# local document-fingerprinting algorithm): hash every k-token shingle,
# slide a window of w consecutive shingle hashes, keep the MINIMUM hash of
# each window (rightmost on ties, the paper's robust-winnowing choice).
# Guarantee: any shared token run of length >= w + k - 1 produces at least
# one shared fingerprint — unlike MinHash this is LOCAL (it tells you the
# positions), which is what code-clone / license-propagation tooling needs.
#
# Relational shape: tokenize → posexplode → k-gram via lead() inside the
# per-doc window (no self-join) → md5 hash AS A FIXED-WIDTH HEX STRING
# (fixed-width hex compares like the number it encodes, so min() needs no
# numeric type and the (hash, rightmost-pos) tie-break packs into ONE
# string key: hash-hex + zero-padded inverted position) → windowed min →
# distinct. Everything partitions by doc_id — the single shuffle is the
# per-doc repartition the window needs; hashes are fixed-width strings
# BEFORE it, so shuffle rows never carry the gram text.
# ---------------------------------------------------------------------------

_WPOS_MAX = 999_999  # position inversion base (docs <= 1M tokens; guarded)
_GSEP = "\x01"  # gram joiner: tokens can't contain it, so no join ambiguity


def winnow_fingerprints(
    df: DataFrame,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, fp, pos): winnowing fingerprint set — ``fp`` the 60-bit
    shingle hash (hex string), ``pos`` the 0-based token position of the
    selected shingle. Deterministic: window minima break ties to the
    RIGHTMOST position, and the selection set is order-independent."""
    from pyspark.sql import Window

    from ..tokenizer import tokenize_raw_expr

    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize_raw_expr(F.col(text_col))).alias("pos", "tok"),
    )
    dw = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        _GSEP, *([F.col("tok")] + [F.lead("tok", i).over(dw) for i in range(1, k)])
    )
    # lead() returns NULL past the end; concat_ws skips NULLs, so guard by
    # requiring the k-th token to exist (pos <= n_tokens - k)
    last = F.lead("tok", k - 1).over(dw)
    kg = (
        toks.select(
            "doc_id", "pos",
            F.substring(F.md5(gram), 1, 15).alias("h"),
            last.alias("_guard"),
        )
        .where(F.col("_guard").isNotNull())
        .drop("_guard")
    )
    # pack (hash, rightmost tie-break) into one fixed-width sortable string.
    # The 6-digit field holds positions ≤ _WPOS_MAX only — beyond it the
    # inversion goes negative and '-' breaks the fixed-width sort, so the
    # overflow must be LOUD, not a silently wrong fingerprint set (giant
    # generated/minified files are exactly what this op dedups)
    pos_ok = F.when(
        F.col("pos") <= F.lit(_WPOS_MAX), F.col("pos")
    ).otherwise(
        F.raise_error(
            F.lit(
                f"doc exceeds {_WPOS_MAX} k-grams — winnow position packing "
                "would corrupt; chunk the doc (ops.packing.chunk_docs) first"
            )
        )
    )
    key = F.concat(
        F.col("h"),
        F.lpad((F.lit(_WPOS_MAX) - pos_ok).cast("string"), 6, "0"),
    )
    kw = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    n_grams = Window.partitionBy("doc_id")
    sel = (
        kg.select(
            "doc_id", "pos", key.alias("key"),
            F.count(F.lit(1)).over(n_grams).alias("_n"),
        )
        .withColumn("_sel", F.min("key").over(kw))
        .where(F.col("pos") <= F.col("_n") - w)  # full windows only
        .select("doc_id", F.col("_sel").alias("key"))
        .distinct()
    )
    return sel.select(
        "doc_id",
        F.substring("key", 1, 15).alias("fp"),
        (F.lit(_WPOS_MAX) - F.substring("key", 16, 6).cast("int")).alias("pos"),
    )


def winnow_pairs(fps: DataFrame, min_shared: int = 2) -> DataFrame:
    """(doc_a, doc_b, shared): document pairs ranked by the number of
    DISTINCT shared fingerprint hashes (a < b). The join key is the
    60-bit hash — collisions are possible and acceptable (MOSS treats the
    fingerprint index the same way); verify exact spans downstream with
    ``dedup.duplicate_spans`` if needed. The only wide op is the hash
    equi-join; a fingerprint shared by f docs yields f*(f-1)/2 pairs, so
    cap pathological hashes upstream at 10^12 scale (same playbook as the
    MinHash bucket cap)."""
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp").distinct()
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp").distinct()
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def winnow_fingerprints_sql(
    table: str,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin — same tokenizer CTE, same lead/min windows, same
    packed-string tie-break, same chr(1) gram joiner."""
    from ..tokenizer import STOPWORDS, TOKEN_PATTERN

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    leads = " || chr(1) || ".join(
        ["tok"] + [f"lead(tok, {i}) OVER dwin" for i in range(1, k)]
    )
    return f"""
WITH tok_lists AS (
  SELECT {id_col} AS doc_id,
         [t FOR t IN regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')
          IF t NOT IN ({stop_list})] AS l
  FROM {table}),
toks AS (
  SELECT doc_id, CAST(generate_subscripts(l, 1) - 1 AS INT) AS pos,
         unnest(l) AS tok
  FROM tok_lists),
kg AS (
  SELECT doc_id, pos,
         substr(md5({leads}), 1, 15) AS h,
         lead(tok, {k - 1}) OVER dwin AS guard
  FROM toks
  WINDOW dwin AS (PARTITION BY doc_id ORDER BY pos)),
keyed AS (
  SELECT doc_id, pos,
         h || lpad(CAST({_WPOS_MAX} -
                   CASE WHEN pos <= {_WPOS_MAX} THEN pos
                        ELSE error('doc exceeds winnow position bound')
                   END AS VARCHAR), 6, '0') AS key,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM kg WHERE guard IS NOT NULL),
sel AS (
  SELECT DISTINCT doc_id,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS key
  FROM keyed
  QUALIFY pos <= n - {w})
SELECT doc_id, substr(key, 1, 15) AS fp,
       {_WPOS_MAX} - CAST(substr(key, 16, 6) AS INT) AS pos
FROM sel
"""


def winnow_pairs_sql(fps_sql: str, min_shared: int = 2) -> str:
    return f"""
WITH fps AS ({fps_sql}),
a AS (SELECT DISTINCT doc_id AS doc_a, fp FROM fps),
b AS (SELECT DISTINCT doc_id AS doc_b, fp FROM fps)
SELECT doc_a, doc_b, count(*)::BIGINT AS shared
FROM a JOIN b USING (fp)
WHERE doc_a < doc_b
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


def fork_pairs(
    df: DataFrame,
    group_col: str,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.5,
    min_shared: int = 2,
    max_groups_per_fp: int = 50,
    round_dp: int = 5,
) -> DataFrame:
    """Repo-level fork detection (the StarCoder/The-Stack dedup step above
    file level): rank GROUP pairs (repo, site, source…) by winnowing-
    fingerprint containment — ``shared / min(|A|, |B|)`` over each group's
    DISTINCT fingerprint set — and keep pairs ≥ ``tau``. A fork that
    renamed/moved files still shares most content fingerprints, which
    file-level exact hashing misses.

    Boilerplate guard: fingerprints present in more than
    ``max_groups_per_fp`` groups (license headers, generated preambles)
    are EXCLUDED from pair generation — the MOSS shared-corpus rule and
    the same cap playbook as MinHash banding; at 10^12 files this is also
    what bounds the f²/2 pair blowup of ubiquitous hashes.

    Scale shape: fingerprints are per-doc windows (one doc-partitioned
    shuffle), group sets one distinct, pair-gen one fp equi-join whose
    width the cap bounds, containment a broadcast-size join against the
    |groups|-row size table. Returns
    (group_a, group_b, shared, n_a, n_b, containment) ordered by
    containment desc, then names."""
    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")
    fps = winnow_fingerprints(df, k=k, w=w, id_col=id_col, text_col=text_col)
    member = df.select(F.col(id_col).alias("doc_id"),
                       F.col(group_col).alias("grp"))
    gfp = fps.join(member, "doc_id").select("grp", "fp").distinct()
    keep = (
        gfp.groupBy("fp")
        .agg(F.countDistinct("grp").alias("_ng"))
        .where(F.col("_ng") <= max_groups_per_fp)
        .select("fp")
    )
    gfp = gfp.join(keep, "fp", "left_semi")
    sizes = gfp.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    a = gfp.select(F.col("grp").alias("group_a"), "fp")
    b = gfp.select(F.col("grp").alias("group_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    sz = F.broadcast(sizes)
    out = (
        pairs.join(sz.select(F.col("grp").alias("group_a"),
                             F.col("n").alias("n_a")), "group_a")
        .join(sz.select(F.col("grp").alias("group_b"),
                        F.col("n").alias("n_b")), "group_b")
        .withColumn(
            "containment",
            F.round(F.col("shared") / F.least("n_a", "n_b"), round_dp),
        )
        .where(F.col("containment") >= tau)
    )
    return out.select(
        "group_a", "group_b", "shared", "n_a", "n_b", "containment"
    ).orderBy(F.desc("containment"), F.asc("group_a"), F.asc("group_b"))


def fork_pairs_sql(
    fps_sql: str,
    table: str,
    group_col: str,
    tau: float = 0.5,
    min_shared: int = 2,
    max_groups_per_fp: int = 50,
    round_dp: int = 5,
) -> str:
    """DuckDB twin of ``fork_pairs`` over the same fingerprint CTE."""
    return f"""
WITH fps AS ({fps_sql}),
member AS (SELECT doc_id, {group_col} AS grp FROM {table}),
gfp0 AS (SELECT DISTINCT m.grp, f.fp FROM fps f JOIN member m USING (doc_id)),
keep AS (SELECT fp FROM gfp0 GROUP BY fp
         HAVING count(DISTINCT grp) <= {max_groups_per_fp}),
gfp AS (SELECT g.grp, g.fp FROM gfp0 g JOIN keep USING (fp)),
sizes AS (SELECT grp, count(*) AS n FROM gfp GROUP BY grp),
pairs AS (
  SELECT a.grp AS group_a, b.grp AS group_b, count(*)::BIGINT AS shared
  FROM gfp a JOIN gfp b USING (fp)
  WHERE a.grp < b.grp
  GROUP BY 1, 2
  HAVING count(*) >= {min_shared})
SELECT p.group_a, p.group_b, p.shared,
       sa.n::BIGINT AS n_a, sb.n::BIGINT AS n_b,
       round(p.shared / least(sa.n, sb.n), {round_dp}) AS containment
FROM pairs p
JOIN sizes sa ON sa.grp = p.group_a
JOIN sizes sb ON sb.grp = p.group_b
WHERE round(p.shared / least(sa.n, sb.n), {round_dp}) >= {tau}
ORDER BY containment DESC, group_a ASC, group_b ASC
"""


# ------------------------------------------------- stored symbol layout
# Go-to-definition as a STORAGE problem (Sourcegraph's symbol sidecar /
# ctags index; absent in the reference, which has no code surface at
# all). At 10^12 files the definitions table is itself huge — billions
# of rows — so point lookups ("where is parseQueryString defined?")
# must not scan it. Two sublayouts under one root:
#
#   defs/   (doc_id, kind, name) partitionBy(sym_bucket): an exact-name
#           lookup computes the bucket driver-side and reads ONE of
#           n_buckets partitions — the scan's PartitionFilters prune the
#           rest (plan-tested).
#   stats/  (name, kind, n_defs, n_files) range-partitioned AND sorted
#           by name: prefix suggest ("go to symbol: pars…") pushes
#           StringStartsWith into the parquet scan, where the sorted
#           layout makes row-group min/max pruning effective.
#
# The bucket function is the engine-portable md5 prefix (same idiom as
# ops.sampling): Spark column expr and Python twin agree digit-for-digit,
# so the reader can compute the target partition without a JVM call.

_SYM_META = "_symbols_meta.json"


def _sym_bucket_col(name_col: str, n_buckets: int):
    h = F.conv(F.substring(F.md5(F.col(name_col)), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(n_buckets)).cast("int")


def symbol_bucket_py(name: str, n_buckets: int) -> int:
    """Python twin of ``_sym_bucket_col`` (driver-side partition choice)."""
    import hashlib

    return int(hashlib.md5(name.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def symbol_write(
    df: DataFrame,
    path: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the symbol layout for ``df``'s corpus. The pre-write
    ``repartition(sym_bucket)`` clusters each bucket into one task's
    output (at 100 TB size it as repartition(N, sym_bucket) to hit the
    per-file target); stats/ is range-partitioned so each file owns a
    contiguous name range and row-group pruning works for prefixes."""
    import json
    import os

    # defs/ first, then stats/ FROM the written defs — the regex mine over
    # every corpus byte (the dominant cost) runs once, not once per write
    defs = definitions(df, id_col, text_col)
    (
        defs.withColumn("sym_bucket", _sym_bucket_col("name", n_buckets))
        .repartition("sym_bucket")
        .write.mode("overwrite")
        .partitionBy("sym_bucket")
        .parquet(os.path.join(path, "defs"))
    )
    spark = df.sparkSession
    written = spark.read.parquet(os.path.join(path, "defs")).select(
        "doc_id", "kind", "name"
    )
    n_stats_parts = max(1, n_buckets // 8)
    (
        symbol_stats(written)
        .repartitionByRange(n_stats_parts, "name")
        .sortWithinPartitions("name", "kind")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "stats"))
    )
    tmp = os.path.join(path, _SYM_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"kind": "symbols", "n_buckets": n_buckets, "id_col": id_col},
            f,
        )
    os.replace(tmp, os.path.join(path, _SYM_META))


def read_symbol_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, _SYM_META)) as f:
        return json.load(f)


def symbol_lookup(spark, path: str, name: str) -> DataFrame:
    """Go-to-definition: every definition site of ``name``, read from ONE
    bucket partition (duplicates preserved — two def sites in one file
    are two rows, same contract as ``definitions``)."""
    import os

    meta = read_symbol_meta(path)
    b = symbol_bucket_py(name, int(meta["n_buckets"]))
    return (
        spark.read.parquet(os.path.join(path, "defs"))
        .filter((F.col("sym_bucket") == b) & (F.col("name") == name))
        .select("doc_id", "kind", "name")
    )


def symbol_prefix_topk(spark, path: str, prefix: str, k: int = 10) -> DataFrame:
    """Go-to-symbol suggest: top-k symbols starting with ``prefix``,
    widest spread first (n_files desc, n_defs desc, then name/kind for a
    total order). The startswith filter is pushed to the parquet scan
    (StringStartsWith in PushedFilters); the name-sorted layout turns it
    into row-group pruning instead of a full stats read."""
    import os

    stats = spark.read.parquet(os.path.join(path, "stats"))
    return (
        stats.filter(F.col("name").startswith(prefix))
        .orderBy(
            F.desc("n_files"), F.desc("n_defs"), F.asc("name"), F.asc("kind")
        )
        .limit(k)
    )


def symbol_subtokens(defs: DataFrame, analyzer: str = "code") -> DataFrame:
    """DISTINCT (doc_id, term): the analyzed subtokens of each doc's
    defined names — symbols indexed under the SAME analyzer as content,
    so query "parse" matches a doc defining ``parseQueryString``."""
    from ..tokenizer import analyze_text_expr, tokenize_expr

    return defs.select(
        "doc_id",
        F.explode(
            tokenize_expr(analyze_text_expr(F.col("name"), analyzer))
        ).alias("term"),
    ).distinct()


def symbol_boost(
    scored: DataFrame,
    defs: DataFrame,
    query: str,
    boost: float = 2.0,
    analyzer: str = "code",
) -> DataFrame:
    """Symbol-aware ranking (Zoekt/Sourcegraph rank definition hits above
    plain content hits; absent in the reference, which has no code
    surface): score += boost · |{query terms among the analyzed subtokens
    of the doc's defined names}|. Only candidates are boosted — under a
    shared analyzer a definition's name is part of the content, so a
    symbol match is always also a content match. ``scored`` is
    (doc_id, score); round scores BEFORE boosting and use power-of-two
    boosts so the fold is bit-identical to a SQL twin.

    Scale shape: defs' subtoken explode is narrow; the query-term join is
    a broadcast of O(|q|) rows filtering BEFORE the per-doc aggregation,
    so the shuffle carries only docs that define a query term."""
    from ..tokenizer import analyze_py

    terms = sorted(set(analyze_py(query, analyzer)))
    if not terms:
        return scored.select("doc_id", "score")
    spark = scored.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame([(t,) for t in terms], "term string")
    )
    n_sym = (
        symbol_subtokens(defs, analyzer)
        .join(qdf, "term")
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("n_sym"))
    )
    return (
        scored.join(n_sym, "doc_id", "left")
        .withColumn(
            "score",
            F.col("score")
            + F.lit(boost) * F.coalesce(F.col("n_sym"), F.lit(0)).cast("double"),
        )
        .select("doc_id", "score")
    )


def references(
    df: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Find-references for a symbol: (doc_id, n_mentions, n_defs, n_refs)
    for every doc mentioning ``name`` as a whole word — n_refs =
    whole-word mentions minus definition sites (a def line mentions the
    name too), so pure-reference docs have n_defs = 0.

    ``candidates`` (a doc_id frame, e.g. ``trigram_search`` over the
    literal name) semi-join-restricts the scan — the 10^12-file path: the
    trigram index prunes to docs containing the name's trigrams, and only
    those are regex-counted. Without it this is one linear corpus scan
    (fine as a batch op; wrong as a per-query path at scale)."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"not an identifier: {name!r}")
    if candidates is not None:
        df = df.join(
            candidates.select(F.col(candidates.columns[0]).alias(id_col)),
            id_col,
            "left_semi",
        )
    pat = rf"\b{name}\b"
    mentions = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        .cast("long")
        .alias("n_mentions"),
    ).filter(F.col("n_mentions") > 0)
    dcnt = (
        definitions(df, id_col, text_col)
        .filter(F.col("name") == name)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_defs"))
    )
    return (
        mentions.join(dcnt, "doc_id", "left")
        .withColumn("n_defs", F.coalesce(F.col("n_defs"), F.lit(0)).cast("long"))
        .withColumn("n_refs", (F.col("n_mentions") - F.col("n_defs")).cast("long"))
        .select("doc_id", "n_mentions", "n_defs", "n_refs")
    )


def symbol_append(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incrementally grow a symbol layout with NEW documents (same
    contract family as ``similarity.ann_append`` / ``trigram_append``):
    their definitions append into the same md5-bucket partitions —
    reader-identical to a rebuild over the union because the bucket
    function is pinned in the sidecar — and stats/ is recomputed FROM the
    post-append defs/ (the stats sublayout is an aggregate, so append
    can't patch it incrementally; it is |distinct symbols|-sized, far
    smaller than the corpus). Duplicate doc_ids are the caller's concern
    (append-only ids), and parquet appends are not atomic for a
    concurrently listing reader — run maintenance off the serving path,
    like the term index's epoch appends."""
    import os

    meta = read_symbol_meta(path)
    n_buckets = int(meta["n_buckets"])
    defs = definitions(df, id_col, text_col)
    (
        defs.withColumn("sym_bucket", _sym_bucket_col("name", n_buckets))
        .repartition("sym_bucket")
        .write.mode("append")
        .partitionBy("sym_bucket")
        .parquet(os.path.join(path, "defs"))
    )
    rebuild_symbol_stats(df.sparkSession, path)


def rebuild_symbol_stats(spark, path: str) -> None:
    """Recompute stats/ from the committed defs/ WITHOUT appending any
    definitions — both the tail of ``symbol_append`` and its crash-repair
    entry point. A crash between the two renames below leaves defs/ (the
    source of truth) committed but stats/ absent, with the previous stats
    stranded as stats_old/; re-running THIS function (not symbol_append,
    which would duplicate every defs row) restores the layout. Idempotent:
    leftover stats_new/ / stats_old/ from an interrupted run are cleared
    on entry, and a missing stats/ is tolerated."""
    import os
    import shutil

    meta = read_symbol_meta(path)
    n_buckets = int(meta["n_buckets"])
    written = spark.read.parquet(os.path.join(path, "defs")).select(
        "doc_id", "kind", "name"
    )
    n_stats_parts = max(1, n_buckets // 8)
    stats_dir = os.path.join(path, "stats")
    stats_new = os.path.join(path, "stats_new")
    if os.path.exists(stats_new):
        shutil.rmtree(stats_new)
    (
        symbol_stats(written)
        .repartitionByRange(n_stats_parts, "name")
        .sortWithinPartitions("name", "kind")
        .write.mode("overwrite")
        .parquet(stats_new)
    )
    # swap via rename pair — stats/ is derived data; a crash between the
    # renames is repaired by calling rebuild_symbol_stats(path) again
    old = os.path.join(path, "stats_old")
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(stats_dir):
        os.rename(stats_dir, old)
    os.rename(stats_new, stats_dir)
    shutil.rmtree(old, ignore_errors=True)
