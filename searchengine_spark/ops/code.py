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
