"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` on DuckDB at sf=0.01; compare row count,
column names, and order-insensitive values (columns sorted by name, rows
sorted, floats compared exactly — both sides round at the same pinned dp)."""

from __future__ import annotations

import math

import duckdb
import pytest

import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 9)
                    if v == -0.0:
                        v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [cols[i] for i in order], out


ALL_KEYS = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("key", ALL_KEYS)
def test_query_matches_oracle(spark, duck, key):
    qfn = entry_mod.queries()[key]
    sdf = qfn(spark, SF_DIR)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    # the driver canonicalizes EVERY entry's result (rows-only included) with
    # a pandas sort that dies on unhashable cells — forbid non-scalar columns
    # (CORRECTNESS_r01 media_features regression guard)
    for row in spark_rows[:50]:
        for v in row:
            assert not isinstance(v, (list, dict, set, bytearray)), (
                f"{key}: non-scalar value {type(v).__name__} would crash the "
                f"driver canonicalizer — project to scalar columns"
            )

    sql = entry_mod.oracle_sql().get(key)
    if sql is None:
        assert len(spark_rows) > 0, f"{key}: rows-only check failed (0 rows)"
        return
    cur = duck.execute(sql)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    scols, svals = _normalize(spark_rows, spark_cols)
    dcols, dvals = _normalize(duck_rows, duck_cols)
    assert scols == dcols, f"{key}: column names differ: {scols} vs {dcols}"
    assert len(svals) == len(dvals), f"{key}: row count {len(svals)} vs {len(dvals)}"
    mism = [i for i, (a, b) in enumerate(zip(svals, dvals)) if a != b]
    assert not mism, f"{key}: {len(mism)} mismatched rows, first: {svals[mism[0]]} vs {dvals[mism[0]]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "score"}


def test_no_duplicate_entry_keys():
    """Duplicate keys in the queries()/oracle_sql() dict LITERALS would
    silently shadow an earlier driver entry (later key wins) — exactly
    the bug class that once hid the index-native significant_terms."""
    import ast
    import collections
    import inspect

    import searchengine_spark.entry_queries as eq

    tree = ast.parse(inspect.getsource(eq))
    seen = {}
    for fn in ast.walk(tree):
        if isinstance(fn, ast.FunctionDef) and fn.name in ("queries", "oracle_sql"):
            for node in ast.walk(fn):
                if isinstance(node, ast.Dict):
                    keys = [
                        k.value for k in node.keys if isinstance(k, ast.Constant)
                    ]
                    dups = [
                        k for k, c in collections.Counter(keys).items() if c > 1
                    ]
                    assert not dups, f"{fn.name} has duplicate keys: {dups}"
                    seen[fn.name] = len(keys)
    assert seen.get("queries", 0) >= 130  # the registry only grows
