"""Index integrity checker (the ``fsck`` for on-disk indexes): validate
meta ↔ manifest ↔ segments ↔ dictionary ↔ docstats consistency without
trusting any single artifact.

Three tiers, cheapest first:

* **layout** (driver-side, no Spark): meta.json parses, the directories it
  points at exist, manifest rows are well-formed and their buckets are in
  range;
* **stats** (two tiny Spark aggs): docstats row count == meta.n_docs and
  Σ doc_len == meta.total_len; dictionary terms are unique and every df/cf
  is positive;
* **deep** (one distributed decode pass, opt-in): every block decodes,
  its header fields (n_docs, first/last doc, max_tf) match the decoded
  payload, doc_ids are strictly increasing — and for pristine batch
  layouts (no stream epochs, no tombstones) the per-term document count
  re-aggregated from the segments equals the dictionary's df exactly.
  Epoch/tombstone layouts skip the df cross-check (df intentionally drifts
  until compaction — documented in ``streaming/ingest.py``) and report it
  as skipped rather than silently passing.

Scale shape: the deep pass is a narrow mapInPandas over the segment scan
(one row of verdict counters per arrow batch) + one |vocab|-sized join —
no per-query state, no driver iteration; at 100 TB you run it like any
other full-index aggregation, or point it at one bucket's directory.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .build import IndexMeta, read_manifest

_DEEP_SCHEMA = (
    "term string, bucket long, n_blocks long, n_postings long, "
    "bad_ndocs long, bad_bounds long, bad_maxtf long, bad_order long, "
    "bad_decode long"
)


def _deep_decode(batches):
    import pandas as pd

    from .codec import decode_block

    for pdf in batches:
        rows: dict = {}
        for r in pdf.itertuples(index=False):
            key = (r.term, int(r.bucket))
            agg = rows.setdefault(key, [0, 0, 0, 0, 0, 0, 0])
            try:
                docs, tfs, _dls = decode_block(
                    r.first_doc, r.n_docs, r.doc_bytes, r.tf_bytes, r.dl_bytes
                )
            except Exception:
                # a truly corrupt payload must land in the REPORT, not
                # crash the verification job with a task failure
                agg[0] += 1
                agg[6] += 1
                continue
            signed = docs.view("int64")  # stored first/last are signed views
            agg[0] += 1
            agg[1] += len(docs)
            if len(docs) != r.n_docs:
                agg[2] += 1
            if len(docs) and (
                int(signed[0]) != int(r.first_doc)
                or int(signed[-1]) != int(r.last_doc)
            ):
                agg[3] += 1
            if len(tfs) and int(tfs.max()) != int(r.max_tf):
                agg[4] += 1
            if len(docs) > 1 and not bool((docs[1:] > docs[:-1]).all()):
                agg[5] += 1
        yield pd.DataFrame(
            [
                (t, b, *agg)
                for (t, b), agg in rows.items()
            ],
            columns=[
                "term", "bucket", "n_blocks", "n_postings", "bad_ndocs",
                "bad_bounds", "bad_maxtf", "bad_order", "bad_decode",
            ],
        )


def verify_index(spark, index_dir: str, deep: bool = False) -> dict:
    """Run the integrity tiers; returns a report dict:
    ``{"ok": bool, "errors": [...], "warnings": [...], "checks": {...}}``.
    ``ok`` is False iff a hard violation was found (missing artifact,
    count mismatch, undecodable/inconsistent block)."""
    errors: list[str] = []
    warnings: list[str] = []
    checks: dict = {}

    # -- layout ------------------------------------------------------------
    try:
        meta = IndexMeta.load(index_dir)
    except Exception as e:  # missing/corrupt meta.json
        return {
            "ok": False,
            "errors": [f"meta.json unreadable: {e}"],
            "warnings": [],
            "checks": {},
        }
    seg_dir = os.path.join(index_dir, meta.segments_dir)
    dict_dir = os.path.join(index_dir, meta.dictionary_dir)
    stats_dir = os.path.join(index_dir, "docstats")
    # epoch-layout (streamed/appended) indexes never write docstats — the
    # epoch commit carries stats in meta/manifest instead; requiring the
    # dir made EVERY healthy streamed index fail layout verification
    epoch_layout = meta.stream_epochs > 0 or (
        os.path.isdir(seg_dir)
        and any(e.startswith("epoch=") for e in os.listdir(seg_dir))
    )
    required = [("segments", seg_dir), ("dictionary", dict_dir)]
    if not epoch_layout:
        required.append(("docstats", stats_dir))
    for name, p in required:
        if not os.path.isdir(p):
            errors.append(f"{name} directory missing: {p}")
    if epoch_layout and not os.path.isdir(stats_dir):
        checks["docstats"] = "absent (epoch layout — stats live in meta)"
    manifest = read_manifest(index_dir)
    checks["manifest_rows"] = len(manifest)
    if not manifest:
        warnings.append("manifest.jsonl missing or empty (no lineage)")
    for m in manifest:
        if m.get("kind") == "segment" and m.get("bucket") is not None:
            if not 0 <= int(m["bucket"]) < meta.n_buckets:
                errors.append(f"manifest segment bucket out of range: {m}")
    if errors:
        return {"ok": False, "errors": errors, "warnings": warnings,
                "checks": checks}

    # -- stats -------------------------------------------------------------
    if epoch_layout and not os.path.isdir(stats_dir):
        stats = None
    else:
        stats = spark.read.parquet(stats_dir)
    if stats is not None:
        row = stats.agg(
            F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("tl")
        ).collect()[0]
        checks["docstats_rows"] = int(row["n"])
        if int(row["n"]) != meta.n_docs:
            errors.append(
                f"docstats rows {row['n']} != meta.n_docs {meta.n_docs}"
            )
        if int(row["tl"] or 0) != meta.total_len:
            errors.append(
                f"docstats Σdoc_len {row['tl']} != meta.total_len "
                f"{meta.total_len}"
            )
    dct = spark.read.parquet(dict_dir)
    drow = dct.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("term").alias("nd"),
        F.min("df").alias("min_df"),
        F.min("cf").alias("min_cf"),
    ).collect()[0]
    checks["dictionary_terms"] = int(drow["n"])
    if drow["n"] != drow["nd"]:
        errors.append(f"dictionary has duplicate terms: {drow['n']} rows, "
                      f"{drow['nd']} distinct")
    if drow["n"] and (int(drow["min_df"]) <= 0 or int(drow["min_cf"]) <= 0):
        errors.append("dictionary contains non-positive df/cf")

    has_epochs = meta.stream_epochs > 0 or any(
        e.startswith("epoch=") for e in os.listdir(seg_dir)
    )
    has_tombstones = os.path.isdir(os.path.join(index_dir, "tombstones"))

    # -- deep --------------------------------------------------------------
    if deep:
        seg = spark.read.parquet(seg_dir).select(
            "term", "bucket", "n_docs", "first_doc", "last_doc", "max_tf",
            "doc_bytes", "tf_bytes", "dl_bytes",
        )
        per_term = seg.mapInPandas(_deep_decode, schema=_DEEP_SCHEMA)
        per_term = per_term.groupBy("term").agg(
            F.sum("n_blocks").alias("n_blocks"),
            F.sum("n_postings").alias("df_from_segments"),
            *[
                F.sum(c).alias(c)
                for c in ("bad_ndocs", "bad_bounds", "bad_maxtf",
                          "bad_order", "bad_decode")
            ],
        ).cache()
        bad = per_term.agg(
            F.sum("n_blocks").alias("blocks"),
            *[
                F.sum(c).alias(c)
                for c in ("bad_ndocs", "bad_bounds", "bad_maxtf",
                          "bad_order", "bad_decode")
            ],
        ).collect()[0]
        checks["blocks_decoded"] = int(bad["blocks"] or 0)
        for c in ("bad_ndocs", "bad_bounds", "bad_maxtf", "bad_order",
                  "bad_decode"):
            n = int(bad[c] or 0)
            checks[c] = n
            if n:
                errors.append(f"{n} blocks failed {c} invariant")
        if has_epochs or has_tombstones:
            checks["df_crosscheck"] = (
                "skipped (epoch/tombstone layout — df drifts until "
                "compaction by design)"
            )
        else:
            mism = (
                per_term.join(dct.select("term", "df"), "term", "full")
                .filter(
                    F.col("df").isNull()
                    | F.col("df_from_segments").isNull()
                    | (F.col("df") != F.col("df_from_segments"))
                )
                .count()
            )
            checks["df_crosscheck"] = f"{mism} mismatched terms"
            if mism:
                errors.append(
                    f"{mism} terms where segment-recounted df != dictionary df"
                )
        per_term.unpersist()

    return {"ok": not errors, "errors": errors, "warnings": warnings,
            "checks": checks}
