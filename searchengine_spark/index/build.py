"""Resumable, salted, segment-partitioned inverted-index build.

Reference analogue: the whole Part A batch pipeline (SURVEY.md §3.2) —
first-letter posting dirs (``Part A/posting_file_factory.py:25-51``), 100k-doc
chunk spill (``Part A/indexer.py:15,47-51``), BSBI pairwise merge
(``Part A/merger.py:21-58``) — re-expressed as three Spark jobs:

  Stage A  corpus → (term, doc_id, tf, doc_len) "staged" postings, written as
           Parquet partitioned by ``bucket`` (term-hash — the scalable
           analogue of first-letter dirs). Salting: ``doc_range`` =
           high ``range_bits`` bits of the unsigned doc_id. A hot term
           (df≈N: ``def``/``import``/license boilerplate) is split across
           2^range_bits groups, defusing groupBy skew that AQE does not
           handle (SURVEY.md §4 note 1). Because doc_range is the *unsigned
           doc-id prefix*, concatenating a term's blocks in (doc_range,
           block_id) order yields a globally doc-sorted posting list.
  Stage B  dictionary (term, bucket, df, cf, idf, max_u) + meta.json
           (n_docs, avgdl, params, input fingerprint).
  Stage C  per bucket-wave: staged → groupBy(term, doc_range) →
           applyInPandas numpy block encoder (codec.py) → Parquet segments
           partitioned by bucket.

Every stage appends to ``manifest.jsonl`` (segment id = bucket, term range,
posting count, bytes) — the per-partition lineage the north rule requires.
Resume = skip manifest-complete stages/buckets; kill/resume produces
byte-identical segments (tests/test_index_resume.py).

The merge step of the reference (``Part A/merger.py``) disappears: it is the
shuffle performed by groupBy — SURVEY.md §4 table.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import BM25_B, BM25_K1
from ..postings import doc_stats, term_frequencies, term_positions
from .codec import BLOCK_SIZE

BLOCK_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("term", StringType()),
        StructField("doc_range", IntegerType()),
        StructField("block_id", IntegerType()),
        StructField("n_docs", IntegerType()),
        StructField("first_doc", LongType()),
        StructField("last_doc", LongType()),
        StructField("max_u", DoubleType()),
        StructField("max_tf", LongType()),
        StructField("min_dl", LongType()),
        StructField("doc_bytes", BinaryType()),
        StructField("tf_bytes", BinaryType()),
        StructField("dl_bytes", BinaryType()),
        StructField("pos_bytes", BinaryType()),  # null unless with_positions
    ]
)


@dataclass
class IndexMeta:
    n_docs: int
    avgdl: float
    k1: float
    b: float
    range_bits: int
    n_buckets: int
    block_size: int
    fingerprint: str
    # streamed-index fields (batch indexes keep the defaults):
    # dictionary_dir points at the CURRENT merged dictionary (epoch merges
    # write a fresh dir and swap via meta.json — readers follow the pointer);
    # stream_epochs > 0 switches the engine to avgdl-robust block bounds;
    # total_len (exact int Σ doc_len) lets the running avgdl update without
    # float drift.
    dictionary_dir: str = "dictionary"
    stream_epochs: int = 0
    total_len: int = 0
    # segments_dir follows the same pointer discipline as dictionary_dir:
    # compaction writes a fresh versioned dir and swaps it in via meta.json —
    # a live reader keeps a consistent view and a crash mid-compaction can
    # never leave the index without a segments directory (the old rename
    # protocol had exactly that window)
    segments_dir: str = "segments"
    # positional index: blocks carry a pos_bytes stream (per-posting token
    # positions) enabling index-native exact-phrase queries
    has_positions: bool = False
    # analyzer pinned at build time (Lucene analyzers): "standard", or
    # "code" (identifier splitting — tokenizer.code_split_*). The engine
    # analyzes queries with the SAME analyzer; appends/streaming inherit it
    analyzer: str = "standard"
    # doc store (ES _source): raw corpus rows persisted under source/
    # partitioned by doc_range — the query-then-fetch phase reads only the
    # hit ranges' partitions (engine.fetch)
    has_source: bool = False
    source_id_col: str = "doc_id"
    # text column of the stored source rows — recorded so ``reindex`` can
    # rebuild from the store without the caller re-supplying the schema
    # (empty on pre-doc-store metas; reindex then requires text_col=)
    source_text_col: str = ""

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @classmethod
    def load(cls, index_dir: str) -> "IndexMeta":
        with open(os.path.join(index_dir, "meta.json")) as f:
            return cls(**json.load(f))


def auto_range_bits(
    n_docs: int, target_docs_per_range: int = 4096, lo: int = 4, hi: int = 16
) -> int:
    """Scale the doc-range salt with the corpus: 2^bits ranges ≈
    n_docs/target_docs_per_range, clamped to [lo, hi].

    Query-stage parallelism equals the number of populated (doc_range)
    groups, so pinning range_bits pins the query stage's max speed-up —
    VERDICT r1 #10. The floor keeps small corpora from collapsing to a
    handful of groups on a many-core driver; the cap bounds per-term block
    fragmentation (a term's postings split across 2^bits ranges — past ~64k
    ranges rare terms degenerate to 1-doc blocks). At 10^12 docs the cap
    yields 65k ranges ≈ 15M docs/range: thousands of parallel groups per
    query with multi-block posting runs per term."""
    if n_docs <= target_docs_per_range:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_docs / target_docs_per_range))))


def write_meta_atomic(index_dir: str, meta: "IndexMeta") -> None:
    """meta.json via temp-file + os.replace: readers that auto-refresh on the
    meta fingerprint (SearchEngine.meta) must never observe a truncated
    file mid-write."""
    path = os.path.join(index_dir, "meta.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(meta.to_json())
    os.replace(tmp, path)


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.jsonl")


def read_manifest(index_dir: str) -> list[dict]:
    p = _manifest_path(index_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def _manifest_append(index_dir: str, row: dict) -> None:
    with open(_manifest_path(index_dir), "a") as f:
        f.write(json.dumps(row, sort_keys=True) + "\n")


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, fn)) for fn in files)
    return total


def _encode_group_fn(k1: float, b: float, avgdl: float, block_size: int):
    """applyInPandas kernel for ONE (bucket, doc_range) group containing ALL
    of that group's terms. Grouping by (bucket, doc_range) instead of
    (bucket, term, doc_range) matters twice at scale: (1) ~|vocab|× fewer
    Arrow groups — per-group pandas/Arrow overhead dominated stage C for
    small per-term groups (measured ~5× build-stage win); (2) group sizes are
    uniform by construction (hash bucket × doc-id range), so the hot-term
    skew never concentrates in one task — the salting story of SURVEY.md §7
    ends here. Inside, terms are separated with one lexsort + boundary scan
    (numpy), then each term's postings are block-encoded."""

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from .codec import encode_terms_blocks

        bucket = int(pdf["bucket"].iloc[0])
        doc_range = int(pdf["doc_range"].iloc[0])
        docs_all = pdf["doc_id"].to_numpy(dtype="int64").view("uint64")
        terms_all = pdf["term"].to_numpy()
        order = np.lexsort((docs_all, terms_all))
        docs_all = docs_all[order]
        terms_all = terms_all[order]
        tfs_all = pdf["tf"].to_numpy(dtype="int64")[order].astype("uint64")
        dls_all = pdf["doc_len"].to_numpy(dtype="int64")[order].astype("uint64")

        positions_flat = None
        if "positions" in pdf.columns:
            plists = pdf["positions"].to_numpy()[order]
            positions_flat = (
                np.concatenate([np.asarray(p, dtype=np.uint64) for p in plists])
                if len(plists)
                else np.zeros(0, dtype=np.uint64)
            )

        bounds = np.flatnonzero(terms_all[1:] != terms_all[:-1]) + 1
        starts = np.concatenate(([0], bounds)).astype(np.int64)
        ends = np.concatenate((bounds, [len(terms_all)])).astype(np.int64)

        blk = encode_terms_blocks(
            docs_all, tfs_all, dls_all, starts, ends, k1, b, avgdl, block_size,
            positions_flat=positions_flat,
        )
        term_values = terms_all[starts]
        return pd.DataFrame(
            {
                "bucket": bucket,
                "term": term_values[blk["term_idx"]],
                "doc_range": doc_range,
                "block_id": blk["block_id"],
                "n_docs": blk["n_docs"],
                "first_doc": blk["first_doc"],
                "last_doc": blk["last_doc"],
                "max_u": blk["max_u"],
                "max_tf": blk["max_tf"],
                "min_dl": blk["min_dl"],
                "doc_bytes": blk["doc_bytes"],
                "tf_bytes": blk["tf_bytes"],
                "dl_bytes": blk["dl_bytes"],
                "pos_bytes": blk["pos_bytes"]
                if blk["pos_bytes"] is not None
                else [None] * len(blk["block_id"]),
            }
        )[[f.name for f in BLOCK_SCHEMA.fields]]

    return encode


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = BM25_K1,
    b: float = BM25_B,
    range_bits: int | None = None,
    n_buckets: int = 16,
    block_size: int = BLOCK_SIZE,
    n_waves: int = 1,
    use_arrow_udf: bool = True,
    with_positions: bool = False,
    fresh: bool = False,
    analyzer: str = "standard",
    store_source: bool = False,
    _stop_after_waves: int | None = None,
) -> IndexMeta:
    """Build (or resume) the index at ``index_dir``. Returns meta.

    ``analyzer="code"`` applies identifier splitting (camelCase / acronym /
    snake_case — ``tokenizer.code_split_expr``) as a TEXT→TEXT column
    transform before the standard tokenizer, and pins the choice in
    meta.json so the query side analyzes identically. Everything
    downstream (tf, positions, phrase adjacency) is unchanged."""
    from ..tokenizer import analyze_text_expr

    raw_corpus = corpus  # doc store keeps the PRE-analysis text
    corpus = corpus.withColumn(
        text_col, analyze_text_expr(F.col(text_col), analyzer)
    )
    if fresh and os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    done = {(m["kind"], m.get("bucket")) for m in read_manifest(index_dir)}
    t_start = time.perf_counter()
    stage_sec: dict[str, float] = {}

    def _mark(stage: str, t0: float) -> None:
        stage_sec[stage] = round(time.perf_counter() - t0, 3)

    staged_path = os.path.join(index_dir, "staged")
    dict_path = os.path.join(index_dir, "dictionary")
    stats_path = os.path.join(index_dir, "docstats")
    seg_path = os.path.join(index_dir, "segments")

    # ---- Stage A: staged postings + doc stats + meta -----------------------
    if ("staged", None) not in done:
        from pyspark import StorageLevel

        # tf feeds BOTH the doc-stats write and the staged-postings write;
        # persisting it avoids tokenizing the corpus twice (the dominant
        # stage-A cost). MEMORY_AND_DISK: at 100 TB the tf relation spills
        # to executor-local disk instead of OOMing.
        t0 = time.perf_counter()
        tf_source = term_positions if with_positions else term_frequencies
        tf_df = tf_source(corpus, id_col, text_col, use_arrow_udf).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        stats = doc_stats(tf_df)
        stats.write.mode("overwrite").parquet(stats_path)
        _mark("a1_tf_stats", t0)
        t0 = time.perf_counter()
        stats = spark.read.parquet(stats_path)
        agg = stats.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("doc_len").alias("avgdl"),
            F.sum("doc_len").alias("tot"),
            F.expr("bit_xor(doc_id)").alias("fp"),
        ).collect()[0]
        if range_bits is None:  # derive salt width from the measured corpus
            range_bits = auto_range_bits(int(agg["n"]))
        meta = IndexMeta(
            n_docs=int(agg["n"]),
            avgdl=float(agg["avgdl"]),
            k1=k1,
            b=b,
            range_bits=range_bits,
            n_buckets=n_buckets,
            block_size=block_size,
            fingerprint=f"{agg['fp']:x}-{agg['n']}",
            total_len=int(agg["tot"]),
            has_positions=with_positions,
            analyzer=analyzer,
        )
        staged = (
            tf_df.join(stats.select("doc_id", "doc_len"), "doc_id")
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
            .withColumn(
                "doc_range",
                F.shiftrightunsigned(F.col("doc_id"), 64 - range_bits).cast("int"),
            )
        )
        _mark("a2_corpus_agg", t0)
        t0 = time.perf_counter()
        staged.repartition("bucket").write.mode("overwrite").partitionBy("bucket").parquet(staged_path)
        tf_df.unpersist()
        _mark("a3_staged_write", t0)
        write_meta_atomic(index_dir, meta)
        _manifest_append(
            index_dir,
            {"kind": "staged", "bucket": None, "n_postings": None, "bytes": _dir_bytes(staged_path)},
        )
    meta = IndexMeta.load(index_dir)

    # ---- doc store (optional): raw rows partitioned by low id bits --------
    # doc_part = pmod(doc_id, 2^range_bits): client-computable (engine.fetch
    # derives the partitions to prune WITHOUT a Spark job) and uniform for
    # every id scheme in play — sequential testdata ids, xxhash64 ids, and
    # locality-packed ids (whose HIGH bits are the range, so low bits stay
    # uniform). High-bit doc_range would be degenerate for sequential ids.
    if store_source and ("source", None) not in done:
        t0 = time.perf_counter()
        source_path = os.path.join(index_dir, "source")
        (
            raw_corpus.withColumn(
                "doc_part",
                F.pmod(F.col(id_col), F.lit(1 << meta.range_bits)).cast("int"),
            )
            .repartition("doc_part")
            # sorted by id within each partition: parquet row-group min/max
            # stats then let the pushed In(doc_id,...) fetch filter skip
            # row groups, not just partitions
            .sortWithinPartitions(id_col)
            .write.mode("overwrite")
            .partitionBy("doc_part")
            .parquet(source_path)
        )
        meta.has_source = True
        meta.source_id_col = id_col
        meta.source_text_col = text_col
        write_meta_atomic(index_dir, meta)
        _manifest_append(
            index_dir,
            {"kind": "source", "bucket": None, "bytes": _dir_bytes(source_path)},
        )
        _mark("d_source_store", t0)

    staged_df = spark.read.parquet(staged_path)

    # ---- Stage B: dictionary ----------------------------------------------
    if ("dictionary", None) not in done:
        t0 = time.perf_counter()
        u_expr = (F.col("tf") * (k1 + 1.0)) / (
            F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / meta.avgdl)
        )
        dct = staged_df.groupBy("term").agg(
            F.first("bucket").alias("bucket"),
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.max(u_expr).alias("max_u"),
            # mergeable bound ingredients (epoch-merge path, streaming/ingest)
            F.max("tf").alias("max_tf"),
            F.min("doc_len").alias("min_dl"),
        )
        dct = dct.withColumn(
            "idf", F.log(1.0 + (F.lit(float(meta.n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        dct.write.mode("overwrite").parquet(dict_path)
        n_terms = spark.read.parquet(dict_path).count()
        _manifest_append(
            index_dir,
            {"kind": "dictionary", "bucket": None, "n_terms": n_terms, "bytes": _dir_bytes(dict_path)},
        )
        _mark("b_dictionary", t0)

    # ---- Stage C: encode segments per bucket-wave --------------------------
    t0 = time.perf_counter()
    done_buckets = {m["bucket"] for m in read_manifest(index_dir) if m["kind"] == "segment"}
    pending = [bkt for bkt in range(n_buckets) if bkt not in done_buckets]
    # resume idempotence: the segment write (append) and the manifest rows
    # are two steps — a crash between them leaves bucket dirs on disk with
    # NO manifest row. Those buckets re-encode below; scrub their
    # uncommitted dirs first or the re-append would duplicate every block
    # (double-counted scores in every kernel). Buckets are disjoint across
    # waves, so a pending bucket's dir holds only uncommitted data.
    for bkt in pending:
        d = os.path.join(seg_path, f"bucket={bkt}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    waves = [pending[i::n_waves] for i in range(n_waves)] if pending else []
    encode = _encode_group_fn(k1, b, meta.avgdl, block_size)
    for wave_i, wave in enumerate(waves):
        if _stop_after_waves is not None and wave_i >= _stop_after_waves:
            break  # test hook: simulate a killed build mid-way
        if not wave:
            continue
        from pyspark import StorageLevel

        part = staged_df.filter(F.col("bucket").isin(wave))
        enc = part.groupBy("bucket", "doc_range").applyInPandas(encode, BLOCK_SCHEMA)
        # persist the encoded blocks so the manifest stats aggregate reads
        # the (compact) cache instead of re-scanning the just-written parquet
        # per wave — at thousands of buckets the re-read was an extra full
        # segment scan per wave (VERDICT r1 watch item)
        enc = enc.persist(StorageLevel.MEMORY_AND_DISK)
        enc.write.mode("append").partitionBy("bucket").parquet(seg_path)
        rows = (
            enc.groupBy("bucket")
            .agg(
                F.min("term").alias("term_min"),
                F.max("term").alias("term_max"),
                F.count(F.lit(1)).alias("n_blocks"),
                F.sum("n_docs").alias("n_postings"),
                F.sum(F.length("doc_bytes") + F.length("tf_bytes") + F.length("dl_bytes")).alias("payload_bytes"),
            )
            .collect()
        )
        enc.unpersist()
        for r in sorted(rows, key=lambda r: r["bucket"]):
            _manifest_append(
                index_dir,
                {
                    "kind": "segment",
                    "bucket": int(r["bucket"]),
                    "term_min": r["term_min"],
                    "term_max": r["term_max"],
                    "n_blocks": int(r["n_blocks"]),
                    "n_postings": int(r["n_postings"]),
                    "bytes": int(r["payload_bytes"]),
                    "fingerprint": meta.fingerprint,
                },
            )
        # buckets with zero staged terms (vocab smaller than n_buckets)
        # emit no agg row — commit them explicitly or index_is_complete
        # stays False forever and every later build re-submits a wave
        for bkt in sorted(set(wave) - {int(r["bucket"]) for r in rows}):
            _manifest_append(
                index_dir,
                {
                    "kind": "segment", "bucket": int(bkt),
                    "term_min": None, "term_max": None,
                    "n_blocks": 0, "n_postings": 0, "bytes": 0,
                    "fingerprint": meta.fingerprint,
                },
            )
    _mark("c_encode_segments", t0)
    # build metrics — north-rule "emit build/query metrics": stage wall times
    # land in the manifest next to the lineage rows
    _manifest_append(
        index_dir,
        {
            "kind": "metrics",
            "bucket": None,
            "stages_sec": stage_sec,
            "total_sec": round(time.perf_counter() - t_start, 3),
            "n_docs": meta.n_docs,
        },
    )
    return meta


def reindex(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    **overrides,
) -> IndexMeta:
    """Rebuild an index from its own doc store under new parameters
    (Elasticsearch ``_reindex`` analogue): change the analyzer, add
    positions, re-bucket, re-salt — without the original input table.

    The source index must have been built with ``store_source=True``; its
    ``source/`` directory holds the PRE-analysis corpus rows, so the new
    analyzer sees exactly what a fresh build from the original table would
    see (pytest-asserted rank+score identity). Defaults carry over from the
    source meta — id/text columns, k1/b, buckets, range_bits, block size,
    analyzer, positions — and any ``build_index`` keyword passed here
    overrides them. The destination keeps a doc store by default so
    reindexes chain.

    Scale shape: the doc store IS a partitioned parquet copy of the corpus
    colocated with the index, so a reindex is one scan of that store plus
    the normal build shuffles — no dependency on the original (possibly
    revoked or re-snapshotted) source table, same as Lucene reindexing
    from stored fields. ``dst_dir`` must differ from ``src_dir``: the
    build would otherwise overwrite the store it is reading (ES refuses
    in-place reindex for the same reason)."""
    if os.path.abspath(src_dir) == os.path.abspath(dst_dir):
        raise ValueError("reindex requires dst_dir != src_dir "
                         "(the build would overwrite its own doc store)")
    meta = IndexMeta.load(src_dir)
    if not meta.has_source:
        raise ValueError(
            "source index has no doc store — build with store_source=True"
        )
    text_col = overrides.pop("text_col", None) or meta.source_text_col
    if not text_col:
        raise ValueError(
            "source meta predates source_text_col — pass text_col="
        )
    kw = dict(
        id_col=meta.source_id_col,
        text_col=text_col,
        k1=meta.k1,
        b=meta.b,
        range_bits=meta.range_bits,
        n_buckets=meta.n_buckets,
        block_size=meta.block_size,
        analyzer=meta.analyzer,
        with_positions=meta.has_positions,
        store_source=True,
        fresh=True,
    )
    kw.update(overrides)
    corpus = spark.read.parquet(os.path.join(src_dir, "source")).drop("doc_part")
    return build_index(spark, corpus, dst_dir, **kw)


def index_is_complete(index_dir: str, n_buckets: int | None = None) -> bool:
    rows = read_manifest(index_dir)
    if not any(r["kind"] == "staged" for r in rows):
        return False
    if not any(r["kind"] == "dictionary" for r in rows):
        return False
    segs = {r["bucket"] for r in rows if r["kind"] == "segment"}
    if n_buckets is None:
        try:
            n_buckets = IndexMeta.load(index_dir).n_buckets
        except FileNotFoundError:
            return False
    return segs >= set(range(n_buckets))
