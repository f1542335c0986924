"""End-to-end training-data preparation: the composition a pretraining
corpus actually goes through, as ONE declarative DataFrame function —

  language filter → quality filter → line-level boilerplate dedup →
  exact dedup → MinHash near-dup dedup → benchmark decontamination →
  deterministic sampling

Every stage is an already-oracle-checked operator from this package
(``ops.textstats``, ``ops.dedup``, ``ops.sampling``); this module only
composes them and mirrors the composition in one DuckDB twin so the
WHOLE pipeline is value-hash-checkable end to end, not just per stage.

Reference parity note: the reference has no corpus-preparation surface;
this is the LLM-pipeline operator set (SURVEY.md extras) composed the way
CCNet / RefinedWeb / Dolma pipelines chain the same passes.

Scale shape: stages are linear passes or already-bucketed joins — no
full-corpus self-join anywhere (inherited from the component operators,
plan-tested there). Stage order matters and mirrors the literature:
line dedup BEFORE near-dup (boilerplate inflates Jaccard), dedup BEFORE
decontamination (fewer docs to shingle), sampling LAST (everything
upstream is deterministic, so the sample is reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import sampling as S
from . import textstats as T


def prepare_training_data(
    df: DataFrame,
    *,
    langs: tuple[str, ...] | None = None,
    lang_col: str = "lang",
    min_quality: float | None = None,
    line_chunk: int | None = None,
    line_sep: str | None = None,
    neardup: bool = True,
    w: int = 3,
    tau: float = 0.5,
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int = 10_000,
    checkpoint_dir: str | None = None,
    bench: DataFrame | None = None,
    contam_w: int = 8,
    rates: dict | None = None,
    rate: float | None = None,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_handle: list | None = None,
) -> DataFrame:
    """→ the cleaned corpus: (id_col, lang_col, text_col) rows that survive
    every enabled stage. Stages toggle off by leaving their arg at None
    (``neardup=False`` for the MinHash pass). ``line_chunk`` derives
    'lines' as fixed-width token chunks (flat-token corpora); ``line_sep``
    splits on a separator (real text). Duplicate-cluster keeper = min
    doc_id everywhere, matching the component operators.

    The multi-pass stages persist an intermediate relation that outlives
    this call (Spark's CacheManager holds it until unpersisted). Pass
    ``cache_handle=[]`` to receive the persisted frame and release it with
    ``.unpersist()`` once the result is materialized — callers timing or
    chaining many prepares should do so."""
    out = df.select(id_col, lang_col, text_col)
    if langs is not None:
        out = out.filter(F.col(lang_col).isin(*langs))
    if min_quality is not None:
        q = T.quality_score(out, id_col, text_col).filter(
            F.col("quality") >= float(min_quality)
        )
        out = out.join(q.select(F.col("doc_id").alias(id_col)), id_col)
    if line_chunk is not None or line_sep is not None:
        if line_chunk is not None:
            lines = D.chunk_lines(out, line_chunk, id_col, text_col)
            sep = " "
        else:
            lines = D.split_lines(out, id_col, text_col, line_sep)
            sep = line_sep
        rejoined = D.rejoin_lines(D.line_dedup(lines), sep, text_col)
        out = rejoined.join(
            out.select(F.col(id_col).alias("doc_id"), lang_col), "doc_id"
        ).select(F.col("doc_id").alias(id_col), lang_col, text_col)
    # exact dedup: keep the min-id doc of every byte-identical text group
    keepers = D.exact_dedup(out, id_col, text_col).select(
        F.col("keep_doc_id").alias(id_col)
    )
    out = out.join(keepers, id_col, "left_semi")
    if neardup or bench is not None:
        # the near-dup stage runs several jobs (banding, pair verify,
        # component rounds) and decontamination adds another pass — without
        # a persist each one re-executes the whole upstream chain (quality
        # join + line-dedup shuffle). MEMORY_AND_DISK: spills, never OOMs.
        from pyspark import StorageLevel

        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_handle is not None:
            cache_handle.append(out)
    if neardup:
        dupes = (
            D.dedup_pipeline(
                out, n_hashes, band_size, w, tau, id_col, text_col,
                max_bucket, checkpoint_dir=checkpoint_dir,
            )
            .filter(F.col("doc_id") != F.col("keep_doc_id"))
            .select(F.col("doc_id").alias(id_col))
        )
        out = out.join(dupes, id_col, "left_anti")
    if bench is not None:
        out = D.decontaminate(out, bench, contam_w, 1, id_col, text_col)
    if rates is not None:
        out = S.sample_stratified(out, rates, lang_col, id_col, seed)
    elif rate is not None:
        out = S.sample_rate(out, rate, id_col, seed)
    return out


def prepare_training_data_sql(
    table: str,
    *,
    langs: tuple[str, ...] | None = None,
    lang_col: str = "lang",
    min_quality: float | None = None,
    line_chunk: int | None = None,
    neardup: bool = True,
    w: int = 3,
    tau: float = 0.5,
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int = 10_000,
    bench_pred: str | None = None,
    contam_w: int = 8,
    rates: dict | None = None,
    rate: float | None = None,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``prepare_training_data`` — the same stage chain as
    nested CTEs/subqueries, each stage delegating to the component
    operator's own SQL twin. ``bench_pred`` selects the benchmark rows out
    of the ORIGINAL ``table`` (mirroring a bench DataFrame drawn from the
    same corpus in the driver entry)."""
    ctes: list[str] = []
    cur = f"(SELECT {id_col}, {lang_col}, {text_col} FROM {table})"
    step = 0

    def push(select_sql: str) -> str:
        nonlocal step, cur
        step += 1
        name = f"s{step}"
        ctes.append(f"{name} AS ({select_sql})")
        cur = name
        return name

    if langs is not None:
        in_list = ", ".join(f"'{x}'" for x in langs)
        push(f"SELECT * FROM {cur} t WHERE {lang_col} IN ({in_list})")
    else:
        push(f"SELECT * FROM {cur} t")
    if min_quality is not None:
        q = T.quality_score_sql(cur, id_col, text_col).strip()
        push(
            f"SELECT {cur}.* FROM {cur} "
            f"JOIN ({q}) q ON q.doc_id = {cur}.{id_col} "
            f"WHERE q.quality >= {float(min_quality)!r}"
        )
    if line_chunk is not None:
        lines = D.chunk_lines_sql(cur, line_chunk, id_col, text_col).strip()
        ld = D.line_dedup_sql(lines).strip()
        prev = cur
        push(
            f"SELECT ld.doc_id AS {id_col}, p.{lang_col}, "
            f"string_agg(ld.line, ' ' ORDER BY ld.line_no) AS {text_col} "
            f"FROM ({ld}) ld JOIN {prev} p ON p.{id_col} = ld.doc_id "
            f"GROUP BY 1, 2"
        )
    ed = D.exact_dedup_sql(cur, id_col, text_col).strip()
    push(
        f"SELECT {cur}.* FROM {cur} JOIN ({ed}) ed "
        f"ON md5({cur}.{text_col}) = ed.text_md5 "
        f"AND {cur}.{id_col} = ed.keep_doc_id"
    )
    if neardup:
        dp = D.dedup_pipeline_sql(
            cur, n_hashes, band_size, w, tau, id_col, text_col, max_bucket
        ).strip()
        push(
            f"SELECT {cur}.* FROM {cur} LEFT JOIN ({dp}) dp "
            f"ON dp.doc_id = {cur}.{id_col} "
            f"WHERE dp.doc_id IS NULL OR dp.keep_doc_id = {cur}.{id_col}"
        )
    if bench_pred is not None:
        sh_t = D._shingles_sql(cur, contam_w, id_col, text_col).strip()
        sh_b = D._shingles_sql(
            f"(SELECT * FROM {table} WHERE {bench_pred}) b",
            contam_w, id_col, text_col,
        ).strip()
        push(
            f"SELECT {cur}.* FROM {cur} WHERE {cur}.{id_col} NOT IN ("
            f"SELECT DISTINCT tt.doc_id FROM ({sh_t}) tt "
            f"JOIN ({sh_b}) bb USING (shingle))"
        )
    if rates is not None:
        rate_case = "CASE " + " ".join(
            f"WHEN {lang_col} = '{k}' THEN {float(v)!r}"
            for k, v in sorted(rates.items())
        ) + " ELSE 0.0 END"
        h = S._hash_unit_sql(id_col, seed)
        push(f"SELECT * FROM {cur} WHERE {h} < {rate_case}")
    elif rate is not None:
        h = S._hash_unit_sql(id_col, seed)
        push(f"SELECT * FROM {cur} WHERE {h} < {float(rate)!r}")
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT {id_col}, {lang_col}, {text_col} FROM {cur}"
    )
