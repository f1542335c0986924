"""spark-submit entry point.

Packaging (north rule: ships via ``spark-submit --py-files``; verified
end-to-end in this sandbox):

    python -m searchengine_spark.cli package --out dist/searchengine_spark.zip
    spark-submit --py-files dist/searchengine_spark.zip submit_entry.py \
        build --input /data/corpus --index /data/index --buckets 256 --range-bits 8
    spark-submit --py-files dist/searchengine_spark.zip submit_entry.py \
        search --index /data/index --query "inverted index merge" -k 100

(``submit_entry.py`` at the repo root is the primary resource — the package
itself rides in the zip on every executor's sys.path.)

On a real cluster, master/deploy-mode/executor sizing come from spark-submit;
``get_spark`` only sets engine-level conf (AQE, Arrow, shuffle partitions).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zipfile


def _cmd_package(args) -> None:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = args.out
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "searchengine_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    print(json.dumps({"packaged": out, "bytes": os.path.getsize(out)}))


def _spark(args):
    from .session import get_spark

    return get_spark("searchengine-cli", master=args.master)


def _cmd_build(args) -> None:
    spark = _spark(args)
    from .corpus import corpus_df, with_doc_id
    from .query.engine import SearchEngine

    if args.synthetic:
        corpus = corpus_df(spark, args.synthetic)
    else:
        if not args.input:
            raise SystemExit("build: one of --input / --synthetic required")
        corpus = spark.read.parquet(args.input)
        if args.id_col not in corpus.columns:
            # (repo,path,commit,lang,content) source table → derive the
            # surrogate 64-bit doc_id (input_hint schema)
            corpus = with_doc_id(corpus)
    if args.locality_order and args.impact_order:
        raise SystemExit("--locality-order and --impact-order are exclusive "
                         "(both reassign doc ids)")
    if args.locality_order:
        from .corpus import locality_ids

        corpus = locality_ids(
            corpus,
            order_cols=tuple(args.locality_order.split(",")),
            range_bits=args.range_bits,
            id_col=args.id_col,
        )
    if args.impact_order:
        from pyspark.sql import functions as F

        from .corpus import impact_ids

        spec = args.impact_order.rsplit(":", 1)
        col, direction = spec[0], (spec[1] if len(spec) > 1 else "desc")
        if direction not in ("asc", "desc"):
            raise SystemExit(f"--impact-order direction must be asc|desc, "
                             f"got {direction!r}")
        # the old id (preserved under a temp name — impact_ids reassigns
        # id_col) makes (impact, *tiebreak) a total order on any input
        corpus = impact_ids(
            corpus.withColumn("_old_id", F.col(args.id_col)),
            col, tiebreak=("_old_id",), descending=direction == "desc",
            range_bits=args.range_bits, id_col=args.id_col,
        ).drop("_old_id")
    t0 = time.perf_counter()
    if args.shards > 1:
        from .query.sharded import ShardedEngine

        sharded = ShardedEngine.build(
            spark, corpus, args.index, args.shards,
            id_col=args.id_col, text_col=args.text_col,
            n_buckets=args.buckets, range_bits=args.range_bits,
            n_waves=args.waves, with_positions=args.positions,
            fresh=args.fresh, analyzer=args.analyzer,
            store_source=args.store_source,
        )
        dt = time.perf_counter() - t0
        n = sum(s.meta.n_docs for s in sharded.shards)
        print(
            json.dumps(
                {
                    "built": args.index,
                    "shards": args.shards,
                    "n_docs": n,
                    "sec": round(dt, 2),
                    "docs_per_sec": round(n / dt, 1),
                }
            )
        )
        return
    eng = SearchEngine(spark, args.index)
    meta = eng.build_index_from_df(
        corpus,
        id_col=args.id_col,
        text_col=args.text_col,
        n_buckets=args.buckets,
        range_bits=args.range_bits,
        n_waves=args.waves,
        with_positions=args.positions,
        fresh=args.fresh,
        analyzer=args.analyzer,
        store_source=args.store_source,
    )
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "built": args.index,
                "n_docs": meta.n_docs,
                "avgdl": round(meta.avgdl, 3),
                "sec": round(dt, 2),
                "docs_per_sec": round(meta.n_docs / dt, 1),
            }
        )
    )


def _cmd_search(args) -> None:
    spark = _spark(args)
    from .query.engine import SearchEngine

    if args.sharded or args.alias:
        if args.mode not in ("or", "and", "phrase", "near", "spanfirst",
                             "common", "qs", "bool", "wildcard", "fuzzy",
                             "regexp"):
            raise SystemExit(
                "--sharded/--alias supports --mode or / and / phrase / near "
                "/ spanfirst / common / qs / bool / wildcard / fuzzy / regexp")
        from .query.sharded import ShardedEngine

        if args.alias:
            seng = ShardedEngine.alias(spark, args.index.split(","))
        else:
            seng = ShardedEngine.open(spark, args.index)
        t0 = time.perf_counter()
        if args.mode == "wildcard":
            hits = seng.search_wildcard(args.query, k=args.k,
                                        max_expansions=args.max_expansions)
        elif args.mode == "regexp":
            hits = seng.search_regexp(args.query, k=args.k,
                                      max_expansions=args.max_expansions)
        elif args.mode == "fuzzy":
            hits = seng.search_fuzzy(args.query, k=args.k,
                                     max_edits=args.max_edits,
                                     max_expansions=args.max_expansions)
        elif args.mode == "phrase":
            hits = seng.search_phrase(args.query, k=args.k)
        elif args.mode == "near":
            hits = seng.search_near(args.query, window=args.window, k=args.k,
                                    ordered=args.ordered)
        elif args.mode == "spanfirst":
            hits = seng.search_span_first(args.query, args.limit, k=args.k)
        elif args.mode == "common":
            hits = seng.search_common_terms(args.query, args.cutoff, k=args.k)
        elif args.mode == "qs":
            meta_df = spark.read.parquet(args.metadata) if args.metadata else None
            hits = seng.search_query_string(args.query, k=args.k,
                                            metadata=meta_df,
                                            use_wand=not args.no_wand)
        elif args.mode == "bool":
            meta_df = None
            if args.metadata:
                meta_df = spark.read.parquet(args.metadata)
            elif seng.shards[0].meta.has_source:
                # range fields from the shards' doc stores (union — each
                # shard's range join still touches only its own ids)
                from functools import reduce

                parts = [
                    spark.read.parquet(os.path.join(s.index_dir, "source"))
                    .drop("doc_part") for s in seng.shards
                ]
                meta_df = reduce(lambda a, b: a.unionByName(b), parts)
            hits = seng.search_bool(json.loads(args.query), k=args.k,
                                    metadata=meta_df)
        else:
            if args.scorer != "bm25":
                # LM smoothing needs global cf/total_len, which the
                # scatter-gather stats don't carry — refuse loudly
                # rather than silently ranking with shard-local stats
                raise SystemExit("--sharded supports --scorer bm25 only")
            kw = {"exclude": args.exclude} if args.exclude else {}
            hits = seng.search(args.query, k=args.k, mode=args.mode,
                               use_wand=not args.no_wand,
                               min_should_match=args.min_should_match, **kw)
        if args.fetch and hits:
            id_col = seng.shards[0].meta.source_id_col
            src = {r[id_col]: r.asDict()
                   for r in seng.fetch([d for d, _ in hits]).collect()}
            out_hits = []
            for d, s in hits:
                row = dict(src.get(d) or {})
                row.update(doc_id=int(d), score=round(float(s), 6))
                out_hits.append(row)
        else:
            out_hits = [{"doc_id": int(d), "score": round(float(s), 6)}
                        for d, s in hits]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "query": args.query, "k": args.k, "mode": args.mode,
            "shards": len(seng.shards), "sec": round(dt, 3),
            "hits": out_hits,
        }, default=str))
        return

    eng = SearchEngine(spark, args.index)
    t0 = time.perf_counter()
    if args.mode == "phrase":
        hits = eng.search_phrase(args.query, k=args.k)
    elif args.mode == "phraseprefix":
        hits = eng.search_phrase_prefix(args.query, k=args.k,
                                        max_expansions=args.max_expansions)
    elif args.mode == "near":
        hits = eng.search_near(args.query, window=args.window, k=args.k,
                               ordered=args.ordered)
    elif args.mode == "spanfirst":
        hits = eng.search_span_first(args.query, args.limit, k=args.k)
    elif args.mode == "common":
        hits = eng.search_common_terms(args.query, args.cutoff, k=args.k,
                                       use_wand=not args.no_wand)
    elif args.mode == "wildcard":
        hits = eng.search_wildcard(args.query, k=args.k,
                                   max_expansions=args.max_expansions,
                                   use_wand=not args.no_wand)
    elif args.mode == "regexp":
        hits = eng.search_regexp(args.query, k=args.k,
                                 max_expansions=args.max_expansions,
                                 use_wand=not args.no_wand)
    elif args.mode == "fuzzy":
        hits = eng.search_fuzzy(args.query, k=args.k,
                                max_edits=args.max_edits,
                                max_expansions=args.max_expansions,
                                use_wand=not args.no_wand)
    elif args.mode == "mlt":
        hits = eng.more_like_this(args.query, k=args.k,
                                  use_wand=not args.no_wand)
    elif args.mode == "bool":
        meta_df = None
        if args.metadata:
            meta_df = spark.read.parquet(args.metadata)
        elif eng.meta.has_source:  # range fields from the doc store
            meta_df = spark.read.parquet(
                os.path.join(args.index, "source")).drop("doc_part")
        hits = eng.search_bool(json.loads(args.query), k=args.k,
                               metadata=meta_df)
    elif args.mode == "qs":
        meta_df = spark.read.parquet(args.metadata) if args.metadata else None
        hits = eng.search_query_string(args.query, k=args.k,
                                       metadata=meta_df,
                                       use_wand=not args.no_wand,
                                       scorer=args.scorer, mu=args.mu)
    else:
        rewriter = None
        if getattr(args, "synonyms", None):
            from .expansion import make_thesaurus_rewriter

            rewriter = make_thesaurus_rewriter(
                path=None if args.synonyms == "bundled" else args.synonyms
            )
        hits = eng.search(args.query, k=args.k, mode=args.mode,
                          use_wand=not args.no_wand, exclude=args.exclude,
                          scorer=args.scorer, mu=args.mu,
                          min_should_match=args.min_should_match,
                          rewriter=rewriter)
    if args.fetch and hits:
        id_col = eng.meta.source_id_col
        src = {r[id_col]: r.asDict() for r in eng.fetch([d for d, _ in hits]).collect()}
        out_hits = []
        for d, s in hits:
            row = dict(src.get(d) or {})
            row.update(doc_id=int(d), score=round(float(s), 6))
            out_hits.append(row)
    else:
        out_hits = [{"doc_id": d, "score": round(s, 6)} for d, s in hits]
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "query": args.query,
                "k": args.k,
                "mode": args.mode,
                "scorer": getattr(args, "scorer", "bm25"),
                "sec": round(dt, 3),
                "hits": out_hits,
            },
            default=str,
        )
    )


def _cmd_append(args) -> None:
    spark = _spark(args)

    t0 = time.perf_counter()
    df = spark.read.parquet(args.input)
    if getattr(args, "sharded", False):
        if args.positions:
            raise SystemExit(
                "append --sharded takes layout params (positions/buckets/"
                "range-bits) from each shard's meta — drop --positions "
                "(it would be silently ignored)"
            )
        from .query.sharded import ShardedEngine

        n = ShardedEngine.open(spark, args.index).append(
            df, id_col=args.id_col, text_col=args.text_col
        )
        out = {"appended": args.index, "sharded": True, "n_docs": n}
    else:
        from .streaming.ingest import append_docs

        epoch = append_docs(
            df, args.index, id_col=args.id_col, text_col=args.text_col,
            n_buckets=args.buckets, range_bits=args.range_bits,
            with_positions=args.positions,
        )
        out = {"appended": args.index, "epoch": epoch, "n_docs": df.count()}
    out["sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))


def _cmd_update(args) -> None:
    spark = _spark(args)

    t0 = time.perf_counter()
    if getattr(args, "sharded", False):
        from .query.sharded import ShardedEngine

        eng = ShardedEngine.open(spark, args.index)
        n = eng.update(
            spark.read.parquet(args.input),
            id_col=args.id_col, text_col=args.text_col,
        )
    else:
        from .query.engine import SearchEngine

        eng = SearchEngine(spark, args.index)
        n = eng.update_docs(
            spark.read.parquet(args.input),
            id_col=args.id_col, text_col=args.text_col,
        )
    print(
        json.dumps(
            {
                "updated": args.index,
                "n_docs": n,
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


def _cmd_update_by_query(args) -> None:
    """ES ``_update_by_query`` with a ``ctx._source``-style script: here the
    script is a JVM-side regexp_replace over the text column (never a
    per-row Python transform), applied to every doc matching --query."""
    spark = _spark(args)
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    if "=>" not in args.replace:
        raise SystemExit("--replace must look like 'pattern=>replacement'")
    pattern, repl = args.replace.split("=>", 1)
    if getattr(args, "sharded", False):
        from .query.sharded import ShardedEngine

        eng = ShardedEngine.open(spark, args.index)
        meta = eng.shards[0].meta  # analyzer/source layout is shard-uniform
    else:
        from .query.engine import SearchEngine

        eng = SearchEngine(spark, args.index)
        meta = eng.meta
    text_col = meta.source_text_col or "text"

    def transform(df):
        return df.withColumn(text_col, F.regexp_replace(text_col, pattern, repl))

    corpus = spark.read.parquet(args.input) if args.input else None
    n = eng.update_by_query(args.query, transform, mode=args.mode, corpus_df=corpus)
    print(
        json.dumps(
            {
                "updated": args.index,
                "n_docs": n,
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


def _cmd_delete(args) -> None:
    spark = _spark(args)

    t0 = time.perf_counter()
    if getattr(args, "sharded", False):
        from .query.sharded import ShardedEngine

        seng = ShardedEngine.open(spark, args.index)
        if getattr(args, "query", ""):
            n = seng.delete_by_query(args.query, mode=args.mode)
        elif args.ids:
            n = seng.delete([int(x) for x in args.ids.split(",") if x.strip()])
        else:
            n = seng.delete(spark.read.parquet(args.input).select(args.id_col))
        print(json.dumps({
            "deleted": args.index, "sharded": True, "n_docs": n,
            "sec": round(time.perf_counter() - t0, 3),
        }))
        return
    from .query.engine import SearchEngine

    eng = SearchEngine(spark, args.index)
    if getattr(args, "query", ""):
        # _delete_by_query: the match set is tombstoned distributed —
        # it never passes through the driver as an id list
        n = eng.delete_by_query(args.query, mode=args.mode)
    elif args.ids:
        ids = [int(x) for x in args.ids.split(",") if x.strip()]
        n = eng.delete_docs(ids)
    else:
        # DataFrame path: tombstones are written distributed — the id
        # column never collects to the driver (same rule as delete-by-query)
        n = eng.delete_docs(spark.read.parquet(args.input).select(args.id_col))
    print(
        json.dumps(
            {
                "deleted": args.index,
                "n_docs": n,
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


def _cmd_compact(args) -> None:
    spark = _spark(args)

    t0 = time.perf_counter()
    if getattr(args, "sharded", False):
        from .query.sharded import ShardedEngine

        seng = ShardedEngine.open(spark, args.index)
        seng.compact()
        st = seng.stats()
        print(json.dumps({
            "compacted": args.index, "sharded": True,
            "n_docs": st["n_docs"], "avgdl": round(st["avgdl"], 3),
            "sec": round(time.perf_counter() - t0, 3),
        }))
        return
    from .streaming.ingest import compact_streamed_index

    meta = compact_streamed_index(spark, args.index)
    print(
        json.dumps(
            {
                "compacted": args.index,
                "n_docs": meta.n_docs,
                "avgdl": round(meta.avgdl, 3),
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


def _cmd_merge(args) -> None:
    spark = _spark(args)

    t0 = time.perf_counter()
    if getattr(args, "sharded", False):
        from .query.sharded import ShardedEngine

        seng = ShardedEngine.open(spark, args.index)
        seng.merge(max_segments=args.max_segments)
        print(json.dumps({
            "merged": args.index, "sharded": True,
            "n_docs": seng.stats()["n_docs"],
            "sec": round(time.perf_counter() - t0, 3),
        }))
        return
    from .streaming.ingest import merge_epochs_tiered

    meta = merge_epochs_tiered(spark, args.index, max_segments=args.max_segments)
    print(
        json.dumps(
            {
                "merged": args.index,
                "segments_dir": meta.segments_dir,
                "n_docs": meta.n_docs,
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


def _cmd_stats(args) -> None:
    spark = _spark(args)

    if args.sharded:
        from .query.sharded import ShardedEngine

        st = ShardedEngine.open(spark, args.index).stats()
    else:
        from .query.engine import SearchEngine

        st = SearchEngine(spark, args.index).stats()
    print(json.dumps(st))


def _cmd_verify(args) -> None:
    spark = _spark(args)
    from .index.verify import verify_index

    report = verify_index(spark, args.index, deep=args.deep)
    print(json.dumps(report))
    if not report["ok"]:
        raise SystemExit(1)


def _load_grep_corpus(spark, args):
    from .corpus import with_doc_id

    corpus = spark.read.parquet(args.input)
    if args.id_col not in corpus.columns:
        corpus = with_doc_id(corpus)  # (repo,path,commit,lang,content) hint
    return corpus


def _cmd_grep_build(args) -> None:
    spark = _spark(args)
    import time

    from .trigram import build_trigram_index

    corpus = _load_grep_corpus(spark, args)
    t0 = time.time()
    build_trigram_index(
        corpus, args.index, id_col=args.id_col, text_col=args.text_col,
        n_buckets=args.buckets, fold_case=args.fold_case,
    )
    print(json.dumps({"built": args.index, "sec": round(time.time() - t0, 2)}))


def _cmd_grep(args) -> None:
    spark = _spark(args)
    import time

    from pyspark.sql import functions as F

    from .trigram import required_trigrams, trigram_search

    corpus = _load_grep_corpus(spark, args)
    t0 = time.time()
    if args.facet:
        from .trigram import trigram_match_counts

        if args.where:  # pre-filter composes exactly like search's where=
            corpus = corpus.filter(F.expr(args.where))
        rows = trigram_match_counts(
            spark, args.index, corpus, args.pattern, by=args.facet,
            id_col=args.id_col, text_col=args.text_col,
        ).collect()
        print(json.dumps({
            "pattern": args.pattern,
            "sec": round(time.time() - t0, 2),
            "facets": {r[args.facet]: int(r["n"]) for r in rows},
        }))
        return
    if args.lines:
        from .trigram import trigram_search_lines

        rows = trigram_search_lines(
            spark, args.index, corpus, args.pattern, k=args.k,
            max_lines_per_doc=args.max_lines_per_doc,
            id_col=args.id_col, text_col=args.text_col, where=args.where,
            allow_full_scan=args.allow_full_scan,
        ).collect()
        print(json.dumps({
            "pattern": args.pattern,
            "sec": round(time.time() - t0, 2),
            "hits": [
                {"doc_id": int(r["doc_id"]), "line_no": int(r["line_no"]),
                 "line": r["line"]}
                for r in rows
            ],
        }))
        return
    rows = trigram_search(
        spark, args.index, corpus, args.pattern, k=args.k,
        id_col=args.id_col, text_col=args.text_col,
        allow_full_scan=args.allow_full_scan, where=args.where,
    ).collect()
    print(json.dumps({
        "pattern": args.pattern,
        "required_trigrams": sorted(required_trigrams(args.pattern)),
        "sec": round(time.time() - t0, 2),
        "hits": [int(r["doc_id"]) for r in rows],
    }))


def _cmd_reindex(args) -> None:
    spark = _spark(args)
    from .index.build import reindex

    kw = {}
    if args.analyzer:
        kw["analyzer"] = args.analyzer
    if args.positions:
        kw["with_positions"] = True
    if args.buckets:
        kw["n_buckets"] = args.buckets
    if args.range_bits is not None:
        kw["range_bits"] = args.range_bits
    t0 = time.perf_counter()
    meta = reindex(spark, getattr(args, "from"), args.to, **kw)
    print(json.dumps({
        "reindexed": args.to, "n_docs": meta.n_docs,
        "analyzer": meta.analyzer, "has_positions": meta.has_positions,
        "sec": round(time.perf_counter() - t0, 3),
    }))


def _cmd_decontaminate(args) -> None:
    spark = _spark(args)
    from .ops.dedup import contaminated_pairs, decontaminate

    t0 = time.perf_counter()
    train = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.bench)
    kw = dict(
        w=args.ngram, min_overlap=args.min_overlap,
        id_col=args.id_col, text_col=args.text_col,
        bench_id_col=args.bench_id_col, bench_text_col=args.bench_text_col,
    )
    if args.output:
        clean = decontaminate(train, bench, **kw)
        clean.write.mode("overwrite").parquet(args.output)
        n_kept = spark.read.parquet(args.output).count()
        out = {"decontaminated": args.output, "n_kept": n_kept}
    else:
        flagged = contaminated_pairs(train, bench, **kw)
        out = {
            "n_flagged_docs": flagged.select("doc_id").distinct().count(),
            "n_pairs": flagged.count(),
        }
    out["sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))


def _cmd_codestats(args) -> None:
    spark = _spark(args)
    from pyspark.sql import functions as F

    from .ops.code import code_profile

    t0 = time.perf_counter()
    df = spark.read.parquet(args.input)
    # one projection (stats + keep + license + permissive), no self-join
    joined = code_profile(
        df, id_col=args.id_col, text_col=args.text_col,
        max_line=args.max_line, max_avg=args.max_avg,
        min_alnum=args.min_alnum,
    )
    if args.output:
        kept = joined
        if args.filter:
            kept = kept.filter("keep")
            if args.permissive_only:
                kept = kept.filter("permissive")
        kept.write.mode("overwrite").parquet(args.output)
    # one aggregation job for the report (counts, not a collect of rows)
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum(F.col("permissive").cast("long")).alias("n_permissive"),
    ).collect()[0]
    by_license = {
        r["license"]: r["n"]
        for r in joined.groupBy("license")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "license")
        .limit(20)
        .collect()
    }
    out = {
        "n_docs": agg["n_docs"],
        "n_keep_quality": agg["n_keep"],
        "n_permissive": agg["n_permissive"],
        "by_license": by_license,
        "sec": round(time.perf_counter() - t0, 3),
    }
    if args.output:
        out["written"] = args.output
    print(json.dumps(out))


def _cmd_sample(args) -> None:
    spark = _spark(args)
    from .ops.sampling import sample_rate, sample_stratified

    t0 = time.perf_counter()
    df = spark.read.parquet(args.input)
    extra = {}
    if args.temperature is not None:
        if not args.total:
            raise SystemExit("--temperature needs --total (target sample size)")
        from .ops.sampling import rates_for_targets, targets_for_temperature

        targets = targets_for_temperature(df, args.by, alpha=args.temperature)
        rates = rates_for_targets(df, targets, by=args.by, total=args.total)
        out_df = sample_stratified(
            df, rates, by=args.by, id_col=args.id_col, seed=args.seed,
        )
        extra = {"rates": {k: round(v, 6) for k, v in sorted(rates.items())}}
    elif args.rates:
        rates = {
            k: float(v)
            for k, v in (pair.split("=") for pair in args.rates.split(","))
        }
        out_df = sample_stratified(
            df, rates, by=args.by, id_col=args.id_col, seed=args.seed,
            default_rate=args.default_rate,
        )
    else:
        out_df = sample_rate(df, args.rate, id_col=args.id_col, seed=args.seed)
    out_df.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "sampled": args.output,
                "n_rows": n,
                "sec": round(time.perf_counter() - t0, 3),
                **extra,
            }
        )
    )


def _cmd_split(args) -> None:
    spark = _spark(args)
    from pyspark.sql import functions as F

    from .ops.sampling import split_by_group

    t0 = time.perf_counter()
    df = spark.read.parquet(args.input)
    fractions = None
    if args.fractions:
        fractions = {
            k: float(v)
            for k, v in (pair.split("=") for pair in args.fractions.split(","))
        }
    out = split_by_group(df, by=args.by, fractions=fractions, seed=args.seed)
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)
    counts = {
        r["split"]: r["n"]
        for r in spark.read.parquet(args.output)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(
        json.dumps(
            {
                "split": args.output,
                "by": args.by,
                "counts": counts,
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


def _cmd_bpe_encode(args) -> None:
    spark = _spark(args)
    from pyspark.sql import functions as F

    from .ops import bpe

    t0 = time.perf_counter()
    merges = bpe.merges_from_df(spark.read.parquet(f"{args.bpe}/merges"))
    df = spark.read.parquet(args.input)
    out = bpe.bpe_encode(df, merges, id_col=args.id_col, text_col=args.text_col)
    out.write.mode("overwrite").parquet(args.output)
    stats = (
        spark.read.parquet(args.output)
        .agg(
            F.count(F.lit(1)).alias("n_pieces"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "encoded": args.output,
                "n_docs": stats["n_docs"],
                "n_pieces": stats["n_pieces"],
                "n_merges": len(merges),
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


def _cmd_bpe_train(args) -> None:
    spark = _spark(args)
    from .ops import bpe

    t0 = time.perf_counter()
    df = spark.read.parquet(args.input)
    merges, state = bpe.bpe_train(
        df,
        args.merges,
        id_col=args.id_col,
        text_col=args.text_col,
        min_pair_count=args.min_pair_count,
        checkpoint_dir=args.checkpoint_dir,
    )
    bpe.merges_df(spark, merges).coalesce(1).write.mode("overwrite").parquet(
        f"{args.output}/merges"
    )
    bpe.bpe_vocab(state).write.mode("overwrite").parquet(f"{args.output}/vocab")
    state.unpersist()
    n_vocab = spark.read.parquet(f"{args.output}/vocab").count()
    print(
        json.dumps(
            {
                "bpe": args.output,
                "n_merges": len(merges),
                "n_vocab": n_vocab,
                "last_merge": list(merges[-1][1:3]) if merges else None,
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


def _cmd_snapshot(args) -> None:
    from . import snapshot as snap

    if args.list:
        print(json.dumps({"snapshots": snap.list_snapshots(args.repo)}))
        return
    if args.verify:
        errors = snap.verify_snapshot(args.repo, args.verify)
        print(json.dumps({"name": args.verify, "ok": not errors, "errors": errors[:10]}))
        if errors:
            sys.exit(1)
        return
    if not args.index or not args.name:
        print(
            "snapshot: --index and --name are required to create a "
            "snapshot (or pass --list / --verify)",
            file=sys.stderr,
        )
        sys.exit(2)
    info = snap.snapshot_index(
        args.index, args.repo, args.name, incremental=not args.full
    )
    print(json.dumps(info))


def _cmd_restore(args) -> None:
    from . import snapshot as snap

    info = snap.restore_index(
        args.repo, args.name, args.target, overwrite=args.overwrite
    )
    print(json.dumps(info))


def _cmd_didyoumean(args) -> None:
    spark = _spark(args)
    from .didyoumean import suggest_phrase

    t0 = time.perf_counter()
    df = spark.read.parquet(args.input)
    out = suggest_phrase(
        df,
        args.query,
        text_col=_pick_text_col(df, "content"),
        max_edits=args.max_edits,
        per_term=args.per_term,
        beam=args.beam,
        top_n=args.k,
    ).collect()
    print(
        json.dumps(
            {
                "query": args.query,
                "suggestions": [
                    {"phrase": r["phrase"], "score": float(r["score"])} for r in out
                ],
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


def _cmd_prepare(args) -> None:
    spark = _spark(args)
    from .ops.pipeline import prepare_training_data

    t0 = time.perf_counter()
    df = spark.read.parquet(args.input)
    n_in = df.count()
    rates = (
        {k: float(v) for k, v in (p.split("=") for p in args.rates.split(","))}
        if args.rates else None
    )
    out_df = prepare_training_data(
        df,
        langs=tuple(args.langs.split(",")) if args.langs else None,
        lang_col=args.lang_col,
        min_quality=args.min_quality,
        line_chunk=args.line_chunk,
        line_sep=args.line_sep,
        neardup=not args.no_neardup,
        w=args.ngram,
        tau=args.tau,
        bench=spark.read.parquet(args.bench) if args.bench else None,
        contam_w=args.contam_ngram,
        rates=rates,
        rate=args.rate,
        seed=args.seed,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    out_df.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "prepared": args.output,
                "n_in": n_in,
                "n_out": n_out,
                "kept_frac": round(n_out / max(n_in, 1), 4),
                "sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


def _cmd_suggest(args) -> None:
    spark = _spark(args)
    if args.sharded:
        from .query.sharded import ShardedEngine

        eng = ShardedEngine.open(spark, args.index)
    else:
        from .query.engine import SearchEngine

        eng = SearchEngine(spark, args.index)
    print(
        json.dumps(
            {
                "prefix": args.prefix,
                "suggestions": [
                    {"term": t, "df": df} for t, df in eng.suggest(args.prefix, args.n)
                ],
            }
        )
    )


def _cmd_eval(args) -> None:
    """Reference benchmark-harness parity (SURVEY.md §3.3,
    ``Part C/test_part_c_students_old.py``): per query run top-k, join qrels,
    emit MAP / P@5 / P@10 / P@50 / recall."""
    spark = _spark(args)
    from pyspark.sql import functions as F

    from .metrics import mean_average_precision, mrr, ndcg_at_k, precision_at_k, recall
    from .query.engine import SearchEngine
    from .sources import read_queries_tsv, read_qrels_csv

    eng = SearchEngine(spark, args.index)
    queries = read_queries_tsv(spark, args.queries).collect()
    qrels = read_qrels_csv(spark, args.qrels)

    # the whole query file runs as ONE batched segment job (scan + decode +
    # driver overhead amortized across the file — see SearchEngine.search_batch)
    t0 = time.perf_counter()
    # keys carry the row index so duplicate query_id rows in the TSV are
    # each evaluated rather than silently collapsed by the dict
    hits_by_q = eng.search_batch(
        {f"{i}:{q['query_id']}": q["keywords"] for i, q in enumerate(queries)},
        k=args.k,
    )
    batch_sec = time.perf_counter() - t0
    # the composite "i:qid" stays the metric partition key — collapsing
    # back to the bare id merged duplicate TSV rows into ONE partition
    # with ranks 1..k twice (precision could exceed 1.0)
    rows = [
        (qid, str(doc), float(score), rank + 1)
        for qid, hits in hits_by_q.items()
        for rank, (doc, score) in enumerate(hits)
    ]
    results = spark.createDataFrame(
        rows, "query string, doc_id string, score double, rank int"
    )
    kdf = spark.createDataFrame(
        [(f"{i}:{q['query_id']}", int(q["query_id"]))
         for i, q in enumerate(queries)],
        "query string, qid int",
    )
    qrels = (
        kdf.join(
            qrels.withColumnRenamed("query", "qid"), "qid"
        ).select("query", "doc_id", "y_true")
    )
    out = {
        "n_queries": len(queries),
        "map": round(mean_average_precision(results, qrels), 4),
        "batch_sec": round(batch_sec, 3),
        "queries_per_sec": round(len(queries) / batch_sec, 2) if batch_sec else None,
    }
    for kk in (5, 10, 50):
        pk = precision_at_k(results, qrels, kk).agg(F.avg("p_at_k")).collect()[0][0]
        out[f"p_at_{kk}"] = round(float(pk), 4) if pk is not None else None
    rec = recall(results, qrels).agg(F.avg("recall")).collect()[0][0]
    out["recall"] = round(float(rec), 4) if rec is not None else None
    nd = ndcg_at_k(results, qrels, args.k).agg(F.avg("ndcg")).collect()[0][0]
    out[f"ndcg_at_{args.k}"] = round(float(nd), 4) if nd is not None else None
    rr = mrr(results, qrels).agg(F.avg("rr")).collect()[0][0]
    out["mrr"] = round(float(rr), 4) if rr is not None else None
    print(json.dumps(out))


def _cmd_refbench(args) -> None:
    """Run the reference repo's own acceptance benchmark (refbench.py):
    real 8,726-tweet corpus + 35 queries + graded labels → MAP/P@k/recall
    for the faithful best-engine scorer family, vs the published band."""
    spark = _spark(args)
    from .refbench import data_available, run_refbench

    if not data_available(args.data_dir):
        print(json.dumps({"err": f"benchmark data not found under {args.data_dir}"}))
        sys.exit(2)
    if args.variants:
        from .refbench import run_refbench_variants

        out = run_refbench_variants(
            spark, args.data_dir, nltk_stopwords=not args.minimal_stopwords
        )
    else:
        out = run_refbench(
            spark, args.data_dir, nltk_stopwords=not args.minimal_stopwords
        )
    print(json.dumps(out))


def _cmd_symbols_build(args) -> None:
    spark = _spark(args)
    import time

    from .ops.code import symbol_write

    corpus = spark.read.parquet(args.input)
    if args.id_col not in corpus.columns:
        from .corpus import with_doc_id

        corpus = with_doc_id(corpus)
    t0 = time.time()
    symbol_write(
        corpus, args.output, n_buckets=args.buckets,
        id_col=args.id_col, text_col=_pick_text_col(corpus, args.text_col),
    )
    print(json.dumps({"built": args.output, "sec": round(time.time() - t0, 2)}))


def _pick_text_col(corpus, text_col: str) -> str:
    """`content` for the source-code hint schema, else fall back to `text`
    (the testdata documents schema) — same forgiveness as search's loader."""
    if text_col in corpus.columns:
        return text_col
    if text_col == "content" and "text" in corpus.columns:
        return "text"
    raise SystemExit(f"text column {text_col!r} not in {corpus.columns}")


def _cmd_defs(args) -> None:
    spark = _spark(args)
    from .ops.code import symbol_lookup

    rows = symbol_lookup(spark, args.symbols, args.name).collect()
    print(json.dumps({
        "name": args.name,
        "sites": [{"doc_id": r["doc_id"], "kind": r["kind"]} for r in rows],
    }))


def _cmd_symbol_suggest(args) -> None:
    spark = _spark(args)
    from .ops.code import symbol_prefix_topk

    rows = symbol_prefix_topk(spark, args.symbols, args.prefix, k=args.n).collect()
    print(json.dumps({
        "prefix": args.prefix,
        "symbols": [
            {"name": r["name"], "kind": r["kind"], "n_defs": r["n_defs"],
             "n_files": r["n_files"]}
            for r in rows
        ],
    }))


def _cmd_refs(args) -> None:
    spark = _spark(args)
    from pyspark.sql import functions as F

    from .ops.code import references

    corpus = spark.read.parquet(args.input)
    if args.id_col not in corpus.columns:
        from .corpus import with_doc_id

        corpus = with_doc_id(corpus)
    text_col = _pick_text_col(corpus, args.text_col)
    import re as _re

    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", args.name):
        # references() would reject it anyway — fail BEFORE launching jobs
        raise SystemExit(f"refs: not an identifier: {args.name!r}")
    cand = None
    cand_cap = 100_000
    truncated = False
    if args.grep_index:
        from .trigram import required_trigrams, trigram_search

        if required_trigrams(rf"\b{args.name}\b"):
            cand = trigram_search(
                spark, args.grep_index, corpus, rf"\b{args.name}\b",
                k=cand_cap, id_col=args.id_col, text_col=text_col,
            )
            # trigram_search truncates at k in ASCENDING doc_id order — a
            # silent cap would drop the most-referenced docs invisibly
            n_cand = cand.count()
            truncated = n_cand >= cand_cap
            if truncated:
                cand = None  # fall back to the exact full scan
        # else: names < 3 chars have no required trigram — full scan
    out = references(
        corpus, args.name, id_col=args.id_col, text_col=text_col,
        candidates=cand,
    )
    rows = out.orderBy(F.desc("n_refs"), F.asc("doc_id")).limit(args.k).collect()
    print(json.dumps({
        "name": args.name,
        "full_scan": cand is None,
        "docs": [
            {"doc_id": r["doc_id"], "n_refs": r["n_refs"],
             "n_defs": r["n_defs"]}
            for r in rows
        ],
    }))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="searchengine_spark")
    p.add_argument("--master", default=None, help="override spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    pk = sub.add_parser("package", help="zip the package for --py-files")
    pk.add_argument("--out", default="dist/searchengine_spark.zip")
    pk.set_defaults(fn=_cmd_package)

    b = sub.add_parser("build", help="build or resume an index")
    b.add_argument("--input", help="parquet corpus path (repo,path,commit,lang,content)")
    b.add_argument("--synthetic", type=int, default=0, help="generate N synthetic docs instead")
    b.add_argument("--index", required=True)
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--text-col", default="content")
    b.add_argument("--buckets", type=int, default=64)
    b.add_argument("--range-bits", type=int, default=6)
    b.add_argument("--waves", type=int, default=1)
    b.add_argument("--positions", action="store_true",
                   help="store token positions (enables --mode phrase)")
    b.add_argument("--fresh", action="store_true")
    b.add_argument("--analyzer", default="standard",
                   help="'+'-chain of standard|code|stem|porter2, e.g. "
                   "'code+stem'. code: split camelCase/acronym/snake_case "
                   "identifiers; stem: suffix-stem the token stream; "
                   "porter2: snowball-exact English stemming "
                   "(pinned in meta; queries analyze identically)")
    b.add_argument("--store-source", action="store_true",
                   help="persist raw corpus rows partitioned by low id bits "
                        "(enables `search --fetch` point lookups)")
    b.add_argument("--locality-order", default="",
                   help="comma-separated columns; reassign doc ids as dense "
                        "ranks in this order before building (path-ordered "
                        "docIDs: ~2.3x smaller posting payload measured at "
                        "20k docs)")
    b.add_argument("--impact-order", default="",
                   help="'col' or 'col:asc|desc' (default desc); reassign "
                        "doc ids by static impact before building (Lucene "
                        "IndexSorter analogue: high-impact docs cluster in "
                        "head posting blocks per range → block-max WAND "
                        "decodes a fraction of the blocks; pass a quality "
                        "score desc, or a length column :asc for pure BM25)")
    b.add_argument("--shards", type=int, default=1,
                   help=">1: build N hash-routed shard indexes under "
                   "--index (shard-0..N-1); query with search --sharded")
    b.set_defaults(fn=_cmd_build)

    s = sub.add_parser("search", help="top-k BM25 query")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=100)
    s.add_argument(
        "--mode",
        choices=["or", "and", "phrase", "phraseprefix", "near", "spanfirst",
                 "common", "wildcard", "regexp", "fuzzy", "mlt", "qs", "bool"],
        default="or",
        help="phraseprefix: last word is a prefix (search-as-you-type, "
        "needs a --positions build); "
        "spanfirst: phrase must end within the first --limit tokens; "
        "wildcard: --query is a glob (ind*); fuzzy: a single term; "
        "mlt: a source text to find similar docs for; bool: a JSON "
        "must/should/must_not/filter tree (range fields come from "
        "--metadata or the index doc store)",
    )
    s.add_argument("--max-expansions", type=int, default=50,
                   help="wildcard/fuzzy expansion cap")
    s.add_argument("--max-edits", type=int, default=2,
                   help="fuzzy Levenshtein budget")
    s.add_argument("--no-wand", action="store_true")
    s.add_argument("--synonyms", default=None,
                   help="expand query terms with synonyms at the 0.2 "
                        "reference weight: 'bundled' = the in-repo English "
                        "resource, else a path to a TSV of tab-separated "
                        "groups (or/and modes only)")
    s.add_argument("--scorer", choices=["bm25", "lm"], default="bm25",
                   help="ranking function (or/and/qs modes): bm25 or LM Dirichlet")
    s.add_argument("--metadata", default=None,
                   help="qs mode: parquet with doc_id + filterable columns "
                        "(enables field:value clauses)")
    s.add_argument("--mu", type=float, default=2000.0,
                   help="LM Dirichlet smoothing parameter")
    s.add_argument("--sharded", action="store_true",
                   help="--index is a sharded layout (build --shards N); "
                   "scatter-gather under global statistics")
    s.add_argument("--alias", action="store_true",
                   help="--index is a comma-separated list of INDEPENDENT "
                        "index dirs (ES index alias / multi-index search); "
                        "implies --sharded query semantics, no routed "
                        "maintenance")
    s.add_argument("--fetch", action="store_true",
                   help="attach stored source fields to each hit "
                        "(needs a --store-source build)")
    s.add_argument("--min-should-match", type=int, default=0,
                   help="OR results must match at least this many distinct "
                        "query terms (ES minimum_should_match)")
    s.add_argument("--exclude", default="",
                   help="boolean NOT: drop docs containing any of these terms (or/and modes)")
    s.add_argument("--window", type=int, default=5,
                   help="near mode: max token span between query terms")
    s.add_argument("--cutoff", type=float, default=0.01,
                   help="common mode: df cutoff splitting low/common "
                        "terms (<1 = fraction of docs, >=1 = absolute df)")
    s.add_argument("--limit", type=int, default=10,
                   help="spanfirst mode: span must end within the first "
                        "LIMIT filtered tokens (Lucene SpanFirstQuery)")
    s.add_argument("--ordered", action="store_true",
                   help="near mode: require terms in query order")
    s.set_defaults(fn=_cmd_search)

    ap = sub.add_parser("append", help="batch-append docs as a new epoch (creates the index if absent)")
    ap.add_argument("--input", required=True, help="parquet corpus to append")
    ap.add_argument("--index", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--buckets", type=int, default=64,
                    help="creation only — ignored when the index exists "
                         "(layout comes from its meta)")
    ap.add_argument("--range-bits", type=int, default=6,
                    help="creation only — ignored when the index exists")
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--sharded", action="store_true",
                    help="treat --index as a sharded layout: route the batch "
                         "to owning shards by the build's hash")
    ap.set_defaults(fn=_cmd_append)

    up = sub.add_parser("update", help="replace docs in place (delete old version + append new epoch)")
    up.add_argument("--input", required=True, help="parquet of replacement docs")
    up.add_argument("--index", required=True)
    up.add_argument("--id-col", default="doc_id")
    up.add_argument("--text-col", default="content")
    up.add_argument("--sharded", action="store_true",
                    help="treat --index as a sharded layout: each shard "
                         "updates its routed slice")
    up.set_defaults(fn=_cmd_update)

    ubq = sub.add_parser(
        "update-by-query",
        help="transform every doc matching a query in place (ES _update_by_query)",
    )
    ubq.add_argument("--index", required=True)
    ubq.add_argument("--query", required=True)
    ubq.add_argument("--mode", default="or", choices=["or", "and"],
                     help="match mode for --query")
    ubq.add_argument("--replace", required=True,
                     help="'pattern=>replacement' regexp over the text column")
    ubq.add_argument("--input", default="",
                     help="optional source-of-truth parquet (else the doc store)")
    ubq.add_argument("--sharded", action="store_true",
                     help="treat --index as a sharded layout: each shard "
                          "matches + re-ingests its own slice")
    ubq.set_defaults(fn=_cmd_update_by_query)

    dl = sub.add_parser("delete", help="tombstone docs (removed from queries now, folded at compact)")
    dl.add_argument("--index", required=True)
    dl.add_argument("--ids", default="", help="comma-separated doc ids")
    dl.add_argument("--input", default="", help="parquet of ids to delete (alternative to --ids)")
    dl.add_argument("--id-col", default="doc_id")
    dl.add_argument("--query", default="",
                    help="delete-by-query: tombstone the full match set (distributed write)")
    dl.add_argument("--mode", default="or", choices=["or", "and"],
                    help="match mode for --query")
    dl.add_argument("--sharded", action="store_true",
                    help="treat --index as a sharded layout: ids/match sets "
                         "tombstone only their owning shard")
    dl.set_defaults(fn=_cmd_delete)

    cp = sub.add_parser("compact", help="fold epochs + tombstones into the canonical batch layout")
    cp.add_argument("--index", required=True)
    cp.add_argument("--sharded", action="store_true",
                    help="--index is a sharded layout; compact every shard")
    cp.set_defaults(fn=_cmd_compact)

    mg = sub.add_parser(
        "merge",
        help="tiered merge: fold the smallest epochs down to --max-segments "
             "(Lucene TieredMergePolicy; bounded write amplification)",
    )
    mg.add_argument("--index", required=True)
    mg.add_argument("--max-segments", type=int, default=8)
    mg.add_argument("--sharded", action="store_true",
                    help="--index is a sharded layout; tier-merge every shard")
    mg.set_defaults(fn=_cmd_merge)

    st = sub.add_parser("stats", help="index statistics (driver-side metadata, no Spark job)")
    st.add_argument("--index", required=True)
    st.add_argument("--sharded", action="store_true",
                    help="--index is a sharded layout; aggregate across shards")
    st.set_defaults(fn=_cmd_stats)

    gb = sub.add_parser(
        "grep-build",
        help="build a trigram index over RAW text for regex search "
             "(Zoekt/Code Search shape)",
    )
    gb.add_argument("--input", required=True)
    gb.add_argument("--index", required=True)
    gb.add_argument("--id-col", default="doc_id")
    gb.add_argument("--text-col", default="content")
    gb.add_argument("--buckets", type=int, default=32)
    gb.add_argument("--fold-case", action="store_true",
                    help="case-insensitive layout (queries verify with (?i))")
    gb.set_defaults(fn=_cmd_grep_build)

    gq = sub.add_parser(
        "grep",
        help="trigram-accelerated exact regex search (candidates from the "
             "pruned trigram postings, regex verify on candidates only)",
    )
    gq.add_argument("--input", required=True, help="the corpus the index was built from")
    gq.add_argument("--index", required=True)
    gq.add_argument("--pattern", required=True)
    gq.add_argument("-k", type=int, default=100)
    gq.add_argument("--id-col", default="doc_id")
    gq.add_argument("--text-col", default="content")
    gq.add_argument("--allow-full-scan", action="store_true",
                    help="accept a full regex scan when the pattern has no "
                         "required literal trigram")
    gq.add_argument("--where", default=None,
                    help="metadata pre-filter on the corpus, e.g. \"lang = 'py'\"")
    gq.add_argument("--lines", action="store_true",
                    help="grep -n output: matching lines with line numbers")
    gq.add_argument("--facet", default=None,
                    help="facet counts over the FULL match set by this column")
    gq.add_argument("--max-lines-per-doc", type=int, default=5)
    gq.set_defaults(fn=_cmd_grep)

    vf = sub.add_parser(
        "verify",
        help="index integrity check (fsck): meta/manifest/segments/"
             "dictionary/docstats consistency; --deep decodes every block",
    )
    vf.add_argument("--index", required=True)
    vf.add_argument("--deep", action="store_true",
                    help="distributed decode of every block + df crosscheck")
    vf.set_defaults(fn=_cmd_verify)

    ri = sub.add_parser(
        "reindex",
        help="rebuild an index from its doc store under new parameters "
             "(analyzer / positions / layout) — ES _reindex analogue; "
             "source must have been built with --store-source",
    )
    ri.add_argument("--from", required=True, help="source index dir")
    ri.add_argument("--to", required=True, help="destination index dir "
                    "(must differ from --from)")
    ri.add_argument("--analyzer", default="",
                    help="new analyzer (e.g. code, code+stem); default keep")
    ri.add_argument("--positions", action="store_true",
                    help="store token positions in the new index")
    ri.add_argument("--buckets", type=int, default=0,
                    help="new term-bucket count; default keep")
    ri.add_argument("--range-bits", type=int, default=None,
                    help="new doc-range salt bits; default keep")
    ri.set_defaults(fn=_cmd_reindex)

    dc = sub.add_parser(
        "decontaminate",
        help="flag/remove train docs sharing n-grams with a benchmark set",
    )
    dc.add_argument("--input", required=True, help="training corpus parquet")
    dc.add_argument("--bench", required=True, help="benchmark/eval parquet")
    dc.add_argument("--output", default="",
                    help="write the decontaminated corpus here; omit to only report counts")
    dc.add_argument("--ngram", type=int, default=8)
    dc.add_argument("--min-overlap", type=int, default=1)
    dc.add_argument("--id-col", default="doc_id")
    dc.add_argument("--text-col", default="text")
    dc.add_argument("--bench-id-col", default="doc_id")
    dc.add_argument("--bench-text-col", default="text")
    dc.set_defaults(fn=_cmd_decontaminate)

    cs = sub.add_parser(
        "codestats",
        help="StarCoder-style per-file quality stats + license tags; "
             "optionally write the filtered corpus",
    )
    cs.add_argument("--input", required=True)
    cs.add_argument("--output", default="",
                    help="write per-doc stats+license parquet here")
    cs.add_argument("--filter", action="store_true",
                    help="with --output: keep only quality-passing docs")
    cs.add_argument("--permissive-only", action="store_true",
                    help="with --filter: also require a permissive license")
    cs.add_argument("--max-line", type=int, default=1000)
    cs.add_argument("--max-avg", type=float, default=100.0)
    cs.add_argument("--min-alnum", type=float, default=0.25)
    cs.add_argument("--id-col", default="doc_id")
    cs.add_argument("--text-col", default="text")
    cs.set_defaults(fn=_cmd_codestats)

    sp = sub.add_parser(
        "sample",
        help="deterministic hash sample (same set at any parallelism/engine)",
    )
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--rate", type=float, default=0.1)
    sp.add_argument("--rates", default="",
                    help="stratified: by-value=rate pairs, e.g. en=0.2,fr=0.6")
    sp.add_argument("--by", default="lang", help="stratum column for --rates")
    sp.add_argument("--default-rate", type=float, default=0.0,
                    help="rate for strata absent from --rates")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--temperature", type=float, default=None,
                    help="mixture resampling: stratum share ∝ count^alpha "
                         "over --by (0.3 = mBERT/XLM-R); needs --total")
    sp.add_argument("--total", type=int, default=0,
                    help="target sample size for --temperature")
    sp.set_defaults(fn=_cmd_sample)

    sg2 = sub.add_parser(
        "split",
        help="leakage-safe train/valid/test split keyed on a GROUP column",
    )
    sg2.add_argument("--input", required=True)
    sg2.add_argument("--output", required=True)
    sg2.add_argument("--by", required=True, help="group column (e.g. repo)")
    sg2.add_argument(
        "--fractions", default="",
        help="split=fraction pairs summing to 1, e.g. train=0.8,valid=0.1,test=0.1",
    )
    sg2.add_argument("--seed", type=int, default=0)
    sg2.set_defaults(fn=_cmd_split)

    bp = sub.add_parser(
        "bpe-train",
        help="train a BPE subword vocabulary (merges + vocab parquet)",
    )
    bp.add_argument("--input", required=True)
    bp.add_argument("--output", required=True)
    bp.add_argument("--merges", type=int, default=1000)
    bp.add_argument("--min-pair-count", type=int, default=2)
    bp.add_argument("--id-col", default="doc_id")
    bp.add_argument("--text-col", default="text")
    bp.add_argument("--checkpoint-dir", default=None)
    bp.set_defaults(fn=_cmd_bpe_train)

    be = sub.add_parser(
        "bpe-encode",
        help="segment a corpus with a trained BPE vocab (bpe-train output)",
    )
    be.add_argument("--input", required=True)
    be.add_argument("--bpe", required=True, help="bpe-train output dir (merges/ inside)")
    be.add_argument("--output", required=True)
    be.add_argument("--id-col", default="doc_id")
    be.add_argument("--text-col", default="text")
    be.set_defaults(fn=_cmd_bpe_encode)

    dy = sub.add_parser(
        "didyoumean",
        help="phrase-level spell suggestion ranked by the corpus bigram LM",
    )
    dy.add_argument("--input", required=True)
    dy.add_argument("--query", required=True)
    dy.add_argument("--max-edits", type=int, default=2)
    dy.add_argument("--per-term", type=int, default=5)
    dy.add_argument("--beam", type=int, default=8)
    dy.add_argument("-k", type=int, default=5)
    dy.set_defaults(fn=_cmd_didyoumean)

    sn = sub.add_parser(
        "snapshot",
        help="snapshot an index into a repo (verified, incremental)",
    )
    sn.add_argument("--index", help="index dir to snapshot")
    sn.add_argument("--repo", required=True, help="snapshot repository dir")
    sn.add_argument("--name", help="snapshot name (immutable)")
    sn.add_argument("--full", action="store_true",
                    help="disable incremental blob reuse")
    sn.add_argument("--list", action="store_true", help="list snapshots")
    sn.add_argument("--verify", metavar="NAME",
                    help="verify a snapshot's integrity manifest")
    sn.set_defaults(fn=_cmd_snapshot)

    rs = sub.add_parser("restore", help="restore a snapshot into a target dir")
    rs.add_argument("--repo", required=True)
    rs.add_argument("--name", required=True)
    rs.add_argument("--target", required=True)
    rs.add_argument("--overwrite", action="store_true")
    rs.set_defaults(fn=_cmd_restore)

    pr = sub.add_parser(
        "prepare",
        help="end-to-end training-data preparation: lang filter -> quality "
             "-> line dedup -> exact dedup -> near-dup -> decontaminate -> "
             "sample (stages toggle off when their flag is omitted)",
    )
    pr.add_argument("--input", required=True)
    pr.add_argument("--output", required=True)
    pr.add_argument("--langs", default="", help="comma list; empty = keep all")
    pr.add_argument("--lang-col", default="lang")
    pr.add_argument("--min-quality", type=float, default=None)
    pr.add_argument("--line-chunk", type=int, default=None,
                    help="dedup fixed-width token chunks as 'lines'")
    pr.add_argument("--line-sep", default=None,
                    help="dedup separator-delimited lines (e.g. newline)")
    pr.add_argument("--no-neardup", action="store_true")
    pr.add_argument("--ngram", type=int, default=3, help="near-dup shingle width")
    pr.add_argument("--tau", type=float, default=0.5)
    pr.add_argument("--bench", default=None, help="benchmark parquet to decontaminate against")
    pr.add_argument("--contam-ngram", type=int, default=8)
    pr.add_argument("--rate", type=float, default=None)
    pr.add_argument("--rates", default="", help="stratified: lang=rate pairs")
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--id-col", default="doc_id")
    pr.add_argument("--text-col", default="text")
    pr.set_defaults(fn=_cmd_prepare)

    sg = sub.add_parser("suggest", help="autocomplete: df-ranked prefix completions")
    sg.add_argument("--index", required=True)
    sg.add_argument("--prefix", required=True)
    sg.add_argument("-n", type=int, default=10)
    sg.add_argument("--sharded", action="store_true",
                    help="scatter-gather suggest under global df")
    sg.set_defaults(fn=_cmd_suggest)

    e = sub.add_parser("eval", help="run a query file against qrels → MAP/P@k/recall")
    e.add_argument("--index", required=True)
    e.add_argument("--queries", required=True, help="TSV: query_id, information_need, keywords")
    e.add_argument("--qrels", required=True, help="CSV: query, doc_id, y_true")
    e.add_argument("-k", type=int, default=100)
    e.set_defaults(fn=_cmd_eval)

    rb = sub.add_parser(
        "refbench", help="run the reference's own benchmark data end-to-end"
    )
    # default inlined (mirrors refbench.REF_DATA_DIR) — importing refbench
    # here would load pandas/numpy at argparse time for EVERY subcommand
    rb.add_argument("--data-dir", default="/root/reference/Part C/data")
    rb.add_argument("--minimal-stopwords", action="store_true",
                    help="use the engine's 17-word set instead of nltk's")
    rb.add_argument("--variants", action="store_true",
                    help="run the spell/thesaurus/WordNet rewriter variant "
                         "family (reference engines 2/3/5) instead of the "
                         "best-engine scorer family")
    rb.set_defaults(fn=_cmd_refbench)

    sy = sub.add_parser(
        "symbols-build",
        help="mine definitions and write the stored symbol layout",
    )
    sy.add_argument("--input", required=True, help="corpus parquet")
    sy.add_argument("--output", required=True, help="symbol layout dir")
    sy.add_argument("--id-col", default="doc_id")
    sy.add_argument("--text-col", default="content")
    sy.add_argument("--buckets", type=int, default=64)
    sy.set_defaults(fn=_cmd_symbols_build)

    gd = sub.add_parser(
        "defs", help="go-to-definition: def sites of a name (one-bucket read)"
    )
    gd.add_argument("--symbols", required=True, help="symbol layout dir")
    gd.add_argument("--name", required=True)
    gd.set_defaults(fn=_cmd_defs)

    sx = sub.add_parser(
        "symbols", help="go-to-symbol suggest: top-k names by prefix"
    )
    sx.add_argument("--symbols", required=True, help="symbol layout dir")
    sx.add_argument("--prefix", required=True)
    sx.add_argument("-n", type=int, default=10)
    sx.set_defaults(fn=_cmd_symbol_suggest)

    rf = sub.add_parser(
        "refs",
        help="find-references: whole-word mentions minus def sites "
        "(--grep-index restricts the scan to trigram candidates)",
    )
    rf.add_argument("--input", required=True, help="corpus parquet")
    rf.add_argument("--name", required=True)
    rf.add_argument("--grep-index", default=None)
    rf.add_argument("--id-col", default="doc_id")
    rf.add_argument("--text-col", default="content")
    rf.add_argument("-k", type=int, default=50)
    rf.set_defaults(fn=_cmd_refs)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
