"""Trigram-accelerated regular-expression search over raw source text —
the Zoekt / Google Code Search design (R. Cox, "Regular Expression
Matching with a Trigram Index") re-expressed relationally.

The term index (``index/build.py``) answers TOKEN queries; code search
needs raw-substring/regex matching ("every caller of ``foo_bar(``",
"``TODO[:(]``") where tokenization destroys the signal. The classic scale
answer is a position-free trigram inverted index plus a conservative
query planner:

* **build**: every distinct 3-char window of the raw text → (trigram,
  doc_id) postings, written partitioned by a hash bucket of the trigram so
  a query's trigram list prunes partitions (same layout discipline as the
  term segments and the stored ANN probes);
* **plan**: extract a set of REQUIRED literal trigrams from the pattern
  with the AND/OR algebra — concatenation unions requirements, alternation
  INTERSECTS its branches (a trigram is required only if every branch
  needs it), ``?``/``*``/``{0,…}`` drop the preceding atom's requirement,
  ``+`` keeps it, classes/dots/escapes/anchors contribute nothing and
  break literal runs. The extractor is CONSERVATIVE by construction —
  every true match contains all extracted trigrams — so candidates ⊇
  matches and the verify step keeps exactness (property-tested against
  brute-force regex over random pattern/corpus pairs);
* **query**: candidates = docs containing ALL required trigrams (trigram +
  bucket IN-filters prune the postings scan; one count-matching hash
  aggregation), then the REAL regex verifies candidates only (semi-join
  into the corpus scan). A pattern with no extractable trigram (``a.*b``,
  pure classes) degenerates to a full regex scan — refused unless
  ``allow_full_scan=True``, the same explicit-opt-in rule as the quadratic
  near-dup kernels.

Scale shape at 10^12 files: postings are distinct (doc, trigram) pairs —
linear in corpus bytes, one narrow explode + one distinct with map-side
partials + one clustered partitioned write; a query reads only the
required trigrams' buckets, shuffles only their filtered postings, and
runs the regex on candidates only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIGRAM_BUCKETS = 32


# --------------------------------------------------------------------------
# conservative required-trigram extraction
# --------------------------------------------------------------------------


def _trigrams(s: str) -> set[str]:
    return {s[i:i + 3] for i in range(len(s) - 2)}


class _Unplannable(Exception):
    """Pattern uses a construct the literal algebra cannot bound (inline
    flags like (?i), lookaround, named groups): any literal requirement
    could be wrong — e.g. (?i)grep matches GREP, which contains neither
    lowercase trigram. The planner degrades to the EMPTY requirement
    (full-scan semantics) instead of a silently incomplete match set."""


def _parse_alt(pat: str, i: int) -> tuple[set[str], int]:
    """Parse an alternation until ')' or end; returns (required trigram
    set, index of the terminator). Concat unions, '|' intersects."""
    n = len(pat)
    branch_sets: list[set[str]] = []
    req: set[str] = set()  # current branch's requirement
    cur = ""  # current literal run

    def flush():
        nonlocal cur, req
        req |= _trigrams(cur)
        cur = ""

    def drop_last_atom():
        # a quantifier made the previous literal char optional: keep the
        # run up to (not including) it
        nonlocal cur, req
        head = cur[:-1]
        cur = ""
        req |= _trigrams(head)

    while i < n:
        c = pat[i]
        if c == ")":
            break
        if c == "|":
            flush()
            branch_sets.append(req)
            req = set()
            i += 1
        elif c == "(":
            flush()
            j = i + 1
            if pat.startswith("?:", j):
                j += 2
            elif j < n and pat[j] == "?":
                # (?i)/(?s…) flags, (?=…)/(?!…) lookaround, (?P<…>) names:
                # semantics the trigram algebra can't bound conservatively
                raise _Unplannable(pat[i:])
            sub_req, j = _parse_alt(pat, j)
            if j >= n or pat[j] != ")":
                raise ValueError(f"unbalanced group in pattern: {pat!r}")
            j += 1
            optional = False
            if j < n and pat[j] in "?*":
                optional = True
                j += 1
            elif j < n and pat[j] == "+":
                j += 1
            elif j < n and pat[j] == "{":
                k = pat.find("}", j)
                body = pat[j + 1:k] if k != -1 else "0"
                if body.split(",")[0].strip() in ("", "0"):
                    optional = True
                j = k + 1 if k != -1 else j + 1
            if not optional:
                req |= sub_req
            i = j
        elif c == "\\":
            flush()  # \d, \., \w … — not a plain literal byte here
            i += 2
            if i < n and pat[i] in "?*+":
                i += 1
        elif c == "[":
            flush()
            k = i + 1
            if k < n and pat[k] == "^":
                k += 1
            if k < n and pat[k] == "]":
                k += 1
            # walk char-by-char: an ESCAPED ']' must not close the class
            # ('[x\]]abc' would otherwise leak ']ab' as a false requirement)
            while k < n and pat[k] != "]":
                k += 2 if pat[k] == "\\" else 1
            if k >= n:
                raise ValueError(f"unbalanced class in pattern: {pat!r}")
            i = k + 1
            if i < n and pat[i] in "?*+":
                i += 1
        elif c in "?*":
            drop_last_atom()
            i += 1
        elif c == "{":
            k = pat.find("}", i)
            body = pat[i + 1:k] if k != -1 else "0"
            if body.split(",")[0].strip() in ("", "0"):
                drop_last_atom()
            else:
                # min ≥ 1 keeps the atom required, but repeats can be
                # inserted after it — the literal run must BREAK here
                # ("ab{1,3}c" must not claim trigram "abc")
                flush()
            i = k + 1 if k != -1 else i + 1
        elif c == "+":
            # at-least-one keeps the atom required, but "ab+c" matches
            # "abbc" — break the run so "abc" is never claimed
            flush()
            i += 1
        elif c in "^$.":
            flush()
            i += 1
        else:
            cur += c
            i += 1
    flush()
    branch_sets.append(req)
    return set.intersection(*branch_sets), i


def required_trigrams(pattern: str) -> set[str]:
    """The conservative required-trigram set: every document matching
    ``pattern`` (Java/RE2 common subset) contains ALL returned trigrams.
    May be empty — then only a full scan answers the query exactly.
    Constructs outside the algebra (inline flags, lookaround, named
    groups) conservatively yield the empty set."""
    try:
        req, i = _parse_alt(pattern, 0)
    except _Unplannable:
        return set()
    if i != len(pattern):
        raise ValueError(f"unbalanced ')' in pattern: {pattern!r}")
    return req


# --------------------------------------------------------------------------
# index build + search
# --------------------------------------------------------------------------


def _meta_path(path: str) -> str:
    return os.path.join(path, "_trigram_meta.json")


def _postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fold_case: bool,
    n_buckets: int,
) -> DataFrame:
    """Distinct (doc_id, trigram, bucket) postings — the ONE codec shared
    by build, append, and the streaming fold. Docs shorter than 3 chars
    have no trigrams and are filtered out (``sequence(1, len-2)`` would
    otherwise step DOWNWARD for them and mint junk sub-3-char rows)."""
    src = f"lower({text_col})" if fold_case else text_col
    tg = F.explode(
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, length({text_col}) - 2),"
                f" i -> substring({src}, i, 3))"
            )
        )
    ).alias("trigram")
    return (
        df.filter(F.length(F.col(text_col)) >= 3)
        .select(F.col(id_col).alias("doc_id"), tg)
        .distinct()
        .withColumn("bucket", F.pmod(F.xxhash64("trigram"), F.lit(n_buckets)))
    )


def _layout_df(spark: SparkSession, path: str) -> DataFrame | None:
    """The layout's postings frame, or None when no data file exists yet —
    the documented empty-build initialization for streaming writes only
    the sidecar (+_SUCCESS), and parquet cannot infer a schema from that.
    Callers translate None into an empty result instead of crashing the
    serving path during the startup window."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException as e:
        if "UNABLE_TO_INFER_SCHEMA" in str(e) or "infer schema" in str(e):
            return None
        raise
    return df


def _posts_or_empty(spark: SparkSession, path: str) -> DataFrame:
    """The layout's postings, or a schema-stable EMPTY frame when only the
    sidecar exists (pre-first-epoch startup window): searches then return
    empty results instead of crashing on schema inference."""
    df = _layout_df(spark, path)
    if df is None:
        return spark.createDataFrame(
            [], "trigram string, doc_id long, bucket bigint"
        )
    return df


def build_trigram_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = TRIGRAM_BUCKETS,
    fold_case: bool = False,
) -> None:
    """(trigram, doc_id) distinct postings over the RAW text (case
    preserved by default — code search is case-exact; ``fold_case=True``
    lowercases the trigram stream for Zoekt-style case-insensitive layouts
    and queries verify with ``(?i)``), written partitioned by
    ``bucket = pmod(xxhash64(trigram), n_buckets)``. One narrow trigram
    explode (array_distinct dedups in-row before the shuffle) + one
    distinct with map-side partials + one clustered partitioned write."""
    posts = _postings(df, id_col, text_col, fold_case, n_buckets)
    posts.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(path)
    tmp = _meta_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"n_buckets": n_buckets, "id_col": id_col,
             "fold_case": fold_case},
            f,
        )
    os.replace(tmp, _meta_path(path))


def _buckets_for(spark: SparkSession, trigrams: list[str], n_buckets: int) -> list[int]:
    """Bucket ids for a trigram list via one local-relation expression —
    the Python side never re-implements xxhash64."""
    rows = (
        spark.createDataFrame([(t,) for t in trigrams], "trigram string")
        .select(F.pmod(F.xxhash64("trigram"), F.lit(n_buckets)).alias("b"))
        .collect()
    )
    return sorted({int(r["b"]) for r in rows})


def trigram_search(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    pattern: str,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    allow_full_scan: bool = False,
    where=None,
) -> DataFrame:
    """Exact regex match set (first ``k`` doc_ids ascending) over the raw
    text, trigram-accelerated: required-trigram candidates from the
    partition-pruned postings scan, regex verification ONLY on candidates.
    Exact because the planner is conservative; patterns with an empty
    requirement need the full regex scan and are refused without
    ``allow_full_scan=True``.

    On a ``fold_case=True`` layout the required trigrams fold to lowercase
    and verification runs ``(?i)`` — Zoekt's case-insensitive mode. A
    pattern already case-folded loses nothing; mixed-case literals still
    prune (their lowercase trigrams are required in the folded stream).

    ``where`` (optional predicate on the corpus frame, e.g.
    ``"lang = 'py'"`` or a Column) composes AS A PRE-FILTER: it restricts
    the verify scan; candidates outside it are dropped by the semi-join's
    corpus side — the ES knn-filter composition rule."""
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    fold = bool(meta.get("fold_case", False))
    req = sorted(required_trigrams(pattern))
    if fold:
        req = sorted({t.lower() for t in req})
    rx = f"(?i){pattern}" if fold else pattern
    if where is not None:
        corpus = corpus.filter(
            F.expr(where) if isinstance(where, str) else where
        )
    docs = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    if not req:
        if not allow_full_scan:
            raise ValueError(
                f"pattern {pattern!r} has no required literal trigram — a "
                "full regex scan is needed; pass allow_full_scan=True to "
                "accept that cost"
            )
        verified = docs.filter(F.col("_text").rlike(rx))
        return verified.select("doc_id").orderBy("doc_id").limit(k)
    n_buckets = meta["n_buckets"]
    buckets = _buckets_for(spark, req, n_buckets)
    posts = (
        _posts_or_empty(spark, path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("trigram").isin(req))
    )
    cand = (
        posts.groupBy("doc_id")
        .agg(F.countDistinct("trigram").alias("_nt"))
        .filter(F.col("_nt") == len(req))
        .select("doc_id")
    )
    verified = docs.join(cand, "doc_id", "left_semi").filter(
        F.col("_text").rlike(rx)
    )
    return verified.select("doc_id").orderBy("doc_id").limit(k)


def trigram_append(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incrementally grow a trigram layout with NEW documents: their
    distinct trigrams append into the same bucket partitions (no pinned
    state beyond n_buckets/fold_case — the codec is a pure function of the
    text), reader-identical to a full rebuild over the union. Same
    contract as ``ops.similarity.ann_append``; duplicate doc_ids are the
    caller's concern (append-only ids, or tombstone upstream). Parquet
    appends are NOT atomic for a concurrently listing reader — run
    maintenance off the serving path (or snapshot the dir first), like the
    term index does with its manifest/meta pointer swaps."""
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    if any(e.startswith("epoch=") for e in os.listdir(path)):
        raise ValueError(
            f"{path} is a stream-maintained (epoch=*) layout — flat appends "
            "beside epoch dirs break parquet partition discovery; keep "
            "appending through stream_trigram_append"
        )
    posts = _postings(
        df, id_col, text_col, bool(meta.get("fold_case")), meta["n_buckets"]
    )
    posts.repartition("bucket").write.mode("append").partitionBy(
        "bucket"
    ).parquet(path)


def trigram_search_batch(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    patterns: dict[str, str],
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Batched grep: every pattern of the batch answered in ONE postings
    scan + ONE verify pass — (pattern_id, doc_id) for the first ``k``
    matches per pattern. The trigram filter is the UNION of the patterns'
    required sets; per-pattern candidacy is a count-match against each
    pattern's own requirement; verification joins the candidate (pattern,
    doc) pairs to the corpus once and applies each pattern's regex via a
    column-valued rlike. Patterns with an empty requirement are rejected
    (run them individually with allow_full_scan).

    The batch analogue of ``search_batch`` for the term index: scan,
    shuffle, and verify amortize across the batch — the 100 TB throughput
    shape for query streams."""
    from pyspark.sql import Window

    if not patterns:
        raise ValueError("empty pattern batch")
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    fold = bool(meta.get("fold_case", False))
    req_rows = []
    nreq = {}
    for pid, pat in sorted(patterns.items()):
        req = sorted(required_trigrams(pat))
        if fold:
            req = sorted({t.lower() for t in req})
        if not req:
            raise ValueError(
                f"pattern {pid}={pat!r} has no required trigram — run it "
                "individually with allow_full_scan=True"
            )
        nreq[pid] = len(req)
        req_rows += [(pid, t) for t in req]
    all_tri = sorted({t for _, t in req_rows})
    buckets = _buckets_for(spark, all_tri, meta["n_buckets"])

    reqs = F.broadcast(
        spark.createDataFrame(req_rows, "pattern_id string, trigram string")
    )
    need = F.broadcast(
        spark.createDataFrame(
            [(p, n) for p, n in nreq.items()], "pattern_id string, need int"
        )
    )
    pats = F.broadcast(
        spark.createDataFrame(
            [(p, ("(?i)" if fold else "") + rx) for p, rx in sorted(patterns.items())],
            "pattern_id string, rx string",
        )
    )
    posts = (
        _posts_or_empty(spark, path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("trigram").isin(all_tri))
    )
    cand = (
        posts.join(reqs, "trigram")
        .groupBy("pattern_id", "doc_id")
        .agg(F.countDistinct("trigram").alias("_nt"))
        .join(need, "pattern_id")
        .filter(F.col("_nt") == F.col("need"))
        .select("pattern_id", "doc_id")
    )
    docs = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    verified = (
        cand.join(docs, "doc_id")
        .join(pats, "pattern_id")
        .filter(F.expr("_text rlike rx"))
        .select("pattern_id", "doc_id")
    )
    w = Window.partitionBy("pattern_id").orderBy("doc_id")
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def trigram_search_lines(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    pattern: str,
    k: int = 100,
    max_lines_per_doc: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    where=None,
    allow_full_scan: bool = False,
) -> DataFrame:
    """``grep -n`` over the corpus: (doc_id, line_no, line) for lines
    matching the pattern, first ``max_lines_per_doc`` lines per doc
    (line_no ascending), first ``k`` docs ascending — deterministic.
    Candidates come from ``trigram_search`` (trigram-pruned + doc-level
    regex verified), so the line explode runs on MATCHING docs only; the
    per-line regex is the same pattern re-anchored to single lines.

    Note the doc-level verify uses the raw pattern: a pattern that only
    matches ACROSS a newline ('a\\nb') yields doc hits but no line hits —
    the classic grep -n contract."""
    with open(_meta_path(path)) as f:
        fold = bool(json.load(f).get("fold_case", False))
    rx = f"(?i){pattern}" if fold else pattern
    docs_hit = trigram_search(
        spark, path, corpus, pattern, k=k, id_col=id_col, text_col=text_col,
        where=where, allow_full_scan=allow_full_scan,
    )
    from pyspark.sql import Window

    src = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    ).join(docs_hit, "doc_id", "left_semi")
    lines = src.select(
        "doc_id",
        F.posexplode(F.split("_text", "\n")).alias("_pos", "line"),
    ).select(
        "doc_id", (F.col("_pos") + 1).cast("long").alias("line_no"), "line"
    )
    matched = lines.filter(F.col("line").rlike(rx))
    w = Window.partitionBy("doc_id").orderBy("line_no")
    return (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_lines_per_doc)
        .drop("rn")
        .orderBy("doc_id", "line_no")
    )


def trigram_match_counts(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    pattern: str,
    by: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Facet counts over the FULL regex match set: (by, n) per value of a
    metadata column, n descending then value ascending — "how many matches
    per repo/lang", the code-search analytics surface. Same pruned
    candidates + verify as ``trigram_search`` but WITHOUT the k cut: the
    aggregation wants the whole match set, and the regex still runs on
    candidates only."""
    req = sorted(required_trigrams(pattern))
    if not req:
        raise ValueError(
            f"pattern {pattern!r} has no required literal trigram — facet "
            "over a full-scan pattern by filtering the corpus directly"
        )
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    if meta.get("fold_case"):
        req = sorted({t.lower() for t in req})
        pattern = f"(?i){pattern}"
    buckets = _buckets_for(spark, req, meta["n_buckets"])
    posts = (
        _posts_or_empty(spark, path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("trigram").isin(req))
    )
    cand = (
        posts.groupBy("doc_id")
        .agg(F.countDistinct("trigram").alias("_nt"))
        .filter(F.col("_nt") == len(req))
        .select("doc_id")
    )
    docs = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.col(by).alias("_by"),
    )
    verified = docs.join(cand, "doc_id", "left_semi").filter(
        F.col("_text").rlike(pattern)
    )
    return (
        verified.groupBy(F.col("_by").alias(by))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc(by))
    )


def stream_trigram_append(
    spark: SparkSession,
    source_dir: str,
    path: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Maintain a trigram layout over a Structured Stream of new docs:
    each micro-batch's postings land in ``path/epoch=<id>/bucket=…``
    (OVERWRITE per epoch — crash replay rewrites the same directory, so
    ingestion is exactly-once), and the readers work UNCHANGED (parquet
    partition discovery layers epoch above bucket; the bucket IN-filter
    prunes within every epoch). Initialize with an EMPTY build
    (``build_trigram_index(df.limit(0), path, …)``) so the sidecar exists
    and every data file lives under an epoch — the same contract as
    ``ops.similarity.stream_ann_append``."""
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    if any(e.startswith("bucket=") for e in os.listdir(path)):
        raise ValueError(
            f"{path} holds a flat (bucket=*) layout — epoch dirs beside it "
            "break parquet partition discovery; initialize the stream from "
            "an EMPTY build (build_trigram_index(df.limit(0), …))"
        )
    fold_case = bool(meta.get("fold_case"))
    nb = meta["n_buckets"]

    def fold(batch_df, epoch_id: int) -> None:
        posts = _postings(batch_df, id_col, text_col, fold_case, nb)
        posts.repartition("bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(f"{path}/epoch={epoch_id}")

    return (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
