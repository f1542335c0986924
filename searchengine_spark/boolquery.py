"""Nested boolean query trees (Elasticsearch `bool` DSL): arbitrary
nesting of must / should / must_not / filter with minimum_should_match,
evaluated RELATIONALLY — every node compiles to joins/unions over
per-clause (doc_id, score) frames, so the whole tree is ONE Spark job
however deep it nests.

Semantics (ES contract):
  * a doc matches a node iff it matches every `must` and `filter`
    clause, at least `minimum_should_match` `should` clauses (default 1
    when the node has no must/filter, else 0), and no `must_not` clause;
  * node score = Σ must scores + Σ scores of the should clauses the doc
    matches; `filter` and `must_not` contribute 0 (filter context).

Leaves: {"term": t} (BM25-scored), {"range": {"field": f, "gte": lo,
"lte": hi}} (filter-context, scores 0). Nested {"must":..., ...} dicts
recurse. Two more ES compound types share the combinators:

  * {"dis_max": [sub, ...], "tie_breaker": t} — disjunction-max: a doc
    matches if ANY sub matches; score = best sub score + t · (sum of
    the other matching subs). t=0 (default) is pure best-field, t=1
    degenerates to the should-sum. One union + one groupBy(max, sum) —
    no per-sub join chain.
  * {"positive": sub, "negative": sub, "negative_boost": nb} — boosting
    query: membership and score come from `positive` alone; a doc that
    ALSO matches `negative` keeps its score × nb (demotion without
    exclusion — the soft must_not). One left join against the negative
    match set.

Determinism across engines: every node's score is ROUNDED to round_dp
before its parent combines it, and sibling must-scores add in clause
order on both sides — the same discipline as ops/graph. Should-sums go
through the engine's sum aggregate like every other oracle entry.

Join strategy at 100 TB: each term leaf filters the postings by a
broadcast single-term slice before any stats join; must-combines are
equi-joins on doc_id between already-candidate-sized frames; must_not
is an anti join; nothing ever scans more than the union of the leaves'
candidate sets.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .scoring import BM25_B, BM25_K1, bm25_score

ROUND_DP = 5


@dataclass
class BoolContext:
    """Everything a leaf needs: the corpus relations + stats."""

    spark: SparkSession
    tf: DataFrame
    stats: DataFrame
    dct: DataFrame
    n_docs: int
    avgdl: float
    metadata: DataFrame | None = None  # (doc_id, fields...) for range leaves



def _sq(v) -> str:
    """Escape for single-quoted SQL interpolation in the oracle twin — a
    term containing a quote must not break (or rewrite) the generated SQL."""
    return str(v).replace("'", "''")

def _is_leaf(node: dict) -> bool:
    return "term" in node or "range" in node


class RelationalLeaves:
    """Leaf provider over raw corpus relations (BoolContext)."""

    def __init__(self, ctx: BoolContext, round_dp: int = ROUND_DP):
        self.ctx, self.round_dp = ctx, round_dp

    def term(self, t: str) -> DataFrame:
        scored = bm25_score(
            self.ctx.spark, self.ctx.tf, self.ctx.stats, self.ctx.dct, t,
            self.ctx.n_docs, self.ctx.avgdl, BM25_K1, BM25_B,
        )
        return scored.select(
            "doc_id", F.round("score", self.round_dp).alias("score")
        )

    def range(self, r: dict) -> DataFrame:
        return _range_frame(self.ctx.metadata, r)


class IndexLeaves:
    """Leaf provider over a built index (``SearchEngine.scored_docs``) —
    the INDEX-NATIVE evaluation of the same trees; range leaves need a
    ``metadata`` frame (the index doc store or the corpus).
    ``global_stats`` (n, avgdl, {term: df}) makes every term leaf score
    under GLOBAL corpus statistics — the sharded scatter phase."""

    def __init__(self, engine, metadata: DataFrame | None,
                 round_dp: int = ROUND_DP, global_stats=None):
        self.engine, self.metadata, self.round_dp = engine, metadata, round_dp
        self.global_stats = global_stats

    def term(self, t: str) -> DataFrame:
        return self.engine.scored_docs(
            t, global_stats=self.global_stats
        ).select(
            "doc_id", F.round("score", self.round_dp).alias("score")
        )

    def range(self, r: dict) -> DataFrame:
        return _range_frame(self.metadata, r)


def _range_frame(metadata: DataFrame | None, r: dict) -> DataFrame:
    if metadata is None:
        raise ValueError("range leaf needs a metadata frame")
    cond = F.lit(True)
    if "gte" in r:
        cond = cond & (F.col(r["field"]) >= r["gte"])
    if "lte" in r:
        cond = cond & (F.col(r["field"]) <= r["lte"])
    return metadata.filter(cond).select("doc_id", F.lit(0.0).alias("score"))


def tree_terms(node: dict) -> list[str]:
    """All raw term-leaf strings in a tree, in leaf order (range leaves
    contribute nothing — filter context needs no corpus statistics). The
    sharded gather phase analyzes these to collect global df."""
    if "term" in node:
        return [node["term"]]
    if "range" in node:
        return []
    out: list[str] = []
    for key in ("must", "filter", "should", "must_not", "dis_max"):
        for child in node.get(key, []):
            out.extend(tree_terms(child))
    for key in ("positive", "negative"):
        if key in node:
            out.extend(tree_terms(node[key]))
    return out


def bool_score(ctx: BoolContext, node: dict, round_dp: int = ROUND_DP) -> DataFrame:
    """→ (doc_id, score) for every doc matching the tree (relational
    leaves; ``eval_tree`` + ``IndexLeaves`` is the index-native twin)."""
    return eval_tree(node, RelationalLeaves(ctx, round_dp), round_dp)


def eval_tree(node: dict, leaves, round_dp: int = ROUND_DP) -> DataFrame:
    """Shared tree combinator over any leaf provider."""
    if "term" in node:
        return leaves.term(node["term"])
    if "range" in node:
        return leaves.range(node["range"])
    if "dis_max" in node:
        subs = [eval_tree(c, leaves, round_dp) for c in node["dis_max"]]
        if not subs:
            raise ValueError("dis_max needs at least one sub-query")
        tie = float(node.get("tie_breaker", 0.0))
        u = subs[0].select("doc_id", "score")
        for sdf in subs[1:]:
            u = u.unionByName(sdf.select("doc_id", "score"))
        agg = u.groupBy("doc_id").agg(
            F.max("score").alias("mx"), F.sum("score").alias("sm")
        )
        return agg.select(
            "doc_id",
            F.round(
                F.col("mx") + F.lit(tie) * (F.col("sm") - F.col("mx")), round_dp
            ).alias("score"),
        )
    if "positive" in node:
        pos = eval_tree(node["positive"], leaves, round_dp)
        neg = eval_tree(node["negative"], leaves, round_dp)
        nb = float(node.get("negative_boost", 0.5))
        marked = pos.join(
            neg.select("doc_id", F.lit(True).alias("_neg")).distinct(),
            "doc_id",
            "left",
        )
        return marked.select(
            "doc_id",
            F.round(
                F.when(F.col("_neg").isNotNull(), F.col("score") * F.lit(nb))
                .otherwise(F.col("score")),
                round_dp,
            ).alias("score"),
        )
    must = [eval_tree(c, leaves, round_dp) for c in node.get("must", [])]
    filt = [eval_tree(c, leaves, round_dp) for c in node.get("filter", [])]
    should = [eval_tree(c, leaves, round_dp) for c in node.get("should", [])]
    must_not = [eval_tree(c, leaves, round_dp) for c in node.get("must_not", [])]
    if not (must or filt or should):
        raise ValueError("bool node needs at least one scoring/filter clause")
    msm = node.get(
        "minimum_should_match", 0 if (must or filt) else 1
    )
    if (
        should
        and not (must or filt)
        and msm == 0
        and "minimum_should_match" in node
    ):
        raise ValueError(
            "minimum_should_match=0 on a pure-should bool is ES match-all "
            "semantics, which this engine does not implement — drop the "
            "explicit 0 (default 1) or add a must/filter clause"
        )
    base = None
    if must:
        base = must[0].select("doc_id", F.col("score").alias("s0"))
        for i, m in enumerate(must[1:], 1):
            base = base.join(
                m.select("doc_id", F.col("score").alias(f"s{i}")), "doc_id"
            )
        total = reduce(
            lambda acc, i: acc + F.col(f"s{i}"), range(1, len(must)), F.col("s0")
        )
        base = base.select("doc_id", total.alias("score"))
    for f_df in filt:
        base = (
            base.join(f_df.select("doc_id"), "doc_id", "left_semi")
            if base is not None
            else f_df.select("doc_id", F.lit(0.0).alias("score"))
        )
    if should:
        u = should[0].select("doc_id", "score")
        for sdf in should[1:]:
            u = u.unionByName(sdf.select("doc_id", "score"))
        sg = u.groupBy("doc_id").agg(
            F.sum("score").alias("s_sum"), F.count(F.lit(1)).alias("s_cnt")
        )
        if base is None:
            out = sg.filter(F.col("s_cnt") >= max(msm, 1)).select(
                "doc_id", F.col("s_sum").alias("score")
            )
        else:
            joined = base.join(sg, "doc_id", "left")
            if msm > 0:
                joined = joined.filter(F.coalesce("s_cnt", F.lit(0)) >= msm)
            out = joined.select(
                "doc_id",
                (F.col("score") + F.coalesce("s_sum", F.lit(0.0))).alias("score"),
            )
    else:
        out = base
    for mn in must_not:
        out = out.join(mn.select("doc_id"), "doc_id", "left_anti")
    return out.select("doc_id", F.round("score", round_dp).alias("score"))


# ------------------------------------------------------------- SQL builder
def bool_score_sql(
    node: dict,
    tf_sql: str,
    meta_table: str = "documents",
    round_dp: int = ROUND_DP,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of ``bool_score`` over a (doc_id, term[, tf]) tf
    subquery — the node combination logic mirrored branch for branch."""
    ctes = (
        f"WITH tf AS ({tf_sql}),\n"
        "stats AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY 1),\n"
        "corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM stats),\n"
        "dict AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)\n"
    )
    return ctes + _node_sql(node, meta_table, round_dp, k1, b)


def _node_sql(node, meta_table, dp, k1, b) -> str:
    if "term" in node:
        t = node["term"]
        return f"""
SELECT tf.doc_id,
       round(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
             * (tf.tf * ({k1} + 1.0))
             / (tf.tf + {k1} * (1.0 - {b} + {b} * s.doc_len / c.avgdl)), {dp}) AS score
FROM tf JOIN dict d USING (term) JOIN stats s ON s.doc_id = tf.doc_id
CROSS JOIN corpus c
WHERE tf.term = '{_sq(t)}'"""
    if "range" in node:
        r = node["range"]
        conds = ["TRUE"]
        if "gte" in r:
            conds.append(f"{r['field']} >= {r['gte']!r}")
        if "lte" in r:
            conds.append(f"{r['field']} <= {r['lte']!r}")
        return (
            f"\nSELECT doc_id, 0.0 AS score FROM {meta_table} "
            f"WHERE {' AND '.join(conds)}"
        )
    if "dis_max" in node:
        subs = [_node_sql(c, meta_table, dp, k1, b) for c in node["dis_max"]]
        tie = float(node.get("tie_breaker", 0.0))
        u = " UNION ALL ".join(
            f"SELECT * FROM ({s}) dm{i}" for i, s in enumerate(subs)
        )
        return (
            f"\nSELECT doc_id, round(mx + {tie!r} * (sm - mx), {dp}) AS score "
            f"FROM (SELECT doc_id, max(score) AS mx, sum(score) AS sm "
            f"FROM ({u}) GROUP BY 1) dmz"
        )
    if "positive" in node:
        pos = _node_sql(node["positive"], meta_table, dp, k1, b)
        neg = _node_sql(node["negative"], meta_table, dp, k1, b)
        nb = float(node.get("negative_boost", 0.5))
        return (
            f"\nSELECT p.doc_id, round(CASE WHEN p.doc_id IN "
            f"(SELECT doc_id FROM ({neg}) bn) THEN p.score * {nb!r} "
            f"ELSE p.score END, {dp}) AS score FROM ({pos}) p"
        )
    must = [_node_sql(c, meta_table, dp, k1, b) for c in node.get("must", [])]
    filt = [_node_sql(c, meta_table, dp, k1, b) for c in node.get("filter", [])]
    should = [_node_sql(c, meta_table, dp, k1, b) for c in node.get("should", [])]
    must_not = [_node_sql(c, meta_table, dp, k1, b) for c in node.get("must_not", [])]
    msm = node.get("minimum_should_match", 0 if (must or filt) else 1)
    if (
        should
        and not (must or filt)
        and msm == 0
        and "minimum_should_match" in node
    ):
        raise ValueError(
            "minimum_should_match=0 on a pure-should bool is unsupported "
            "(see eval_tree)"
        )
    if must:
        froms = f"({must[0]}) m0"
        total = "m0.score"
        for i, m in enumerate(must[1:], 1):
            froms += f" JOIN ({m}) m{i} USING (doc_id)"
            total += f" + m{i}.score"
        base = f"SELECT doc_id, {total} AS score FROM {froms}"
    else:
        base = None
    for i, f_sql in enumerate(filt):
        if base is None:
            base = f"SELECT doc_id, 0.0 AS score FROM ({f_sql}) f{i}"
        else:
            base = (
                f"SELECT b.* FROM ({base}) b WHERE b.doc_id IN "
                f"(SELECT doc_id FROM ({f_sql}) f{i})"
            )
    if should:
        u = " UNION ALL ".join(f"SELECT * FROM ({s}) u{i}" for i, s in enumerate(should))
        sg = (
            f"SELECT doc_id, sum(score) AS s_sum, count(*) AS s_cnt "
            f"FROM ({u}) GROUP BY 1"
        )
        if base is None:
            out = (
                f"SELECT doc_id, s_sum AS score FROM ({sg}) sg "
                f"WHERE s_cnt >= {max(msm, 1)}"
            )
        else:
            cond = f" WHERE coalesce(sg.s_cnt, 0) >= {msm}" if msm > 0 else ""
            out = (
                f"SELECT b.doc_id, b.score + coalesce(sg.s_sum, 0.0) AS score "
                f"FROM ({base}) b LEFT JOIN ({sg}) sg USING (doc_id){cond}"
            )
    else:
        out = base
    for i, mn in enumerate(must_not):
        out = (
            f"SELECT o.* FROM ({out}) o WHERE o.doc_id NOT IN "
            f"(SELECT doc_id FROM ({mn}) n{i})"
        )
    return f"\nSELECT doc_id, round(score, {dp}) AS score FROM ({out}) z"
