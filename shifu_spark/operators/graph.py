"""Iterative graph algorithms on edge DataFrames.

PageRank (Page et al. 1999) with the repo's cross-engine determinism
contract: per-target contribution sums go through DECIMAL(38,10) so
they are exact and partition-order independent, and every other step is
a single IEEE double op on identical inputs — K iterations produce
bit-identical ranks on any engine (the oracle unrolls the same K steps
as chained SQL CTEs). Connected components live in operators/dedup
(label propagation / union-find regimes).

Scale shape: one iteration = one edges⋈ranks join + one groupBy — the
canonical Pregel superstep as plain DataFrame ops; ranks localCheckpoint
per iteration so lineage stays flat (an unbounded plan tree is the
classic iterative-Spark failure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 5


def pagerank_df(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations over a DIRECTED
    edge list (symmetrize upstream for an undirected walk). Assumes no
    dangling nodes (every node has out-degree >= 1 — true for any
    symmetrized graph); rank mass is then conserved each step.

    new_rank = (1-d)/N + d * Σ_in CAST(rank/outdeg AS DECIMAL(38,10))
    — the division and the final multiply-add are single double ops on
    engine-identical inputs; the sum is exact decimal."""
    # e is typically a non-trivial derivation (the registered query scans
    # lineitem, distincts the pairs and unions the reverse); without a
    # persist it is re-derived by all_nodes, by the e side of ed AND by
    # the deg side (ReuseExchange only collapses the latter two when the
    # exchanges line up) — the n-count job below materializes the cache
    # so every consumer pays the scan+distinct once (r13, guide §1.2)
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).persist()
    # one persisted distinct-source frame serves BOTH the N count and the
    # per-superstep node universe (ed = e ⋈ deg preserves exactly e's
    # source set, so recomputing the distinct again would be a second
    # full shuffle for the same rows)
    all_nodes = e.select(F.col("src")).distinct().persist()
    n = all_nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # persist lazily: the first superstep's contribution join materializes
    # the cache as part of its own job — an upfront count() here was one
    # whole extra job for data the next job reads anyway (r12, guide §1.2)
    ed = e.join(deg, "src").persist()

    base = float(1.0 - damping) / n
    # all_nodes is the full node universe (all sources — complete under
    # the documented no-dangling assumption). Each superstep LEFT-joins
    # it with the contribution sums: a node with zero IN-degree must
    # keep rank (1-d)/N and keep contributing, not silently vanish from
    # the rank table (an inner groupBy(dst) drops it after the first
    # iteration and loses its out-flow mass with it).
    ranks = all_nodes.select(
        F.col("src").alias("node"), (F.lit(1.0) / n).alias("rank")
    )
    for i in range(iters):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                "dst",
                (F.col("rank") / F.col("outdeg")).cast("decimal(38,10)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            all_nodes.join(contrib, all_nodes.src == contrib.dst, "left")
            .select(
                F.col("src").alias("node"),
                (
                    F.lit(base)
                    + F.lit(float(damping))
                    * F.coalesce(
                        F.col("s"), F.lit(0).cast("decimal(38,10)")
                    ).cast("double")
                ).alias("rank"),
            )
            # lazy for the intermediates, eager only for the LAST step:
            # each intermediate ranks frame is consumed exactly once (by
            # the next superstep), so an eager checkpoint per iteration
            # was one whole driver job per superstep purely to
            # materialize data the next job would compute in-line anyway;
            # lazy localCheckpoint still returns a LogicalRDD (the plan
            # tree stays flat — the reason for checkpointing at all) and
            # stores the partitions when the final job computes through
            # them. The last step stays EAGER so the whole chain
            # materializes while e/ed/all_nodes are still cached — the
            # unpersists below would otherwise strip the caches from
            # under the caller's first action (r13 paired A/B: 39 -> 26
            # jobs, min 12.9 -> 9.3 s at sf0.1, values bit-identical).
            .localCheckpoint(eager=(i == iters - 1))
        )
    ed.unpersist()
    all_nodes.unpersist()
    e.unpersist()
    return ranks


def pagerank_unrolled_sql(
    edges_sql: str,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
) -> str:
    """The SAME K iterations as chained SQL CTEs (the oracle form):
    ``edges_sql`` must yield (src, dst). Returns SQL producing
    (node, rank) after ``iters`` steps."""
    parts = [
        f"e AS ({edges_sql})",
        "deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        "n AS (SELECT count(*) AS n FROM deg)",
        "pr0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / n.n AS rank FROM deg, n)",
    ]
    for i in range(1, iters + 1):
        # LEFT JOIN against the full node universe mirrors pagerank_df:
        # zero-in-degree nodes keep rank (1-d)/N (COALESCE over the
        # missing decimal sum) instead of vanishing from the rank table
        parts.append(
            f"""c{i} AS (
  SELECT e.dst AS node,
         sum(CAST(pr{i - 1}.rank / deg.outdeg AS DECIMAL(38,10))) AS s
  FROM pr{i - 1} JOIN e ON pr{i - 1}.node = e.src JOIN deg ON pr{i - 1}.node = deg.src
  GROUP BY e.dst)"""
        )
        parts.append(
            f"""pr{i} AS (
  SELECT deg.src AS node,
         CAST({1.0 - damping} AS DOUBLE) / n.n
           + CAST({damping} AS DOUBLE) * CAST(COALESCE(c{i}.s, CAST(0 AS DECIMAL(38,10))) AS DOUBLE) AS rank
  FROM deg CROSS JOIN n LEFT JOIN c{i} ON deg.src = c{i}.node)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM pr{iters}"


def triangle_count_df(edges: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Global triangle census of an UNDIRECTED simple graph given as
    canonically-ordered edges (a < b, no duplicates): one row with
    n_nodes, n_edges, n_wedges, n_triangles and the global clustering
    coefficient 3·T/W.

    Scale shape (the standard distributed formulation — e.g. Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11): every edge is ORIENTED from its lower endpoint to
    its higher endpoint under the (degree, node) total order, which
    bounds every out-adjacency list by O(√E) even on power-law graphs —
    the heavy-hitter wedge explosion dies at the orientation step, not
    in a skewed reducer.  Wedges are then the self-join of the oriented
    list on its source, and a triangle is a wedge whose far pair is
    itself an oriented edge: two joins + one count, no driver-side
    state.  All outputs are exact integers; the coefficient is a single
    double division (cross-engine deterministic).
    """
    # e is typically a non-trivial pipeline (the registered query derives
    # it from a per-order self-join + distinct); before r12 it was
    # re-executed by FOUR consumers (degree pass, orientation join, edge
    # count, wedge census ran deg twice more) — persist it once and fold
    # the edge/wedge census onto deg so every downstream pass reads the
    # cache (guide §1.2: remove redundant passes first)
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).persist()
    # deg is node-sized but consumed THREE times (the da and db sides of
    # the orientation join and the summary aggregate) — unpersisted, each
    # consumer re-ran the union-doubled edge scan + groupBy shuffle.
    # Persisting it trades O(nodes) memory for two full degree passes
    # (r13 paired A/B: 14.3 -> 11.0 s min, 28 -> 25 jobs at sf0.1,
    # census bit-identical)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    # orient each edge low→high under the (deg, node) order
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ed = e.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_dst"),
    ).persist()
    try:
        o1 = oriented.select(
            F.col("src"), F.col("dst").alias("v"), F.col("deg_dst").alias("deg_v")
        )
        o2 = oriented.select(
            F.col("src"), F.col("dst").alias("w"), F.col("deg_dst").alias("deg_w")
        )
        # each unordered out-pair once: v before w in the same total order
        wedges = o1.join(o2, "src").filter(
            (F.col("deg_v") < F.col("deg_w"))
            | ((F.col("deg_v") == F.col("deg_w")) & (F.col("v") < F.col("w")))
        )
        closed = wedges.join(
            oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
            ["v", "w"],
            "left_semi",
        )
        tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
        summary = (
            # n_edges from deg, not a separate pass over e: every edge
            # contributes exactly 2 to Σdeg, so Σdeg div 2 is the exact
            # integer edge count — one agg over the node-sized degree
            # table replaces another full derivation of e (r12)
            deg.agg(
                F.count(F.lit(1)).alias("n_nodes"),
                F.coalesce(
                    F.expr("sum(deg) div 2"), F.lit(0)
                ).alias("n_edges"),
                # coalesce: an edgeless graph has 0 wedges, not NULL.
                # deg*(deg-1) is always even, so integer `div 2` is exact
                # at any degree — Column `/` is DOUBLE division and would
                # lose exactness once the product passes 2^53.
                F.coalesce(
                    F.sum(F.expr("deg * (deg - 1) div 2")),
                    F.lit(0),
                ).alias("n_wedges"),
            )
            .crossJoin(tri)
            .select(
                "n_nodes",
                "n_edges",
                "n_wedges",
                "n_triangles",
                # when(): ANSI mode raises DIVIDE_BY_ZERO on an edgeless
                # graph's 0/0 — null is the honest clustering there
                F.when(
                    F.col("n_wedges") > 0,
                    F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6),
                ).alias("clustering"),
            )
        )
        out = summary.localCheckpoint(eager=True)
    finally:
        oriented.unpersist()
        deg.unpersist()
        e.unpersist()
    return out
