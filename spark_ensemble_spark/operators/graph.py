"""Iterative graph analytics beyond connected components: PageRank.

The second graph operator next to ``dedup.dup_clusters``'s pointer-jumping
CC — the canonical "iterate until converged" dataflow (Page et al. 1999).
Used in data pipelines to rank documents inside a link/citation/co-view
graph so curation can prefer central documents when resolving duplicates
or sampling.

Exactness contract — EXACT INTEGER arithmetic end to end, so the ranks are
bit-deterministic under any partitioning and fully SQL-replayable:

* ranks live on a ``10^12`` integer grid (BIGINT ``r``),
* a node's per-edge contribution is ``r DIV outdeg`` (integer division —
  the flooring IS the spec, identical everywhere),
* damping ``d = 0.85 = 17/20`` applies as ``(S · 17) DIV 20`` on the exact
  integer sum ``S`` (never a float multiply — ``0.85 · S`` on a double
  loses exactness once ``S`` nears 2⁵³),
* the teleport term is ``(3 · 10^12) DIV (20 · n)`` once per iteration.

Scale shape: each iteration is one equi-join of the rank frame against the
edge list (shuffle on the node key both sides — co-partitionable) plus a
map-side-combined sum by destination; lineage is truncated through
``DFIterationCache`` like every iterative loop here. Dangling-node mass is
NOT redistributed (the pruned PageRank variant — total rank decays where
dangling nodes absorb it; the redistribution term is one extra 1-row
aggregate if a consumer needs the stochastic variant), documented rather
than hidden.

Reference parity: the reference engine has no graph surface — this is
beyond-reference LLM-pipeline scope (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
_D_NUM, _D_DEN = 17, 20  # damping 0.85 as an exact rational


def pagerank(
    edges: DataFrame,
    n_iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact-integer PageRank over an edge list. Returns one row per node
    appearing in the graph: ``(node, rank_scaled BIGINT, rank DOUBLE)``
    with ``rank = rank_scaled / 10^12`` (one division of the same exact
    integer — identical on every engine). Parallel edges are kept (they
    weight the link, the usual multigraph convention)."""
    from spark_ensemble_spark.core.utils import DFIterationCache

    import os

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # Driver-side fast path (r12 — the dup_clusters/Bradley-Terry pattern):
    # each distributed iteration pays two joins + a grouped sum + a left
    # join of node-sized frames in scheduling latency. When the edge list
    # fits under SPARK_GRAFT_PR_LOCAL_EDGES_MAX (default 65536; bounded
    # collect, gated by a count first), replay the EXACT integer iteration
    # in Python — non-negative flooring DIV == ``//``, arbitrary-precision
    # ints ⊇ LONG — and emit a VALUES frame. Larger graphs keep the
    # distributed loop unchanged.
    local_max = int(os.environ.get("SPARK_GRAFT_PR_LOCAL_EDGES_MAX", "65536"))
    if local_max > 0:
        probe = e.limit(local_max + 1).collect()
        if len(probe) <= local_max:
            return _pagerank_local(
                edges.sparkSession,
                probe,
                n_iters,
                e.schema["src"].dataType.simpleString(),
            )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.count()  # scalar graph order: bounded driver state
    init = SCALE // n
    base = (3 * SCALE) // (_D_DEN * n)

    cache = DFIterationCache(interval=3)
    ranks = cache.update(nodes.withColumn("r", F.lit(init).cast("long")))
    for _ in range(n_iters):
        contribs = (
            ranks.withColumnRenamed("node", "src")
            .join(outdeg, "src")
            .join(e, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("CAST(r DIV outdeg AS LONG)").alias("c"),
            )
        )
        sums = contribs.groupBy("node").agg(F.sum("c").alias("S"))
        ranks = cache.update(
            nodes.join(sums, "node", "left")
            .withColumn("S", F.coalesce(F.col("S"), F.lit(0)).cast("long"))
            .select(
                "node",
                F.expr(
                    f"CAST({base} + (S * {_D_NUM}) DIV {_D_DEN} AS LONG)"
                ).alias("r"),
            )
        )
    out = ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / F.lit(float(SCALE))).alias("rank"),
    )
    cache.close()
    return out


def _pagerank_local(spark, edge_rows, n_iters: int, node_type: str):
    """Driver-side replay of the distributed exact-integer iteration, term
    for term: ``c = r[src] // outdeg[src]`` per edge, per-destination sums,
    ``r' = base + (S · 17) // 20`` — all non-negative, so Python ``//`` is
    the same flooring DIV, and Python ints are exact at any width. Emits
    the node-sized result as a pure-JVM VALUES frame."""
    from collections import defaultdict

    from spark_ensemble_spark.sources.datasets import local_df

    outdeg: dict = defaultdict(int)
    nodes = set()
    es = []
    for r in edge_rows:
        s, d = r[0], r[1]
        es.append((s, d))
        outdeg[s] += 1
        nodes.add(s)
        nodes.add(d)
    n = len(nodes)
    init = SCALE // n
    base = (3 * SCALE) // (_D_DEN * n)
    ranks = {node: init for node in nodes}
    for _ in range(n_iters):
        sums: dict = defaultdict(int)
        for s, d in es:
            sums[d] += ranks[s] // outdeg[s]
        ranks = {
            node: base + (sums[node] * _D_NUM) // _D_DEN for node in nodes
        }
    rows = [
        (node, r, r / float(SCALE)) for node, r in ranks.items()
    ]
    return local_df(
        spark,
        rows,
        f"node {node_type}, rank_scaled bigint, rank double",
    )


def pagerank_oracle_sql(
    edges_sql: str,
    n_iters: int = 5,
) -> str:
    """DuckDB replay of :func:`pagerank`: the iterations UNROLL as chained
    MATERIALIZED CTEs — one rank-vector CTE per step, each one LEFT-joining
    the previous vector's per-destination contribution sums, with the
    identical integer arithmetic (DuckDB ``//`` == Spark ``DIV`` on
    non-negative BIGINTs). Unrolled rather than RECURSIVE deliberately:
    DuckDB 1.0.0's recursive working table combined with a correlated
    LATERAL mis-aggregated the contribution sums (the step computes
    correctly OUTSIDE recursion — same class of hazard as the
    ``list_reduce`` struct-accumulator bug), and MATERIALIZED keeps the
    chain from re-evaluating exponentially. ``edges_sql`` emits ``(src,
    dst)``."""
    steps = []
    for k in range(1, n_iters + 1):
        prev = f"r{k - 1}"
        steps.append(f"""
    r{k} AS MATERIALIZED (
      SELECT n.node,
             CAST((SELECT base FROM params)
               + (CAST(COALESCE(s.S, 0) AS BIGINT) * {_D_NUM}) // {_D_DEN}
               AS BIGINT) AS rank_scaled
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum(p.rank_scaled // o.outdeg) AS S
        FROM {prev} p
        JOIN outdeg o ON o.src = p.node
        JOIN e ON e.src = p.node
        GROUP BY e.dst
      ) s ON s.node = n.node
    )""")
    chain = ",".join(steps)
    return f"""
    WITH e AS MATERIALIZED ({edges_sql}),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM e UNION SELECT dst FROM e
    ),
    outdeg AS MATERIALIZED (
      SELECT src, count(*) AS outdeg FROM e GROUP BY src
    ),
    params AS MATERIALIZED (
      SELECT CAST({SCALE} AS BIGINT) // count(*) AS init,
             CAST({3 * SCALE} AS BIGINT) // ({_D_DEN} * count(*)) AS base
      FROM nodes
    ),
    r0 AS MATERIALIZED (
      SELECT node, (SELECT init FROM params) AS rank_scaled FROM nodes
    ),{chain}
    SELECT node, rank_scaled,
           CAST(rank_scaled AS DOUBLE) / {float(SCALE)!r} AS rank
    FROM r{n_iters}
    """
