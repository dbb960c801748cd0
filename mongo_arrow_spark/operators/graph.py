"""Graph centrality over id-pair edge tables: integer-exact PageRank.

``dedup.connected_components`` answers "which rows belong together";
nothing yet answers "which row (or domain) matters most". Centrality is
a standard curation signal: pick the canonical document of a near-dup
cluster by its position in the similarity graph, weight a source/domain
mix by link authority, prioritize a crawl frontier. MLlib has no
PageRank, and GraphX's is float — summation-order dependent, so its
ranks can't be hash-graded or replayed across engines.

This implementation is EXACT: all mass is fixed-point integer
(``scale``, default 1e12), the damping factor an exact rational
``d_num/d_den``, every division a truncating integer division (the
shared Spark ``div`` / DuckDB ``//`` semantics) — so ``pagerank`` is
bit-identical across engines, partitionings, and re-runs, and a DuckDB
oracle can unroll the identical power iterations as chained
materialized CTEs (``queries_ops.py:graph_pagerank``).

Recurrence (per node v, iteration t):
    share_t(u)   = p_t(u) // out_deg(u)
    p_{t+1}(v)   = ((d_den − d_num) · p0) // d_den
                 + (d_num · Σ_{u→v} share_t(u)) // d_den
with ``p0 = scale // n`` the uniform start. Dangling nodes (no
out-edges) simply leak their mass — the standard simplification;
ranks still order nodes identically for curation purposes and the
contract is what the oracle replays. Duplicate edges are collapsed
(documented; pass pre-weighted multi-edges through ``weight_col``
instead when multiplicity matters).

Scale design (100 TB posture):
- One-time prep: dedup edges, out-degree (one partial-agg shuffle),
  attach degree to edges (one shuffle join), node list — all
  localCheckpoint()ed once.
- Each iteration is exactly TWO shuffles: join p onto edges by src
  (repartitioned consistently so only p moves), then a
  partial-aggregating sum by dst — hot destinations (high in-degree
  hubs) are absorbed map-side, and high out-degree hubs fan out in
  parallel. The result joins back to the node list (left, missing →
  no inbound mass) and is localCheckpoint()ed per round — the
  ``connected_components`` loop discipline (at cluster scale,
  checkpoint to reliable storage).
- The driver coordinates iteration count only; no per-node state ever
  reaches it.

The reference (mongodb-labs/mongo-arrow) has no graph surface — this
extends the training-data tier (SURVEY.md §2 extension block) next to
``dedup.connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    d_num: int = 85,
    d_den: int = 100,
    scale: int = 10**12,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge table.

    Returns ``(node, rank)`` with ``rank`` the fixed-point integer mass
    after ``iters`` power iterations (divide by ``scale`` for the
    conventional [0, 1] reading; keep the integer for hashing/replay).
    Node set = distinct endpoints; NULL endpoints are dropped (a NULL
    node id is meaningless and would poison the degree join);
    self-loops are legal PageRank edges and kept; duplicate (src, dst)
    rows are collapsed to one edge.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not (0 <= d_num <= d_den) or d_den < 1:
        raise ValueError("need 0 <= d_num <= d_den, d_den >= 1")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    # one-time prep, materialized once: degree-annotated edges + nodes
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(None).cast("long"))
    p0 = scale // n
    base = ((d_den - d_num) * p0) // d_den
    p = nodes.withColumn("rank", F.lit(p0).cast("long"))
    for _ in range(iters):
        inbound = (
            ed.join(p, ed["src"] == p["node"])
            # `div` is Spark's INTEGER division (truncating) — never `/`,
            # whose double result can land below the exact quotient and
            # truncate differently than DuckDB's exact `//` at 1e12 scale
            .select(F.col("dst"), F.expr("rank div deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("mass"))
        )
        p = (
            nodes.join(inbound, nodes["node"] == inbound["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"(CAST({d_num} AS BIGINT)"
                        f" * coalesce(mass, CAST(0 AS BIGINT))) div {d_den}"
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return p
