"""Graph analytics over edge-list DataFrames.

Connected components live in ``operators/dedup.py`` (two variants);
this module adds fixed-iteration PageRank — the "which entities
matter" signal for corpus/source weighting (rank domains by citation
structure, users by interaction graphs) — expressed as plain
join/aggregate rounds so Catalyst plans every step.

Scale shape per iteration: one join of the edge list against the
(node, rank) table on src (sort-merge at scale; the rank table is
nodes-sized, often broadcastable), one groupBy(dst) sum with map-side
partial aggregation, and a left join back onto the node list for
sinks. The edge list itself is never mutated, so at 100 TB it can be
bucketed by src once and every iteration reuses the layout.
localCheckpoint per round truncates the exponentially-growing
iterative lineage (same lesson as connected_components).

Simplified formulation (dangling mass NOT redistributed):
    r_{t+1}(v) = (1-d)/N + d * sum_{(u,v) in E} r_t(u) / outdeg(u)
Per-iteration rounding to 10dp keeps the trajectory engine-neutral
(FP sums are order-dependent; rounding each step absorbs the ulps
before they can drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank steps
    over the DIRECTED edge list (symmetrize first for undirected
    graphs). rank is rounded to 6dp in the output, 10dp per step."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.agg(F.count(F.lit(1)).alias("nn"))  # 1-row broadcast scalar
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    rank = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("nn")).alias("r")
    )
    for _ in range(iterations):
        contrib = (
            e.join(outdeg, "src")
            .join(rank, e["src"] == rank["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("c"))
        )
        rank = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("nn")
                    + damping * F.coalesce(F.col("c"), F.lit(0.0)),
                    10,
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return rank.select("node", F.round("r", 6).alias("rank"))


def pagerank_sql(
    edges_cte: str, iterations: int = 3, damping: float = 0.85
) -> str:
    """The IDENTICAL fixed-iteration PageRank as chained SQL CTEs.
    ``edges_cte`` must define a relation ``e(src, dst)``; the caller
    embeds the returned text after it. Exposed so oracles share one
    generator with the DataFrame implementation's semantics."""
    # double-cast every literal: bare 1.0 / 0.85 are DECIMALs in
    # DuckDB, and decimal division diverges from Spark's double math
    d, base = repr(float(damping)), repr(1.0 - float(damping))
    parts = [
        "nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "n AS (SELECT count(*) AS nn FROM nd)",
        "od AS (SELECT src, count(*) AS deg FROM e GROUP BY 1)",
        "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn AS r FROM nd CROSS JOIN n)",
    ]
    for i in range(iterations):
        parts.append(
            f"""c{i} AS (
      SELECT e.dst, sum(r.r / od.deg) AS c
      FROM e JOIN od USING (src) JOIN r{i} r ON e.src = r.node
      GROUP BY 1),
    r{i + 1} AS (
      SELECT nd.node,
             round(CAST({base} AS DOUBLE) / nn
                   + CAST({d} AS DOUBLE) * coalesce(c{i}.c, CAST(0.0 AS DOUBLE)), 10) AS r
      FROM nd LEFT JOIN c{i} ON nd.node = c{i}.dst CROSS JOIN n)"""
        )
    chain = ",\n    ".join(parts)
    return (
        f"{chain}\n    SELECT node, round(r, 6) AS rank FROM r{iterations}"
    )
