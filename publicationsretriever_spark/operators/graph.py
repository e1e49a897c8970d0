"""Link-graph authority scoring — fixed-iteration PageRank.

Crawl-engine use: the reference crawls in seed order with per-host
politeness (PublicationsRetriever has no authority model); at
10^10-frontier scale the frontier MUST be prioritized, and
link authority is the standard signal — `plans/rounds.py`'s priority
frontier orders by (depth, score), and a host-level PageRank over the
observed link graph is the natural score source between rounds.

Scale shape: each iteration is ONE shuffle — edges join ranks on src
(both sides hash-partitioned on the node key; pre-partition the edge
list once and every iteration reuses the exchange), then a map-side-
combined sum on dst. Rank vectors are |V| rows, edges |E|; nothing is
ever collected. For deep iteration counts, localCheckpoint every few
rounds to cut lineage (the engine's connected-components operators
set the precedent); the default 3 iterations keeps the plan flat.

Determinism: ranks are rounded per iteration (12dp default) so both
engines iterate on IDENTICAL inputs — cross-engine drift cannot
compound across iterations; the per-iteration sum itself is the one
float reduction, same accepted surface as every other aggregating
query in the contract. Dangling-node mass is NOT redistributed (rank
leaks, the common simplification — Twitter's Cassovary did the same);
scores still order hosts correctly, which is all a frontier needs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    iter_round: int = 12,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (multi-edges
    count as parallel links, matching a link graph where a page links
    a host twice). Returns (node, pr) with pr rounded @6dp.

    rank_0 = 1/N;  rank_{i+1}(v) = (1-d)/N + d * sum over in-edges
    (u,v) of rank_i(u)/out_deg(u), rounded @iter_round each step.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    # the edge list is read by every iteration plus the node/degree
    # passes: materialize it ONCE (eager localCheckpoint — executor-
    # local storage, the "pre-partition once, iterations reuse"
    # shape) instead of re-deriving it from the source scan 3+iters
    # times; node and degree tables are |V|-sized and checkpointed
    # for the same reason. Values unchanged — same expressions over
    # the same rows.
    edge = edges.select(
        src.alias("_src"), dst.alias("_dst")
    ).localCheckpoint(eager=True)
    nodes = (
        edge.select(F.col("_src").alias("node"))
        .union(edge.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("empty graph")
    base = (1.0 - damping) / n_nodes

    out_deg = edge.groupBy(F.col("_src").alias("node")).agg(
        F.count("*").alias("_deg")
    )
    # fold the out-degree into the edge table ONCE: every iteration
    # previously paid a second broadcast join just to fetch deg(src);
    # the division pr/deg itself stays per-iteration (pr changes)
    edge = edge.join(
        F.broadcast(out_deg), edge["_src"] == out_deg["node"]
    ).select("_src", "_dst", "_deg").localCheckpoint(eager=True)
    ranks = nodes.withColumn(
        "pr", F.round(F.lit(1.0 / n_nodes), iter_round)
    )
    for _ in range(iters):
        # the rank table is |V|-sized: BROADCAST it into the |E|-scan
        # (without the hint the nested iteration plans lose size
        # estimates and fall back to sort-merge, shuffling the edge
        # list twice per iteration); the new rank vector is eagerly
        # cut per iteration so the next plan stays flat
        contribs = (
            edge.join(F.broadcast(ranks), edge["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("pr") / F.col("_deg")).alias("_c"),
            )
        )
        sums = contribs.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = nodes.join(sums, on="node", how="left").select(
            "node",
            F.round(
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0)),
                iter_round,
            ).alias("pr"),
        ).localCheckpoint(eager=True)
    return ranks.select("node", F.round("pr", 6).alias("pr"))
