"""Seed-distance BFS over the link graph: minimum hop count from a
curated seed set within a bounded horizon — the focused-crawl frontier
(Chakrabarti 1999: crawl ordering by distance from topic seeds) and
the neighborhood underlying TrustRank-style seed propagation (pages
more clicks from any trusted seed are less trustworthy; Gyongyi 2004
§4 measures exactly this distance).

Exact by construction — hop counts are small integers, no arithmetic
beyond +1 and MIN — so the DuckDB unrolled-CTE twin matches with no
quantization argument at all.

Update per round r (frontier-only: only nodes first reached in round
r-1 can discover anything new, so the join probe side shrinks to the
newest ring instead of rescanning every settled node):

    step_r  = edges ⋈ frontier_{r-1} on src -> (dst, r)
    dist_r  = min-combine(dist_{r-1} ∪ step_r)

Scale shape (10^12 edges): per round ONE equi-join (edges against the
current ring — AQE picks broadcast once the ring is small, which for
real seed sets is every round) and ONE map-side-partial MIN aggregate
over two-long rows; ``localCheckpoint`` per round truncates lineage
(the pagerank/components discipline). Unreached nodes report -1, so
the output is total over the node universe.

Reference analog: none (single-raster engine); extends the link-graph
family (operators/pagerank.py, hits.py, linkstats.py) per SURVEY §2.E.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graphcore import node_universe, normalize_edges


def seed_distance(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, hops) — minimum link distance from any seed, breadth-first
    up to ``max_hops``; -1 marks nodes not reached within the horizon.

    ``edges`` is a directed (src, dst) relation (self-loops and
    duplicates dropped here, the family edge normalization). ``seeds``
    supplies the 0-distance set (first column; ids outside the node
    universe are harmless — they expand but never report). ``nodes``
    (optional) fixes the output universe; when omitted it is the ids
    appearing in ``edges``."""
    if max_hops < 0:
        raise ValueError(f"seed_distance: max_hops must be >= 0, got {max_hops}")
    e = normalize_edges(edges, src, dst)
    base_nodes = node_universe(e, nodes).localCheckpoint()

    dist = (
        seeds.select(F.col(seeds.columns[0]).cast("long").alias("id"))
        .distinct()
        .select("id", F.lit(0).cast("int").alias("hops"))
        .localCheckpoint()
    )
    frontier = dist
    for r in range(1, max_hops + 1):
        step = (
            e.join(frontier.select(F.col("id").alias("src")), "src")
            .select(F.col("dst").alias("id"), F.lit(r).cast("int").alias("hops"))
        )
        dist = (
            dist.unionByName(step)
            .groupBy("id")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint()
        )
        # only nodes FIRST reached this round can extend the search
        frontier = dist.where(F.col("hops") == r)
    return base_nodes.join(dist, "id", "left").select(
        "id", F.coalesce("hops", F.lit(-1).cast("int")).alias("hops")
    )
