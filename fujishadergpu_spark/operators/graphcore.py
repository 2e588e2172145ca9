"""Shared link-graph normalization — THE edge/node contract of the
whole family (pagerank, hits, linkstats, bfs, the link-rank job):
edges are distinct long (src, dst) pairs with self-loops dropped; the
node universe is either caller-fixed or the ids appearing in the
edges. One definition, because the bucketed-resume determinism
argument in plans/link_rank.py requires every consumer to normalize
IDENTICALLY — five hand-maintained copies were a silent-divergence
hazard (a fix to one would skip the others and split the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_edges(
    edges: DataFrame, src: str = "src", dst: str = "dst", checkpoint: bool = True
) -> DataFrame:
    """Distinct long (src, dst) pairs, self-loops dropped — so every
    operator can feed on raw extracted hyperlinks. ``checkpoint``
    truncates lineage once before iterative loops (the family
    discipline); pass False where the caller materializes the result
    itself (e.g. the link-rank edges stage writes it to parquet)."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return e.localCheckpoint() if checkpoint else e


def node_universe(e: DataFrame, nodes: DataFrame | None) -> DataFrame:
    """One ``id`` column: the caller-fixed universe (first column of
    ``nodes``, cast + distinct) or the ids appearing in the normalized
    edge relation."""
    if nodes is None:
        return (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    return nodes.select(F.col(nodes.columns[0]).cast("long").alias("id")).distinct()
