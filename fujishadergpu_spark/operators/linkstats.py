"""Link-graph structure signals: per-node in/out degree and link
reciprocity — the cheap graph-shape features crawl curation reads
BEFORE any rank iteration (Becchetti 2008 "Link Analysis for Web Spam
Detection": degree imbalance and abnormally high reciprocity are the
first-line link-farm indicators; Common Crawl publishes exactly these
per-host columns alongside its rank tables).

Columns (per node of the supplied universe):

    out_deg   distinct out-links (self-loops and duplicates dropped)
    in_deg    distinct in-links
    recip_out out-links whose reverse edge also exists
    recip_q6  floor(recip_out * 10^6 / out_deg), 0 when out_deg = 0 —
              the reciprocity ratio in exact parts-per-million, so the
              column is a BIGINT and cross-engine bit-equal (the
              repo-wide quantized-ratio contract)

Scale shape (10^12 edges): edge normalization is ONE distinct over
two-long rows; degrees are two map-side-partial COUNT aggregates;
reciprocity is ONE self-semi-join on the swapped key pair (equi-join,
AQE skew-splittable — the everyone-links-here hub lands in an
aggregate/join key, never a window). Node-universe totality via left
joins with coalesce-to-0, the repetition.py totality discipline.
Nothing collects; no iteration.

Reference analog: none (single-raster engine); extends the link-graph
family (operators/pagerank.py, operators/hits.py) per SURVEY.md §2.E.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graphcore import node_universe, normalize_edges

_Q = 10**6  # parts-per-million ratio quantum (shared with the SQL twin)


def link_stats(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, out_deg, in_deg, recip_out, recip_q6) for every node.

    ``edges`` is a directed (src, dst) relation; self-loops and
    duplicate links are dropped here (the pagerank.py/hits.py edge
    normalization) so callers can feed raw extracted hyperlinks.
    ``nodes`` (optional, one ``id`` column) fixes the node universe;
    when omitted it is the ids appearing in ``edges``. Isolated nodes
    report all-zero rows.
    """
    e = normalize_edges(edges, src, dst, checkpoint=False)
    ids = node_universe(e, nodes)
    out_deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    in_deg = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_deg"))
    # an out-edge (u, v) is reciprocated iff (v, u) is also an edge:
    # semi-join against the swapped relation, then count per src
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        e.join(rev, ["src", "dst"], "left_semi")
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("recip_out"))
    )
    z = F.lit(0).cast("long")
    return (
        ids.join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .join(recip, "id", "left")
        .select(
            "id",
            F.coalesce("out_deg", z).alias("out_deg"),
            F.coalesce("in_deg", z).alias("in_deg"),
            F.coalesce("recip_out", z).alias("recip_out"),
            F.when(F.coalesce("out_deg", z) == 0, z)
            .otherwise(
                F.expr(f"(coalesce(recip_out, 0L) * {_Q}) div out_deg").cast("long")
            )
            .alias("recip_q6"),
        )
    )
