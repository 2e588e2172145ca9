"""Link-graph PageRank over a web corpus — the host/page authority
signal a Common-Crawl-scale curation pipeline uses for crawl
prioritisation and quality weighting (cf. Page et al. 1999; Common
Crawl publishes exactly this style of host-level ranking for its
crawl frontier).

Arithmetic is EXACT-INTEGER fixed point: ranks are BIGINT micro-units
of ``scale`` (default 10^12), every update term is a floor division
of positive longs, and integer sums are order-independent — so the
result is bit-identical across engines, partition counts, and cluster
sizes by construction (no float-summation-order argument needed, the
same discipline as the USM/waterfill gates). Update rule per node v:

    rank'(v) = base + dang + sum_{u -> v} (num * rank(u)) div (den * out_deg(u))

    base = ((den - num) * scale) div (den * n)      # teleport share
    dang = (num * sum_{dangling u} rank(u)) div (den * n)

with damping num/den = 85/100. Floor losses (< 1 unit per edge per
round) make the total mass drift down by ~|E| units per round —
eleven orders below ``scale``; the SIGN of the drift is deterministic
and both engines reproduce it exactly. A ``teleport`` seed set turns
the same recurrence into TrustRank (Gyongyi 2004): base and dangling
shares land on the seeds only, so plain PageRank is the special case
"every node is a seed" — one code path, one twin.

Scale shape (10^12 nodes): the iteration state is (id, rank) two-long
rows; per round there are exactly two wide exchanges — the ranks ⋈
edges equi-join on src (AQE skew-splittable; a hot hub's OUT-edges
share one src key only if one page links out billions of times, which
the dedup stages upstream cap) and the map-side-partial SUM on dst.
Document text never enters the loop. The dangling total is a
single-row aggregate cross-joined back (a 1-row broadcast, the
components.py fingerprint discipline — no unbounded driver collect);
``localCheckpoint`` per round truncates the growing lineage exactly
like operators/components.py / operators/knn.py. The one driver-side
scalar is ``nodes.count()`` at build time (n is needed inside the
teleport constant).

Reference analog: none (the reference is a single-raster engine);
this extends the corpus-curation family (dedup.py, domains.py) with
the graph-authority signal, reusing components.py's iterative
discipline (SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graphcore import node_universe, normalize_edges


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    teleport: DataFrame | None = None,
) -> DataFrame:
    """(id, out_deg, rank_q12) for every node, after ``iters`` exact
    integer fixed-point PageRank rounds.

    ``edges`` is a directed (src, dst) link relation; self-loops and
    duplicate links are removed here so callers can feed raw extracted
    hyperlinks. ``nodes`` (optional, one ``id`` column) fixes the node
    universe — pages with no links in OR out still hold teleport mass;
    when omitted the universe is the ids appearing in ``edges``.
    Nodes with no out-links are dangling: their mass is redistributed
    uniformly each round, the standard correction.

    ``teleport`` (optional, one id column) switches the recurrence to
    TrustRank (Gyongyi, Garcia-Molina, Pedersen 2004): the teleport
    AND dangling shares land only on the seed set — trust flows out of
    curated seeds along links, so pages unreachable from every seed
    converge to rank 0. The corpus-curation use is quality propagation
    from a vetted domain list. Initial mass also starts on the seeds
    (the paper's d = normalized seed vector). Seeds outside the node
    universe are ignored; at least one seed must remain.
    """
    if iters < 0:
        raise ValueError(f"pagerank: iters must be >= 0, got {iters}")
    if not (0 < damping_num < damping_den):
        raise ValueError(
            f"pagerank: need 0 < damping_num < damping_den, got "
            f"{damping_num}/{damping_den}"
        )
    e = normalize_edges(edges, src, dst)
    ids = node_universe(e, nodes)
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    base_nodes = ids.join(deg, "id", "left").select(
        "id", F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg")
    )
    if teleport is None:
        # Plain PageRank == TrustRank with every node a seed.
        base_nodes = base_nodes.withColumn("_seed", F.lit(True))
    else:
        seeds = (
            teleport.select(
                F.col(teleport.columns[0]).cast("long").alias("id"),
                F.lit(True).alias("_seed"),
            ).distinct()
        )
        base_nodes = base_nodes.join(seeds, "id", "left").select(
            "id", "out_deg", F.coalesce("_seed", F.lit(False)).alias("_seed")
        )
    base_nodes = base_nodes.localCheckpoint()
    n = base_nodes.count()
    if n == 0:
        return base_nodes.select("id", "out_deg", F.lit(0).cast("long").alias("rank_q12"))
    s = base_nodes.where("_seed").count() if teleport is not None else n
    if s == 0:
        raise ValueError("pagerank: teleport set is empty or disjoint from the node universe")
    # Teleport share: exact Python-int floor — identical to the SQL
    # twin's in-query integer expression by the uniqueness of floor.
    base = ((damping_den - damping_num) * scale) // (damping_den * s)
    dang_denom = damping_den * s

    r = base_nodes.select(
        "id",
        "out_deg",
        "_seed",
        F.when(F.col("_seed"), F.lit(scale // s)).otherwise(F.lit(0)).cast("long").alias("rank"),
    )
    for _ in range(iters):
        # 1-row dangling-mass aggregate, broadcast back (never collects).
        dt = r.where(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0).cast("long")).alias("_dt")
        )
        contrib = (
            e.join(
                r.select(F.col("id").alias("src"), "rank", "out_deg"), "src"
            )
            .select(
                F.col("dst").alias("id"),
                F.expr(
                    f"({damping_num} * rank) div ({damping_den} * out_deg)"
                ).alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").alias("_s"))
        )
        r = (
            base_nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dt))
            .select(
                "id",
                "out_deg",
                "_seed",
                (
                    F.when(
                        F.col("_seed"),
                        F.lit(base).cast("long")
                        + F.expr(f"({damping_num} * _dt) div {dang_denom}"),
                    ).otherwise(F.lit(0).cast("long"))
                    + F.coalesce(F.col("_s"), F.lit(0).cast("long"))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return r.select("id", "out_deg", F.col("rank").alias("rank_q12"))
