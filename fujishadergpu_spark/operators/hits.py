"""HITS hubs & authorities (Kleinberg 1999) over a web link graph —
the complementary link-analysis signal to PageRank: authorities are
pages many good hubs point AT, hubs are pages that point at many good
authorities. Crawl-curation uses: seed-list expansion (good hubs are
directory/survey pages worth crawling deeper) and quality weighting
orthogonal to the random-surfer model.

Arithmetic is EXACT-INTEGER fixed point, the pagerank.py discipline:
scores live in micro-units of ``scale`` (default 10^9) and each round
L1-renormalizes by one floor division, so results are bit-identical
across engines, partition counts, and cluster sizes. Update per round:

    a_raw(v) = sum_{u -> v} hub(u)           # order-free BIGINT sum
    auth(v)  = (a_raw(v) * scale) div A      # A = sum_v a_raw(v)
    h_raw(u) = sum_{u -> v} auth(v)
    hub(u)   = (h_raw(u) * scale) div H      # H = sum_u h_raw(u)

This is the classic power iteration with L1 (not L2) normalization —
the same fixed point up to per-node scaling on the ranking, and the
normalization every integer engine can do exactly. Overflow bound:
after renormalization each score vector sums to <= scale, and a raw
in/out sum is <= the total opposite-side mass <= scale, so the
renormalization product is <= scale^2 = 10^18 < 2^63 on both engines
(DuckDB SUM yields HUGEINT and is cast back under the same bound).
A side with zero total (no edges at all) renormalizes to all-zero
instead of dividing by zero; both engines CASE-gate identically.

Scale shape (10^12 nodes): iteration state is (id, auth, hub)
three-long rows; per round exactly two wide exchanges — edges ⋈ hub
on src with a map-side-partial SUM on dst, then edges ⋈ auth on dst
with the SUM on src (both AQE skew-splittable aggregates, never
windows). The two L1 totals are 1-row aggregates broadcast back by
cross-join (the pagerank.py / components.py fingerprint discipline —
no unbounded collect). ``localCheckpoint`` per round truncates
lineage. Document text never enters the loop.

Reference analog: none (the reference is a single-raster engine);
extends the link-graph family (operators/pagerank.py) per SURVEY.md
§2.E.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graphcore import node_universe, normalize_edges


def hits(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 10,
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, auth_q9, hub_q9) for every node after ``iters`` exact
    integer HITS rounds (L1-normalized power iteration).

    ``edges`` is a directed (src, dst) link relation; self-loops and
    duplicate links are dropped here so callers can feed raw extracted
    hyperlinks. ``nodes`` (optional, one ``id`` column) fixes the node
    universe; when omitted it is the ids appearing in ``edges``.
    Nodes outside the link structure converge to auth = hub = 0 —
    HITS, unlike PageRank, assigns no teleport floor.
    """
    if iters < 0:
        raise ValueError(f"hits: iters must be >= 0, got {iters}")
    if scale <= 0 or scale > 10**9:
        # scale^2 must stay inside BIGINT on both engines (see module
        # docstring overflow bound)
        raise ValueError(f"hits: need 0 < scale <= 10^9, got {scale}")
    e = normalize_edges(edges, src, dst)
    base_nodes = node_universe(e, nodes).localCheckpoint()
    n = base_nodes.count()
    if n > scale:
        # scale // n would floor every initial hub share to 0 and the
        # whole iteration would silently return zeros; at >10^9 nodes
        # run HITS on a rollup (the host-graph pattern) — the scale
        # cap itself is the BIGINT overflow bound and cannot rise
        raise ValueError(
            f"hits: node universe ({n}) exceeds scale ({scale}); the uniform "
            f"init would be all-zero — roll the graph up (e.g. host level) "
            f"or raise scale toward the 10^9 overflow cap"
        )
    if n == 0:
        return base_nodes.select(
            "id",
            F.lit(0).cast("long").alias("auth_q9"),
            F.lit(0).cast("long").alias("hub_q9"),
        )

    def _renorm(raw: DataFrame, out: str) -> DataFrame:
        """nodes left-joined onto a (id, _s) raw-sum relation, L1-
        renormalized to ``scale`` by one floor division; a zero total
        (no edges) renormalizes to all-zero instead of dividing."""
        tot = raw.agg(F.coalesce(F.sum("_s"), F.lit(0).cast("long")).alias("_t"))
        return (
            base_nodes.join(raw, "id", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "id",
                F.when(F.col("_t") == 0, F.lit(0).cast("long"))
                .otherwise(
                    F.expr(f"(coalesce(_s, 0L) * {scale}) div _t").cast("long")
                )
                .alias(out),
            )
        )

    # init: uniform hub mass (the standard all-ones start, pre-scaled
    # so every later raw sum is bounded by `scale`)
    h = base_nodes.select("id", F.lit(scale // n).cast("long").alias("hub"))
    a = base_nodes.select("id", F.lit(0).cast("long").alias("auth"))
    for _ in range(iters):
        a_raw = (
            e.join(h.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("_s"))
        )
        a = _renorm(a_raw, "auth").localCheckpoint()
        h_raw = (
            e.join(a.select(F.col("id").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("_s"))
        )
        h = _renorm(h_raw, "hub").localCheckpoint()
    return (
        a.join(h, "id")
        .select("id", F.col("auth").alias("auth_q9"), F.col("hub").alias("hub_q9"))
    )
