"""Connected components over a near-duplicate pair graph, and the
canonical-document selection built on it — the final stage of a
webtext dedup pipeline (LSH/Jaccard pairs -> clusters -> keep one doc
per cluster).

Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
and Beyond", SoCC 2014). Unlike plain min-label propagation — whose
round count is the graph DIAMETER — the alternation provably
converges in O(log^2 n) rounds on ANY graph, so a pathological
duplicate chain (page A ~ B ~ C ~ ... from incremental boilerplate
drift) cannot stretch the job. Each star op is one exchange on u (a
partition-window min) plus the output distinct, over fixed-width
(long, long) edge rows: document text NEVER enters the iteration.
Per-round ``localCheckpoint`` truncates the growing plan lineage, the
same pattern as the kNN ring expansion (knn.py).

Convergence is detected by an order-insensitive edge-multiset
fingerprint (count + sum of xxhash64(u, v)) — one cheap aggregate per
round, no driver-side edge collection.

Reference analog: none (the reference is a single-raster engine);
this extends the dedup family (operators/dedup.py) the same way the
reference's tile pipeline chains prepare -> process -> mosaic
(core/tile_processor.py): pairs -> components -> canonical keep-list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star operation.

    ``edges`` is the SYMMETRIC edge list (u, v), no self-loops. For
    each node u let m = min(N(u) + {u}):

    - large-star: emit (v, m) for every neighbor v > u;
    - small-star: emit (v, m) for every neighbor v <= u, plus (u, m).

    Output is again symmetric-free directed (child, parent) rows; the
    caller re-symmetrizes for the next round.

    The neighborhood minimum comes from a partition window (ONE
    exchange on u) rather than groupBy + join back (two exchanges on
    the same key) — per round the whole op is that single edge-list
    shuffle plus the output distinct.
    """
    j = edges.withColumn(
        "m", F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    )
    if large:
        out = j.where(F.col("v") > F.col("u")).select("v", "m")
    else:
        out = (
            j.where(F.col("v") <= F.col("u"))
            .select("v", "m")
            .unionByName(j.select(F.col("u").alias("v"), "m"))
        )
    return (
        out.where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _fingerprint(edges: DataFrame) -> tuple:
    # decimal(38,0) accumulator: the sum of n 64-bit hashes cannot
    # overflow it (ANSI mode makes a plain long sum a hard error).
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """(id, component) for every node that appears in ``pairs``, where
    component is the minimum node id of its connected component.

    Nodes with no edges do not appear (they are their own singleton
    component); ``canonical_assignment`` folds them back in. The two
    aggregates per round (min + fingerprint) are map-side partial;
    every shuffled row is two longs.
    """
    edges = (
        pairs.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    def sym(e: DataFrame) -> DataFrame:
        return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    fp = _fingerprint(edges)
    for _ in range(max_iter):
        edges = _star_round(sym(_star_round(sym(edges), large=True)), large=False)
        edges = edges.localCheckpoint()
        nfp = _fingerprint(edges)
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    # At the fixed point the edge set is a star forest: every non-root
    # points at its component minimum. Roots map to themselves.
    return (
        edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .unionByName(edges.select(F.col("v").alias("id"), F.col("v").alias("component")))
        .distinct()
    )


def canonical_assignment(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    prefer_col: str | None = None,
) -> DataFrame:
    """Full-corpus keep-list: (id_col, canonical_id, keep) for EVERY
    document — near-dup cluster members map to the cluster's canonical
    doc, singletons to themselves; ``keep`` marks the one retained
    representative per cluster.

    Canonical choice: by default the cluster's minimum id; with
    ``prefer_col`` the member with the MAXIMUM value of that column
    (quality score, length, recency), ties broken by minimum id — the
    usual "keep the best copy" rule of a production dedup pass. The
    argmax is a (max(prefer), min-id-at-max) struct aggregate, still
    map-side partial over fixed-width rows.

    The pair graph may reference ids no longer in ``docs`` (a corpus
    pruned AFTER pairs were computed): clusters stay connected through
    such ghost nodes, but the canonical id is re-anchored to the
    minimum member PRESENT in docs — every non-empty cluster therefore
    keeps exactly one representative, never a dangling canonical_id.

    The assignment joins are plain equi-joins on the id: at webtext
    scale near-dup membership is routinely 30-50% of the corpus, so
    the components side is NOT broadcastable by contract — every wide
    side here shuffles fixed-width id rows only (the corpus side is
    pruned to its id column before the join; AQE still broadcasts when
    the pair graph happens to be small).
    """
    cols = [id_col] if prefer_col is None else [id_col, prefer_col]
    ids = docs.select(*[F.col(c) for c in cols])
    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "id", id_col
    )
    present = comp.join(ids, id_col)
    if prefer_col is None:
        canon = present.groupBy("component").agg(F.min(id_col).alias("_canon"))
    else:
        # max prefer, tie -> min id, as ONE struct-max aggregate.
        # Bitwise NOT (~id) reverses long ordering with no overflow at
        # Long.MIN_VALUE (ids are xxhash64 full-range longs; -id would
        # be an ANSI ARITHMETIC_OVERFLOW there). A leading not-null
        # flag makes NULL prefer values lose to any non-NULL one
        # deterministically (all-NULL clusters fall to the min-id
        # tie-break) instead of relying on engine null ordering.
        best = F.max(
            F.struct(
                F.col(prefer_col).isNotNull().alias("_h"),
                F.col(prefer_col).alias("_p"),
                F.bitwise_not(F.col(id_col)).alias("_nid"),
            )
        )
        canon = (
            present.groupBy("component")
            .agg(best.alias("_b"))
            .select("component", F.bitwise_not(F.col("_b._nid")).alias("_canon"))
        )
    assign = present.join(canon, "component").select(id_col, "_canon")
    return ids.select(id_col).join(assign, id_col, "left").select(
        F.col(id_col),
        F.coalesce("_canon", F.col(id_col)).alias("canonical_id"),
        (F.coalesce("_canon", F.col(id_col)) == F.col(id_col)).alias("keep"),
    )


def soft_dedup_weights(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Soft deduplication (the down-weight-don't-drop alternative,
    cf. SoftDeDup, Xia et al. 2024): every document receives sampling
    weight 1/|near-dup cluster| so each distinct content unit
    contributes EQUAL training mass whatever its copy count —
    preserving coverage that hard dedup's single-keeper rule throws
    away (mirror sites, quote-heavy pages). Returns (id, cluster_size,
    weight_q6) for EVERY input document; singletons weigh 1.0.
    weight_q6 = round(1e6 / size) keeps the weight an exact integer
    cross-engine.

    Same scale shape as canonical_assignment: the components loop is
    ids-only; sizes are one map-side-partial count per component; the
    back-joins ship fixed-width id rows (near-dup membership is
    routinely 30-50% of a web corpus — not broadcastable by contract,
    AQE may still broadcast small graphs)."""
    ids = docs.select(F.col(id_col))
    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "id", id_col
    )
    present = comp.join(ids, id_col)
    sizes = present.groupBy("component").agg(F.count("*").alias("_n"))
    w = present.join(sizes, "component").select(id_col, "_n")
    n = F.coalesce(F.col("_n"), F.lit(1))
    return ids.join(w, id_col, "left").select(
        id_col,
        n.cast("bigint").alias("cluster_size"),
        F.round(F.lit(1000000.0) / n).cast("bigint").alias("weight_q6"),
    )
