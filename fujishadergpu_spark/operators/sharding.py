"""Deterministic corpus shuffle + token-budget shard assignment — the
output stage of a training-data pipeline: lay the cleaned corpus out
in a reproducible pseudo-random order and cut the concatenated token
stream into fixed-budget shards (the layout tokenizer/loader jobs
consume, cf. Brown et al. 2020 §2.2's shuffled, chunked token
stream).

Semantics:

- **order**: every document gets a universal-hash key
  ``h = ((a·fold(id) + b) mod p)`` (the operators/sampling.py family;
  fold-before-multiply for ANSI int64 safety) and the corpus order is
  ``(h, id)`` — a reproducible shuffle that is partition- and
  cluster-size-invariant, unlike any RNG-seeded sort;
- **position**: ``global_pos`` = exclusive prefix sum of ``n_tokens``
  in that order — the document's first token offset in the
  concatenated stream;
- **shard**: ``shard_id = global_pos div budget`` and
  ``shard_off = global_pos mod budget`` — documents straddle shard
  boundaries exactly as a concatenate-then-chunk tokenizer would
  split them (next-fit packing WITHIN a sequence budget is the
  sibling operators/packing.py; this operator cuts the corpus-level
  stream).

Scale shape (100 TB): the naive plan is one global ordered window —
a single-task total sort that cannot scale. This implements the
textbook DISTRIBUTED PREFIX SUM instead:

1. bucket every row by the top of its hash key
   (``h div ceil(p / n_buckets)`` — contiguous hash ranges, so
   bucket order == global order), and compute per-bucket token
   totals: ONE map-side-partial aggregate, ``n_buckets`` rows out;
2. the exclusive running offset over those ``n_buckets`` totals is a
   driver-side scan of a bounded relation (n_buckets ~ 10⁴ rows for
   any corpus — same boundedness class as the IVF centroid collect),
   re-broadcast as a join relation;
3. the intra-bucket exclusive prefix is a window partitioned BY
   BUCKET — uniform hash ranges mean every partition holds
   ~corpus/n_buckets rows, so there is no global sort, no hot
   partition, and AQE sees an ordinary keyed exchange.

``global_pos = bucket_offset + intra_bucket_prefix`` — pure int64
arithmetic end-to-end, so the DuckDB twin (one ordered window over
the same (h, id) order) hashes bit-for-bit (queries.DOC_SHARDS_SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import P31

# one fixed (a, b) of the universal family — seed namespace 'shuffle',
# distinct from sampling/simhash/gumbel pairs, shared with the DuckDB
# twin by literal value
SHUFFLE_A = 1583458089
SHUFFLE_B = 1629710281
DEFAULT_BUCKETS = 1024


def shuffle_key(key: Column) -> Column:
    """((a·fold(key) + b) mod p) — the document's shuffle-order key.
    Fold to [0, p) before the multiply (ANSI overflow discipline,
    sampling.sample_hash)."""
    k = ((key.cast("long") % F.lit(P31)) + F.lit(P31)) % F.lit(P31)
    return (k * F.lit(SHUFFLE_A) + F.lit(SHUFFLE_B)) % F.lit(P31)


def assign_shards(
    df: DataFrame,
    shard_budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, n_tokens, shuffle_h, global_pos, shard_id, shard_off) for
    every input row: position in the deterministically shuffled
    concatenated token stream and its budget-cut shard. Total over the
    input (zero-token rows occupy a position of width 0)."""
    if shard_budget <= 0:
        raise ValueError(f"shard_budget must be positive, got {shard_budget}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    span = (P31 + n_buckets - 1) // n_buckets  # ceil(p / n_buckets)
    rows = df.select(
        F.col(id_col).alias("_id"),
        F.col(tokens_col).cast("long").alias("_nt"),
        shuffle_key(F.col(id_col)).alias("_h"),
    ).withColumn("_bk", F.expr(f"_h div {span}"))
    # stage 1: per-bucket totals (map-side partial; n_buckets rows out)
    totals = rows.groupBy("_bk").agg(F.sum("_nt").alias("_bt"))
    # stage 2: exclusive running offsets over the BOUNDED totals
    # relation — n_buckets rows, the same boundedness class as the IVF
    # centroid collect; re-shipped to executors as a broadcast join
    bt = sorted((r["_bk"], r["_bt"]) for r in totals.collect())
    offs, acc = [], 0
    for bk, t in bt:
        offs.append((bk, acc))
        acc += t
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(offs, schema="_bk long, _boff long")
    )
    # stage 3: intra-bucket exclusive prefix — window partitioned by
    # bucket (uniform ~corpus/n_buckets rows each; never a global sort)
    w = (
        Window.partitionBy("_bk")
        .orderBy("_h", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = F.col("_boff") + F.sum("_nt").over(w) - F.col("_nt")
    return (
        rows.join(off_df, "_bk")
        .withColumn("global_pos", pos)
        .select(
            F.col("_id").alias(id_col),
            F.col("_nt").alias(tokens_col),
            F.col("_h").alias("shuffle_h"),
            "global_pos",
            # int64 `div`, not double `/`: a 100-TB corpus is ~10^14
            # tokens, past the 2^53 exact-double range
            F.expr(f"global_pos div {int(shard_budget)}").alias("shard_id"),
            (F.col("global_pos") % F.lit(shard_budget)).alias("shard_off"),
        )
    )


def shard_stats(assigned: DataFrame) -> DataFrame:
    """Per-shard layout summary over an assign_shards relation:
    documents whose stream position starts in the shard, their token
    mass, and the first/last start offsets — the loader-manifest
    relation (one map-side-partial aggregate)."""
    return assigned.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("shard_off").alias("first_off"),
        F.max("shard_off").alias("last_off"),
    )
