"""Deduplication operators for web-scale training-data pipelines.

Four families, each a distinct scale/recall trade-off:

- exact_dedup: hash-groupBy (one shuffle, exact).
- minhash_lsh_pairs: char-shingle MinHash + banded LSH bucket join →
  exact-Jaccard verification of candidates only. The classic
  Broder/LSH construction; the bucket join is an equi-join Catalyst
  can shuffle-hash, and the verify stage touches candidates only.
- simhash_pairs: 64-bit SimHash + 4x16-bit band join + Hamming
  filter (F.bit_count, JVM-side).
- embedding_near_dup: random-hyperplane sketch bucket join + exact
  cosine verify.

Everything heavy is Arrow pandas UDFs over NumPy matrices; bucket
joins are plain equi-joins (AQE handles skewed buckets — constant
shingles like boilerplate headers create hot bands, the same hot-cell
skew as the spatial side).

Pair outputs are canonicalized (id_a < id_b) and deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

MERSENNE = np.uint64((1 << 61) - 1)


# ----------------------------- exact ---------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text", normalize: bool = True) -> DataFrame:
    """One row per distinct text: (canonical_id = min id, dup_count).

    Map-side partial aggregation makes this a single cheap shuffle on
    the text hash; at 10^12 rows group on xxhash64(text) instead of
    the full text bytes to keep shuffle rows narrow.
    """
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.trim(F.regexp_replace(t, "\\s+", " ")))
    return (
        df.select(F.col(id_col), t.alias("_norm"))
        .groupBy("_norm")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("dup_count"))
        .drop("_norm")
    )


# ------------------------- minhash + LSH ------------------------------

def _shingle_hashes(text: str, width: int) -> np.ndarray:
    """Distinct char-shingle 61-bit hashes (polynomial rolling hash)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < width:
        b = np.pad(b, (0, width - len(b)), constant_values=32)
    n = len(b) - width + 1
    # matrix of sliding windows (n x width) via stride trick
    win = np.lib.stride_tricks.sliding_window_view(b, width)
    base = np.uint64(1000003)
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(width):
            h = h * base + win[:, j]
    return np.unique(h)


def make_minhash_udf(num_hashes: int = 64, shingle: int = 5, seed: int = 42):
    """Series->Series Arrow UDF: text -> array<long> of MinHash values.

    Universal hashing min_j((a_j*h + b_j) mod p) over the shingle set,
    vectorized as one (shingles x num_hashes) matrix min per doc.
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_hashes).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_hashes).astype(np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def minhash_udf(text: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for s in text.fillna(""):
                sh = _shingle_hashes(s, shingle)
                m = (sh[:, None] * a[None, :] + b[None, :]) % MERSENNE
                out.append(m.min(axis=0).astype(np.int64))
        return pd.Series(out)

    return minhash_udf


def _jaccard(a: str, b: str, shingle: int) -> float:
    sa, sb = _shingle_hashes(a, shingle), _shingle_hashes(b, shingle)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    signature -> band buckets -> self-join per band -> exact verify.
    The verify UDF runs only on LSH candidates (a tiny fraction), the
    same candidates-then-refine shape as the PIP join.
    """
    rows_per_band = num_hashes // bands
    mh = make_minhash_udf(num_hashes, shingle, seed)
    sig = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"),
                    mh(F.col(text_col)).alias("_sig"))

    band_cols = [
        F.hash(F.slice(F.col("_sig"), i * rows_per_band + 1, rows_per_band), F.lit(i)).alias("_bh")
        for i in range(bands)
    ]
    banded = sig.select(
        "_id", "_text",
        F.posexplode(F.array(*band_cols)).alias("_band", "_bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bucket") == F.col("r._bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"),
            F.col("l._text").alias("_ta"), F.col("r._text").alias("_tb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    @pandas_udf(DoubleType())
    def jaccard_udf(ta: pd.Series, tb: pd.Series) -> pd.Series:
        return pd.Series([_jaccard(x or "", y or "", shingle) for x, y in zip(ta, tb)])

    return (
        cand.withColumn("jaccard", jaccard_udf("_ta", "_tb"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------ simhash -------------------------------

def make_simhash_udf(seed: int = 42):
    """text -> 64-bit SimHash (sign of summed token-hash bit vectors)."""

    @pandas_udf(LongType())
    def simhash_udf(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        bitw = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        with np.errstate(over="ignore"):
            for i, s in enumerate(text.fillna("")):
                toks = s.lower().split()
                if not toks:
                    continue
                hs = np.zeros(len(toks), dtype=np.uint64)
                for j, t in enumerate(toks):  # token hashing; vector math below
                    hv = np.uint64(14695981039346656037)
                    for ch in t.encode("utf-8"):
                        hv = (hv ^ np.uint64(ch)) * np.uint64(1099511628211)
                    hs[j] = hv
                bits = ((hs[:, None] & bitw[None, :]) != 0).astype(np.int64)
                acc = (2 * bits - 1).sum(axis=0)
                out[i] = np.int64(((acc > 0).astype(np.uint64) * bitw).sum().astype(np.uint64).view(np.int64))
        return pd.Series(out)

    return simhash_udf


def simhash_pairs(df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: 4x16-bit band join then exact
    Hamming filter via F.bit_count (JVM-side)."""
    sim = make_simhash_udf()
    sig = df.select(F.col(id_col).alias("_id"), sim(F.col(text_col)).alias("_sh"))
    bands = sig.select(
        "_id", "_sh",
        F.posexplode(
            F.array(*[F.shiftright(F.col("_sh"), 16 * i).bitwiseAND(F.lit(0xFFFF)) for i in range(4)])
        ).alias("_band", "_key"),
    )
    l, r = bands.alias("l"), bands.alias("r")
    return (
        l.join(
            r,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._key") == F.col("r._key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"),
            F.bit_count(F.col("l._sh").bitwiseXOR(F.col("r._sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


# ----------------------- embedding near-dup ---------------------------

def make_hyperplane_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """embedding -> LSH sketch (sign bits against random hyperplanes)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes))
    bitw = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf(LongType())
    def sketch_udf(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        proj = m.astype(np.float64) @ planes
        return pd.Series(((proj > 0).astype(np.int64) * bitw[None, :]).sum(axis=1))

    return sketch_udf


def embedding_near_dup(
    df: DataFrame, id_col: str, emb_col: str = "embedding",
    dim: int = 64, threshold: float = 0.95, n_planes: int = 16, seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by cosine >= threshold, bucketed by hyperplane
    sketch (exact cosine verified with built-in zip_with/aggregate —
    JVM-side, no UDF in the verify)."""
    sk = make_hyperplane_udf(dim, n_planes, seed)
    sig = df.select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"),
                    sk(F.col(emb_col)).alias("_sk"))
    l, r = sig.alias("l"), sig.alias("r")
    dot = F.aggregate(
        F.zip_with("l._emb", "r._emb", lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(f"{side}._emb", lambda v: v * v), F.lit(0.0), lambda a, v: a + v)
    )
    return (
        l.join(r, (F.col("l._sk") == F.col("r._sk")) & (F.col("l._id") < F.col("r._id")))
        .withColumn("cosine", dot / (norm("l") * norm("r")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"), "cosine")
    )
