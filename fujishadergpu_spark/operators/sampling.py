"""Deterministic stratified sampling — the data-mixing stage of a
training-data pipeline (down/up-weight languages, domains, or quality
buckets to target ratios before tokenization).

Spark's own ``df.sampleBy`` draws per-row Bernoulli from a seeded RNG
whose stream depends on partitioning — re-running after a repartition
(or on a different cluster size) selects a DIFFERENT subset, which is
poison for reproducible training corpora. This sampler instead keys
every decision on a UNIVERSAL HASH of a stable row key:

    keep(row)  <=>  ((a * key + b) mod p) mod D  <  rate(stratum) * D

with p = 2^31-1 and literal (a, b) from the shared
``dedup.simhash_bit_params`` family convention. Properties that
matter at 100 TB:

- **partition-invariant + cluster-size-invariant**: the decision is a
  pure column expression over the row itself — same subset on any
  layout, any executor count, any re-run (the reproducibility
  contract ``sampleBy`` cannot give);
- **nested**: rate 0.2 selects a subset of rate 0.5 (same hash, lower
  threshold) — shrinking a mix never churns the retained set;
- **JVM codegen end-to-end**: one integer multiply-add-mod per row,
  no RNG state, no Python;
- **cross-engine**: the identical arithmetic runs in DuckDB, so the
  EXACT selected id set is hash-oracled (queries.STRATIFIED_SAMPLE_SQL)
  — not just its approximate size.

The key must be an integer column (synthetic doc ids here; for url
keys hash to a long first — then the oracle needs an integer-keyed
projection, cf. the poly31 discipline in operators/dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P31 = (1 << 31) - 1
# one fixed (a, b) pair of the universal family — distinct from every
# simhash bit pair (seed namespace 'sampling'), shared with the DuckDB
# twin by literal value
SAMPLE_A = 1103515245
SAMPLE_B = 12345
DENOM = 1_000_000  # rate resolution: 1e-6


def sample_hash(key: Column) -> Column:
    """((a·key + b) mod p) mod DENOM in [0, DENOM) — the per-row draw.

    The key is folded to [0, p) BEFORE the multiply: a raw
    full-range long times a 2^30-scale multiplier overflows int64 (a
    hard ARITHMETIC_OVERFLOW under ANSI mode, which is Spark 4's
    default) — reduced first, every intermediate stays < 2^62, and
    (k mod p)·a ≡ k·a (mod p) so the draw is unchanged for small
    keys. Spark/DuckDB `%` keep the dividend sign, hence the +p fold
    for negative keys."""
    k = ((key.cast("long") % F.lit(P31)) + F.lit(P31)) % F.lit(P31)
    return ((k * F.lit(SAMPLE_A) + F.lit(SAMPLE_B)) % F.lit(P31)) % F.lit(DENOM)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s with probability rates[s] (strata
    absent from ``rates`` keep default_rate), deterministically in the
    row key. Returns df's rows unchanged (filter only).

    The rates table is tiny and becomes a literal CASE chain — no
    join, no broadcast, nothing to shuffle; the filter sits directly
    on the scan and Catalyst pushes it down.
    """
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thresh = F.lit(int(round(default_rate * DENOM)))
    for s, r in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == s, F.lit(int(round(r * DENOM)))).otherwise(thresh)
    return df.filter(sample_hash(F.col(key_col)) < thresh)


def mixture_thresholds(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    targets: dict[str, float],
    token_budget: int,
) -> dict[str, int]:
    """Per-stratum keep thresholds (DENOM units) that steer the
    corpus toward a target token mixture under a budget — the
    data-mixing allocation step (the mixture weights of Gopher /
    The Pile recipes, computed rather than hand-tuned):

        thr_s = min(DENOM, rhalf(((budget·share_s) / T_s) · DENOM))

    with T_s the stratum's token mass. ONE tiny aggregate (bounded by
    the number of strata — languages/domains, never corpus-sized) is
    collected; the float chain per stratum is mirrored literally by
    the DuckDB twin (queries.DOC_MIXTURE_SQL), rounding half-away
    (Python round() is banker's — the classifier._rhalf discipline).
    Oversubscribed strata (T_s < budget·share_s) clamp to keep-all;
    strata missing from ``targets`` get 0."""
    from .classifier import _rhalf

    for s, share in targets.items():
        if share < 0:
            raise ValueError(f"share for stratum {s!r} must be >= 0, got {share}")
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    totals = (
        df.groupBy(strata_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("_ts"))
        .collect()
    )
    out = {}
    for r in totals:
        share = targets.get(r[strata_col], 0.0)
        ts = r["_ts"] or 0
        if ts > 0 and share > 0:
            out[r[strata_col]] = min(
                DENOM, _rhalf(((token_budget * share) / ts) * float(DENOM))
            )
        else:
            out[r[strata_col]] = 0
    return out


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    targets: dict[str, float],
    token_budget: int,
    key_col: str,
) -> DataFrame:
    """Deterministically sample toward the target token mixture:
    computed thresholds (mixture_thresholds) become a literal CASE
    chain over the stratified_sample draw — no join, pushed to the
    scan, partition/cluster-size invariant, nested in the budget
    (a smaller budget selects a subset of a larger one)."""
    thrs = mixture_thresholds(df, strata_col, token_col, targets, token_budget)
    thresh = F.lit(0)
    for s, t in sorted(thrs.items()):
        thresh = F.when(F.col(strata_col) == s, F.lit(t)).otherwise(thresh)
    return df.filter(sample_hash(F.col(key_col)) < thresh)


def epoch_replicate(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 1.0,
    max_weight: float = 100.0,
) -> DataFrame:
    """Deterministic epoch-weighted replication — the UPSAMPLING half
    of data mixing (Gopher/Llama-style recipes repeat high-quality
    sources for fractional epochs, e.g. Wikipedia x2.4, while a crawl
    runs x0.5): a stratum of weight w emits floor(w) copies of every
    row plus ONE extra copy of the rows whose universal-hash draw
    lands below frac(w) — expected multiplicity exactly w, decided
    per row by the same partition/cluster-size-invariant draw as
    stratified_sample (w < 1 degenerates to it). Appends an ``epoch``
    column (0-based copy index); rows with zero copies disappear.

    100-TB shape: the copy count is a literal CASE chain over the
    stratum plus one multiply-add-mod draw, and the replication is a
    sequence() explode — whole-stage codegen, zero shuffle, zero
    joins; downstream shuffles see the replicated stream exactly as
    if the corpus were physically bigger. Keep weights sane: the
    explode multiplies every downstream byte by w (max_weight guards
    a fat-fingered 1000-epoch recipe).
    """
    for s, w in {**weights, None: default_weight}.items():
        if not (0.0 <= w <= max_weight):
            raise ValueError(
                f"epoch weight for stratum {s!r} must be in [0, {max_weight}], got {w}"
            )
    base = F.lit(int(default_weight))
    frac = F.lit(int(round((default_weight - int(default_weight)) * DENOM)))
    for s, w in sorted(weights.items()):
        base = F.when(F.col(strata_col) == s, F.lit(int(w))).otherwise(base)
        frac = F.when(
            F.col(strata_col) == s, F.lit(int(round((w - int(w)) * DENOM)))
        ).otherwise(frac)
    n = base + F.when(sample_hash(F.col(key_col)) < frac, F.lit(1)).otherwise(F.lit(0))
    copies = F.when(n > 0, F.sequence(F.lit(0), (n - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch", F.explode(copies))


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Leakage-safe deterministic train/valid/test split: every row
    gets a ``split`` label with probability proportional to
    ``weights``, decided by the universal-hash draw of ``group_col``
    (or ``key_col`` when no group is given) — so ALL rows of a group
    (a domain, a url host, a dedup cluster) land in the SAME split.
    Splitting by row with near-duplicate documents across splits is
    the classic eval-leak; hashing the group key makes the boundary
    follow the correlation structure instead of cutting through it.

    Deterministic, partition/cluster-size invariant, and STABLE under
    corpus growth: a group's split never changes when other groups
    arrive, because the draw depends only on the group key (the
    stratified_sample nesting property, applied to split boundaries:
    re-weighting train 0.90->0.95 only MOVES groups whose draw falls
    in the transferred band). Pure column expressions — the label is
    a literal CASE chain over one multiply-add-mod, no shuffle.
    """
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative and non-empty: {weights}")
    tot = sum(weights.values())
    if tot <= 0:
        raise ValueError("weights must sum to a positive mass")
    col = group_col if group_col else key_col
    # string group keys (domains, hosts) fold to an integer via the
    # cross-engine poly31 hash (dedup.poly31_hash contract); integer
    # keys draw directly
    if dict(df.dtypes).get(col) == "string":
        from .dedup import poly31_hash

        draw = sample_hash(poly31_hash(F.col(col)))
    else:
        draw = sample_hash(F.col(col))
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, wgt in items[:-1]:
        acc += wgt / tot
        cond = draw < F.lit(int(round(acc * DENOM)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def unimax_allocation(
    counts: dict[str, int], token_budget: int, max_epochs: int = 1
) -> dict[str, int]:
    """UniMax budget waterfilling (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining") over per-stratum token counts, in EXACT INTEGER
    arithmetic so the DuckDB twin (queries.DOC_UNIMAX_SQL) reproduces
    every allocation bit-for-bit:

    - each stratum's cap is e_s = c_s * max_epochs tokens;
    - strata are processed in ascending (e_s, name) order; while the
      current stratum's cap fits within an equal share of the
      remaining budget (e_s * remaining_strata <= remaining_budget)
      it is allocated its full cap;
    - the first stratum that does NOT fit stops the cap regime: the
      remaining budget is split equally among all remaining strata
      (floor division), with the integer remainder distributed one
      token each to the first (budget % n) of them in name order.

    Head languages are throttled to the fair share, tail languages
    never exceed max_epochs — the published fairness contract.
    Returns {stratum: allocated_tokens}.
    """
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    order = sorted(counts.items(), key=lambda kv: (kv[1] * max_epochs, kv[0]))
    alloc: dict[str, int] = {}
    remaining = token_budget
    m = len(order)
    for i, (name, c) in enumerate(order):
        e = c * max_epochs
        rest = m - i
        if e * rest <= remaining:
            alloc[name] = e
            remaining -= e
        else:
            share, extra = divmod(remaining, rest)
            uncapped = sorted(n for n, _ in order[i:])
            for j, n in enumerate(uncapped):
                alloc[n] = share + (1 if j < extra else 0)
            return alloc
    return alloc


def unimax_thresholds(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    token_budget: int,
    max_epochs: int = 1,
) -> dict[str, int]:
    """Per-stratum keep thresholds (DENOM units) from the UniMax
    allocation: thr_s = min(DENOM, rhalf((a_s / c_s) * DENOM)).
    ONE tiny aggregate (bounded by the stratum count — languages,
    never corpus-sized) is collected; the float chain is one IEEE754
    division + multiply + round, all correctly-rounded ops, so the
    DuckDB twin agrees exactly. Allocations above one epoch clamp to
    keep-all here — the >1-epoch remainder is epoch_replicate's job
    (the published UniMax mixes by repeating tail languages; compose
    the two operators for that)."""
    from .classifier import _rhalf

    totals = (
        df.groupBy(strata_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("_ts"))
        .collect()
    )
    counts = {r[strata_col]: int(r["_ts"] or 0) for r in totals}
    alloc = unimax_allocation(
        {k: v for k, v in counts.items() if v > 0}, token_budget, max_epochs
    )
    out = {}
    for s, c in counts.items():
        a = alloc.get(s, 0)
        out[s] = min(DENOM, _rhalf((a / c) * float(DENOM))) if c > 0 else 0
    return out


def unimax_sample(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    token_budget: int,
    key_col: str,
    max_epochs: int = 1,
) -> DataFrame:
    """Deterministically sample toward the UniMax allocation: the
    computed thresholds become a literal CASE chain over the
    stratified_sample draw — no join, pushed to the scan,
    partition/cluster-size invariant, nested in the budget."""
    thrs = unimax_thresholds(df, strata_col, token_col, token_budget, max_epochs)
    thresh = F.lit(0)
    for s, t in sorted(thrs.items()):
        thresh = F.when(F.col(strata_col) == s, F.lit(t)).otherwise(thresh)
    return df.filter(sample_hash(F.col(key_col)) < thresh)
