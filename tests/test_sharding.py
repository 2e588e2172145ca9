"""Deterministic shuffle + shard assignment (operators/sharding):
the distributed prefix sum must equal the single-window ground truth
exactly, on any layout and any bucket count, including zero-token and
negative-id rows."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.sharding import (
    assign_shards,
    shard_stats,
    shuffle_key,
)

SF = "/root/testdata/sf0.01"


def _fixture(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.size(F.filter(F.split("text", " +"), lambda t: t != "")).cast("long").alias(
                "n_tokens"
            ),
        )
    )


def _ground_truth(rows, budget):
    """Driver-side oracle: one sorted scan over (h, id)."""
    order = sorted(rows, key=lambda r: (r["shuffle_h"], r["doc_id"]))
    acc, out = 0, {}
    for r in order:
        out[r["doc_id"]] = (acc, acc // budget, acc % budget)
        acc += r["n_tokens"]
    return out


def test_prefix_sum_matches_single_scan_ground_truth(spark):
    got = assign_shards(_fixture(spark), 2048, n_buckets=64).collect()
    want = _ground_truth(got, 2048)
    for r in got:
        assert (r["global_pos"], r["shard_id"], r["shard_off"]) == want[r["doc_id"]], r
    assert len(got) == 500  # total over the input


def test_bucket_count_and_layout_invariance(spark):
    d = _fixture(spark)

    def key(df):
        return sorted(
            (r["doc_id"], r["global_pos"], r["shard_id"]) for r in df.collect()
        )

    a = key(assign_shards(d, 1000, n_buckets=4))
    b = key(assign_shards(d, 1000, n_buckets=257))
    c = key(assign_shards(d.repartition(13, "doc_id"), 1000, n_buckets=64))
    assert a == b == c


def test_zero_token_and_negative_id_rows(spark):
    d = spark.createDataFrame(
        [(-5, 0), (-1, 7), (0, 0), (3, 7), (9, 2)], "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: r for r in assign_shards(d, 10, n_buckets=3).collect()}
    assert len(got) == 5  # zero-token rows keep a (width-0) position
    want = _ground_truth(list(got.values()), 10)
    for i, r in got.items():
        assert r["shuffle_h"] >= 0  # negative ids fold into [0, p)
        assert (r["global_pos"], r["shard_id"], r["shard_off"]) == want[i]


def test_shard_stats_manifest(spark):
    a = assign_shards(_fixture(spark), 2048, n_buckets=64)
    st = {r["shard_id"]: r for r in shard_stats(a).collect()}
    total = a.agg(F.sum("n_tokens")).collect()[0][0]
    # every shard except the last starts-docs covering its budget span
    assert sum(r["n_docs"] for r in st.values()) == 500
    assert sum(r["n_tokens"] for r in st.values()) == total
    for sid, r in st.items():
        assert 0 <= r["first_off"] <= r["last_off"] < 2048


def test_order_is_a_real_shuffle(spark):
    # the hash order must not be the id order (that would be no
    # shuffle at all): at least 40% of adjacent-id pairs invert
    d = _fixture(spark)
    rows = d.select("doc_id", shuffle_key(F.col("doc_id")).alias("h")).collect()
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    inversions = sum(
        1 for x, y in zip(by_id, by_id[1:]) if x["h"] > y["h"]
    )
    assert inversions > 0.4 * (len(by_id) - 1)


def test_rejects_bad_params(spark):
    d = _fixture(spark)
    with pytest.raises(ValueError):
        assign_shards(d, 0)
    with pytest.raises(ValueError):
        assign_shards(d, 100, n_buckets=0)
