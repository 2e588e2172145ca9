"""Bucketed-layout invariants: a table bucketed on the key runs
key-driven aggregations and self-joins with zero Exchange, and the
results equal the unbucketed plan's."""

from pyspark.sql import functions as F

from fujishadergpu_spark.plans.bucketing import read_bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


def _exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    write_bucketed(ev, "ev_bkt", str(tmp_path / "ev_bkt"), "user_id", buckets=8, sort_col="user_id")
    bkt = read_bucketed(spark, "ev_bkt")

    def per_user(df):
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("s")
        )

    plain = per_user(ev)
    bucketed = per_user(bkt)
    assert _exchanges(plain) >= 1  # the shuffle the layout removes
    assert _exchanges(bucketed) == 0  # co-located: no Exchange at all
    a = {r["user_id"]: r["n"] for r in plain.collect()}
    b = {r["user_id"]: r["n"] for r in bucketed.collect()}
    assert a == b


def test_bucketed_session_stats_no_exchange(spark, tmp_path):
    """Grouping on (session_window, user_id) is satisfied by the
    user_id bucket layout (partitioning on a subset of the group keys
    clusters the full key) — the sessionization pipeline reruns with
    zero shuffle over a bucketed events table."""
    from fujishadergpu_spark.streaming.events import session_stats

    ev = spark.read.parquet(f"{SF}/events.parquet")
    write_bucketed(ev, "ev_bkt2", str(tmp_path / "ev_bkt2"), "user_id", buckets=8)
    bkt = read_bucketed(spark, "ev_bkt2")
    s = session_stats(bkt)
    assert _exchanges(s) == 0
    exp = session_stats(ev)
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, exp.collect()))


def test_bucketed_self_join_no_exchange(spark, tmp_path):
    """Equi-join of two tables bucketed on the same key with the same
    bucket count: both shuffle-free (the co-located-join contract)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    write_bucketed(ev, "ev_a", str(tmp_path / "a"), "user_id", buckets=8, sort_col="user_id")
    write_bucketed(
        ev.groupBy("user_id").agg(F.count("*").alias("n")),
        "ev_b", str(tmp_path / "b"), "user_id", buckets=8, sort_col="user_id",
    )
    a, b = read_bucketed(spark, "ev_a"), read_bucketed(spark, "ev_b")
    # disable broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "user_id")
        assert _exchanges(j) == 0
        assert j.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
