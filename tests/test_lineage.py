"""Lineage + idempotent-resume tests (FIXTURES.md §5: kill mid-run,
rerun, outputs equal golden, each partition processed exactly once)."""

from pyspark.sql import functions as F

from fujishadergpu_spark.plans.lineage import LineageLog, run_stage_idempotent


def _mkdf(spark):
    return spark.range(1000).select(
        "id", F.pmod("id", F.lit(10)).alias("bucket"), (F.col("id") * 2).alias("v")
    )


def test_stage_then_resume_noop(spark, tmp_path):
    df = _mkdf(spark)
    lin = LineageLog(spark, str(tmp_path / "lineage"))
    out = str(tmp_path / "out")
    s1 = run_stage_idempotent(spark, df, "bucket", out, lin, "stage1", run_id="r1")
    assert s1["keys_processed"] == 10
    assert spark.read.parquet(out).count() == 1000
    # second run: everything already done
    s2 = run_stage_idempotent(spark, df, "bucket", out, lin, "stage1", run_id="r2")
    assert s2["skipped"] and s2["keys_processed"] == 0
    # lineage holds exactly one ok row per key
    counts = lin.read().groupBy("partition_key").count().collect()
    assert len(counts) == 10 and all(r["count"] == 1 for r in counts)


def test_crash_resume_completes(spark, tmp_path):
    """Simulated crash: first run only saw half the keys (fault
    injection by filtering); resume processes exactly the rest."""
    df = _mkdf(spark)
    lin = LineageLog(spark, str(tmp_path / "lineage"))
    out = str(tmp_path / "out")
    run_stage_idempotent(spark, df.filter("bucket < 5"), "bucket", out, lin, "s", run_id="r1")
    s2 = run_stage_idempotent(spark, df, "bucket", out, lin, "s", run_id="r2")
    assert s2["keys_processed"] == 5
    final = spark.read.parquet(out)
    assert final.count() == 1000
    # partition-column type inference may read _pk back as int
    assert {str(r["_pk"]) for r in final.select("_pk").distinct().collect()} == {str(i) for i in range(10)}
    # exactly-once per partition in the lineage log
    per_key = lin.read().filter("status='ok'").groupBy("partition_key").count().collect()
    assert all(r["count"] == 1 for r in per_key)


def test_upstream_executes_exactly_once(spark, tmp_path):
    """The round-1 shape pre-counted pending keys and then wrote,
    executing every upstream stage twice; now the only full execution
    is the write itself (metrics come from the readback)."""
    from pyspark.sql.functions import udf

    acc = spark.sparkContext.accumulator(0)

    @udf("long")
    def tick(x):
        acc.add(1)
        return x

    df = _mkdf(spark).withColumn("ticked", tick("v"))
    lin = LineageLog(spark, str(tmp_path / "lineage"))
    run_stage_idempotent(spark, df, "bucket", str(tmp_path / "out"), lin, "s", run_id="r1")
    assert acc.value == 1000, f"upstream ran {acc.value / 1000:.1f}x"


def test_audit_stage_flags_tampered_partition(spark, tmp_path):
    """A20: the post-write audit compares on-disk row counts against
    the lineage log and flags truncated / orphaned partitions."""
    import shutil

    from fujishadergpu_spark.plans.lineage import audit_stage

    df = _mkdf(spark)
    lin = LineageLog(spark, str(tmp_path / "lineage"))
    out = str(tmp_path / "out")
    run_stage_idempotent(spark, df, "bucket", out, lin, "s", run_id="r1")
    audit = {r["partition_key"]: r["audit_status"] for r in audit_stage(spark, out, lin, "s").collect()}
    assert set(audit.values()) == {"ok"} and len(audit) == 10
    # truncate one partition behind the log's back
    shutil.rmtree(f"{out}/_pk=3")
    audit2 = {r["partition_key"]: r["audit_status"] for r in audit_stage(spark, out, lin, "s").collect()}
    assert audit2["3"] == "missing_on_disk"
    assert all(v == "ok" for k, v in audit2.items() if k != "3")


def test_partial_partition_overwritten(spark, tmp_path):
    """A key written but never logged (crash between write and log)
    is re-processed and the partition replaced, not duplicated."""
    df = _mkdf(spark)
    lin = LineageLog(spark, str(tmp_path / "lineage"))
    out = str(tmp_path / "out")
    # simulate the torn state: partition files exist, lineage empty
    (
        df.filter("bucket = 3").withColumn("_pk", F.col("bucket").cast("string"))
        .write.mode("overwrite").partitionBy("_pk").parquet(out)
    )
    run_stage_idempotent(spark, df, "bucket", out, lin, "s", run_id="r1")
    final = spark.read.parquet(out)
    assert final.count() == 1000  # bucket 3 not duplicated


def test_iceberg_commit_path_or_documented_blocker(spark, tmp_path):
    """r3 verdict #3: run_stage_idempotent grows a real
    DataFrameWriterV2 branch (createOrReplace / overwritePartitions —
    atomic snapshot commits on Iceberg). The sandbox ships no
    iceberg-spark-runtime jar and has no network (PLANS.md §Iceberg),
    so: with Iceberg absent the branch must fail LOUDLY with the
    documented pointer (never fall back silently to parquet); with an
    Iceberg-enabled session it must pass the same resume contract."""
    import pytest

    from fujishadergpu_spark.plans.lineage import (
        LineageLog,
        iceberg_available,
        run_stage_idempotent,
    )

    lineage = LineageLog(spark, str(tmp_path / "_lineage"))
    df = spark.range(10).selectExpr("id", "CAST(id % 2 AS INT) AS bucket")
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="PLANS.md"):
            run_stage_idempotent(
                spark, df, "bucket", str(tmp_path / "out"), lineage, "s",
                catalog_table="local.db.t",
            )
        pytest.skip("iceberg-spark-runtime not on classpath in this sandbox (documented)")
    s1 = run_stage_idempotent(spark, df, "bucket", "", lineage, "s", catalog_table="local.db.t")
    assert s1["keys_processed"] == 2
    s2 = run_stage_idempotent(spark, df, "bucket", "", lineage, "s", catalog_table="local.db.t")
    assert s2["skipped"]
