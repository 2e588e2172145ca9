"""link-rank resumable job (plans/link_rank.py): stage semantics on a
hand-planted graph, optional-seeds behavior, and kill-mid-job resume
producing output identical to an uninterrupted run (the
test_clean_corpus.py pattern over the lineage machinery)."""

import os

import pytest
from pyspark.sql import functions as F  # noqa: F401

from fujishadergpu_spark.plans.link_rank import run_link_rank

# a small directed graph: hub 0 is linked by 1..4; 5<->6 reciprocal;
# 7 isolated source into the hub chain; duplicate + self links planted
# to prove the edges stage normalizes
LINKS = [(1, 0), (2, 0), (3, 0), (4, 0), (5, 6), (6, 5), (7, 1),
         (1, 0), (2, 2)]


@pytest.fixture(scope="module")
def links_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("lr") / "links.parquet")
    spark.createDataFrame(LINKS, "src long, dst long").write.parquet(p)
    return p


@pytest.fixture(scope="module")
def seeds_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("lr") / "seeds.parquet")
    spark.createDataFrame([(7,)], "id long").write.parquet(p)
    return p


def test_stage_semantics(spark, links_path, seeds_path, tmp_path):
    out = str(tmp_path / "job")
    s = run_link_rank(spark, links_path, out, run_id="r1", seeds_path=seeds_path)
    assert set(s) == {"edges", "linkstats", "pagerank", "hits", "seed_distance"}
    edges = {(r["src"], r["dst"]) for r in spark.read.parquet(f"{out}/edges").collect()}
    assert edges == {(1, 0), (2, 0), (3, 0), (4, 0), (5, 6), (6, 5), (7, 1)}
    ls = {r["id"]: r for r in spark.read.parquet(f"{out}/linkstats").collect()}
    assert ls[0]["in_deg"] == 4 and ls[0]["out_deg"] == 0
    assert ls[5]["recip_q6"] == 10**6
    pr = {r["id"]: r["rank_q12"] for r in spark.read.parquet(f"{out}/pagerank").collect()}
    # the hub outranks every page that points at it (the 5<->6
    # reciprocal pair recirculates rank and may legitimately beat a
    # dangling hub — not asserted against)
    assert all(pr[0] > pr[i] for i in (1, 2, 3, 4, 7))
    hs = {r["id"]: r for r in spark.read.parquet(f"{out}/hits").collect()}
    assert hs[0]["auth_q9"] == max(h["auth_q9"] for h in hs.values())
    sd = {r["id"]: r["hops"] for r in spark.read.parquet(f"{out}/seed_distance").collect()}
    assert sd[7] == 0 and sd[1] == 1 and sd[0] == 2 and sd[5] == -1


def test_no_seeds_skips_stage(spark, links_path, tmp_path):
    out = str(tmp_path / "noseeds")
    s = run_link_rank(spark, links_path, out, run_id="r2")
    assert "seed_distance" not in s
    assert not os.path.exists(f"{out}/seed_distance")


def test_kill_midjob_resume_equals_uninterrupted(
    spark, links_path, seeds_path, tmp_path, monkeypatch
):
    import fujishadergpu_spark.plans.link_rank as lr

    golden = str(tmp_path / "golden")
    run_link_rank(spark, links_path, golden, run_id="g", seeds_path=seeds_path)

    out = str(tmp_path / "killed")
    real = lr.hits

    def boom(*a, **kw):
        raise RuntimeError("injected kill before hits")

    monkeypatch.setattr(lr, "hits", boom)
    with pytest.raises(RuntimeError, match="injected kill"):
        run_link_rank(spark, links_path, out, run_id="k1", seeds_path=seeds_path)
    assert os.path.exists(f"{out}/pagerank")
    assert not os.path.exists(f"{out}/hits")

    monkeypatch.setattr(lr, "hits", real)
    s = run_link_rank(spark, links_path, out, run_id="k2", seeds_path=seeds_path)
    for st in ("edges", "linkstats", "pagerank"):
        assert s[st]["skipped"], st
    for st in ("hits", "seed_distance"):
        assert not s[st]["skipped"], st

    for st, cols in (
        ("edges", ["src", "dst"]),
        ("linkstats", ["id", "out_deg", "in_deg", "recip_out", "recip_q6"]),
        ("pagerank", ["id", "out_deg", "rank_q12"]),
        ("hits", ["id", "auth_q9", "hub_q9"]),
        ("seed_distance", ["id", "hops"]),
    ):
        a = {tuple(r) for r in spark.read.parquet(f"{golden}/{st}").select(*cols).collect()}
        b = {tuple(r) for r in spark.read.parquet(f"{out}/{st}").select(*cols).collect()}
        assert a == b, st
