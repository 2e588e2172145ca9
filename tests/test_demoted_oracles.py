"""Past-window oracle rot guard (r4 ADVICE #5): every ORACLES entry
demoted past the driver's 50-entry registry window is still run
Spark-vs-DuckDB on every routine test pass, so a demoted oracle can
never silently rot between the occasional full tools/check_oracles.py
runs. Runs at sf0.001 (the smallest fixture) to stay cheap; the full
sf0.01 gate replica remains tools/check_oracles.py."""

import os
import sys

import duckdb
import pytest

from fujishadergpu_spark.queries import ORACLES, QUERIES

# the gate replica OWNS the normalization/hash contract — import it,
# never copy it, so this guard and the replica cannot drift
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from check_oracles import frame_hash as _frame_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

DEMOTED = [n for i, n in enumerate(QUERIES) if i >= 50 and n in ORACLES]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_demoted_set_is_nonempty_and_known():
    # the guard must actually be guarding something; a new demoted
    # oracle joins DEMOTED automatically by position
    assert len(DEMOTED) >= 8, DEMOTED


@pytest.mark.parametrize("name", DEMOTED)
def test_demoted_oracle_matches(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck.execute(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), name
    sh, sn = _frame_hash(sdf)
    oh, on = _frame_hash(odf)
    assert (sn, sh) == (on, oh), f"{name}: spark {sn} rows [{sh}] vs duckdb {on} rows [{oh}]"
