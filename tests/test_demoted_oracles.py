"""Past-window oracle rot guard (r4 ADVICE #5): every ORACLES entry
demoted past the driver's 50-entry registry window is still run
Spark-vs-DuckDB on every routine test pass, so a demoted oracle can
never silently rot between the occasional full tools/check_oracles.py
runs. Runs at sf0.001 (the smallest fixture) to stay cheap; the full
sf0.01 gate replica remains tools/check_oracles.py."""

import hashlib

import duckdb
import pandas as pd
import pytest

from fujishadergpu_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

DEMOTED = [n for i, n in enumerate(QUERIES) if i >= 50 and n in ORACLES]


def _norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _frame_hash(pdf: pd.DataFrame):
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        "|".join(_norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16], len(rows)


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
