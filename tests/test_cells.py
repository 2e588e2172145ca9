"""Cell-index unit tests — analytic fixtures, NumPy/column parity
(the reference's backend-parity pattern,
reference tests/test_registry_cli_sync.py:10-30)."""

import numpy as np
from pyspark.sql import functions as F

from fujishadergpu_spark.functions import cells


def test_np_cell_roundtrip():
    rng = np.random.RandomState(42)
    lat = rng.uniform(-89, 89, 1000)
    lon = rng.uniform(-180, 180, 1000)
    for res in (0, 3, 7, 15, 28):
        cid = cells.np_cell(lat, lon, res)
        r, x, y = cells.np_cell_decode(cid)
        assert (r == res).all()
        n = 1 << res
        assert (x >= 0).all() and (x < n).all()
        assert (y >= 0).all() and (y < n).all()
        # center of decoded cell is within half a cell of the point
        dlon, dlat = cells.cell_size_deg(res)
        clon = (x + 0.5) / n * 360.0 - 180.0
        clat = (y + 0.5) / n * 180.0 - 90.0
        assert (np.abs(clat - lat) <= dlat / 2 + 1e-9).all()
        assert (np.abs(clon - lon) <= dlon / 2 + 1e-9).all()


def test_parent_child_consistency():
    rng = np.random.RandomState(1)
    cid = cells.np_cell(rng.uniform(-89, 89, 500), rng.uniform(-180, 180, 500), 9)
    par = cells.np_parent(cid)
    r, x, y = cells.np_cell_decode(par)
    assert (r == 8).all()
    r9, x9, y9 = cells.np_cell_decode(cid)
    assert (x == x9 >> 1).all() and (y == y9 >> 1).all()


def test_grid_disk_numpy():
    cid = cells.np_cell(np.array([10.0]), np.array([20.0]), 7)
    disk = cells.np_grid_disk(cid, 2)
    assert disk.shape == (1, 25)
    valid = disk[disk >= 0]
    assert len(np.unique(valid)) == 25
    r, x, y = cells.np_cell_decode(valid)
    r0, x0, y0 = cells.np_cell_decode(cid)
    assert (np.abs(x - x0[0]) <= 2).all() and (np.abs(y - y0[0]) <= 2).all()


def test_grid_disk_lon_wrap():
    """Cell at the antimeridian wraps x rather than clamping."""
    cid = cells.np_cell(np.array([0.0]), np.array([-179.999]), 7)
    disk = cells.np_grid_disk(cid, 1)
    valid = disk[disk >= 0]
    assert len(valid) == 9
    _, x, _ = cells.np_cell_decode(valid)
    assert (x == (1 << 7) - 1).sum() == 3  # wrapped column present


def test_column_expr_matches_numpy(spark):
    df = spark.range(2000).select(
        ((F.pmod(F.xxhash64("id", F.lit("a")), F.lit(170000)).cast("double") / 1000.0) - 85.0).alias("lat"),
        ((F.pmod(F.xxhash64("id", F.lit("b")), F.lit(360000)).cast("double") / 1000.0) - 180.0).alias("lon"),
    )
    for res in (3, 7, 12):
        got = df.select("lat", "lon", cells.cell_of(F.col("lat"), F.col("lon"), res).alias("c")).toPandas()
        exp = cells.np_cell(got["lat"].to_numpy(), got["lon"].to_numpy(), res)
        assert (got["c"].to_numpy() == exp).all()
        # pandas-UDF path agrees too
        udf = cells.make_cell_udf(res)
        got2 = df.select(udf("lat", "lon").alias("c")).toPandas()
        assert (got2["c"].to_numpy() == exp).all()


def test_grid_disk_column_matches_numpy(spark):
    df = spark.range(300).select(
        ((F.pmod(F.xxhash64("id", F.lit("a")), F.lit(170000)).cast("double") / 1000.0) - 85.0).alias("lat"),
        ((F.pmod(F.xxhash64("id", F.lit("b")), F.lit(360000)).cast("double") / 1000.0) - 180.0).alias("lon"),
    )
    res, k = 7, 2
    got = df.select(
        cells.cell_of(F.col("lat"), F.col("lon"), res).alias("c"),
        F.array_sort(cells.grid_disk(cells.cell_of(F.col("lat"), F.col("lon"), res), k, res)).alias("d"),
    ).toPandas()
    exp = cells.np_grid_disk(got["c"].to_numpy(), k)
    for i in range(len(got)):
        e = np.unique(exp[i][exp[i] >= 0])
        assert list(got["d"][i]) == sorted(e.tolist())


def test_cell_of_sql_twin(spark):
    """The ANSI-SQL string form evaluates identically in Spark AND in
    DuckDB (the oracle contract)."""
    import duckdb
    import pandas as pd

    rng = np.random.RandomState(7)
    pdf = pd.DataFrame({"lat": rng.uniform(-85, 85, 500), "lon": rng.uniform(-180, 180, 500)})
    expr = cells.cell_of_sql("lat", "lon", 7)
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("pts_sqltwin")
    got_spark = [r[0] for r in spark.sql(f"SELECT {expr} AS c FROM pts_sqltwin ORDER BY lat, lon").collect()]
    got_duck = [r[0] for r in duckdb.sql(f"SELECT {expr} AS c FROM pdf ORDER BY lat, lon").fetchall()]
    exp = cells.np_cell(
        pdf.sort_values(["lat", "lon"])["lat"].to_numpy(),
        pdf.sort_values(["lat", "lon"])["lon"].to_numpy(),
        7,
    )
    assert got_spark == got_duck == exp.tolist()
