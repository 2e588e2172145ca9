"""Local replica of the driver's correctness gate: run every
queries() entry on Spark at sf0.01 and its oracle_sql() twin on
DuckDB, compare row count + column names + order-insensitive value
hash. Usage: python tools/check_oracles.py [name ...]"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fujishadergpu_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(pdf: pd.DataFrame):
    pdf = pdf[sorted(pdf.columns)]
    rows = ["|".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return h, len(rows)


def main():
    import __spark_entry__ as se

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = se.queries()
    oracles = se.oracle_sql()
    only = set(sys.argv[1:])
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sh, sn = frame_hash(sdf)
        oh, on = frame_hash(odf)
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        status = "OK  " if (sh == oh and sn == on and cols_ok) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(f"{status}  {name}: spark {sn} rows [{sh}] vs duckdb {on} rows [{oh}] cols_ok={cols_ok}")
        if status == "FAIL" and sn == on and cols_ok:
            merged = sdf[sorted(sdf.columns)].round(9) if not sdf.empty else sdf
            om = odf[sorted(odf.columns)].round(9) if not odf.empty else odf
            sa = sorted("|".join(norm_cell(v) for v in r) for r in merged.itertuples(index=False, name=None))
            ob = sorted("|".join(norm_cell(v) for v in r) for r in om.itertuples(index=False, name=None))
            diffs = [(a, b) for a, b in zip(sa, ob) if a != b][:3]
            for a, b in diffs:
                print(f"        spark: {a}\n        duck : {b}")
    spark.stop()
    print("FAILURES:", n_fail)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
