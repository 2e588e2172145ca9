"""soft404 gate: the precision tiers decide exactly as documented —
error title alone, two body markers, one marker + stub body — and
healthy pages (even long ones mentioning '404' once) pass."""

from pyspark.sql import functions as F

from fujishadergpu_spark.functions.soft404 import soft404_signals

LONG_PAD = " long article body " * 60  # > 512 chars

CASES = [
    (1, "Page Not Found", "whatever tiny"),                       # title -> soft404
    (2, "History of HTTP", "error 404" + LONG_PAD + "does not exist"),  # 2 markers
    (3, "Oops", "the page you requested cannot be found"),        # 1... actually 2 markers
    (4, "News", "one mention of error 404 here" + LONG_PAD),      # 1 marker, long -> pass
    (5, "News", "error 404 tiny stub"),                           # 1 marker + tiny -> soft404
    (6, "Fine Article", "perfectly healthy content" + LONG_PAD),  # clean
    (7, None, None),                                              # all NULL -> tiny but no markers
]


def test_tiers(spark):
    df = spark.createDataFrame(CASES, "id long, title string, body string")
    rows = {
        r["id"]: r
        for r in df.select("id", soft404_signals(F.col("title"), F.col("body")).alias("s"))
        .select("id", "s.*")
        .collect()
    }
    assert rows[1]["title_error"] and rows[1]["soft404"]
    assert rows[2]["marker_hits"] == 2 and rows[2]["soft404"]
    assert rows[3]["marker_hits"] == 2 and rows[3]["soft404"]
    assert rows[4]["marker_hits"] == 1 and not rows[4]["tiny_body"] and not rows[4]["soft404"]
    assert rows[5]["marker_hits"] == 1 and rows[5]["tiny_body"] and rows[5]["soft404"]
    assert not rows[6]["soft404"]
    assert rows[7]["tiny_body"] and not rows[7]["soft404"]
