"""html_meta gate: title/canonical/robots extract across attribute
orders, case, and multiline heads; absent tags -> NULL with indexable
defaults; flags are token substring tests."""

from pyspark.sql import functions as F

from fujishadergpu_spark.functions.htmlmeta import html_meta

PAGES = [
    (1, '<html><head><TITLE>Hello</TITLE>'
        '<link rel="canonical" href="http://ex.com/a">'
        '<meta name="robots" content="noindex, nofollow"></head></html>'),
    (2, '<head>\n<title>\nMulti\nline</title>\n'
        '<link href="http://ex.com/b" rel="canonical">\n'           # flipped order
        '<meta content="NOFOLLOW" name="robots">\n</head>'),        # flipped + caps
    (3, "<html><body>no head metadata at all</body></html>"),
    (4, '<meta name="robots" content="index, follow"><title></title>'),
]


def test_extraction(spark):
    df = spark.createDataFrame(PAGES, "id long, html string")
    rows = {
        r["id"]: r
        for r in df.select("id", html_meta(F.col("html")).alias("m"))
        .select("id", "m.*")
        .collect()
    }
    assert rows[1]["title"] == "Hello"
    assert rows[1]["canonical"] == "http://ex.com/a"
    assert rows[1]["noindex"] is True and rows[1]["nofollow"] is True
    assert rows[2]["title"] == "\nMulti\nline"
    assert rows[2]["canonical"] == "http://ex.com/b"
    assert rows[2]["noindex"] is False and rows[2]["nofollow"] is True
    assert rows[3]["title"] is None and rows[3]["canonical"] is None
    assert rows[3]["noindex"] is False and rows[3]["nofollow"] is False
    assert rows[4]["title"] is None          # empty title -> NULL
    assert rows[4]["noindex"] is False and rows[4]["nofollow"] is False


def test_meta_refresh(spark):
    from fujishadergpu_spark.functions.htmlmeta import html_meta_refresh

    cases = [
        (1, '<meta http-equiv="refresh" content="0; url=http://ex.com/next">'),
        (2, '<META CONTENT="5;url=/relative/path" HTTP-EQUIV="refresh">'),  # flipped + caps
        (3, '<meta http-equiv="refresh" content="30">'),   # bare reload: not a redirect
        (4, "<p>no meta at all</p>"),
    ]
    df = spark.createDataFrame(cases, "id long, html string")
    got = {
        r["id"]: r["u"]
        for r in df.select("id", html_meta_refresh(F.col("html")).alias("u")).collect()
    }
    assert got[1] == "http://ex.com/next"
    assert got[2] == "/relative/path"
    assert got[3] is None and got[4] is None
