"""CCNet dedup-key normalization (functions/textnorm.py): each fold
class fires, the tables stay aligned, and the dedup verdict groups
trivially-differing copies."""

import unicodedata

from pyspark.sql import functions as F

from fujishadergpu_spark.functions import textnorm as tn


def _norm(spark, s):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(tn.normalize_for_dedup(F.col("t")).alias("k")).first()["k"]


def test_fold_classes(spark):
    assert _norm(spark, "Hello  WORLD") == "hello world"
    assert _norm(spark, "Page 17 of 240") == "page 00 of 000"
    assert _norm(spark, "café naïve ÉLÈVE") == "cafe naive eleve"
    assert _norm(spark, "“smart” ‘quotes’… and NBSP") == "\"smart\" 'quotes'... and nbsp"
    assert _norm(spark, "straße œuvre") == "strasse oeuvre"
    assert _norm(spark, "ctrl\x01char\ttab\r\nnewline") == "ctrlchar tab newline"
    assert _norm(spark, None) == ""


def test_tables_aligned_and_nfd_consistent():
    assert len(tn.PUNCT_FROM) == len(tn.PUNCT_TO)
    assert len(tn.ACCENT_FROM) == len(tn.ACCENT_TO)
    # every accent mapping is the NFD base letter (the two deliberate
    # non-decomposing folds: dotless i -> i, l-middle-dot -> l)
    for i, c in enumerate(tn.ACCENT_FROM):
        base = unicodedata.normalize("NFD", c)[0]
        if c in "ıŀ":
            continue
        assert tn.ACCENT_TO[i] == base, (c, base, tn.ACCENT_TO[i])


def test_normalized_dedup_groups_and_totality(spark):
    docs = [
        (0, "The Answer is 42."),
        (1, "the answer is 17 ."),   # digits+case+space fold: NOT equal (space before .)
        (2, "the  answer is 99."),   # collapses equal to 0
        (3, "something else"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in tn.normalized_dedup(df).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}  # total
    assert out[0]["n_copies"] == 2 and out[0]["keep"] is True
    assert out[2]["n_copies"] == 2 and out[2]["keep"] is False
    assert out[1]["n_copies"] == 1 and out[1]["keep"] is True
    # NULL and '' normalize to the same empty key -> one group
    assert out[4]["n_copies"] == 2 and out[4]["keep"] is True
    assert out[5]["keep"] is False and out[5]["norm_len"] == 0


def test_spark_and_sql_expr_agree_on_nonascii(spark):
    """The DuckDB twin is built from the same tables — pin equality on
    inputs the ASCII fixture can't exercise."""
    import duckdb

    from fujishadergpu_spark.queries import _textnorm_sql_expr

    cases = [
        "Ça c'est «très» élégant №5",
        "ＡＢＣ：（ｔｅｓｔ）？",  # fullwidth punct (letters pass through)
        "mixed ß and œ and … and 123",
    ]
    con = duckdb.connect()
    for s in cases:
        duck = con.execute(f"SELECT {_textnorm_sql_expr('?')}", [s]).fetchone()[0]
        assert _norm(spark, s) == duck, s
