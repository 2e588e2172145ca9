"""Mojibake repair (operators/mojibake.py): table correctness per
corruption class, idempotence, totality (NULL/clean passthrough),
zero-exchange plan shape, and Python round-trip ground truth."""

from pyspark.sql import functions as F

from fujishadergpu_spark.operators.mojibake import (
    MOJIBAKE_TABLE,
    mojibake_features,
    mojibake_sql_expr,
)


def _fix(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return mojibake_features(df).collect()[0]


def test_table_is_the_cp1252_decode_of_the_utf8_bytes():
    # ground truth: every corrupted form IS intended.encode('utf-8')
    # .decode('cp1252') — the table can never drift from the class it
    # claims to repair
    for bad, good in MOJIBAKE_TABLE:
        assert bad == good.encode("utf-8").decode("cp1252"), (bad, good)


def test_each_class_repairs(spark):
    r = _fix(spark, "donâ€™t say â€œcafÃ©â€˜ â€” 20Â°C â€¦ Ã±")
    assert r["text_fixed"] == "don’t say “café‘ — 20°C … ñ"
    assert r["has_mojibake"]
    # every fix shrinks 3->1 or 2->1 (five 3-char + three 2-char here)
    assert r["chars_fixed"] == len("donâ€™t say â€œcafÃ©â€˜ â€” 20Â°C â€¦ Ã±") - len(
        "don’t say “café‘ — 20°C … ñ"
    )


def test_clean_text_passes_through(spark):
    r = _fix(spark, "plain ascii text, no corruption at all.")
    assert not r["has_mojibake"]
    assert r["chars_fixed"] == 0
    assert r["text_fixed"] == "plain ascii text, no corruption at all."


def test_null_text_is_total(spark):
    r = _fix(spark, None)
    assert r["text_fixed"] is None
    assert r["has_mojibake"] is False
    assert r["chars_fixed"] == 0


def test_idempotent(spark):
    once = _fix(spark, "Ã©lÃ¨ve â€” donâ€™t")["text_fixed"]
    again = _fix(spark, once)
    assert again["text_fixed"] == once
    assert not again["has_mojibake"]


def test_plan_is_zero_exchange(spark):
    df = spark.createDataFrame([(1, "Ã©")], ["doc_id", "text"])
    plan = mojibake_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sql_expr_mirrors_table_order():
    s = mojibake_sql_expr("text")
    # innermost replace is the FIRST table entry (applied first)
    assert s.count("replace(") == len(MOJIBAKE_TABLE)
    assert s.index(MOJIBAKE_TABLE[0][0]) < s.index(MOJIBAKE_TABLE[-1][0])
