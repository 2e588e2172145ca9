"""Dataset card (operators/datacard.py): hand-computed summary on a
tiny corpus, degenerate arms (all-empty corpus), production 64-bit
key path equivalence, and single-aggregate plan shape."""

from pyspark.sql import functions as F

from fujishadergpu_spark.operators.datacard import dataset_card

ROWS = [
    (1, "alpha beta gamma"),   # 3 tokens
    (2, "alpha beta gamma"),   # exact dup of 1
    (3, "delta"),              # 1 token
    (4, ""),                   # empty
    (5, None),                 # null
    (6, "epsilon zeta"),       # 2 tokens
]


def _card(spark, rows=ROWS, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return dataset_card(df, **kw).collect()[0]


def test_hand_computed_summary(spark):
    r = _card(spark)
    assert r["n_docs"] == 6
    assert r["n_empty"] == 2  # the '' and the NULL
    assert r["n_chars"] == len("alpha beta gamma") * 2 + len("delta") + len("epsilon zeta")
    assert r["n_tokens"] == 3 + 3 + 1 + 2
    assert r["n_distinct_texts"] == 3
    # 4 non-empty, 3 distinct -> dup rate 1/4
    assert r["dup_rate_q6"] == 250000
    assert r["mean_tokens_q6"] == round(9 / 4 * 1e6)
    assert r["max_tokens"] == 3
    assert r["min_tokens"] == 1


def test_all_empty_corpus_is_total(spark):
    r = _card(spark, rows=[(1, ""), (2, None)])
    assert r["n_docs"] == 2
    assert r["n_empty"] == 2
    assert (r["n_chars"], r["n_tokens"], r["n_distinct_texts"]) == (0, 0, 0)
    assert (r["dup_rate_q6"], r["mean_tokens_q6"]) == (0, 0)
    assert (r["max_tokens"], r["min_tokens"]) == (0, 0)


def test_production_key_path_matches_text_path(spark):
    # the 100-TB path distinct-counts a 64-bit hash instead of full
    # text; on a collision-free corpus the card is identical
    df = spark.createDataFrame(ROWS, ["doc_id", "text"]).withColumn(
        "tkey", F.xxhash64("text")
    )
    a = dataset_card(df)
    b = dataset_card(df, text_key_col="tkey")
    assert a.collect() == b.collect()


def test_single_aggregate_no_join(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    plan = dataset_card(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
