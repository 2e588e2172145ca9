"""Unicode script profiling (functions/scripts.py): block counts,
dominant-script tie-break priority, mixed flag, totality."""

import pytest

from fujishadergpu_spark.functions.scripts import (
    SCRIPT_RANGES,
    script_profile,
)


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in script_profile(df, **kw).collect()}


def test_counts_per_block(spark):
    out = _run(
        spark,
        [(0, "abc привет 你好 γs εtest מ م क かカ 한")],
        min_letters=1,
    )
    r = out[0]
    assert r["n_latin"] == 3 + 1 + 4  # abc + s + test
    assert r["n_cyrillic"] == 6
    assert r["n_han"] == 2
    assert r["n_greek"] == 2  # γ ε
    assert r["n_hebrew"] == 1 and r["n_arabic"] == 1
    assert r["n_devanagari"] == 1
    assert r["n_kana"] == 2 and r["n_hangul"] == 1
    assert r["n_letters"] == 8 + 6 + 2 + 2 + 1 + 1 + 1 + 2 + 1


def test_dominant_and_tie_break(spark):
    out = _run(
        spark,
        [
            (0, "здравствуйте dear friend"),  # cyrillic 12 > latin 10
            (1, "abc где"),  # tie 3-3: latin declared first wins
            (2, ""),  # no letters
            (3, None),  # null text
            (4, "123 456 !!!"),  # digits/punct only
        ],
    )
    assert out[0]["dominant_script"] == "cyrillic"
    assert out[1]["dominant_script"] == "latin"
    for d in (2, 3, 4):
        assert out[d]["dominant_script"] == ""
        assert out[d]["dominant_frac"] == 0.0
        assert not out[d]["is_mixed"]
    assert out[3]["n_chars"] == 0  # NULL behaves as empty


def test_mixed_flag(spark):
    pure = "the quick brown fox jumps over the lazy dog near rivers"
    mixed = "the quick brown fox jumps привет мир сегодня здесь"
    out = _run(spark, [(0, pure), (1, mixed)])
    assert not out[0]["is_mixed"] and out[0]["dominant_frac"] == 1.0
    assert out[1]["is_mixed"] and out[1]["dominant_frac"] < 0.95
    # below min_letters the flag never fires
    tiny = _run(spark, [(2, "ab где")], min_letters=20)
    assert not tiny[2]["is_mixed"]


def test_latin_excludes_multiplication_signs(spark):
    # U+00D7 and U+00F7 sit inside the Latin-1 block but are math
    # signs, not letters — the range table skips the two holes
    out = _run(spark, [(0, "3×4÷2 é")], min_letters=1)
    assert out[0]["n_latin"] == 1  # é only


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    plan = script_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_range_table_shape():
    names = [n for n, _ in SCRIPT_RANGES]
    assert names[0] == "latin" and len(names) == len(set(names)) == 9


def test_streaming_safe(spark, tmp_path):
    """script_profile is a stateless projection: identical rows in
    structured streaming (availableNow) and batch."""
    from fujishadergpu_spark.streaming.events import run_stream_to_memory

    docs = [(0, "hello мир"), (1, "你好"), (2, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "sp_stream_src")
    df.repartition(2).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    run_stream_to_memory(
        script_profile(stream), "script_stream_out", output_mode="append"
    )
    got = {tuple(r) for r in spark.sql("SELECT * FROM script_stream_out").collect()}
    exp = {tuple(r) for r in script_profile(df).collect()}
    assert got == exp and len(got) == 3
