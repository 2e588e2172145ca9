"""Context-window chunking (operators/chunking.py): coverage law,
overlap arithmetic, boundary tokens, stats totality, and the no-shuffle
plan shape."""

import pytest

from fujishadergpu_spark.operators.chunking import chunk_stats, chunk_windows

DOCS = [
    (0, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
    (1, "a b c"),                            # shorter than one window
    (2, "x"),                                # single token
    (3, ""),                                 # zero tokens
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_windows_size4_stride2(spark):
    rows = [
        r.asDict()
        for r in chunk_windows(_df(spark), size=4, stride=2)
        .orderBy("doc_id", "chunk_id")
        .collect()
    ]
    d0 = [r for r in rows if r["doc_id"] == 0]
    # 10 tokens, size 4, stride 2 -> starts 0,2,4,6 (chunk at 6 covers 6..9)
    assert [(r["start_tok"], r["n_chunk_tokens"]) for r in d0] == [
        (0, 4), (2, 4), (4, 4), (6, 4),
    ]
    assert d0[0]["first_tok"] == "t0" and d0[0]["last_tok"] == "t3"
    assert d0[-1]["first_tok"] == "t6" and d0[-1]["last_tok"] == "t9"


def test_trailing_partial_chunk(spark):
    # 10 tokens, size 4, stride 3 -> starts 0,3,6 cover to 9? start 6
    # covers 6..9 (len 4) -> last start = ceil((10-4)/3)=2 -> starts 0,3,6
    rows = [
        (r["start_tok"], r["n_chunk_tokens"])
        for r in chunk_windows(_df(spark), size=4, stride=3)
        .where("doc_id = 0")
        .orderBy("chunk_id")
        .collect()
    ]
    assert rows == [(0, 4), (3, 4), (6, 4)]
    # 3 tokens size 4 stride 3: one short chunk
    short = chunk_windows(_df(spark), size=4, stride=3).where("doc_id = 1").collect()
    assert len(short) == 1 and short[0]["n_chunk_tokens"] == 3
    assert short[0]["first_tok"] == "a" and short[0]["last_tok"] == "c"


def test_every_token_covered(spark):
    """Coverage law: union of [start, start+len) per doc == [0, n)."""
    for size, stride in [(4, 2), (4, 3), (3, 3), (5, 1)]:
        rows = chunk_windows(_df(spark), size=size, stride=stride).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], set()).update(
                range(r["start_tok"], r["start_tok"] + r["n_chunk_tokens"])
            )
        assert by_doc.get(0) == set(range(10)), (size, stride)
        assert by_doc.get(1) == set(range(3)), (size, stride)
        assert by_doc.get(2) == {0}, (size, stride)
        assert 3 not in by_doc  # zero-token doc: zero chunks (documented)


def test_zero_token_doc_has_no_chunks_but_stats_row(spark):
    ch = chunk_windows(_df(spark), size=4, stride=2)
    assert ch.where("doc_id = 3").count() == 0
    st = {r["doc_id"]: r.asDict() for r in chunk_stats(_df(spark), 4, 2).collect()}
    assert set(st) == {0, 1, 2, 3}
    assert st[3]["n_chunks"] == 0 and st[3]["n_window_tokens"] == 0


def test_stats_match_windows(spark):
    ch = chunk_windows(_df(spark), size=4, stride=2)
    agg = {
        r["doc_id"]: (r["nc"], r["nw"])
        for r in ch.groupBy("doc_id")
        .agg({"chunk_id": "count", "n_chunk_tokens": "sum"})
        .withColumnRenamed("count(chunk_id)", "nc")
        .withColumnRenamed("sum(n_chunk_tokens)", "nw")
        .collect()
    }
    st = {r["doc_id"]: r.asDict() for r in chunk_stats(_df(spark), 4, 2).collect()}
    for d, (nc, nw) in agg.items():
        assert st[d]["n_chunks"] == nc and st[d]["n_window_tokens"] == nw


def test_rejects_bad_params(spark):
    with pytest.raises(ValueError, match="positive"):
        chunk_windows(_df(spark), 0, 1)
    with pytest.raises(ValueError, match="skip tokens"):
        chunk_windows(_df(spark), 4, 5)


def test_no_exchange_in_plan(spark):
    """Chunking is row-parallel: the executed plan must contain no
    shuffle exchange."""
    plan = (
        chunk_windows(_df(spark), 4, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
