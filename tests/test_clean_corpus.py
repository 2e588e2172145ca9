"""clean-corpus resumable job (plans/clean_corpus.py, r5 verdict #2):
every stage's semantics on a hand-planted corpus, no-op resume, and
kill-mid-job resume producing output identical to an uninterrupted
run (the test_cli_pipeline.py pattern over the lineage machinery)."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.plans.clean_corpus import DOC_STAGES, STAGES, run_clean_corpus

# one boilerplate line shared by docs 0 and 3 (line_dedup signal) and
# one 8-token span shared by docs 4 and 5 (ExactSubstr signal)
COMMON_LINE = "shared boiler alpha beta gamma delta epsilon zeta"
DUP_SPAN = "s1 s2 s3 s4 s5 s6 s7 s8"
BENCH_GRAM = "q1 q2 q3 q4 q5 q6 q7 q8"

DOCS = [
    (0, COMMON_LINE + "\nd0a one two three four five six\nd0b red blue green cyan teal navy"),
    (1, "d1a mail me at bob@example.com today please\nd1b calm words seven eight nine ten"),
    # Gopher violation: the same line 10 times (dup_line_frac = 0.9)
    (2, "\n".join(["rpt line again again2 again3 again4 again5 again6"] * 10)),
    (3, COMMON_LINE + "\nd3a only lines here stay put now\nd3b more unique words linger here too"),
    # the dup span is embedded in DISTINCT lines (a shared full line
    # would be consumed by line_dedup before the span stage sees it)
    (4, "d4a prefix words before the span here now\nd4b lead " + DUP_SPAN + " d4c tail"),
    (5, "d5a zz other prefix chunk ahead of span\nd5b head " + DUP_SPAN + " d5c end"),
    # benchmark contamination: carries the eval 8-gram verbatim
    (6, "d6a intro tokens first\n" + BENCH_GRAM + "\nd6b outro tokens last"),
]


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cc") / "docs.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(p)
    return p


@pytest.fixture(scope="module")
def bench_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cc") / "bench.parquet")
    spark.createDataFrame([(BENCH_GRAM,)], "text string").write.parquet(p)
    return p


def _ids(spark, out, stage):
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(f"{out}/{stage}")
    except AnalysisException:
        return set()  # zero-survivor stage: only _SUCCESS on disk
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def _texts(spark, out, stage):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/{stage}").select("doc_id", "text").collect()
    }


def test_clean_corpus_stage_semantics(spark, corpus_path, bench_path, tmp_path):
    out = str(tmp_path / "out")
    s = run_clean_corpus(
        spark, corpus_path, out, run_id="r1",
        benchmark_path=bench_path, pack_budget=16, pack_groups=2,
    )
    assert list(s) == list(STAGES)
    assert all(not v["skipped"] for v in s.values())

    # pii: transform, total — doc 1's email redacted, nothing dropped
    pii = _texts(spark, out, "pii")
    assert set(pii) == set(range(7))
    assert "<EMAIL>" in pii[1] and "bob@example.com" not in pii[1]

    # repetition: the 10x-repeated-line doc is gone, the rest survive
    assert _ids(spark, out, "repetition") == {0, 1, 3, 4, 5, 6}

    # line_dedup: doc 3 loses the boilerplate line to doc 0
    ld = _texts(spark, out, "line_dedup")
    assert COMMON_LINE in ld[0] and COMMON_LINE not in ld[3]
    assert "d3a" in ld[3]  # doc 3's own lines survive

    # span_dedup: the corpus-duplicated 8-token span excised from BOTH
    sd = _texts(spark, out, "span_dedup")
    for did in (4, 5):
        assert "s1" not in sd[did].split() and "s8" not in sd[did].split(), sd[did]
        assert sd[did] != ""  # each doc's unique prefix survives
    assert BENCH_GRAM in sd[6]  # a once-only gram is NOT span-duplicated

    # decontaminate: the benchmark-overlapping doc is dropped
    assert _ids(spark, out, "decontaminate") == {0, 1, 3, 4, 5}
    # sample at default_rate=1.0 keeps everything
    assert _ids(spark, out, "sample") == {0, 1, 3, 4, 5}

    # pack: one plan row per surviving doc, budget respected
    plan = spark.read.parquet(f"{out}/pack")
    rows = plan.collect()
    assert {r["doc_id"] for r in rows} == {0, 1, 3, 4, 5}
    per_seq = (
        plan.where(~F.col("overflow"))
        .groupBy("pack_group", "seq_id")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    assert all(r["t"] <= 16 for r in per_seq)

    # shard: one layout row per sampled doc, contiguous token stream
    sh = spark.read.parquet(f"{out}/shard").collect()
    assert {r["doc_id"] for r in sh} == {0, 1, 3, 4, 5}
    starts = sorted(r["global_pos"] for r in sh)
    toks = {r["doc_id"]: r["n_tokens"] for r in sh}
    assert starts[0] == 0 and starts[-1] + 1 <= sum(toks.values())
    assert all(
        r["shard_id"] * 1_048_576 + r["shard_off"] == r["global_pos"] for r in sh
    )

    # full resume: every stage skips, outputs unchanged
    before = {st: _ids(spark, out, st) for st in DOC_STAGES}
    s2 = run_clean_corpus(
        spark, corpus_path, out, run_id="r2",
        benchmark_path=bench_path, pack_budget=16, pack_groups=2,
    )
    assert all(v["skipped"] for v in s2.values())
    for st in DOC_STAGES:
        assert _ids(spark, out, st) == before[st], st


def test_clean_corpus_kill_midjob_resume_equals_uninterrupted(
    spark, corpus_path, bench_path, tmp_path, monkeypatch
):
    """Kill the job after line_dedup commits (fault injected into the
    span stage), resume, and require every stage output to equal an
    uninterrupted golden run row-for-row."""
    import fujishadergpu_spark.plans.clean_corpus as cc

    golden = str(tmp_path / "golden")
    run_clean_corpus(
        spark, corpus_path, golden, run_id="g",
        benchmark_path=bench_path, pack_budget=16, pack_groups=2,
    )

    out = str(tmp_path / "killed")
    real = cc.substring_dedup

    def boom(*a, **kw):
        raise RuntimeError("injected kill before span_dedup")

    monkeypatch.setattr(cc, "substring_dedup", boom)
    with pytest.raises(RuntimeError, match="injected kill"):
        run_clean_corpus(
            spark, corpus_path, out, run_id="k1",
            benchmark_path=bench_path, pack_budget=16, pack_groups=2,
        )
    # stages up to the crash committed; the rest never ran
    assert _ids(spark, out, "line_dedup") == {0, 1, 3, 4, 5, 6}
    import os

    assert not os.path.exists(f"{out}/span_dedup")

    monkeypatch.setattr(cc, "substring_dedup", real)
    s = run_clean_corpus(
        spark, corpus_path, out, run_id="k2",
        benchmark_path=bench_path, pack_budget=16, pack_groups=2,
    )
    # completed stages resumed as no-ops, the remainder ran
    for st in ("pii", "repetition", "line_dedup"):
        assert s[st]["skipped"], st
    for st in ("span_dedup", "decontaminate", "sample", "pack", "shard"):
        assert not s[st]["skipped"], st

    # row-identical to the uninterrupted run, every stage
    for st in DOC_STAGES:
        a = {tuple(r) for r in spark.read.parquet(f"{golden}/{st}").select("doc_id", "text").collect()}
        b = {tuple(r) for r in spark.read.parquet(f"{out}/{st}").select("doc_id", "text").collect()}
        assert a == b, st
    cols = ["doc_id", "pack_group", "seq_id", "seq_pos", "n_tokens", "overflow"]
    a = {tuple(r) for r in spark.read.parquet(f"{golden}/pack").select(*cols).collect()}
    b = {tuple(r) for r in spark.read.parquet(f"{out}/pack").select(*cols).collect()}
    assert a == b
    scols = ["doc_id", "n_tokens", "global_pos", "shard_id", "shard_off"]
    a = {tuple(r) for r in spark.read.parquet(f"{golden}/shard").select(*scols).collect()}
    b = {tuple(r) for r in spark.read.parquet(f"{out}/shard").select(*scols).collect()}
    assert a == b


def test_clean_corpus_without_benchmark_passes_gate(spark, corpus_path, tmp_path):
    out = str(tmp_path / "nobench")
    run_clean_corpus(spark, corpus_path, out, run_id="nb", pack_budget=16, pack_groups=2)
    # no benchmark -> decontaminate passes everything repetition+dedup kept
    assert _ids(spark, out, "decontaminate") == {0, 1, 3, 4, 5, 6}


def test_clean_corpus_sampler_rates_apply(spark, corpus_path, tmp_path):
    out = str(tmp_path / "rate0")
    run_clean_corpus(
        spark, corpus_path, out, run_id="r0",
        default_rate=0.0, pack_budget=16, pack_groups=2,
    )
    # default_rate 0 with no per-language rates drops every doc
    assert _ids(spark, out, "sample") == set()


def test_clean_corpus_dsir_selection(spark, corpus_path, tmp_path):
    """--dsir-target swaps the sample stage for Gumbel-top-k importance
    resampling toward the target corpus."""
    from fujishadergpu_spark.operators.dsir import dsir_resample, dsir_weights

    # target register = doc 1's vocabulary -> doc 1 must be sampled
    tgt_path = str(tmp_path / "tgt.parquet")
    spark.createDataFrame(
        [(100, "d1a mail me at alice@example.net today please")],
        "doc_id long, text string",
    ).write.parquet(tgt_path)

    out = str(tmp_path / "out_dsir")
    run_clean_corpus(
        spark, corpus_path, out,
        dsir_target_path=tgt_path, dsir_select=2,
    )
    sampled = _ids(spark, out, "sample")
    assert len(sampled) == 2 and 1 in sampled

    # the selection must equal the operator composition run directly
    # on the decontaminate stage's output (resume-sound determinism)
    dc = spark.read.parquet(f"{out}/decontaminate").select("doc_id", "text")
    tgt = spark.read.parquet(tgt_path).select("doc_id", "text")
    direct = {r["doc_id"] for r in dsir_resample(dsir_weights(dc, tgt), 2).collect()}
    assert sampled == direct


def test_clean_corpus_mixture_selection(spark, corpus_path, tmp_path):
    """--mixture-targets swaps the sample stage for budgeted
    token-mixture thresholds; the selection must equal the operator
    composition run directly on the decontaminate output, and the
    shard layout must cover exactly the selected docs."""
    from fujishadergpu_spark.functions import textfn
    from fujishadergpu_spark.operators.sampling import mixture_sample

    targets = {"en": 1.0, "und": 1.0}
    out = str(tmp_path / "out_mix")
    run_clean_corpus(
        spark, corpus_path, out,
        mixture_targets=targets, mixture_budget=40,
        pack_budget=16, pack_groups=2,
    )
    sampled = _ids(spark, out, "sample")

    dc = spark.read.parquet(f"{out}/decontaminate").select("doc_id", "text")
    direct = {
        r["doc_id"]
        for r in mixture_sample(
            dc.withColumn("_lang", textfn.lang_id(F.col("text"))).withColumn(
                "_nt", textfn.token_count(F.col("text")).cast("long")
            ),
            "_lang", "_nt", targets, 40, "doc_id",
        ).collect()
    }
    assert sampled == direct
    # a 40-token budget over this ~100-token corpus is a real cut
    assert set() < sampled < _ids(spark, out, "decontaminate")
    assert {r["doc_id"] for r in spark.read.parquet(f"{out}/shard").collect()} == sampled


def test_clean_corpus_unimax_selection(spark, corpus_path, tmp_path):
    """--unimax-budget swaps the sample stage for UniMax budget
    waterfilling; the selection must equal the operator composition
    run directly on the decontaminate output."""
    from fujishadergpu_spark.functions import textfn
    from fujishadergpu_spark.operators.sampling import unimax_sample

    out = str(tmp_path / "out_umx")
    run_clean_corpus(
        spark, corpus_path, out,
        unimax_budget=40, pack_budget=16, pack_groups=2,
    )
    sampled = _ids(spark, out, "sample")

    dc = spark.read.parquet(f"{out}/decontaminate").select("doc_id", "text")
    direct = {
        r["doc_id"]
        for r in unimax_sample(
            dc.withColumn("_lang", textfn.lang_id(F.col("text"))).withColumn(
                "_nt", textfn.token_count(F.col("text")).cast("long")
            ),
            "_lang", "_nt", 40, "doc_id",
        ).collect()
    }
    assert sampled == direct
    # a 40-token budget over this ~100-token corpus is a real cut
    assert set() < sampled < _ids(spark, out, "decontaminate")
    assert {r["doc_id"] for r in spark.read.parquet(f"{out}/shard").collect()} == sampled


def test_clean_corpus_selection_modes_exclusive(spark, corpus_path, tmp_path):
    with pytest.raises(ValueError, match="exclusive selection modes"):
        run_clean_corpus(
            spark, corpus_path, str(tmp_path / "x"),
            dsir_target_path="unused", mixture_targets={"en": 1.0},
        )


def test_clean_corpus_ngram_rules_gate(spark, corpus_path, tmp_path):
    """--ngram-rules ANDs the full Gopher n-gram family into the
    repetition gate: the stage's survivor set must equal the direct
    conjunction of both operators' keep flags on the pii output.
    (Short fixture docs DO trip the top-3/4-gram rules — a single
    17-char 3-gram over a 71-char doc exceeds 0.18 — so this is a
    real additional drop, not a no-op.)"""
    from fujishadergpu_spark.operators.repetition import (
        ngram_repetition_features,
        repetition_features,
    )

    out = str(tmp_path / "out_ng")
    run_clean_corpus(spark, corpus_path, out, ngram_rules=True)
    pii = spark.read.parquet(f"{out}/pii").select("doc_id", "text")
    exp = {
        r["doc_id"] for r in repetition_features(pii).where("keep").collect()
    } & {
        r["doc_id"]
        for r in ngram_repetition_features(pii).where("keep").collect()
    }
    got = _ids(spark, out, "repetition")
    assert got == exp
    # and it is a strictly tighter gate than the line rules alone here
    line_only = {
        r["doc_id"] for r in repetition_features(pii).where("keep").collect()
    }
    assert got < line_only


def test_clean_corpus_domain_gate_stage(spark, tmp_path):
    """Opt-in domain stage: a junk-heavy site is dropped wholesale
    BEFORE pii; the stage appears first in the summary."""
    docs = [
        (0, "solid reasonable prose with plenty of words here today", "good.example"),
        (1, "more decent text content for training corpora right now", "good.example"),
        (2, "x", "junk.example"),
        (3, "", "junk.example"),
        (4, "lonely but fine document under a one-doc domain", "single.example"),
    ]
    src = str(tmp_path / "dom_docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string, source string").write.parquet(src)
    out = str(tmp_path / "dom_out")
    s = run_clean_corpus(
        spark, src, out, run_id="dm", pack_budget=16, pack_groups=2,
        domain_min_docs=2, domain_min_avg_quality=0.5,
    )
    assert list(s) == ["domain", *STAGES]
    # junk.example fails mean quality; single.example fails min_docs
    assert _ids(spark, out, "domain") == {0, 1}
    assert _ids(spark, out, "pii") == {0, 1}


def test_clean_corpus_chunk_stage(spark, corpus_path, tmp_path):
    """Opt-in chunk stage: appended after shard, windows cover every
    surviving token with the configured size/stride."""
    out = str(tmp_path / "chunk_out")
    s = run_clean_corpus(
        spark, corpus_path, out, run_id="ck", pack_budget=16, pack_groups=2,
        chunk_size=4, chunk_stride=2,
    )
    assert list(s) == [*STAGES, "chunk"]
    ch = spark.read.parquet(f"{out}/chunk")
    assert {r["doc_id"] for r in ch.select("doc_id").distinct().collect()} == _ids(
        spark, out, "sample"
    )
    sample = _texts(spark, out, "sample")
    by_doc = {}
    for r in ch.collect():
        by_doc.setdefault(r["doc_id"], set()).update(
            range(r["start_tok"], r["start_tok"] + r["n_chunk_tokens"])
        )
    for d, text in sample.items():
        assert by_doc[d] == set(range(len(text.split()))), d


def test_clean_corpus_boilerplate_stage(spark, tmp_path):
    """Opt-in boilerplate stage: chrome lines stripped, pure-chrome
    docs dropped, stage runs before pii."""
    good = "the cat is in the house and it is warm"
    chrome = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(0, chrome + "\n" + good), (1, "home\nmenu\nlogin")]
    src = str(tmp_path / "bp_docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "bp_out")
    s = run_clean_corpus(
        spark, src, out, run_id="bp", pack_budget=16, pack_groups=2,
        strip_boilerplate=True,
    )
    assert list(s) == ["boilerplate", *STAGES]
    # doc 1 was pure chrome (all-short, no decisive neighbour): gone
    assert _ids(spark, out, "boilerplate") == {0}
    # doc 0 keeps only its content line
    assert _texts(spark, out, "boilerplate")[0] == good
    assert _ids(spark, out, "pii") == {0}


def test_clean_corpus_para_dedup_stage(spark, tmp_path):
    """Opt-in paragraph-dedup stage between repetition and line_dedup
    (coarse-to-fine — line_dedup's rejoin erases blank-line
    boundaries): a paragraph block recurring across docs is removed
    whole from the later doc before line dedup runs."""
    shared = "alpha beta gamma one\ndelta epsilon zeta two"
    uniq0 = "first document closing words here now"
    uniq1 = "second document closing words there later"
    docs = [(0, shared + "\n\n" + uniq0), (1, shared + "\n\n" + uniq1)]
    src = str(tmp_path / "pd_docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "pd_out")
    s = run_clean_corpus(
        spark, src, out, run_id="pd", pack_budget=64, pack_groups=2,
        para_dedup=True,
    )
    want = list(STAGES)
    want.insert(want.index("line_dedup"), "para_dedup")
    assert list(s) == want
    # doc 0 keeps the shared paragraph (first occurrence); doc 1 loses
    # the whole block and is reduced to its unique paragraph
    texts = _texts(spark, out, "para_dedup")
    assert texts[0] == shared + "\n\n" + uniq0
    assert texts[1] == uniq1
    # line_dedup afterwards sees only unique lines — nothing removed
    ld = _texts(spark, out, "line_dedup")
    assert ld[1] == uniq1 and set(ld) == {0, 1}


def test_clean_corpus_gopher_doc_rules(spark, tmp_path):
    """gopher_doc_rules ANDs the §A1.1 document rules into the
    repetition stage: a stop-word-free doc drops there while a
    compliant doc of the same length survives."""
    good = " ".join(
        ["the quick brown fox and that dog have fun with it today ok"] * 5
    )  # 60 words, 5 distinct stop words
    nostop = " ".join(
        [f"token{i} filler{i} words{i} here{i} now{i}" for i in range(12)]
    )  # 60 words, zero stop hits
    docs = [(0, good), (1, nostop)]
    src = str(tmp_path / "gq_docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "gq_out")
    s = run_clean_corpus(
        spark, src, out, run_id="gq", pack_budget=64, pack_groups=2,
        gopher_doc_rules=True,
    )
    assert list(s) == list(STAGES)
    assert _ids(spark, out, "pii") == {0, 1}
    assert _ids(spark, out, "repetition") == {0}
    # without the flag both docs clear the repetition stage
    out2 = str(tmp_path / "gq_out2")
    run_clean_corpus(spark, src, out2, run_id="gq2", pack_budget=64, pack_groups=2)
    assert _ids(spark, out2, "repetition") == {0, 1}


def test_clean_corpus_mojibake_stage(spark, tmp_path):
    """Opt-in mojibake stage: total transform first among the text
    stages — every doc survives it, corrupted text repaired before
    any downstream gate sees it."""
    clean = "the dog sits in the yard and it naps well every single day"
    dirty = ("the cafÃ© owner said â€œit is warmâ€“ish here todayâ€¦ and "
             "we can stay a while longer to talk about the town news")
    fixed = ("the café owner said “it is warm–ish here today… and "
             "we can stay a while longer to talk about the town news")
    docs = [(0, clean), (1, dirty)]
    src = str(tmp_path / "mj_docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "mj_out")
    s = run_clean_corpus(
        spark, src, out, run_id="mj", pack_budget=16, pack_groups=2,
        fix_mojibake=True,
    )
    assert list(s) == ["mojibake", *STAGES]
    # total: both docs present, corruption repaired, clean untouched
    mj = _texts(spark, out, "mojibake")
    assert set(mj) == {0, 1}
    assert mj[0] == clean
    assert mj[1] == fixed
    # downstream stages consumed the REPAIRED text
    assert "Ã" not in _texts(spark, out, "pii")[1]


def test_clean_corpus_ppl_stage(spark, tmp_path):
    """Opt-in perplexity gate: scored docs bucketed and kept per the
    keep list; unscored (<2 token) docs dropped unless listed."""
    # docs long enough that the upstream Gopher top-bigram rule passes
    # (a 10-word doc's single top bigram covers >20% of its chars)
    docs = [
        (0, "the quick brown fox jumps over the lazy dog while many other "
            "animals watch quietly from a hill near the river that flows past town"),
        (1, "a different second document talks about spark executors shuffling "
            "data across the cluster while the driver plans stages and tasks for every query"),
        (2, "pad words making this document long enough to pass gates with "
            "plenty of variety in the phrasing and no repeated word pairs anywhere today"),
        (3, "solo"),  # 1 token -> unscored
    ]
    src = str(tmp_path / "ppl_docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "ppl_out")
    s = run_clean_corpus(
        spark, src, out, run_id="pp", pack_budget=16, pack_groups=2,
        ppl_keep_buckets=("head", "middle", "tail"),
    )
    want = list(STAGES)
    want.insert(want.index("sample"), "ppl")
    assert list(s) == want
    assert _ids(spark, out, "ppl") == {0, 1, 2}  # unscored doc 3 gone


def test_clean_corpus_urlfilter_and_increment_stages(spark, tmp_path):
    """Opt-in url filter (first) + cross-snapshot dedup (second)."""
    from fujishadergpu_spark.operators.increment import exact_snapshot

    long_tail = " with plenty of additional words to sail past every gate"
    docs = [
        (0, "a perfectly ordinary first document" + long_tail, "https://ok.org/a"),
        (1, "text that already shipped in release one" + long_tail, "https://ok.org/b"),
        (2, "another fine novel document body here" + long_tail, "https://ads.badnet.com/x"),
        (3, "casino bonus spam page body text here" + long_tail, "https://ok.org/casino-bonus"),
    ]
    src = str(tmp_path / "uf_docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string, url string").write.parquet(src)
    bl = str(tmp_path / "blocked.parquet")
    spark.createDataFrame([("badnet.com",)], ["host"]).write.parquet(bl)
    snap = str(tmp_path / "snap.parquet")
    exact_snapshot(
        spark.createDataFrame(
            [(9, "text that already shipped in release one" + long_tail)],
            "doc_id long, text string",
        )
    ).write.parquet(snap)
    out = str(tmp_path / "uf_out")
    s = run_clean_corpus(
        spark, src, out, run_id="uf", pack_budget=64, pack_groups=2,
        blocked_hosts_path=bl,
        url_soft_words={"casino": 1.5, "bonus": 1.0},
        seen_snapshot_path=snap,
    )
    assert list(s) == ["urlfilter", "increment", *STAGES]
    # 2 blocked by domain, 3 by url words
    assert _ids(spark, out, "urlfilter") == {0, 1}
    # 1 already in the prior release's snapshot
    assert _ids(spark, out, "increment") == {0}
    assert _ids(spark, out, "pii") == {0}


def test_clean_corpus_norm_dedup_stage(spark, tmp_path):
    """Opt-in normalized-key dedup: case/digit/whitespace copies
    collapse to the min-id keeper right after pii."""
    base = "the answer is 42 and the rest of this text carries on for a while longer here"
    docs = [
        (0, base),
        (1, base.upper().replace("42", "17")),  # case+digit copy -> dropped
        (2, "a fully different document with its own words that stands alone here today"),
    ]
    src = str(tmp_path / "nd_docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "nd_out")
    s = run_clean_corpus(
        spark, src, out, run_id="nd", pack_budget=16, pack_groups=2,
        norm_dedup=True,
    )
    assert "norm_dedup" in s
    assert _ids(spark, out, "norm_dedup") == {0, 2}


def test_clean_corpus_sent_dedup_stage(spark, tmp_path):
    """Opt-in sentence dedup after line dedup: a sentence duplicated
    across docs survives only in the first doc."""
    dup_sent = "this exact sentence shows up in two documents verbatim."
    docs = [
        (0, dup_sent + " and doc zero carries plenty of its own words beyond it to pass gates here."),
        (1, dup_sent + " while doc one also has a long unique remainder that keeps it alive through filters."),
    ]
    src = str(tmp_path / "sd_docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "sd_out")
    s = run_clean_corpus(
        spark, src, out, run_id="sd", pack_budget=16, pack_groups=2,
        sent_dedup=True,
    )
    assert "sent_dedup" in s
    t = _texts(spark, out, "sent_dedup")
    assert dup_sent in t[0]
    assert dup_sent not in t[1] and "unique remainder" in t[1]


def test_clean_corpus_readability_and_topic_gates(spark, tmp_path):
    """Opt-in readability band and topic gates: the band drops the
    out-of-range doc; the topic gate keeps only listed buckets."""
    easy = ("the cat sat on the mat. the dog ran to the park. we like to "
            "walk and talk. it is a good day for all of us out here now.")
    dense = ("notwithstanding institutional heterogeneity epistemological "
             "reorganization necessitates comprehensive multidimensional "
             "transdisciplinary recontextualization methodologies enabling "
             "paradigmatic interoperability considerations henceforth")
    docs = [(0, easy), (1, dense)]
    src = str(tmp_path / "rt_docs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "rt_out")
    s = run_clean_corpus(
        spark, src, out, run_id="rt", pack_budget=16, pack_groups=2,
        readability_range=(0.0, 206.0),
    )
    assert "readability" in s
    # the dense doc's flesch ease is deeply negative -> dropped
    assert _ids(spark, out, "readability") == {0}

    # topic gate: a joins-heavy doc survives, a storage-heavy doc
    # doesn't when only 'joins' is listed
    # diverse wording (the Gopher repetition gate upstream must pass)
    # with a clear topical majority: 4 joins-words vs 1 storage-word
    jd = ("join merge hash key against one table while every other word "
          "here stays unique so no repetition rule can fire on this text")
    sd = ("table part data value beside one join since all remaining words "
          "differ from each other and keep the gopher gate satisfied fully")
    src2 = str(tmp_path / "tp_docs.parquet")
    spark.createDataFrame([(0, jd), (1, sd)], "doc_id long, text string").write.parquet(src2)
    out2 = str(tmp_path / "tp_out")
    s2 = run_clean_corpus(
        spark, src2, out2, run_id="tp", pack_budget=16, pack_groups=2,
        topic_keep=("joins",),
    )
    assert "topic" in s2
    assert _ids(spark, out2, "topic") == {0}


def test_clean_corpus_pack_strategy_ffd(spark, corpus_path, tmp_path):
    """pack_strategy='ffd' flows through to the pack stage and keeps
    the budget invariant."""
    out = str(tmp_path / "ffd_out")
    run_clean_corpus(
        spark, corpus_path, out, run_id="ffd", pack_budget=16, pack_groups=2,
        pack_strategy="ffd",
    )
    plan = spark.read.parquet(f"{out}/pack")
    per_seq = (
        plan.where(~F.col("overflow"))
        .groupBy("pack_group", "seq_id")
        .agg(F.sum("n_tokens").alias("t"))
    )
    assert per_seq.where(F.col("t") > 16).count() == 0
