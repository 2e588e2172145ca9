"""anchor_topk gate: Spark top-k anchor terms must match a pure-Python
reference exactly (count DESC, term ASC determinism), plus the
boundary behaviors — occurrence (not link) counting, empty/garbage
anchors dropped, fewer-than-k targets emit fewer rows."""

import pytest

from fujishadergpu_spark.operators.anchors import anchor_topk

import re


def _py_topk(links, k):
    counts = {}
    for _src, dst, anchor in links:
        for t in re.split(r"[^a-z0-9]+", anchor.lower()):
            if t:
                counts[(dst, t)] = counts.get((dst, t), 0) + 1
    out = []
    for dst in sorted({d for d, _ in counts}):
        terms = sorted(
            ((t, n) for (d, t), n in counts.items() if d == dst),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        out += [(dst, i + 1, t, n) for i, (t, n) in enumerate(terms)]
    return sorted(out)


def _run(spark, links, k=3):
    df = spark.createDataFrame(links, "src long, dst long, anchor string")
    rows = anchor_topk(df, k=k).collect()
    return sorted((r["target"], r["rank"], r["term"], r["n"]) for r in rows)


LINKS = [
    (1, 10, "Home Page"),
    (2, 10, "home"),
    (3, 10, "best home DEALS deals"),
    (4, 10, "deals"),
    (5, 11, "Contact-Us!"),
    (6, 11, ""),
    (7, 12, "   ...   "),
]


def test_matches_reference_exactly(spark):
    assert _run(spark, LINKS, k=2) == _py_topk(LINKS, 2)
    assert _run(spark, LINKS, k=10) == _py_topk(LINKS, 10)


def test_tie_breaks_lexicographic(spark):
    got = _run(spark, [(1, 5, "beta alpha"), (2, 5, "alpha beta")], k=1)
    assert got == [(5, 1, "alpha", 2)]


def test_occurrences_not_links(spark):
    got = _run(spark, [(1, 5, "x x x y")], k=2)
    assert got == [(5, 1, "x", 3), (5, 2, "y", 1)]


def test_garbage_only_anchor_emits_nothing(spark):
    assert _run(spark, [(1, 9, "!!! ---"), (2, 9, "")]) == []


def test_bad_k_raises(spark):
    df = spark.createDataFrame([(1, 2, "a")], "src long, dst long, anchor string")
    with pytest.raises(ValueError):
        anchor_topk(df, k=0)


def test_divergence_matches_reference(spark):
    from fujishadergpu_spark.operators.anchors import anchor_body_divergence

    links = [
        (1, 10, "apple pie recipes"),    # all supported by doc 10
        (2, 10, "casino CASINO bonus"),  # stuffed terms, absent from body
        (3, 11, "anything here"),        # doc 11 has empty body
        (4, 12, "plain words"),          # target 12 has no doc row at all
    ]
    docs = [(10, "best apple pie recipes, baked daily"), (11, "")]
    ldf = spark.createDataFrame(links, "src long, dst long, anchor string")
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["target"]: (r["n_terms"], r["anchor_mass"], r["unsupported_mass"], r["unsupported_q6"])
        for r in anchor_body_divergence(ldf, ddf).collect()
    }

    def ref(target):
        counts = {}
        for _s, d, a in links:
            if d != target:
                continue
            for t in re.split(r"[^a-z0-9]+", a.lower()):
                if t:
                    counts[t] = counts.get(t, 0) + 1
        body = set()
        for i, txt in docs:
            if i == target:
                body |= {t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t}
        mass = sum(counts.values())
        uns = sum(n for t, n in counts.items() if t not in body)
        return (len(counts), mass, uns, (uns * 10**6) // mass)

    assert got == {t: ref(t) for t in (10, 11, 12)}
    # the signal: clean target low, stuffed/unbacked targets pegged
    assert got[10][3] == 500000        # casino+casino+bonus = 3 of 6
    assert got[11][3] == 10**6 and got[12][3] == 10**6


def test_divergence_tokenizer_parity_no_punct_fakes(spark):
    from fujishadergpu_spark.operators.anchors import anchor_body_divergence

    ldf = spark.createDataFrame([(1, 5, "Apple-Pie!")], "src long, dst long, anchor string")
    ddf = spark.createDataFrame([(5, "apple... (pie)")], "doc_id long, text string")
    r = anchor_body_divergence(ldf, ddf).collect()[0]
    assert (r["unsupported_mass"], r["unsupported_q6"]) == (0, 0)
