"""PII scrub (functions/pii.py): per-rule redaction, sequential
count consistency, idempotence."""

from pyspark.sql import functions as F

from fujishadergpu_spark.functions.pii import scrub_pii


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return scrub_pii(df).collect()[0]


def test_each_rule_redacts_and_counts(spark):
    r = _one(
        spark,
        "mail bob.smith+x@sub.example.org call +44 123-456-7890 "
        "ssn 123-45-6789 host 192.168.0.1 done",
    )
    assert (r["n_emails"], r["n_phones"], r["n_ids"], r["n_ips"]) == (1, 1, 1, 1)
    assert r["text_clean"] == "mail <EMAIL> call <PHONE> ssn <ID> host <IP> done"
    assert r["has_pii"]


def test_email_digits_not_recounted_as_later_rules(spark):
    # the numeric local part vanishes with the email; nothing is left
    # for the phone/id/ip patterns to re-match
    r = _one(spark, "x 123-45-6789@example.com y")
    assert r["n_emails"] == 1 and r["n_ids"] == 0
    assert r["text_clean"] == "x <EMAIL> y"


def test_phone_consumed_before_id_rule(spark):
    # a 3-3-4 phone is scrubbed whole; its tail must not survive as a
    # partial 3-2-4 id match
    r = _one(spark, "call +1 555-123-4567 now")
    assert r["n_phones"] == 1 and r["n_ids"] == 0
    assert r["text_clean"] == "call <PHONE> now"


def test_clean_text_untouched(spark):
    r = _one(spark, "just ordinary words and a dot. nothing else")
    assert not r["has_pii"]
    assert r["text_clean"] == "just ordinary words and a dot. nothing else"


def test_scrub_is_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co and 10.0.0.1"), (2, "ssn 000-11-2222")], ["doc_id", "text"]
    )
    first = {
        r["doc_id"]: r["text_clean"]
        for r in scrub_pii(df).select("doc_id", "text_clean").collect()
    }
    once = scrub_pii(df).select("doc_id", F.col("text_clean").alias("text"))
    again = scrub_pii(once).collect()
    for r in again:
        assert not r["has_pii"], r
        # the second pass must leave the first pass's text unchanged
        assert r["text_clean"] == first[r["doc_id"]], r


def test_planted_corpus_counts(spark):
    """The registry's planted corpus: every doc_id % 4 == 0 doc gains
    exactly one email, % 5 one phone, % 6 one id, % 11 one ip."""
    from fujishadergpu_spark.queries import _pii_documents

    out = scrub_pii(_pii_documents(spark, "/root/testdata/sf0.001")).collect()
    for r in out:
        did = r["doc_id"]
        assert r["n_emails"] == (1 if did % 4 == 0 else 0), did
        assert r["n_phones"] == (1 if did % 5 == 0 else 0), did
        assert r["n_ids"] == (1 if did % 6 == 0 else 0), did
        assert r["n_ips"] == (1 if did % 11 == 0 else 0), did
        assert r["has_pii"] == (
            did % 4 == 0 or did % 5 == 0 or did % 6 == 0 or did % 11 == 0
        ), did
