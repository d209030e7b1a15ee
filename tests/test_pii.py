"""Unit tests for the PII scrub regexes on organic text the synthetic
corpus never produces (the oracle gate pins the injected cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_datalake_solution_spark.operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE


def _scrub(spark, text: str) -> tuple[str, int, int, int]:
    df = spark.createDataFrame([(text,)], ["text"])
    no_email = F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(
        F.regexp_replace(no_email, PHONE_RE, "<PHONE>"), IPV4_RE, "<IP>"
    )
    row = df.select(
        clean.alias("clean"),
        F.regexp_count(F.col("text"), F.lit(EMAIL_RE)).alias("e"),
        F.regexp_count(F.col("text"), F.lit(PHONE_RE)).alias("p"),
        F.regexp_count(no_email, F.lit(IPV4_RE)).alias("i"),
    ).collect()[0]
    return row.clean, row.e, row.p, row.i


def test_scrubs_multiple_mixed_pii(spark):
    clean, e, p, i = _scrub(
        spark,
        "mail a.b_c@host9.org and backup@mx.net, call 555-123-4567, "
        "server at 192.168.0.1 port 80",
    )
    assert e == 2 and p == 1 and i == 1
    assert "host9.org" not in clean and "@" not in clean
    assert "555-123-4567" not in clean
    assert "192.168.0.1" not in clean
    assert clean.count("<EMAIL>") == 2


def test_ip_counts_after_email_scrub_not_double_counted(spark):
    # the dotted mail host must not be counted or redacted as an IPv4
    clean, e, p, i = _scrub(spark, "write 1.2.3.4@44.com from 10.0.0.7")
    assert e == 1 and i == 1
    assert clean == "write <EMAIL> from <IP>"


def test_word_boundary_guards_ip(spark):
    # version strings with a trailing alpha segment still match the first
    # four octets (boundary is at the digit edge); a plain version number
    # inside a longer dotted run matches only a well-formed 4-octet window
    clean, _, _, i = _scrub(spark, "release v1.2.3 is out")
    assert i == 0
    assert "v1.2.3" in clean


def test_plain_text_untouched(spark):
    text = "no personal data here, just 42 tokens and a dash-word"
    clean, e, p, i = _scrub(spark, text)
    assert (clean, e, p, i) == (text, 0, 0, 0)


def test_scrub_is_idempotent_on_corpus(spark):
    """Scrubbing already-scrubbed text must change nothing — the replacement
    tokens must never re-match any pattern (a guard against e.g. an email
    regex loose enough to eat '<EMAIL>@host')."""
    from energy_datalake_solution_spark.operators.pii import scrub_columns
    from energy_datalake_solution_spark.plans.registry import QUERIES, get_queries

    from .conftest import SF_ORACLE

    get_queries()
    once = QUERIES["docs_pii_redaction"].fn(spark, SF_ORACLE).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = once.select("doc_id", *scrub_columns())
    diff = twice.where(
        (F.col("n_emails") != 0)
        | (F.col("n_phones") != 0)
        | (F.col("n_ips") != 0)
        | (F.col("clean_text") != F.col("text"))
    )
    assert diff.count() == 0
