"""PII scrubbing: regex redaction of emails / phone numbers / IPv4 addresses.

Every public LLM data pipeline (CCNet, Dolma, RefinedWeb) runs a regex PII
pass before training; this is that operator, JVM-side end to end — Spark's
``regexp_replace``/``regexp_count`` compile once per task and stream through
codegen, so the pass is scan-bound (the ideal 100 TB regime: no shuffle at
all for the per-document form, one map-side-combined aggregate for the
report form).

The synthetic corpus contains no organic PII, so — exactly like the
multimodal tier's spec-valid WAV/BMP payloads — deterministic PII is
INJECTED from doc_id arithmetic (every doc gets an email, every 2nd a
phone, every 3rd an IPv4) and the oracle mirrors the same injection and
the same regexes. This keeps the gate honest: the two engines' regex
dialects (Java util.regex vs RE2) must agree on these patterns, the
redaction order is fixed (email → phone → IP, so overlapping-class bugs
surface), and a single count or replacement drift fails the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

# Dialect-portable patterns: \d, {m,n}, \b and literal classes behave
# identically in Java regex (Spark) and RE2 (DuckDB). No lookaround, no
# backreferences — RE2 has neither.
EMAIL_RE = r"[a-z0-9._]+@[a-z0-9]+\.[a-z]+"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_INJECT_SQL = """
        WITH seeded AS (
            SELECT doc_id, source,
                   text || ' reach me at user' || doc_id || '@mail'
                        || (doc_id % 7) || '.com'
                        || CASE WHEN doc_id % 2 = 0
                                THEN ' or call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                                ELSE '' END
                        || CASE WHEN doc_id % 3 = 0
                                THEN ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
                                ELSE '' END AS text
            FROM documents
        )
"""


def _inject_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic doc_id-derived PII appended (the Spark
    twin of _INJECT_SQL's seeded CTE)."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" reach me at user"),
        did.cast("string"),
        F.lit("@mail"),
        (did % 7).cast("string"),
        F.lit(".com"),
    )
    phone = F.when(
        did % 2 == 0,
        F.concat(
            F.lit(" or call 555-010-"), F.lpad((did % 10000).cast("string"), 4, "0")
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(" from 10."),
            (did % 256).cast("string"),
            F.lit(".0."),
            (did % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return d.select(
        "doc_id", "source", F.concat(F.col("text"), email, phone, ip).alias("text")
    )


def scrub_columns(text=None) -> list:
    """The scrub as reusable Column expressions (n_emails, n_phones, n_ips,
    clean_text) — the single definition shared by the batch query and the
    streaming twin (streaming/pipeline.py::scrub_stream_pii), so the two
    can never drift. Stateless per-row codegen; applies unchanged to a
    micro-batch."""
    text = F.col("text") if text is None else text
    no_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(
        F.regexp_replace(no_email, PHONE_RE, "<PHONE>"), IPV4_RE, "<IP>"
    )
    return [
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(text, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(no_email, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        clean.alias("clean_text"),
    ]


@register(
    "docs_pii_redaction",
    oracle=_INJECT_SQL
    + f"""
        SELECT doc_id, source,
               len(regexp_extract_all(text, '{EMAIL_RE}'))::BIGINT AS n_emails,
               len(regexp_extract_all(text, '{PHONE_RE}'))::BIGINT AS n_phones,
               len(regexp_extract_all(
                   regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{IPV4_RE}'))::BIGINT AS n_ips,
               regexp_replace(regexp_replace(regexp_replace(
                   text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                         '{PHONE_RE}', '<PHONE>', 'g'),
                         '{IPV4_RE}', '<IP>', 'g') AS clean_text
        FROM seeded
    """,
    headline=True,
    tags=("documents", "pii", "scrubbing"),
)
def docs_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails, phone numbers, and IPv4 addresses from every document,
    emitting the scrubbed text plus per-class counts. IP counting runs AFTER
    email redaction (on the email-scrubbed text) so a dotted mail host can
    never double-count as an address — the fixed email → phone → IP order is
    part of the contract and of the oracle. Pure per-row codegen: no
    shuffle, scan-bound at any scale."""
    seeded = _inject_pii(spark, sf_dir)
    return seeded.select("doc_id", "source", *scrub_columns())


@register(
    "docs_pii_report",
    oracle=_INJECT_SQL
    + f"""
        , per_doc AS (
            SELECT doc_id, source,
                   len(regexp_extract_all(text, '{EMAIL_RE}'))::BIGINT AS n_emails,
                   len(regexp_extract_all(text, '{PHONE_RE}'))::BIGINT AS n_phones,
                   len(regexp_extract_all(
                       regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{IPV4_RE}'))::BIGINT AS n_ips
            FROM seeded
        )
        SELECT source,
               count(*)::BIGINT AS n_docs,
               sum(n_emails)::BIGINT AS total_emails,
               sum(n_phones)::BIGINT AS total_phones,
               sum(n_ips)::BIGINT AS total_ips,
               sum(CASE WHEN n_emails + n_phones + n_ips > 0 THEN 1 ELSE 0 END)::BIGINT
                   AS docs_with_pii
        FROM per_doc
        GROUP BY source
    """,
    tags=("documents", "pii", "agg"),
)
def docs_pii_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure report (the compliance dashboard a scrub run
    produces): documents scanned, redactions by class, and how many docs
    carried any PII at all. One map-side-combined aggregate over the same
    scan-bound per-row counts as docs_pii_redaction."""
    per_doc = docs_pii_redaction(spark, sf_dir)
    any_pii = (F.col("n_emails") + F.col("n_phones") + F.col("n_ips") > 0).cast("long")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_phones").alias("total_phones"),
        F.sum("n_ips").alias("total_ips"),
        F.sum(any_pii).alias("docs_with_pii"),
    )
