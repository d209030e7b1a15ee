"""Scalar column helpers mirroring the reference's transform vocabulary.

All JVM-side built-ins (whole-stage-codegen friendly) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def categorize_like(col: Column, mapping: dict[str, str], default: str = "Other") -> Column:
    """CASE/LIKE contains-match categorizer.

    Mirrors the reference's customer-type canonicalization (CASE on
    ``LIKE '%Residencial%'`` etc. -> Residential/Commercial/Industrial/Other;
    reference: glue_jobs/dynamic-data-processor.py:88-92) as a reusable
    pattern->label mapper.
    """
    expr = None
    for pattern, label in mapping.items():
        cond = col.like(f"%{pattern}%")
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return (expr.otherwise(default) if expr is not None else F.lit(default))


def sha256_hex(col: Column) -> Column:
    """PII pseudonymization: SHA-256 hex digest of a (stringified) key.

    Mirrors reference: glue_jobs/dynamic-data-processor.py:94
    (``sha2(col('customer_id'), 256)``).
    """
    return F.sha2(col.cast("string"), 256)


def audit_columns(source_file: str, load_date: str) -> dict[str, Column]:
    """The audit-column block stamped on every processed table.

    Mirrors reference: glue_jobs/dynamic-data-processor.py:66-71 (and the
    identical blocks at :95-100, :119-126): load_timestamp_utc,
    source_file, load_date_partition.
    """
    return {
        "load_timestamp_utc": F.current_timestamp(),
        "source_file": F.lit(source_file),
        "load_date_partition": F.to_date(F.lit(load_date)),
    }
