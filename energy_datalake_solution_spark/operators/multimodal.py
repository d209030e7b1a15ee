"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub behind `mapInPandas` — but everything Spark-side is real:
schema (binary + struct metadata), Arrow batch transfer, partition-preserving
pandas iteration, and the pattern of keeping large blobs out of shuffle keys.

At 100 TB: blobs live in their own column (parquet stores them contiguously;
column pruning means metadata-only queries never read the bytes), and every
shuffle/join key is a scalar (doc_id, digest) — the binary column is only
materialized inside the final map stage.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import register
from ..sources.catalog import load_table

if TYPE_CHECKING:
    import pandas as pd


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (utf-8 payload stands in for
    image/audio bytes) plus typed metadata, the canonical multimodal row
    shape: (id, payload binary, meta struct<format,n_bytes>)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("format"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_and_featurize(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode binary payloads and extract a feature vector via mapInPandas.

    `real_decode=True` would dispatch to an image/audio codec — not
    available in this container, so it raises; the default path computes a
    deterministic fake feature (byte histogram moments) so the Spark
    plumbing (Arrow batches, schema, partitioning) is fully exercised.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in it:
            if real_decode:
                raise NotImplementedError(
                    "codec decode (PIL/librosa/av) not available in this environment"
                )
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                arr = np.frombuffer(buf, dtype=np.uint8)
                # deterministic fake "embedding": first 4 byte-distribution moments
                feature = [
                    float(arr.mean()) if arr.size else 0.0,
                    float(arr.std()) if arr.size else 0.0,
                    float(arr.min()) if arr.size else 0.0,
                    float(arr.max()) if arr.size else 0.0,
                ]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(buf),
                        "payload_md5": hashlib.md5(buf).hexdigest(),
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(batches, DECODED_SCHEMA)


@register(
    "multimodal_payload_stats",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata path: byte length + digest of the payload.
    Computed via the mapInPandas decode pipeline (Arrow-batched), oracle'd
    against DuckDB's blob functions — proving the binary plumbing returns
    byte-identical payloads."""
    d = load_table(spark, sf_dir, "documents")
    decoded = decode_and_featurize(with_binary_payload(d))
    return decoded.select("doc_id", "n_bytes", "payload_md5")
