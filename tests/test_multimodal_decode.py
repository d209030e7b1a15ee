"""Unit tests for the REAL WAV PCM decoder (multimodal round-4 tier).

The registry-level oracle test already value-gates multimodal_wav_pcm_stats
end-to-end; these tests pin the decoder's container-walking behavior on
inputs the synthesizer never produces: extra chunks, odd-size padding,
and malformed payloads.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest


def _wav(samples: np.ndarray, sr: int = 8000, extra_chunks: bytes = b"") -> bytes:
    """Build a 16-bit PCM WAV around an (n_frames, n_ch) int matrix."""
    n_ch = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    block_align = n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, sr, sr * block_align, block_align, 16)
    body = (
        b"WAVE"
        + extra_chunks
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_one(spark, payload: bytes):
    from pyspark.sql import types as T

    from energy_datalake_solution_spark.operators.multimodal import (
        decode_wav_pcm_stats,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    df = spark.createDataFrame([(1, bytearray(payload))], schema)
    return decode_wav_pcm_stats(df).collect()


def test_decodes_stereo_samples_exactly(spark):
    left = np.array([0, 100, -100, 32767, -32768], dtype=np.int64)
    right = np.array([5, -5, 250, -250, 0], dtype=np.int64)
    rows = _decode_one(spark, _wav(np.stack([left, right], axis=1), sr=44100))
    assert [r["channel"] for r in rows] == [0, 1]
    for r, ch in zip(rows, (left, right)):
        assert r["n_frames"] == 5
        assert r["sample_rate"] == 44100
        assert r["peak_amp"] == int(np.abs(ch).max())
        assert r["mean_amp"] == pytest.approx(ch.mean(), abs=1e-6)
        assert r["rms_amp"] == pytest.approx(np.sqrt((ch.astype(float) ** 2).mean()), abs=1e-6)


def test_skips_unknown_and_odd_sized_chunks(spark):
    # a 3-byte LIST chunk forces the word-alignment (size & 1) padding path;
    # the decoder must still find fmt/data after it
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    mono = np.array([[7], [-7], [21]], dtype=np.int64)
    rows = _decode_one(spark, _wav(mono, sr=16000, extra_chunks=extra))
    assert len(rows) == 1
    assert rows[0]["n_frames"] == 3
    assert rows[0]["peak_amp"] == 21


@pytest.mark.parametrize(
    "payload",
    [
        b"\x89PNG\r\n\x1a\nnot audio",  # wrong container
        b"RIFF\x04\x00\x00\x00WAVE",  # no fmt/data chunks
    ],
)
def test_malformed_payload_raises(spark, payload):
    with pytest.raises(Exception, match="not a RIFF/WAVE|missing fmt/data"):
        _decode_one(spark, payload)
