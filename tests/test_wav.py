"""RIFF/WAVE codec (functions/wav.py) + audio multimodal operators."""

import io
import struct
import wave

import numpy as np
import pytest

from osm_chordify_spark.functions.wav import decode_wav, encode_wav
from osm_chordify_spark.operators import multimodal as MM


def _sig(n=777, channels=2, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, size=(n, channels)).astype(np.int16)


def test_roundtrip_mono_and_stereo():
    for ch in (1, 2, 4):
        s = _sig(channels=ch, seed=ch)
        arr, rate = decode_wav(encode_wav(s, sample_rate=22050))
        assert rate == 22050
        np.testing.assert_array_equal(arr, s)


def test_stdlib_wave_reads_our_encoding():
    s = _sig(channels=2)
    with wave.open(io.BytesIO(encode_wav(s, sample_rate=16000))) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (2, 2, 16000)
        assert w.getnframes() == len(s)
        raw = w.readframes(w.getnframes())
    np.testing.assert_array_equal(
        np.frombuffer(raw, dtype="<i2").reshape(-1, 2), s
    )


def test_we_read_stdlib_wave_encoding():
    s = _sig(channels=1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(s.astype("<i2").tobytes())
    arr, rate = decode_wav(buf.getvalue())
    assert rate == 44100
    np.testing.assert_array_equal(arr, s)


def test_extra_chunks_and_pad_byte_tolerated():
    s = _sig(n=5, channels=1)
    b = encode_wav(s)
    # splice an odd-sized LIST chunk (needs a pad byte) before data
    head, data_at = b[:12], b.index(b"data")
    fmtchunk = b[12:data_at]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = head + fmtchunk + extra + b[data_at:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    arr, _ = decode_wav(spliced)
    np.testing.assert_array_equal(arr, s)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],                       # truncated header
        lambda b: b"JUNK" + b[4:],              # not RIFF
        lambda b: b.replace(b"WAVE", b"AVI "),  # not WAVE
        lambda b: b.replace(b"fmt ", b"xmt "),  # missing fmt
        lambda b: b[:40],                       # data chunk overruns
        lambda b: b.replace(                    # 8-bit PCM unsupported
            struct.pack("<H", 16) + b"data", struct.pack("<H", 8) + b"data"
        ),
    ],
)
def test_malformed_raises_valueerror(mutate):
    b = encode_wav(_sig(n=9, channels=1))
    with pytest.raises(ValueError):
        decode_wav(mutate(b))


def test_encode_rejects_out_of_range():
    with pytest.raises(ValueError):
        encode_wav(np.array([70000, 2]))


def test_audio_features_match_numpy_reference(spark):
    from pyspark.sql import functions as F

    ids = spark.range(20).select(F.col("id").alias("doc_id"))
    feats = MM.decode_audio_features(MM.synthesize_wav_media(ids))
    got = {(r["doc_id"], r["channel"]): r for r in feats.collect()}
    for i in range(20):
        n, channels, rate = 400 + (i % 7) * 53, 1 + i % 2, 8000 * (1 + i % 3)
        idx = np.arange(n, dtype=np.int64)
        for ch in range(channels):
            v = ((i * 7349 + ch * 131071 + idx * 104729) % 65536) - 32768
            r = got[(i, ch)]
            assert r["sample_rate"] == rate and r["n_samples"] == n
            assert r["peak_abs"] == int(np.max(np.abs(v)))
            assert r["sum_abs"] == int(np.sum(np.abs(v)))
            assert r["zero_crossings"] == int(np.sum(v[1:] * v[:-1] < 0))
    assert len(got) == sum(1 + i % 2 for i in range(20))


def test_corrupt_payload_yields_null_row_not_crash(spark):
    from pyspark.sql import functions as F

    ids = spark.range(6).select(F.col("id").alias("doc_id"))
    media = MM.synthesize_wav_media(ids).withColumn(
        "media",
        F.when(F.col("doc_id") == 3, F.lit(b"JUNKJUNKJUNK")).otherwise(
            F.col("media")
        ),
    )
    rows = MM.decode_audio_features(media).collect()
    bad = [r for r in rows if r["doc_id"] == 3]
    assert len(bad) == 1 and bad[0]["channel"] is None
    assert all(r["peak_abs"] is not None for r in rows if r["doc_id"] != 3)
