"""Multimodal column operators — binary payloads with typed metadata.

Images/audio/video travel as opaque ``binary`` columns plus a metadata
struct (mime, width/height or sample_rate, n_frames).  The Spark-side
plumbing — schemas, Arrow batch shapes, partition-size control — is
real and tested; the actual codec calls are STUBBED deterministically
because no image/audio libraries exist in this container (each stub is
clearly marked and raises/echoes by contract, so swapping in PIL/
ffmpeg-style decoders later only touches the marked lines).

Operators:
* attach_media_metadata — parse the deterministic header of a payload
  into a typed struct (pure kernel, no stub)
* decode_image_stub     — "decode" → (width, height, mean_byte) via a
                          deterministic fake; real_decode=True runs the
                          REAL from-scratch PNG decoder
                          (functions/png.py — 8-bit gray/RGB/±alpha,
                          javax.imageio-verified); formats beyond PNG
                          remain stubbed (null rows)
* synthesize_png_media  — deterministic REAL PNG payloads (encoder from
                          functions/png.py) for the real-decode path
* resize_image          — real nearest-neighbor resize of PNG payloads
                          (decode → index-map resize → re-encode)
* sample_frames         — frame-offset sampling over a binary video
                          payload (real byte math, stub pixel decode)
* media_feature_vector  — fixed-length byte-histogram feature (real
                          math — usable for the ANN operators)
* synthesize_wav_media /
  decode_audio_features — REAL RIFF/WAVE PCM16 codec path
                          (functions/wav.py); lossy audio (MP3/AAC)
                          stays stubbed (null rows) like non-PNG images
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_SCHEMA = "mime string, width int, height int, n_bytes int"


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media payloads: a 16-byte header
    (mime tag, width, height) + pseudo-random body derived from the id —
    gives the decode plumbing real bytes to chew on."""

    @F.pandas_udf("binary")
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            rng = np.random.default_rng(int(i))
            w, h = 16 + int(i) % 64, 16 + (int(i) * 7) % 64
            header = b"IMG0" + int(w).to_bytes(4, "little") + int(h).to_bytes(
                4, "little"
            ) + b"\x00\x00\x00\x00"
            body = rng.integers(0, 256, size=w * h // 4, dtype=np.uint8).tobytes()
            out.append(header + body)
        return pd.Series(out)

    return df.withColumn("media", make(F.col(id_col)))


def attach_media_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """binary → typed metadata struct (real parsing, no stub)."""

    @F.pandas_udf(METADATA_SCHEMA)
    def meta(payload: pd.Series) -> pd.DataFrame:
        rows = []
        for b in payload:
            if b is None or len(b) < 16 or bytes(b[:4]) != b"IMG0":
                rows.append((None, None, None, len(b) if b is not None else None))
                continue
            w = int.from_bytes(bytes(b[4:8]), "little")
            h = int.from_bytes(bytes(b[8:12]), "little")
            rows.append(("image/fake", w, h, len(b)))
        return pd.DataFrame(rows, columns=["mime", "width", "height", "n_bytes"])

    return df.withColumn("media_meta", meta(F.col(media_col)))


def synthesize_png_media(df: DataFrame, id_col: str = "doc_id",
                         channels: int = 3) -> DataFrame:
    """Deterministic REAL PNG payloads (per-id seeded PCG64 pixels →
    functions/png.py encoder, mixed scanline filters) — the real-decode
    path's generator.  Pixel stats are re-derivable from the id with
    NumPy alone, so decode correctness is oracle-checkable without the
    codec (the fixture generator never imports the codec)."""
    from osm_chordify_spark.functions import png as _png

    @F.pandas_udf("binary")
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            rng = np.random.default_rng(int(i))
            w, h = 16 + int(i) % 32, 16 + (int(i) * 7) % 32
            arr = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
            out.append(_png.encode_png(arr, filter_type="mixed"))
        return pd.Series(out)

    return df.withColumn("media", make(F.col(id_col)))


def decode_image_stub(df: DataFrame, media_col: str = "media",
                      real_decode: bool = False) -> DataFrame:
    """Decode plumbing: Arrow-batched binary → per-image stats.

    With ``real_decode=True`` the kernel runs the REAL from-scratch PNG
    decoder (``functions/png.py``: stdlib zlib inflate + NumPy
    unfilter, verified byte-for-byte against javax.imageio in tests);
    payloads that are not decodable 8-bit PNGs yield null rows.
    Formats beyond PNG (JPEG et al.) remain honestly STUBBED — they
    need entropy-coding tables out of scope for this container.  The
    default fake path computes mean/std over the IMG0 body bytes so
    downstream code has deterministic columns to operate on."""

    @F.pandas_udf("width int, height int, mean_px double, std_px double")
    def decode(payload: pd.Series) -> pd.DataFrame:
        rows = []
        if real_decode:
            from osm_chordify_spark.functions import png as _png

            for b in payload:
                try:
                    arr = _png.decode_png(bytes(b)) if b is not None else None
                except ValueError:
                    arr = None
                if arr is None:
                    rows.append((None, None, None, None))
                else:
                    rows.append(
                        (arr.shape[1], arr.shape[0],
                         float(arr.mean()), float(arr.std()))
                    )
            return pd.DataFrame(
                rows, columns=["width", "height", "mean_px", "std_px"]
            )
        for b in payload:
            if b is None or len(b) < 16:
                rows.append((None, None, None, None))
                continue
            w = int.from_bytes(bytes(b[4:8]), "little")
            h = int.from_bytes(bytes(b[8:12]), "little")
            body = np.frombuffer(bytes(b[16:]), dtype=np.uint8)
            rows.append(
                (w, h, float(body.mean()) if len(body) else 0.0,
                 float(body.std()) if len(body) else 0.0)
            )
        return pd.DataFrame(rows, columns=["width", "height", "mean_px", "std_px"])

    return df.withColumn("decoded", decode(F.col(media_col)))


def resize_image(df: DataFrame, out_w: int, out_h: int,
                 media_col: str = "media") -> DataFrame:
    """Real resize over PNG payloads: decode → nearest-neighbor index
    map → re-encode.  Undecodable payloads pass through as null."""
    from osm_chordify_spark.functions import png as _png

    @F.pandas_udf("binary")
    def rz(payload: pd.Series) -> pd.Series:
        out = []
        for b in payload:
            try:
                arr = _png.decode_png(bytes(b)) if b is not None else None
            except ValueError:
                arr = None
            out.append(
                None if arr is None
                else _png.encode_png(_png.resize_nearest(arr, out_w, out_h))
            )
        return pd.Series(out)

    return df.withColumn("media_resized", rz(F.col(media_col)))


def media_feature_vector(df: DataFrame, media_col: str = "media",
                         n_bins: int = 16) -> DataFrame:
    """Fixed-length byte-histogram embedding (real math): binary →
    array<float> normalized histogram, directly consumable by
    operators/ann.py."""

    @F.pandas_udf("array<float>")
    def hist(payload: pd.Series) -> pd.Series:
        out = []
        for b in payload:
            if b is None or len(b) <= 16:
                out.append([0.0] * n_bins)
                continue
            body = np.frombuffer(bytes(b[16:]), dtype=np.uint8)
            h, _ = np.histogram(body, bins=n_bins, range=(0, 256))
            v = h.astype(np.float64)
            norm = np.linalg.norm(v)
            out.append((v / norm if norm > 0 else v).astype(np.float32).tolist())
        return pd.Series(out)

    return df.withColumn("media_embedding", hist(F.col(media_col)))


def sample_frames(df: DataFrame, media_col: str = "media",
                  frame_bytes: int = 64, n_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing: evenly spaced byte-window "frames" from
    the payload, exploded one row per frame (the mapInPandas batch shape
    a real video pipeline uses; pixel decode itself is the stub above)."""

    @F.pandas_udf("array<struct<frame_idx: int, frame: binary>>")
    def frames(payload: pd.Series) -> pd.Series:
        out = []
        for b in payload:
            if b is None or len(b) <= 16 + frame_bytes:
                out.append([])
                continue
            body = bytes(b[16:])
            step = max((len(body) - frame_bytes) // max(n_frames - 1, 1), 1)
            out.append(
                [
                    {"frame_idx": i, "frame": body[i * step : i * step + frame_bytes]}
                    for i in range(n_frames)
                    if i * step + frame_bytes <= len(body)
                ]
            )
        return pd.Series(out)

    return (
        df.withColumn("__frames", frames(F.col(media_col)))
        .withColumn("frame", F.explode("__frames"))
        .drop("__frames")
        .select("*", F.col("frame.frame_idx").alias("frame_idx"),
                F.col("frame.frame").alias("frame_bytes"))
        .drop("frame")
    )


# ---------------------------------------------------------------------------
# audio: real RIFF/WAVE PCM16 path (functions/wav.py), PNG-style contract


def synthesize_wav_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL WAV payloads for the audio-decode path.

    Sample values are a closed-form function of (id, channel, index):
    ``((id*7349 + ch*131071 + i*104729) % 65536) - 32768`` — pure
    bigint arithmetic, so an SQL oracle can re-derive every decoded
    feature without ever touching the codec (mirrors the PNG fixture
    discipline).  Mono/stereo, sample-rate and length all vary by id
    so the decoder's fmt/data parsing is actually load-bearing.
    """
    from osm_chordify_spark.functions import wav as _wav

    @F.pandas_udf("binary")
    def make(ids: pd.Series) -> pd.Series:
        out = []
        for raw in ids:
            i = int(raw)
            n = 400 + (i % 7) * 53
            channels = 1 + i % 2
            rate = 8000 * (1 + i % 3)
            idx = np.arange(n, dtype=np.int64)
            chans = [
                ((i * 7349 + ch * 131071 + idx * 104729) % 65536) - 32768
                for ch in range(channels)
            ]
            samples = np.stack(chans, axis=1).astype(np.int16)
            out.append(_wav.encode_wav(samples, sample_rate=rate))
        return pd.Series(out)

    return df.withColumn("media", make(F.col(id_col)))


AUDIO_FEATURE_SCHEMA = (
    "channel bigint, sample_rate bigint, n_samples bigint, "
    "peak_abs bigint, sum_abs bigint, zero_crossings bigint"
)


def decode_audio_features(df: DataFrame, media_col: str = "media",
                          id_col: str = "doc_id") -> DataFrame:
    """REAL audio decode: WAV bytes → one row per (id, channel) of
    integer features (peak/sum of |s|, strict sign-flip zero
    crossings).  All-bigint output hashes identically in any engine.
    Malformed payloads (ValueError from the codec) yield ONE null-
    feature row per id — a corrupt crawl payload never kills the job.
    """
    from osm_chordify_spark.functions import wav as _wav

    out_schema = f"{id_col} bigint, {AUDIO_FEATURE_SCHEMA}"

    def kernel(batches):
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[media_col]):
                i = int(i)
                try:
                    if b is None:
                        raise ValueError("null payload")
                    arr, rate = _wav.decode_wav(bytes(b))
                except ValueError:
                    rows.append((i, None, None, None, None, None, None))
                    continue
                a64 = arr.astype(np.int64)
                for ch in range(arr.shape[1]):
                    v = a64[:, ch]
                    rows.append((
                        i, ch, rate, len(v),
                        int(np.max(np.abs(v))) if len(v) else 0,
                        int(np.sum(np.abs(v))),
                        int(np.sum(v[1:] * v[:-1] < 0)),
                    ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "channel", "sample_rate", "n_samples",
                         "peak_abs", "sum_abs", "zero_crossings"],
            )

    return df.select(id_col, media_col).mapInPandas(kernel, out_schema)
