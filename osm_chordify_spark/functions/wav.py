"""From-scratch RIFF/WAVE PCM codec (no external audio libs).

Scope mirrors the PNG codec (``functions/png.py``): the container
format a crawl actually carries is parsed for real — RIFF framing,
``fmt `` chunk, interleaved 16-bit little-endian PCM — while lossy
codecs (MP3/AAC/Opus) stay honestly stubbed at the operator layer, as
their entropy coders are out of scope for this container.

Decoder contract: any malformed payload raises ``ValueError`` (never
``struct.error``/index garbage), so the operator layer can map corrupt
crawl payloads to null rows without killing the Spark job — the same
contract the PNG path pins in tests.

Reference scope: beyond-reference multimodal surface (the reference
engine is geometry-only); plumbing shape follows
``operators/multimodal.py``.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 samples ``(n_frames,)`` or ``(n_frames, channels)`` →
    canonical 44-byte-header RIFF/WAVE PCM16 file."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got {arr.ndim}-D")
    if arr.dtype != np.int16:
        if not np.array_equal(arr, arr.astype(np.int16)):
            raise ValueError("samples out of int16 range")
        arr = arr.astype(np.int16)
    n_frames, channels = arr.shape
    data = arr.astype("<i2").tobytes()  # interleaved frames
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", _FMT_PCM, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 array ``(n_frames, channels)``, sample_rate).

    Walks the chunk list (tolerating extra chunks like LIST/fact and
    the spec's odd-size pad byte), de-interleaves frames.  Only
    integer PCM16 is in scope; anything else raises ``ValueError``.
    """
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_size = struct.unpack_from("<I", b, 4)[0]
    end = min(len(b), 8 + riff_size)
    pos, fmt, data = 12, None, None
    while pos + 8 <= end:
        cid = b[pos:pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        chunk_end = pos + 8 + size
        if chunk_end > end:
            raise ValueError(f"chunk {cid!r} overruns payload")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", b, pos + 8)
        elif cid == b"data":
            data = b[pos + 8:chunk_end]
        pos = chunk_end + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if audio_format != _FMT_PCM or bits != 16:
        raise ValueError(f"unsupported format {audio_format}/{bits}-bit")
    if channels < 1 or block_align != channels * 2:
        raise ValueError(f"bad channels={channels} block_align={block_align}")
    n_frames = len(data) // block_align
    flat = np.frombuffer(data[: n_frames * block_align], dtype="<i2")
    return flat.reshape(n_frames, channels).astype(np.int16), sample_rate
