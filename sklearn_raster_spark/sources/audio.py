"""Dependency-free WAV (RIFF PCM) codec for the multimodal audio path.

Mirrors sources/tiff.py and sources/image.py: the container ships no
soundfile/librosa, so the reader/writer below implement the public
RIFF/WAVE specification directly and ``decode_audio`` prefers
soundfile when the environment provides it. Scope:

- ``encode_wav``: mono/multichannel PCM — uint8 (8-bit), int16,
  int32, or float32 (IEEE-float format 3) samples.
- ``decode_wav``: walks RIFF chunks (skipping LIST/INFO/fact and any
  other metadata), reads PCM 8/16/24/32-bit, float32, and the G.711
  companded formats (a-law 6, mu-law 7 — expanded to int16 via the
  public CCITT reference curves); returns ``(samples, sample_rate)``
  with samples shaped (n,) for mono or (n, channels) otherwise.
  Compressed formats (MP3-in-WAV, ADPCM) raise
  ``NotImplementedError`` with a pointer to soundfile.

Decode runs on EXECUTORS inside mapInPandas kernels — payload bytes
never visit the driver.
"""

from __future__ import annotations

import struct

import numpy as np

# (format code, bits) -> numpy dtype. Format 1 = integer PCM (8-bit is
# unsigned, wider widths signed, per the spec); format 3 = IEEE float.
_WAV_DTYPE = {
    (1, 8): np.uint8,
    (1, 16): np.int16,
    (1, 32): np.int32,
    (3, 32): np.float32,
}
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """256-entry expansion tables for G.711 a-law and mu-law, computed
    from the public CCITT reference curves (the classic g711.c
    formulas). Returns (alaw_to_int16, ulaw_to_int16)."""
    codes = np.arange(256, dtype=np.int64)

    a = codes ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    # in A-law the 0x80 bit SET means positive
    alaw = np.where(a & 0x80, t, -t).astype(np.int16)

    u = ~codes & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    ulaw = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)
    return alaw, ulaw


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode samples as a canonical RIFF/WAVE file. Sample dtype picks
    the wire format: uint8 -> 8-bit PCM, int16/int32 -> PCM,
    float32 -> IEEE float. Shape (n,) is mono; (n, ch) interleaves."""
    samples = np.ascontiguousarray(samples)
    fmt_of = {np.dtype(np.uint8): 1, np.dtype(np.int16): 1,
              np.dtype(np.int32): 1, np.dtype(np.float32): 3}
    fmt = fmt_of.get(samples.dtype)
    if fmt is None:
        raise ValueError(f"unsupported sample dtype {samples.dtype}")
    if samples.ndim == 1:
        ch = 1
    elif samples.ndim == 2 and samples.shape[1] >= 1:
        ch = samples.shape[1]
    else:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    bits = samples.dtype.itemsize * 8
    block = ch * samples.dtype.itemsize
    data = samples.astype(samples.dtype.newbyteorder("<"), copy=False).tobytes()
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt, ch, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to (samples, sample_rate). Mono
    returns shape (n,); multichannel (n, channels). Dtype follows the
    wire format (uint8 / int16 / int32 / float32)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_fields, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("malformed fmt chunk")
            fmt_fields = struct.unpack("<HHIIHH", payload[:16])
            # WAVE_FORMAT_EXTENSIBLE wraps the real code in the
            # 16-byte SubFormat GUID (first 2 bytes, per the spec)
            if fmt_fields[0] == _WAVE_FORMAT_EXTENSIBLE and length >= 40:
                (sub,) = struct.unpack("<H", payload[24:26])
                fmt_fields = (sub,) + fmt_fields[1:]
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if fmt_fields is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    fmt, ch, rate, _byterate, _block, bits = fmt_fields
    if fmt in (6, 7) and bits == 8:  # G.711 a-law / mu-law
        alaw, ulaw = _g711_tables()
        table = alaw if fmt == 6 else ulaw
        samples = table[np.frombuffer(pcm, dtype=np.uint8)]
        n = len(samples) // ch
        samples = samples[: n * ch]
        return (samples if ch == 1 else samples.reshape(n, ch)), rate
    if fmt == 1 and bits == 24:  # packed 3-byte little-endian PCM
        n3 = (len(pcm) // (3 * ch)) * 3 * ch
        b = np.frombuffer(pcm, dtype=np.uint8, count=n3).reshape(-1, 3)
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        samples = np.where(v & 0x800000, v - (1 << 24), v).astype(np.int32)
        n = len(samples) // ch
        return (samples if ch == 1 else samples.reshape(n, ch)), rate
    dt = _WAV_DTYPE.get((fmt, bits))
    if dt is None:
        raise NotImplementedError(
            f"WAV format {fmt} ({bits}-bit) needs soundfile; builtin "
            "decoder reads PCM 8/16/24/32-bit, float32, and G.711 "
            "a-law/mu-law"
        )
    itemsize = np.dtype(dt).itemsize
    n = len(pcm) // (itemsize * ch)
    samples = np.frombuffer(pcm, dtype=np.dtype(dt).newbyteorder("<"),
                            count=n * ch).astype(dt, copy=False)
    return (samples if ch == 1 else samples.reshape(n, ch)), rate


def decode_audio(payload: bytes, mime: str | None = None) -> tuple[np.ndarray, int]:
    """Decode an audio payload to (samples, sample_rate), preferring
    soundfile when the environment provides it (FLAC/OGG coverage);
    the builtin WAV reader is the dependency-free baseline."""
    if payload is None or len(payload) < 12:
        raise ValueError("empty audio payload")
    payload = bytes(payload)
    try:
        import io

        import soundfile  # optional, like rasterio in sources/raster.py

        samples, rate = soundfile.read(io.BytesIO(payload), dtype="float32")
        return samples, int(rate)
    except ImportError:
        pass
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        f"audio container (magic {payload[:4]!r}) needs soundfile; "
        "builtin codec reads RIFF/WAVE PCM"
    )
