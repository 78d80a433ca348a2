"""Builtin image (PNG/BMP/PPM) and audio (WAV) codecs — round-trip
laws, foreign-file decode (PNG filters 1-4, top-down BMP, commented
PPM, extensible/odd-chunk WAV), the explicit rejection surface that
routes exotic formats to Pillow/soundfile, and interop cross-checks
when those libraries are present. These codecs replace the round-8
``decode_image``/``decode_audio`` stubs (multimodal.py), following the
sources/tiff.py pattern."""

import struct
import zlib

import numpy as np
import pytest

from sklearn_raster_spark.sources.audio import decode_audio, decode_wav, encode_wav
from sklearn_raster_spark.sources.image import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("shape", [(5, 9), (5, 9, 2), (5, 9, 3), (5, 9, 4)])
def test_png_roundtrip_all_color_types(shape):
    img = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img))
    assert back.shape == img.shape and back.dtype == np.uint8
    assert np.array_equal(back, img)


def test_png_foreign_filters_decode():
    """Hand-filter scanlines with Sub/Up/Average/Paeth (PNG §9) — our
    encoder never emits them, but foreign encoders prefer them; the
    decoder must invert each exactly."""
    h, w, bpp = 6, 5, 3
    img = RNG.integers(0, 256, size=(h, w, bpp), dtype=np.uint8)
    flat = img.reshape(h, w * bpp).astype(np.int16)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = bytearray()
    filters = [1, 2, 3, 4, 0, 4]
    prev = np.zeros(w * bpp, np.int16)
    for y in range(h):
        ft, rec = filters[y], flat[y]
        raw.append(ft)
        for x in range(w * bpp):
            left = int(rec[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                v = rec[x]
            elif ft == 1:
                v = rec[x] - left
            elif ft == 2:
                v = rec[x] - up
            elif ft == 3:
                v = rec[x] - (left + up) // 2
            else:
                v = rec[x] - paeth(left, up, ul)
            raw.append(int(v) & 0xFF)
        prev = rec

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_png_rejection_and_corruption():
    img = RNG.integers(0, 256, size=(3, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    data[20] ^= 0xFF  # flip a byte inside IHDR -> CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    # 16-bit depth is out of builtin scope

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_png(deep)
    with pytest.raises(ValueError):
        encode_png(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2), np.float32))


def test_bmp_roundtrip_gray_and_rgb_and_topdown():
    rgb = RNG.integers(0, 256, size=(4, 7, 3), dtype=np.uint8)  # odd width: padding
    assert np.array_equal(decode_bmp(encode_bmp(rgb)), rgb)
    gray = RNG.integers(0, 256, size=(3, 5), dtype=np.uint8)
    back = decode_bmp(encode_bmp(gray))
    assert np.array_equal(back, np.repeat(gray[:, :, None], 3, axis=2))

    # top-down variant (negative height) — foreign writers produce it
    data = bytearray(encode_bmp(rgb))
    data[22:26] = struct.pack("<i", -rgb.shape[0])
    rows = np.frombuffer(bytes(data[54:]), np.uint8)
    stride = (rgb.shape[1] * 3 + 3) & ~3
    flipped = rows.reshape(rgb.shape[0], stride)[::-1].tobytes()
    assert np.array_equal(decode_bmp(bytes(data[:54]) + flipped), rgb)

    with pytest.raises(NotImplementedError, match="Pillow"):
        bad = bytearray(encode_bmp(rgb))
        bad[28:30] = struct.pack("<H", 8)  # 8-bpp palette
        decode_bmp(bytes(bad))


def test_ppm_roundtrip_and_comment_header():
    gray = RNG.integers(0, 256, size=(6, 4), dtype=np.uint8)
    rgb = RNG.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    # netpbm headers may carry comments between fields
    commented = b"P5\n# made by hand\n4 6\n# and another\n255\n" + gray.tobytes()
    assert np.array_equal(decode_ppm(commented), gray)
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_ppm(b"P5\n2 2\n65535\n" + b"\x00" * 8)


def test_decode_image_sniffs_magic():
    img = RNG.integers(0, 256, size=(3, 4), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    assert decode_image(encode_bmp(img)).shape == (3, 4, 3)
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\xff\xd8\xff\xe0 jpeg header")
    with pytest.raises(ValueError):
        decode_image(b"")


@pytest.mark.parametrize(
    "dtype,shape",
    [
        (np.uint8, (400,)),
        (np.int16, (400,)),
        (np.int32, (127,)),       # odd byte count at 8-bit? no — exercises sizes
        (np.float32, (50,)),
        (np.int16, (100, 2)),     # stereo interleave
        (np.uint8, (33,)),        # odd data length -> RIFF pad byte
    ],
)
def test_wav_roundtrip(dtype, shape):
    if np.issubdtype(dtype, np.floating):
        samples = RNG.normal(size=shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        samples = RNG.integers(info.min, info.max, size=shape, dtype=dtype)
    data = encode_wav(samples, 16000)
    back, rate = decode_wav(data)
    assert rate == 16000 and back.dtype == samples.dtype
    assert back.shape == samples.shape and np.array_equal(back, samples)


def test_wav_foreign_chunks_and_extensible():
    """Real WAVs carry LIST/fact metadata chunks and sometimes the
    WAVE_FORMAT_EXTENSIBLE wrapper; the chunk walk must skip/unwrap."""
    samples = RNG.integers(-500, 500, size=(64,), dtype=np.int16)
    base = encode_wav(samples, 44100)
    fmt_payload = base[20:36]
    data_chunk = base[36:]
    listc = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len + pad
    # extensible: format 0xFFFE, 40-byte fmt with PCM GUID prefix
    ext = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 44100, 88200, 2, 16)
        # cbSize=22, wValidBitsPerSample=16, dwChannelMask, then the
        # 16-byte SubFormat GUID whose first 2 bytes are the PCM code
        + struct.pack("<HHI", 22, 16, 0x4) + struct.pack("<H", 1) + b"\x00" * 14
    )
    rebuilt_body = (
        b"WAVE"
        + listc
        + b"fmt " + struct.pack("<I", len(ext)) + ext
        + data_chunk
    )
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt_body)) + rebuilt_body
    back, rate = decode_wav(rebuilt)
    assert rate == 44100 and np.array_equal(back, samples)

    # compressed formats are soundfile territory (mu-law — the old
    # example here — expands builtin since the round-9 continuation)
    bad_fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # MS ADPCM
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + bad_fmt
        + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"OggS definitely not riff")
    del fmt_payload


def test_pillow_interop():
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = RNG.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    assert np.array_equal(np.asarray(PIL.open(io.BytesIO(encode_png(img)))), img)
    assert np.array_equal(np.asarray(PIL.open(io.BytesIO(encode_bmp(img)))), img)


def test_soundfile_interop():
    soundfile = pytest.importorskip("soundfile")
    import io

    samples = RNG.integers(-1000, 1000, size=(256,), dtype=np.int16)
    back, rate = soundfile.read(io.BytesIO(encode_wav(samples, 8000)), dtype="int16")
    assert rate == 8000 and np.array_equal(back, samples)


def _wav_container(fmt_code, ch, rate, bits, pcm):
    block = ch * (bits // 8)
    fmt_chunk = struct.pack("<HHIIHH", fmt_code, ch, rate, rate * block, block, bits)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_g711_known_vectors():
    """G.711 expansion pinned to the canonical CCITT table anchors:
    a-law 0x55/0xD5 are -8/+8, mu-law 0x00/0x80 are -32124/+32124 and
    0xFF/0x7F are the two zeros."""
    alaw_bytes = bytes([0x55, 0xD5, 0x2A, 0xAA])
    samples, rate = decode_wav(_wav_container(6, 1, 8000, 8, alaw_bytes))
    assert rate == 8000 and samples.dtype == np.int16
    assert samples[0] == -8 and samples[1] == 8
    # 0x2A/0xAA differ only in the sign bit: symmetric magnitudes
    assert samples[2] < 0 < samples[3] and samples[2] == -samples[3]

    ulaw_bytes = bytes([0x00, 0x80, 0xFF, 0x7F])
    samples, _ = decode_wav(_wav_container(7, 1, 8000, 8, ulaw_bytes))
    assert samples.dtype == np.int16
    assert samples[0] == -32124 and samples[1] == 32124
    assert samples[2] == 0 and samples[3] == 0


def test_wav_g711_matches_audioop_when_available():
    audioop = pytest.importorskip("audioop")
    all_codes = bytes(range(256))
    ours_a, _ = decode_wav(_wav_container(6, 1, 8000, 8, all_codes))
    theirs_a = np.frombuffer(audioop.alaw2lin(all_codes, 2), np.int16)
    assert np.array_equal(ours_a, theirs_a)
    ours_u, _ = decode_wav(_wav_container(7, 1, 8000, 8, all_codes))
    theirs_u = np.frombuffer(audioop.ulaw2lin(all_codes, 2), np.int16)
    assert np.array_equal(ours_u, theirs_u)


def test_wav_24bit_pcm():
    vals = np.array([0, 1, -1, 8388607, -8388608, 70000, -70000], np.int32)
    packed = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    samples, rate = decode_wav(_wav_container(1, 1, 44100, 24, packed))
    assert rate == 44100 and samples.dtype == np.int32
    assert np.array_equal(samples, vals)
    # stereo interleave: (n, 2) with channels split correctly
    stereo, _ = decode_wav(_wav_container(1, 2, 44100, 24, packed + packed[:3]))
    assert stereo.shape == (4, 2)
    assert np.array_equal(stereo[:, 0], vals[0::2])
    assert np.array_equal(stereo[:, 1], np.append(vals[1::2], 0))
