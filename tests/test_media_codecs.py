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
    # exotic color types stay Pillow territory (16-bit and Adam7 —
    # the old examples here — decode builtin since the round-9
    # continuation)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    exotic = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 7, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_png(exotic)
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
        # BI_JPEG (embedded codec) is the remaining pointed rejection
        # (16-bpp and BITFIELDS decode builtin as of round 11)
        bad[30:34] = struct.pack("<I", 4)
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


def _png_file(w, h, depth, color, raw_rows, extra_chunks=()):
    """Assemble a PNG from pre-filtered scanlines (filter byte 0)."""
    from sklearn_raster_spark.sources.image import _png_chunk, _PNG_SIG

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in raw_rows)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    for tag, payload in extra_chunks:
        out += _png_chunk(tag, payload)
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def test_png_palette_8bit_with_and_without_trns():
    rng = np.random.default_rng(21)
    w, h = 9, 5
    pal = rng.integers(0, 256, (7, 3)).astype(np.uint8)
    idx = rng.integers(0, 7, (h, w)).astype(np.uint8)
    rows = [idx[y].tobytes() for y in range(h)]
    png = _png_file(w, h, 8, 3, rows, [(b"PLTE", pal.tobytes())])
    back = decode_image(png)
    assert back.shape == (h, w, 3) and np.array_equal(back, pal[idx])

    trns = bytes([255, 0, 128])  # entries 0..2; rest default opaque
    png_a = _png_file(w, h, 8, 3, rows, [(b"PLTE", pal.tobytes()), (b"tRNS", trns)])
    back_a = decode_image(png_a)
    assert back_a.shape == (h, w, 4)
    alpha = np.full(7, 255, np.uint8)
    alpha[:3] = np.frombuffer(trns, np.uint8)
    assert np.array_equal(back_a[..., 3], alpha[idx])
    assert np.array_equal(back_a[..., :3], pal[idx])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_palette_subbyte_depths(depth):
    rng = np.random.default_rng(22)
    w, h, n_pal = 11, 4, 1 << depth
    pal = rng.integers(0, 256, (n_pal, 3)).astype(np.uint8)
    idx = rng.integers(0, n_pal, (h, w)).astype(np.uint8)
    rows = []
    for y in range(h):
        bits = np.unpackbits(idx[y][:, None], axis=1)[:, 8 - depth :]
        packed = np.packbits(bits.reshape(-1))
        rows.append(packed.tobytes())
    png = _png_file(w, h, depth, 3, rows, [(b"PLTE", pal.tobytes())])
    back = decode_image(png)
    assert back.shape == (h, w, 3) and np.array_equal(back, pal[idx])


def test_png_16bit_gray_and_rgb_high_byte():
    rng = np.random.default_rng(23)
    w, h = 6, 3
    g16 = rng.integers(0, 65536, (h, w)).astype(">u2")
    rows = [g16[y].tobytes() for y in range(h)]
    back = decode_image(_png_file(w, h, 16, 0, rows))
    assert back.shape == (h, w)
    assert np.array_equal(back, (g16.astype(np.uint32) >> 8).astype(np.uint8))

    rgb16 = rng.integers(0, 65536, (h, w, 3)).astype(">u2")
    rows = [rgb16[y].tobytes() for y in range(h)]
    back = decode_image(_png_file(w, h, 16, 2, rows))
    assert back.shape == (h, w, 3)
    assert np.array_equal(back, (rgb16.astype(np.uint32) >> 8).astype(np.uint8))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_shallow_gray_scales_to_full_range(depth):
    rng = np.random.default_rng(24)
    w, h, levels = 13, 3, 1 << depth
    vals = rng.integers(0, levels, (h, w)).astype(np.uint8)
    rows = []
    for y in range(h):
        bits = np.unpackbits(vals[y][:, None], axis=1)[:, 8 - depth :]
        rows.append(np.packbits(bits.reshape(-1)).tobytes())
    back = decode_image(_png_file(w, h, depth, 0, rows))
    assert back.shape == (h, w)
    assert np.array_equal(back, vals * (255 // (levels - 1)))
    if depth == 1:
        assert set(np.unique(back)) <= {0, 255}


def test_png_palette_pillow_interop():
    Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(25)
    idx = rng.integers(0, 16, (8, 12)).astype(np.uint8)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    img = Image.fromarray(idx, mode="P")
    img.putpalette(pal.reshape(-1).tolist())
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    from sklearn_raster_spark.sources.image import decode_png

    back = decode_png(buf.getvalue())
    assert back.shape[-1] == 3
    assert np.array_equal(back, pal[idx])


# ------------------------------------------------------------------ GIF


class _GifBits:
    """LSB-first bit writer (GIF appendix F packing order)."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, code, width):
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _gif_lzw_encode(indices, min_code, compress=True):
    """Spec-faithful GIF LZW encoder for tests. compress=False uses the
    classic 'uncompressed GIF' trick — every pixel as its own code with
    a CLEAR before the table would force a width bump — which gives a
    hand-checkable spec anchor independent of table bookkeeping."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    wr = _GifBits()
    width = min_code + 1
    wr.put(clear, width)
    if not compress:
        budget = (1 << min_code) - 2
        for i, b in enumerate(bytes(indices)):
            if i and i % budget == 0:
                wr.put(clear, width)
            wr.put(b, width)
        wr.put(eoi, width)
        return wr.done()
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    prev = b""
    for b in bytes(indices):
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        wr.put(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # decoder widens when ITS table (one entry behind) fills 2^width
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4094:  # keep clear of the 12-bit cap
            wr.put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        prev = bytes([b])
    if prev:
        wr.put(table[prev], width)
    wr.put(eoi, width)
    return wr.done()


def _gif_file(idx, palette, min_code, interlace=False, transparent=None,
              local_ct=False, compress=True):
    h, w = idx.shape
    n = len(palette)
    ct_bits = max(1, (n - 1).bit_length()) - 1  # field stores 2<<bits entries
    ct = palette.astype(np.uint8).tobytes()
    out = bytearray(b"GIF89a")
    if local_ct:
        out += struct.pack("<HHBBB", w, h, 0x00, 0, 0)  # no GCT
    else:
        out += struct.pack("<HHBBB", w, h, 0x80 | ct_bits, 0, 0) + ct
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01]) + struct.pack("<H", 0)
        out += bytes([transparent, 0])
    iflags = (0x80 | ct_bits if local_ct else 0) | (0x40 if interlace else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    if local_ct:
        out += ct
    rows = idx
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        rows = idx[order]
    data = _gif_lzw_encode(rows.reshape(-1).astype(np.uint8).tobytes(),
                           min_code, compress=compress)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        blk = data[i : i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_roundtrip_compressed_and_uncompressed_trick():
    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (13, 21)).astype(np.uint8)
    for compress in (True, False):
        back = decode_image(_gif_file(idx, pal, 4, compress=compress))
        assert back.shape == (13, 21, 3)
        assert np.array_equal(back, pal[idx])


def test_gif_kwkwk_and_width_growth():
    rng = np.random.default_rng(32)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    # abababab...: the classic KwKwK stressor
    idx = np.tile(np.array([[3, 7]], np.uint8), (4, 50)).reshape(8, 50)
    from sklearn_raster_spark.sources.image import decode_gif

    assert np.array_equal(decode_gif(_gif_file(idx, pal, 8)), pal[idx])
    # enough entropy to push the code width past 9 and 10 bits
    big = rng.integers(0, 256, (60, 80)).astype(np.uint8)
    assert np.array_equal(decode_gif(_gif_file(big, pal, 8)), pal[big])


def test_gif_interlace_local_table_and_transparency():
    rng = np.random.default_rng(33)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, (17, 9)).astype(np.uint8)  # odd height
    from sklearn_raster_spark.sources.image import decode_gif

    assert np.array_equal(decode_gif(_gif_file(idx, pal, 3, interlace=True)),
                          pal[idx])
    assert np.array_equal(decode_gif(_gif_file(idx, pal, 3, local_ct=True)),
                          pal[idx])
    back = decode_gif(_gif_file(idx, pal, 3, transparent=5))
    assert back.shape == (17, 9, 4)
    assert np.array_equal(back[..., :3], pal[idx])
    assert np.array_equal(back[..., 3] == 0, idx == 5)


def test_gif_rejection_and_truncation():
    from sklearn_raster_spark.sources.image import decode_gif

    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF")
    rng = np.random.default_rng(34)
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.integers(0, 4, (6, 6)).astype(np.uint8)
    good = _gif_file(idx, pal, 2)
    with pytest.raises(ValueError, match="truncated|pixel data ends"):
        # chop the last data sub-block in half
        decode_gif(good[:-12] + b"\x00\x3b")


def test_gif_pillow_interop():
    Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(35)
    idx = rng.integers(0, 32, (24, 31)).astype(np.uint8)
    pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
    img = Image.fromarray(idx, mode="P")
    img.putpalette(pal.reshape(-1).tolist())
    buf = io.BytesIO()
    img.save(buf, format="GIF")
    from sklearn_raster_spark.sources.image import decode_gif

    assert np.array_equal(decode_gif(buf.getvalue()), pal[idx])


# ------------------------------------------------------------ Adam7 PNG


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _interlaced_png(img, depth=8, color=None, plte=None):
    """Assemble an Adam7 PNG: each pass independently filtered with
    filter byte 0; 16-bit passes big-endian; sub-byte passes packed."""
    from sklearn_raster_spark.sources.image import _png_chunk, _PNG_SIG

    h, w = img.shape[:2]
    if color is None:
        color = 0 if img.ndim == 2 else {3: 2, 4: 6}[img.shape[2]]
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            if depth == 16:
                raw += row.astype(">u2").tobytes()
            elif depth < 8:
                bits = np.unpackbits(
                    np.asarray(row, np.uint8).reshape(-1, 1), axis=1
                )[:, 8 - depth:]
                raw += np.packbits(bits.reshape(-1)).tobytes()
            else:
                raw += np.asarray(row, np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte.tobytes())
    return out + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(b"IEND", b"")


def test_png_adam7_gray_rgb_rgba():
    rng = np.random.default_rng(41)
    for shape in [(13, 9), (8, 8), (1, 1), (3, 17), (13, 9, 3), (6, 5, 4)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        back = decode_png(_interlaced_png(img))
        assert back.shape == img.shape and np.array_equal(back, img)


def test_png_adam7_palette_and_16bit():
    rng = np.random.default_rng(42)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (11, 7)).astype(np.uint8)
    back = decode_png(_interlaced_png(idx, depth=4, color=3, plte=pal))
    assert np.array_equal(back, pal[idx])

    g16 = rng.integers(0, 65536, (9, 6)).astype(np.uint16)
    back = decode_png(_interlaced_png(g16, depth=16, color=0))
    assert np.array_equal(back, (g16 >> 8).astype(np.uint8))


def test_png_adam7_pillow_written_interop():
    """Pillow cannot WRITE interlaced PNGs for all modes, but it READS
    them — cross-check our hand-assembled interlaced stream."""
    Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(43)
    img = rng.integers(0, 256, (10, 14, 3)).astype(np.uint8)
    data = _interlaced_png(img)
    theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.array_equal(theirs, img)


def test_encode_gif_package_roundtrip():
    """The PACKAGE GIF encoder (identity-palette grayscale, q164's
    asset writer) must round-trip bit-exact through decode_gif,
    including streams long enough to force the 4094-entry table
    reset."""
    from sklearn_raster_spark.sources.image import decode_gif, encode_gif

    rng = np.random.default_rng(61)
    for shape in [(1, 1), (5, 9), (13, 300), (80, 80)]:
        g = rng.integers(0, 256, shape).astype(np.uint8)
        back = decode_gif(encode_gif(g))
        assert back.shape == shape + (3,)
        assert np.array_equal(back[..., 0], g)
        assert np.array_equal(back[..., 1], back[..., 2])
    with pytest.raises(ValueError):
        encode_gif(np.zeros((2, 2), np.float32))
    with pytest.raises(ValueError):
        encode_gif(np.zeros((2, 2, 3), np.uint8))


def test_encode_gif_pillow_interop():
    Image = pytest.importorskip("PIL.Image")
    import io

    from sklearn_raster_spark.sources.image import encode_gif

    g = np.random.default_rng(62).integers(0, 256, (21, 34)).astype(np.uint8)
    theirs = np.asarray(Image.open(io.BytesIO(encode_gif(g))).convert("L"))
    assert np.array_equal(theirs, g)


# ---------------------------------------------------------- MJPEG AVI


def test_mjpeg_avi_roundtrip_and_structure():
    from sklearn_raster_spark.sources.video import decode_mjpeg_avi, encode_mjpeg_avi

    rng = np.random.default_rng(81)
    frames = rng.integers(32, 127, (7, 16, 32)).astype(np.uint8)
    avi = encode_mjpeg_avi(frames, fps=5)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert b"MJPG" in avi and b"idx1" in avi and b"movi" in avi
    back = decode_mjpeg_avi(avi)
    assert back.shape == frames.shape
    assert int(np.max(np.abs(back.astype(int) - frames.astype(int)))) <= 3

    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_mjpeg_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        encode_mjpeg_avi(frames[0])  # needs (N, H, W)


def test_mjpeg_avi_dhtless_frames_and_rec_lists():
    """The two real-world MJPEG shapes our writer never produces:
    frames that OMIT Huffman tables (hardware MJPEG) and frames nested
    inside LIST 'rec ' groupings (interleaved AVIs)."""
    import struct as _s

    from sklearn_raster_spark.sources.jpeg import encode_jpeg
    from sklearn_raster_spark.sources.video import decode_mjpeg_avi

    rng = np.random.default_rng(82)
    frames = rng.integers(32, 127, (3, 8, 16)).astype(np.uint8)

    def strip_dht(jpg):
        out = bytearray()
        i = 0
        while i < len(jpg):
            if jpg[i] == 0xFF and i + 3 < len(jpg) and jpg[i + 1] == 0xC4:
                (ln,) = _s.unpack(">H", jpg[i + 2 : i + 4])
                i += 2 + ln
                continue
            out.append(jpg[i])
            i += 1
        return bytes(out)

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + _s.pack("<I", len(payload)) + payload + pad

    recs = b"".join(
        chunk(b"LIST", b"rec " + chunk(b"00dc", strip_dht(encode_jpeg(f, quality=100))))
        for f in frames
    )
    movi = chunk(b"LIST", b"movi" + recs)
    body = b"AVI " + movi
    avi = b"RIFF" + _s.pack("<I", len(body)) + body
    back = decode_mjpeg_avi(avi)
    assert back.shape == frames.shape
    assert int(np.max(np.abs(back.astype(int) - frames.astype(int)))) <= 3


def test_bmp_8bpp_palette_raw_and_rle8():
    """Hand-assembled 8-bpp palette BMPs: raw rows (4-byte padded) and
    BI_RLE8 with every escape (EOL, delta, absolute mode, EOB)."""
    rng = np.random.default_rng(91)
    w, h = 7, 5
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
    pal_bgra = np.zeros((256, 4), np.uint8)
    pal_bgra[:, :3] = pal[:, ::-1]

    def bmp(compression, pixels):
        pixel_off = 14 + 40 + 256 * 4
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, compression, len(pixels),
            2835, 2835, 256, 0,
        )
        hdr = struct.pack("<2sIHHI", b"BM", pixel_off + len(pixels), 0, 0, pixel_off)
        return hdr + info + pal_bgra.tobytes() + pixels

    # raw: bottom-up padded rows
    stride = (w + 3) & ~3
    raw_rows = b"".join(
        idx[y].tobytes() + b"\x00" * (stride - w) for y in range(h - 1, -1, -1)
    )
    back = decode_bmp(bmp(0, raw_rows))
    assert back.shape == (h, w, 3) and np.array_equal(back, pal[idx])

    # RLE8: runs + one absolute segment + EOL per row + EOB
    rle = bytearray()
    for y in range(h - 1, -1, -1):
        row = idx[y]
        # absolute mode for the first 3 (odd count -> pad byte), then runs
        rle += bytes([0, 3]) + row[:3].tobytes() + b"\x00"
        for v in row[3:]:
            rle += bytes([1, int(v)])
        rle += b"\x00\x00"  # EOL
    rle += b"\x00\x01"  # EOB
    back = decode_bmp(bmp(1, bytes(rle)))
    assert back.shape == (h, w, 3) and np.array_equal(back, pal[idx])

    # delta escape: skip 2 right / 1 up; skipped pixels hold index 0
    rle2 = bytes([2, 5]) + b"\x00\x02" + bytes([2, 1]) + bytes([1, 7]) + b"\x00\x01"
    back = decode_bmp(bmp(1, rle2))
    expect = np.zeros((h, w), np.uint8)
    expect[h - 1, 0:2] = 5       # bottom row (bottom-up)
    expect[h - 2, 4] = 7         # after delta dx=2, dy=1
    assert np.array_equal(back, pal[expect])


def test_bmp_8bpp_pillow_interop():
    Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(92)
    idx = rng.integers(0, 64, (9, 13)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    img = Image.fromarray(idx, mode="P")
    img.putpalette(pal.reshape(-1).tolist())
    buf = io.BytesIO()
    img.save(buf, format="BMP")
    back = decode_bmp(buf.getvalue())
    assert np.array_equal(back, pal[idx])


def test_bmp_rle8_malformed_cursor_raises_codec_error():
    """Round-10 ADVICE: malformed RLE8 escapes must raise the codec
    ValueError contract, never an uncaught numpy IndexError."""
    rng = np.random.default_rng(93)
    w, h = 7, 5
    pal_bgra = np.zeros((256, 4), np.uint8)
    pal_bgra[:, :3] = rng.integers(0, 256, (256, 3)).astype(np.uint8)

    def bmp(pixels):
        pixel_off = 14 + 40 + 256 * 4
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(pixels), 2835, 2835, 256, 0
        )
        hdr = struct.pack("<2sIHHI", b"BM", pixel_off + len(pixels), 0, 0, pixel_off)
        return hdr + info + pal_bgra.tobytes() + pixels

    # delta pushes y >= h, then a run tries to write
    bad_delta = bytes([0, 2, 1, 200]) + bytes([3, 9]) + b"\x00\x01"
    with pytest.raises(ValueError, match="RLE8 cursor out of bounds"):
        decode_bmp(bmp(bad_delta))
    # delta pushes x beyond w
    bad_x = bytes([0, 2, 250, 0]) + bytes([3, 9]) + b"\x00\x01"
    with pytest.raises(ValueError, match="RLE8 cursor out of bounds"):
        decode_bmp(bmp(bad_x))
    # delta escape truncated mid-operands
    with pytest.raises(ValueError, match="RLE8 delta escape truncated"):
        decode_bmp(bmp(bytes([0, 2, 1])))
    # absolute run truncated
    with pytest.raises(ValueError, match="RLE8 absolute run truncated"):
        decode_bmp(bmp(bytes([0, 5, 1, 2])))
    # an in-bounds delta still decodes (regression guard)
    ok = bytes([2, 5]) + b"\x00\x02" + bytes([2, 1]) + bytes([1, 7]) + b"\x00\x01"
    assert decode_bmp(bmp(ok)).shape == (h, w, 3)


def test_gif_offset_frame_composites_onto_logical_screen():
    """Round-10 ADVICE: a first frame smaller than (or offset within)
    the logical screen composites onto the background-filled sw-by-sh
    canvas, matching reference decoders; output geometry is the
    screen's, never the frame's."""
    from sklearn_raster_spark.sources.image import decode_gif

    rng = np.random.default_rng(94)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, (3, 4)).astype(np.uint8)
    sw, sh, left, top = 12, 10, 5, 2

    def gif(transparent=None, frame_left=left, frame_top=top):
        ct_bits = 2  # 2 << 2 = 8 entries
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", sw, sh, 0x80 | ct_bits, 6, 0)  # bg index 6
        out += pal.tobytes()
        if transparent is not None:
            out += bytes([0x21, 0xF9, 4, 0x01]) + struct.pack("<H", 0)
            out += bytes([transparent, 0])
        out += b"\x2c" + struct.pack("<HHHHB", frame_left, frame_top, 4, 3, 0)
        data = _gif_lzw_encode(idx.reshape(-1).tobytes(), 3)
        out += bytes([3])
        for i in range(0, len(data), 255):
            blk = data[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00\x3b"
        return bytes(out)

    back = decode_gif(gif())
    assert back.shape == (sh, sw, 3)
    assert np.array_equal(back[top : top + 3, left : left + 4], pal[idx])
    mask = np.ones((sh, sw), bool)
    mask[top : top + 3, left : left + 4] = False
    assert np.all(back[mask] == pal[6])  # background fill

    back = decode_gif(gif(transparent=5))
    assert back.shape == (sh, sw, 4)
    assert np.all(back[mask][:, 3] == 0)  # outside frame: transparent
    inner = back[top : top + 3, left : left + 4]
    assert np.array_equal(inner[..., :3][idx != 5], pal[idx][idx != 5])
    assert np.array_equal(inner[..., 3] == 0, idx == 5)

    with pytest.raises(ValueError, match="beyond the logical screen"):
        decode_gif(gif(frame_left=10))  # 10 + 4 > 12


def test_mjpeg_frame_missing_dqt_fails_loudly():
    """Round-10 ADVICE: the MJPEG DHT-less convention covers Huffman
    tables ONLY — a frame that also omits its quantization tables must
    raise, not silently decode with arbitrary seeded defaults."""
    import struct as _s

    from sklearn_raster_spark.sources.jpeg import encode_jpeg
    from sklearn_raster_spark.sources.video import decode_mjpeg_avi

    rng = np.random.default_rng(95)
    frames = rng.integers(32, 127, (2, 8, 16)).astype(np.uint8)

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + _s.pack("<I", len(payload)) + payload + pad

    def avi_of(jpegs):
        movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", j) for j in jpegs))
        body = b"AVI " + movi
        return b"RIFF" + _s.pack("<I", len(body)) + body

    # omit_tables strips BOTH DQT and DHT -> the Huffman-only seed
    # leaves the quantization tables undefined -> loud failure
    bare = [encode_jpeg(f, quality=100, omit_tables=True) for f in frames]
    with pytest.raises(ValueError, match="undefined quantization table"):
        decode_mjpeg_avi(avi_of(bare))


def test_jpeg_marker_in_entropy_data_is_valueerror():
    """Round-10 ADVICE: _MarkerInData escaping the decoder on corrupt
    entropy data must be catchable as the codec-contract ValueError."""
    from sklearn_raster_spark.sources.jpeg import (
        _MarkerInData,
        decode_jpeg,
        encode_jpeg,
    )

    assert issubclass(_MarkerInData, ValueError)
    rng = np.random.default_rng(96)
    img = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    jpg = bytearray(encode_jpeg(img, quality=90))
    sos = bytes(jpg).find(b"\xff\xda")
    assert sos > 0
    # plant a bare TEM marker (FF 01 — non-stuffing, non-RST) mid-scan
    mid = sos + (len(jpg) - sos) // 2
    jpg[mid : mid + 2] = b"\xff\x01"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(jpg))



def test_bmp_core_header_and_subbyte_and_32bpp():
    """Round-10 coverage widening: OS/2 BITMAPCOREHEADER (3-byte
    palette entries), 1/4-bpp packed palette rows, and 32-bpp BGRx."""
    rng = np.random.default_rng(98)

    # --- BITMAPCOREHEADER, 8-bpp palette, always bottom-up ---
    w, h = 7, 5
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
    stride = (w + 3) & ~3
    core_rows = b"".join(
        idx[y].tobytes() + b"\x00" * (stride - w) for y in range(h - 1, -1, -1)
    )
    pal_bgr = pal[:, ::-1].tobytes()  # RGBTRIPLE entries
    pixel_off = 14 + 12 + 256 * 3
    hdr = struct.pack("<2sIHHI", b"BM", pixel_off + len(core_rows), 0, 0, pixel_off)
    core = struct.pack("<IHHHH", 12, w, h, 1, 8)
    back = decode_bmp(hdr + core + pal_bgr + core_rows)
    assert np.array_equal(back, pal[idx])

    def info_bmp(w, h, bpp, pixels, n_pal):
        pal_bgra = np.zeros((n_pal, 4), np.uint8)
        pal_bgra[:, :3] = pal[:n_pal, ::-1]
        pixel_off = 14 + 40 + n_pal * 4
        hdr = struct.pack("<2sIHHI", b"BM", pixel_off + len(pixels), 0, 0, pixel_off)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pixels), 2835, 2835, n_pal, 0
        )
        return hdr + info + pal_bgra.tobytes() + pixels

    # --- 1-bpp: MSB-first packed, rows padded to 32-bit words ---
    w1, h1 = 11, 4
    bits = rng.integers(0, 2, (h1, w1)).astype(np.uint8)
    stride1 = ((w1 * 1 + 31) // 32) * 4
    rows1 = bytearray()
    for y in range(h1 - 1, -1, -1):
        packed = np.packbits(bits[y])  # MSB-first, matches BMP
        rows1 += packed.tobytes() + b"\x00" * (stride1 - len(packed))
    back = decode_bmp(info_bmp(w1, h1, 1, bytes(rows1), 2))
    assert np.array_equal(back, pal[:2][bits])

    # --- 4-bpp: two pixels per byte, high nibble first ---
    w4, h4 = 9, 3
    idx4 = rng.integers(0, 16, (h4, w4)).astype(np.uint8)
    stride4 = ((w4 * 4 + 31) // 32) * 4
    rows4 = bytearray()
    for y in range(h4 - 1, -1, -1):
        row = idx4[y]
        nibbles = bytearray()
        for i in range(0, w4, 2):
            hi = int(row[i]) << 4
            lo = int(row[i + 1]) if i + 1 < w4 else 0
            nibbles.append(hi | lo)
        rows4 += bytes(nibbles) + b"\x00" * (stride4 - len(nibbles))
    back = decode_bmp(info_bmp(w4, h4, 4, bytes(rows4), 16))
    assert np.array_equal(back, pal[:16][idx4])

    # --- 32-bpp BGRx (pad byte dropped) ---
    rgb = rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)
    bgrx = np.zeros((6, 5, 4), np.uint8)
    bgrx[:, :, :3] = rgb[::-1, :, ::-1]  # bottom-up, BGR
    pixel_off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", pixel_off + bgrx.size, 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, 5, 6, 1, 32, 0, bgrx.size, 0, 0, 0, 0)
    back = decode_bmp(hdr + info + bgrx.tobytes())
    assert np.array_equal(back, rgb)

    # RLE4 decodes builtin as of round 11: an all-zero pixel stream has
    # no EOB, but every painted pixel is index 0 -> a solid pal[0] image
    info = struct.pack("<IiiHHIIiiII", 40, 5, 6, 1, 4, 2, 0, 0, 0, 16, 0)
    back = decode_bmp(
        struct.pack("<2sIHHI", b"BM", 0, 0, 0, 14 + 40 + 64) + info + b"\x00" * 64
    )
    # the 64 zero bytes are the (all-black) palette; there is no pixel
    # stream, so every painted pixel is palette index 0 -> solid black
    assert back.shape == (6, 5, 3) and not back.any()


def test_bmp_subbyte_pillow_interop():
    Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(99)
    bits = rng.integers(0, 2, (10, 13)).astype(np.uint8) * 255
    img = Image.fromarray(bits, mode="L").convert("1")
    buf = io.BytesIO()
    img.save(buf, format="BMP")
    back = decode_bmp(buf.getvalue())
    assert back.shape == (10, 13, 3)
    assert np.array_equal(back[..., 0] > 0, bits > 0)


def test_bmp_rle4_palette():
    """Hand-assembled BI_RLE4 (round 11 — the last BMP compression):
    encoded runs alternate the value byte's nibbles, absolute mode
    packs nibbles MSB-first word-aligned, escapes shared with RLE8."""
    w, h = 9, 3
    pal = np.zeros((16, 3), np.uint8)
    pal[:, 0] = np.arange(16) * 17  # distinct reds
    pal_bgra = np.zeros((16, 4), np.uint8)
    pal_bgra[:, :3] = pal[:, ::-1]

    def bmp(pixels):
        pixel_off = 14 + 40 + 16 * 4
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 4, 2, len(pixels),
            2835, 2835, 16, 0,
        )
        hdr = struct.pack("<2sIHHI", b"BM", pixel_off + len(pixels), 0, 0, pixel_off)
        return hdr + info + pal_bgra.tobytes() + pixels

    # bottom row: run of 5 alternating (0xA, 0x3), absolute 3 nibbles
    # [1, 2, 3] (2 bytes packed, padded to word), 1 more pixel run
    rle = bytearray()
    rle += bytes([5, 0xA3])                       # A 3 A 3 A
    rle += bytes([0, 3, 0x12, 0x30])              # absolute: 1 2 3 (+pad)
    rle += bytes([1, 0x77])                       # 7
    rle += b"\x00\x00"                            # EOL
    rle += bytes([2, 0x4B]) + b"\x00\x02" + bytes([2, 1]) + bytes([1, 0xF0])
    rle += b"\x00\x01"                            # EOB
    back = decode_bmp(bmp(bytes(rle)))
    expect = np.zeros((h, w), np.uint8)
    expect[2, :5] = [0xA, 0x3, 0xA, 0x3, 0xA]
    expect[2, 5:8] = [1, 2, 3]
    expect[2, 8] = 7
    expect[1, 0:2] = [4, 0xB]   # middle row starts with run of 2
    expect[0, 4] = 0xF          # after delta dx=2, dy=1
    assert back.shape == (h, w, 3)
    assert np.array_equal(back, pal[expect])
    # truncated absolute run is a pointed error, not an escape
    with pytest.raises(ValueError):
        decode_bmp(bmp(bytes([0, 9, 0x12])))


def test_bmp_16bpp_rgb555_and_bitfields_565():
    """16-bpp plain (implicit RGB555) and BI_BITFIELDS RGB565 decode
    through the channel masks with the exact v*255//max expansion."""
    w, h = 3, 2
    # pixels chosen to hit min/max/mid of each channel
    r5 = np.array([[31, 0, 16], [7, 31, 0]], np.uint16)
    g5 = np.array([[0, 31, 8], [15, 0, 31]], np.uint16)
    b5 = np.array([[16, 7, 0], [31, 15, 31]], np.uint16)
    pix555 = (r5 << 10) | (g5 << 5) | b5

    def bmp(bpp, compression, pixels, masks=b""):
        pixel_off = 14 + 40 + len(masks)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, len(pixels),
            2835, 2835, 0, 0,
        )
        hdr = struct.pack("<2sIHHI", b"BM", pixel_off + len(pixels), 0, 0, pixel_off)
        return hdr + info + masks + pixels

    stride = ((w * 16 + 31) // 32) * 4
    rows = b"".join(
        pix555[y].astype("<u2").tobytes().ljust(stride, b"\x00")
        for y in range(h - 1, -1, -1)
    )
    back = decode_bmp(bmp(16, 0, rows))
    exp = np.stack(
        [(c * 255 // 31).astype(np.uint8) for c in (r5, g5, b5)], axis=-1
    )
    assert np.array_equal(back, exp)

    # BI_BITFIELDS RGB565: green gets 6 bits
    g6 = g5 * 2 + (g5 > 15)
    pix565 = (r5 << 11) | (g6.astype(np.uint16) << 5) | b5
    rows565 = b"".join(
        pix565[y].astype("<u2").tobytes().ljust(stride, b"\x00")
        for y in range(h - 1, -1, -1)
    )
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    back = decode_bmp(bmp(16, 3, rows565, masks))
    exp565 = np.stack(
        [
            (r5 * 255 // 31).astype(np.uint8),
            (g6 * 255 // 63).astype(np.uint8),
            (b5 * 255 // 31).astype(np.uint8),
        ],
        axis=-1,
    )
    assert np.array_equal(back, exp565)
    # a zero mask is a pointed error
    bad = struct.pack("<III", 0, 0x07E0, 0x001F)
    with pytest.raises(ValueError):
        decode_bmp(bmp(16, 3, rows565, bad))


def test_bmp_32bpp_bitfields():
    """BI_BITFIELDS 32-bpp with the canonical BGRA8888 masks."""
    w, h = 2, 2
    rgb = np.array(
        [[[255, 0, 128], [0, 255, 64]], [[1, 2, 3], [250, 251, 252]]],
        np.uint8,
    )
    pix = (
        rgb[:, :, 0].astype(np.uint32) << 16
    ) | (rgb[:, :, 1].astype(np.uint32) << 8) | rgb[:, :, 2].astype(np.uint32)
    rows = b"".join(
        pix[y].astype("<u4").tobytes() for y in range(h - 1, -1, -1)
    )
    masks = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    pixel_off = 14 + 40 + 12
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 32, 3, len(rows), 2835, 2835, 0, 0
    )
    hdr = struct.pack("<2sIHHI", b"BM", pixel_off + len(rows), 0, 0, pixel_off)
    back = decode_bmp(hdr + info + masks + rows)
    assert np.array_equal(back, rgb)


def test_bmp_16bpp_pillow_interop():
    Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(93)
    rgb = rng.integers(0, 256, (6, 11, 3)).astype(np.uint8)
    # Pillow's 16-bpp BMP save path varies by version; assemble via
    # its own decoder instead: OUR encoder has no 16-bpp writer, so
    # round-trip through Pillow reading OUR RGB555 bytes
    r5 = (rgb[:, :, 0] >> 3).astype(np.uint16)
    g5 = (rgb[:, :, 1] >> 3).astype(np.uint16)
    b5 = (rgb[:, :, 2] >> 3).astype(np.uint16)
    pix = (r5 << 10) | (g5 << 5) | b5
    h, w = pix.shape
    stride = ((w * 16 + 31) // 32) * 4
    rows = b"".join(
        pix[y].astype("<u2").tobytes().ljust(stride, b"\x00")
        for y in range(h - 1, -1, -1)
    )
    pixel_off = 14 + 40
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 16, 0, len(rows), 2835, 2835, 0, 0
    )
    hdr = struct.pack("<2sIHHI", b"BM", pixel_off + len(rows), 0, 0, pixel_off)
    blob = hdr + info + rows
    ours = decode_bmp(blob)
    theirs = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    # modern Pillow's BGR;15 unpacker expands 5-bit channels with the
    # same exact v*255//31 scaling this decoder uses (bit replication
    # (v<<3)|(v>>2) would NOT match: v=4 gives 33 vs 32). Equality
    # here therefore pins both decoders to the exact-scaling convention
    assert np.array_equal(ours, theirs)
