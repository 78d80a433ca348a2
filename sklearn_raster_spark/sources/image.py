"""Dependency-free baseline image codecs (PNG / BMP / PPM-PGM).

The reference treats imagery as first-class ingest (rasterio for
GeoTIFF, reference ``datasets/_base.py:71-104``); the multimodal
surface here (operators/multimodal.py) additionally needs a REAL
image decode step so q152's binaryFile assets can flow end-to-end
into feature extraction. This container ships no Pillow/opencv, so —
exactly like sources/tiff.py — the decoders below are implemented
straight from the public specifications and prefer Pillow when the
environment provides it:

- PNG (ISO/IEC 15948): 8-bit greyscale / grey+alpha / RGB / RGBA,
  zlib-inflated IDAT, all five scanline filters (None/Sub/Up/
  Average/Paeth) on decode; the encoder emits filter 0. Palette,
  sub-byte and 16-bit depths, and Adam7 interlace raise
  ``NotImplementedError`` with a pointer to Pillow.
- BMP (Windows BITMAPINFOHEADER): uncompressed 24-bpp bottom-up
  BGR with 4-byte row padding — the universal interchange layout.
- PPM/PGM (netpbm P5/P6): binary greyscale / RGB, maxval 255.
- JPEG (ITU-T T.81 baseline): delegated to sources/jpeg.py — the
  dependency-free Huffman+DCT codec.

``decode_image`` sniffs the magic bytes, so the multimodal kernels
never need a trusted mime column. Decode runs on EXECUTORS inside
mapInPandas — each call allocates only the one array it returns.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode a uint8 array as PNG: (H, W) -> greyscale, (H, W, 2) ->
    grey+alpha, (H, W, 3) -> RGB, (H, W, 4) -> RGBA. Scanlines carry
    filter 0 (None) — decoders (ours, Pillow, browsers) accept any
    filter choice, and None keeps the bytes deterministic."""
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"encode_png expects uint8, got {img.dtype}")
    if img.ndim == 2:
        color, h, w = 0, img.shape[0], img.shape[1]
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        h, w = img.shape[:2]
        color = {2: 4, 3: 2, 4: 6}[img.shape[2]]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if h == 0 or w == 0:
        raise ValueError(f"empty image shape {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    stride = w * _PNG_CHANNELS[color]
    flat = img.reshape(h, stride)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters (PNG §9). Filters 0/1/2 are
    vectorized (None copies, Up adds the previous reconstructed row,
    Sub is a per-channel cumulative sum mod 256); Average and Paeth
    depend on the left RECONSTRUCTED byte, so they run the spec's
    sequential recurrence — our encoder never emits them, they exist
    to read foreign files."""
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG raw stream is {len(raw)} bytes, expected {h * (stride + 1)}"
        )
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft, line = int(arr[y, 0]), arr[y, 1:]
        if ft == 0:
            rec = line.copy()
        elif ft == 1:  # Sub: cumulative sum within each channel lane
            rec = line.reshape(w, bpp).cumsum(axis=0, dtype=np.uint64)
            rec = (rec % 256).astype(np.uint8).reshape(stride)
        elif ft == 2:  # Up
            rec = line + prev  # uint8 wraps mod 256, the spec arithmetic
        elif ft == 3:  # Average
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft} on row {y}")
        out[y] = rec
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to uint8 (H, W) for greyscale or
    (H, W, C) for grey+alpha / RGB / RGBA."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError(f"truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} fails CRC")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG needs Pillow")
    if depth != 8 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} color={color} needs Pillow; builtin decoder "
            "reads 8-bit greyscale/grey+alpha/RGB/RGBA"
        )
    if comp != 0 or filt != 0:
        raise ValueError(f"invalid PNG compression/filter method ({comp},{filt})")
    ch = _PNG_CHANNELS[color]
    flat = _png_unfilter(zlib.decompress(bytes(idat)), h, w, ch)
    return flat.reshape(h, w) if ch == 1 else flat.reshape(h, w, ch)


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode uint8 (H, W) grey or (H, W, 3) RGB as an uncompressed
    24-bpp BITMAPINFOHEADER BMP (bottom-up BGR, rows padded to 4)."""
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"encode_bmp expects uint8, got {img.dtype}")
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3 or 0 in img.shape:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    pad = (-(w * 3)) % 4
    rows = b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h))
    pixel_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(rows), 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + rows


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bpp BMP to uint8 (H, W, 3) RGB.
    Handles both bottom-up and top-down (negative height) layouts."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad magic)")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP needs Pillow")
    w, h_signed, planes, bpp, compression = struct.unpack("<iiHHI", data[18:34])
    if compression != 0 or bpp != 24:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} needs Pillow; "
            "builtin decoder reads uncompressed 24-bpp"
        )
    h, bottom_up = abs(h_signed), h_signed > 0
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, np.uint8, count=h * stride, offset=pixel_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1].copy() if bottom_up else img.copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode uint8 (H, W) as binary PGM (P5) or (H, W, 3) as PPM (P6)."""
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"encode_ppm expects uint8, got {img.dtype}")
    if img.ndim == 2:
        magic = b"P5"
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if 0 in img.shape:
        raise ValueError(f"empty image shape {img.shape}")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PGM (P5) -> (H, W) or PPM (P6) -> (H, W, 3)."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    # header: magic, whitespace/comment-separated width height maxval,
    # ONE whitespace byte, then raw samples (netpbm format spec)
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PGM/PPM maxval {maxval} needs Pillow")
    ch = 1 if magic == b"P5" else 3
    img = np.frombuffer(data, np.uint8, count=h * w * ch, offset=pos)
    return img.reshape(h, w) if ch == 1 else img.reshape(h, w, ch)


def decode_image(payload: bytes, mime: str | None = None) -> np.ndarray:
    """Decode an image payload to a uint8 numpy array, sniffing the
    container from its magic bytes (the mime hint is advisory only —
    asset tables lie about mime constantly). Prefers Pillow when the
    environment provides it (wider format coverage: JPEG, palette PNG,
    16-bit, interlace); falls back to the builtin PNG/BMP/PPM decoders
    above. Greyscale returns (H, W); color returns (H, W, C)."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty image payload")
    payload = bytes(payload)
    try:
        from PIL import Image  # optional, like rasterio in sources/raster.py
        import io

        img = np.asarray(Image.open(io.BytesIO(payload)))
        if img.dtype != np.uint8:
            img = img.astype(np.uint8)
        return img
    except ImportError:
        pass
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        return decode_ppm(payload)
    if payload[:3] in (b"\xff\xd8\xff",):
        from sklearn_raster_spark.sources.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError(f"unrecognized image container (magic {payload[:4]!r})")
