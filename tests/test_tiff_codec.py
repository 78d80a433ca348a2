"""Builtin baseline-TIFF codec (sources/tiff.py): round-trip laws,
GDAL tag parsing, and the explicit rejection surface that routes
exotic files to rasterio. This is the dependency-free stand-in for the
reference's rasterio ingest (reference datasets/_base.py:71-104)."""

import struct

import numpy as np
import pytest

from sklearn_raster_spark.sources.tiff import read_gtiff, write_gtiff


@pytest.mark.parametrize(
    "dtype",
    [np.uint8, np.uint16, np.int16, np.int32, np.float32, np.float64],
)
def test_roundtrip_bitexact_per_dtype(tmp_path, dtype):
    rng = np.random.default_rng(3)
    if np.issubdtype(dtype, np.floating):
        grid = rng.normal(size=(11, 7)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        grid = rng.integers(info.min, info.max, size=(11, 7), dtype=dtype)
    p = str(tmp_path / "g.tif")
    write_gtiff(p, grid, nodata=-9999.0, tags={"long_name": "b0", "units": "m"})
    back, info_d = read_gtiff(p)
    assert back.dtype == grid.dtype
    assert np.array_equal(back, grid)
    assert info_d["nodata"] == -9999.0
    assert info_d["tags"] == {"long_name": "b0", "units": "m"}


def test_tagless_file_and_xml_escaping(tmp_path):
    p = str(tmp_path / "plain.tif")
    write_gtiff(p, np.ones((2, 3), np.float64))
    grid, info = read_gtiff(p)
    assert grid.shape == (2, 3) and info == {"nodata": None, "tags": {}}

    p2 = str(tmp_path / "esc.tif")
    write_gtiff(p2, np.zeros((2, 2), np.float32), tags={"desc": 'a<b>&"c"'})
    _, info2 = read_gtiff(p2)
    assert info2["tags"]["desc"] == 'a<b>&"c"'

    # quotes in tag NAMES sit inside the name="..." attribute, so they
    # escape as &quot; — the reader must decode them back (round-9
    # ADVICE: saxutils' default entity map skips &quot;/&apos;). A
    # literal '&quot;' in a VALUE must survive via &amp;quot;.
    p3 = str(tmp_path / "escname.tif")
    write_gtiff(
        p3,
        np.zeros((2, 2), np.float32),
        tags={'say "hi" & \'bye\'': "v1", "lit": "&quot;raw&apos;"},
    )
    _, info3 = read_gtiff(p3)
    assert info3["tags"]['say "hi" & \'bye\''] == "v1"
    assert info3["tags"]["lit"] == "&quot;raw&apos;"


def test_nan_nodata_and_non_contiguous_input(tmp_path):
    p = str(tmp_path / "nan.tif")
    wide = np.arange(40, dtype=np.float64).reshape(4, 10)
    write_gtiff(p, wide[:, ::2], nodata=float("nan"))  # strided view
    grid, info = read_gtiff(p)
    assert np.array_equal(grid, wide[:, ::2])
    assert np.isnan(info["nodata"])


def test_rejects_non_tiff_bigtiff_and_compressed(tmp_path):
    not_tiff = tmp_path / "x.tif"
    not_tiff.write_bytes(b"PK\x03\x04 definitely a zip")
    with pytest.raises(ValueError, match="not a TIFF"):
        read_gtiff(str(not_tiff))

    # BigTIFF decodes builtin since round 9, but a header whose
    # offset-size field isn't 8 (here: all zeros) is malformed
    bad_big = tmp_path / "big.tif"
    bad_big.write_bytes(b"II" + struct.pack("<H", 43) + b"\x00" * 12)
    with pytest.raises(ValueError, match="malformed BigTIFF"):
        read_gtiff(str(bad_big))

    # flip the Compression entry of a valid file to 6 (old-style JPEG)
    # in place: the decoder must refuse rather than return garbage
    # (new-style JPEG 7 — and before it LZW — decode builtin now)
    p = tmp_path / "jpg.tif"
    write_gtiff(str(p), np.ones((2, 2), np.float32))
    buf = bytearray(p.read_bytes())
    (n,) = struct.unpack("<H", buf[8:10])
    for i in range(n):
        off = 10 + 12 * i
        tag, typ = struct.unpack("<HH", buf[off : off + 4])
        if tag == 259:
            buf[off + 8 : off + 10] = struct.pack("<H", 6)
    p.write_bytes(bytes(buf))
    with pytest.raises(NotImplementedError, match="compression 6"):
        read_gtiff(str(p))

    # new-style JPEG (7) on non-8-bit samples: pointed refusal too
    p2 = tmp_path / "jpg7.tif"
    write_gtiff(str(p2), np.ones((2, 2), np.float32))
    buf = bytearray(p2.read_bytes())
    for i in range(n):
        off = 10 + 12 * i
        tag, typ = struct.unpack("<HH", buf[off : off + 4])
        if tag == 259:
            buf[off + 8 : off + 10] = struct.pack("<H", 7)
    p2.write_bytes(bytes(buf))
    with pytest.raises(NotImplementedError, match="8-bit"):
        read_gtiff(str(p2))


def test_reads_big_endian_and_multistrip_files(tmp_path):
    """Files the writer never produces but real GeoTIFFs do: MM byte
    order and multiple strips. Hand-assembled per TIFF 6.0 §2/§3."""
    h, w = 4, 3
    grid = np.arange(h * w, dtype=np.float32).reshape(h, w)
    data = grid.astype(">f4").tobytes()
    half = len(data) // 2

    def entry(tag, typ, count, value_bytes):
        return struct.pack(">HHI", tag, typ, count) + value_bytes

    n = 10
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n + 4
    # out-of-line strip tables (2 strips of 2 rows each)
    strip_offsets_off = after_ifd
    strip_counts_off = after_ifd + 8
    data_off = after_ifd + 16
    entries = b"".join(
        [
            entry(256, 4, 1, struct.pack(">I", w)),
            entry(257, 4, 1, struct.pack(">I", h)),
            entry(258, 3, 1, struct.pack(">H2x", 32)),
            entry(259, 3, 1, struct.pack(">H2x", 1)),
            entry(262, 3, 1, struct.pack(">H2x", 1)),
            entry(273, 4, 2, struct.pack(">I", strip_offsets_off)),
            entry(277, 3, 1, struct.pack(">H2x", 1)),
            entry(278, 4, 1, struct.pack(">I", 2)),
            entry(279, 4, 2, struct.pack(">I", strip_counts_off)),
            entry(339, 3, 1, struct.pack(">H2x", 3)),
        ]
    )
    buf = (
        b"MM"
        + struct.pack(">HI", 42, ifd_off)
        + struct.pack(">H", n)
        + entries
        + struct.pack(">I", 0)
        + struct.pack(">II", data_off, data_off + half)
        + struct.pack(">II", half, half)
        + data
    )
    p = tmp_path / "mm.tif"
    p.write_bytes(buf)
    back, info = read_gtiff(str(p))
    assert back.dtype == np.float32
    assert np.array_equal(back, grid)
    assert info == {"nodata": None, "tags": {}}


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=40, deadline=None)
    @given(
        grid=st.sampled_from(["u1", "i2", "i4", "f4", "f8"]).flatmap(
            lambda dt: arrays(
                dtype=np.dtype(dt),
                shape=st.tuples(
                    st.integers(1, 9), st.integers(1, 9)
                ),
                elements={"allow_nan": False}
                if dt.startswith("f")
                else None,
            )
        ),
        tag_val=st.text(
            # NUL terminates the ASCII tag payload and control chars are
            # not valid in XML; real GDAL tags share both constraints
            alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
            max_size=20,
        ),
    )
    def test_roundtrip_property(grid, tag_val):
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "h.tif")
            write_gtiff(p, grid, tags={"long_name": tag_val} if tag_val else None)
            back, info = read_gtiff(p)
            assert back.dtype == grid.dtype
            assert np.array_equal(back, grid, equal_nan=True)
            if tag_val:
                # the reader strips whitespace edges (GDAL XML is
                # pretty-printed), so edge whitespace is lossy by design
                assert info["tags"]["long_name"] == tag_val.strip()

except ImportError:  # hypothesis is baked in; guard mirrors the suite convention
    pass


def test_writer_output_is_rasterio_readable_when_available(tmp_path):
    """Interop direction the other tests can't cover without GDAL:
    our writer's bytes through rasterio's reader."""
    rasterio = pytest.importorskip("rasterio")
    p = str(tmp_path / "interop.tif")
    grid = np.arange(12, dtype=np.float64).reshape(3, 4)
    write_gtiff(p, grid, nodata=-9999.0, tags={"long_name": "b", "units": "m"})
    with rasterio.open(p) as src:
        assert np.array_equal(src.read(1), grid)
        assert src.nodata == -9999.0
        assert src.tags(1)["long_name"] == "b"


@pytest.mark.parametrize(
    "dtype",
    [np.uint8, np.uint16, np.int16, np.int32, np.float32, np.float64],
)
def test_deflate_roundtrip_bitexact_per_dtype(tmp_path, dtype):
    """compress='deflate' (TIFF compression 8, zlib strips) must be
    bit-exact through the builtin read path, like the baseline writer."""
    rng = np.random.default_rng(9)
    if np.issubdtype(dtype, np.floating):
        grid = rng.normal(size=(13, 5)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        grid = rng.integers(info.min, info.max, size=(13, 5), dtype=dtype)
    p = str(tmp_path / "z.tif")
    write_gtiff(p, grid, nodata=-1.0, tags={"long_name": "z"}, compress="deflate")
    back, meta = read_gtiff(p)
    assert back.dtype == grid.dtype and np.array_equal(back, grid)
    assert meta == {"nodata": -1.0, "tags": {"long_name": "z"}}


def test_deflate_actually_compresses_and_legacy_code_reads(tmp_path):
    import zlib

    grid = np.zeros((64, 64), np.float64)  # maximally compressible
    p_raw, p_z = tmp_path / "raw.tif", tmp_path / "z.tif"
    write_gtiff(str(p_raw), grid)
    write_gtiff(str(p_z), grid, compress="deflate")
    assert p_z.stat().st_size < p_raw.stat().st_size / 4

    # legacy code 32946 (old-style Deflate, same zlib stream): flip the
    # Compression entry in place — the reader must treat it identically
    buf = bytearray(p_z.read_bytes())
    (n,) = struct.unpack("<H", buf[8:10])
    for i in range(n):
        off = 10 + 12 * i
        (tag,) = struct.unpack("<H", buf[off : off + 2])
        if tag == 259:
            buf[off + 4 : off + 8] = struct.pack("<I", 1)  # count stays 1
            buf[off + 8 : off + 12] = struct.pack("<HH", 32946, 0)
    p_legacy = tmp_path / "legacy.tif"
    p_legacy.write_bytes(bytes(buf))
    back, _ = read_gtiff(str(p_legacy))
    assert np.array_equal(back, grid)

    # a corrupt zlib stream must raise the codec-contract ValueError
    # (round 10, sources/_contract.py: zlib.error never escapes), not
    # return garbage
    p_bad = tmp_path / "bad.tif"
    bad = bytearray(p_z.read_bytes())
    bad[-8:] = b"\x00" * 8
    p_bad.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="malformed payload"):
        read_gtiff(str(p_bad))


def test_deflate_multistrip_big_endian(tmp_path):
    """Hand-assembled MM-order file with two independently deflated
    strips — the layout GDAL writes for large compressed rasters."""
    import zlib

    h, w = 4, 3
    grid = np.arange(h * w, dtype=np.float32).reshape(h, w)
    raw = grid.astype(">f4").tobytes()
    s1, s2 = zlib.compress(raw[: len(raw) // 2]), zlib.compress(raw[len(raw) // 2 :])

    def entry(tag, typ, count, value_bytes):
        return struct.pack(">HHI", tag, typ, count) + value_bytes

    n = 10
    after_ifd = 8 + 2 + 12 * n + 4
    strip_offsets_off = after_ifd
    strip_counts_off = after_ifd + 8
    data_off = after_ifd + 16
    entries = b"".join(
        [
            entry(256, 4, 1, struct.pack(">I", w)),
            entry(257, 4, 1, struct.pack(">I", h)),
            entry(258, 3, 1, struct.pack(">H2x", 32)),
            entry(259, 3, 1, struct.pack(">H2x", 8)),  # Adobe Deflate
            entry(262, 3, 1, struct.pack(">H2x", 1)),
            entry(273, 4, 2, struct.pack(">I", strip_offsets_off)),
            entry(277, 3, 1, struct.pack(">H2x", 1)),
            entry(278, 4, 1, struct.pack(">I", 2)),
            entry(279, 4, 2, struct.pack(">I", strip_counts_off)),
            entry(339, 3, 1, struct.pack(">H2x", 3)),
        ]
    )
    buf = (
        b"MM"
        + struct.pack(">HI", 42, 8)
        + struct.pack(">H", n)
        + entries
        + struct.pack(">I", 0)
        + struct.pack(">II", data_off, data_off + len(s1))
        + struct.pack(">II", len(s1), len(s2))
        + s1
        + s2
    )
    p = tmp_path / "mmz.tif"
    p.write_bytes(buf)
    back, _ = read_gtiff(str(p))
    assert back.dtype == np.float32 and np.array_equal(back, grid)


def test_deflate_rasterio_interop(tmp_path):
    rasterio = pytest.importorskip("rasterio")
    grid = np.arange(35, dtype=np.int32).reshape(5, 7)
    p = str(tmp_path / "z.tif")
    write_gtiff(p, grid, compress="deflate")
    with rasterio.open(p) as src:
        assert np.array_equal(src.read(1), grid)


def _assemble_tiled(grid, tw, tl, deflate=False, bo="<"):
    """Hand-assemble a tiled classic TIFF (TIFF 6.0 §15): row-major
    tile grid, edge tiles padded to full size."""
    import zlib as _zlib

    h, w = grid.shape
    across, down = -(-w // tw), -(-h // tl)
    tiles = []
    for ty in range(down):
        for tx in range(across):
            pad = np.zeros((tl, tw), grid.dtype)
            block = grid[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
            pad[: block.shape[0], : block.shape[1]] = block
            raw = pad.astype(bo + "f4").tobytes()
            tiles.append(_zlib.compress(raw) if deflate else raw)

    def entry(tag, typ, count, value_bytes):
        return struct.pack(bo + "HHI", tag, typ, count) + value_bytes

    n = 12
    after_ifd = 8 + 2 + 12 * n + 4
    n_tiles = len(tiles)
    toff_off = after_ifd
    tcnt_off = after_ifd + 4 * n_tiles
    data_off = tcnt_off + 4 * n_tiles
    offs, pos = [], data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    entries = b"".join(
        [
            entry(256, 4, 1, struct.pack(bo + "I", w)),
            entry(257, 4, 1, struct.pack(bo + "I", h)),
            entry(258, 3, 1, struct.pack(bo + "H2x", 32)),
            entry(259, 3, 1, struct.pack(bo + "H2x", 8 if deflate else 1)),
            entry(262, 3, 1, struct.pack(bo + "H2x", 1)),
            entry(277, 3, 1, struct.pack(bo + "H2x", 1)),
            entry(322, 4, 1, struct.pack(bo + "I", tw)),   # TileWidth
            entry(323, 4, 1, struct.pack(bo + "I", tl)),   # TileLength
            entry(324, 4, n_tiles, struct.pack(bo + "I", toff_off)),
            entry(325, 4, n_tiles, struct.pack(bo + "I", tcnt_off)),
            entry(339, 3, 1, struct.pack(bo + "H2x", 3)),
            entry(284, 3, 1, struct.pack(bo + "H2x", 1)),
        ]
    )
    return (
        (b"II" if bo == "<" else b"MM")
        + struct.pack(bo + "HI", 42, 8)
        + struct.pack(bo + "H", n)
        + entries
        + struct.pack(bo + "I", 0)
        + b"".join(struct.pack(bo + "I", o) for o in offs)
        + b"".join(struct.pack(bo + "I", len(t)) for t in tiles)
        + b"".join(tiles)
    )


@pytest.mark.parametrize("deflate", [False, True])
@pytest.mark.parametrize("bo", ["<", ">"])
def test_tiled_read_with_edge_cropping(tmp_path, deflate, bo):
    """Tiled organization (GDAL TILED=YES): 7x10 grid under 4x3 tiles —
    neither dimension divides evenly, so every right/bottom edge tile
    is padded in the file and must crop on read; with deflate each
    tile is an independent zlib stream."""
    grid = np.arange(70, dtype=np.float32).reshape(7, 10) * 1.5
    p = tmp_path / ("t_%s_%s.tif" % (deflate, bo == "<"))
    p.write_bytes(_assemble_tiled(grid, tw=3, tl=4, deflate=deflate, bo=bo))
    back, info = read_gtiff(str(p))
    assert back.dtype == np.float32 and np.array_equal(back, grid)
    assert info == {"nodata": None, "tags": {}}


def test_tiled_tile_count_validation(tmp_path):
    grid = np.ones((4, 4), np.float32)
    buf = bytearray(_assemble_tiled(grid, tw=2, tl=2))
    # corrupt the TileOffsets count: claim 2 tiles for a 2x2 tile grid
    n = struct.unpack("<H", buf[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        (tag,) = struct.unpack("<H", buf[off : off + 2])
        if tag in (324, 325):
            buf[off + 4 : off + 8] = struct.pack("<I", 2)
    p = tmp_path / "bad.tif"
    p.write_bytes(bytes(buf))
    with pytest.raises(ValueError, match="tile"):
        read_gtiff(str(p))


def test_tiled_rasterio_interop(tmp_path):
    """GDAL-written tiled+deflate GeoTIFF through the builtin reader —
    the real-world layout the round-8 codec rejected."""
    rasterio = pytest.importorskip("rasterio")
    grid = np.random.default_rng(5).normal(size=(37, 53)).astype(np.float32)
    p = str(tmp_path / "gdal_tiled.tif")
    with rasterio.open(
        p, "w", driver="GTiff", height=37, width=53, count=1,
        dtype="float32", tiled=True, blockxsize=16, blockysize=16,
        compress="deflate",
    ) as dst:
        dst.write(grid, 1)
    back, _ = read_gtiff(p)
    assert np.array_equal(back, grid)


def _lzw_encode(data: bytes) -> bytes:
    """Spec-faithful TIFF LZW encoder (test-side only; the codec module
    ships decode): MSB-first packing, CLEAR first, EOI last, and the
    encoder-side early change — the code width grows when the next
    code TO BE ASSIGNED is 2**width - 1, mirroring the decoder."""
    CLEAR, EOI = 256, 257
    bits = bytearray()
    acc, nacc = 0, 0
    nbits = 9

    def emit(code):
        nonlocal acc, nacc
        acc = (acc << nbits) | code
        nacc += nbits
        while nacc >= 8:
            nacc -= 8
            bits.append((acc >> nacc) & 0xFF)

    def reset():
        return {bytes([i]): i for i in range(256)}

    emit(CLEAR)
    table, next_code = reset(), 258
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << nbits) - 1 and nbits < 12:
            nbits += 1
        if next_code > 4093:  # keep clear of the 12-bit ceiling
            emit(CLEAR)
            table, next_code, nbits = reset(), 258, 9
        w = c
    if w:
        emit(table[w])
    emit(EOI)
    if nacc:
        bits.append((acc << (8 - nacc)) & 0xFF)
    return bytes(bits)


def test_lzw_decoder_roundtrip_and_structure(tmp_path):
    from sklearn_raster_spark.sources.tiff import _lzw_decode

    rng = np.random.default_rng(11)
    for payload in (
        b"",
        b"A",
        b"TOBEORNOTTOBEORTOBEORNOT" * 3,          # classic LZW exercise
        bytes(rng.integers(0, 4, 9000, dtype=np.uint8)),   # deep table
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)), # incompressible
        bytes(5000),                                        # runs (KwKwK)
    ):
        assert _lzw_decode(_lzw_encode(payload)) == payload

    # a full LZW TIFF: flip the writer's Compression tag and replace
    # the strip with the LZW stream
    grid = np.arange(240, dtype=np.uint16).reshape(12, 20) % 97
    raw = grid.astype("<u2").tobytes()
    p = tmp_path / "lzw_real.tif"
    write_gtiff(str(p), grid)
    buf = bytearray(p.read_bytes())
    comp = _lzw_encode(raw)
    (n,) = struct.unpack("<H", buf[8:10])
    data_off = None
    for i in range(n):
        off = 10 + 12 * i
        (tag,) = struct.unpack("<H", buf[off : off + 2])
        if tag == 259:
            buf[off + 8 : off + 10] = struct.pack("<H", 5)
        elif tag == 273:
            (data_off,) = struct.unpack("<I", buf[off + 8 : off + 12])
        elif tag == 279:
            cnt_entry_off = off
    buf[cnt_entry_off + 8 : cnt_entry_off + 12] = struct.pack("<I", len(comp))
    p.write_bytes(bytes(buf[:data_off]) + comp)
    back, _ = read_gtiff(str(p))
    assert np.array_equal(back, grid)


def test_lzw_with_horizontal_predictor(tmp_path):
    """LZW + predictor 2, the exact combination GDAL writes for integer
    rasters with COMPRESS=LZW PREDICTOR=2: samples are stored as deltas
    to the left neighbour (per row, dtype wraparound) before LZW."""
    grid = np.cumsum(
        np.random.default_rng(13).integers(-3, 4, size=(9, 14)), axis=1
    ).astype(np.int16)
    diffed = grid.copy()
    diffed[:, 1:] = (grid[:, 1:].astype(np.int32) - grid[:, :-1]).astype(np.int16)
    raw = diffed.astype("<i2").tobytes()
    p = tmp_path / "lzw_pred.tif"
    write_gtiff(str(p), grid)
    buf = bytearray(p.read_bytes())
    comp = _lzw_encode(raw)
    (n,) = struct.unpack("<H", buf[8:10])
    # rewrite Compression->5 and splice a Predictor=2 entry by rebuilding
    # the IFD with one extra entry
    entries = []
    data_off = None
    for i in range(n):
        off = 10 + 12 * i
        e = bytes(buf[off : off + 12])
        (tag,) = struct.unpack("<H", e[:2])
        if tag == 259:
            e = struct.pack("<HHI", 259, 3, 1) + struct.pack("<H2x", 5)
        if tag == 273:
            (data_off,) = struct.unpack("<I", e[8:12])
        if tag == 279:
            e = struct.pack("<HHI", 279, 4, 1) + struct.pack("<I", len(comp))
        entries.append((tag, e))
    entries.append((317, struct.pack("<HHI", 317, 3, 1) + struct.pack("<H2x", 2)))
    entries.sort()
    shift = 12  # one extra IFD entry moves every offset by 12
    rebuilt = bytearray(b"II" + struct.pack("<HI", 42, 8))
    rebuilt += struct.pack("<H", n + 1)
    for tag, e in entries:
        if tag == 273:
            e = e[:8] + struct.pack("<I", data_off + shift)
        rebuilt += e
    rebuilt += struct.pack("<I", 0)
    rebuilt += buf[10 + 12 * n + 4 : data_off]  # ascii payloads (none here)
    rebuilt += comp
    p.write_bytes(bytes(rebuilt))
    back, _ = read_gtiff(str(p))
    assert back.dtype == np.int16 and np.array_equal(back, grid)


def test_lzw_rasterio_interop(tmp_path):
    """GDAL-written LZW(+predictor) through the builtin decoder — the
    spec cross-check that self-round-trip alone cannot provide."""
    rasterio = pytest.importorskip("rasterio")
    grid = (np.random.default_rng(17).integers(0, 5000, size=(33, 41))
            .astype(np.uint16))
    for pred in (1, 2):
        p = str(tmp_path / f"gdal_lzw_{pred}.tif")
        with rasterio.open(
            p, "w", driver="GTiff", height=33, width=41, count=1,
            dtype="uint16", compress="lzw", predictor=pred,
        ) as dst:
            dst.write(grid, 1)
        back, _ = read_gtiff(p)
        assert np.array_equal(back, grid), f"predictor={pred}"


def test_tiled_lzw_with_predictor(tmp_path):
    """Tiled + LZW + predictor 2 together: differencing RESTARTS at
    every tile row (tiles split image rows horizontally), so a
    full-grid cumsum would misread each non-first tile's first column.
    Hand-assembled: each tile horizontally differenced independently,
    then LZW'd, under a 4x3 tile grid with edge cropping."""
    grid = np.cumsum(
        np.random.default_rng(23).integers(-2, 3, size=(7, 10)), axis=1
    ).astype(np.uint16)
    tw, tl = 3, 4
    h, w = grid.shape
    across, down = -(-w // tw), -(-h // tl)
    tiles = []
    for ty in range(down):
        for tx in range(across):
            pad = np.zeros((tl, tw), grid.dtype)
            block = grid[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
            pad[: block.shape[0], : block.shape[1]] = block
            d = pad.copy()
            d[:, 1:] = pad[:, 1:] - pad[:, :-1]  # uint16 wraparound diff
            tiles.append(_lzw_encode(d.astype("<u2").tobytes()))

    def entry(tag, typ, count, value_bytes):
        return struct.pack("<HHI", tag, typ, count) + value_bytes

    n = 13
    after_ifd = 8 + 2 + 12 * n + 4
    n_tiles = len(tiles)
    toff_off = after_ifd
    tcnt_off = after_ifd + 4 * n_tiles
    data_off = tcnt_off + 4 * n_tiles
    offs, pos = [], data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    entries = b"".join(
        [
            entry(256, 4, 1, struct.pack("<I", w)),
            entry(257, 4, 1, struct.pack("<I", h)),
            entry(258, 3, 1, struct.pack("<H2x", 16)),
            entry(259, 3, 1, struct.pack("<H2x", 5)),   # LZW
            entry(262, 3, 1, struct.pack("<H2x", 1)),
            entry(277, 3, 1, struct.pack("<H2x", 1)),
            entry(284, 3, 1, struct.pack("<H2x", 1)),
            entry(317, 3, 1, struct.pack("<H2x", 2)),   # predictor 2
            entry(322, 4, 1, struct.pack("<I", tw)),
            entry(323, 4, 1, struct.pack("<I", tl)),
            entry(324, 4, n_tiles, struct.pack("<I", toff_off)),
            entry(325, 4, n_tiles, struct.pack("<I", tcnt_off)),
            entry(339, 3, 1, struct.pack("<H2x", 1)),
        ]
    )
    buf = (
        b"II"
        + struct.pack("<HI", 42, 8)
        + struct.pack("<H", n)
        + entries
        + struct.pack("<I", 0)
        + b"".join(struct.pack("<I", o) for o in offs)
        + b"".join(struct.pack("<I", len(t)) for t in tiles)
        + b"".join(tiles)
    )
    p = tmp_path / "tiled_lzw_pred.tif"
    p.write_bytes(buf)
    back, _ = read_gtiff(str(p))
    assert back.dtype == np.uint16 and np.array_equal(back, grid)


def _packbits_encode(data: bytes) -> bytes:
    """Test-side PackBits encoder: greedy runs >= 3 become replicate
    packets, everything else literal packets of <= 128 bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        start = i
        i += run
        while i < n and (i - start) < 128:
            nxt = 1
            while i + nxt < n and nxt < 128 and data[i + nxt] == data[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += nxt
        out.append(i - start - 1)
        out += data[start:i]
    return bytes(out)


def test_packbits_decode(tmp_path):
    from sklearn_raster_spark.sources.tiff import _packbits_decode

    rng = np.random.default_rng(29)
    for payload in (
        b"",
        b"\x00" * 300,                                      # long runs split at 128
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),   # mostly literals
        bytes(rng.integers(0, 2, 700, dtype=np.uint8)),     # mixed runs
        b"AAAB" * 50,
    ):
        assert _packbits_decode(_packbits_encode(payload)) == payload
    # the -128 no-op control byte must be skipped
    assert _packbits_decode(b"\x80\x00A\x80") == b"A"

    # a full PackBits TIFF via the compression-tag splice
    grid = (np.arange(96, dtype=np.uint8).reshape(8, 12) // 7).astype(np.uint8)
    raw = grid.tobytes()
    p = tmp_path / "pb.tif"
    write_gtiff(str(p), grid)
    buf = bytearray(p.read_bytes())
    comp = _packbits_encode(raw)
    (n,) = struct.unpack("<H", buf[8:10])
    data_off = None
    for i in range(n):
        off = 10 + 12 * i
        (tag,) = struct.unpack("<H", buf[off : off + 2])
        if tag == 259:
            buf[off + 8 : off + 10] = struct.pack("<H", 32773 & 0xFFFF)
        elif tag == 273:
            (data_off,) = struct.unpack("<I", buf[off + 8 : off + 12])
        elif tag == 279:
            buf[off + 8 : off + 12] = struct.pack("<I", len(comp))
    p.write_bytes(bytes(buf[:data_off]) + comp)
    back, _ = read_gtiff(str(p))
    assert np.array_equal(back, grid)


def test_packbits_rasterio_interop(tmp_path):
    rasterio = pytest.importorskip("rasterio")
    grid = (np.random.default_rng(37).integers(0, 4, size=(21, 33))
            .astype(np.uint8))
    p = str(tmp_path / "gdal_pb.tif")
    with rasterio.open(
        p, "w", driver="GTiff", height=21, width=33, count=1,
        dtype="uint8", compress="packbits",
    ) as dst:
        dst.write(grid, 1)
    back, _ = read_gtiff(p)
    assert np.array_equal(back, grid)


def _float_predict(seg: np.ndarray) -> bytes:
    """Test-side predictor-3 encoder (TIFF TechNote 3): big-endian byte
    planes per row, then byte-wise horizontal differencing."""
    rows, width = seg.shape
    itemsize = seg.dtype.itemsize
    be = seg.astype(seg.dtype.newbyteorder(">"), copy=False)
    b = np.frombuffer(be.tobytes(), np.uint8).reshape(rows, width, itemsize)
    planes = b.transpose(0, 2, 1).reshape(rows, width * itemsize).copy()
    diff = planes.copy()
    diff[:, 1:] = planes[:, 1:] - planes[:, :-1]  # uint8 wraparound
    return diff.tobytes()


@pytest.mark.parametrize("dt", [np.float32, np.float64])
def test_float_predictor_strips_and_tiles(tmp_path, dt):
    """Predictor 3 over deflate strips AND over tiled LZW — the
    GDAL COMPRESS=DEFLATE/LZW PREDICTOR=3 layouts for float rasters
    (DEM-style data, the reference's own domain)."""
    import zlib as _zlib

    rng = np.random.default_rng(41)
    grid = rng.normal(scale=100.0, size=(7, 10)).astype(dt)

    # strip variant: splice predictor=3 + deflate(predicted bytes)
    p = tmp_path / "fp_strip.tif"
    write_gtiff(str(p), grid)
    buf = bytearray(p.read_bytes())
    comp = _zlib.compress(_float_predict(grid))
    (n,) = struct.unpack("<H", buf[8:10])
    entries, data_off = [], None
    for i in range(n):
        off = 10 + 12 * i
        e = bytes(buf[off : off + 12])
        (tag,) = struct.unpack("<H", e[:2])
        if tag == 259:
            e = struct.pack("<HHI", 259, 3, 1) + struct.pack("<H2x", 8)
        if tag == 273:
            (data_off,) = struct.unpack("<I", e[8:12])
        if tag == 279:
            e = struct.pack("<HHI", 279, 4, 1) + struct.pack("<I", len(comp))
        entries.append((tag, e))
    entries.append((317, struct.pack("<HHI", 317, 3, 1) + struct.pack("<H2x", 3)))
    entries.sort()
    rebuilt = bytearray(b"II" + struct.pack("<HI", 42, 8))
    rebuilt += struct.pack("<H", n + 1)
    for tag, e in entries:
        if tag == 273:
            e = e[:8] + struct.pack("<I", data_off + 12)
        rebuilt += e
    rebuilt += struct.pack("<I", 0)
    rebuilt += buf[10 + 12 * n + 4 : data_off]
    rebuilt += comp
    p.write_bytes(bytes(rebuilt))
    back, _ = read_gtiff(str(p))
    assert back.dtype == dt and np.array_equal(back, grid)

    # tiled variant: per-tile predict + LZW under a 4x3 tile grid
    tw, tl = 4, 3
    h, w = grid.shape
    across, down = -(-w // tw), -(-h // tl)
    tiles = []
    for ty in range(down):
        for tx in range(across):
            pad = np.zeros((tl, tw), grid.dtype)
            block = grid[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
            pad[: block.shape[0], : block.shape[1]] = block
            tiles.append(_lzw_encode(_float_predict(pad)))

    def entry(tag, typ, count, vb):
        return struct.pack("<HHI", tag, typ, count) + vb

    bits = grid.dtype.itemsize * 8
    n2 = 13
    after_ifd = 8 + 2 + 12 * n2 + 4
    n_tiles = len(tiles)
    toff_off, tcnt_off = after_ifd, after_ifd + 4 * n_tiles
    dstart = tcnt_off + 4 * n_tiles
    offs, pos = [], dstart
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    ifd = b"".join(
        [
            entry(256, 4, 1, struct.pack("<I", w)),
            entry(257, 4, 1, struct.pack("<I", h)),
            entry(258, 3, 1, struct.pack("<H2x", bits)),
            entry(259, 3, 1, struct.pack("<H2x", 5)),
            entry(262, 3, 1, struct.pack("<H2x", 1)),
            entry(277, 3, 1, struct.pack("<H2x", 1)),
            entry(284, 3, 1, struct.pack("<H2x", 1)),
            entry(317, 3, 1, struct.pack("<H2x", 3)),
            entry(322, 4, 1, struct.pack("<I", tw)),
            entry(323, 4, 1, struct.pack("<I", tl)),
            entry(324, 4, n_tiles, struct.pack("<I", toff_off)),
            entry(325, 4, n_tiles, struct.pack("<I", tcnt_off)),
            entry(339, 3, 1, struct.pack("<H2x", 3)),
        ]
    )
    p2 = tmp_path / "fp_tiled.tif"
    p2.write_bytes(
        b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", n2) + ifd
        + struct.pack("<I", 0)
        + b"".join(struct.pack("<I", o) for o in offs)
        + b"".join(struct.pack("<I", len(t)) for t in tiles)
        + b"".join(tiles)
    )
    back2, _ = read_gtiff(str(p2))
    assert back2.dtype == dt and np.array_equal(back2, grid)


def test_float_predictor_rasterio_interop(tmp_path):
    rasterio = pytest.importorskip("rasterio")
    grid = np.random.default_rng(43).normal(size=(19, 27)).astype(np.float32)
    p = str(tmp_path / "gdal_fp.tif")
    with rasterio.open(
        p, "w", driver="GTiff", height=19, width=27, count=1,
        dtype="float32", compress="deflate", predictor=3,
    ) as dst:
        dst.write(grid, 1)
    back, _ = read_gtiff(p)
    assert np.array_equal(back, grid)


# ---------------------------------------------------------------- BigTIFF


@pytest.mark.parametrize("compress", [None, "deflate"])
@pytest.mark.parametrize("dtype", [np.uint8, np.int32, np.float64])
def test_bigtiff_roundtrip_bitexact(tmp_path, compress, dtype):
    """BigTIFF (version 43, 8-byte offsets, 20-byte IFD entries) must
    round-trip bit-exact with tags and nodata, like classic TIFF."""
    rng = np.random.default_rng(11)
    if np.issubdtype(dtype, np.floating):
        grid = rng.normal(size=(9, 7)).astype(dtype)
    else:
        grid = rng.integers(0, 200, size=(9, 7)).astype(dtype)
    p = str(tmp_path / "big.tif")
    write_gtiff(
        p, grid, nodata=-1.0, tags={"long_name": "elevation", "units": "m"},
        compress=compress, bigtiff=True,
    )
    raw = open(p, "rb").read()
    assert raw[:2] == b"II" and struct.unpack("<H", raw[2:4])[0] == 43
    assert struct.unpack("<HH", raw[4:8]) == (8, 0)
    back, info = read_gtiff(p)
    assert back.dtype == grid.dtype and np.array_equal(back, grid)
    assert info["nodata"] == -1.0
    assert info["tags"] == {"long_name": "elevation", "units": "m"}


def test_bigtiff_big_endian_multistrip_handassembled(tmp_path):
    """A big-endian multi-strip BigTIFF with out-of-line LONG8 strip
    tables — the layout the writer never produces but the 8-byte
    offset format exists for. Hand-assembled per the BigTIFF spec."""
    h, w = 4, 3
    grid = np.arange(h * w, dtype=np.uint16).reshape(h, w)
    strips = [grid[:2].astype(">u2").tobytes(), grid[2:].astype(">u2").tobytes()]
    n = 9
    ifd_off = 16
    # entries: 20 bytes each; out-of-line tables follow next-IFD ptr
    tables_off = ifd_off + 8 + 20 * n + 8
    soff_off = tables_off            # 2 x LONG8 strip offsets
    scnt_off = tables_off + 16       # 2 x LONG8 strip counts
    data_off = tables_off + 32

    def entry(tag, typ, count, vfield8):
        return struct.pack(">HHQ", tag, typ, count) + vfield8

    def short(v):
        return struct.pack(">H", v) + b"\x00" * 6

    def long8(v):
        return struct.pack(">Q", v)

    entries = b"".join(
        [
            entry(256, 3, 1, short(w)),
            entry(257, 3, 1, short(h)),
            entry(258, 3, 1, short(16)),
            entry(259, 3, 1, short(1)),
            entry(262, 3, 1, short(1)),
            entry(273, 16, 2, long8(soff_off)),
            entry(278, 3, 1, short(2)),  # 2 rows per strip
            entry(279, 16, 2, long8(scnt_off)),
            entry(339, 3, 1, short(1)),
        ]
    )
    p = tmp_path / "mm_big.tif"
    p.write_bytes(
        b"MM" + struct.pack(">HHHQ", 43, 8, 0, ifd_off)
        + struct.pack(">Q", n) + entries + struct.pack(">Q", 0)
        + struct.pack(">QQ", data_off, data_off + len(strips[0]))
        + struct.pack(">QQ", len(strips[0]), len(strips[1]))
        + b"".join(strips)
    )
    back, info = read_gtiff(str(p))
    assert back.dtype == np.uint16 and np.array_equal(back, grid)
    assert info["nodata"] is None and info["tags"] == {}


def test_bigtiff_rasterio_interop(tmp_path):
    rasterio = pytest.importorskip("rasterio")
    grid = np.random.default_rng(7).normal(size=(6, 8)).astype(np.float32)
    p = str(tmp_path / "interop_big.tif")
    write_gtiff(p, grid, nodata=-9999.0, bigtiff=True)
    with rasterio.open(p) as src:
        assert np.array_equal(src.read(1), grid)
        assert src.nodata == -9999.0
    p2 = str(tmp_path / "gdal_big.tif")
    with rasterio.open(
        p2, "w", driver="GTiff", height=6, width=8, count=1,
        dtype="float32", BIGTIFF="YES",
    ) as dst:
        dst.write(grid, 1)
    back, _ = read_gtiff(p2)
    assert np.array_equal(back, grid)
