"""Builtin baseline JPEG codec (sources/jpeg.py, ITU-T T.81):
round-trip fidelity laws, restart markers, abbreviated streams, the
rejection surface, Pillow interop (skip-gated), and JPEG-in-TIFF
(compression 7) through the raster codec. Dependency-free stand-in
for the Pillow JPEG path in decode_image."""

import struct

import numpy as np
import pytest

from sklearn_raster_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_tables,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h=37, w=53):
    y, x = np.mgrid[0:h, 0:w]
    return ((np.sin(x / 9.0) + np.cos(y / 7.0) + 2) / 4 * 255).astype(np.uint8)


def test_gray_roundtrip_quality_monotone():
    g = _gradient()
    prev = 0.0
    for q in (50, 75, 85, 95, 100):
        back = decode_jpeg(encode_jpeg(g, quality=q))
        assert back.shape == g.shape and back.dtype == np.uint8
        p = _psnr(g, back)
        assert p > prev - 0.5, f"quality {q} regressed PSNR {p} < {prev}"
        prev = p
    assert prev > 55  # q100 on smooth content is near-lossless


def test_quality100_ascii_grid_error_bound():
    """The q163 contract: at quality 100 (all-ones quant tables) the
    only loss is DCT rounding — |err| <= 3 on byte-noise grids."""
    rng = np.random.default_rng(5)
    for _ in range(10):
        n = int(rng.integers(5, 700))
        raw = rng.integers(32, 127, n).astype(np.uint8)
        g = np.zeros(-(-n // 32) * 32, np.uint8)
        g[:n] = raw
        g = g.reshape(-1, 32)
        back = decode_jpeg(encode_jpeg(g, quality=100))
        assert int(np.max(np.abs(back.astype(int) - g.astype(int)))) <= 3


def test_rgb_444_and_420_roundtrip():
    g = _gradient()
    rgb = np.stack([g, 255 - g, np.roll(g, 5, axis=1)], axis=-1)
    back444 = decode_jpeg(encode_jpeg(rgb, quality=90, subsampling="444"))
    back420 = decode_jpeg(encode_jpeg(rgb, quality=90, subsampling="420"))
    assert back444.shape == rgb.shape and back420.shape == rgb.shape
    assert _psnr(rgb, back444) > 40
    # box-replicated chroma upsampling: lower, but still faithful
    assert _psnr(rgb, back420) > 28


def test_non_multiple_of_mcu_dimensions():
    """Edge blocks are padded at encode and cropped at decode — every
    (h, w) near the 8/16 boundaries must round-trip at declared size."""
    rng = np.random.default_rng(6)
    for h, w in [(1, 1), (7, 9), (8, 8), (9, 17), (15, 16), (17, 15)]:
        g = rng.integers(0, 256, (h, w)).astype(np.uint8)
        back = decode_jpeg(encode_jpeg(g, quality=95))
        assert back.shape == (h, w)
        rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        back = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling="420"))
        assert back.shape == (h, w, 3)


def test_constant_image_quality100_exact():
    c = np.full((16, 24), 137, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(c, quality=100)), c)


def test_restart_markers_decode_identically():
    g = _gradient(24, 40)
    rgb = np.stack([g, g[::-1], 255 - g], axis=-1)
    base_g = decode_jpeg(encode_jpeg(g, quality=90))
    base_c = decode_jpeg(encode_jpeg(rgb, quality=90, subsampling="420"))
    for ri in (1, 2, 3, 7):
        bytes_g = encode_jpeg(g, quality=90, restart_interval=ri)
        assert b"\xff\xdd" in bytes_g  # DRI present
        assert np.array_equal(decode_jpeg(bytes_g), base_g)
        bytes_c = encode_jpeg(rgb, quality=90, subsampling="420", restart_interval=ri)
        assert np.array_equal(decode_jpeg(bytes_c), base_c)


def test_abbreviated_stream_with_jpeg_tables():
    """The TIFF compression-7 shape: tables-only prelude + image
    stream with no DQT/DHT must decode exactly like the full file."""
    g = _gradient(20, 30)
    full = decode_jpeg(encode_jpeg(g, quality=92))
    abbrev = encode_jpeg(g, quality=92, omit_tables=True)
    tables = encode_jpeg_tables(quality=92, gray=True)
    assert len(abbrev) < len(encode_jpeg(g, quality=92))
    assert np.array_equal(decode_jpeg(abbrev, tables=tables), full)
    with pytest.raises(ValueError, match="undefined"):
        decode_jpeg(abbrev)


def test_16bit_dqt_entries_decode():
    """DQT with Pq=1 (16-bit entries) is legal in extended streams;
    rewrite the 8-bit table segment into its 16-bit form."""
    g = _gradient(16, 16)
    buf = encode_jpeg(g, quality=85)
    # locate the DQT segment (FF DB), rewrite payload to 16-bit
    i = buf.index(b"\xff\xdb")
    (seg_len,) = struct.unpack(">H", buf[i + 2 : i + 4])
    payload = buf[i + 4 : i + 2 + seg_len]
    assert payload[0] == 0x00  # Pq=0, Tq=0
    entries = np.frombuffer(payload[1:65], np.uint8).astype(">u2").tobytes()
    new_payload = b"\x10" + entries  # Pq=1, Tq=0
    new_seg = struct.pack(">H", len(new_payload) + 2) + new_payload
    rewritten = buf[: i + 2] + new_seg + buf[i + 2 + seg_len :]
    assert np.array_equal(decode_jpeg(rewritten), decode_jpeg(buf))


def test_rejection_surface():
    g = _gradient(8, 8)
    buf = bytearray(encode_jpeg(g, quality=85))
    i = buf.index(b"\xff\xc0")
    buf[i + 1] = 0xC9  # arithmetic sequential
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(buf))
    buf[i + 1] = 0xC3  # lossless
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(buf))
    buf[i + 1] = 0xC0

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")

    # chopped mid-entropy-data: pointed truncation error
    big = encode_jpeg(_gradient(24, 24), quality=95)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(big[:-20])
    # chopped mid-DQT: pointed truncation error too
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(big[:40])


def test_decode_image_dispatches_jpeg():
    from sklearn_raster_spark.sources.image import decode_image

    g = _gradient(12, 20)
    back = decode_image(encode_jpeg(g, quality=100))
    assert back.shape == (12, 20)
    assert int(np.max(np.abs(back.astype(int) - g.astype(int)))) <= 3


# ------------------------------------------------------- JPEG-in-TIFF


def _tiff_entry(tag, typ, count, vbytes):
    return struct.pack("<HHI", tag, typ, count) + vbytes


def test_jpeg_in_tiff_strips(tmp_path):
    """Hand-assembled compression-7 TIFF: two strips, each an
    abbreviated JPEG stream, shared tables in JPEGTables (tag 347)."""
    from sklearn_raster_spark.sources.tiff import read_gtiff

    h, w = 12, 32
    rng = np.random.default_rng(13)
    grid = rng.integers(32, 127, (h, w)).astype(np.uint8)
    tables = encode_jpeg_tables(quality=100, gray=True)
    strips = [
        encode_jpeg(grid[:8], quality=100, omit_tables=True),
        encode_jpeg(grid[8:], quality=100, omit_tables=True),
    ]
    n = 11
    ifd_off = 8
    after = ifd_off + 2 + 12 * n + 4
    soff_off, scnt_off = after, after + 8
    tbl_off = after + 16
    data_off = tbl_off + len(tables)
    entries = b"".join(
        [
            _tiff_entry(256, 4, 1, struct.pack("<I", w)),
            _tiff_entry(257, 4, 1, struct.pack("<I", h)),
            _tiff_entry(258, 3, 1, struct.pack("<H2x", 8)),
            _tiff_entry(259, 3, 1, struct.pack("<H2x", 7)),
            _tiff_entry(262, 3, 1, struct.pack("<H2x", 1)),
            _tiff_entry(273, 4, 2, struct.pack("<I", soff_off)),
            _tiff_entry(277, 3, 1, struct.pack("<H2x", 1)),
            _tiff_entry(278, 4, 1, struct.pack("<I", 8)),
            _tiff_entry(279, 4, 2, struct.pack("<I", scnt_off)),
            _tiff_entry(339, 3, 1, struct.pack("<H2x", 1)),
            _tiff_entry(347, 7, len(tables), struct.pack("<I", tbl_off)),
        ]
    )
    p = tmp_path / "jpeg7.tif"
    p.write_bytes(
        b"II" + struct.pack("<HI", 42, ifd_off) + struct.pack("<H", n)
        + entries + struct.pack("<I", 0)
        + struct.pack("<II", data_off, data_off + len(strips[0]))
        + struct.pack("<II", len(strips[0]), len(strips[1]))
        + tables
        + b"".join(strips)
    )
    back, info = read_gtiff(str(p))
    assert back.shape == (h, w) and back.dtype == np.uint8
    assert int(np.max(np.abs(back.astype(int) - grid.astype(int)))) <= 3
    assert info == {"nodata": None, "tags": {}}


def test_jpeg_in_tiff_tiles_selfcontained_streams(tmp_path):
    """Tiled compression-7 with SELF-CONTAINED per-tile streams (no
    JPEGTables) — GDAL writes both shapes. Edge tiles padded/cropped."""
    from sklearn_raster_spark.sources.tiff import read_gtiff

    h, w, tl, tw = 10, 40, 8, 32
    rng = np.random.default_rng(14)
    grid = rng.integers(32, 127, (h, w)).astype(np.uint8)
    padded = np.zeros((16, 64), np.uint8)
    padded[:h, :w] = grid
    tiles = [
        encode_jpeg(padded[ty : ty + tl, tx : tx + tw], quality=100)
        for ty in range(0, 16, tl)
        for tx in range(0, 64, tw)
    ]
    n = 10
    ifd_off = 8
    after = ifd_off + 2 + 12 * n + 4
    toff_off, tcnt_off = after, after + 16
    data_off = after + 32
    offs = []
    pos = data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    entries = b"".join(
        [
            _tiff_entry(256, 4, 1, struct.pack("<I", w)),
            _tiff_entry(257, 4, 1, struct.pack("<I", h)),
            _tiff_entry(258, 3, 1, struct.pack("<H2x", 8)),
            _tiff_entry(259, 3, 1, struct.pack("<H2x", 7)),
            _tiff_entry(262, 3, 1, struct.pack("<H2x", 1)),
            _tiff_entry(277, 3, 1, struct.pack("<H2x", 1)),
            _tiff_entry(322, 4, 1, struct.pack("<I", tw)),
            _tiff_entry(323, 4, 1, struct.pack("<I", tl)),
            _tiff_entry(324, 4, 4, struct.pack("<I", toff_off)),
            _tiff_entry(325, 4, 4, struct.pack("<I", tcnt_off)),
        ]
    )
    p = tmp_path / "jpeg7_tiled.tif"
    p.write_bytes(
        b"II" + struct.pack("<HI", 42, ifd_off) + struct.pack("<H", n)
        + entries + struct.pack("<I", 0)
        + b"".join(struct.pack("<I", o) for o in offs)
        + b"".join(struct.pack("<I", len(t)) for t in tiles)
        + b"".join(tiles)
    )
    back, _ = read_gtiff(str(p))
    assert back.shape == (h, w)
    assert int(np.max(np.abs(back.astype(int) - grid.astype(int)))) <= 3


# --------------------------------------------------------- Pillow interop


def test_pillow_decodes_our_streams(tmp_path):
    Image = pytest.importorskip("PIL.Image")
    import io

    g = _gradient()
    rgb = np.stack([g, 255 - g, np.roll(g, 3, axis=0)], axis=-1)
    for img, sub in ((g, "444"), (rgb, "444"), (rgb, "420")):
        data = encode_jpeg(img, quality=95, subsampling=sub)
        theirs = np.asarray(Image.open(io.BytesIO(data)).convert(
            "L" if img.ndim == 2 else "RGB"
        ))
        assert theirs.shape == img.shape
        assert _psnr(img, theirs) > (40 if sub == "444" else 28)


def test_our_decoder_reads_pillow_streams():
    Image = pytest.importorskip("PIL.Image")
    import io

    g = _gradient()
    rgb = np.stack([g, 255 - g, np.roll(g, 3, axis=0)], axis=-1)
    for img, mode, sub in ((g, "L", 0), (rgb, "RGB", 0), (rgb, "RGB", 2)):
        buf = io.BytesIO()
        Image.fromarray(img, mode=mode).save(
            buf, format="JPEG", quality=95, subsampling=sub
        )
        ours = decode_jpeg(buf.getvalue())
        assert ours.shape == img.shape
        assert _psnr(img, ours) > (38 if sub == 0 else 28)


def test_gdal_jpeg_in_tiff_interop(tmp_path):
    rasterio = pytest.importorskip("rasterio")
    g = _gradient(33, 47)
    p = str(tmp_path / "gdal_jpeg.tif")
    with rasterio.open(
        p, "w", driver="GTiff", height=33, width=47, count=1,
        dtype="uint8", compress="jpeg", jpeg_quality=95,
    ) as dst:
        dst.write(g, 1)
    from sklearn_raster_spark.sources.tiff import read_gtiff

    back, _ = read_gtiff(p)
    assert back.shape == g.shape
    assert _psnr(g, back) > 35


# ------------------------------------------------- progressive decode

from sklearn_raster_spark.sources.jpeg import (  # noqa: E402
    ZIGZAG,
    _AC_CHROMA,
    _AC_LUMA,
    _BitWriter,
    _DC_CHROMA,
    _DC_LUMA,
    _DCT_A,
    _QT_CHROMA,
    _QT_LUMA,
    _build_encode_table,
    _pad_to,
    _quality_scale,
    _table_segments,
)


def _quantized_blocks(plane, qt):
    """(H8, W8) float plane -> (by, bx, 64) int zigzag coefficients,
    quantized exactly like encode_jpeg."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = np.zeros((by, bx, 64), np.int64)
    for y in range(by):
        for x in range(bx):
            coef = _DCT_A @ (plane[y*8:(y+1)*8, x*8:(x+1)*8] - 128.0) @ _DCT_A.T
            blocks[y, x] = np.round(coef.reshape(64) / qt).astype(np.int64)[ZIGZAG]
    return blocks


def _mag_bits(v, s):
    return v if v > 0 else v + (1 << s) - 1


def _enc_dc_scan(wr, comp_blocks, hv, dc_tbls, al, first):
    """Interleaved DC scan over every component (first or refinement)."""
    hmax = max(h for h, v in hv)
    vmax = max(v for h, v in hv)
    by0, bx0 = comp_blocks[0].shape[:2]
    mcuy, mcux = by0 // hv[0][1], bx0 // hv[0][0]
    preds = [0] * len(comp_blocks)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, blocks in enumerate(comp_blocks):
                ch, cv = hv[ci]
                tbl = dc_tbls[ci]
                for vi in range(cv):
                    for hi in range(ch):
                        dc = int(blocks[my*cv+vi, mx*ch+hi][0])
                        if first:
                            t = dc >> al  # arithmetic shift, T.81 G.1.2.1
                            diff = t - preds[ci]
                            preds[ci] = t
                            s = abs(diff).bit_length()
                            code, length = tbl[s]
                            wr.write(code, length)
                            if s:
                                wr.write(_mag_bits(diff, s), s)
                        else:
                            wr.write((dc >> al) & 1, 1)


def _enc_ac_first(wr, blocks, ac_tbl, ss, se, al):
    """Single-component AC first pass over a spectral band."""
    by, bx = blocks.shape[:2]
    for y in range(by):
        for x in range(bx):
            zz = blocks[y, x]
            t = [
                (1 if zz[k] > 0 else -1) * (abs(int(zz[k])) >> al)
                for k in range(ss, se + 1)
            ]
            nz = [i for i, v in enumerate(t) if v]
            run = 0
            for i in range(0, (nz[-1] + 1) if nz else 0):
                if t[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tbl[0xF0]
                    wr.write(code, length)
                    run -= 16
                s = abs(t[i]).bit_length()
                code, length = ac_tbl[(run << 4) | s]
                wr.write(code, length)
                wr.write(_mag_bits(t[i], s), s)
                run = 0
            if not nz or nz[-1] < se - ss:
                code, length = ac_tbl[0x00]  # EOB (run of 1)
                wr.write(code, length)


def _enc_ac_refine(wr, blocks, ac_tbl, ss, se, ah, al):
    """Single-component AC refinement (T.81 figure G.7 semantics)."""
    by, bx = blocks.shape[:2]
    for y in range(by):
        for x in range(bx):
            zz = blocks[y, x]
            t = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            tprev = [abs(int(zz[k])) >> ah for k in range(ss, se + 1)]
            new_idx = [i for i, (a, b) in enumerate(zip(t, tprev))
                       if b == 0 and a != 0]
            eob = new_idx[-1] if new_idx else -1
            run, pending = 0, []
            for i, (mag, prev) in enumerate(zip(t, tprev)):
                if mag == 0:
                    run += 1
                    continue
                while run > 15 and i <= eob:
                    code, length = ac_tbl[0xF0]
                    wr.write(code, length)
                    run -= 16
                    for b in pending:
                        wr.write(b, 1)
                    pending = []
                if prev != 0:  # previously significant: correction bit
                    pending.append(mag & 1)
                    continue
                assert mag == 1, "refinement can only introduce +-1"
                code, length = ac_tbl[(run << 4) | 1]
                wr.write(code, length)
                wr.write(1 if zz[ss + i] > 0 else 0, 1)
                for b in pending:
                    wr.write(b, 1)
                pending = []
                run = 0
            if run > 0 or pending:
                code, length = ac_tbl[0x00]  # EOB covering the tail
                wr.write(code, length)
                for b in pending:
                    wr.write(b, 1)


def _progressive_stream(img, quality, scans, subsampling="444"):
    """Assemble a SOF2 stream for gray or RGB images. ``scans`` is a
    list of (comp_sel, ss, se, ah, al) with comp_sel None = interleaved
    DC over all components, else a component index."""
    gray = img.ndim == 2
    qt_l = _quality_scale(_QT_LUMA, quality)
    qt_c = _quality_scale(_QT_CHROMA, quality)
    sub = 2 if (subsampling == "420" and not gray) else 1
    if gray:
        planes = [_pad_to(img.astype(np.float64), 8, 8)]
        qts, hv = [qt_l], [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        yp = 0.299*rgb[..., 0] + 0.587*rgb[..., 1] + 0.114*rgb[..., 2]
        cb = 128.0 - 0.168736*rgb[..., 0] - 0.331264*rgb[..., 1] + 0.5*rgb[..., 2]
        cr = 128.0 + 0.5*rgb[..., 0] - 0.418688*rgb[..., 1] - 0.081312*rgb[..., 2]
        if sub == 2:
            cbp, crp = _pad_to(cb, 2, 2), _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0]//2, 2, cbp.shape[1]//2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0]//2, 2, crp.shape[1]//2, 2).mean((1, 3))
        planes = [_pad_to(yp, 8*sub, 8*sub), _pad_to(cb, 8, 8), _pad_to(cr, 8, 8)]
        qts, hv = [qt_l, qt_c, qt_c], [(sub, sub), (1, 1), (1, 1)]
    blocks = [_quantized_blocks(p, q) for p, q in zip(planes, qts)]

    dc_enc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    ac_enc = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]
    tsel = [0] + [1] * (len(planes) - 1)

    import struct as _s

    def seg(marker, payload):
        return _s.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")
    out += _table_segments(quality, gray)
    sof = _s.pack(">BHHB", 8, h, w, len(planes))
    for i, (ch, cv) in enumerate(hv):
        sof += bytes([i + 1, (ch << 4) | cv, 0 if i == 0 else 1])
    out += seg(0xC2, sof)
    for comp_sel, ss, se, ah, al in scans:
        wr = _BitWriter()
        if comp_sel is None:  # interleaved DC
            _enc_dc_scan(wr, blocks, hv, [dc_enc[t] for t in tsel], al, ah == 0)
            sos = bytes([len(planes)])
            for i in range(len(planes)):
                sos += bytes([i + 1, (tsel[i] << 4) | tsel[i]])
        else:
            ci = comp_sel
            # non-interleaved scans cover the component's OWN ceil
            # dimensions (T.81 A.2.2), not the MCU-padded allocation
            hmax = max(a for a, b in hv)
            vmax = max(b for a, b in hv)
            bw = -(- (-(-w * hv[ci][0] // hmax)) // 8)
            bh = -(- (-(-h * hv[ci][1] // vmax)) // 8)
            sub_blocks = blocks[ci][:bh, :bw]
            if ss == 0:  # single-component DC
                _enc_dc_scan(wr, [sub_blocks], [(1, 1)],
                             [dc_enc[tsel[ci]]], al, ah == 0)
            elif ah == 0:
                _enc_ac_first(wr, sub_blocks, ac_enc[tsel[ci]], ss, se, al)
            else:
                _enc_ac_refine(wr, sub_blocks, ac_enc[tsel[ci]], ss, se, ah, al)
            sos = bytes([1, ci + 1, (tsel[ci] << 4) | tsel[ci]])
        wr.flush()
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_spectral_selection_gray():
    """DC scan + two AC band scans (no successive approximation) must
    decode identically to the sequential stream of the same image."""
    g = _gradient(21, 19)
    seq = decode_jpeg(encode_jpeg(g, quality=85))
    prog = _progressive_stream(
        g, 85, [(None, 0, 0, 0, 0), (0, 1, 5, 0, 0), (0, 6, 63, 0, 0)]
    )
    assert np.array_equal(decode_jpeg(prog), seq)


def test_progressive_successive_approximation_gray():
    """The full libjpeg-style script: DC first at Al=1 + refinement,
    AC first at Al=2 then two refinement passes down to Al=0."""
    rng = np.random.default_rng(51)
    g = (rng.integers(0, 256, (24, 17)) // 1).astype(np.uint8)
    seq = decode_jpeg(encode_jpeg(g, quality=90))
    prog = _progressive_stream(
        g, 90,
        [
            (None, 0, 0, 0, 1),    # DC first, Al=1
            (0, 1, 63, 0, 2),      # AC first, Al=2
            (0, 1, 63, 2, 1),      # AC refine to Al=1
            (0, 1, 63, 1, 0),      # AC refine to Al=0
            (None, 0, 0, 1, 0),    # DC refine to Al=0
        ],
    )
    assert np.array_equal(decode_jpeg(prog), seq)


def test_progressive_color_420():
    rng = np.random.default_rng(52)
    g = _gradient(18, 22)
    rgb = np.stack([g, 255 - g, rng.integers(0, 256, g.shape).astype(np.uint8)],
                   axis=-1)
    seq = decode_jpeg(encode_jpeg(rgb, quality=88, subsampling="420"))
    prog = _progressive_stream(
        rgb, 88,
        [
            (None, 0, 0, 0, 1),
            (0, 1, 63, 0, 1),
            (1, 1, 63, 0, 1),
            (2, 1, 63, 0, 1),
            (0, 1, 63, 1, 0),
            (1, 1, 63, 1, 0),
            (2, 1, 63, 1, 0),
            (None, 0, 0, 1, 0),
        ],
        subsampling="420",
    )
    assert np.array_equal(decode_jpeg(prog), seq)


def test_progressive_pillow_interop():
    Image = pytest.importorskip("PIL.Image")
    import io

    g = _gradient(25, 33)
    rgb = np.stack([g, 255 - g, np.roll(g, 7, axis=1)], axis=-1)
    buf = io.BytesIO()
    Image.fromarray(rgb, mode="RGB").save(
        buf, format="JPEG", quality=92, progressive=True
    )
    ours = decode_jpeg(buf.getvalue())
    assert ours.shape == rgb.shape
    assert _psnr(rgb, ours) > 30
