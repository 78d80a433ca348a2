"""Corruption fuzz axis (round 10): every builtin codec is TOTAL over
arbitrary bytes — decode succeeds, or raises ValueError (malformed) /
NotImplementedError (route-to-library). Never struct.error /
zlib.error / IndexError / StopIteration / TypeError / RecursionError:
at 100 TB one such asset would fail the task, stage, then job
(VERDICT r9 "What's missing" #1). The wide sweep is
tools/corruption_fuzz.py; this pins a fast deterministic slice plus
the specific leaks the fuzzer found (regression seeds)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from corruption_fuzz import ALLOWED, build_assets, corrupt, fuzz_tiff  # noqa: E402


@pytest.mark.parametrize("seed", [0, 2])
def test_corruption_contract_all_codecs(seed):
    rng = np.random.default_rng(seed)
    assets = build_assets(rng)
    failures = []
    for name, (blob, decode) in assets.items():
        for case in range(40):
            mutated = corrupt(blob, rng)
            try:
                decode(mutated)
            except ALLOWED:
                pass
            except BaseException as exc:  # the contract violation class
                failures.append(f"{name} case {case}: {type(exc).__name__}: {exc}")
    assert not failures, failures


def test_corruption_contract_tiff():
    rng = np.random.default_rng(2)  # seed 2 found the float-offsets leak
    assert fuzz_tiff(60, rng) == []


def test_jpeg_scan_undefined_component_is_valueerror():
    """Regression (fuzzer seed 0, case 56): an SOS referencing a
    component id absent from the SOF escaped as StopIteration."""
    from sklearn_raster_spark.sources.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    jpg = bytearray(encode_jpeg(rng.integers(0, 256, (16, 16)).astype(np.uint8)))
    sos = bytes(jpg).find(b"\xff\xda")
    jpg[sos + 5] = 99  # scan component selector -> undefined id
    with pytest.raises(ValueError, match="undefined component"):
        decode_jpeg(bytes(jpg))


def test_tiff_float_typed_tables_are_valueerror(tmp_path):
    """Regression (fuzzer seed 2, case 60): a corrupt tag TYPE field
    parses strip offsets as floats -> TypeError on slicing."""
    from sklearn_raster_spark.sources.tiff import read_gtiff, write_gtiff

    src = tmp_path / "a.tif"
    write_gtiff(str(src), np.zeros((4, 5), np.float32), nodata=None, tags={})
    blob = bytearray(src.read_bytes())
    # classic TIFF: find the StripOffsets entry (tag 273) in the IFD
    # and rewrite its type from LONG (4) to FLOAT (11)
    import struct

    (ifd_off,) = struct.unpack("<I", blob[4:8])
    (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ = struct.unpack("<HH", blob[base : base + 4])
        if tag == 273:
            blob[base + 2 : base + 4] = struct.pack("<H", 11)
    bad = tmp_path / "bad.tif"
    bad.write_bytes(bytes(blob))
    with pytest.raises(ValueError):
        read_gtiff(str(bad))


def test_geometry_plausibility_guard():
    """A corrupt dimension field must be rejected BEFORE allocation
    (sources/_contract.py check_plausible)."""
    import struct
    import zlib

    from sklearn_raster_spark.sources.image import decode_png

    # hand-build a PNG declaring 2^16 x 2^16 pixels (4.3e9 > 2^28)
    ihdr = struct.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 0, 0, 0, 0)
    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="implausible"):
        decode_png(blob)
