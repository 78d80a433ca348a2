"""Corruption fuzz axis (round 10): the codec failure contract.

For every builtin codec, start from VALID assets written by the real
encoders, then apply adversarial corruptions — truncation at every
region, random bit flips, slice splices, garbage appends, header
smashes — and assert the decode contract (sources/_contract.py):

    decode(corrupt_bytes)  ->  result
                           |   ValueError            (malformed)
                           |   NotImplementedError   (route-to-library)

Anything else (struct.error, zlib.error, IndexError, KeyError,
RecursionError, MemoryError, hang) is a contract violation: at 100 TB
one such asset fails the task, the stage, then the job — the exact
failure mode VERDICT r9 flagged for the media ingestion path.

Usage:  python tools/corruption_fuzz.py [N_CASES_PER_CODEC] [SEED]
Exit 0 = contract holds; 1 = violations (printed with repro seeds).
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sklearn_raster_spark.sources.audio import decode_flac, decode_wav, encode_wav
from sklearn_raster_spark.sources.image import (
    decode_bmp,
    decode_gif,
    decode_image,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_ppm,
)
from sklearn_raster_spark.sources.jpeg import decode_jpeg, encode_jpeg
from sklearn_raster_spark.sources.tiff import read_gtiff, write_gtiff
from sklearn_raster_spark.sources.video import decode_mjpeg_avi, encode_mjpeg_avi

ALLOWED = (ValueError, NotImplementedError)


def _flac_asset(rng) -> bytes:
    """A minimal spec-faithful FLAC stream (CONSTANT+VERBATIM frames)
    so the FLAC decoder gets fuzz coverage without a package encoder.
    Mirrors tests/test_flac_codec.py's builder in reduced form."""
    samples = rng.integers(-1000, 1000, 128).astype(np.int16)
    block = 64
    out = bytearray(b"fLaC")
    si = bytearray()
    si += block.to_bytes(2, "big") * 2
    si += (0).to_bytes(3, "big") * 2
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | len(samples)
    si += packed.to_bytes(8, "big")
    si += bytes(16)
    out += (1 << 31 | 0 << 24 | len(si)).to_bytes(4, "big") + si

    class W:
        def __init__(self):
            self.acc, self.n, self.b = 0, 0, bytearray()

        def put(self, v, n):
            self.acc = (self.acc << n) | (v & ((1 << n) - 1))
            self.n += n
            while self.n >= 8:
                self.n -= 8
                self.b.append((self.acc >> self.n) & 0xFF)

        def done(self):
            if self.n:
                self.b.append((self.acc << (8 - self.n)) & 0xFF)
            return bytes(self.b)

    for fi in range(2):
        w = W()
        w.put(0x3FFE, 14)
        w.put(0, 1)
        w.put(0, 1)
        w.put(6, 4)      # blocksize: 8-bit at end of header
        w.put(4, 4)      # rate code 8000
        w.put(0, 4)      # 1 channel
        w.put(4, 3)      # 16-bit
        w.put(0, 1)
        w.put(fi, 8)     # frame number (utf8 1-byte)
        w.put(block - 1, 8)
        w.put(0, 8)      # header CRC (unchecked)
        # subframe: VERBATIM
        w.put(0, 1)
        w.put(1, 6)
        w.put(0, 1)
        for s in samples[fi * block : (fi + 1) * block]:
            w.put(int(s) & 0xFFFF, 16)
        frame = w.done()
        out += frame + b"\x00\x00"  # frame CRC-16 (unchecked)
    return bytes(out)


def build_assets(rng) -> dict[str, tuple[bytes, object]]:
    """codec name -> (valid payload bytes, decode callable)."""
    img = rng.integers(0, 256, (24, 33)).astype(np.uint8)
    rgb = rng.integers(0, 256, (16, 21, 3)).astype(np.uint8)
    pcm = rng.integers(-3000, 3000, 400).astype(np.int16)
    frames = rng.integers(0, 256, (3, 8, 16)).astype(np.uint8)
    return {
        "png": (encode_png(img), decode_png),
        "png_rgb": (encode_png(rgb), decode_png),
        "bmp": (encode_bmp(rgb), decode_bmp),
        "ppm": (encode_ppm(rgb), decode_ppm),
        "gif": (encode_gif(img), decode_gif),
        "jpeg": (encode_jpeg(img, quality=90), decode_jpeg),
        "jpeg_420": (encode_jpeg(rgb, quality=80, subsampling="420"), decode_jpeg),
        "wav": (encode_wav(pcm, 8000), decode_wav),
        "flac": (_flac_asset(rng), decode_flac),
        "avi": (encode_mjpeg_avi(frames), decode_mjpeg_avi),
        "sniff": (encode_png(img), decode_image),
    }


def corrupt(blob: bytes, rng) -> bytes:
    """One random corruption: truncate / bit flips / splice / append /
    header smash / zero run."""
    b = bytearray(blob)
    mode = rng.integers(0, 6)
    if mode == 0 and len(b) > 1:  # truncate anywhere
        return bytes(b[: rng.integers(0, len(b))])
    if mode == 1:  # flip 1-8 random bits
        for _ in range(rng.integers(1, 9)):
            i = rng.integers(0, len(b))
            b[i] ^= 1 << rng.integers(0, 8)
        return bytes(b)
    if mode == 2:  # splice a random slice with random bytes
        i = rng.integers(0, len(b))
        n = int(rng.integers(1, min(64, len(b) - i) + 1))
        b[i : i + n] = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        return bytes(b)
    if mode == 3:  # append garbage
        return bytes(b) + bytes(rng.integers(0, 256, rng.integers(1, 128),
                                             dtype=np.uint8))
    if mode == 4:  # smash a header window (dims/flags live early)
        n = min(len(b), int(rng.integers(4, 40)))
        i = rng.integers(0, max(1, len(b) - n))
        b[i : i + n] = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        return bytes(b)
    # zero a run (simulates sparse-file holes)
    i = rng.integers(0, len(b))
    n = int(rng.integers(1, min(256, len(b) - i) + 1))
    b[i : i + n] = bytes(n)
    return bytes(b)


def fuzz_tiff(n_cases: int, rng) -> list[str]:
    """TIFF decodes from a path; corrupt the file bytes on disk."""
    failures = []
    grid = rng.normal(size=(20, 30)).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "a.tif")
        write_gtiff(src, grid, nodata=None, tags={})
        blob = open(src, "rb").read()
        bad = os.path.join(td, "bad.tif")
        for case in range(n_cases):
            mutated = corrupt(blob, rng)
            with open(bad, "wb") as f:
                f.write(mutated)
            try:
                read_gtiff(bad)
            except ALLOWED:
                pass
            except BaseException as exc:
                failures.append(
                    f"tiff case {case}: {type(exc).__name__}: {exc}"
                )
    return failures


def fuzz_pyds(n_cases: int, rng) -> list[str]:
    """The connector's shard decode (sources/pyds.py) carries the same
    totality contract as the codecs: strict mode may raise ValueError
    ONLY; permissive mode must NEVER raise and must keep every
    decodable row (q174's posture). Corrupt a valid engine-written
    shard every way the codec axis does."""
    import gzip
    import json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from sklearn_raster_spark.sources.pyds import _decode_shard_batches

    # built by hand: fromDDL needs a live SparkContext, this tool doesn't
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    lines = "".join(
        json.dumps(
            {"doc_id": i, "text": f"doc {i} héllo", "lang": "en",
             "source": "web", "n_chars": i * 3},
            ensure_ascii=False,
        ) + "\n"
        for i in range(200)
    )
    blob = gzip.compress(lines.encode("utf-8"))

    def corrupt_structured(rng):
        """STRUCTURED mutation: valid gzip + valid JSON whose VALUES
        are hostile (ADVICE r11 — random byte flips essentially never
        produce well-formed JSON, so the value-domain corruption class
        needs its own generator): out-of-int64-range ints, huge
        floats-as-ints, wrong types, nested non-objects, nulls."""
        poison = [
            {"doc_id": 99999999999999999999999, "text": "huge", "lang": "en",
             "source": "w", "n_chars": 1},
            {"doc_id": -(2**64), "text": "neg", "lang": "en",
             "source": "w", "n_chars": 1},
            {"doc_id": 7, "text": "f", "lang": "en", "source": "w",
             "n_chars": 10**400},
            {"doc_id": "seven", "text": "s", "lang": "en", "source": "w",
             "n_chars": 1},
            {"doc_id": 8, "text": ["not", "a", "str"], "lang": "en",
             "source": "w", "n_chars": 1},
            {"doc_id": 2**63, "text": "edge", "lang": "en", "source": "w",
             "n_chars": 1},
        ]
        rows = []
        for i in range(50):
            if rng.random() < 0.3:
                rows.append(json.dumps(rng.choice(poison)))
            else:
                rows.append(json.dumps(
                    {"doc_id": i, "text": "ok", "lang": "en",
                     "source": "w", "n_chars": i}))
        return gzip.compress(("\n".join(rows) + "\n").encode("utf-8"))

    failures = []
    with tempfile.TemporaryDirectory() as td:
        bad = os.path.join(td, "part-0-x.0-199.jsonl.gz")
        for case in range(n_cases):
            # alternate byte-level and structured value-domain mutation
            if case % 2:
                mutated = corrupt_structured(rng)
            else:
                mutated = corrupt(blob, rng)
            with open(bad, "wb") as f:
                f.write(mutated)
            try:
                list(_decode_shard_batches(bad, schema, permissive=False))
            except ValueError:
                pass
            except BaseException as exc:
                failures.append(
                    f"pyds-strict case {case}: {type(exc).__name__}: {exc}"
                )
            try:
                list(_decode_shard_batches(bad, schema, permissive=True))
            except BaseException as exc:
                failures.append(
                    f"pyds-permissive case {case}: {type(exc).__name__}: {exc}"
                )
    return failures


def main() -> int:
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    assets = build_assets(rng)
    failures: list[str] = []
    for name, (blob, decode) in assets.items():
        ok = err = 0
        for case in range(n_cases):
            mutated = corrupt(blob, rng)
            try:
                decode(mutated)
                ok += 1
            except ALLOWED:
                err += 1
            except BaseException as exc:
                failures.append(
                    f"{name} case {case}: {type(exc).__name__}: {exc}"
                )
        print(f"{name}: {ok} decoded, {err} ValueError/NIE, "
              f"{n_cases - ok - err} VIOLATIONS")
    tiff_failures = fuzz_tiff(n_cases, rng)
    print(f"tiff: {n_cases - len(tiff_failures)} within contract, "
          f"{len(tiff_failures)} VIOLATIONS")
    failures.extend(tiff_failures)
    pyds_failures = fuzz_pyds(n_cases, rng)
    print(f"pyds: {n_cases - len(pyds_failures)} within contract, "
          f"{len(pyds_failures)} VIOLATIONS")
    failures.extend(pyds_failures)
    if failures:
        print(f"\n{len(failures)} CONTRACT VIOLATIONS (seed={seed}):")
        for f in failures[:40]:
            print(" ", f)
        return 1
    print(f"\ncontract holds: {len(assets) + 2} codecs x {n_cases} cases, seed={seed}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
