"""Builtin FLAC decoder (sources/audio.py decode_flac, RFC 9639):
round-trips against a spec-faithful test-side encoder covering
CONSTANT / VERBATIM / FIXED / LPC subframes, Rice + escape residuals,
partition orders, stereo decorrelation modes, wasted bits, and 24-bit
depth; soundfile interop when available."""

import numpy as np
import pytest

from sklearn_raster_spark.sources.audio import decode_audio, decode_flac


class _Bits:
    """MSB-first bit writer."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, v, width):
        self.acc = (self.acc << width) | (v & ((1 << width) - 1))
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)


def _crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _rice_encode(wr, residuals, param):
    for v in residuals:
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        q = u >> param
        for _ in range(q):
            wr.put(0, 1)
        wr.put(1, 1)
        if param:
            wr.put(u & ((1 << param) - 1), param)


def _residual(wr, residuals, n, order, po=0, escape=False):
    """Rice method 0 with partition order ``po``; escape=True stores
    partitions raw at a fixed bit width instead."""
    wr.put(0, 2)
    wr.put(po, 4)
    nparts = 1 << po
    start = 0
    for p in range(nparts):
        count = n // nparts - (order if p == 0 else 0)
        part = residuals[start : start + count]
        start += count
        if escape:
            width = max((int(abs(int(v))).bit_length() + 1 for v in part), default=2)
            width = min(max(width, 2), 30)
            wr.put(15, 4)  # escape code
            wr.put(width, 5)
            for v in part:
                wr.put(int(v) & ((1 << width) - 1), width)
        else:
            best = 0
            best_cost = None
            for cand in range(15):
                cost = sum(
                    ((abs(int(v)) * 2) >> cand) + 1 + cand for v in part
                )
                if best_cost is None or cost < best_cost:
                    best, best_cost = cand, cost
            wr.put(best, 4)
            _rice_encode(wr, [int(v) for v in part], best)


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _subframe(wr, x, bits, kind, po=0, escape=False, wasted=0):
    x = np.asarray(x, np.int64)
    n = len(x)
    wr.put(0, 1)  # sync
    if wasted:
        x = x >> wasted
        bits -= wasted
    if kind == "constant":
        assert np.all(x == x[0])
        wr.put(0, 6)
        wr.put(0 if not wasted else 1, 1)
        if wasted:
            for _ in range(wasted - 1):
                wr.put(0, 1)
            wr.put(1, 1)
        wr.put(int(x[0]), bits)
        return
    if kind == "verbatim":
        ftype = 1
    elif kind.startswith("fixed"):
        ftype = 8 + int(kind[-1])
    elif kind == "lpc2":
        ftype = 32 + 1  # order 2 -> (ftype & 31) + 1
    else:
        raise AssertionError(kind)
    wr.put(ftype, 6)
    wr.put(1 if wasted else 0, 1)
    if wasted:
        for _ in range(wasted - 1):
            wr.put(0, 1)
        wr.put(1, 1)
    if kind == "verbatim":
        for v in x:
            wr.put(int(v), bits)
        return
    if kind.startswith("fixed"):
        order = int(kind[-1])
        coefs = _FIXED_COEFS[order]
        for v in x[:order]:
            wr.put(int(v), bits)
        res = [
            int(x[i]) - sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        _residual(wr, res, n, order, po=po, escape=escape)
        return
    # lpc2: order-2 LPC mirroring fixed-2 through quantized coefficients
    order, precision, shift = 2, 13, 10
    coefs = [2 << shift, -(1 << shift)]
    for v in x[:order]:
        wr.put(int(v), bits)
    wr.put(precision - 1, 4)
    wr.put(shift, 5)
    for c in coefs:
        wr.put(c, precision)
    res = [
        int(x[i]) - ((coefs[0] * int(x[i - 1]) + coefs[1] * int(x[i - 2])) >> shift)
        for i in range(order, n)
    ]
    _residual(wr, res, n, order, po=po, escape=escape)


def encode_flac_test(
    samples, rate, bits=16, block=64, kind="fixed2", stereo=None,
    po=0, escape=False, wasted=0,
):
    """Minimal spec-faithful FLAC encoder: fixed blocking, one subframe
    kind, optional stereo decorrelation ('ls', 'sr', 'ms')."""
    x = np.asarray(samples, np.int64)
    mono = x.ndim == 1
    n_ch = 1 if mono else x.shape[1]
    total = len(x)

    out = bytearray(b"fLaC")
    si = bytearray()
    si += block.to_bytes(2, "big") * 2  # min/max blocksize
    si += (0).to_bytes(3, "big") * 2  # min/max framesize unknown
    packed = (rate << 44) | ((n_ch - 1) << 41) | ((bits - 1) << 36) | total
    si += packed.to_bytes(8, "big")
    si += bytes(16)  # md5 unset
    out += (0x80 | 0).to_bytes(1, "big") + len(si).to_bytes(3, "big") + si

    frame_no = 0
    for start in range(0, total, block):
        seg = x[start : start + block]
        n = len(seg)
        wr = _Bits()
        wr.put(0x3FFE, 14)
        wr.put(0, 1)  # reserved
        wr.put(0, 1)  # fixed blocking
        wr.put(7, 4)  # block size: 16-bit n-1 follows
        wr.put(0, 4)  # rate: from STREAMINFO
        if stereo is None:
            wr.put(n_ch - 1, 4)
        else:
            wr.put({"ls": 8, "sr": 9, "ms": 10}[stereo], 4)
        wr.put({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits], 3)
        wr.put(0, 1)
        assert frame_no < 0x80  # single UTF-8 byte is enough for tests
        wr.put(frame_no, 8)
        wr.put(n - 1, 16)
        wr.align()
        header = bytes(wr.out)
        wr.put(_crc8(header), 8)

        if stereo is None:
            cols = [seg] if mono else [seg[:, c] for c in range(n_ch)]
            for col in cols:
                _subframe(wr, col, bits, kind, po=po, escape=escape, wasted=wasted)
        else:
            left, right = seg[:, 0].astype(np.int64), seg[:, 1].astype(np.int64)
            side = left - right
            if stereo == "ls":
                _subframe(wr, left, bits, kind, po=po, escape=escape)
                _subframe(wr, side, bits + 1, kind, po=po, escape=escape)
            elif stereo == "sr":
                _subframe(wr, side, bits + 1, kind, po=po, escape=escape)
                _subframe(wr, right, bits, kind, po=po, escape=escape)
            else:
                mid = (left + right) >> 1
                _subframe(wr, mid, bits, kind, po=po, escape=escape)
                _subframe(wr, side, bits + 1, kind, po=po, escape=escape)
        wr.align()
        frame = bytes(wr.out)
        wr.put(_crc16(frame), 16)
        out += wr.out
        frame_no += 1
    return bytes(out)


RATE = 32000


def _sine(n, ch=None):
    t = np.arange(n)
    base = (np.sin(t / 7.0) * 9000).astype(np.int16)
    if ch is None:
        return base
    return np.stack([base, (np.cos(t / 11.0) * 7000).astype(np.int16)], axis=-1)


@pytest.mark.parametrize("kind", ["verbatim", "fixed0", "fixed1", "fixed2",
                                  "fixed3", "fixed4", "lpc2"])
def test_flac_subframe_kinds_roundtrip(kind):
    x = _sine(300)
    back, rate = decode_flac(encode_flac_test(x, RATE, kind=kind))
    assert rate == RATE and back.dtype == np.int16
    assert np.array_equal(back, x)


def test_flac_constant_blocks_and_total_crop():
    x = np.full(130, -1234, np.int16)  # 130 % 64 != 0: short last frame
    back, _ = decode_flac(encode_flac_test(x, RATE, kind="constant"))
    assert np.array_equal(back, x)


@pytest.mark.parametrize("stereo", [None, "ls", "sr", "ms"])
def test_flac_stereo_modes(stereo):
    x = _sine(256, ch=2)
    back, _ = decode_flac(encode_flac_test(x, RATE, stereo=stereo))
    assert back.shape == x.shape
    assert np.array_equal(back, x)


@pytest.mark.parametrize("po", [0, 1, 2])
def test_flac_partition_orders(po):
    x = _sine(256)
    back, _ = decode_flac(encode_flac_test(x, RATE, kind="fixed2", po=po))
    assert np.array_equal(back, x)


def test_flac_escape_partitions_and_wasted_bits():
    rng = np.random.default_rng(71)
    x = rng.integers(-30000, 30000, 200).astype(np.int16)
    back, _ = decode_flac(encode_flac_test(x, RATE, kind="fixed1", escape=True))
    assert np.array_equal(back, x)
    # wasted bits: low 3 bits zero
    x8 = (rng.integers(-3000, 3000, 200) << 3).astype(np.int16)
    back, _ = decode_flac(encode_flac_test(x8, RATE, kind="fixed2", wasted=3))
    assert np.array_equal(back, x8)
    backc, _ = decode_flac(
        encode_flac_test(np.full(100, 64, np.int16), RATE, kind="constant", wasted=3)
    )
    assert np.array_equal(backc, np.full(100, 64, np.int16))


def test_flac_24bit_returns_int32():
    rng = np.random.default_rng(72)
    x = rng.integers(-(1 << 23), 1 << 23, 150).astype(np.int32)
    back, _ = decode_flac(encode_flac_test(x, RATE, bits=24, kind="verbatim"))
    assert back.dtype == np.int32 and np.array_equal(back, x)


def test_flac_dispatch_and_rejection():
    x = _sine(64)
    back, rate = decode_audio(encode_flac_test(x, RATE))
    assert rate == RATE and np.array_equal(back, x)
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(b"fLaC" + b"\x00" * 3)  # truncated metadata
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"OggS not flac or riff")


def test_flac_soundfile_interop():
    soundfile = pytest.importorskip("soundfile")
    import io

    x = _sine(500, ch=2)
    buf = io.BytesIO()
    soundfile.write(buf, x, RATE, format="FLAC", subtype="PCM_16")
    back, rate = decode_flac(buf.getvalue())
    assert rate == RATE and np.array_equal(back, x)
    # and ours through theirs
    ours = encode_flac_test(x, RATE, stereo="ms")
    theirs, rate2 = soundfile.read(io.BytesIO(ours), dtype="int16")
    assert rate2 == RATE and np.array_equal(theirs, x)
