"""Property-based tests for round-2 primitives that are pure Python /
numpy-checkable: Morton interleave, merge-upsert key algebra, and the
deterministic hash bucket. Spark-free (driver-side logic only), so
hypothesis can run hundreds of examples cheaply; the Spark-side duals
are pinned by the oracle queries (q71/q72/q79)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

coords = st.integers(min_value=0, max_value=(1 << 16) - 1)


def _morton_py(y: int, x: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def _deinterleave(z: int, bits: int = 16) -> tuple[int, int]:
    y = x = 0
    for b in range(bits):
        x |= ((z >> (2 * b)) & 1) << b
        y |= ((z >> (2 * b + 1)) & 1) << b
    return y, x


@given(coords, coords)
@settings(max_examples=300)
def test_morton_bijective(y, x):
    assert _deinterleave(_morton_py(y, x)) == (y, x)


@given(coords, coords, coords, coords)
@settings(max_examples=300)
def test_morton_distinct_pairs_distinct_codes(y1, x1, y2, x2):
    if (y1, x1) != (y2, x2):
        assert _morton_py(y1, x1) != _morton_py(y2, x2)


@given(st.integers(0, 255), st.integers(0, 255))
@settings(max_examples=200)
def test_morton_quadrant_prefix(y, x):
    """The top bits of z are the quadrant: points in the same 2^k-square
    share a z-prefix — the property that makes z-ranges spatial blocks."""
    z = _morton_py(y, x)
    # same 16x16 tile (drop 4 low bits of each coordinate) => same z >> 8
    assert z >> 8 == _morton_py(y >> 4, x >> 4)


keysets = st.lists(st.integers(0, 50), max_size=20)


@given(keysets, keysets)
@settings(max_examples=200, deadline=None)
def test_merge_upsert_key_algebra(target_keys, source_keys):
    """merge output keys == target ∪ source; values: source wins on
    matches. Verified against a dict model (the semantics MERGE INTO
    promises); the Spark implementation is the same algebra
    (anti-join + union), pinned distributed by q71's oracle."""
    t = {k: ("t", k) for k in target_keys}
    s = {k: ("s", k) for k in source_keys}
    merged = {**t, **s}
    # model of target.join(source, anti) ∪ source
    anti = {k: v for k, v in t.items() if k not in s}
    result = {**anti, **s}
    assert result == merged


@given(st.integers(-(10**12), 10**12))
@settings(max_examples=200)
def test_hash_bucket_model(key):
    """The md5-bucket formula used by q72/q73, computed in pure Python,
    stays in range and is a pure function (two evaluations agree) for
    any int key — including negatives, which pmod keeps non-negative."""
    import hashlib

    h = int(hashlib.md5(str(key).encode()).hexdigest()[:6], 16)
    b = h % 100
    assert 0 <= b < 100
    h2 = int(hashlib.md5(str(key).encode()).hexdigest()[:6], 16)
    assert h2 % 100 == b
