"""Checksum'd fetch-to-cache (reference datasets/_base.py:31-42 analog):
positive fetch, cache hit, and the corrupted-transfer negative path."""

import os

import pytest

from sklearn_raster_spark.sources.fetch import (
    ChecksumError,
    default_cache_dir,
    fetch_to_cache,
    sha256_of,
)


@pytest.fixture
def cache_dir(tmp_path):
    return str(tmp_path / "cache")


def _write(tmp_path, name, data: bytes):
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_fetch_validates_and_caches(tmp_path, cache_dir):
    src = _write(tmp_path, "good.bin", b"payload-bytes")
    digest = sha256_of(src)
    cached = fetch_to_cache(src, digest, cache_dir)
    assert os.path.exists(cached)
    assert cached.startswith(cache_dir)
    assert sha256_of(cached) == digest
    # second fetch is a cache hit: same path, works even if the source
    # has vanished (the pooch offline-cache property)
    os.unlink(src)
    assert fetch_to_cache(src, digest, cache_dir) == cached


def test_fetch_file_url(tmp_path, cache_dir):
    src = _write(tmp_path, "good.parquet", b"not-really-parquet")
    cached = fetch_to_cache("file://" + src, sha256_of(src), cache_dir)
    assert open(cached, "rb").read() == b"not-really-parquet"
    assert cached.endswith(".parquet")  # extension survives for readers


def test_corrupted_fetch_rejected_and_not_cached(tmp_path, cache_dir):
    """A transfer whose bytes don't match the pin must raise and leave
    the cache EMPTY — a corrupted file that lands is the failure mode
    checksum validation exists to prevent."""
    good = _write(tmp_path, "good.bin", b"payload-bytes")
    pinned = sha256_of(good)
    corrupted = _write(tmp_path, "evil.bin", b"payload-byteX")
    with pytest.raises(ChecksumError, match="sha256 mismatch"):
        fetch_to_cache(corrupted, pinned, cache_dir)
    assert os.listdir(cache_dir) == []  # no cached file, no .part litter


def test_truncated_fetch_rejected(tmp_path, cache_dir):
    full = _write(tmp_path, "full.bin", b"0123456789" * 100)
    pinned = sha256_of(full)
    truncated = _write(tmp_path, "trunc.bin", b"0123456789" * 99)
    with pytest.raises(ChecksumError):
        fetch_to_cache(truncated, pinned, cache_dir)


def test_default_cache_dir_is_stable():
    assert default_cache_dir() == default_cache_dir()
