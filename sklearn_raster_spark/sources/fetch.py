"""Checksum-validated fetch-to-cache for published datasets.

Reference analog: ``datasets/_base.py:31-42`` — a pooch registry fetch
that downloads a zip once, verifies its sha256 against a pinned
registry value, and caches it locally; every loader then reads from the
cache. This is the same contract without the pooch dependency:

- ``fetch_to_cache(source, sha256)`` copies ``source`` (a local path or
  ``file://`` URL; ``http(s)://`` goes through urllib when the
  environment has network) into a content-addressed cache directory,
  validating the sha256 of the BYTES THAT ARRIVED — a truncated or
  corrupted transfer never lands in the cache (write-to-temp + atomic
  rename, so concurrent fetchers and killed processes can't leave a
  half-file behind).
- A cache hit is re-verified cheaply by size against a sidecar
  ``.size`` record written at fetch time, then trusted (the file landed
  atomically under its own digest name, so content cannot drift without
  its name lying); a size mismatch — e.g. a truncated file placed in
  the cache out-of-band — evicts the entry and re-fetches.

At cluster scale the cache dir is a shared filesystem / object-store
prefix and the driver fetches once before executors scan — the same
single-writer pattern pooch uses per-machine.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import urllib.parse
import urllib.request


class ChecksumError(ValueError):
    """Fetched bytes do not match the pinned sha256."""


def sha256_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                return h.hexdigest()
            h.update(b)


def default_cache_dir() -> str:
    return os.path.join(tempfile.gettempdir(), "spark_graft_fetch_cache")


def fetch_to_cache(source: str, sha256: str, cache_dir: str | None = None) -> str:
    """Return a local path to a checksum-verified copy of ``source``.

    ``source``: local path, ``file://`` URL, or ``http(s)://`` URL.
    ``sha256``: the pinned hex digest the fetched bytes must match.
    Raises :class:`ChecksumError` (and caches nothing) on mismatch.
    """
    cache_dir = cache_dir or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    ext = os.path.splitext(urllib.parse.urlparse(source).path or source)[1]
    cached = os.path.join(cache_dir, f"{sha256}{ext}")
    size_path = cached + ".size"
    if os.path.exists(cached):
        # cheap re-verification on hit: compare byte count against the
        # sidecar written at fetch time; mismatch (out-of-band
        # truncation/corruption) evicts and falls through to re-fetch
        try:
            with open(size_path) as sf:
                expected_size = int(sf.read().strip())
        except (OSError, ValueError):
            expected_size = None
        if expected_size is not None and os.path.getsize(cached) == expected_size:
            return cached
        for stale in (cached, size_path):
            try:
                os.unlink(stale)
            except OSError:
                pass

    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".part")
    os.close(fd)
    try:
        parsed = urllib.parse.urlparse(source)
        if parsed.scheme in ("http", "https", "file"):
            with urllib.request.urlopen(source) as r, open(tmp, "wb") as out:
                shutil.copyfileobj(r, out)
        else:
            shutil.copyfile(source, tmp)
        got = sha256_of(tmp)
        if got != sha256:
            raise ChecksumError(
                f"sha256 mismatch for {source!r}: expected {sha256}, got {got}; "
                "refusing to cache corrupted bytes"
            )
        size_tmp = tmp + ".size"
        with open(size_tmp, "w") as sf:
            sf.write(str(os.path.getsize(tmp)))
        os.replace(size_tmp, size_path)
        os.replace(tmp, cached)  # atomic: a reader never sees a partial file
        return cached
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
