"""The codec failure contract: corrupt bytes -> ValueError, always.

The reference's NoData philosophy (reference
``src/sklearn_raster/ufunc/_base.py:51-75``) is mask-and-continue:
malformed samples must be *classifiable*, never fatal-in-surprising-
ways. At 100 TB crawl scale ONE truncated or bit-flipped asset in a
billion otherwise reaching an uncaught ``struct.error`` /
``zlib.error`` / ``IndexError`` fails the task, the stage, then the
job. The contract here makes every builtin decoder total over
arbitrary bytes:

- it returns a decoded array, or
- it raises ``ValueError`` (malformed / truncated / corrupt payload),
  or
- it raises ``NotImplementedError`` (valid but outside the builtin
  subset — the pointed route-to-Pillow/soundfile errors).

``codec_errors`` wraps a decode entry point and converts the
low-level exception zoo that hand-written parsers leak on adversarial
input into the contract ``ValueError``; ``check_plausible`` bounds
header-declared geometry BEFORE allocation, so a corrupt 4-byte
dimension field cannot demand a 100 GiB buffer. The corruption fuzz
axis (tests/test_corruption_fuzz.py, tools/corruption_fuzz.py)
asserts the contract over truncations, bit flips, splices, and
garbage appends for every codec; operators/multimodal.py's
quarantine mode builds on it (decode error -> NULL features + error
column, the row survives).
"""

from __future__ import annotations

import functools
import struct
import zlib

# What hand-written binary parsers leak on adversarial input. NOT
# TypeError/AttributeError (caller or codec bugs — those must surface
# loudly in tests) and NOT MemoryError (check_plausible prevents the
# allocation instead of catching its failure).
_LOW_LEVEL = (
    struct.error,
    zlib.error,
    IndexError,
    KeyError,
    OverflowError,
    EOFError,
    UnicodeDecodeError,
    ZeroDivisionError,
    RecursionError,
)

# 2^28 decoded units (pixels / samples) — far above any fixture or
# plausible single asset, far below what corrupt 32-bit dimension
# fields routinely declare (multi-GiB). One asset decodes on one
# executor thread; bounding its working set is the same argument as
# bounding maxRecordsPerBatch.
MAX_DECODED_UNITS = 1 << 28


def check_plausible(n_units: int, fmt: str) -> None:
    """Reject a header-declared output size before allocating it."""
    if not 0 <= n_units <= MAX_DECODED_UNITS:
        raise ValueError(
            f"{fmt}: implausible declared geometry ({n_units} units; "
            f"corrupt header?)"
        )


def codec_errors(fmt: str):
    """Decorator: low-level parse exceptions escaping ``fn`` re-raise
    as the contract ``ValueError``; ValueError / NotImplementedError
    pass through untouched."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (ValueError, NotImplementedError):
                raise
            except _LOW_LEVEL as exc:
                raise ValueError(
                    f"{fmt}: malformed payload ({type(exc).__name__}: {exc})"
                ) from exc

        return wrapper

    return deco
