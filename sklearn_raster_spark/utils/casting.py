"""NoData / dtype safe-cast rules.

Reference parity: src/sklearn_raster/utils/features.py:6-80 defines a
permissive cast check used to validate that a ``nodata_output`` value
fits an output dtype — whole floats may cast to ints, bool never casts
to numerics, values must fit the target range, NaN only fits floats.
Re-derived here against Spark SQL types (no numpy dependency on the
executor for this path).
"""

from __future__ import annotations

import math

from pyspark.sql import types as T

_INT_RANGES = {
    "tinyint": (-(2**7), 2**7 - 1),
    "smallint": (-(2**15), 2**15 - 1),
    "int": (-(2**31), 2**31 - 1),
    "bigint": (-(2**63), 2**63 - 1),
}

_FLOATS = {"float", "double"}


def spark_type_name(dtype: str | T.DataType) -> str:
    if isinstance(dtype, T.DataType):
        return dtype.simpleString()
    return dtype.lower()


def default_nodata_for(dtype: str | T.DataType):
    """Default output NoData encoding by dtype (reference:
    ufunc/_meta.py:97-109 — NaN for floats, int extrema for ints)."""
    name = spark_type_name(dtype)
    if name in _FLOATS:
        return float("nan")
    if name in _INT_RANGES:
        lo, hi = _INT_RANGES[name]
        return lo  # signed minimum (Spark ints are all signed)
    raise ValueError(f"no default nodata for dtype {name!r}")


def value_fits_dtype(value, dtype: str | T.DataType) -> bool:
    """Permissive fit check: may ``value`` be losslessly encoded as
    ``dtype``? (reference cast table, utils/features.py:20-80)."""
    name = spark_type_name(dtype)
    if isinstance(value, bool):
        return name == "boolean"
    if value is None:
        return True  # NULL fits everything
    if isinstance(value, float) and math.isnan(value):
        return name in _FLOATS
    if isinstance(value, (int, float)):
        if name in _FLOATS:
            return True  # floats absorb any numeric (possible precision loss
            # accepted by the reference for float targets)
        if name in _INT_RANGES:
            if isinstance(value, float) and not value.is_integer():
                return False  # fractional float never casts to int
            lo, hi = _INT_RANGES[name]
            return lo <= value <= hi
    return False


def validate_nodata(value, dtype: str | T.DataType, allow_cast: bool = False):
    """Raise unless ``value`` can encode NoData in ``dtype``.

    ``allow_cast=True`` permits lossy-but-representable casts (whole
    float -> int); mirrors the estimator's ``allow_cast`` kwarg
    (reference: ufunc/_base.py:424-451).
    """
    if value_fits_dtype(value, dtype):
        return value
    name = spark_type_name(dtype)
    if allow_cast and isinstance(value, float) and name in _INT_RANGES and value.is_integer():
        return int(value)
    raise ValueError(
        f"nodata_output value {value!r} does not fit output dtype {name!r}; "
        f"pass allow_cast=True or choose a compatible value"
    )
