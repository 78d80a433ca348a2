"""Property-based tests (hypothesis) for the NoData safe-cast table —
the engine's dual of the reference's casting rules
(utils/features.py:20-80)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from sklearn_raster_spark.utils.casting import (
    default_nodata_for,
    validate_nodata,
    value_fits_dtype,
)

INT_TYPES = ["tinyint", "smallint", "int", "bigint"]
FLOAT_TYPES = ["float", "double"]
RANGES = {
    "tinyint": (-(2**7), 2**7 - 1),
    "smallint": (-(2**15), 2**15 - 1),
    "int": (-(2**31), 2**31 - 1),
    "bigint": (-(2**63), 2**63 - 1),
}


@given(st.integers(), st.sampled_from(INT_TYPES))
@settings(max_examples=300)
def test_int_fit_is_exactly_range_check(v, t):
    lo, hi = RANGES[t]
    assert value_fits_dtype(v, t) == (lo <= v <= hi)


@given(st.floats(allow_nan=False, allow_infinity=False), st.sampled_from(INT_TYPES))
@settings(max_examples=300)
def test_fractional_floats_never_fit_ints(v, t):
    if not float(v).is_integer():
        assert not value_fits_dtype(v, t)
    else:
        lo, hi = RANGES[t]
        assert value_fits_dtype(v, t) == (lo <= v <= hi)


@given(st.floats(allow_nan=False), st.sampled_from(FLOAT_TYPES))
@settings(max_examples=200)
def test_floats_absorb_numerics(v, t):
    assert value_fits_dtype(v, t)


@given(st.sampled_from(INT_TYPES + FLOAT_TYPES))
def test_nan_fits_only_floats(t):
    assert value_fits_dtype(float("nan"), t) == (t in FLOAT_TYPES)


@given(st.booleans(), st.sampled_from(INT_TYPES + FLOAT_TYPES))
def test_bool_never_numeric(v, t):
    # reference rule: bool <-> numeric casts are forbidden
    assert not value_fits_dtype(v, t)


@given(st.sampled_from(INT_TYPES + FLOAT_TYPES))
def test_default_nodata_fits_its_own_dtype(t):
    nd = default_nodata_for(t)
    assert value_fits_dtype(nd, t)
    assert validate_nodata(nd, t) == nd or (isinstance(nd, float) and math.isnan(nd))


@given(
    st.floats(allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6),
    st.sampled_from(INT_TYPES),
)
@settings(max_examples=200)
def test_allow_cast_only_for_whole_floats(v, t):
    lo, hi = RANGES[t]
    if float(v).is_integer() and lo <= v <= hi:
        assert validate_nodata(v, t, allow_cast=True) == int(v)
    elif not float(v).is_integer():
        try:
            validate_nodata(v, t, allow_cast=True)
            raised = False
        except ValueError:
            raised = True
        assert raised
