"""Grouped-agg pandas UDAFs used by q76 (operators/extras.py).

Defined in a module WITHOUT ``from __future__ import annotations`` on
purpose: that import stringifies the type hints, which breaks
``pandas_udf``'s signature inference, and the old workaround — the
``F.PandasUDFType.GROUPED_AGG`` enum — is deprecated. Here the real
``pd.Series -> scalar`` hints let pandas_udf infer
SQL_GROUPED_AGG_PANDAS_UDF with no deprecated API and no warnings.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

# returnType as DataType INSTANCES, not DDL strings: a string would be
# parsed via _parse_datatype_string at decoration time, which needs a
# live SparkContext — and this module must import session-free (it
# defines at import; the bare-session parity sweep relies on that).


@F.pandas_udf(DoubleType())
def median_chars_udaf(v: pd.Series) -> float:
    """Exact median of an integer column (Arrow-batched per group).

    NULLs are dropped first — SQL aggregates skip NULLs, and the old
    ``to_numpy(dtype=int64)`` on a NaN-carrying series silently turned
    each NaN into INT64_MIN, skewing the median (found by the
    random-instance fuzz, tools/random_instance_fuzz.py)."""
    arr = v.dropna().to_numpy(dtype=np.int64)
    return float(np.median(arr)) if arr.size else None


@F.pandas_udf(LongType())
def count_udaf(v: pd.Series) -> int:
    """Group size as a pandas UDAF (Spark disallows mixing pandas and
    JVM aggregates in one ``agg``, so the count is a UDAF too)."""
    return len(v)
