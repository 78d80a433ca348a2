"""Shared embedding-validity contract.

A usable embedding is non-NULL with every element FINITE: failed or
overflowed embedding jobs emit NaN/+-Inf elements alongside outright
NULL vectors (round-9 random-instance fuzz axis), and a non-finite
element poisons any consumer that does arithmetic on the vector —
quantization scales become NaN (and DuckDB's INT cast then hard-errors
where Spark yields NULL), cosine scores become NaN/-Inf (which the two
engines ORDER differently at top-k cuts), and driver-side fits absorb
NaN into every learned statistic. Dropping invalid vectors AT THE SCAN
keeps the predicate inside Catalyst (exists() over the array column is
codegen'd, no Python) and matches the documented NULL-vector drop the
engine has applied since round 8.

``FINITE_EMBEDDING_SQL`` is the equivalent DuckDB predicate for query
oracles (paste verbatim where the old ``embedding IS NOT NULL`` stood).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FINITE_EMBEDDING_SQL = (
    "embedding IS NOT NULL"
    " AND LEN(LIST_FILTER(embedding, x -> NOT ISFINITE(x))) = 0"
)


def finite_embedding(col: str = "embedding") -> Column:
    """Column predicate: vector present and all elements finite."""
    c = F.col(col)
    return c.isNotNull() & ~F.exists(
        c, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
