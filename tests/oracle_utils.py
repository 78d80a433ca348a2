"""Mirror of the driver's t2 comparison: run a registry query on Spark
and its oracle SQL on DuckDB over the same parquet tables, then compare
row count, schema (sorted column names) and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb

from sklearn_raster_spark.sources import TABLES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes values; we demand near-bit-equality (12 sig figs)
        return f"{v:.12g}"
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (int, str, bool, bytes)):
        return v
    return str(v)


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=repr
    )
    return out


def compare_query(spark, sf_dir: str, name: str):
    """Assert Spark result == DuckDB oracle for registry query `name`."""
    from sklearn_raster_spark.plans.registry import load_all_queries

    spec = load_all_queries()[name]
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        assert len(spark_rows) >= 0  # rows-only smoke
        return len(spark_rows)

    con = duckdb_conn(sf_dir)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    # Driver-parity dtype audit: the driver hashes the oracle result
    # through pandas, where DuckDB HUGEINT (e.g. an uncast SUM(int))
    # arrives as float64 while Spark's side is integral — values equal,
    # hashes differ (the q72 red row in CORRECTNESS_r02). fetchall()
    # alone cannot see this, so check pandas dtypes explicitly. A
    # float64 column WITH nulls is legitimate (pandas nullable-int
    # widening), so only null-free columns are flagged.
    pdf = con.execute(spec.oracle).df()
    spark_integral = {
        f.name
        for f in sdf.schema.fields
        if f.dataType.simpleString() in ("tinyint", "smallint", "int", "bigint")
    }
    for c in pdf.columns:
        if c in spark_integral and pdf[c].dtype.kind == "f" and not pdf[c].isna().any():
            raise AssertionError(
                f"{name}: oracle column {c!r} reaches the driver's hasher as "
                f"float64 (likely HUGEINT — add a CAST(... AS BIGINT)) while "
                "Spark returns an integral type; hashes would mismatch"
            )
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = rows_to_multiset(spark_rows, spark_cols)
    d = rows_to_multiset(duck_rows, duck_cols)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")
    return len(spark_rows)
