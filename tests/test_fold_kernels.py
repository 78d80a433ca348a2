"""Bit-equality pins for the r12 Arrow fold kernels
(sklearn_raster_spark/utils/fold_kernels.py) against the Catalyst
expression forms they replaced in q53/q151 (SimHash vote packing) and
q135/q136/q160 (PQ encode / sq_error / query LUTs).

The optimization contract is EXACT equality — integer votes for
SimHash, identical IEEE float64 operand order (elementwise op +
left-to-right cumsum with init 0.0) for the PQ distance folds — so
every assertion here is ==, never approx.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sklearn_raster_spark.operators import similarity as sim
from sklearn_raster_spark.operators.dedup import simhash_col
from sklearn_raster_spark.sources import read_table
from sklearn_raster_spark.utils.fold_kernels import (
    pq_codes_kernel,
    pq_lut_kernel,
    pq_sqerr_kernel,
    simhash_pack_kernel,
)


@pytest.mark.parametrize("bits", [64, 60])
def test_simhash_kernel_matches_expression_fold(spark, sf_dir, bits):
    docs = read_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    th = docs.select(
        "doc_id",
        F.transform(F.split("text", " "), lambda w: F.xxhash64(w)).alias("th"),
    )
    old = {r[0]: r[1] for r in th.select("doc_id", simhash_col("th", bits=bits).alias("fp")).collect()}
    new = {r[0]: r[1] for r in th.select("doc_id", simhash_pack_kernel(bits)("th").alias("fp")).collect()}
    assert old == new and len(old) > 0


def test_simhash_kernel_hostile_rows(spark):
    """NULL list -> fp 0 (the fold's when(NULL > 0).otherwise(0)
    branches absorb the NULL — the constant-fp hazard q53/q151 filter
    upstream); empty list -> fp 0; a NULL hash element votes -1 on
    every bit (the fold's otherwise(-1) branch), i.e. exactly like
    hash value 0 — all matching simhash_col."""
    df = spark.createDataFrame(
        [(1, [7, -3]), (2, []), (3, None), (4, [None, 5]), (5, [0, 5])],
        "id int, th array<bigint>",
    )
    old = {r[0]: r[1] for r in df.select("id", simhash_col("th").alias("fp")).collect()}
    new = {r[0]: r[1] for r in df.select("id", simhash_pack_kernel(64)("th").alias("fp")).collect()}
    assert old == new
    assert new[4] == new[5]  # NULL element == 0 element
    assert new[3] == 0  # NULL list absorbs to fp 0, never NULL


def _expr_terms(base, codebooks):
    terms = sim._pq_code_terms(codebooks)
    sq = terms[0][1]
    for _, b in terms[1:]:
        sq = sq + b
    return base.select(
        "vec_id",
        F.array(*[c for c, _ in terms]).alias("codes"),
        sq.alias("sq_error"),
    )


def _subs_col():
    return F.array(*[f"sub{s}" for s in range(sim.PQ_SUBSPACES)])


def test_pq_kernels_match_expressions_portable(spark, sf_dir):
    base = sim._pq_base(spark, sf_dir)
    cb = sim._PQP_CODEBOOKS
    old = {
        r[0]: (list(r[1]), r[2]) for r in _expr_terms(base, cb).collect()
    }
    new = {
        r[0]: (list(r[1]), r[2])
        for r in base.select(
            "vec_id",
            pq_codes_kernel(cb)(_subs_col()).alias("codes"),
            pq_sqerr_kernel(cb)(_subs_col()).alias("sq_error"),
        ).collect()
    }
    assert old == new and len(old) > 0


def test_pq_lut_kernel_matches_expression_folds(spark, sf_dir):
    base = sim._pq_base(spark, sf_dir).filter(F.col("vec_id") < sim.N_QUERIES)
    cb = sim._PQP_CODEBOOKS

    def lut_col(s):
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.col(f"sub{s}"),
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in cb[s]
            ]
        ).alias(f"l{s}")

    old_rows = base.select(
        "vec_id", *[lut_col(s) for s in range(sim.PQ_SUBSPACES)]
    ).collect()
    old = {
        r["vec_id"]: [list(r[f"l{s}"]) for s in range(sim.PQ_SUBSPACES)]
        for r in old_rows
    }
    new = {
        r[0]: [list(x) for x in r[1]]
        for r in base.select(
            "vec_id", pq_lut_kernel(cb)(_subs_col()).alias("lut")
        ).collect()
    }
    assert old == new and len(old) > 0


def test_pq_kernels_hostile_vectors(spark):
    """NaN/±Inf elements (the fuzz axis) must flow through the kernels
    exactly as through the expression folds: NaN dists are skipped by
    array_min (NaN-greatest ordering) unless every dist is NaN, and
    the code is the FIRST matching position."""
    import math

    d = sim._EMB_DIM
    nanv = [float("nan")] + [0.1] * (d - 1)
    infv = [float("inf")] + [0.2] * (d - 1)
    okv = [round(0.01 * i - 0.3, 3) for i in range(d)]
    emb = spark.createDataFrame(
        [(1, nanv), (2, infv), (3, okv)], "vec_id bigint, embedding array<double>"
    )
    sub_d = d // sim.PQ_SUBSPACES
    base = emb.select(
        "vec_id",
        *[
            F.slice("embedding", s * sub_d + 1, sub_d).alias(f"sub{s}")
            for s in range(sim.PQ_SUBSPACES)
        ],
    )
    cb = sim._PQP_CODEBOOKS
    old = {r[0]: (list(r[1]), r[2]) for r in _expr_terms(base, cb).collect()}
    new = {
        r[0]: (list(r[1]), r[2])
        for r in base.select(
            "vec_id",
            pq_codes_kernel(cb)(_subs_col()).alias("codes"),
            pq_sqerr_kernel(cb)(_subs_col()).alias("sq_error"),
        ).collect()
    }
    assert set(old) == set(new)
    for k in old:
        assert old[k][0] == new[k][0], k
        ov, nv = old[k][1], new[k][1]
        assert (ov == nv) or (math.isnan(ov) and math.isnan(nv)), k
