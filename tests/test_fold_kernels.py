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


def test_plane_dots_kernel_matches_band_key_dots(spark, sf_dir):
    """The sign-LSH band keys derive from dot > 0 decisions; the kernel
    must produce bit-identical dots, hence identical keys, for BOTH
    plane families (q100's 16 planes, q155's 32)."""
    from sklearn_raster_spark.utils.fold_kernels import plane_dots_kernel

    emb = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .limit(500)
    )
    for planes_nested in (sim._PLANES, sim._SIGN_LSH_PLANES):
        flat = [p for band in planes_nested for p in band]
        old_cols = [
            sim.dot_seq(
                F.col("embedding"), F.array(*[F.lit(float(v)) for v in plane])
            ).alias(f"d{i}")
            for i, plane in enumerate(flat)
        ]
        old = {
            r[0]: [r[i + 1] for i in range(len(flat))]
            for r in emb.select("vec_id", *old_cols).collect()
        }
        new = {
            r[0]: list(r[1])
            for r in emb.select(
                "vec_id", plane_dots_kernel(flat)(F.col("embedding")).alias("d")
            ).collect()
        }
        assert old == new and len(old) > 0


def test_plane_dots_kernel_hostile_rows(spark):
    """Ragged / element-null / NULL rows must replicate zip_with
    null-padding (NULL dot), NaN/Inf propagate."""
    from sklearn_raster_spark.utils.fold_kernels import plane_dots_kernel

    planes = [[1.0, 2.0, -0.5], [0.25, -1.0, 4.0]]
    df = spark.createDataFrame(
        [
            (1, [1.0, float("nan"), 2.0]),
            (2, [1.0, 2.0]),            # ragged (shorter than plane)
            (3, [1.0, None, 2.0]),      # element null
            (4, None),                  # null row
            (5, [0.5, -1.5, float("inf")]),
        ],
        "id int, e array<double>",
    )
    old_cols = [
        sim.dot_seq(F.col("e"), F.array(*[F.lit(v) for v in p])).alias(f"d{i}")
        for i, p in enumerate(planes)
    ]
    old = {r[0]: [r[1], r[2]] for r in df.select("id", *old_cols).collect()}
    new = {
        r[0]: (list(r[1]) if r[1] is not None else None)
        for r in df.select(
            "id", plane_dots_kernel(planes)(F.col("e")).alias("d")
        ).collect()
    }
    import math

    for k, ov in old.items():
        nv = new[k] if new[k] is not None else [None] * len(planes)
        for a, b in zip(ov, nv):
            if a is None or b is None:
                assert a is None and b is None, (k, ov, nv)
            else:
                assert a == b or (math.isnan(a) and math.isnan(b)), (k, ov, nv)


def test_pairwise_cosine_table_matches_join_fold(spark, sf_dir):
    """q57's grouped Arrow scorer must reproduce the label-blocked
    self-join + sequential-fold cosine EXACTLY (unrounded doubles)."""
    from sklearn_raster_spark.utils.fold_kernels import pairwise_cosine_table

    emb = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & F.col("label").isNotNull())
        .limit(600)
    )
    with_norm = emb.select(
        "vec_id", "label", "embedding", sim.l2_norm(F.col("embedding")).alias("nrm")
    )
    a, b = with_norm.alias("a"), with_norm.alias("b")
    cos = sim.dot_seq(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    old = {
        (r[0], r[1]): r[2]
        for r in a.join(
            b,
            (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.col("a.label") == F.col("b.label")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("c"),
        )
        .collect()
    }
    new = {
        (r[0], r[1]): r[2]
        for r in emb.select("vec_id", "label", "embedding")
        .groupBy("label")
        .applyInArrow(
            pairwise_cosine_table,
            schema="id_a bigint, id_b bigint, cosine_raw double",
        )
        .collect()
    }
    import math

    assert set(old) == set(new) and len(old) > 0
    for k, ov in old.items():
        nv = new[k]
        if ov is None or nv is None:
            assert ov is None and nv is None, k
        else:
            assert ov == nv or (math.isnan(ov) and math.isnan(nv)), k


def test_pairwise_cosine_table_hostile_rows(spark):
    """Element nulls and ragged rows inside a group take the exact
    zip_with-replicating slow path: NULL cosine, same as the join."""
    from sklearn_raster_spark.utils.fold_kernels import pairwise_cosine_table

    df = spark.createDataFrame(
        [
            (1, 0, [1.0, 2.0, 3.0]),
            (2, 0, [1.0, None, 3.0]),   # element null
            (3, 0, [1.0, 2.0]),         # ragged
            (4, 0, [float("nan"), 2.0, 3.0]),
            (5, 1, [2.0, 2.0, 2.0]),    # singleton group -> no pairs
        ],
        "vec_id bigint, label int, embedding array<double>",
    )
    with_norm = df.select(
        "vec_id", "label", "embedding", sim.l2_norm(F.col("embedding")).alias("nrm")
    )
    a, b = with_norm.alias("a"), with_norm.alias("b")
    cos = sim.dot_seq(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    old = {
        (r[0], r[1]): r[2]
        for r in a.join(
            b,
            (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.col("a.label") == F.col("b.label")),
        )
        .select(F.col("a.vec_id"), F.col("b.vec_id"), cos.alias("c"))
        .collect()
    }
    new = {
        (r[0], r[1]): r[2]
        for r in df.groupBy("label")
        .applyInArrow(
            pairwise_cosine_table,
            schema="id_a bigint, id_b bigint, cosine_raw double",
        )
        .collect()
    }
    import math

    assert set(old) == set(new) and len(old) > 0
    for k, ov in old.items():
        nv = new[k]
        if ov is None or nv is None:
            assert ov is None and nv is None, k
        else:
            assert ov == nv or (math.isnan(ov) and math.isnan(nv)), k


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


def test_minhash_exploded_matches_in_array(spark, sf_dir):
    """q52's exploded signature table (posexplode + window leads +
    min aggregates + collect_set) must equal the in-array reference
    form (transform/array_min over array_distinct'd shingle arrays)
    per doc — same per-table minhashes, same shingle SET — and the
    full pair output must be row-identical."""
    from sklearn_raster_spark.operators.dedup import minhash_pairs

    n_tables, shingle = 3, 3
    docs = read_table(spark, sf_dir, "documents")

    # in-array reference: the pre-r12 expression form, kept inline as
    # the semantic spec the exploded plan must reproduce exactly
    tokens = docs.select("doc_id", F.split("text", " ").alias("words")).filter(
        F.size("words") >= shingle
    )
    shingled = tokens.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, size(words) - {shingle - 1}), "
                f"i -> xxhash64("
                + ", ".join(f"element_at(words, i + {j})" for j in range(shingle))
                + "))"
            )
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    ref_sig = {
        r["doc_id"]: (
            tuple(r[f"h{i}"] for i in range(n_tables)),
            frozenset(r["shingles"]),
        )
        for r in shingled.select(
            "doc_id",
            "shingles",
            *[
                F.array_min(
                    F.expr(f"transform(shingles, s -> xxhash64(s, {i}))")
                ).alias(f"h{i}")
                for i in range(n_tables)
            ],
        ).collect()
    }

    # exploded form, reproduced from minhash_pairs' signature stage
    from pyspark.sql import Window

    w_pos = Window.partitionBy("doc_id").orderBy("pos")
    ex = tokens.select("doc_id", F.posexplode("words").alias("pos", "w0"))
    lead_cols = [
        F.lead("w0", j).over(w_pos).alias(f"w{j}") for j in range(1, shingle)
    ]
    sh_rows = (
        ex.select("doc_id", F.col("w0"), *lead_cols)
        .filter(F.col(f"w{shingle - 1}").isNotNull())
        .select("doc_id", F.xxhash64(*[f"w{j}" for j in range(shingle)]).alias("sh"))
    )
    new_sig = {
        r["doc_id"]: (
            tuple(r[f"h{i}"] for i in range(n_tables)),
            frozenset(r["shingles"]),
        )
        for r in sh_rows.groupBy("doc_id")
        .agg(
            *[
                F.min(F.xxhash64("sh", F.lit(i))).alias(f"h{i}")
                for i in range(n_tables)
            ],
            F.collect_set("sh").alias("shingles"),
        )
        .collect()
    }
    assert ref_sig == new_sig and len(ref_sig) > 0

    # end-to-end: the reference verify on the reference signatures
    ref_toks = shingled
    bands = ref_toks.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.array_min(F.expr(f"transform(shingles, s -> xxhash64(s, {i}))"))
                    for i in range(n_tables)
                ]
            )
        ).alias("tbl", "h"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ta = ref_toks.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    tb = ref_toks.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    ref_pairs = {
        tuple(r)
        for r in candidates.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", F.round(1.0 - jac, 6).alias("jaccard_dist"))
        .filter(F.col("jaccard_dist") < 0.7)
        .collect()
    }
    new_pairs = {tuple(r) for r in minhash_pairs(docs).collect()}
    assert ref_pairs == new_pairs
