"""Semantic tests for the LLM-pipeline operators (dedup / similarity /
text / multimodal) beyond the oracle gate."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sklearn_raster_spark.operators.dedup import q51_jaccard_pairs, q52_minhash_lsh_pairs, q53_simhash_neardup
from sklearn_raster_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image,
    extract_byte_features,
)
from sklearn_raster_spark.operators.similarity import q55_knn_cosine_bruteforce
from sklearn_raster_spark.sources import read_table


def test_minhash_finds_planted_near_dups(spark):
    """Controlled recall check: plant near-duplicate copies (one word
    changed) of 10 base docs among 100 distractors; MinHash banding
    must surface every planted pair as a candidate."""
    from sklearn_raster_spark.operators.dedup import minhash_pairs

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(5000)]
    rows = []
    for i in range(100):
        words = list(rng.choice(vocab, size=60))
        rows.append((i, " ".join(words)))
        if i < 10:  # planted near-dup: flip one word
            dup = list(words)
            dup[30] = "CHANGED"
            rows.append((1000 + i, " ".join(dup)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b) for r in minhash_pairs(docs, threshold=0.5).collect()}
    planted = {(i, 1000 + i) for i in range(10)}
    assert planted <= got, f"missed planted pairs: {planted - got}"
    # and no spurious pairs among unrelated random docs
    spurious = {p for p in got if p not in planted}
    assert len(spurious) == 0, f"unexpected pairs: {spurious}"


def test_simhash_fingerprint_properties(spark, sf_dir):
    pairs = q53_simhash_neardup(spark, sf_dir)
    for r in pairs.limit(20).collect():
        assert 0 <= r.hamming <= 6
        assert r.doc_a < r.doc_b


def test_knn_self_similarity_excluded_and_ranked(spark, sf_dir):
    rows = q55_knn_cosine_bruteforce(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for qid, neighbors in by_q.items():
        assert len(neighbors) == 5
        assert all(n.nid != qid for n in neighbors)
        sims = [n.cosine for n in sorted(neighbors, key=lambda n: n.rn)]
        assert sims == sorted(sims, reverse=True)


def test_multimodal_byte_features_deterministic(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(5)
    feats = extract_byte_features(attach_binary_payload(docs)).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in feats:
        raw = texts[r.doc_id].encode("utf-8")
        arr = np.frombuffer(raw, dtype=np.uint8)
        assert r.n_bytes == len(raw)
        assert r.n_spaces == int((arr == 32).sum())
        assert abs(r.mean_byte - float(arr.mean())) < 1e-9
        assert r.hist_0 + r.hist_1 + r.hist_2 + r.hist_3 == len(raw)


def test_decode_image_is_real_since_round9():
    """decode_image was a stub through round 8; it now decodes real
    containers via the builtin codecs (sources/image.py) and keeps a
    pointed rejection surface for library-only formats."""
    import numpy as np

    from sklearn_raster_spark.sources.image import encode_png

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(decode_image(encode_png(img), "image/png"), img)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"xx definitely not an image", "image/png")
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\xff\xd8\xff\xe0 jpeg", "image/jpeg")


def test_bounded_neardup_oracle_parity(spark, sf_dir):
    from tests.oracle_utils import compare_query

    assert compare_query(spark, sf_dir, "q100_bounded_neardup") > 0


def test_bounded_blocks_cap_candidates(spark, sf_dir):
    """The composed (label, sign-bucket) key must split every label
    block: per-band max block size strictly below the label-only max,
    and per-band candidate-pair volume a fraction of q57's all-pairs-
    within-label volume — the bound that kills the hot-label quadratic
    blowup (round-2 finding on q57)."""
    from pyspark.sql import functions as F

    from sklearn_raster_spark.operators.similarity import (
        _PLANES,
        _band_key_col,
        banded_candidate_pairs,
    )
    from sklearn_raster_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    label_max = (
        emb.groupBy("label").count().agg(F.max("count")).first()[0]
    )
    label_pairs = (
        emb.groupBy("label").count()
        .select(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .first()[0]
    )
    total_banded_pairs = 0
    for i, band in enumerate(_PLANES):
        sizes = (
            emb.select("label", _band_key_col(F.col("embedding"), band).alias("bk"))
            .groupBy("label", "bk")
            .count()
        )
        band_max = sizes.agg(F.max("count")).first()[0]
        band_pairs = sizes.select(
            F.sum(F.col("count") * (F.col("count") - 1) / 2)
        ).first()[0]
        assert band_max < label_max, f"band {i}: {band_max} !< {label_max}"
        total_banded_pairs += band_pairs
    # all bands TOGETHER still examine fewer candidates than one
    # exhaustive label join (the 2-bit split is ~4x per band, 8 bands)
    assert total_banded_pairs < label_pairs * len(_PLANES) / 2


def test_banded_candidates_match_per_band_reference(spark, sf_dir):
    """The single explode+band self-join (r12 opt) must admit EXACTLY
    the distinct pair set the original 8 per-band self-joins admitted
    — rebuilt here from _band_key_col as the semantic reference,
    including the NULL-label drop (equi-join semantics both ways)."""
    from pyspark.sql import functions as F

    from sklearn_raster_spark.operators.similarity import (
        _PLANES,
        _band_key_col,
        banded_candidate_pairs,
    )
    from sklearn_raster_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    got = {(r.id_a, r.id_b) for r in banded_candidate_pairs(emb).collect()}

    keyed = emb.select(
        "vec_id",
        "label",
        *[
            _band_key_col(F.col("embedding"), band).alias(f"bk{i}")
            for i, band in enumerate(_PLANES)
        ],
    )
    ref = set()
    for i in range(len(_PLANES)):
        rows = (
            keyed.alias("a")
            .join(
                keyed.alias("b"),
                (F.col("a.label") == F.col("b.label"))
                & (F.col("a.vec_id") < F.col("b.vec_id"))
                & (F.col(f"a.bk{i}") == F.col(f"b.bk{i}")),
            )
            .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
            .collect()
        )
        ref.update((r.id_a, r.id_b) for r in rows)
    assert got == ref and len(got) > 0


def test_bounded_neardup_recall_vs_exhaustive(spark, sf_dir):
    """OR-ed bands must recover >= 85% of the exhaustive label-join
    pairs (banding math predicts ~98% at cosine >= 0.35, B=8, r=2)."""
    from sklearn_raster_spark.plans.registry import load_all_queries

    reg = load_all_queries()
    exhaustive = {
        (r.id_a, r.id_b) for r in reg["q57_embedding_neardup"].fn(spark, sf_dir).collect()
    }
    bounded = {
        (r.id_a, r.id_b) for r in reg["q100_bounded_neardup"].fn(spark, sf_dir).collect()
    }
    assert bounded <= exhaustive  # blocking only ever drops pairs
    assert len(exhaustive) > 0
    recall = len(bounded) / len(exhaustive)
    assert recall >= 0.85, f"recall {recall:.3f} from {len(exhaustive)} pairs"


def test_dedup_corpus_composition(spark, sf_dir):
    """q104 (pairs -> components -> keeper) oracle parity plus the
    composition laws: keepers are cluster minima, every non-kept doc's
    keeper IS kept, and the kept set shrinks the corpus exactly by the
    non-singleton cluster members."""
    from tests.oracle_utils import compare_query

    assert compare_query(spark, sf_dir, "q104_dedup_corpus") > 0
    from sklearn_raster_spark.plans.registry import load_all_queries

    rows = load_all_queries()["q104_dedup_corpus"].fn(spark, sf_dir).collect()
    keeper_of = {r.doc_id: r.keeper for r in rows}
    kept = {r.doc_id for r in rows if r.kept}
    assert all(k <= d for d, k in keeper_of.items())  # min-label canonical
    assert all(keeper_of[k] == k for k in keeper_of.values())  # keepers keep themselves
    assert all(k in kept for k in keeper_of.values())
    assert 0 < len(kept) < len(rows)  # non-degenerate: real clusters exist


def test_q56_ann_lsh_recall(spark, sf_dir):
    """Pin q56's recall DIRECTLY (VERDICT r7 #4): q54's hand-rolled LSH
    backend has its own >=0.9 floor (test_round2.py), but q56 runs
    MLlib's ``BucketedRandomProjectionLSH.approxSimilarityJoin`` with
    threshold 1.2 and had no recall assertion of its own. Ground truth
    is the EXACT euclidean-threshold join on unit vectors, computed in
    numpy — approxSimilarityJoin only approximates CANDIDATE generation
    (the distance filter is exact), so recall is the one number that
    can silently degrade with bucketLength/numHashTables changes."""
    from sklearn_raster_spark.operators.similarity import N_QUERIES, q56_ann_lsh

    pdf = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
    )
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    q_rows = np.flatnonzero(ids < N_QUERIES)
    d = np.sqrt(
        np.maximum(0.0, ((U[q_rows][:, None, :] - U[None, :, :]) ** 2).sum(-1))
    )
    truth = {
        (int(ids[qr]), int(ids[c]))
        for a, qr in enumerate(q_rows)
        for c in np.flatnonzero(d[a] < 1.2)
        if ids[qr] != ids[c]
    }
    assert truth, "degenerate fixture: no true pairs under the threshold"

    got = {(r.qid, r.nid) for r in q56_ann_lsh(spark, sf_dir).collect()}
    # no false positives beyond float-boundary noise: the join's final
    # filter is an exact distance comparison
    dist_of = {
        (int(ids[qr]), int(ids[c])): d[a, c]
        for a, qr in enumerate(q_rows)
        for c in range(len(ids))
    }
    assert all(dist_of[p] < 1.2 + 1e-9 for p in got)
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"q56 recall {recall:.3f} < 0.9 over {len(truth)} true pairs"
