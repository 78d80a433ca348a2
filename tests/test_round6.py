"""Round-5 additions: the pure-JVM rolling-median dual (q148) and the
driver-gradability reworks of q131/q135 (scalar schemas) — plus the
laws the oracle alone can't express: bitwise UDWF/JVM equality,
degree-ordered triangle wedge bounds, and q-gram blocking tightness."""

import pytest

from sklearn_raster_spark.plans.registry import load_all_queries

from tests.oracle_utils import compare_query

NEW_ORACLE_QUERIES = [
    "q148_rolling_median_jvm",
    "q149_pipeline_composition",
    "q150_minhash_portable",
    "q151_simhash_portable",
    "q152_binaryfile_source",
    "q153_stream_semi_join",
    "q154_stream_outer_join",
    "q155_ann_signlsh_portable",
    "q156_grouped_model_fit",
]


@pytest.mark.parametrize("name", NEW_ORACLE_QUERIES)
def test_oracle_value_match(spark, sf_dir, name):
    assert compare_query(spark, sf_dir, name) > 0


def test_rolling_median_jvm_bitwise_equals_udwf(spark, sf_dir):
    """q148 (array_sort + middle-element window expressions, zero
    Python) must reproduce q142 (pandas UDWF) BITWISE: on integer
    cents the median is either a middle int or a .5 midpoint, both
    exact in float64, so any difference is a frame/ordering bug."""
    qs = load_all_queries()
    udwf = (
        qs["q142_rolling_median_udwf"].fn(spark, sf_dir).toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    jvm = (
        qs["q148_rolling_median_jvm"].fn(spark, sf_dir).toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    assert len(udwf) == len(jvm)
    assert (udwf.event_id == jvm.event_id).all()
    assert (udwf.rolling_median == jvm.rolling_median).all()  # bitwise


def test_triangle_oracle_still_green(spark, sf_dir):
    assert compare_query(spark, sf_dir, "q125_triangle_count") > 0


def test_degree_ordering_bounds_hub_wedges(spark):
    """Skew fixture: a 200-spoke star (hub = node 0, the LOWEST id)
    plus one closing edge 1-2. Naive id-ordered orientation points
    every star edge 0->k, so the hub alone generates C(200,2) = 19900
    wedges. Degree ordering points spokes -> hub (deg 1 < deg 200):
    the hub emits ZERO wedges and the whole wedge set collapses to
    the two genuine ones, while the triangle {0,1,2} still counts
    exactly once per member."""
    from pyspark.sql import functions as F

    from sklearn_raster_spark.operators.graph import (
        _triangle_members,
        degree_oriented_edges,
    )

    hub_edges = [(0, k) for k in range(1, 201)] + [(1, 2)]
    e = spark.createDataFrame(hub_edges, "pa int, pb int")
    o = degree_oriented_edges(e)

    wedge_total = (
        o.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        .select(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
        .collect()[0]["w"]
    )
    naive_hub_wedges = 200 * 199 // 2
    assert wedge_total <= 2, wedge_total  # vs 19900 under id ordering
    assert wedge_total < naive_hub_wedges

    counts = {
        r["partkey"]: r["n"]
        for r in _triangle_members(o).groupBy("partkey").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert counts == {0: 1, 1: 1, 2: 1}


def test_triangle_enumeration_matches_bruteforce_on_random_graphs(spark):
    """Degree-ordered wedge enumeration must count triangles exactly
    on ARBITRARY structure, not just the star fixture and the
    co-purchase oracle: seeded random graphs, per-node membership
    counts vs itertools brute force."""
    import random
    from itertools import combinations

    from pyspark.sql import functions as F

    from sklearn_raster_spark.operators.graph import (
        _triangle_members,
        degree_oriented_edges,
    )

    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(5, 12)
        edges = sorted(
            {(a, b) for a, b in combinations(range(n), 2) if rng.random() < 0.45}
        )
        if not edges:
            continue
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        truth = {}
        for a, b, c in combinations(range(n), 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                for v in (a, b, c):
                    truth[v] = truth.get(v, 0) + 1

        e = spark.createDataFrame(edges, "pa int, pb int")
        got = {
            r["partkey"]: r["n"]
            for r in _triangle_members(degree_oriented_edges(e))
            .groupBy("partkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == truth, (seed, edges, got, truth)


def test_fuzzy_oracle_still_green(spark, sf_dir):
    for name in ("q127_fuzzy_name_join", "q145_entity_resolution"):
        assert compare_query(spark, sf_dir, name) > 0


def test_qgram_blocking_complete_on_random_edits(spark):
    """Completeness of the positional q-gram block on ADVERSARIAL
    strings: random names with <= FUZZY_MAX_DIST random edits
    (substitution / insertion / deletion) applied must always survive
    blocking — the Gravano count-bound implementation, not just the
    catalog fixture, guarantees it."""
    import random
    import string

    from sklearn_raster_spark.operators.text import (
        FUZZY_MAX_DIST,
        MIN_QGRAM_LEN,
        fuzzy_qgram_candidates,
    )

    rng = random.Random(7)
    rows = []
    expected = set()
    for i in range(25):
        base = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(MIN_QGRAM_LEN, 24)))
        edited = list(base)
        for _ in range(rng.randint(1, FUZZY_MAX_DIST)):
            op = rng.choice("sid")
            pos = rng.randrange(len(edited))
            if op == "s":
                edited[pos] = rng.choice(string.ascii_lowercase)
            elif op == "i":
                edited.insert(pos, rng.choice(string.ascii_lowercase))
            elif op == "d" and len(edited) > MIN_QGRAM_LEN:
                del edited[pos]
        other = "".join(edited)
        if other == base:
            continue
        rows.append((base,))
        rows.append((other,))
        expected.add(tuple(sorted((base, other))))

    names = spark.createDataFrame(rows, "p_name string")
    got = {
        tuple(sorted((r.name_a, r.name_b)))
        for r in fuzzy_qgram_candidates(names, "p_name").collect()
    }
    missing = expected - got
    assert not missing, missing


def test_qgram_blocking_prunes_below_length_band(spark, sf_dir):
    """The positional q-gram block must be (a) complete — a superset
    of the true edit-distance pairs — and (b) strictly tighter than
    length-band-only blocking on the real catalog vocabulary, else it
    buys nothing at scale."""
    from pyspark.sql import functions as F

    from sklearn_raster_spark.operators.text import (
        FUZZY_MAX_DIST,
        fuzzy_qgram_candidates,
    )
    from sklearn_raster_spark.sources import read_table

    names = (
        read_table(spark, sf_dir, "part")
        .select("p_name").distinct().localCheckpoint(eager=True)
    )
    n_cand = fuzzy_qgram_candidates(names, "p_name").count()

    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    band = a.join(
        b,
        (F.col("name_a") < F.col("name_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= FUZZY_MAX_DIST
        ),
    )
    n_band = band.count()
    n_true = band.filter(
        F.levenshtein("name_a", "name_b") <= FUZZY_MAX_DIST
    ).count()

    assert n_true <= n_cand < n_band, (n_true, n_cand, n_band)


def test_composition_stages_are_nondegenerate(spark, sf_dir):
    """q149 composes six stages; each must actually move rows on the
    fixture or the composed grade proves nothing about stage order.
    At both test scales the decontamination and quota stages drop
    rows (boilerplate/dedup are no-ops on this synthetic corpus —
    documented — so the pipeline pins them as pass-throughs)."""
    from pyspark.sql import functions as F

    from sklearn_raster_spark.sources import read_table

    out = load_all_queries()["q149_pipeline_composition"].fn(spark, sf_dir).toPandas()
    n_docs_in = read_table(spark, sf_dir, "documents").count()
    assert out.n_docs.sum() < n_docs_in  # decontaminate + quota dropped rows
    assert (out.n_bins >= 1).all()
    assert (out.n_docs >= out.n_bins).all()  # bins never outnumber docs
    assert set(out.split) == {"train", "val", "test"}
    # quota cap: weight 4 sources keep <= 4*unit docs per split, etc.
    from sklearn_raster_spark.operators.composition import MIX_QUOTA_UNIT

    heavy = out[out.source.isin([f"src{i}" for i in range(5)])]
    assert (heavy.n_docs <= 4 * MIX_QUOTA_UNIT).all()
    light = out[~out.source.isin([f"src{i}" for i in range(10)])]
    assert (light.n_docs <= MIX_QUOTA_UNIT).all()


def test_composition_checksum_pins_stage_order(spark, sf_dir):
    """Mutation test: the whole reason q149 exists is that stage ORDER
    matters — so running decontamination AFTER the mix quota (a doc
    that later gets dropped has already consumed a quota slot) must
    move the docid_sum membership checksum. If the mutated chain
    produced the same summary, the composed oracle would prove
    nothing beyond the per-stage grades."""
    from pyspark.sql import functions as F

    from sklearn_raster_spark.operators import composition as C
    from sklearn_raster_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", "text", F.split("text", " ").alias("ws")
    )
    n = docs.count()
    prefix = C.stage_split(C.stage_dedup(C.stage_clean(base, n)))
    correct = C.stage_pack_summary(
        C.stage_quota(C.stage_decontaminate(prefix))
    ).toPandas()
    mutated = C.stage_pack_summary(
        C.stage_decontaminate(C.stage_quota(prefix))
    ).toPandas()

    def checksum(df):
        return sorted(map(tuple, df[["split", "source", "docid_sum"]].values))

    assert checksum(correct) != checksum(mutated)


def test_minhash_portable_recall_vs_bruteforce(spark, sf_dir):
    """q150's banding must (a) never report a pair below the Jaccard
    threshold (soundness — the exact verify guarantees it) and (b)
    recover most of the true above-threshold pairs (the 3-OR-table
    recall; a 0.7-sim pair collides in >=1 table with p ~ 1-0.3^3 =
    97%). Brute force enumerates all shingle-set pairs directly."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from sklearn_raster_spark.operators.dedup import (
        MINHASH_PORT_SHINGLE as K,
        MINHASH_PORT_THRESHOLD as T,
    )
    from sklearn_raster_spark.sources import read_table

    got = {
        (r.doc_a, r.doc_b)
        for r in load_all_queries()["q150_minhash_portable"].fn(spark, sf_dir).collect()
    }

    docs = read_table(spark, sf_dir, "documents")
    rows = (
        docs.select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= K)
        .collect()
    )
    sets = {
        r.doc_id: {" ".join(r.ws[i : i + K]) for i in range(len(r.ws) - K + 1)}
        for r in rows
    }
    truth = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= T:
            truth.add((a, b))

    assert got <= truth  # soundness: exact verify admits no false pair
    assert truth, "fixture has no qualifying pairs; test is vacuous"
    assert len(got) / len(truth) >= 0.9  # 3-table OR recall floor


def test_grouped_fit_learns_real_structure(spark, sf_dir):
    """Each per-source OLS must learn the genuine chars->tokens
    relationship, not degenerate parameters: positive slope (longer
    docs have more tokens), a strong fit (R2 well above chance since
    tokens ~ chars/avg_word_len), and one model per source."""
    df = load_all_queries()["q156_grouped_model_fit"].fn(spark, sf_dir).toPandas()
    assert df.source.is_unique and len(df) == 20
    assert (df.slope > 0.05).all()  # ~1 token per few chars
    assert (df.r2 > 0.8).all(), df.r2.min()  # chars predict tokens strongly
    assert (df.r2 <= 1.0).all()
    assert (df.n >= 2).all()


def test_grouped_fit_degenerate_groups_yield_nulls(spark):
    """Single-row, constant-x, and constant-y groups must emit NULL
    parameters (matching the oracle's NULLIF-guarded divisions), not
    crash the executor with ZeroDivisionError."""
    import pandas as pd

    from sklearn_raster_spark.operators.grouped_fit import (
        FIT_SCHEMA,
        _ols_fit_kernel,
    )

    rows = [
        ("single", 10, 3),          # n == 1 -> den == 0
        ("constx", 5, 1), ("constx", 5, 9),   # constant x -> den == 0
        ("consty", 1, 4), ("consty", 9, 4),   # constant y -> syy == 0
        ("good", 1, 2), ("good", 2, 4), ("good", 3, 6),
    ]
    df = (
        spark.createDataFrame(rows, "source string, x long, y long")
        .groupBy("source")
        .applyInPandas(_ols_fit_kernel, FIT_SCHEMA)
        .toPandas()
        .set_index("source")
    )
    assert pd.isna(df.loc["single", "slope"])
    assert pd.isna(df.loc["constx", "slope"])
    assert pd.isna(df.loc["consty", "r2"])
    assert df.loc["consty", "slope"] == 0.0  # flat line fits exactly
    assert abs(df.loc["good", "slope"] - 2.0) < 1e-12
    assert df.loc["good", "r2"] == 1.0


def test_signlsh_recall_vs_exact(spark, sf_dir):
    """The portable sign-LSH (q155) must recover a solid share of the
    exact cosine top-k (q55) — the operator exists to find neighbors,
    not just to be gradable. 8 OR-bands of 4 bits give every similar
    pair multiple chances to collide; on this weakly-similar synthetic
    corpus the measured operating point is 0.56/0.72 (sf0.001/sf0.01),
    floored at 0.5."""
    qs = load_all_queries()
    exact = {
        (r.qid, r.nid)
        for r in qs["q55_knn_cosine_bruteforce"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.qid, r.nid)
        for r in qs["q155_ann_signlsh_portable"].fn(spark, sf_dir).collect()
    }
    assert exact, "exact baseline empty; test vacuous"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall


def test_stream_outer_join_emits_both_sides(spark, sf_dir):
    """The outer join must be non-degenerate on the fixture: at least
    one NULL-padded unmatched click AND at least one matched pair,
    else the grade proves only one half of the outer semantics."""
    df = load_all_queries()["q154_stream_outer_join"].fn(spark, sf_dir).toPandas()
    assert df.purchase_id.isna().any()
    assert df.purchase_id.notna().any()
    matched = df[df.purchase_id.notna()]
    assert (matched.gap_seconds >= 0).all()
    assert (matched.gap_seconds < 3600).all()


def test_simhash_portable_pairs_share_vocabulary(spark, sf_dir):
    """SimHash (q151) has no exact-verify stage — its guarantee is
    probabilistic — so pin the semantic floor the fingerprint must
    deliver: every reported near-dup pair shares a substantial token
    overlap, and hamming stays within the declared band threshold."""
    from pyspark.sql import functions as F

    from sklearn_raster_spark.operators.dedup import SIMHASH_PORT_HAMMING
    from sklearn_raster_spark.sources import read_table

    pairs = (
        load_all_queries()["q151_simhash_portable"].fn(spark, sf_dir).toPandas()
    )
    assert len(pairs) > 0
    assert pairs.hamming.between(0, SIMHASH_PORT_HAMMING).all()

    toks = {
        r.doc_id: set(r.ws)
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("ws"))
        .collect()
    }
    for r in pairs.itertuples():
        a, b = toks[r.doc_a], toks[r.doc_b]
        jac = len(a & b) / len(a | b)
        # hamming<=6/60 admits moderate similarity (observed floor
        # ~0.25 on this fixture); the law is "never vocabulary-disjoint"
        assert jac >= 0.1, (r.doc_a, r.doc_b, jac)
