"""MLlib-native inference: the fully-distributed counterpart of the
broadcast-estimator path (BASELINE.json spark_approach: "MLlib for
distributed prediction over partitioned rasters").

Where operators/inference.py broadcasts a driver-fitted numpy model
into mapInPandas (reference-parity E2/E3), these queries fit AND
predict with pyspark.ml: training is distributed, and
``model.transform`` is pure JVM — no Python boundary at all in the
scoring hot path, which is the preferred shape when a native MLlib
estimator matches the model family (SURVEY.md §1.4, E3 mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sklearn_raster_spark.plans.registry import query
from sklearn_raster_spark.sources import read_table


@query(
    "q45_mllib_linear_regression",
    doc="Distributed MLlib LinearRegression: VectorAssembler features "
        "from lineitem (quantity, discount, tax) -> fit on the full "
        "table -> JVM-side transform. Deterministic ('normal' solver). "
        "Rows-only (model state is not SQL).",
)
def q45_mllib_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    )
    assembler = VectorAssembler(
        inputCols=["l_quantity", "l_discount", "l_tax"], outputCol="features"
    )
    assembled = assembler.transform(li)
    lr = LinearRegression(
        featuresCol="features",
        labelCol="l_extendedprice",
        predictionCol="pred_price",
        solver="normal",  # closed-form: deterministic across runs
        regParam=0.0,
    )
    model = lr.fit(assembled)
    return (
        model.transform(assembled)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("pred_price", 4).alias("pred_price"),
        )
    )


@query(
    "q46_mllib_kmeans",
    doc="Distributed MLlib KMeans over embeddings (seeded): fit and "
        "assign entirely in the JVM; cluster sizes returned. Rows-only "
        "(iterative algorithm state is not SQL).",
)
def q46_mllib_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    km = KMeans(k=8, seed=42, featuresCol="features", predictionCol="cluster")
    model = km.fit(emb)
    assigned = model.transform(emb)
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


@query(
    "q47_mllib_logistic_proba",
    doc="Distributed MLlib LogisticRegression on embeddings (binary "
        "label: label is even), probability column extracted per class "
        "via vector_to_array — the MLlib dual of predict_proba (E4). "
        "Rows-only.",
)
def q47_mllib_logistic_proba(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        (F.col("label") % 2 == 0).cast("double").alias("is_even"),
    )
    lr = LogisticRegression(
        featuresCol="features", labelCol="is_even", probabilityCol="proba", maxIter=20
    )
    model = lr.fit(emb)
    out = model.transform(emb)
    proba = vector_to_array("proba")
    return out.select(
        "vec_id",
        F.round(proba[0], 6).alias("proba_odd"),
        F.round(proba[1], 6).alias("proba_even"),
        F.col("prediction").cast("int").alias("pred_is_even"),
    )


ITEMSET_MIN_ORDERS = 3
# Relative support floor: 1 order per 50k baskets, integer-ceil. The
# absolute ITEMSET_MIN_ORDERS alone is a scale bug of the q149 class —
# the derived-sf1 run showed the pattern lattice growing linearly with
# the corpus (200k itemsets, OOM on the default 8g heap at 10x) because
# an absolute floor admits everything as data grows; at 100 TB a
# 3-order floor is ~1e-11 relative support and FPGrowth dies. The
# effective threshold is max(absolute, ceil(n_baskets/50000)): bit-
# identical results at every driver-graded sf (ceil hits 3 exactly at
# sf0.1's 147,236 baskets), 30 at derived sf1, and corpus-proportional
# beyond — the lattice stays bounded.
ITEMSET_SUPPORT_DENOM = 50_000


@query(
    "q118_frequent_itemsets",
    oracle=f"""
    WITH n AS (
        SELECT GREATEST(
            {ITEMSET_MIN_ORDERS},
            (COUNT(DISTINCT l_orderkey) + {ITEMSET_SUPPORT_DENOM - 1})
                // {ITEMSET_SUPPORT_DENOM}
        ) AS min_orders
        FROM lineitem
    ), singles AS (
        SELECT CAST(1 AS INTEGER) AS size, l_partkey AS item_a,
               CAST(NULL AS BIGINT) AS item_b,
               COUNT(DISTINCT l_orderkey) AS freq
        FROM lineitem
        GROUP BY l_partkey
        HAVING COUNT(DISTINCT l_orderkey) >= (SELECT min_orders FROM n)
    ), pairs AS (
        SELECT CAST(2 AS INTEGER) AS size, a.l_partkey AS item_a,
               b.l_partkey AS item_b,
               COUNT(DISTINCT a.l_orderkey) AS freq
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING COUNT(DISTINCT a.l_orderkey) >= (SELECT min_orders FROM n)
    )
    SELECT size, item_a, item_b, CAST(freq AS BIGINT) AS freq
    FROM singles
    UNION ALL
    SELECT size, item_a, item_b, CAST(freq AS BIGINT) AS freq FROM pairs
    """,
    doc="Frequent-itemset mining (market-basket analysis) with MLlib "
        "FPGrowth over order baskets, minimum support max("
        f"{ITEMSET_MIN_ORDERS} orders, 1 per {ITEMSET_SUPPORT_DENOM} "
        "baskets): the association-mining surface (FP-tree build is "
        "one pass + one grouped pass, itemset counting stays "
        "distributed). FPGrowth is EXACT — no RNG, no sketch — so the "
        "size<=2 slice of its output (canonicalized: sorted items "
        "into (item_a, item_b) columns) hash-matches a plain SQL "
        "counting oracle; larger itemsets ride the same run and are "
        "pytest-pinned by the downward-closure law (every subset of a "
        "frequent itemset is frequent with >= its support). Scale: "
        "the RELATIVE support floor keeps the pattern lattice bounded "
        "as the corpus grows (the derived-sf1 run caught the absolute "
        "floor admitting a linearly-growing lattice — the q149 "
        "threshold class); the basket table is one groupBy of the "
        "fact table.",
)
def q118_frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.fpm import FPGrowth

    li = read_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_distinct(F.collect_list("l_partkey")).alias("items")
    )
    n_baskets = baskets.count()
    min_orders = max(
        ITEMSET_MIN_ORDERS,
        -(-n_baskets // ITEMSET_SUPPORT_DENOM),  # integer ceil
    )
    fp = FPGrowth(
        itemsCol="items",
        # MLlib keeps itemsets with freq >= ceil(minSupport * n);
        # (min_orders - 0.5) makes that ceil land on min_orders exactly,
        # immune to the float boundary of min_orders / n_baskets
        minSupport=(min_orders - 0.5) / n_baskets,
        minConfidence=0.5,
    )
    model = fp.fit(baskets)
    sets = model.freqItemsets  # (items array<long>, freq long)
    sorted_items = F.array_sort("items")
    return (
        sets.filter(F.size("items") <= 2)
        .select(
            F.size("items").alias("size"),
            sorted_items[0].alias("item_a"),
            F.when(F.size("items") == 2, sorted_items[1]).alias("item_b"),
            F.col("freq").cast("bigint").alias("freq"),
        )
    )


@query(
    "q119_als_recommendations",
    doc="Implicit-feedback ALS recommender (MLlib) on the customer x "
        "part purchase matrix (rating = number of lineitems): factor "
        "model train + top-3 part recommendations per customer — the "
        "collaborative-filtering surface. Rows-only: ALS is seeded "
        "but its float convergence is platform/partitioning-"
        "dependent, so semantics are pytest-pinned instead (k per "
        "user, finite scores, recommendations drawn from the item "
        "vocabulary). Scale: ALS is the canonical block-factorized "
        "Spark algorithm — user/item factor blocks co-partitioned, "
        "each sweep a join per block, no driver-side matrix.",
)
def q119_als_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.recommendation import ALS

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    ratings = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )
    als = ALS(
        rank=8,
        maxIter=5,
        seed=42,
        implicitPrefs=True,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    recs = model.recommendForAllUsers(3)
    return recs.select(
        F.col("user").alias("custkey"),
        F.posexplode("recommendations").alias("rank0", "rec"),
    ).select(
        "custkey",
        (F.col("rank0") + 1).alias("rec_rank"),
        F.col("rec.item").alias("partkey"),
        F.col("rec.rating").cast("double").alias("score"),
    )
