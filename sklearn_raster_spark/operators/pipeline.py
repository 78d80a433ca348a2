"""Training-data-pipeline operators: MERGE upsert, deterministic
train/val/test splits, stratified sampling.

These are the bookkeeping stages around the dedup/similarity/text
surface (operators/dedup.py, text.py): land a refreshed batch into the
corpus (upsert), carve reproducible splits, and downsample strata to a
target mix. No reference analog (the reference is single-snapshot,
datasets/_base.py); the design constraints are Spark's:

- upsert = anti-join + union, with the delta side broadcast when small
  (the common case: a day's refresh against a years-deep corpus). No
  full-table rewrite semantics — at rest this is the same plan a
  MERGE INTO executes on a transactional table format.
- splits/samples use a cross-engine content hash (md5 prefix -> int),
  NOT Spark's seeded RNG: assignment is a pure function of the row
  key, so it is stable across engines, partitionings, retries and
  re-runs — the property a training pipeline actually needs from a
  split. RNG sampling (df.sample/sampleBy) exists in Spark but is
  plan-dependent; hash-gating is the deterministic dual and is what
  the oracle replicates bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sklearn_raster_spark.plans.registry import query
from sklearn_raster_spark.sources import read_table
from sklearn_raster_spark.utils.cache import shared_lineage


def hash_bucket(col: Column, n_buckets: int = 100) -> Column:
    """Deterministic [0, n_buckets) bucket from a column's md5. The
    6-hex-digit prefix (24 bits) fits exactly in both engines' BIGINT
    parsing, so Spark ``conv`` and DuckDB ``CAST('0x…')`` agree."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(n_buckets))


def _oracle_bucket(expr: str, n_buckets: int | None = 100) -> str:
    """DuckDB dual of _bucket. n_buckets=None returns the RAW 24-bit
    hash value (no modulo) for callers that apply their own modulus
    (q146 uses `raw % n_parts` where n_parts is a subquery column)."""
    raw = f"CAST(('0x' || SUBSTR(MD5(CAST({expr} AS VARCHAR)), 1, 6)) AS BIGINT)"
    return raw if n_buckets is None else f"{raw} % {n_buckets}"


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE INTO semantics as a composition: matched target rows are
    replaced by their source version, unmatched source rows are
    inserted, untouched target rows pass through.

    Plan shape: ONE anti-join (target minus matched) + union. The
    source is broadcast when under the auto-broadcast threshold, so a
    small delta never shuffles the big corpus; a big delta falls back
    to a shuffled anti-join on the key — both correct, Catalyst picks.
    """
    return target.join(source.select(*keys), keys, "left_anti").unionByName(source)


@query(
    "q71_merge_upsert",
    oracle="""
    WITH delta AS (
        SELECT o_orderkey, o_custkey,
               'R' AS o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'N',
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 100 = 0
    ), merged AS (
        SELECT o.* FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = o.o_orderkey)
        UNION ALL
        SELECT * FROM delta
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28, 10))) AS DOUBLE) AS total_price,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM merged
    GROUP BY o_orderstatus
    """,
    doc="MERGE INTO (upsert) as anti-join + union: a synthetic refresh "
        "batch (10% updated rows, 1% inserts with shifted keys) lands "
        "into orders; per-status aggregate proves matched rows were "
        "replaced (not duplicated) and inserts arrived exactly once. "
        "Delta side broadcasts; the corpus is never shuffled.",
)
def q71_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).withColumns(
        {
            "o_orderstatus": F.lit("R"),
            "o_totalprice": F.col("o_totalprice") * 1.1,
        }
    )
    inserts = orders.filter(F.col("o_orderkey") % 100 == 0).withColumns(
        {
            "o_orderkey": F.col("o_orderkey") + 10_000_000,
            "o_orderstatus": F.lit("N"),
        }
    )
    merged = merge_upsert(orders, updates.unionByName(inserts), ["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,10)"))
        .cast("double")
        .alias("total_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


SPLIT_BOUNDS = (80, 90)  # train < 80 <= val < 90 <= test


def train_val_test(df: DataFrame, key: Column) -> Column:
    b = hash_bucket(key)
    return (
        F.when(b < SPLIT_BOUNDS[0], "train")
        .when(b < SPLIT_BOUNDS[1], "val")
        .otherwise("test")
    )


@query(
    "q72_hash_split",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               CASE WHEN {_oracle_bucket('doc_id')} < {SPLIT_BOUNDS[0]} THEN 'train'
                    WHEN {_oracle_bucket('doc_id')} < {SPLIT_BOUNDS[1]} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM assigned
    GROUP BY split
    """,
    doc="Deterministic 80/10/10 train/val/test split: assignment is "
        "md5(doc_id) bucketed, a pure row-key function — stable under "
        "repartitioning, retries and engine swaps (the oracle computes "
        "the identical assignment). The per-split aggregate pins every "
        "row's membership via count + content sums.",
)
def q72_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", train_val_test(docs, F.col("doc_id")))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # BIGINT on both sides: DuckDB SUM(int) is HUGEINT, which the
            # driver's pandas hasher reads as float64 and hash-mismatches
            # Spark's long (the q72 red row in CORRECTNESS_r02)
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


STRATA_PCT = {"en": 10, "fr": 50, "es": 50, "de": 100}
DEFAULT_PCT = 25


def stratified_sample(df: DataFrame, stratum: Column, key: Column, pct_map: dict, default_pct: int) -> DataFrame:
    """Keep a per-stratum deterministic fraction: row survives iff its
    md5 bucket falls under the stratum's percentage. One narrow scan,
    no shuffle, no RNG — the downsample-to-target-mix stage of a
    training pipeline (e.g. rebalancing languages), reproducible by
    construction."""
    pct = F.lit(default_pct)
    for k, v in sorted(pct_map.items()):
        pct = F.when(stratum == k, v).otherwise(pct)
    return df.filter(hash_bucket(key) < pct)


@query(
    "q73_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_oracle_bucket('doc_id')} <
          CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(STRATA_PCT.items()))}
               ELSE {DEFAULT_PCT} END
    """,
    doc="Stratified downsample to a target language mix (10% en, 50% "
        "fr/es, 100% de): hash-gated per-stratum fractions, zero "
        "shuffle, fully reproducible. Row-level output (doc_id, lang) "
        "so the oracle pins every kept row, not just counts.",
)
def q73_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, F.col("lang"), F.col("doc_id"), STRATA_PCT, DEFAULT_PCT
    ).select("doc_id", "lang")


SHINGLE_N = 5
PACK_TARGET_TOKENS = 256


@query(
    "q101_contamination_check",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, text,
               CASE WHEN {_oracle_bucket('doc_id')} < {SPLIT_BOUNDS[0]} THEN 'train'
                    WHEN {_oracle_bucket('doc_id')} < {SPLIT_BOUNDS[1]} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    toks AS (SELECT doc_id, split, STRING_SPLIT(text, ' ') AS ws FROM assigned),
    sh AS (
        SELECT doc_id, split,
               ARRAY_TO_STRING(ws[i:i+{SHINGLE_N - 1}], ' ') AS shingle
        FROM toks, UNNEST(RANGE(1, LEN(ws) - {SHINGLE_N - 2})) AS t(i)
        WHERE LEN(ws) >= {SHINGLE_N}
    ),
    train_sh AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
    ev AS (SELECT doc_id, split, shingle FROM sh WHERE split <> 'train'),
    per AS (
        SELECT e.doc_id, e.split,
               COUNT(*) AS n_shingles,
               COUNT(*) FILTER (WHERE t.shingle IS NOT NULL) AS n_shared
        FROM ev e LEFT JOIN train_sh t ON e.shingle = t.shingle
        GROUP BY 1, 2
    )
    SELECT doc_id, split, n_shingles, n_shared,
           ROUND(CAST(n_shared AS DOUBLE) / n_shingles, 6) AS contamination
    FROM per
    """,
    doc=f"Train/eval contamination check (the decontamination step every "
        f"LLM pipeline runs before trusting an eval): {SHINGLE_N}-gram "
        "token shingles of every val/test doc are joined against the "
        "DISTINCT shingle set of the train split (as assigned by q72's "
        "deterministic hash split), yielding a per-eval-doc overlap "
        "ratio. Plan shape: tokenize-explode (narrow), one DISTINCT "
        "over train shingles, one shuffle hash join on the shingle "
        "string, one hash aggregate — all linear in corpus size; at "
        "100 TB the exact join swaps for a bloom-filter broadcast of "
        "the train shingle set with identical semantics up to the "
        "filter's false-positive rate. Docs shorter than the shingle "
        "width are excluded on both sides (no shingles exist).",
)
def q101_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    assigned = docs.withColumn("split", train_val_test(docs, F.col("doc_id")))
    ws = F.split("text", " ")
    with_ws = assigned.select("doc_id", "split", ws.alias("ws")).filter(
        F.size("ws") >= SHINGLE_N
    )
    shingles = with_ws.select(
        "doc_id",
        "split",
        word_shingles(SHINGLE_N).alias("shingle"),
    )
    # shared cache: the tokenize+slide lineage feeds both the train
    # shingle set and the eval side of the join. LAZY (r12 opt, guide
    # §5): whichever consumer scans first populates it (deterministic
    # lineage — split+slide+hash-bucket of parquet text); the eager
    # count() pass bought nothing here
    shingles = shared_lineage(shingles, eager=False)
    train_sh = (
        shingles.filter(F.col("split") == "train")
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ev = shingles.filter(F.col("split") != "train")
    per = (
        ev.join(train_sh, "shingle", "left")
        .groupBy("doc_id", "split")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_shared"),
        )
    )
    return per.select(
        "doc_id",
        "split",
        "n_shingles",
        "n_shared",
        F.round(F.col("n_shared").cast("double") / F.col("n_shingles"), 6).alias(
            "contamination"
        ),
    )


BLOOM_K = 5
BLOOM_BITS_PER_ITEM = 8


def build_bloom_words(
    items: DataFrame, col: str, m_bits: int, k: int = BLOOM_K
) -> DataFrame:
    """Distributed bloom-filter BUILD: k salted-xxhash64 bit positions
    per item, OR-folded into 64-bit words by one bit_or hash aggregate.
    Returns (word, bits) with at most m_bits/64 rows — broadcastable by
    construction (a bloom is only useful if it fits one node), and the
    build itself never collects the item set anywhere: the only shuffle
    is the word-level bit_or aggregate, whose output is the filter."""
    pos = items.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(col), F.lit(j)), F.lit(m_bits))
                    for j in range(k)
                ]
            )
        ).alias("pos")
    )
    return pos.groupBy(F.shiftright("pos", 6).alias("word")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))")).alias("bits")
    )


def _bloom_position_cols(col: str, m_bits: int, k: int = BLOOM_K) -> list:
    """The k probe positions for ``col`` — the SAME salted-hash family
    the build uses, as plain columns."""
    return [
        F.pmod(F.xxhash64(F.col(col), F.lit(j)), F.lit(m_bits)).alias(f"_pos{j}")
        for j in range(k)
    ]


@query(
    "q106_contamination_bloom",
    doc=f"Bloom-filter contamination check — q101's 100 TB swap-in "
        "(SCALE.md; reference performance_tips.md:21-25's exact/"
        "approximate trade-off pattern): instead of shuffling the "
        "DISTINCT train shingle set into a join, the train side "
        f"collapses to a bloom bitmap ({BLOOM_BITS_PER_ITEM} bits/item, "
        f"k={BLOOM_K}, theoretical fpp ~2.2%) built by a distributed "
        "bit_or word aggregate and broadcast as a (word, bits) dim "
        "table; every eval shingle probes its k positions via k "
        "chained broadcast hash joins — zero Python, no shuffle of "
        "either shingle set, one final per-doc aggregate. Semantics = "
        "q101 up to the false-positive rate, one-sided: n_shared_bloom "
        ">= exact n_shared always (no false negatives), overshoot "
        "bounded by fpp (pytest-pinned vs q101). Rows-only (the salted "
        "hash family is not SQL-expressible).",
)
def q106_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    assigned = docs.withColumn("split", train_val_test(docs, F.col("doc_id")))
    ws = F.split("text", " ")
    with_ws = assigned.select("doc_id", "split", ws.alias("ws")).filter(
        F.size("ws") >= SHINGLE_N
    )
    shingles = with_ws.select(
        "doc_id",
        "split",
        word_shingles(SHINGLE_N).alias("shingle"),
    )
    # the tokenize+slide lineage feeds the bloom build (train side),
    # the sizing count, and the probe side. LAZY (r12 opt, guide §5):
    # the n_train sizing count below populates the cache — the eager
    # count() inside shared_lineage ran a near-identical job twice
    shingles = shared_lineage(shingles, eager=False)
    train_sh = shingles.filter(F.col("split") == "train").select("shingle").distinct()
    # size the filter off the actual item count (one count job over the
    # cached lineage); power-of-two bits keep pmod cheap
    n_train = max(train_sh.count(), 1)
    m_bits = max(1 << 16, 1 << (n_train * BLOOM_BITS_PER_ITEM - 1).bit_length())
    # r12 OPT (guide §2.4): densify the sparse (word, bits) aggregate
    # into ONE row holding the whole bitmap as array<bigint> — probing
    # k positions becomes k O(1) element_at lookups in a single
    # codegen'd projection behind one broadcast nested-loop attach,
    # instead of k chained broadcast hash joins (k join nodes, k hash
    # probes and row copies per shingle). Bits are identical (same
    # build aggregate; absent words densify to 0 == the old
    # coalesce(miss)). The bitmap row is m_bits/64 longs — the same
    # bytes the broadcast table carried; a bloom only works at all if
    # that fits one node.
    words = build_bloom_words(train_sh, "shingle", m_bits)
    bitmap = F.broadcast(
        spark.range(m_bits // 64)
        .select(F.col("id").alias("word"))
        .join(words, "word", "left")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("word", F.coalesce("bits", F.lit(0)).alias("bits"))
                    )
                ),
                lambda s: s["bits"],
            ).alias("bm")
        )
    )

    ev = (
        shingles.filter(F.col("split") != "train")
        .select("doc_id", "split", *_bloom_position_cols("shingle", m_bits))
        .crossJoin(bitmap)
    )
    hit_terms = []
    for j in range(BLOOM_K):
        word_idx = (F.shiftright(f"_pos{j}", 6) + 1).cast("int")  # 1-based
        bit = F.expr(f"shiftleft(1L, CAST(pmod(_pos{j}, 64) AS INT))")
        hit_terms.append(F.element_at("bm", word_idx).bitwiseAND(bit) != 0)
    all_hit = hit_terms[0]
    for t in hit_terms[1:]:
        all_hit = all_hit & t
    per = ev.groupBy("doc_id", "split").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(all_hit.cast("int")).alias("n_shared_bloom"),
    )
    return per.select(
        "doc_id",
        "split",
        "n_shingles",
        "n_shared_bloom",
        F.round(
            F.col("n_shared_bloom").cast("double") / F.col("n_shingles"), 6
        ).alias("contamination_bloom"),
    )


@query(
    "q102_sequence_packing",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT source, doc_id, n_tokens,
               CAST(FLOOR(CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS DOUBLE) / {PACK_TARGET_TOKENS}) AS BIGINT) AS bin_id
        FROM toks
    )
    SELECT source, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY source, bin_id
    """,
    doc=f"Sequence packing (concat-and-chunk batching for training): "
        f"within each source shard, docs are laid end-to-end in doc_id "
        f"order and assigned to ~{PACK_TARGET_TOKENS}-token bins by "
        "bin = floor(preceding_cumulative_tokens / target) — the "
        "deterministic dual of greedy packing (a doc spanning a "
        "boundary starts its bin, exactly like chunked-concat "
        "pretraining batches). All-integer window arithmetic, so the "
        "oracle matches bit-for-bit. Scale shape: the window "
        "partitions on the shard key (NO global ordering — packing is "
        "per-shard by design, which is also what keeps it "
        "embarrassingly parallel at 100 TB), then one hash aggregate "
        "on (source, bin).",
)
def q102_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double")
            / PACK_TARGET_TOKENS
        ).cast("bigint"),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


SAMPLE_PER_STRATUM = 20


@query(
    "q105_fixed_size_sample",
    oracle=f"""
    SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    ) WHERE rn <= {SAMPLE_PER_STRATUM}
    """,
    doc=f"Fixed-size deterministic sample: EXACTLY {SAMPLE_PER_STRATUM} "
        "docs per language, chosen by ranking on md5(doc_id) — the "
        "content-hash order is uniform-pseudorandom yet a pure row-key "
        "function, so the sample is stable across engines, partitions "
        "and retries (the exact-budget eval-set contract; q73 is the "
        "percentage dual). One window shuffle on the stratum key; at "
        "scale this is a per-group top-k, which Catalyst executes as "
        "partial top-k per partition before the shuffle (WindowGroupLimit "
        "pushdown) — no full sort of the corpus.",
)
def q105_fixed_size_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_PER_STRATUM)
        .select("doc_id", "lang", "rn")
    )


PRIORITY_SAMPLE_K = 200


@query(
    "q108_priority_sample",
    oracle=f"""
    WITH pr AS (
        SELECT o_orderkey, o_totalprice,
               o_totalprice / ((CAST(('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 6)) AS BIGINT) + 1) / 16777216.0)
                   AS priority
        FROM orders
    )
    SELECT o_orderkey, o_totalprice, priority
    FROM pr
    ORDER BY priority DESC, o_orderkey
    LIMIT {PRIORITY_SAMPLE_K}
    """,
    doc=f"Weighted sampling without replacement via priority sampling "
        "(Duffield-Lund-Thorup): each order gets priority w/u with "
        "weight w = o_totalprice and u a deterministic md5-derived "
        "uniform in (0,1], and the top-" f"{PRIORITY_SAMPLE_K} "
        "priorities form the sample — heavier rows enter with "
        "probability min(1, w/threshold), the estimator-friendly "
        "weighted subset a pipeline uses to downsample by importance "
        "(e.g. longer docs / higher-loss shards). Deterministic: u is "
        "a pure row-key function (md5 24-bit prefix, same arithmetic "
        "in the oracle), so the sample survives retries, "
        "repartitioning and engine swaps. Plan: no window, no full "
        "sort — Catalyst runs TakeOrderedAndProject (per-partition "
        "top-k, merge k at the driver), the scalable global-top-k "
        "shape.",
)
def q108_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    h = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 6), 16, 10).cast(
        "bigint"
    )
    u = (h + F.lit(1)) / F.lit(16777216.0)
    return (
        orders.select(
            "o_orderkey",
            "o_totalprice",
            (F.col("o_totalprice") / u).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "o_orderkey")
        .limit(PRIORITY_SAMPLE_K)
    )


MIX_BATCH = 120


def _mix_weight_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} IN ('src0','src1','src2','src3','src4') THEN 4.0 "
        f"WHEN {col} IN ('src5','src6','src7','src8','src9') THEN 2.0 "
        "ELSE 1.0 END"
    )


def word_shingle_array(n: int) -> Column:
    """Array of n-word shingles of the pre-split `ws` column — THE
    definition of the slide-and-join shingle expression, shared by
    q101 (contamination), q121 (boilerplate), q149 (composition) and
    q150 (portable MinHash); their oracles all reproduce exactly this
    arithmetic, so a single Spark-side source of truth keeps the four
    graded paths from drifting. Callers filter size(ws) >= n first."""
    return F.transform(
        F.sequence(F.lit(0), F.size("ws") - n),
        lambda i: F.array_join(F.slice(F.col("ws"), i + 1, n), " "),
    )


def word_shingles(n: int) -> Column:
    """Exploded (one row per occurrence) form of word_shingle_array."""
    return F.explode(word_shingle_array(n))


def mix_weight_col(col: str = "source") -> Column:
    """Spark dual of _mix_weight_sql — the single source of truth for
    the training-mix source weights, shared by q114 and q149's quota
    stage so the two graded paths cannot drift."""
    return (
        F.when(F.col(col).isin("src0", "src1", "src2", "src3", "src4"), 4.0)
        .when(F.col(col).isin("src5", "src6", "src7", "src8", "src9"), 2.0)
        .otherwise(1.0)
    )


@query(
    "q114_training_mix",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               {_mix_weight_sql('source')} AS w
        FROM documents
    ), keyed AS (
        SELECT doc_id, source, CAST(rn AS INTEGER) AS rn,
               (rn - 0.5) / w AS pos_key
        FROM ranked
    )
    SELECT doc_id, source, rn, pos_key
    FROM keyed
    ORDER BY pos_key, source, doc_id
    LIMIT {MIX_BATCH}
    """,
    doc="Deterministic training-mix scheduler (the Pile/Dolma-style "
        "source-weighted interleave): every source's docs are put in a "
        "reproducible pseudorandom order (md5 rank), then interleaved "
        "by fractional position (rn - 0.5)/weight, so a weight-4 "
        "source contributes 4 docs for every weight-1 doc — the exact "
        "stream order a loader would consume for a target corpus mix. "
        "The query emits the next batch of " f"{MIX_BATCH}" " docs: "
        "per-source rank is a partitioned window (WindowGroupLimit-"
        "prunable), the global batch is TakeOrderedAndProject — "
        "per-partition top-k, merge at the driver, never a global "
        "sort. Deterministic: pseudorandom order is a pure row-key "
        "function; ties break on (source, doc_id); the fractional "
        "key is one IEEE division replicated in the oracle.",
)
def q114_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    weight = mix_weight_col("source")
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).alias("rn"),
        weight.alias("w"),
    )
    return (
        ranked.select(
            "doc_id",
            "source",
            "rn",
            ((F.col("rn") - 0.5) / F.col("w")).alias("pos_key"),
        )
        .orderBy("pos_key", "source", "doc_id")
        .limit(MIX_BATCH)
    )


GROUP_FOLDS = 5


@query(
    "q126_grouped_split",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey, {_oracle_bucket('c_custkey')} % {GROUP_FOLDS} AS fold
        FROM customer
    ),
    joined AS (
        SELECT c.fold, o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o JOIN cust c ON o.o_custkey = c.c_custkey
    )
    SELECT fold,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28, 10))) AS DOUBLE) AS revenue
    FROM joined GROUP BY fold
    """,
    doc=f"Leakage-safe grouped k-fold split (GroupKFold semantics): "
        f"folds are assigned to the ENTITY (customer, md5-hash mod "
        f"{GROUP_FOLDS}), and every order inherits its customer's fold "
        "— so no entity ever straddles a train/eval boundary, the "
        "property row-level splits (q72) cannot give when rows of one "
        "user are correlated. Plan: the fold map is a projection of "
        "the dimension table, broadcast onto the fact scan — zero "
        "extra shuffles over the plain join; assignment is a pure "
        "row-key function, stable across engines/retries/partitions. "
        "Per-fold balance stats come from exact DECIMAL sums; the "
        "no-straddle law is pytest-pinned (each customer in exactly "
        "one fold).",
)
def q126_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.pmod(hash_bucket(F.col("c_custkey")), F.lit(GROUP_FOLDS)).alias("fold"),
    )
    orders = read_table(spark, sf_dir, "orders")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return joined.groupBy("fold").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,10)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "q143_incremental_aggregate",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28, 10))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY 1, 2
    """,
    doc="Incremental aggregate-view maintenance: the corpus aggregate "
        "is NOT recomputed when a batch lands — the existing "
        "per-group state (sum/count DECIMAL partials over the corpus "
        "minus the arriving batch, stood in for here by a "
        "deterministic hash split) MERGES with the batch's partials "
        "by a union + one re-aggregate over |groups| rows. That "
        "merge-not-recompute property is exactly what makes the "
        "aggregates chosen throughout this engine (DECIMAL sums, "
        "counts, min/max — never raw-float sums or medians) "
        "maintainable under streaming/CDC at 100 TB: the daily cost "
        "is O(batch + groups), not O(corpus). The ORACLE is the "
        "full-table aggregate, so the driver hash-checks that "
        "incremental == full recompute bit-for-bit.",
)
def q143_incremental_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    is_batch = hash_bucket(F.col("l_orderkey")) >= 80  # the "arriving" 20%

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).alias("price_dec"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    corpus_state = partials(li.filter(~is_batch))  # the persisted view state
    batch_state = partials(li.filter(is_batch))  # the day's delta
    merged = (
        corpus_state.unionByName(batch_state)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("sum_qty").cast("bigint").alias("sum_qty"),
            F.sum("price_dec").cast("double").alias("sum_price"),
            F.sum("n_rows").alias("n_rows"),
        )
    )
    return merged


NEG_K = 3  # negatives kept per customer
NEG_SLOTS = 8  # candidate slots drawn before the purchase anti-filter


@query(
    "q146_negative_sampling",
    oracle=f"""
    WITH idx AS (
        SELECT p_partkey, ROW_NUMBER() OVER (ORDER BY p_partkey) - 1 AS pidx
        FROM part
    ),
    n AS (SELECT COUNT(*) AS n_parts FROM part),
    slots AS (
        SELECT c.c_custkey, s.slot,
               {_oracle_bucket("c.c_custkey || ':' || s.slot", None)} % n.n_parts AS pidx
        FROM customer c, (SELECT UNNEST(RANGE({NEG_SLOTS})) AS slot) s, n
    ),
    cands AS (
        SELECT DISTINCT s.c_custkey, i.p_partkey, MIN(s.slot) AS slot
        FROM slots s JOIN idx i ON s.pidx = i.pidx
        GROUP BY s.c_custkey, i.p_partkey
    ),
    purchased AS (
        SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT c_custkey, p_partkey, CAST(neg_rank AS INTEGER) AS neg_rank
    FROM (
        SELECT c.c_custkey, c.p_partkey,
               ROW_NUMBER() OVER (
                   PARTITION BY c.c_custkey ORDER BY c.slot, c.p_partkey
               ) AS neg_rank
        FROM cands c
        LEFT JOIN purchased p
          ON c.c_custkey = p.o_custkey AND c.p_partkey = p.l_partkey
        WHERE p.o_custkey IS NULL
    ) WHERE neg_rank <= {NEG_K}
    """,
    doc=f"Deterministic negative sampling (contrastive/recsys training "
        f"data): {NEG_K} parts per customer that the customer did NOT "
        f"purchase, drawn by hashing (customer, slot) over "
        f"{NEG_SLOTS} candidate slots through a ranked part index, "
        "then anti-filtered against the purchase set and ranked by "
        "slot. The scalable insight: negatives come from O(customers "
        "x slots) generated rows — the customer x part cross product "
        "is NEVER materialized (3B pairs at sf1 would be); the margin "
        "of extra slots absorbs candidates knocked out by the "
        "purchase filter. md5-hash assignment is a pure row-key "
        "function — stable across engines, partitions and retries — "
        "and the part-index indirection keeps the op correct under "
        "ANY partkey keyspace. The oracle replicates slot hashing, "
        "index mapping and anti-filter exactly.",
)
def q146_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    part = read_table(spark, sf_dir, "part")
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")

    widx = Window.orderBy("p_partkey")
    idx = part.select("p_partkey").withColumn(
        "pidx", F.row_number().over(widx) - 1
    )
    n_parts = idx.count()

    slot_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("c_custkey").cast("string"), F.col("slot"))),
            1,
            6,
        ),
        16,
        10,
    ).cast("bigint")
    slots = customer.select(
        "c_custkey", F.explode(F.sequence(F.lit(0), F.lit(NEG_SLOTS - 1))).alias("slot")
    ).select("c_custkey", "slot", F.pmod(slot_hash, F.lit(n_parts)).alias("pidx"))
    cands = (
        slots.join(F.broadcast(idx), "pidx")
        .groupBy("c_custkey", "p_partkey")
        .agg(F.min("slot").alias("slot"))
    )
    purchased = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("c_custkey"), F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    wr = Window.partitionBy("c_custkey").orderBy("slot", "p_partkey")
    return (
        cands.join(purchased, ["c_custkey", "p_partkey"], "left_anti")
        .withColumn("neg_rank", F.row_number().over(wr))
        .filter(F.col("neg_rank") <= NEG_K)
        .select("c_custkey", "p_partkey", F.col("neg_rank").cast("int"))
    )


WF_FOLDS = 3  # walk-forward folds: train <= cutoff_i, validate next year


@query(
    "q147_walk_forward_split",
    oracle=f"""
    WITH labeled AS (
        SELECT f.fold,
               CASE WHEN YEAR(o.o_orderdate) <= 1995 + f.fold THEN 'train'
                    WHEN YEAR(o.o_orderdate) = 1996 + f.fold THEN 'val'
                    END AS role,
               o.o_totalprice
        FROM orders o,
             (SELECT UNNEST(RANGE({WF_FOLDS})) AS fold) f
    )
    SELECT CAST(fold AS INTEGER) AS fold, role,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28, 10))) AS DOUBLE) AS revenue
    FROM labeled WHERE role IS NOT NULL
    GROUP BY fold, role
    """,
    doc=f"Walk-forward (temporal) cross-validation split: fold i "
        "trains on everything through year 1995+i and validates on "
        "the following year — the time-leakage-safe evaluation "
        "protocol for forecasting/ranking models, completing the "
        "split family (row-hash q72, stratified q73, entity-grouped "
        "q126, temporal q147): a model must never see the future, "
        "which random splits cannot guarantee. Plan: each row fans "
        f"out to its {WF_FOLDS} fold roles via one small explode "
        "(never a per-fold rescan), the date predicate is a pure "
        "column function, and per-(fold, role) DECIMAL aggregates "
        "partial-combine; assignment is a function of the DATE, so it "
        "is stable under any partitioning, engine or retry.",
)
def q147_walk_forward_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    labeled = orders.select(
        F.explode(F.sequence(F.lit(0), F.lit(WF_FOLDS - 1))).alias("fold"),
        F.year("o_orderdate").alias("yr"),
        "o_totalprice",
    ).select(
        "fold",
        F.when(F.col("yr") <= 1995 + F.col("fold"), "train")
        .when(F.col("yr") == 1996 + F.col("fold"), "val")
        .alias("role"),
        "o_totalprice",
    )
    return (
        labeled.filter(F.col("role").isNotNull())
        .groupBy(F.col("fold").cast("int"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,10)"))
            .cast("double")
            .alias("revenue"),
        )
    )
