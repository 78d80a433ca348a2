"""Text-analysis operators over ``documents`` — language ID, quality
scoring, token counting, fingerprinting (LLM-pipeline surface,
BASELINE.json north star). Everything is built-in column expressions
(codegen), zero Python in the hot path; every formula is replicated
verbatim in the DuckDB oracle so results are exact matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sklearn_raster_spark.plans.registry import query
from sklearn_raster_spark.sources import read_table
from sklearn_raster_spark.utils.cache import shared_lineage

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# tiny per-language marker lists for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "fr": ("le", "la", "et", "de"),
    "es": ("el", "la", "y", "de"),
    "de": ("der", "die", "und", "von"),
}


@query(
    "q60_text_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS ws, LENGTH(text) AS n_chars_txt
        FROM documents
    )
    SELECT
        doc_id,
        lang,
        CAST(LEN(ws) AS INTEGER) AS n_tokens,
        CAST(LEN(LIST_DISTINCT(ws)) AS INTEGER) AS n_distinct,
        CAST(LEN(LIST_DISTINCT(ws)) AS DOUBLE) / LEN(ws) AS ttr,
        CAST(n_chars_txt - (LEN(ws) - 1) AS DOUBLE) / LEN(ws) AS avg_token_len,
        CAST(LEN(LIST_FILTER(ws, w -> w IN {STOPWORDS!r})) AS DOUBLE) / LEN(ws) AS stopword_ratio
    FROM toks
    """,
    doc="Quality stats per doc: token count, type-token ratio, average "
        "token length, stopword ratio — pure column expressions.",
)
def q60_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n = F.size(ws)
    ndis = F.size(F.array_distinct(ws))
    sw = F.array([F.lit(s) for s in STOPWORDS])
    n_sw = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return docs.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        ndis.alias("n_distinct"),
        (ndis.cast("double") / n).alias("ttr"),
        ((F.length("text") - (n - 1)).cast("double") / n).alias("avg_token_len"),
        (n_sw.cast("double") / n).alias("stopword_ratio"),
    )


def _lang_case_sql() -> str:
    hits = {
        lang: f"LEN(LIST_FILTER(ws, w -> w IN {markers!r}))"
        for lang, markers in LANG_MARKERS.items()
    }
    # deterministic argmax: fixed evaluation order, strict > comparison
    return f"""
    CASE
        WHEN {hits['en']} >= GREATEST({hits['fr']}, {hits['es']}, {hits['de']}, 1) THEN 'en'
        WHEN {hits['fr']} >= GREATEST({hits['es']}, {hits['de']}, 1) THEN 'fr'
        WHEN {hits['es']} >= GREATEST({hits['de']}, 1) THEN 'es'
        WHEN {hits['de']} >= 1 THEN 'de'
        ELSE 'unknown'
    END
    """


@query(
    "q61_language_id",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS ws FROM documents)
    SELECT
        doc_id,
        lang AS labeled_lang,
        {_lang_case_sql()} AS detected_lang
    FROM toks
    """,
    doc="Stopword-marker language ID with a deterministic argmax "
        "(fixed tie-break order). Both engines evaluate the identical "
        "CASE over identical integer hit counts.",
)
def q61_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    # Spark accepts the same expression modulo list-function names
    hits = {
        lang: f"size(filter(ws, w -> w IN {markers!r}))"
        for lang, markers in LANG_MARKERS.items()
    }
    case = f"""
    CASE
        WHEN {hits['en']} >= GREATEST({hits['fr']}, {hits['es']}, {hits['de']}, 1) THEN 'en'
        WHEN {hits['fr']} >= GREATEST({hits['es']}, {hits['de']}, 1) THEN 'fr'
        WHEN {hits['es']} >= GREATEST({hits['de']}, 1) THEN 'es'
        WHEN {hits['de']} >= 1 THEN 'de'
        ELSE 'unknown'
    END
    """
    return spark.sql(
        f"""
        WITH toks AS (SELECT doc_id, lang, SPLIT(text, ' ') AS ws FROM documents)
        SELECT doc_id, lang AS labeled_lang, {case} AS detected_lang
        FROM toks
        """
    )


@query(
    "q62_fingerprint",
    oracle="""
    SELECT
        doc_id,
        LIST_REDUCE(
            LIST_TRANSFORM(STRING_SPLIT(text, ' '), w -> CAST(LENGTH(w) AS BIGINT)),
            (a, x) -> (a * 31 + x) % 1000000007
        ) AS fingerprint
    FROM documents
    """,
    doc="Rolling polynomial fingerprint over token lengths, mod 1e9+7 "
        "(exact integer math; Spark's 0-seeded fold equals DuckDB's "
        "first-element-seeded reduce because 0*31+x0 == x0).",
)
def q62_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    lens = F.transform(F.split("text", " "), lambda w: F.length(w).cast("bigint"))
    fp = F.aggregate(
        lens,
        F.lit(0).cast("bigint"),
        lambda a, x: (a * 31 + x) % 1000000007,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


@query(
    "q63_regex_tokens",
    oracle="""
    SELECT
        doc_id,
        CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+')) AS INTEGER) AS n_regex_tokens,
        CAST(LEN(REGEXP_EXTRACT_ALL(text, '[aeiou]')) AS INTEGER) AS n_vowels
    FROM documents
    """,
    doc="Regex (BPE-ish) tokenization counts.",
)
def q63_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0)).alias("n_regex_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[aeiou]"), 0)).alias("n_vowels"),
    )


@query(
    "q65_bigram_counts",
    oracle="""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
    grams AS (
        SELECT UNNEST(LIST_TRANSFORM(
            LIST_SORT(RANGE(1, LEN(ws))),
            i -> ws[i] || ' ' || ws[i + 1]
        )) AS bigram
        FROM toks
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams
    GROUP BY bigram
    HAVING COUNT(*) >= 10
    """,
    doc="Corpus bigram frequencies (n-gram extraction -> hash agg), the "
        "vocabulary-building stage of a text pipeline.",
)
def q65_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # split ONCE into a projected column; referencing `split(text)` inside
    # the transform lambda re-evaluates the split per element (O(len^2)
    # per doc — measured 3.1s -> sub-second at sf0.1)
    words = docs.select(F.split("text", " ").alias("ws"))
    # guard size(ws) >= 2: sequence(1, 0) counts DOWN to [1, 0] and the
    # subscripts then throw INVALID_ARRAY_INDEX under default ANSI mode
    # on any single-token or empty document (same pitfall guarded in
    # fuzzy_qgram_candidates) — shipped testdata's 10-token minimum is
    # the only reason this was latent
    bigrams = F.expr(
        "CASE WHEN size(ws) >= 2 THEN "
        "transform(sequence(1, size(ws) - 1), i -> concat(ws[i - 1], ' ', ws[i])) "
        "ELSE array() END"
    )
    return (
        words.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
    )


@query(
    "q64_quality_filter",
    oracle=f"""
    WITH stats AS (
        SELECT doc_id, lang, n_chars,
               LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
               CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
                   / LEN(STRING_SPLIT(text, ' ')) AS ttr,
               CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w IN {STOPWORDS!r})) AS DOUBLE)
                   / LEN(STRING_SPLIT(text, ' ')) AS stopword_ratio
        FROM documents
    )
    SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens, ttr, stopword_ratio
    FROM stats
    WHERE n_tokens BETWEEN 20 AND 200 AND ttr >= 0.3 AND stopword_ratio <= 0.3
    """,
    doc="Composite quality gate (the filter stage of an LLM data "
        "pipeline): length band + lexical diversity + stopword cap.",
)
def q64_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n = F.size(ws)
    ttr = F.size(F.array_distinct(ws)).cast("double") / n
    sw = F.array([F.lit(s) for s in STOPWORDS])
    swr = F.size(F.filter(ws, lambda w: F.array_contains(sw, w))).cast("double") / n
    return (
        docs.select(
            "doc_id",
            "lang",
            n.alias("n_tokens"),
            ttr.alias("ttr"),
            swr.alias("stopword_ratio"),
        )
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("n_tokens") <= 200)
            & (F.col("ttr") >= 0.3)
            & (F.col("stopword_ratio") <= 0.3)
        )
    )


@query(
    "q96_tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(text), '[^a-z]+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term <> '' GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(CAST(tf.tf AS DOUBLE) / df.df, 6) AS score
        FROM tf JOIN df ON tf.term = df.term
    )
    SELECT doc_id, term, score, CAST(rn AS INTEGER) AS rn FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
    doc="Per-document top-3 distinguishing terms by tf/df weighting "
        "(tf-idf family; the idf is the raw 1/df rarity factor rather "
        "than log(N/df) — one exact IEEE division instead of a "
        "transcendental whose libm last-ulp could differ across "
        "engines, which is what makes this hash-matchable; the top-k "
        "ORDER is the same monotone ranking within a doc for any "
        "fixed tf). Plan shape: tokenize-explode (narrow), two hash "
        "aggregates, then the document-frequency table joins back "
        "BROADCAST (vocabulary << corpus at scale), and the per-doc "
        "ranking window partitions on doc_id. The keyword-extraction "
        "primitive for corpus exploration / near-dup triage.",
)
def q96_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf").cast("double") / F.col("df"), 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "score", "rn")
    )


@query(
    "q109_repetition_signals",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents
    ), sig AS (
        SELECT doc_id,
               LEN(ws) AS n_words,
               LEN(LIST_DISTINCT(ws)) AS n_distinct,
               LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(ws),
                        w -> LEN(LIST_FILTER(ws, x -> x = w)))) AS top_count
        FROM toks
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(1.0 - CAST(n_distinct AS DOUBLE) / n_words AS DOUBLE) AS dup_word_frac,
           CAST(CAST(top_count AS DOUBLE) / n_words AS DOUBLE) AS top_word_frac,
           (1.0 - CAST(n_distinct AS DOUBLE) / n_words > 0.5
            OR CAST(top_count AS DOUBLE) / n_words > 0.2) AS repetitive
    FROM sig
    """,
    doc="Repetition-based quality signals (the Gopher/MassiveText "
        "repetition-filter family): per-document duplicate-word "
        "fraction and most-frequent-word mass, flagging documents "
        "whose token stream is degenerate boilerplate. Pure array "
        "expressions inside one narrow scan — the top-count is an "
        "in-array fold (distinct x count-occurrences), so no explode "
        "shuffle and no per-token state leaves the row; at 100 TB "
        "this stays embarrassingly parallel, and the two divisions "
        "are single IEEE ops replicated verbatim in the oracle.",
)
def q109_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    sig = docs.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_distinct"),
        F.array_max(
            F.transform(
                F.array_distinct(ws),
                lambda w: F.size(F.filter(ws, lambda x: x == w)),
            )
        ).alias("top_count"),
    )
    dup_frac = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_words")
    top_frac = F.col("top_count").cast("double") / F.col("n_words")
    return sig.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        dup_frac.alias("dup_word_frac"),
        top_frac.alias("top_word_frac"),
        ((dup_frac > 0.5) | (top_frac > 0.2)).alias("repetitive"),
    )


FUZZY_MAX_DIST = 3
Q_GRAM = 3
# q-gram count bound: strings within edit distance d share at least
# max_len - q + 1 - q*d q-grams (position shift <= d), which is >= 1
# whenever the LONGER string has at least q*(d+1) characters. Pairs
# where both names are shorter than this cannot be blocked on grams
# and fall back to a (tiny) short-x-short length-band join.
MIN_QGRAM_LEN = Q_GRAM * (FUZZY_MAX_DIST + 1)


@query(
    "q127_fuzzy_name_join",
    oracle=f"""
    WITH names AS (
        SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(LEVENSHTEIN(a.p_name, b.p_name) AS INTEGER) AS edit_dist,
           a.n_parts AS n_a, b.n_parts AS n_b
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= {FUZZY_MAX_DIST}
     AND LEVENSHTEIN(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    """,
    doc=f"Fuzzy string self-join (edit distance <= {FUZZY_MAX_DIST}) "
        "over catalog part names — the entity-resolution / "
        "catalog-canonicalization primitive. The join runs on the "
        "DISTINCT-name table (vocabulary-sized, Heaps-law small, not "
        "row-count-sized) with POSITIONAL Q-GRAM BLOCKING (round-4 "
        f"VERDICT.md item 6): candidates must share a {Q_GRAM}-gram "
        f"at positions differing <= {FUZZY_MAX_DIST} — complete for "
        "pairs whose longer name has >= q(d+1) chars by the q-gram "
        "count bound |shared| >= max_len - q + 1 - qd (Gravano et "
        "al., VLDB'01; same prefix-filter family as q51's PPJoin) — "
        "so the vocabulary never self-joins band-against-band; "
        "shorter names (none in this catalog) fall back to a "
        "short-x-short length-band join. The length band stays as a "
        "second filter before the quadratic levenshtein verify; "
        "candidate count is pytest-pinned below the band-only join's. "
        "Support counts per name ride along so downstream "
        "canonicalization can pick the majority spelling. Levenshtein "
        "is identically defined in both engines (unit-cost edits), so "
        "the pair set hash-matches.",
)
def q127_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    names = names.localCheckpoint(eager=True)  # feeds grams + 2 stat joins
    cand = fuzzy_qgram_candidates(names, "p_name")
    pairs = (
        cand.join(
            F.broadcast(names).withColumnRenamed("p_name", "name_a")
            .withColumnRenamed("n_parts", "n_a"),
            "name_a",
        )
        .join(
            F.broadcast(names).withColumnRenamed("p_name", "name_b")
            .withColumnRenamed("n_parts", "n_b"),
            "name_b",
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
            "n_a",
            "n_b",
        )
    )
    return pairs.filter(F.col("edit_dist") <= FUZZY_MAX_DIST)


def fuzzy_qgram_candidates(names: DataFrame, col: str) -> DataFrame:
    """Candidate (name_a < name_b) pairs for the edit-distance-d join
    via positional q-gram blocking: equi-join on the q-gram, keep
    matches whose positions differ <= d, apply the length band, dedup.
    Every true pair whose longer member has >= q(d+1) chars survives
    (count bound above); both-short pairs come from the fallback
    band join over the short subset alone."""
    # names shorter than Q_GRAM must not enter the generator at all:
    # Spark's sequence(1, 0) counts DOWN ([1, 0]), which would emit the
    # whole short string twice posing as q-grams at fake positions
    grams = (
        names.filter(F.length(col) >= Q_GRAM)
        .select(
            F.col(col).alias("name"),
            F.length(col).alias("len"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length({col}) - {Q_GRAM - 1}),"
                    f" i -> substring({col}, i, {Q_GRAM}))"
                )
            ).alias("pos", "gram"),
        )
    )
    # both sides of the gram self-join read this explode — materialize
    # once (the q150/q151 shared-lineage pattern for self-joins)
    grams = shared_lineage(grams)
    ga = grams.select(
        F.col("name").alias("name_a"), F.col("len").alias("len_a"),
        F.col("pos").alias("pos_a"), "gram",
    )
    gb = grams.select(
        F.col("name").alias("name_b"), F.col("len").alias("len_b"),
        F.col("pos").alias("pos_b"), "gram",
    )
    blocked = (
        ga.join(gb, "gram")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("pos_a") - F.col("pos_b")) <= FUZZY_MAX_DIST)
            & (F.abs(F.col("len_a") - F.col("len_b")) <= FUZZY_MAX_DIST)
            # gram blocking is only complete when the longer name has
            # >= q(d+1) chars; shorter pairs arrive via the fallback
            & (F.greatest("len_a", "len_b") >= MIN_QGRAM_LEN)
        )
        .select("name_a", "name_b")
        .distinct()
    )
    short = names.select(F.col(col).alias("name"), F.length(col).alias("len")).filter(
        F.col("len") < MIN_QGRAM_LEN
    )
    sa = short.select(F.col("name").alias("name_a"), F.col("len").alias("len_a"))
    sb = short.select(F.col("name").alias("name_b"), F.col("len").alias("len_b"))
    short_pairs = (
        sa.join(
            F.broadcast(sb),
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= FUZZY_MAX_DIST),
        )
        .select("name_a", "name_b")
    )
    return blocked.unionByName(short_pairs).distinct()


@query(
    "q145_entity_resolution",
    oracle=f"""
    WITH RECURSIVE names AS (
        SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
    ),
    pairs AS (
        SELECT a.p_name AS na, b.p_name AS nb
        FROM names a JOIN names b
          ON a.p_name < b.p_name
         AND ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= {FUZZY_MAX_DIST}
         AND LEVENSHTEIN(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    ),
    edges AS (
        SELECT na AS src, nb AS dst FROM pairs
        UNION ALL SELECT nb, na FROM pairs
        UNION ALL SELECT p_name, p_name FROM names
    ),
    reach AS (
        SELECT src AS node, src AS lbl FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node AS p_name, MIN(lbl) AS cluster FROM reach GROUP BY node),
    canon AS (
        SELECT cluster, p_name AS canonical, n_parts AS canon_support
        FROM (
            SELECT c.cluster, n.p_name, n.n_parts,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.cluster ORDER BY n.n_parts DESC, n.p_name
                   ) AS rn
            FROM comp c JOIN names n ON c.p_name = n.p_name
        ) WHERE rn = 1
    )
    SELECT c.p_name AS name, c.cluster, k.canonical,
           CAST(COUNT(*) OVER (PARTITION BY c.cluster) AS BIGINT) AS cluster_size
    FROM comp c JOIN canon k ON c.cluster = k.cluster
    """,
    doc="End-to-end entity resolution (the q104 composition pattern "
        "applied to strings): fuzzy name pairs (q127's banded "
        "levenshtein join) become an undirected graph, connected "
        "components (operators/graph.py's min-star contraction, run "
        "on xxhash64 node ids, relabeled to each cluster's MIN NAME "
        "so labels are engine-portable) merge transitive variants, "
        "and each cluster elects the majority spelling (support DESC, "
        "name ASC) as canonical — the catalog-canonicalization "
        "pipeline, hash-checked against one recursive-CTE oracle. "
        "Every stage is vocabulary-sized (distinct names, Heaps-law "
        "small), never row-count-sized; singleton names pass through "
        "as their own cluster via the identity edges.",
)
def q145_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from sklearn_raster_spark.operators.graph import connected_components

    part = read_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    names = names.localCheckpoint(eager=True)  # feeds pairs + canon + singleton union
    pairs = (
        fuzzy_qgram_candidates(names, "p_name")  # q127's blocking path
        .filter(F.levenshtein("name_a", "name_b") <= FUZZY_MAX_DIST)
        .select(F.col("name_a").alias("na"), F.col("name_b").alias("nb"))
    )
    # components on stable 64-bit ids (graph.py's fingerprint needs a
    # numeric min-semiring); names map back after
    edges = pairs.select(
        F.xxhash64("na").alias("src"), F.xxhash64("nb").alias("dst")
    )
    comp = connected_components(edges, src="src", dst="dst", assume_distinct=True)
    ids = names.select("p_name", F.xxhash64("p_name").alias("node"))
    labeled = ids.join(comp, "node", "left").select(
        "p_name", F.coalesce("component", F.col("node")).alias("hash_cluster")
    )
    # relabel clusters by MIN NAME (engine-portable, unlike hash order)
    cluster_name = labeled.groupBy("hash_cluster").agg(
        F.min("p_name").alias("cluster")
    )
    members = labeled.join(F.broadcast(cluster_name), "hash_cluster").select(
        "p_name", "cluster"
    )
    w = Window.partitionBy("cluster").orderBy(F.col("n_parts").desc(), "p_name")
    canon = (
        members.join(names, "p_name")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster", F.col("p_name").alias("canonical"))
    )
    wc = Window.partitionBy("cluster")
    return (
        members.join(F.broadcast(canon), "cluster")
        .select(
            F.col("p_name").alias("name"),
            "cluster",
            "canonical",
            F.count(F.lit(1)).over(wc).cast("bigint").alias("cluster_size"),
        )
    )
