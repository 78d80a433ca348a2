"""Boundary fixtures for the round-7 review findings.

The shipped testdata masks three edge cases by luck (no exact
session-gap boundaries; every document has >= 10 tokens). These tests
build tiny fixture dirs that contain exactly those cases and pin:

- q80: an event landing EXACTLY at the previous session end MERGES
  (Spark session_window semantics) and the DuckDB oracle now agrees
  (strict '>' new-session rule — it previously split at the boundary).
- q65: single-token / empty documents no longer crash the bigram
  transform (descending sequence(1, 0) + ANSI INVALID_ARRAY_INDEX).
- q52: sub-shingle-length documents no longer crash element_at and are
  dropped (a k-shingle needs k words), with longer docs unaffected.
"""

import os

import duckdb
import pytest

from sklearn_raster_spark.plans.registry import load_all_queries
from sklearn_raster_spark.sources import TABLES

from tests.oracle_utils import compare_query

BASE = "/root/testdata/sf0.001"


def _fixture_dir(tmp_path, overrides: dict[str, str]) -> str:
    """Symlink the sf0.001 tables into a tmp dir, overriding some with
    fixture SQL (DuckDB relation written as parquet)."""
    d = tmp_path / "sf_fixture"
    d.mkdir()
    con = duckdb.connect()
    for t in TABLES:
        if t in overrides:
            con.execute(
                f"COPY ({overrides[t]}) TO '{d / (t + '.parquet')}' (FORMAT PARQUET)"
            )
        else:
            os.symlink(f"{BASE}/{t}.parquet", d / f"{t}.parquet")
    con.close()
    return str(d)


def test_q80_exact_gap_boundary_merges(spark, tmp_path):
    """30-min-gap views at 00:00 and 00:30 merge into ONE session;
    purchase at 01:00 then a view at 02:00 (its exact 60-min end)
    merges too; an event past the end starts a new session."""
    events = """
        SELECT * FROM (VALUES
            (1, TIMESTAMP '2024-01-01 00:00:00', 7, 'view',     1.0, '{"k": 1}'),
            (2, TIMESTAMP '2024-01-01 00:30:00', 7, 'view',     1.0, '{"k": 1}'),
            (3, TIMESTAMP '2024-01-01 02:00:00', 7, 'purchase', 1.0, '{"k": 1}'),
            (4, TIMESTAMP '2024-01-01 03:00:00', 7, 'view',     1.0, '{"k": 1}'),
            (5, TIMESTAMP '2024-01-01 09:00:00', 7, 'view',     1.0, '{"k": 1}'),
            (6, TIMESTAMP '2024-01-01 00:00:00', 8, 'view',     1.0, '{"k": 1}'),
            (7, TIMESTAMP '2024-01-01 00:30:00', 8, 'click',    1.0, '{"k": 1}')
        ) AS t(event_id, ts, user_id, event_type, value, props)
    """
    sf = _fixture_dir(tmp_path, {"events": events})
    # value-level parity on the boundary fixture (would have
    # hash-mismatched before the oracle's >= -> > fix)
    compare_query(spark, sf, "q80_dynamic_session_window")
    rows = sorted(
        (r["user_id"], r["n_events"])
        for r in load_all_queries()["q80_dynamic_session_window"]
        .fn(spark, sf)
        .collect()
    )
    # user 7: [e1+e2 merged at the exact 30-min boundary], then
    # [purchase@02:00 whose 60-min end 03:00 absorbs e4 exactly at the
    # boundary], then [e5 alone]; user 8: one boundary-merged session
    assert rows == [(7, 1), (7, 2), (7, 2), (8, 2)]


DOCS_SHORT = """
    SELECT * FROM (VALUES
        (1, '', 'en', 'web', 0),
        (2, 'hello', 'en', 'web', 5),
        (3, 'one two', 'en', 'web', 7),
        (4, 'alpha beta gamma delta alpha beta gamma delta alpha beta gamma delta', 'en', 'web', 69),
        (5, 'alpha beta gamma delta alpha beta gamma delta alpha beta gamma delta', 'en', 'web', 69)
    ) AS t(doc_id, text, lang, source, n_chars)
"""


def test_q65_bigrams_survive_short_docs(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"documents": DOCS_SHORT})
    # crashes with INVALID_ARRAY_INDEX before the size(ws) >= 2 guard;
    # value-parity (threshold 10 never met here, so compare the
    # unfiltered bigram counts via the registry query plus oracle)
    compare_query(spark, sf, "q65_bigram_counts")


DOCS_NULL = """
    SELECT * FROM (VALUES
        (1, NULL,                                 'en', 'web',  NULL),
        (2, NULL,                                 'de', 'web',  NULL),
        (3, '',                                   'en', 'web',  0),
        (4, 'alpha beta gamma delta epsilon zeta','en', 'web',  35),
        (5, 'alpha beta gamma delta epsilon zeta','en', 'web',  35),
        (6, 'zeta epsilon delta gamma beta alpha','de', 'feed', 35),
        (7, 'one two three four five six seven',  'en', 'feed', 33)
    ) AS t(doc_id, text, lang, source, n_chars)
"""

NULL_TEXT_ORACLE_QUERIES = (
    "q70_multimodal_features",
    "q76_grouped_agg_pandas_udaf",
    "q78_udtf_lateral_trigrams",
    "q81_multimodal_frame_sample",
    "q82_multimodal_resize",
    "q115_audio_window_energy",
    "q151_simhash_portable",
    "q152_binaryfile_source",
    "q156_grouped_model_fit",
    "q158_grouped_model_score",
)


@pytest.mark.parametrize("name", NULL_TEXT_ORACLE_QUERIES)
def test_null_and_empty_text_value_parity(spark, tmp_path, name):
    """Round-8 random-instance-fuzz class: NULL-text and empty-string
    documents (inevitable in a real crawl corpus) must neither crash a
    kernel (bytes(None), int(NaN), text.split on None) nor silently
    diverge from SQL NULL semantics (NaN->int64 garbage in the q76
    UDAF, the constant simhash fingerprint banding all NULL docs in
    q151, the spurious empty frame/window for '' payloads in
    q81/q115's old truncating-division oracle bound). Each query is
    value-compared against its DuckDB oracle on a fixture that is
    mostly NULL/'' docs."""
    sf = _fixture_dir(tmp_path, {"documents": DOCS_NULL})
    compare_query(spark, sf, name)


EMB_NULL = """
    SELECT CAST(x AS BIGINT) AS vec_id,
           CASE WHEN x % 7 = 3 THEN NULL
                ELSE LIST_TRANSFORM(RANGE(64),
                     i -> CAST(ROUND(SIN(x * 64 + i) , 3) AS FLOAT))
           END AS embedding,
           CASE WHEN x % 11 = 5 THEN NULL
                ELSE CAST(x % 10 AS INTEGER) END AS label
    FROM range(120) t(x)
"""

EVENTS_NULL_VALUE = """
    SELECT CAST(x AS BIGINT) AS event_id,
           TIMESTAMP '2024-01-01 00:00:00'
               + INTERVAL (x * 7 % 1000) MINUTE AS ts,
           CAST(x % 5 AS BIGINT) AS user_id,
           ['view', 'click', 'purchase', 'signup', 'error'][1 + x % 5] AS event_type,
           CASE WHEN x % 6 = 2 THEN NULL
                ELSE ROUND(CAST(x * 37 % 10000 AS DOUBLE) / 100.0, 2) END AS value,
           '{"k": ' || CAST(x % 100 AS VARCHAR) || '}' AS props
    FROM range(400) t(x)
"""

NULL_EMBEDDING_ORACLE_QUERIES = (
    "q55_knn_cosine_bruteforce",
    "q57_embedding_neardup",
    "q67_inverse_transform_roundtrip",
    "q68_raster_stack_source",
    "q100_bounded_neardup",
    "q112_embedding_quantize",
    "q128_maxsim_late_interaction",
    "q155_ann_signlsh_portable",
    "q157_ann_ivf_portable",
    "q160_pq_adc_portable",
)


@pytest.mark.parametrize("name", NULL_EMBEDDING_ORACLE_QUERIES)
def test_null_embedding_value_parity(spark, tmp_path, name):
    """Round-8 fuzz class two: NULL embeddings (failed embedding jobs
    leave holes in any real vector table). Every similarity / ANN /
    quantize / raster consumer must drop them at the scan on BOTH
    sides — an unfiltered NULL either crashes a DuckDB list fold
    (LIST_ZIP(NULL, NULL) -> empty-list reduce), crashes the driver's
    dense matrix build, or — subtlest — produces NULL scores that sort
    FIRST in Spark and LAST in DuckDB, silently diverging every top-k
    cut."""
    sf = _fixture_dir(tmp_path, {"embeddings": EMB_NULL})
    compare_query(spark, sf, name)


EVENTS_NULL_KEYS = """
    SELECT CAST(x AS BIGINT) AS event_id,
           TIMESTAMP '2024-01-01 00:00:00'
               + INTERVAL (x * 13 % 2000) MINUTE AS ts,
           CASE WHEN x % 9 = 4 THEN NULL ELSE CAST(x % 5 AS BIGINT) END AS user_id,
           CASE WHEN x % 11 = 7 THEN NULL
                ELSE ['view', 'click', 'purchase', 'signup', 'error'][1 + x % 5]
           END AS event_type,
           CASE WHEN x % 6 = 2 THEN NULL
                ELSE ROUND(CAST(x * 37 % 10000 AS DOUBLE) / 100.0, 2) END AS value,
           '{"k": ' || CAST(x % 100 AS VARCHAR) || '}' AS props
    FROM range(400) t(x)
"""


@pytest.mark.parametrize(
    "name",
    [
        "q31_asof_join",
        "q59_stateful_running_agg",
        "q110_outlier_flags",
        "q113_scd2_intervals",
    ],
)
def test_null_event_keys_value_parity(spark, tmp_path, name):
    """Round-8 fuzz class four: NULL user_id / event_type (unattributed
    or malformed events). The as-of union-sort used to MATCH NULL keys
    (SQL equality never does — right rows with NULL key/time now drop);
    the SCD2 run-boundary flag needed null-safe inequality (a plain <>
    yielded NULL, absorbing NULL-type rows into neighboring runs and
    tying (user, run_id)); the stateful kernel crashed on int(NaN) for
    the NULL key group; and q110's variance math hit engine-specific
    DECIMAL-overflow rounding (now double-first on both sides)."""
    sf = _fixture_dir(tmp_path, {"events": EVENTS_NULL_KEYS})
    compare_query(spark, sf, name)


@pytest.mark.parametrize(
    "name", ["q142_rolling_median_udwf", "q148_rolling_median_jvm"]
)
def test_null_event_value_rolling_median_parity(spark, tmp_path, name):
    """Round-8 fuzz class three: NULL event values inside a rolling
    ROWS frame. SQL MEDIAN skips NULLs; the pandas UDWF used to turn
    NaN into INT64_MIN via to_numpy(int64), and the JVM twin indexed
    the sorted frame by ROW count instead of non-NULL count."""
    sf = _fixture_dir(tmp_path, {"events": EVENTS_NULL_VALUE})
    compare_query(spark, sf, name)


def test_null_text_simhash_rows_only_backend(spark, tmp_path):
    """q53 (the xxhash64 simhash, rows-only) shares q151's fix: NULL
    docs carry no fingerprint, so the only near-dup pair left is the
    exact-duplicate (4, 5) — before the filter, docs 1 and 2 banded
    together on the constant fold value."""
    sf = _fixture_dir(tmp_path, {"documents": DOCS_NULL})
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in load_all_queries()["q53_simhash_neardup"].fn(spark, sf).collect()
    }
    assert (4, 5) in pairs
    assert all(a not in (1, 2) and b not in (1, 2) for a, b in pairs)


def test_q52_minhash_survives_short_docs(spark, tmp_path):
    sf = _fixture_dir(tmp_path, {"documents": DOCS_SHORT})
    q52 = load_all_queries()["q52_minhash_lsh_pairs"]
    # crashed with INVALID_ARRAY_INDEX_IN_ELEMENT_AT before the
    # size(words) >= shingle pre-filter; docs 4/5 are identical
    # 12-word texts, so the banding must still pair them
    pairs = {(r["doc_a"], r["doc_b"]) for r in q52.fn(spark, sf).collect()}
    assert (4, 5) in pairs
    # sub-shingle docs carry no k-shingles: never in any pair
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in pairs)


EVENTS_ZERO_VARIANCE = """
    SELECT CAST(x AS BIGINT) AS event_id,
           TIMESTAMP '2024-01-01 00:00:00'
               + INTERVAL (x * 7 % 1000) MINUTE AS ts,
           CAST(x % 5 AS BIGINT) AS user_id,
           CASE WHEN x = 0 THEN 'singleton'
                WHEN x % 3 = 0 THEN 'constant'
                ELSE ['view', 'click', 'purchase'][1 + x % 3] END AS event_type,
           CASE WHEN x = 0 THEN 12.34
                WHEN x % 3 = 0 THEN 41.99
                ELSE ROUND(CAST(x * 37 % 10000 AS DOUBLE) / 100.0, 2) END AS value,
           '{"k": 1}' AS props
    FROM range(300) t(x)
"""


def test_q110_zero_variance_groups_yield_null_zscore(spark, tmp_path):
    """Round-9 ADVICE (high): the double-first variance n*s2 - s1*s1
    rounds to a tiny NEGATIVE for zero-variance and single-row groups.
    Un-clamped, DuckDB's SQRT hard-errors (Out of Range) while Spark
    returns NaN and flags EVERY row of the group is_outlier=true (NaN
    > 3 is true in Spark). GREATEST(.., 0) on both sides restores the
    documented degenerate-group contract: std == 0 -> NULLIF -> NULL
    zscore. The fixture has a 100-row constant-value group and a
    single-row group; value-compared against the DuckDB oracle, plus a
    direct NULL-zscore assertion so the contract is pinned even if the
    oracle text drifts."""
    sf = _fixture_dir(tmp_path, {"events": EVENTS_ZERO_VARIANCE})
    compare_query(spark, sf, "q110_outlier_flags")
    rows = (
        load_all_queries()["q110_outlier_flags"]
        .fn(spark, sf)
        .filter("event_type IN ('constant', 'singleton')")
        .collect()
    )
    assert len(rows) > 50
    assert all(r["zscore"] is None and r["is_outlier"] is None for r in rows)


EVENTS_NULLKEY_MAX = """
    SELECT CAST(x AS BIGINT) AS event_id,
           TIMESTAMP '2024-01-01 00:00:00'
               + INTERVAL (x * 11 % 3000) MINUTE AS ts,
           CASE WHEN x = 399 THEN NULL ELSE CAST(x % 4 AS BIGINT) END AS user_id,
           CASE WHEN x % 3 = 0 THEN 'click'
                WHEN x % 3 = 1 THEN 'purchase'
                ELSE 'view' END AS event_type,
           1.0 AS value, '{"k": 1}' AS props
    FROM range(400) t(x)
    UNION ALL
    -- the stream's MAX purchase timestamp belongs to a NULL-key row
    SELECT 9999, TIMESTAMP '2024-01-03 12:00:00', NULL, 'purchase', 1.0, '{"k": 1}'
"""


def test_q154_nullkey_purchase_cannot_extend_emitted_prefix(spark, tmp_path):
    """Round-9 fuzz finding (seed 101): Catalyst infers
    isnotnull(p_user_id) from the outer-join condition and pushes it
    BELOW the purchases watermark node, so a NULL-key purchase carrying
    the stream's max ts advanced the CUTOFF contract but not the
    WATERMARK — the newest unmatched clicks silently vanished from the
    availableNow run (rowcount 199 vs 203). The cutoff now excludes
    NULL-key purchases on both sides; this fixture makes the stream max
    a NULL-key purchase deliberately."""
    sf = _fixture_dir(tmp_path, {"events": EVENTS_NULLKEY_MAX})
    compare_query(spark, sf, "q154_stream_outer_join")


DOCS_UNICODE = """
    SELECT CAST(x AS BIGINT) AS doc_id,
           CASE WHEN x % 7 = 0 THEN NULL
                WHEN x % 7 = 1 THEN ''
                WHEN x % 3 = 0 THEN 'café straße 中文词 ño🦜 доклад w' || CAST(x % 5 AS VARCHAR)
                WHEN x % 3 = 1 THEN 'plain ascii words w' || CAST(x % 5 AS VARCHAR) || ' again'
                ELSE '🦜🦜 emoji heavy 🦜 doc w' || CAST(x % 5 AS VARCHAR)
           END AS text,
           ['en', 'de', 'zh'][1 + x % 3] AS lang,
           'src' || CAST(x % 4 AS VARCHAR) AS source,
           CAST(length(CASE WHEN x % 7 = 0 THEN NULL
                WHEN x % 7 = 1 THEN ''
                WHEN x % 3 = 0 THEN 'café straße 中文词 ño🦜 доклад w' || CAST(x % 5 AS VARCHAR)
                WHEN x % 3 = 1 THEN 'plain ascii words w' || CAST(x % 5 AS VARCHAR) || ' again'
                ELSE '🦜🦜 emoji heavy 🦜 doc w' || CAST(x % 5 AS VARCHAR)
           END) AS BIGINT) AS n_chars
    FROM range(160) t(x)
"""

UNICODE_PAYLOAD_QUERIES = (
    "q70_multimodal_features",
    "q81_multimodal_frame_sample",
    "q82_multimodal_resize",
    "q115_audio_window_energy",
    "q161_image_decode_features",
    "q162_audio_decode_features",
)


@pytest.mark.parametrize("name", UNICODE_PAYLOAD_QUERIES)
def test_unicode_payload_value_parity(spark, tmp_path, name):
    """Round-9 fuzz axis: MULTIBYTE text (accented latin / CJK / emoji)
    in every payload kernel. Byte slicing used to split utf-8 sequences
    across frame boundaries (decode crash) and diverge from char-based
    SQL SUBSTR/LENGTH; codepoints like U+1F99C overflow INT32 when
    squared; and the media materializer's text<->pixel encoding is only
    faithful for byte==char docs. Kernels now operate in DECODED units
    (chars/codepoints), q70 pins byte semantics via OCTET_LENGTH, and
    q161/q162 gate assets to ASCII docs on both sides."""
    sf = _fixture_dir(tmp_path, {"documents": DOCS_UNICODE})
    compare_query(spark, sf, name)


EMB_NONFINITE = """
    SELECT CAST(x AS BIGINT) AS vec_id,
           CASE WHEN x % 13 = 3 THEN NULL
                ELSE LIST_TRANSFORM(RANGE(64),
                     i -> CASE WHEN x % 5 = 0 AND i = x % 64
                               THEN (['NaN', 'Infinity', '-Infinity'][1 + x % 3])::FLOAT
                               ELSE CAST(ROUND(SIN(x * 64 + i), 3) AS FLOAT) END)
           END AS embedding,
           CASE WHEN x % 11 = 5 THEN NULL
                ELSE CAST(x % 10 AS INTEGER) END AS label
    FROM range(130) t(x)
"""


@pytest.mark.parametrize(
    "name",
    [
        "q67_inverse_transform_roundtrip",
        "q112_embedding_quantize",
        "q128_maxsim_late_interaction",
        # q68 takes the OTHER branch of the contract: NaN elements are
        # raster float-nodata, so the vector stays in the grid and the
        # NaN cell surfaces as SQL NULL (missing) on both sides
        "q68_raster_stack_source",
    ],
)
def test_nonfinite_embedding_value_parity(spark, tmp_path, name):
    """Round-9 fuzz axis: NaN/+-Inf ELEMENTS inside otherwise-valid
    vectors (overflowed embedding jobs). Un-filtered, a NaN element
    made DuckDB's INT cast hard-error where Spark yields NULL (q112),
    poisoned qnrm/cnrm cosine scores (q128), and absorbed into the
    driver-side scaler stats flagging every round-trip false (q67).
    Invalid vectors now drop at the scan on both sides
    (utils/vectors.py contract); 1-in-5 vectors here carry one."""
    sf = _fixture_dir(tmp_path, {"embeddings": EMB_NONFINITE})
    compare_query(spark, sf, name)
