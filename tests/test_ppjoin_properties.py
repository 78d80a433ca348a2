"""Property-based completeness tests for the PPJoin prefix-filter
machinery (q51 self-join, q122 batch-vs-corpus): on randomized
corpora, the pruned candidate pipeline must return EXACTLY the
brute-force Jaccard pair set — prefix/length/positional filters are
only ever allowed to drop pairs that cannot qualify.

The driver fixture is one (degenerate, small-vocab) distribution;
these tests sweep random corpora so a filter bug that happens to be
masked by that distribution cannot hide.
"""

import itertools
import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sklearn_raster_spark.plans.registry import load_all_queries

VOCAB = [f"w{i}" for i in range(12)]  # small vocab -> dense overlaps

doc_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10),
    min_size=2,
    max_size=14,
)


def _write_docs(tmpdir: str, docs: list[list[str]]) -> str:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
            "lang": ["en"] * len(docs),
            "source": ["src0"] * len(docs),
            "n_chars": [len(" ".join(d)) for d in docs],
        }
    )
    pdf.to_parquet(os.path.join(tmpdir, "documents.parquet"))
    return tmpdir


def _brute_pairs(docs: list[list[str]], threshold: float):
    sets = [set(d) for d in docs]
    out = set()
    for a, b in itertools.combinations(range(len(docs)), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= threshold:
            out.add((a, b))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=doc_strategy)
def test_q51_ppjoin_equals_bruteforce(spark, tmp_path_factory, docs):
    tmpdir = str(tmp_path_factory.mktemp("ppjoin"))
    _write_docs(tmpdir, docs)
    got = load_all_queries()["q51_jaccard_pairs"].fn(spark, tmpdir).toPandas()
    got_pairs = set(zip(got.doc_a, got.doc_b))
    assert got_pairs == _brute_pairs(docs, 0.6)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=doc_strategy)
def test_q122_incremental_equals_bruteforce(spark, tmp_path_factory, docs):
    from sklearn_raster_spark.operators.corpus import INC_BUCKET, INC_JACCARD
    from sklearn_raster_spark.operators.pipeline import hash_bucket  # noqa: F401

    tmpdir = str(tmp_path_factory.mktemp("incdedup"))
    _write_docs(tmpdir, docs)
    got = load_all_queries()["q122_incremental_dedup"].fn(spark, tmpdir).toPandas()

    # recompute the same hash split in pandas (md5 6-hex prefix mod 100)
    import hashlib

    def bucket(v: int) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:6], 16) % 100

    inc = [i for i in range(len(docs)) if bucket(i) >= INC_BUCKET]
    cor = [i for i in range(len(docs)) if bucket(i) < INC_BUCKET]
    sets = [set(d) for d in docs]
    assert set(got.doc_id) == set(inc)
    for _, row in got.iterrows():
        i = row.doc_id
        n_near = 0
        for c in cor:
            inter = len(sets[i] & sets[c])
            union = len(sets[i] | sets[c])
            if union and inter / union >= INC_JACCARD:
                n_near += 1
        assert row.n_near == n_near, (i, row.n_near, n_near)
        exact = any(" ".join(docs[i]) == " ".join(docs[c]) for c in cor)
        expect = "dup_exact" if exact else ("dup_near" if n_near else "new")
        assert row.verdict == expect, (i, row.verdict, expect)
