"""The custom Python Data Source connector (sources/pyds.py, Spark 4
SPARK-44076): write/read round trip, filter pushdown, shard-range
pruning, unsupported-filter handoff, and the upstream plan-cache
caveat."""

import gzip
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
    StringStartsWith,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from sklearn_raster_spark.sources.pyds import (
    JsonlShardsReader,
    _shard_range,
    register_jsonl_shards,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _write_shards(spark, tmp_path, rows):
    register_jsonl_shards(spark)
    df = spark.createDataFrame(rows, SCHEMA).repartitionByRange(3, "doc_id")
    df.write.format("jsonl_shards").option("path", str(tmp_path)).mode(
        "append"
    ).save()
    return str(tmp_path)


def _rows(n=60):
    # multibyte text included: the round trip must keep it exact
    texts = ["plain ascii", "héllo wörld", "日本語テキスト", "emoji 🦜🧪", None]
    return [
        (i, texts[i % len(texts)], "en" if i % 3 else "fr", "web", i * 7)
        for i in range(n)
    ]


def test_roundtrip_and_multibyte(spark, tmp_path):
    path = _write_shards(spark, tmp_path / "s", _rows())
    back = (
        spark.read.format("jsonl_shards").option("path", path).load()
    ).collect()
    assert len(back) == 60
    by_id = {r["doc_id"]: r for r in back}
    for i, text, lang, source, n_chars in _rows():
        r = by_id[i]
        assert (r["text"], r["lang"], r["source"], r["n_chars"]) == (
            text, lang, source, n_chars,
        )
    # shard filenames carry doc_id ranges and they tile the id space
    files = sorted(f for f in os.listdir(path) if f.endswith(".jsonl.gz"))
    ranges = [_shard_range(f) for f in files]
    assert all(r is not None for r in ranges)
    assert sorted(lo for lo, _ in ranges)[0] == 0
    assert max(hi for _, hi in ranges) == 59


def test_reader_pushdown_prunes_shards(spark, tmp_path):
    path = _write_shards(spark, tmp_path / "s", _rows())
    r = JsonlShardsReader(SCHEMA, {"path": path})
    unsupported = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 40),
                IsNotNull(("text",)),
                StringStartsWith(("lang",), "e"),  # not ours
            ]
        )
    )
    # unsupported filters are handed back for Spark to evaluate
    assert len(unsupported) == 1 and isinstance(unsupported[0], StringStartsWith)
    all_shards = sorted(
        f for f in os.listdir(path) if f.endswith(".jsonl.gz")
    )
    kept = r.partitions()
    assert 0 < len(kept) < len(all_shards)  # real elision happened
    # rows from kept shards still satisfy the row-level re-check
    # (read yields Arrow RecordBatches — the API's fast path)
    got = [
        rec
        for p in kept
        for batch in r.read(p)
        for rec in batch.to_pylist()
    ]
    assert got and all(
        rec["doc_id"] >= 40 and rec["text"] is not None for rec in got
    )


def test_pushdown_equality_with_sql(spark, tmp_path):
    path = _write_shards(spark, tmp_path / "s", _rows())

    def fresh():
        return spark.read.format("jsonl_shards").option("path", path).load()

    pruned = fresh().filter(
        (F.col("doc_id") >= 15) & (F.col("doc_id") < 45) & F.col("text").isNotNull()
    )
    expect = [r for r in _rows() if 15 <= r[0] < 45 and r[1] is not None]
    assert sorted(r["doc_id"] for r in pruned.collect()) == sorted(
        r[0] for r in expect
    )
    # equality filter prunes to (at most) one shard and returns the row
    one = fresh().filter(F.col("doc_id") == 17).collect()
    assert len(one) == 1 and one[0]["n_chars"] == 17 * 7


def test_fresh_loads_are_isolated(spark, tmp_path):
    """The upstream plan-cache caveat (pyds.py docstring): fresh
    .load() handles never see one another's pushdown."""
    path = _write_shards(spark, tmp_path / "s", _rows())

    def fresh():
        return spark.read.format("jsonl_shards").option("path", path).load()

    assert fresh().count() == 60
    assert fresh().filter(F.col("doc_id") >= 40).count() == 20
    assert fresh().count() == 60  # not poisoned by the pruned plan


def test_foreign_and_empty_shards(spark, tmp_path):
    path = str(tmp_path / "s")
    os.makedirs(path)
    # a foreign file without the range suffix stays readable (unprunable)
    with gzip.open(os.path.join(path, "foreign.jsonl.gz"), "wt") as f:
        f.write(json.dumps({"doc_id": 999, "text": "x", "lang": "en",
                            "source": "w", "n_chars": 1}) + "\n")
    register_jsonl_shards(spark)
    df = spark.read.format("jsonl_shards").option("path", path).load()
    assert df.count() == 1
    assert df.filter(F.col("doc_id") >= 1000).count() == 0
    # an empty dir scans as zero rows, not an error
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    assert (
        spark.read.format("jsonl_shards").option("path", empty).load().count()
        == 0
    )


def test_stream_reader_incremental_offsets(spark, tmp_path):
    """The connector's streaming half: offsets advance with the sorted
    listing; availableNow drains exactly the rows present; a SECOND
    run from a fresh checkpoint picks up shards added in between."""
    path = _write_shards(spark, tmp_path / "s", _rows(30))

    def drain(sink):
        stream = (
            spark.readStream.format("jsonl_shards").option("path", path).load()
        )
        agg = stream.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum"),
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return spark.table(sink).collect()[0]

    first = drain("pyds_stream_sink_a")
    assert first["n"] == 30 and first["id_sum"] == sum(range(30))

    # land more shards, then a fresh stream sees old + new
    df2 = spark.createDataFrame(
        [(100 + i, "late", "en", "web", 4) for i in range(5)], SCHEMA
    )
    df2.write.format("jsonl_shards").option("path", path).mode("append").save()
    second = drain("pyds_stream_sink_b")
    assert second["n"] == 35
    assert second["id_sum"] == sum(range(30)) + sum(range(100, 105))
