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


def test_overwrite_replaces_and_staged_files_invisible(spark, tmp_path):
    """mode('overwrite') actually replaces the live shard set (it used
    to silently append — ADVICE r10), and hidden staged files are never
    read."""
    path = _write_shards(spark, tmp_path / "s", _rows(20))
    # an inert staged leftover (a dead task attempt) must stay invisible
    with gzip.open(os.path.join(path, ".staged-deadattempt.tmp"), "wt") as f:
        f.write(json.dumps({"doc_id": 10**6, "text": "ghost", "lang": "xx",
                            "source": "w", "n_chars": 5}) + "\n")
    df2 = spark.createDataFrame(
        [(500 + i, "fresh", "de", "web", 9) for i in range(4)], SCHEMA
    )
    df2.write.format("jsonl_shards").option("path", path).mode(
        "overwrite"
    ).save()
    back = spark.read.format("jsonl_shards").option("path", path).load()
    ids = sorted(r["doc_id"] for r in back.collect())
    assert ids == [500, 501, 502, 503]  # old 20 rows gone, ghost unseen


def test_append_keeps_existing(spark, tmp_path):
    path = _write_shards(spark, tmp_path / "s", _rows(10))
    df2 = spark.createDataFrame([(999, "x", "en", "web", 1)], SCHEMA)
    df2.write.format("jsonl_shards").option("path", path).mode("append").save()
    assert (
        spark.read.format("jsonl_shards").option("path", path).load().count()
        == 11
    )


def _corrupt_dir(tmp_path) -> str:
    """Hand-built corrupt shard dir: 3 valid rows + one garbage line +
    one type-invalid line + one non-object line, plus a raw-bytes
    impostor shard."""
    path = str(tmp_path / "corrupt")
    os.makedirs(path)
    with gzip.open(os.path.join(path, "part-0-a.0-5.jsonl.gz"), "wt") as f:
        f.write(json.dumps({"doc_id": 0, "text": "ok0", "lang": "en",
                            "source": "w", "n_chars": 3}) + "\n")
        f.write('{"doc_id": broken\n')  # unparseable
        f.write(json.dumps({"doc_id": 2, "text": "ok2", "lang": "en",
                            "source": "w", "n_chars": 3}) + "\n")
        f.write(json.dumps({"doc_id": 3, "text": "bad", "lang": "en",
                            "source": "w", "n_chars": "NaN-ish"}) + "\n")
        f.write("[1, 2, 3]\n")  # non-object
        f.write(json.dumps({"doc_id": 5, "text": "ok5", "lang": "en",
                            "source": "w", "n_chars": 3}) + "\n")
    with open(os.path.join(path, "part-1-impostor.9-9.jsonl.gz"), "wb") as f:
        f.write(b"\xffnot gzip\x00" * 8)
    return path


def test_permissive_skips_strict_raises(spark, tmp_path):
    path = _corrupt_dir(tmp_path)
    register_jsonl_shards(spark)
    ok = (
        spark.read.format("jsonl_shards")
        .option("path", path)
        .option("mode", "permissive")
        .load()
        .collect()
    )
    assert sorted(r["doc_id"] for r in ok) == [0, 2, 5]
    with pytest.raises(Exception, match="corrupt|type-invalid|non-object"):
        (
            spark.read.format("jsonl_shards")
            .option("path", path)
            .load()  # strict is the default
            .collect()
        )


def test_bounded_line_guard(tmp_path):
    """A gzip-bomb 'line' larger than the 16 MiB plausibility bound is
    rejected without materializing it; in permissive mode the NEXT line
    still decodes (decoder-level test, no Spark job needed)."""
    from sklearn_raster_spark.sources.pyds import (
        _MAX_LINE_BYTES,
        _decode_shard_batches,
    )

    shard = str(tmp_path / "bomb.0-1.jsonl.gz")
    with gzip.open(shard, "wt") as f:
        f.write(json.dumps({"doc_id": 0, "text": "pre", "lang": "en",
                            "source": "w", "n_chars": 3}) + "\n")
        f.write('{"text": "' + "a" * (_MAX_LINE_BYTES + 1024) + '"}\n')
        f.write(json.dumps({"doc_id": 1, "text": "post", "lang": "en",
                            "source": "w", "n_chars": 4}) + "\n")
    batches = list(_decode_shard_batches(shard, SCHEMA, permissive=True))
    ids = [v for b in batches for v in b.column("doc_id").to_pylist()]
    assert ids == [0, 1]
    with pytest.raises(ValueError, match="exceeds"):
        list(_decode_shard_batches(shard, SCHEMA, permissive=False))


def test_stream_offset_is_content_based(spark, tmp_path):
    """A straggler shard landing mid-stream whose name sorts BEFORE
    already-consumed names (uuids give no ordering guarantee) must be
    read by the next micro-batch, not silently skipped — the ADVICE r10
    positional-offset bug. Same checkpoint across both runs."""
    path = _write_shards(spark, tmp_path / "s", _rows(12))
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        # parquet sink: the memory sink cannot recover from a
        # checkpoint, and a durable sink also asserts exactly-once
        stream = (
            spark.readStream.format("jsonl_shards").option("path", path).load()
        )
        q = (
            stream.select("doc_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return sorted(r["doc_id"] for r in spark.read.parquet(out).collect())

    assert drain() == list(range(12))
    # "aaa..." sorts before every "part-..." shard already consumed
    with gzip.open(os.path.join(path, "aaa-straggler.1000-1001.jsonl.gz"),
                   "wt") as f:
        for i in (1000, 1001):
            f.write(json.dumps({"doc_id": i, "text": "late", "lang": "en",
                                "source": "w", "n_chars": 4}) + "\n")
    # second run resumes from the checkpointed name-set offset: it must
    # deliver exactly the straggler rows, exactly once
    assert drain() == list(range(12)) + [1000, 1001]


def test_legacy_positional_offset_rejected():
    from sklearn_raster_spark.sources.pyds import JsonlShardsStreamReader

    with pytest.raises(ValueError, match="legacy"):
        JsonlShardsStreamReader._names({"pos": 3})
    assert JsonlShardsStreamReader._names({"names": ["a", "b"]}) == ["a", "b"]
