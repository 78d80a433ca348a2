"""A complete custom connector on the Spark 4 Python Data Source API
(SPARK-44076): gzip-JSONL document shards with write, read, FILTER
PUSHDOWN, and shard-level partition PRUNING.

The reference ingests from format-specific loaders (reference
``src/sklearn_raster/datasets/_base.py:71-104``); the Spark-first
counterpart of "add a new ingest format" is a DataSource subclass the
session registers once — after that ``spark.read.format(...)`` /
``df.write.format(...)`` plan it like any built-in connector. This
module exercises every piece of the API that matters at 100 TB:

- **Writer** (``JsonlShardsWriter``): each task serializes its
  partition to one ``part-<pid>-<uuid>.<min>-<max>.jsonl.gz`` shard —
  data never visits the driver; the doc_id min/max ride in the
  FILENAME so readers can prune without opening files (the parquet
  row-group-statistics idea at file granularity). Commit messages
  carry the shard names; ``abort()`` removes the partials.
- **Reader** (``JsonlShardsReader``): one InputPartition per shard.
  ``pushFilters`` accepts doc_id comparisons (=, <, <=, >, >=) and
  IsNotNull; ``partitions()`` drops every shard whose embedded
  [min, max] range cannot satisfy them — Catalyst hands the
  predicate down, the connector turns it into I/O elision, exactly
  what predicate pushdown is for. Accepted filters are ALSO
  re-applied row-level during ``read`` (pruning is necessary, not
  sufficient); everything else is returned to Spark unsupported, so
  correctness never depends on the connector's cleverness.

Values survive the JSON round trip exactly: doc_id/n_chars are
integers, text/lang/source are strings (json.dumps with
ensure_ascii=False keeps multibyte text byte-identical in utf-8).
q169 drive-grades write -> prune -> read against plain SQL over the
same documents.

CAVEAT (pinned in tests/test_pyds.py): pyspark 4.1 caches a Python
data source's planned read (reader + partitions) on the loaded
relation, and a LATER pushdown on the SAME ``.load()`` handle can
poison an earlier-planned unfiltered scan of it (pruned-first, then
full ⇒ the full scan reuses the pruned read info and silently drops
rows). Fresh ``.load()`` calls are fully isolated — take a new handle
per filter context (they cost only an options dict). Every engine
query does exactly that.
"""

from __future__ import annotations

import gzip
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    DataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_DEFAULT_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


@dataclass
class _ShardPartition(InputPartition):
    path: str


@dataclass
class _ShardCommit(WriterCommitMessage):
    filename: str


def _shard_range(filename: str) -> tuple[int, int] | None:
    """Parse the embedded doc_id [min, max] out of
    ``part-<pid>-<uuid>.<min>-<max>.jsonl.gz`` (None when absent —
    foreign files stay readable, just unprunable)."""
    base = os.path.basename(filename)
    try:
        stem = base[: -len(".jsonl.gz")]
        lo, hi = stem.rsplit(".", 1)[1].split("-")
        return int(lo), int(hi)
    except (IndexError, ValueError):
        return None


class JsonlShardsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.spark_schema = schema
        self.fields = [f.name for f in schema.fields]
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires a path option")
        self.bounds: list[tuple[str, str, int]] = []  # (op, col, value)
        self.not_null: list[str] = []

    def pushFilters(self, filters: list[Filter]):
        # accept doc_id comparisons (they prune shards via the
        # filename ranges) + IsNotNull on any column; hand everything
        # else back to Spark untouched. Returns an eager list — a
        # lazy generator would defer the self.bounds appends past the
        # point Spark calls partitions().
        unsupported = []
        for f in filters:
            if (
                isinstance(
                    f,
                    (EqualTo, GreaterThan, GreaterThanOrEqual,
                     LessThan, LessThanOrEqual),
                )
                and f.attribute == ("doc_id",)
                and isinstance(f.value, int)
            ):
                self.bounds.append((type(f).__name__, "doc_id", f.value))
            elif isinstance(f, IsNotNull) and len(f.attribute) == 1:
                self.not_null.append(f.attribute[0])
            else:
                unsupported.append(f)  # Spark keeps evaluating these
        return unsupported

    def _range_may_match(self, lo: int, hi: int) -> bool:
        for op, _col, v in self.bounds:
            if op == "EqualTo" and not (lo <= v <= hi):
                return False
            if op == "GreaterThan" and not (hi > v):
                return False
            if op == "GreaterThanOrEqual" and not (hi >= v):
                return False
            if op == "LessThan" and not (lo < v):
                return False
            if op == "LessThanOrEqual" and not (lo <= v):
                return False
        return True

    def partitions(self):
        shards = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl.gz")
        )
        kept = []
        for s in shards:
            rng = _shard_range(s)
            if rng is None or self._range_may_match(*rng):
                kept.append(_ShardPartition(s))
        # an empty scan still needs one (empty) partition
        return kept or [_ShardPartition("")]

    def _row_ok(self, rec: dict) -> bool:
        v = rec.get("doc_id")
        for op, _col, b in self.bounds:
            if v is None:
                return False
            if op == "EqualTo" and v != b:
                return False
            if op == "GreaterThan" and not v > b:
                return False
            if op == "GreaterThanOrEqual" and not v >= b:
                return False
            if op == "LessThan" and not v < b:
                return False
            if op == "LessThanOrEqual" and not v <= b:
                return False
        return all(rec.get(c) is not None for c in self.not_null)

    def read(self, partition: _ShardPartition):
        # yield pyarrow RecordBatches, not per-row tuples: the Python
        # Data Source API's fast path — one Arrow transfer per batch
        # instead of a pickle round trip per row
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        if not partition.path:
            return
        # explicit Arrow schema: from_pydict would infer `null` type
        # for an all-None column and fail Spark's schema check
        pa_schema = to_arrow_schema(self.spark_schema)
        cols: dict[str, list] = {c: [] for c in self.fields}
        n = 0
        with gzip.open(partition.path, "rt", encoding="utf-8") as f:
            for line in f:
                rec = json.loads(line)
                # accepted filters re-apply row-level: shard pruning
                # is necessary, not sufficient
                if not self._row_ok(rec):
                    continue
                for c in self.fields:
                    cols[c].append(rec.get(c))
                n += 1
                if n == 8192:
                    yield pa.RecordBatch.from_pydict(cols, schema=pa_schema)
                    cols = {c: [] for c in self.fields}
                    n = 0
        if n:
            yield pa.RecordBatch.from_pydict(cols, schema=pa_schema)


class JsonlShardsWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.fields = [f.name for f in schema.fields]
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires a path option")
        self.overwrite = overwrite

    def write(self, rows) -> _ShardCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".part-{pid}-{uuid.uuid4().hex}.tmp")
        lo = hi = None
        n = 0
        with gzip.open(tmp, "wt", encoding="utf-8") as f:
            for row in rows:
                rec = {c: row[i] for i, c in enumerate(self.fields)}
                d = rec.get("doc_id")
                if d is not None:
                    lo = d if lo is None else min(lo, d)
                    hi = d if hi is None else max(hi, d)
                f.write(json.dumps(rec, ensure_ascii=False) + "\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return _ShardCommit("")
        final = os.path.join(
            self.path,
            f"part-{pid}-{uuid.uuid4().hex}.{lo if lo is not None else 0}-"
            f"{hi if hi is not None else 0}.jsonl.gz",
        )
        os.replace(tmp, final)
        return _ShardCommit(os.path.basename(final))

    def commit(self, messages):
        pass  # shards were atomically os.replace'd into place

    def abort(self, messages):
        for m in messages:
            if m and m.filename:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlShardsStreamReader(DataSourceStreamReader):
    """Incremental tail of a shard directory — the custom STREAMING
    source half of the connector (q170), on the PARTITION-based
    ``DataSourceStreamReader`` (not the driver-side Simple variant):
    the offset is the position in the sorted listing already
    consumed, ``partitions(start, end)`` maps each newly landed shard
    to one InputPartition, and ``read`` decodes it ON EXECUTORS —
    file streaming-source semantics (binaryFile's discipline) with
    the same distributed decode shape as the batch reader. Offsets
    only grow (shards are never renamed or deleted mid-stream), so
    replay between checkpointed offsets is exact."""

    def __init__(self, schema: StructType, options: dict):
        self.fields = [f.name for f in schema.fields]
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires a path option")

    def _shards(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.path) if f.endswith(".jsonl.gz")
        )

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        return {"pos": len(self._shards())}

    def partitions(self, start: dict, end: dict):
        names = self._shards()[start["pos"] : end["pos"]]
        return [
            _ShardPartition(os.path.join(self.path, n)) for n in names
        ] or [_ShardPartition("")]

    def read(self, partition: _ShardPartition):
        if not partition.path:
            return
        with gzip.open(partition.path, "rt", encoding="utf-8") as f:
            for line in f:
                rec = json.loads(line)
                yield tuple(rec.get(c) for c in self.fields)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up; shards remain the batch source


class JsonlShardsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def schema(self) -> str:
        return self.options.get("schema_ddl", _DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> JsonlShardsReader:
        return JsonlShardsReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> JsonlShardsWriter:
        return JsonlShardsWriter(schema, dict(self.options), overwrite)

    def streamReader(self, schema: StructType) -> JsonlShardsStreamReader:
        return JsonlShardsStreamReader(schema, dict(self.options))


def register_jsonl_shards(spark) -> None:
    """Idempotent session registration (re-registering replaces)."""
    spark.dataSource.register(JsonlShardsDataSource)
