"""Distributed raster-stack ingestion: per-band grid files -> one
long-form DataFrame, read BY THE EXECUTORS.

Reference S1/S2 load a stack of per-band GeoTIFFs into one Dataset
(datasets/_base.py:71-104). The Spark dual keeps the same shape while
distributing the file IO itself:

    file-list DataFrame (band, path)          -- tiny, driver-built
      -> repartition(n_files)                 -- one file per task
      -> mapInPandas(numpy reader)            -- executor-side decode
      -> long form (band, y, x, value)        -- the engine's native
                                                 FeatureFrame layout

The container has no rasterio/GDAL, so the band container is ``.npy``
(numpy's own grid format) — the DISTRIBUTION pattern (a scan operator
whose work unit is "decode one file", scaling to any number of files
across any number of executors) is the real subject and is identical
for GeoTIFF: swap ``np.load`` for ``rasterio.open().read()``.

Fixture bands are cut deterministically from the embeddings table
(band b = dimension b of the vec_id-ordered embedding matrix, reshaped
row-major to a (n/50, 50) grid), so every cell is reachable by exact
SQL over the ``embeddings`` view — the q68 oracle hash-checks the full
ingest path end-to-end with zero float arithmetic.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

RASTER_SCHEMA = StructType(
    [
        StructField("band", IntegerType()),
        StructField("y", IntegerType()),
        StructField("x", IntegerType()),
        StructField("value", DoubleType()),
    ]
)

GRID_WIDTH = 50
N_BANDS = 8


def materialize_raster_stack(
    spark: SparkSession, sf_dir: str, n_bands: int = N_BANDS
) -> list[tuple[int, str]]:
    """Write one ``.npy`` grid per band under /tmp (idempotent) and
    return the (band, path) file list. Band b is embedding dim b over
    vec_id order, reshaped to (n_vecs // GRID_WIDTH, GRID_WIDTH)."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), "spark_graft_raster", sf_name)
    os.makedirs(root, exist_ok=True)
    paths = [(b, os.path.join(root, f"band_{b}.npy")) for b in range(n_bands)]
    if not all(os.path.exists(p) for _, p in paths):
        emb = (
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            .orderBy("vec_id")
            .select("embedding")
            .toPandas()
        )
        mat = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
        n_rows = (mat.shape[0] // GRID_WIDTH) * GRID_WIDTH
        for b, p in paths:
            grid = mat[:n_rows, b].reshape(-1, GRID_WIDTH)
            np.save(p + ".tmp.npy", grid)
            os.replace(p + ".tmp.npy", p)
    return paths


def read_raster_stack(spark: SparkSession, files: list[tuple[int, str]]) -> DataFrame:
    """Long-form scan of a band-file stack. Each task decodes whole
    files (the file list is repartitioned so tasks get disjoint files);
    decode output is Arrow-batched back as (band, y, x, value) rows.
    With F files and E executors the scan scales as ceil(F/E) decode
    waves — the same contract as Spark's own binaryFile source."""
    flist = spark.createDataFrame(
        [(int(b), p) for b, p in files], ["band", "path"]
    ).repartition(len(files), "band")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for band, path in zip(pdf["band"], pdf["path"]):
                grid = np.load(path)
                ys, xs = np.indices(grid.shape)
                yield pd.DataFrame(
                    {
                        "band": np.full(grid.size, band, dtype=np.int32),
                        "y": ys.ravel().astype(np.int32),
                        "x": xs.ravel().astype(np.int32),
                        "value": grid.ravel().astype(np.float64),
                    }
                )

    return flist.mapInPandas(decode, RASTER_SCHEMA)


def raster_stack_to_wide(long_df: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """The S2 merge: long (band, y, x, value) -> one column per band,
    keyed by (y, x). Explicit pivot values keep the plan static (no
    driver-side distinct scan)."""
    return (
        long_df.groupBy("y", "x")
        .pivot("band", list(range(n_bands)))
        .agg(F.first("value"))
    )
