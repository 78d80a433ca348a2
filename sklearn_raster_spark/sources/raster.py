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
    from sklearn_raster_spark.utils.cache import (
        cache_is_current,
        source_fingerprint,
        write_cache_marker,
    )

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), "spark_graft_raster", sf_name)
    os.makedirs(root, exist_ok=True)
    paths = [(b, os.path.join(root, f"band_{b}.npy")) for b in range(n_bands)]
    # fingerprinted marker (utils/cache.py): regenerated embeddings at
    # the same sf_dir rebuild the band files instead of serving stale
    # grids against the fresh oracle
    marker = os.path.join(root, "_SRC_FINGERPRINT")
    fp = source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    if not cache_is_current(marker, fp) or not all(
        os.path.exists(p) for _, p in paths
    ):
        emb = (
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            # a NULL vector contributes no grid row: the band cut is
            # positional over the vec_id-ordered NON-NULL vectors
            # (q68's oracle filters identically before ROW_NUMBER)
            .filter(F.col("embedding").isNotNull())
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
        write_cache_marker(marker, fp)
    return paths


def _decode_grid(path: str) -> np.ndarray:
    """Decode ONE band file to a 2-D float grid. `.npy` is the fixture
    default; `.tif`/`.tiff` decodes via rasterio when the environment
    provides it — same contract as the reference's rasterio read
    (datasets/_base.py:71-104), band 1 of the file — and otherwise via
    the builtin baseline-TIFF codec (sources/tiff.py), so the GeoTIFF
    branch EXECUTES everywhere; only compressed/tiled exotics still
    need rasterio. Runs on EXECUTORS inside mapInPandas."""
    if path.endswith((".tif", ".tiff")):
        import importlib.util

        if importlib.util.find_spec("rasterio") is not None:
            import rasterio

            with rasterio.open(path) as src:
                return src.read(1)
        from sklearn_raster_spark.sources.tiff import read_gtiff

        return read_gtiff(path)[0]
    return np.load(path)


def read_band_tags(path: str) -> dict | None:
    """CF attrs carried by a real GeoTIFF's tags (long_name / units /
    nodata), or None for tagless containers (.npy — the sidecar
    bands.json supplies attrs instead). Prefers rasterio when present
    (exact reference path, datasets/_base.py:71-104); falls back to
    the builtin baseline-TIFF tag parser (GDAL_METADATA/GDAL_NODATA,
    sources/tiff.py) otherwise."""
    import importlib.util

    if not path.endswith((".tif", ".tiff")):
        return None
    if importlib.util.find_spec("rasterio") is not None:
        import rasterio

        with rasterio.open(path) as src:
            tags = src.tags(1)
            return {
                "long_name": tags.get("long_name"),
                "units": tags.get("units", "1"),
                "_FillValue": src.nodata,
            }
    from sklearn_raster_spark.sources.tiff import read_gtiff

    try:
        _, info = read_gtiff(path)
    except NotImplementedError:
        return None  # compressed/tiled without rasterio: tagless fallback
    return {
        "long_name": info["tags"].get("long_name"),
        "units": info["tags"].get("units", "1"),
        "_FillValue": info["nodata"],
    }


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
                grid = _decode_grid(path)
                ys, xs = np.indices(grid.shape)
                vals = grid.ravel().astype(np.float64)
                yield pd.DataFrame(
                    {
                        "band": np.full(grid.size, band, dtype=np.int32),
                        "y": ys.ravel().astype(np.int32),
                        "x": xs.ravel().astype(np.int32),
                        # NaN cells surface as SQL NULL — EXPLICITLY,
                        # via the masked nullable-float array: NaN is
                        # the raster world's canonical float nodata (a
                        # MISSING cell, reference features.py NoData
                        # semantics), and relying on Arrow's implicit
                        # pandas nan_as_null default would leave the
                        # contract to a library setting. +-Inf are
                        # real (if degenerate) cell VALUES and pass
                        # through. (round-9 non-finite fuzz axis)
                        "value": pd.arrays.FloatingArray(
                            vals, np.isnan(vals)
                        ),
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


# -- CF band metadata (reference features.py:257-260: per-band attrs
#    from raster tags — _FillValue, long_name — flow into the loaded
#    Dataset and back out through sinks) --------------------------------

BAND_META_FILE = "bands.json"


def write_band_metadata(root: str, n_bands: int = N_BANDS) -> str:
    """Sidecar metadata a real GeoTIFF carries in its tags: per-band
    long_name / units / _FillValue. The container has no rasterio, so
    the TAG PARSER is the env-stubbed piece; everything downstream of
    'a dict of CF attrs per band' — which is what rasterio yields — is
    real and round-trip-tested."""
    import json

    meta = {
        str(b): {
            "long_name": f"band_{b}",
            "units": "1",
            "_FillValue": -9999.0,
        }
        for b in range(n_bands)
    }
    path = os.path.join(root, BAND_META_FILE)
    with open(path, "w") as f:
        json.dump(meta, f)
    return path


def read_raster_stack_to_featureframe(spark: SparkSession, sf_dir: str):
    """S1/S2 end-to-end: distributed band decode -> wide merge keyed on
    (y, x) -> FeatureFrame with per-band CF attrs (names from
    long_name, NoData registry from _FillValue) — the reference's
    `_load_rasters_to_dataset` shape. The frame's write_parquet then
    persists every attr into StructField metadata, so the CF chain
    survives a sink round-trip (tested)."""
    import json

    from sklearn_raster_spark.features import FeatureFrame

    files = materialize_raster_stack(spark, sf_dir)
    root = os.path.dirname(files[0][1])
    # GeoTIFF tags (if the env has rasterio and the stack is .tif) take
    # precedence — that IS the reference's tag path; the bands.json
    # sidecar is the tagless-container fallback.
    band_meta = {}
    for b, p in files:
        tags = read_band_tags(p)
        if tags and tags.get("long_name"):
            band_meta[str(b)] = tags
    if len(band_meta) < len(files):
        meta_path = os.path.join(root, BAND_META_FILE)
        if not os.path.exists(meta_path):
            write_band_metadata(root)
        with open(meta_path) as f:
            sidecar = json.load(f)
        for b, _ in files:
            band_meta.setdefault(str(b), sidecar[str(b)])

    wide = raster_stack_to_wide(read_raster_stack(spark, files))
    renames = {str(b): band_meta[str(b)]["long_name"] for b, _ in files}
    for old, new in renames.items():
        wide = wide.withColumnRenamed(old, new)
    features = [renames[str(b)] for b, _ in files]
    nodata = {
        renames[str(b)]: band_meta[str(b)]["_FillValue"] for b, _ in files
    }
    ff = FeatureFrame.from_dataframe(
        wide,
        features=features,
        nodata_input=nodata,
        metadata={
            "units": {renames[str(b)]: band_meta[str(b)]["units"] for b, _ in files},
            "source": "raster_stack",
        },
    )
    ff._append_history("load_raster_stack")
    return ff
