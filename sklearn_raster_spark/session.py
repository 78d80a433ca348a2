"""SparkSession factory with scale-oriented defaults.

These settings are chosen for a large cluster (the 100 TB design point)
but degrade gracefully on local[N]:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic join-strategy demotion replace hand-tuned partition counts.
- Arrow on: every Python-boundary crossing (mapInPandas / pandas_udf /
  createDataFrame) is vectorized batch transfer, never per-row pickling.
- Partial aggregation, predicate pushdown, column pruning are Catalyst
  defaults — we only have to not defeat them (no opaque UDFs in filters).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"

_PKG_ZIP: str | None = None


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    Broadcast estimator instances pickle their classes BY REFERENCE
    (cloudpickle), so the worker process must be able to import
    ``sklearn_raster_spark``. When the driver's cwd is the repo this
    works implicitly; any other cwd (or a real cluster) needs the
    package on the workers' sys.path — a zip via addPyFile is the
    session-agnostic way. Idempotent and cheap (~50 KB zip, built once
    per process)."""
    global _PKG_ZIP
    if _PKG_ZIP is None:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        fd, zpath = tempfile.mkstemp(prefix="sklearn_raster_spark_", suffix=".zip")
        os.close(fd)
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "sklearn_raster_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
        _PKG_ZIP = zpath
    sc = spark.sparkContext
    # remember per-context so repeated applies don't re-add (and don't
    # spam "path has been added already" warnings)
    if getattr(sc, "_srs_pkg_shipped", None) == _PKG_ZIP:
        return
    try:
        sc.addPyFile(_PKG_ZIP)
        sc._srs_pkg_shipped = _PKG_ZIP
    except Exception:
        pass  # already added to this context


def get_spark(
    app_name: str = "sklearn_raster_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` with an externally configured
    session — every setting here is also safe cluster-side.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- adaptive execution: the 100-TB safety net -------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing ---------------------------------------------
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        # --- heap: local-mode drivers default to a 1 GiB JVM, which a
        #     32-thread local[32] run exhausts (every "executor" shares
        #     the driver heap). Applies only at JVM launch; on a real
        #     cluster the submit config wins. ----------------------------
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        # ContextCleaner only reaps shuffle files / broadcasts /
        # checkpoint blocks after a JVM GC proves the references dead;
        # a big heap may not GC for hours, so long-running drivers
        # accumulate. Periodic forced GC is the standard knob (default
        # 30min is too lazy for a query-per-second serving loop).
        .config("spark.cleaner.periodicGC.interval", "2min")
        # --- Arrow everywhere at the Python boundary ---------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Python Data Source API: let Catalyst hand predicates to
        # pushFilters (sources/pyds.py turns them into shard pruning)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # --- scan sizing: one task per row-group-ish ---------------------
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- keep executor-side BLAS from oversubscribing (reference:
        #     utils/decorators.py:84-126 thread limiting; here it is an
        #     executor-env concern, SURVEY.md O14) -----------------------
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        # quieter local runs
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
