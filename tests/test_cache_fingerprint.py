"""The /tmp materializer caches must rebuild when their SOURCE parquet
changes (round-7 review finding: only materialize_binary_files had the
fingerprint guard; the CSV/JSON/ORC twins, the partitioned-orders sink
and the raster band files gated on bare file existence and would serve
stale derived data against a fresh oracle)."""

import os
import shutil

import duckdb

from sklearn_raster_spark.sources import TABLES, materialize_table_as, read_table

BASE = "/root/testdata/sf0.001"


def _fixture_dir(tmp_path, n_nations: int) -> str:
    d = tmp_path / "sf_cachetest"
    if d.exists():
        shutil.rmtree(d)
    d.mkdir()
    con = duckdb.connect()
    for t in TABLES:
        if t == "nation":
            con.execute(
                f"COPY (SELECT * FROM '{BASE}/nation.parquet' LIMIT {n_nations}) "
                f"TO '{d / 'nation.parquet'}' (FORMAT PARQUET)"
            )
        else:
            os.symlink(f"{BASE}/{t}.parquet", d / f"{t}.parquet")
    con.close()
    return str(d)


def test_materialized_csv_rebuilds_on_source_change(spark, tmp_path):
    sf = _fixture_dir(tmp_path, n_nations=25)
    assert read_table(spark, sf, "nation", fmt="csv").count() == 25
    path = materialize_table_as(spark, sf, "nation", "csv")
    assert os.path.exists(os.path.join(path, "_SRC_FINGERPRINT"))
    # regenerate the SOURCE at the same sf_dir with different contents
    sf2 = _fixture_dir(tmp_path, n_nations=10)
    assert sf2 == sf
    # before the fingerprint guard this read the stale 25-row CSV copy
    assert read_table(spark, sf, "nation", fmt="csv").count() == 10
