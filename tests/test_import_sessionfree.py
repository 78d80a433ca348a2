"""Every package module must import WITHOUT a live SparkSession.

Guards the class of bug the round-7 review caught in _pandas_udafs.py:
a module-level ``pandas_udf`` with a DDL-string returnType parses the
type at decoration time via ``_parse_datatype_string``, which needs a
live SparkContext — so the module imported fine inside a query builder
(session already up) but crashed any session-free importer (tooling,
REPL, a test collecting before the fixture). Runs in a subprocess
because this pytest process always has the shared session, which would
mask exactly the failure being tested.
"""

import subprocess
import sys

_WORKER = """
import importlib, pkgutil, sys
import sklearn_raster_spark
bad = []
for m in pkgutil.walk_packages(sklearn_raster_spark.__path__, "sklearn_raster_spark."):
    try:
        importlib.import_module(m.name)
    except Exception as e:  # noqa: BLE001 - report every failure mode
        bad.append(f"{m.name}: {type(e).__name__}: {e}")
if bad:
    print("\\n".join(bad), file=sys.stderr)
    sys.exit(1)
print("SESSION-FREE IMPORT OK")
"""


def test_all_modules_import_without_spark_session():
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        "session-free import failed:\n" + proc.stderr[-3000:]
    )
    assert "SESSION-FREE IMPORT OK" in proc.stdout
