"""Driver-parity sweep: every registered query must build under the
grader's BARE SparkSession, and the pandas-boundary queries must
execute there.

This is the class-killer for config-dependent code paths (the round-5
q54 regression: schema-less pandas createDataFrame passes under
session.py's Arrow-enabled factory, crashes under the driver's bare
session with CANNOT_INFER_TYPE_FOR_FIELD). The sweep runs in a
subprocess because a bare session cannot be created inside this
pytest process — getOrCreate() would hand back the already-configured
shared session and silently test the wrong thing.
"""

import os
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).resolve().parent / "driver_parity_worker.py"
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_all_queries_build_under_bare_driver_session():
    proc = subprocess.run(
        [sys.executable, str(WORKER), SF_DIR],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, (
        "bare-session parity sweep failed:\n"
        + proc.stderr[-4000:]
        + proc.stdout[-1000:]
    )
    assert "DRIVER-PARITY OK" in proc.stdout
