"""Inner-thread limiting for executor-side kernels.

Reference parity: utils/decorators.py:84-126 caps BLAS/OpenMP threads
per Dask worker via threadpoolctl (default 1) to prevent
oversubscription when tasks already saturate the cores. Spark-side we
set executor env vars in the session factory AND guard inside the UDF
when threadpoolctl is importable (it is optional here).
"""

from __future__ import annotations

import contextlib
import os

try:  # optional dependency, not in this container
    import threadpoolctl  # type: ignore

    _HAVE_TPC = True
except Exception:  # pragma: no cover
    _HAVE_TPC = False


@contextlib.contextmanager
def limit_inner_threads(limit: int | None):
    """Context manager capping BLAS/OpenMP threads inside a UDF batch."""
    if limit is None:
        yield
        return
    if _HAVE_TPC:
        with threadpoolctl.threadpool_limits(limits=limit):
            yield
        return
    # fallback: env vars only influence pools created after this point,
    # but they are also pre-set executor-wide by session.py
    prev = {}
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        prev[var] = os.environ.get(var)
        os.environ[var] = str(limit)
    try:
        yield
    finally:
        for var, val in prev.items():
            if val is None:
                os.environ.pop(var, None)
            else:
                os.environ[var] = val
