"""Process-scoped scratch directories for queries that materialize
intermediate lake state (dbt runs, compaction rewrites).

``tempfile.mkdtemp`` in a query body leaks one directory per run; the
driver re-runs every registered query each round, so that accretes.
Here all scratch lives under ONE per-process root that is removed at
interpreter exit, and a repeated request for the same name wipes the
previous contents first — re-running a query reuses (not accumulates)
its scratch space.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(name: str) -> str:
    """Return an empty scratch directory for ``name``.

    Same name within one process -> same path, emptied on each call.
    The whole root is deleted at interpreter exit. Callers returning a
    lazy DataFrame over this path rely on exit-time (not immediate)
    cleanup — the driver collects before the interpreter exits.
    """
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    path = os.path.join(_ROOT, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path
