"""Session-scoped tracking for operator-internal ``persist()`` calls.

Operators like MinHash/SimHash banding persist intermediates because
both sides of their self-join consume them (Spark has no cross-subtree
CSE). Those DataFrames are returned lazily, so the operator itself can
never know when the caller's terminal action has run — and an
``unpersist()`` before that point would silently discard the cache the
self-join depends on.

``pin`` persists and registers the intermediate; harnesses call
``release_pinned()`` between queries so a long-lived session never
accumulates cached blocks (unpersist is always safe: a later action
simply recomputes from source). bench.py, tools/check_correctness.py
and the test session fixture all do this; interactive users should too.

The registry holds strong references deliberately: the JVM-side
CacheManager keeps cached plans alive regardless of Python object
lifetime, so a handle that outlives the operator's locals is the only
way to release them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() + register for deferred release."""
    df.persist()
    return track(df)


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed DataFrame for
    deferred release."""
    _TRACKED.append(df)
    return df


def release_pinned() -> int:
    """Unpersist every tracked intermediate; returns the number
    released. Lazy-safe: downstream re-use recomputes."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(False)
            n += 1
        except Exception:
            pass
    return n
