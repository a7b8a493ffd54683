"""Tracked cache pinning for registry plan builders.

Several builders ``cache()`` shared subtrees (shingle scans, LSH candidate
frames, signature tables) that a lazy registry consumer has no hook to
unpersist after collecting.  ``pin`` is a drop-in for ``.cache()`` that
records the frame so :func:`unpin_all` can drop exactly the registry's
pinned subtrees — and nothing else.  The previous approach
(``spark.catalog.clearCache()`` in the ``queries()`` wrapper) had global
blast radius: it dropped caches a consumer had created itself, or caches
of a previously built-but-not-yet-collected query.

Strong references are deliberate: a pinned subtree's Python wrapper is
usually dropped when the builder returns (only the JVM plan of the
RESULT frame references the cached dataset), so a weak registry would
never see it at ``unpin_all`` time and the JVM cache would leak until
ContextCleaner GC.  Because ``pin`` is also baked into library functions
(leakage_safe_split, hamming_near_dup_pairs, embedding_near_dup_ivf,
sequences._ranged, the fused ExactSubstr), consumers calling those
OUTSIDE the ``queries()`` wrapper accumulate entries here; two
safeguards bound that: all mutation happens under a lock (a concurrent
``unpin_all`` cannot race a ``pin``), and the registry is capped — on
overflow the OLDEST pins are unpersisted and dropped (an evicted frame
still in use merely recomputes; caching is a performance hint, never a
correctness dependency).  Long-running API consumers should still call
``unpin_all()`` between logical jobs to release JVM cache memory
promptly.

Builders that manage their own cache lifecycle (the BPE training loop
unpersists each round inline) keep calling ``.cache()`` directly.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# Far above any single registry build's pin count (worst capstone pins
# <10); only sustained un-unpinned consumer use ever reaches it.
MAX_PINNED = 256

_LOCK = threading.Lock()
_PINNED: list[DataFrame] = []


def pin(df: DataFrame, level=None) -> DataFrame:
    """``df.cache()`` (or ``df.persist(level)`` when a StorageLevel is
    given) + record for later targeted unpersist.  The default cache
    level for DataFrames is MEMORY_AND_DISK — oversized pins spill to
    local disk rather than evicting or failing, which is what makes
    pinning large-but-bounded frames (e.g. signature profiles) safe."""
    if level is not None:
        df.persist(level)
    else:
        df.cache()
    evicted: list[DataFrame] = []
    with _LOCK:
        _PINNED.append(df)
        if len(_PINNED) > MAX_PINNED:
            evicted, _PINNED[:] = (_PINNED[:-MAX_PINNED],
                                   _PINNED[-MAX_PINNED:])
    for old in evicted:
        _safe_unpersist(old)
    return df


def unpin_all() -> None:
    """Unpersist every frame pinned since the last call (registry caches
    only; consumer-owned caches are untouched)."""
    with _LOCK:
        frames, _PINNED[:] = _PINNED[:], []
    for df in reversed(frames):
        _safe_unpersist(df)


def _safe_unpersist(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        pass  # session already stopped / frame already dropped
