"""Tracked cache pinning for registry plan builders.

Several builders ``cache()`` shared subtrees (shingle scans, LSH candidate
frames, signature tables) that a lazy registry consumer has no hook to
unpersist after collecting.  ``pin`` is a drop-in for ``.cache()`` that
records the frame so :func:`unpin_all` can drop exactly the registry's
pinned subtrees — and nothing else.  The previous approach
(``spark.catalog.clearCache()`` in the ``queries()`` wrapper) had global
blast radius: it dropped caches a consumer had created itself, or caches
of a previously built-but-not-yet-collected query.

Builders that manage their own cache lifecycle (the BPE training loop
unpersists each round inline) keep calling ``.cache()`` directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """``df.cache()`` + record for later targeted unpersist."""
    df.cache()
    _PINNED.append(df)
    return df


def unpin_all() -> None:
    """Unpersist every frame pinned since the last call (registry caches
    only; consumer-owned caches are untouched)."""
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped / frame already dropped
