"""Adjacency aggregation on Spark 4's ``transformWithStateInPandas`` —
the successor stateful API (SURVEY.md §2.5 W4 notes it as the Spark-4
surface).  Unlike ``applyInPandasWithState``'s single state tuple +
single timeout, this API exposes named state handles and explicit
event-time timers, which is a 1:1 match for the reference's design
(``/root/reference/flink-jobs/simpy_kafka_reader.py:199-224``:
ValueState quintet + per-record event-time timer at ``end_at_ms``).

The ``applyInPandasWithState`` implementation in ``stateful.py`` remains
the battle-tested default; this one is the forward path.  NOTE: the API's
state-server client needs the ``protobuf`` package at runtime;
``_protobuf_compat.ensure_protobuf`` locates a vendored pure-Python
runtime when the package isn't pip-installed.  Environments where neither
exists fall back to v1 (``HAS_TWS`` False; the semantics test skips, and
the raised error carries the actual ImportError).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .._protobuf_compat import ensure_protobuf

_PB_ORIGIN = ensure_protobuf()

try:  # Spark >= 4.0, and the API's protobuf wire dependency must import
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)
    from google.protobuf import descriptor as _descriptor  # noqa: F401

    HAS_TWS = True
    _TWS_IMPORT_ERROR: ImportError | None = None
except ImportError as _e:  # pragma: no cover
    StatefulProcessor = object
    HAS_TWS = False
    _TWS_IMPORT_ERROR = _e

from .stateful import OUTPUT_SCHEMA, _append_unique, _emit_row


class AdjacencyProcessor(StatefulProcessor):
    """Named-state twin of the reference's MessageAggregationProcess."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.handle = handle
        # reference ValueState quintet (simpy_kafka_reader.py:199-224),
        # lists JSON-encoded exactly as the reference stores them
        self.msg = handle.getValueState("msg", "msg_json string")
        self.parents = handle.getValueState("parents", "parents_json string")
        self.children = handle.getValueState("children", "children_json string")
        self.end_ms = handle.getValueState("end_ms", "end_ms long")

    def _load(self):
        msg = json.loads(self.msg.get()[0]) if self.msg.exists() else None
        parents = json.loads(self.parents.get()[0]) if self.parents.exists() else []
        children = (
            json.loads(self.children.get()[0]) if self.children.exists() else []
        )
        return msg, parents, children

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        msg, parents, children = self._load()
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                if row.event_type == "message":
                    if msg is None and row.payload:  # first-write-wins (:230-236)
                        msg = json.loads(row.payload)
                        end = int(msg.get("end_at_ms", 0))
                        self.end_ms.update((end,))
                        # event-time timer at end_at_ms (reference :236)
                        self.handle.registerTimer(end)
                elif row.event_type == "add_parent":
                    _append_unique(parents, row.other_id)
                elif row.event_type == "add_child":
                    _append_unique(children, row.other_id)
        if msg is not None:
            self.msg.update((json.dumps(msg),))
        self.parents.update((json.dumps(parents),))
        self.children.update((json.dumps(children),))
        return iter(())

    def handleExpiredTimer(self, key, timerValues,
                           expiredTimerInfo) -> Iterator[pd.DataFrame]:
        # watermark passed end_at_ms -> emit + evict (reference :247-264)
        msg, parents, children = self._load()
        for s in (self.msg, self.parents, self.children, self.end_ms):
            s.clear()
        if msg is not None:
            yield _emit_row(msg, parents, children)

    def close(self) -> None:
        pass


class IdleFlushProcessor(StatefulProcessor):
    """W3's native transformWithStateInPandas twin: processing-time idle
    flush with the reference's timer delete/re-create on activity
    (``simpy_kafka_reader.py:186-193,303-310``).  Unlike the v1
    ``applyInPandasWithState`` fold — one timeout slot, event-time clock
    only — this runs on the real wall clock and uses explicit
    registerTimer/deleteTimer, so a key flushes after ``idle_ms`` of
    inactivity even while the event-time watermark is globally stalled
    (the documented v1 divergence, SURVEY.md §7.1, closed here).

    Together with :class:`AdjacencyProcessor` (event-time emit at
    ``end_at_ms``) both reference timer paths now have native TWS
    expressions; the reference's CONCURRENT pair remains emulated by the
    v1 dual-timer fold, since one TWS operator still has a single
    timeMode.
    """

    def __init__(self, idle_ms: int = 60_000) -> None:
        self.idle_ms = idle_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.handle = handle
        self.msg = handle.getValueState("msg", "msg_json string")
        self.parents = handle.getValueState("parents", "parents_json string")
        self.children = handle.getValueState("children", "children_json string")
        # the reference deletes + re-creates its idle timer on each event;
        # TWS needs the old expiry to delete, so it rides in value state
        self.timer_at = handle.getValueState("timer_at", "timer_at long")

    def _load(self):
        msg = json.loads(self.msg.get()[0]) if self.msg.exists() else None
        parents = json.loads(self.parents.get()[0]) if self.parents.exists() else []
        children = (
            json.loads(self.children.get()[0]) if self.children.exists() else []
        )
        return msg, parents, children

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        msg, parents, children = self._load()
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                if row.event_type == "message":
                    if msg is None and row.payload:
                        msg = json.loads(row.payload)
                elif row.event_type == "add_parent":
                    _append_unique(parents, row.other_id)
                elif row.event_type == "add_child":
                    _append_unique(children, row.other_id)
        if msg is not None:
            self.msg.update((json.dumps(msg),))
        self.parents.update((json.dumps(parents),))
        self.children.update((json.dumps(children),))
        # reset-on-activity: drop the pending timer, arm a fresh one
        if self.timer_at.exists():
            self.handle.deleteTimer(self.timer_at.get()[0])
        at = timerValues.getCurrentProcessingTimeInMs() + self.idle_ms
        self.handle.registerTimer(at)
        self.timer_at.update((at,))
        return iter(())

    def handleExpiredTimer(self, key, timerValues,
                           expiredTimerInfo) -> Iterator[pd.DataFrame]:
        msg, parents, children = self._load()
        for s in (self.msg, self.parents, self.children, self.timer_at):
            s.clear()
        if msg is not None:  # bare-updates keys evict silently (ref :303-310)
            yield _emit_row(msg, parents, children)

    def close(self) -> None:
        pass


def aggregate_updates_idle_v2(updates: DataFrame,
                              idle_ms: int = 60_000) -> DataFrame:
    """transformWithStateInPandas processing-time idle-flush aggregation;
    same UPDATE_SCHEMA input / OUTPUT_SCHEMA output as v1's idle mode."""
    if not HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithStateInPandas needs Spark >= 4.0 AND the protobuf "
            "package (its state-server wire format); import failed with: "
            f"{_TWS_IMPORT_ERROR!r} — use make_idle_flush_fn (v1) instead")
    return (
        updates.groupBy("key_id")
        .transformWithStateInPandas(
            IdleFlushProcessor(idle_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="processingTime",
        )
    )


def aggregate_updates_stream_v2(updates: DataFrame,
                                watermark: str = "30 seconds") -> DataFrame:
    """transformWithStateInPandas version of the adjacency aggregation;
    same UPDATE_SCHEMA input / OUTPUT_SCHEMA output as the v1 operator."""
    if not HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithStateInPandas needs Spark >= 4.0 AND the protobuf "
            "package (its state-server wire format); import failed with: "
            f"{_TWS_IMPORT_ERROR!r} — use aggregate_updates_stream (v1) instead")
    return (
        updates.withWatermark("event_ts", watermark)
        .groupBy("key_id")
        .transformWithStateInPandas(
            AdjacencyProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
