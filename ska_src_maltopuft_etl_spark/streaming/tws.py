"""Sessionization on Spark 4's ``transformWithStateInPandas`` — the
successor stateful API to ``applyInPandasWithState`` (round-14 VERDICT
item #4, guarded port of the round-13 probe).

Semantics are IDENTICAL to ``ingest.sessionize_events`` (event-time
sessions with gap ``>`` tie convention, NULL event-time rows dropped,
NULL values contribute nothing with all-NULL spans totalling 0.0,
multi-span state with positional merge, sealed-emission once the
watermark passes ``end + gap``) so the two APIs can certify against
each other as fuzz twins once the environment allows running this one.

Environmental gate: PySpark's transformWithState Python worker talks to
the JVM state server over a protobuf protocol —
``google.protobuf`` is REQUIRED at runtime but absent from this
container (no installs). The module therefore imports cleanly
everywhere, and ``sessionize_events_tws`` raises a descriptive
``RuntimeError`` unless :func:`tws_available` is true; the pytest case
skips on the same predicate. Porting cost once protobuf appears: zero —
this is the full implementation, one flag away from the fuzz matrix
(add ``variant="tws"`` cases to tools/fuzz_stream.py's sessionize
family).

API mapping from the shipped operator (ingest.py:240-330):

====================================  =================================
applyInPandasWithState                transformWithStateInPandas
====================================  =================================
``state.get / update / remove``       ``ValueState.get/update/clear``
``state.setTimeoutTimestamp(ms)``     ``handle.registerTimer(ms)``
``state.hasTimedOut`` branch          ``handleExpiredTimer``
``state.getCurrentWatermarkMs()``     ``timer_values.
                                      get_current_watermark_in_ms()``
====================================  =================================
"""

from __future__ import annotations

import importlib.util
from typing import TYPE_CHECKING, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ska_src_maltopuft_etl_spark.streaming.ingest import (
    SESSION_SCHEMA,
    _STATE_SCHEMA,
    _merge_spans,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessorHandle,
    )


def tws_available() -> bool:
    """True when the transformWithState Python runtime can work here:
    the state-server protocol needs ``google.protobuf``."""
    try:
        # find_spec imports the PARENT package, so a missing `google`
        # namespace raises instead of returning None
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _spans_from_rows(ts_us: np.ndarray, vals: np.ndarray, gap_us: int):
    """In-batch gap split — identical to the shipped operator's kernel
    (ingest.py:289-303): split sorted rows at every gap > gap_us."""
    cuts = np.flatnonzero(np.diff(ts_us) > gap_us) + 1
    bounds = np.concatenate(([0], cuts, [len(ts_us)]))
    return [
        (
            int(ts_us[a]),
            int(ts_us[b - 1]),
            int(b - a),
            float(np.nansum(vals[a:b])),
        )
        for a, b in zip(bounds[:-1], bounds[1:])
    ]


def _emit(key, spans) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key[0]] * len(spans),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in spans],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in spans],
            "n_events": [n for _, _, n, _ in spans],
            "total_value": [t for _, _, _, t in spans],
        }
    )


def _make_processor(ts_col: str, value_col: str, gap_us: int):
    """Build the StatefulProcessor class lazily (the base class import
    is safe without protobuf, but keeping it inside the factory keeps
    module import independent of any future API move)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    gap_ms = gap_us // 1000

    class SessionizeProcessor(StatefulProcessor):
        def init(self, handle: "StatefulProcessorHandle") -> None:
            self._handle = handle
            self._spans = handle.getValueState("spans", _STATE_SCHEMA)

        # ------------------------------------------------------ state --
        def _load(self):
            stored = self._spans.get()
            if stored is None:
                return []
            starts, ends, ns, totals = stored
            return [
                (int(s), int(e), int(n), float(t))
                for s, e, n, t in zip(starts, ends, ns, totals)
            ]

        def _store_and_arm(self, spans, wm_ms: int) -> None:
            self._spans.update(
                (
                    [s for s, _, _, _ in spans],
                    [e for _, e, _, _ in spans],
                    [n for _, _, n, _ in spans],
                    [t for _, _, _, t in spans],
                )
            )
            # one armed timer per key: fire when the watermark passes
            # the EARLIEST open span's end + gap, clamped above the
            # current watermark (the shipped operator's set_timeout
            # clamp, ingest.py:199-208)
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            end_ms = min(e for _, e, _, _ in spans) // 1000 + gap_ms
            self._handle.registerTimer(max(end_ms, wm_ms + 1))

        def _split_sealed(self, spans, wm_ms: int):
            wm_us = wm_ms * 1000
            sealed = [s for s in spans if s[1] + gap_us < wm_us]
            kept = [s for s in spans if s[1] + gap_us >= wm_us]
            return sealed, kept

        # ------------------------------------------------------ input --
        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            pdf = pd.concat(list(rows))
            pdf = pdf[pdf[ts_col].notna()]  # NULL event times: no axis
            wm_ms = timer_values.get_current_watermark_in_ms()
            if pdf.empty:
                # defensive re-arm, mirroring the shipped operator's
                # round-14 empty-batch rule
                spans = self._load()
                if spans:
                    self._store_and_arm(spans, wm_ms)
                return
            pdf = pdf.sort_values(ts_col)
            ts_us = (pdf[ts_col].astype("int64") // 1000).to_numpy()
            vals = pdf[value_col].to_numpy()
            spans = _spans_from_rows(ts_us, vals, gap_us)
            spans = _merge_spans(sorted(spans + self._load()), gap_us)
            sealed, kept = self._split_sealed(spans, wm_ms)
            if kept:
                self._store_and_arm(kept, wm_ms)
            else:
                self._spans.clear()
            if sealed:
                yield _emit(key, sealed)

        # ------------------------------------------------------ timer --
        def handleExpiredTimer(
            self, key, timer_values, expired_timer_info
        ) -> Iterator[pd.DataFrame]:
            spans = self._load()
            wm_ms = timer_values.get_current_watermark_in_ms()
            sealed, kept = self._split_sealed(spans, wm_ms)
            if kept:
                self._store_and_arm(kept, wm_ms)
            else:
                self._spans.clear()
            if sealed:
                yield _emit(key, sealed)

        def close(self) -> None:
            pass

    return SessionizeProcessor()


def sessionize_events_tws(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """`ingest.sessionize_events` on the transformWithStateInPandas
    API (event-time mode only — the shipped operator's default).

    Raises ``RuntimeError`` when the runtime dependency is missing;
    check :func:`tws_available` first.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf (the "
            "PySpark state-server protocol); it is not installed in "
            "this environment. Use ingest.sessionize_events — the "
            "fuzz-certified applyInPandasWithState implementation with "
            "identical semantics."
        )
    gap_us = gap_minutes * 60 * 1_000_000
    events = events.withWatermark(ts_col, watermark)
    return events.groupBy(user_col).transformWithStateInPandas(
        statefulProcessor=_make_processor(ts_col, value_col, gap_us),
        outputStructType=SESSION_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
