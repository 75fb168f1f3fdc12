"""Custom stateful streaming operators via ``applyInPandasWithState``.

The engine's batch dedup (A1/A2/A4) assumes the whole corpus is visible;
on a continuous stream the "have I seen this key" question needs state
that survives micro-batches. ``stream_first_seen`` is the streaming
analogue of ``dropDuplicates`` with unbounded keys: per key, only the
first-ever row is emitted; subsequent arrivals (same batch or any later
one) are swallowed by the state store.

``stream_running_totals`` keeps per-key running aggregates across
batches (count + sum), emitting the updated totals each time the key
appears — the streaming form of the A6-style merge.

Both use GroupState with no timeout: link/domain keys do not expire. For
keyspaces that do (sessions), pass ``ProcessingTimeTimeout`` and call
``state.setTimeoutDuration`` — the operator shape is identical.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_first_seen(
    events: DataFrame,
    key_col: str = "user_id",
    out_schema: str = "user_id bigint, event_id bigint, value double",
    out_cols: tuple[str, ...] = ("user_id", "event_id", "value"),
) -> DataFrame:
    """Emit only the first row ever seen per key (exactly-once dedup
    across micro-batches)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[:1][list(out_cols)]
        if first is not None:
            state.update((1,))
            yield first

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches;
    one updated row per key per batch it appears in."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        batch_n, batch_sum = 0, 0.0
        for pdf in pdfs:
            batch_n += len(pdf)
            batch_sum += float(pdf[value_col].sum())
        if batch_n:
            n += batch_n
            total += batch_sum
            state.update((n, total))
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n],
                 "total_value": [round(total, 2)]}
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_running_totals_tws(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """``stream_running_totals`` on the Spark 4 ``transformWithState``
    API (SPARK-49564): typed per-key ValueState with optional TTL and
    timers replaces the single packed GroupState tuple. Output contract
    is identical to the applyInPandasWithState form — the parity test
    runs both against the same stream and compares final totals — so
    callers can migrate API without changing semantics. Requires the
    RocksDB state store provider (the TWS backend; set on the writer's
    session, see tests) AND a working ``google.protobuf`` (the TWS state
    protocol's wire format; absent in this container, so the parity test
    skips here and ``stream_running_totals`` remains the tested path —
    the operator itself is complete)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    value_col_ = value_col

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            batch_n, batch_sum = 0, 0.0
            for pdf in rows:
                batch_n += len(pdf)
                batch_sum += float(pdf[value_col_].sum())
            if batch_n:
                n += batch_n
                total += batch_sum
                self._state.update((n, total))
                yield pd.DataFrame(
                    {"key": [key[0]], "n_events": [n],
                     "total_value": [round(total, 2)]}
                )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType="key bigint, n_events bigint, total_value double",
        outputMode="Append",
        timeMode="None",
    )
