"""Custom stateful streaming operator: per-user running totals via
applyInPandasWithState (the escape hatch when built-in windows/dedup can't
express the state machine — SURVEY.md §2B streaming tier).

State is one (count, total) pair per user — O(active users) memory,
watermark-free since totals never expire here (a production variant sets
GroupStateTimeout and evicts idle users)."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def stream_user_totals(events: DataFrame) -> DataFrame:
    """Running (count, sum) per user, emitted on every update — a custom
    stateful operator no built-in aggregation+mode combination expresses
    (arbitrary state transition + per-batch emission)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same per-user running totals on the transformWithStateInPandas
    API (Spark 4's successor to applyInPandasWithState): named state
    variables with per-state TTL, timers, and composite state types — the
    modern custom-stateful-operator surface. Kept semantically identical to
    `stream_user_totals` (tests assert parity) so the two APIs are
    interchangeable behind the engine.

    Runtime requirements: the RocksDB state store provider
    (streaming/sinks.py::rocksdb_conf) AND the `protobuf` Python package
    (the TWS driver worker speaks protobuf to the JVM) — the latter is
    absent in this container, so the parity test skips here and runs on a
    normally-provisioned cluster."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            state = self._totals.get()
            n, total = (state[0], state[1]) if state is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
