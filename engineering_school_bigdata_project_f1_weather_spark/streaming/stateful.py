"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed aggregations (events_stream.py) cover tumbling and
session windows; this module is the *arbitrary state* surface — the Spark
shape for operators the declarative API can't express (running per-key
accumulators, custom eviction, model state):

- ``user_totals_stream`` : per-user running totals (event count, value
  cents, last-seen micros) carried across micro-batches in GroupState.

Scale notes: state lives in the executor state store partitioned by the
grouping key (one shuffle on user_id per micro-batch); each micro-batch
touches only keys present in that batch, and Arrow batches the
Python-side transfer. Checkpointing makes the state exactly-once on a
cluster. State size is O(distinct users), independent of history length.

Batch parity is tested in tests/test_streaming.py: draining the stream
file-by-file (maxFilesPerTrigger=1, two parquet halves) must end with the
same per-user totals as one batch groupBy over the full table — proving
state actually carries across micro-batches.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents_sum", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_user_totals(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the running state and
    emit the updated totals."""
    (user_id,) = key
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += int(len(pdf))
        cents += int(pdf["value_cents"].sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_cents_sum": [cents],
            "last_seen_us": [last_us],
        }
    )


def user_totals_stream(events: DataFrame) -> DataFrame:
    """Running per-user totals over a stream of events (must carry ``ts_us``
    epoch-micros as in operators/events.py)."""
    prepped = events.select(
        "user_id",
        F.col("ts_us"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias(
            "value_cents"
        ),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- Spark 4 transformWithState twin ---------------------------------------
# transformWithStateInPandas supersedes applyInPandasWithState: typed,
# named state variables (ValueState/ListState/MapState) with per-state
# TTLs and timers instead of one opaque state tuple. Both formulations are
# kept — same output contract — so either API level can be adopted.
# RUNTIME NOTE: executing TWS requires protobuf (its state-server wire
# protocol), absent from this container — the parity test skips there and
# applyInPandasWithState remains the fully-exercised path.

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class UserTotalsProcessor(StatefulProcessor):
    """Per-user running totals as a typed stateful processor."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n, cents, last_us = (
            self._totals.get() if self._totals.exists() else (0, 0, 0)
        )
        for pdf in rows:
            n += int(len(pdf))
            cents += int(pdf["value_cents"].sum())
            last_us = max(last_us, int(pdf["ts_us"].max()))
        self._totals.update((n, cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "value_cents_sum": [cents],
                "last_seen_us": [last_us],
            }
        )

    def close(self) -> None:
        pass


def user_totals_stream_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas variant of :func:`user_totals_stream` —
    identical output contract."""
    prepped = events.select(
        "user_id",
        F.col("ts_us"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias(
            "value_cents"
        ),
    )
    return prepped.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# --- streaming transition extraction ---------------------------------------

TRANSITION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
    ]
)

# state: the user's chronologically-last event seen so far
TRANSITION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _emit_transitions(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit one (from_type, to_type) row per consecutive event pair in a
    user's stream, bridging micro-batches through the carried last-event
    state — the streaming builder of the Markov transition matrix
    (events_transitions is the batch twin).

    In-batch rows are sorted by (ts_us, event_id) — the same total order
    as the batch window — so batch/stream parity is exact as long as
    micro-batches arrive in event-time order per user (true for the
    file-replay source; a production deployment adds a watermark buffer
    before this operator or tolerates the re-ordering error)."""
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_us", "event_id"], kind="mergesort"
    )
    types = rows["event_type"].tolist()
    if state.exists:
        _, _, last_type = state.get
        froms = [last_type] + types[:-1]
        tos = types
    else:
        froms = types[:-1]
        tos = types[1:]
    last = rows.iloc[-1]
    state.update((int(last["ts_us"]), int(last["event_id"]), str(last["event_type"])))
    if froms:
        yield pd.DataFrame({"from_type": froms, "to_type": tos})


def transitions_stream(events: DataFrame) -> DataFrame:
    """Per-user consecutive-pair extraction with carried state (module
    docstring of :func:`_emit_transitions`)."""
    prepped = events.select("user_id", "ts_us", "event_id", "event_type")
    return prepped.groupBy("user_id").applyInPandasWithState(
        _emit_transitions,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
