"""Custom stateful streaming operator: incremental per-conversation progress.

`applyInPandasWithState` keeps (n_turns, max_turn_idx, last_ts) per conv_id
across micro-batches and emits an updated progress row whenever a conversation
receives turns — the streaming analog of the reference's per-item checkpoint
dict (provence/provence.py:113-167), held in the state store instead of driver
JSON. A processing-time timeout closes idle conversations (emits a final row
flagged closed=true and drops the state), bounding state size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), False),
        T.StructField("closed", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), False),
    ]
)


def _make_update(idle_timeout_ms: "int | None"):
    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, max_idx = state.get
            state.remove()
            yield pd.DataFrame(
                {"conv_id": [conv_id], "n_turns": [n_turns], "max_turn_idx": [max_idx],
                 "closed": [True]}
            )
            return
        n_turns, max_idx = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n_turns += len(pdf)
            if len(pdf):
                max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        state.update((n_turns, max_idx))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"conv_id": [conv_id], "n_turns": [n_turns], "max_turn_idx": [max_idx],
             "closed": [False]}
        )

    return _update


def conversation_progress(
    turns_stream: DataFrame, idle_timeout_ms: "int | None" = None
) -> DataFrame:
    """turns stream -> per-conversation running progress (update mode).

    `idle_timeout_ms`: close (emit closed=true + evict state) conversations
    idle that long — for continuous deployments, this bounds state size.
    Default off: under trigger(availableNow) pending timeouts keep the query
    alive until they fire, which a drain-and-stop run doesn't want.
    """
    return (
        turns_stream.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_update(idle_timeout_ms),
            outputStructType=PROGRESS_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
