"""Custom stateful streaming operator via applyInPandasWithState:
per-conversation sessionization.

Keyed by conv_id, state tracks (n_turns, first_ts, last_ts, n_tool_calls);
a conversation is emitted when its processing-time timeout fires (no new
turns arriving) — the streaming analog of "conversation finished".  This
is the harness for any custom stateful per-key logic the reference lacks
(it is strictly batch), demonstrating state schema, timeout handling and
Arrow-batched group processing.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, n_tool_calls long, "
    "first_ts timestamp, last_ts timestamp, closed boolean"
)
STATE_SCHEMA = "n_turns long, n_tool_calls long, first_ts timestamp, last_ts timestamp"


def _session_fn_factory(timeout_ms: int | None):
    def fn(key, pdfs, state):
        return _session_fn(key, pdfs, state, timeout_ms)

    return fn


def _session_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState, timeout_ms: int | None = 2000):
    (conv_id,) = key
    if state.hasTimedOut:
        n_turns, n_tool, first_ts, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "n_turns": n_turns,
                    "n_tool_calls": n_tool,
                    "first_ts": first_ts,
                    "last_ts": last_ts,
                    "closed": True,
                }
            ]
        )
        return
    n_turns, n_tool, first_ts, last_ts = (state.get if state.exists else (0, 0, None, None))
    for pdf in pdfs:
        n_turns += len(pdf)
        n_tool += int((pdf["role"] == "tool").sum())
        ts_min, ts_max = pdf["ts"].min(), pdf["ts"].max()
        first_ts = ts_min if first_ts is None else min(first_ts, ts_min)
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n_turns, n_tool, first_ts, last_ts))
    if timeout_ms is not None:
        state.setTimeoutDuration(timeout_ms)  # ms of processing-time silence
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_turns": n_turns,
                "n_tool_calls": n_tool,
                "first_ts": first_ts,
                "last_ts": last_ts,
                "closed": False,
            }
        ]
    )


def conversation_sessions(stream: DataFrame, timeout_ms: int | None = 2000) -> DataFrame:
    """stream: transcript rows; returns per-conversation running/closed
    session summaries.

    ``timeout_ms=None`` disables the close-on-silence timeout — REQUIRED
    with ``trigger(availableNow=True)``: processing-time timeouts keep
    the query spinning empty micro-batches to service them, so an
    availableNow run never self-terminates (observed: hundreds of 0-row
    batches).  Use timeouts only with continuous triggers."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _session_fn_factory(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if timeout_ms is not None else GroupStateTimeout.NoTimeout
        ),
    )
