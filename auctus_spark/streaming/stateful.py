"""Custom stateful streaming operator: session aggregation with
``applyInPandasWithState``.

The reference has no streaming operators (SURVEY.md §2.9); this is the
training-pipeline-grade stateful rollup the task calls for: per-user
sessions that close after ``gap_minutes`` of inactivity, maintained as
explicit state with a processing-time timeout, emitting one row per
CLOSED session.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long, value_sum double")
STATE_SCHEMA = ("start long, last long, n long, vsum double")


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30,
                        timeout_minutes: int = 60) -> DataFrame:
    """events stream (user_id, ts, value) → closed sessions."""
    gap_s = gap_minutes * 60

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n, vsum = state.get
                closed.append((user_id, s, last, n, vsum))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("ts")
            if state.exists:
                s, last, n, vsum = state.get
            else:
                s = last = None
            for r in rows.itertuples(index=False):
                t = int(r.ts.timestamp())
                v = float(r.value) if r.value == r.value else 0.0
                if s is None:
                    s, last, n, vsum = t, t, 1, v
                elif t - last > gap_s:
                    closed.append((user_id, s, last, n, vsum))
                    s, last, n, vsum = t, t, 1, v
                else:
                    last, n, vsum = max(last, t), n + 1, vsum + v
            state.update((s, last, n, vsum))
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame({
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="s")
                                  for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="s")
                                for c in closed],
                "n_events": [c[3] for c in closed],
                "value_sum": [c[4] for c in closed]})

    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                update, SESSION_SCHEMA, STATE_SCHEMA, "append",
                GroupStateTimeout.ProcessingTimeTimeout))
