"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (SURVEY.md §2.2 streaming row — "stateful,
late data").

State per user: (session_id, last_ts_s, n_events, session_start_s).
An event >30 min after the previous one opens a new session; a
processing-time timeout flushes idle users' final sessions. Emitted
rows are *closed* sessions.

Scale shape: state is O(active users), not O(events); the shuffle is
keyed by user_id — the same partitioning the batch sessionize uses.
The UDF body is a nested closure (shipped by value) like the other
Python stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_GAP_S = 1800

OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "session_start_s long, session_end_s long"
)
STATE_SCHEMA = "session_id long, last_ts_s long, n_events long, session_start_s long"


def sessionize_stream(events: DataFrame, timeout: str = "processing") -> DataFrame:
    """events (streaming, with ``ts`` timestamp + ``user_id``) →
    closed sessions.

    ``timeout='processing'``: idle users' final sessions flush after a
    processing-time timeout — the continuous-stream mode. NOTE: timeout
    firings schedule further micro-batches, so an ``availableNow``
    drain may keep producing (empty) batches long after the data is
    consumed; for bounded replays/tests use ``timeout='none'``, which
    terminates promptly and leaves the last open session per user in
    state (unclosed) — exactly the late-data-safe behavior.
    """
    gap = SESSION_GAP_S
    use_timeout = timeout == "processing"

    def _update(key, pdfs, state):
        import pandas as _pd

        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            sid, last, n, start = state.get
            rows.append((user_id, sid, n, start, last))
            state.remove()
        else:
            ts_all = []
            for pdf in pdfs:
                ts_all.extend(
                    int(t.timestamp()) for t in _pd.to_datetime(pdf["ts"])
                )
            ts_all.sort()
            if state.exists:
                sid, last, n, start = state.get
            else:
                sid, last, n, start = 0, None, 0, None
            for t in ts_all:
                if last is not None and t - last > gap:
                    rows.append((user_id, sid, n, start, last))
                    sid, n, start = sid + 1, 0, None
                if start is None:
                    start = t
                n += 1
                last = t
            state.update((sid, last, n, start))
            if use_timeout:
                state.setTimeoutDuration(60_000)
        if rows:
            yield _pd.DataFrame(
                rows,
                columns=[
                    "user_id",
                    "session_id",
                    "n_events",
                    "session_start_s",
                    "session_end_s",
                ],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
