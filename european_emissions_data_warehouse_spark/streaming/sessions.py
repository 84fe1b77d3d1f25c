"""Stateful streaming sessionization — applyInPandasWithState.

The streaming twin of plans.analytics.q_sessionize (lag + cumulative-sum
batch idiom): per-user sessions closed after a 30-minute inactivity gap.
Batch can see the whole timeline; a stream cannot, so state carries the open
session (start, last-seen, count, value-sum) across micro-batches and a
processing-time timeout flushes sessions whose gap elapsed between batches.

This is the engine's custom-stateful-operator template (SURVEY.md §2.3
guidance: applyInPandasWithState for semantics the built-in windowed aggs
can't express — session windows with per-key state and timeouts).

State size = one small tuple per active user — at 100 TB of events the
bound is active keys, not data volume, and the state store shards with the
shuffle partitions of the groupBy.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, session_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"

GAP_SECONDS = 30 * 60




def sessionize_stateful(
    events: DataFrame, gap_seconds: int = GAP_SECONDS, timeout_ms: int = 60_000
) -> DataFrame:
    """Emit closed sessions (user_id, start, end, n_events, session_value).

    Within a micro-batch the rows of one user arrive as pandas frames; the
    running session folds in event order.  A session closes when the gap to
    the next event exceeds `gap_seconds`, or on state timeout when the
    stream goes quiet."""

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        # The processing-time timeout is the QUIESCENCE flush: it closes
        # the open session when the stream has gone quiet, which is what
        # drains state in the availableNow/run-to-completion mode (and
        # matches the batch twin, which closes every session at
        # end-of-data).  On a continuous stream it is a heuristic — a
        # source stalling longer than timeout_ms splits a session the
        # batch twin would keep whole — so continuous callers must size
        # timeout_ms comfortably above their worst-case batch cadence
        # (code-review r4).
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "session_value": [total],
                }
            )
            return

        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0

        # Interval-merge over (open state session ∪ this batch's events),
        # NOT an event-at-a-time fold against the state bounds: a
        # cross-batch out-of-order event can land ANYWHERE relative to the
        # open session — more than a gap BEFORE it (its own earlier
        # session: the old min(start, t) silently bridged a >gap silence
        # the batch twin splits), inside it (widen), or after (extend or
        # split).  Treating every event as a 1-point segment, sorting by
        # start, and merging gap-adjacent neighbors handles all three with
        # the batch twin's exact whole-second gap rule (code-review r4,
        # streaming pass).  All but the newest merged segment close now —
        # a future batch bridging two already-split segments cannot
        # retract them (inherent to append-mode streaming, same class as
        # the timeout flush heuristic above).
        segs: list[list] = []
        if start is not None:
            segs.append([start, last, n, total])
        # No pandas pre-sort: every event becomes a 1-point segment and
        # segs.sort below establishes the only order the merge depends on
        # (same-instant ordering is immaterial — a gap of <= 0 always
        # merges and the folds are commutative sums), so the old
        # sort_values over (ts, event_id) was a redundant O(n log n) pass
        # plus a frame copy per key per batch on the stateful hot path
        # (code-review r4, streaming scale pass).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t = int(ts.value // 1000)  # inline (module refs don't pickle to workers)
                segs.append([t, t, 1, float(value)])
        segs.sort(key=lambda s: (s[0], s[1]))
        merged: list[list] = []
        for seg in segs:
            # gap measured on WHOLE-SECOND truncations, exactly like the
            # batch twin's ts.cast('long') difference — µs-precision
            # comparison split sub-second boundary gaps (1800.5s) that
            # q_sessionize merges (code-review r4)
            if merged and (seg[0] // 1_000_000) - (merged[-1][1] // 1_000_000) <= gap_seconds:
                m = merged[-1]
                m[1] = max(m[1], seg[1])
                m[2] += seg[2]
                m[3] += seg[3]
            else:
                merged.append(seg)
        closed: list[tuple] = [tuple(m) for m in merged[:-1]]
        if merged:
            start, last, n, total = merged[-1]
            state.update((start, last, n, total))
            state.setTimeoutDuration(timeout_ms)
        else:
            start = None
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "session_value": [c[3] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_sessionize_drain(
    sessions: "DataFrame",
    out_path: str,
    checkpoint_path: str,
    poll_interval_s: float = 1.0,
    max_wait_s: float = 300.0,
) -> None:
    """Drain-and-stop runner for the stateful sessionizer.

    `trigger(availableNow=True)` never self-terminates for a stateful query
    with processing-time timeouts — Spark keeps scheduling micro-batches so
    pending timeouts can fire (state is always possible future work).  That
    is the right behavior for the continuous production stream; for the
    batch-drain use-case we emulate the reference's run-to-completion
    semantics by polling query progress and stopping once the drain is
    provably done: a batch consumed zero input AND the state store is empty
    (every session flushed by data or timeout)."""
    import time

    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.time()
    drained = False
    try:
        while q.isActive and time.time() - t0 < max_wait_s:
            lp = q.lastProgress
            if lp is not None:
                state_ops = lp.get("stateOperators") or [{}]
                drained = (
                    lp.get("numInputRows", 1) == 0
                    and state_ops[0].get("numRowsTotal", 1) == 0
                )
                if drained:
                    break
            time.sleep(poll_interval_s)
        if q.exception() is not None:
            raise q.exception()
        if not drained:
            # returning normally here silently dropped every unflushed
            # session from the output — the caller reads an incomplete
            # parquet indistinguishable from a clean drain (code-review r4)
            lp = q.lastProgress or {}
            state_ops = lp.get("stateOperators") or [{}]
            raise TimeoutError(
                f"run_sessionize_drain: state not drained within "
                f"{max_wait_s}s — {state_ops[0].get('numRowsTotal', '?')} "
                f"session(s) still open in the state store; the parquet at "
                f"{out_path} is INCOMPLETE. Raise max_wait_s or lower the "
                "sessionizer's timeout_ms."
            )
        # Give any in-flight micro-batch one poll interval to commit before
        # stopping — stop() mid state-store write is harmless (the
        # checkpoint recovers) but spams ERROR FileFormatWriter into test
        # logs.  (processAllAvailable() is NOT usable here: with
        # ProcessingTimeTimeout the engine schedules batches forever, so it
        # never returns.)
        if q.isActive:
            time.sleep(poll_interval_s)
    finally:
        if q.isActive:
            q.stop()
        q.awaitTermination(30)
