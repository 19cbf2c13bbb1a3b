"""Custom stateful streaming operators via ``applyInPandasWithState``.

``F.session_window`` (streaming/events.py) covers gap-merged sessions with
built-in aggregates; this module is the *arbitrary*-state tier — the Spark
primitive you reach for when an operator's state machine isn't expressible
as a windowed aggregation (reference has no streaming at all; SURVEY.md §2B).

Spark 4 also ships ``transformWithStateInPandas`` (typed value/list/map
state, timers, TTL); its Python driver worker imports ``google.protobuf``,
which this environment doesn't provide, so ``applyInPandasWithState`` —
equally expressive for the session use case — is the supported tier here.
The operators keep the (key, state, timeout) structure that ports to the
newer API mechanically when protobuf is available.

``stateful_sessionize`` keeps one small state record per user — (session
start, last event ts, count, value sum) — and emits a session row only when
the session CLOSES: either a new event arrives more than ``gap`` after the
previous one, or the event-time watermark passes ``last_ts + gap`` (event-
time timeout) and fires the state's timeout callback. That gives:

  - append-mode output (each session emitted exactly once, immutable),
  - bounded state: O(active users), independent of stream length — the
    watermark + timeout is what makes this run forever on a 100 TB/day
    stream,
  - per-group Arrow batches: pandas sees one user's rows at a time, so the
    Python-side work is tiny and vectorizable; the heavy lifting (shuffle
    on user_id, state store, watermark tracking) stays JVM-side.

Semantics match the batch registry query ``events_sessionize`` (lag-gap
cumsum with a strict ``> gap`` µs comparison, ties broken by event_id), so a
backfill and the live path agree row-for-row on closed sessions (for
cross-batch out-of-order arrivals within the watermark, boundaries stay
monotonic and the row is absorbed into the open session — divergence from
an order-complete batch run is bounded by the watermark delay).

NB: output timestamps are ``TIMESTAMP_NTZ`` holding the wall-clock values
pandas receives, which for a tz-aware input column are session-timezone
local. Run with ``spark.sql.session.timeZone=UTC`` (the engine default,
``session.py``) or feed an NTZ event-time column, or backfill/live
comparisons shift by the tz offset.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampNTZType()),
        T.StructField("session_end", T.TimestampNTZType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# State: (session_start_us, last_ts_us, n_events, total_value)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

_US = 1_000_000


def _us(ts: pd.Timestamp) -> int:
    return ts.value // 1_000  # pandas stores ns


def _row(user_id: int, start_us: int, last_us: int, n: int, total: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us * 1_000)],
            "session_end": [pd.Timestamp(last_us * 1_000)],
            "n_events": [n],
            "total_value": [float(total)],
        }
    )


def make_sessionizer(gap_minutes: int = 30):
    """Build the (key, pdf_iter, state) -> Iterator[pd.DataFrame] callback.

    Factory instead of a module-level function so ``gap`` rides along in the
    closure (cloudpickled to executors) rather than global config.
    """
    gap_us = gap_minutes * 60 * _US

    def sessionize(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield _row(user_id, start_us, last_us, n, total)
            return

        def arm_timeout(last: int) -> None:
            # A timeout must be strictly ahead of the current watermark;
            # a group touched after its natural deadline already passed
            # (late rows are NOT pre-filtered for this operator) re-arms
            # at watermark+1 so it fires in the next micro-batch.
            state.setTimeoutTimestamp(
                max((last + gap_us) // 1_000, state.getCurrentWatermarkMs() + 1)
            )

        frames = [p for p in pdfs if len(p)]
        if not frames:
            if state.exists:
                arm_timeout(state.get[1])
            return
        events = pd.concat(frames, ignore_index=True)
        # Late-data policy: rows older than the watermark are dropped —
        # Spark does NOT pre-filter them for this operator (unlike
        # windowed aggregation), and splicing a sub-watermark row into a
        # session whose successors were already processed would corrupt
        # the state machine. Same contract as the built-in stateful ops.
        wm_us = state.getCurrentWatermarkMs() * 1_000
        if wm_us > 0:
            # Unit-safe µs epoch (astype("int64") is in the series' own
            # unit — ns vs µs depends on the Arrow conversion).
            ts_us = (events["ts"] - pd.Timestamp(0)) // pd.Timedelta(
                microseconds=1
            )
            events = events[ts_us >= wm_us]
            if len(events) == 0:
                if state.exists:
                    arm_timeout(state.get[1])
                return
        # Mirror the batch ordering exactly: ts, then event_id tiebreak.
        events = events.sort_values(["ts", "event_id"], ignore_index=True)

        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = -1
            n, total = 0, 0.0

        closed: list[pd.DataFrame] = []
        for ts, value in zip(events["ts"], events["value"]):
            t = _us(ts)
            if n > 0 and t - last_us > gap_us:  # strict >, like batch
                closed.append(_row(user_id, start_us, last_us, n, total))
                n, total = 0, 0.0
            if n == 0:
                start_us = last_us = t
            else:
                # In-batch rows are sorted, but an in-watermark event can
                # arrive in a LATER micro-batch with an earlier ts than
                # state's last event. Keep the boundaries monotonic
                # (min-start / max-end) so the gap baseline never moves
                # backwards; such a row is absorbed into the open session
                # (divergence from an order-complete batch run is bounded
                # by the watermark delay).
                start_us = min(start_us, t)
                last_us = max(last_us, t)
            n += 1
            total += float(value)

        state.update((start_us, last_us, n, total))
        # Event-time timeout: fire once the watermark passes the point
        # where no in-order event could extend this session.
        arm_timeout(last_us)
        for frame in closed:
            yield frame

    return sessionize


def stateful_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
) -> DataFrame:
    """Closed sessions per user from a (streaming) events frame.

    ``events`` needs columns (event_id, ts, user_id, value); ``ts`` is the
    event-time column the watermark rides on. Output is append-mode: one
    immutable row per closed session.
    """
    return (
        events.select("event_id", "ts", "user_id", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_minutes),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


DEBOUNCE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("first_ts", T.TimestampNTZType()),
        T.StructField("n_collapsed", T.LongType()),
    ]
)

# State: (burst_start_us, last_ts_us, n_collapsed)
DEBOUNCE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _burst_row(
    user_id: int, event_type: str, start_us: int, n: int
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "event_type": [event_type],
            "first_ts": [pd.Timestamp(start_us * 1_000)],
            "n_collapsed": [n],
        }
    )


def make_debouncer(gap_seconds: int = 60):
    """(key, pdf_iter, state) callback collapsing same-type bursts —
    the streaming twin of the batch ``events_debounce`` query: a chain
    of events per (user, type) with inter-event gaps <= gap collapses
    to its FIRST event plus a count, emitted when the burst closes
    (next event beyond the gap, or event-time timeout past
    last_ts + gap). Same state-machine shape as the sessionizer:
    O(active (user, type)) state, append-mode output, exactly-once per
    closed burst.

    Out-of-order arrival: above-watermark events earlier than the open
    burst's start minus one gap are chained separately and either
    reconnect to the burst or close as their own burst(s) — matching
    the batch lag-gap collapse. The residual append-mode divergence is
    a pre-chain already emitted closed that a still-later arrival would
    have bridged; widen the watermark if that matters."""
    gap_us = gap_seconds * _US

    def debounce(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id, event_type = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _burst_row(user_id, event_type, start_us, n)
            return

        def arm_timeout(last: int) -> None:
            state.setTimeoutTimestamp(
                max(
                    (last + gap_us) // 1_000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )

        frames = [p for p in pdfs if len(p)]
        if not frames:
            if state.exists:
                arm_timeout(state.get[1])
            return
        events = pd.concat(frames, ignore_index=True)
        wm_us = state.getCurrentWatermarkMs() * 1_000
        if wm_us > 0:
            ts_us = (events["ts"] - pd.Timestamp(0)) // pd.Timedelta(
                microseconds=1
            )
            events = events[ts_us >= wm_us]
            if len(events) == 0:
                if state.exists:
                    arm_timeout(state.get[1])
                return
        events = events.sort_values(["ts", "event_id"], ignore_index=True)

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = -1
            n = 0

        closed: list[pd.DataFrame] = []
        # Chain the batch's events among themselves (sorted; strict >
        # gap splits, like batch), then merge each chain against the
        # open burst INTERVAL [start, last]. This keeps batch semantics
        # under out-of-order arrival: an above-watermark event more than
        # one gap before the burst's start is its own earlier burst —
        # merging it against last_us alone (the pre-r9 rule) silently
        # absorbed it — while a late chain whose tail reaches within one
        # gap of start reconnects (possibly through other events of this
        # batch). Residual append-mode limit: a chain closed here is
        # emitted now; a still-later arrival that would have bridged it
        # can no longer merge — widen the watermark if that matters.
        chains: list[list] = []  # [chain_start, chain_last, count]
        for ts in events["ts"]:
            t = _us(ts)
            if chains and t - chains[-1][1] <= gap_us:
                chains[-1][1] = t
                chains[-1][2] += 1
            else:
                chains.append([t, t, 1])
        for cs, cl, cn in chains:
            if n == 0:
                start_us, last_us, n = cs, cl, cn
            elif cl < start_us - gap_us:
                # entirely more than one gap before the open burst:
                # a late chain — its own earlier burst, like batch
                closed.append(_burst_row(user_id, event_type, cs, cn))
            elif cs <= last_us + gap_us:
                # adjoins/overlaps the burst (a straddling chain's
                # internal gaps are <= gap, so edge adjacency implies
                # connection under batch order)
                start_us = min(start_us, cs)
                last_us = max(last_us, cl)
                n += cn
            else:
                # disconnected after the burst: close it, open anew
                closed.append(
                    _burst_row(user_id, event_type, start_us, n)
                )
                start_us, last_us, n = cs, cl, cn

        state.update((start_us, last_us, n))
        arm_timeout(last_us)
        for frame in closed:
            yield frame

    return debounce


def stateful_debounce(
    events: DataFrame,
    gap_seconds: int = 60,
    watermark: str = "1 minute",
) -> DataFrame:
    """Closed (collapsed) bursts per (user, event type) from a
    (streaming) events frame — the live path of ``events_debounce``.
    Output is append-mode: one immutable row per closed burst."""
    return (
        events.select("event_id", "ts", "user_id", "event_type")
        .withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            make_debouncer(gap_seconds),
            outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

# State: the horizon-bounded tail of (ts_us, event_id, value) triples
EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("eid", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def make_ewma(horizon: int = 16, decay: float = 0.8):
    """(key, pdf_iter, state) callback emitting one row PER EVENT with
    the truncated EWMA of the user's last ``horizon`` values — the
    streaming twin of the batch ``events_ewma`` query (same seeded left
    fold over the same ordered window, so emitted doubles are
    bit-identical for in-order arrival). State is O(horizon) per active
    user. Ordered-within-watermark assumption (like the sessionizer):
    events are sorted within each batch; an above-watermark event
    arriving in a LATER batch than a newer event is folded at arrival
    position, diverging from batch order — widen the watermark if the
    source can reorder across batches."""

    def ewma_fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        events = pd.concat(frames, ignore_index=True)
        wm_us = state.getCurrentWatermarkMs() * 1_000
        if wm_us > 0:
            ts_us = (events["ts"] - pd.Timestamp(0)) // pd.Timedelta(
                microseconds=1
            )
            events = events[ts_us >= wm_us]
            if len(events) == 0:
                return
        events = events.sort_values(["ts", "event_id"], ignore_index=True)

        if state.exists:
            ts_l, eid_l, vals = (list(c) for c in state.get)
        else:
            ts_l, eid_l, vals = [], [], []

        out_eid, out_ewma = [], []
        for ts, eid, v in zip(events["ts"], events["event_id"], events["value"]):
            ts_l.append(_us(ts))
            eid_l.append(int(eid))
            vals.append(float(v))
            if len(vals) > horizon:
                ts_l, eid_l, vals = (
                    ts_l[-horizon:], eid_l[-horizon:], vals[-horizon:],
                )
            # the batch query's exact fold: numerator seeded with the
            # OLDEST value in the window, denominator seeded 1.0
            num = vals[0]
            den = 1.0
            for x in vals[1:]:
                num = num * decay + x
                den = den * decay + 1.0
            out_eid.append(int(eid))
            out_ewma.append(round(num / den, 9))
        state.update((ts_l, eid_l, vals))
        yield pd.DataFrame(
            {
                "event_id": out_eid,
                "user_id": [user_id] * len(out_eid),
                "ewma": out_ewma,
            }
        )

    return ewma_fn


def stateful_ewma(
    events: DataFrame,
    horizon: int = 16,
    decay: float = 0.8,
    watermark: str = "1 minute",
) -> DataFrame:
    """Per-event truncated EWMA per user from a (streaming) events
    frame — the online-feature twin of the batch ``events_ewma``
    query. Append-mode: one immutable row per input event."""
    return (
        events.select("event_id", "ts", "user_id", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_ewma(horizon, decay),
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
