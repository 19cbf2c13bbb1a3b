"""Online anomaly detection: streaming twin of the batch z-score query.

The batch operator (``events_anomaly_zscore``) scores each event against
its type's GLOBAL moments; a live pipeline can't see the future, so the
streaming form is the standard ONLINE variant: per event type, maintain
running moments (n, Σv, Σv²) in group state and flag an event whose
value sits more than ``threshold`` σ from the mean of everything seen
BEFORE it. After a warm-up of ``min_n`` events per type the two agree on
clear outliers; the emitted row carries the n the decision used, so a
backfill can re-derive every verdict.

State is three numbers per event type — O(|types|), independent of
stream length, no timeout needed (a TTL would only matter if the key
space itself were unbounded; event types are a small closed set).
Per-group Arrow batches arrive sorted here (ts, event_id) so replays are
deterministic; the heavy lifting (shuffle on type, state store,
watermark) stays JVM-side, the Python side is one fold over the batch.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s1", T.DoubleType()),
        T.StructField("s2", T.DoubleType()),
    ]
)


def make_detector(threshold: float = 3.0, min_n: int = 30):
    """applyInPandasWithState function: flag values > threshold·σ from
    the running mean of the events seen before them (per key).
    ``min_n`` must be ≥ 2 — the sample variance divides by n−1."""
    if min_n < 2:
        raise ValueError(
            f"min_n must be >= 2 (sample variance divides by n-1), "
            f"got {min_n}"
        )

    def detect(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        n, s1, s2 = state.get if state.exists else (0, 0.0, 0.0)
        out: list[tuple] = []
        # concatenate BEFORE sorting: a group's micro-batch arrives as
        # several Arrow chunks whose interleaving follows shuffle fetch
        # order — per-chunk sorting would score later chunks' early
        # events against moments that already include later ones (the
        # same concat-then-sort rule the stateful sessionizer follows)
        chunks = list(pdfs)
        if not chunks:
            state.update((n, s1, s2))
            return
        batch = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        for event_id, ts, value in zip(
            batch["event_id"], batch["ts"], batch["value"]
        ):
            v = float(value) if value is not None else float("nan")
            if not math.isfinite(v):
                continue  # null/NaN: skip like SQL SUM — a single
                # non-finite value would otherwise poison the moments
                # and silently disable detection for this key forever
            if n >= min_n:
                mu = s1 / n
                var = max(s2 - s1 * s1 / n, 0.0) / (n - 1)
                sigma = math.sqrt(var)
                if sigma > 0.0:
                    z = (v - mu) / sigma
                    if abs(z) > threshold:
                        out.append(
                            (
                                int(event_id),
                                event_type,
                                ts,
                                v,
                                round(z, 4),
                                n,
                            )
                        )
            n += 1
            s1 += v
            s2 += v * v
        state.update((n, s1, s2))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "event_id", "event_type", "ts", "value", "z",
                    "n_seen",
                ],
            )

    return detect


def streaming_anomaly_zscore(
    events: DataFrame,
    threshold: float = 3.0,
    min_n: int = 30,
    watermark: str = "1 minute",
) -> DataFrame:
    """Append-mode stream of anomalous events (one immutable row per
    flagged event). ``events`` needs (event_id, ts, event_type, value);
    the watermark rides ``ts``."""
    return (
        events.select("event_id", "ts", "event_type", "value")
        .withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            make_detector(threshold, min_n),
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
