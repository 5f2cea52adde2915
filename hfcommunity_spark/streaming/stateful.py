"""Custom stateful streaming operator (SURVEY §2.10/§2.11 —
``applyInPandasWithState``): arbitrary per-key state beyond what
built-in windows/dedup express.

``user_running_totals`` maintains, per user, a lifetime event count
and an exact integer-cent value total across micro-batches — the
streaming analog of the reference's run-scoped accumulators
(total_models_count / updated_models_count, databaseImport.py:601-621)
but keyed, fault-tolerant (checkpointed state store), and emitted
incrementally.

State size: two longs per user — bounded by key cardinality, not
stream length.  The handler is Arrow-batched per key group; no
row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, batch_events long, total_events long, total_cents long"
)
STATE_SCHEMA = "total_events long, total_cents long"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        total_events, total_cents = state.get
    else:
        total_events, total_cents = 0, 0
    batch_events = 0
    batch_cents = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        # NULL-valued events count toward batch_events but contribute 0
        # cents; an unmasked NaN would raise inside astype('int64') and
        # kill the streaming query (the round-5 anomaly-monitor bug,
        # same fix)
        vals = pdf["value"].dropna()
        batch_cents += int((vals * 100).round().astype("int64").sum())
    total_events += batch_events
    total_cents += batch_cents
    state.update((total_events, total_cents))
    yield pd.DataFrame(
        [(user_id, batch_events, total_events, total_cents)],
        columns=["user_id", "batch_events", "total_events", "total_cents"],
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Attach the stateful per-user totals operator to a streaming
    events frame (event_id, ts, user_id, event_type, value, props)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming anomaly monitor (round 5) ---------------------------
#
# The true streaming face of ``w_event_anomaly_zscore``
# (operators/relational_ext2.py): per event_type, a ring buffer of the
# last ANOM_LOOKBACK micro-unit values is carried in the checkpointed
# state store, and each arriving event is scored against the buffer
# BEFORE being pushed — the same trailing-frame-excluding-current
# algebra as the batch twin, so a stream replayed in (ts, event_id)
# order per key produces exactly the batch query's flags.
#
# State size: ANOM_LOOKBACK longs per event_type — bounded by key
# cardinality × frame width, not stream length.  Arithmetic is exact
# integer sums (Python ints) with the same
# (x·n − Σx)/√(n·Σx² − (Σx)²) rearrangement and half-away-from-zero
# rounding as the batch oracle pair.

ANOMALY_OUTPUT_SCHEMA = "event_id long, event_type string, z_rounded double"
ANOMALY_STATE_SCHEMA = "micros array<long>"


def _round_half_away(x: float, digits: int = 4) -> float:
    """Spark ROUND semantics, bit-for-bit: Scala's BigDecimal(double)
    goes through the shortest round-trip decimal string
    (Double.toString) and setScale(4, HALF_UP); Python's repr() is the
    same shortest-decimal algorithm, so Decimal(repr(x)).quantize
    reproduces it exactly.  A float multiply-add-floor would compound
    a second rounding step and can flip the 4th decimal at
    representation boundaries (round-5 review finding); Python's
    built-in round() is banker's and disagrees on exact .00005
    boundaries."""
    import decimal

    q = decimal.Decimal(1).scaleb(-digits)
    return float(
        decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def _update_anomaly(key, pdfs, state) -> "Iterator[pd.DataFrame]":
    import math

    from hfcommunity_spark.operators.relational_ext2 import (
        ANOM_LOOKBACK,
        ANOM_Z,
    )

    (event_type,) = key
    buf: list[int] = list(state.get[0]) if state.exists else []
    batch = pd.concat(list(pdfs), ignore_index=True)
    # NULL-valued events carry no measurement: excluded from scoring
    # AND from the frame, exactly like the batch twin's IS NOT NULL
    # filter (a NaN here would otherwise kill the whole query where
    # the batch path keeps running — round-5 review finding)
    batch = batch[batch["value"].notna()]
    batch = batch.sort_values(["ts", "event_id"], kind="stable")
    out_ids, out_z = [], []
    for eid, micro in zip(
        batch["event_id"].astype("int64"),
        (batch["value"] * 1_000_000).map(math.floor).astype("int64"),
    ):
        micro = int(micro)
        if len(buf) == ANOM_LOOKBACK:
            n, s1 = len(buf), sum(buf)
            s2 = sum(m * m for m in buf)
            var_num = n * s2 - s1 * s1
            if var_num > 0:
                z = _round_half_away(
                    (float(micro) * n - s1) / math.sqrt(float(var_num))
                )
                if abs(z) >= ANOM_Z:
                    out_ids.append(int(eid))
                    out_z.append(z)
        buf.append(micro)
        if len(buf) > ANOM_LOOKBACK:
            buf.pop(0)
    state.update((buf,))
    yield pd.DataFrame(
        {
            "event_id": pd.Series(out_ids, dtype="int64"),
            "event_type": pd.Series([event_type] * len(out_ids), dtype="object"),
            "z_rounded": pd.Series(out_z, dtype="float64"),
        }
    )


def streaming_anomaly_zscore(events: DataFrame) -> DataFrame:
    """Attach the ring-buffer anomaly monitor to a streaming events
    frame; emits (event_id, event_type, z_rounded) for events scoring
    |z| ≥ ANOM_Z against their type's trailing frame."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_anomaly,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
