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
        batch_cents += int((pdf["value"] * 100).round().astype("int64").sum())
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
