"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.6 / brief: "applyInPandasWithState for custom stateful
operators").

``running_user_totals``: per-user running aggregate state (event count,
value cents, last-seen micros) maintained across micro-batches, emitting
the updated totals for every user touched in each batch.  State lives in
the state store (checkpointed, fault-tolerant); a GroupStateTimeout could
evict idle users — kept NoTimeout here so the drained result is exactly
comparable to the batch aggregate in tests.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, value_cents long, last_seen_us long"
STATE_SCHEMA = "n long, cents long, last_us long"


def _update_user(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # cents per row with the engine's deterministic money rule
        cents += int((pdf["value"] * 100.0 + 0.5).astype("int64").sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "value_cents": cents, "last_seen_us": last_us}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame (user_id, value, ts_us) → running totals per user.

    Each micro-batch folds its rows into the user's GroupState and emits
    the new totals (Update output mode).
    """
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id", "value", F.expr("ts_ns DIV 1000").alias("ts_us")
    ).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
