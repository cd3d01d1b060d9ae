"""Custom stateful streaming operator via applyInPandasWithState:
a running per-level counter with per-key state — the general mechanism
for operators the built-in windowed aggregates can't express
(SURVEY C-tier; Structured Streaming SIGMOD'18 §stateful ops).

State shape: one long per key (count so far). Every trigger the
operator receives the key's new rows as pandas batches, folds them into
state, and emits the updated (level, running_total) row. GroupStateTimeout
is unused here (counters never expire) but the signature shows where
TTL plugs in.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _update_counts(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (level,) = key
    count = state.get[0] if state.exists else 0
    for pdf in batches:
        count += len(pdf)
    state.update((count,))
    yield pd.DataFrame({"level": [level], "running_total": [count]})


def running_level_counts(events: DataFrame) -> DataFrame:
    """events (with `level` column) → per-level running totals,
    maintained across micro-batches in the state store."""
    return events.groupBy("level").applyInPandasWithState(
        _update_counts,
        outputStructType="level string, running_total long",
        stateStructType="count long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
