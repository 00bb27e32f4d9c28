"""Custom stateful streaming operators (applyInPandasWithState).

The reference keeps exactly one piece of cross-batch state: the
processed-file ledger set (src/aws_bucket.py:55-68), which Structured
Streaming's checkpoint subsumes. These operators cover the *general*
stateful surface a training-data pipeline needs beyond that — running
per-key aggregates and first-seen dedup that survive across
micro-batches with bounded executor-side state.

State is partitioned by key across executors (a shuffle on the group
key per micro-batch); per-key state is O(1) here, so 100 TB streams
are bounded by distinct-key cardinality, not event volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, sum_value double"
FIRST_SEEN_SCHEMA = "key string, first_seen_batch long"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (count, sum(value)) per user across micro-batches.

    The streaming generalization of the reference's in-process counters
    (src/main.py:57-88) — state lives in the store, not driver globals.
    """

    def op(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            op,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def first_seen_keys(keyed: DataFrame, key_col: str = "key") -> DataFrame:
    """Streaming first-seen dedup: emit each key the first micro-batch it
    appears in, drop every later occurrence (the ledger semantics of
    reference src/aws_bucket.py:180 as a stateful operator — no external
    ledger table, exactly-once via the checkpoint)."""

    def op(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # Drain the iterator even when the key is known: contract of the
        # state func is to consume its input.
        batch_ids = [int(pdf["_batch_id"].min()) for pdf in pdfs if len(pdf)]
        if state.exists:
            return
        state.update((min(batch_ids) if batch_ids else 0,))
        yield pd.DataFrame(
            {"key": [key[0]], "first_seen_batch": [min(batch_ids) if batch_ids else 0]}
        )

    return keyed.groupBy(key_col).applyInPandasWithState(
        op,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType="first_batch long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
