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

import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, sum_value double"
FIRST_SEEN_SCHEMA = "key string, first_seen_batch long"
FIRST_SEEN_TTL_SCHEMA = "key string, first_seen_ts timestamp"


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
    ledger table, exactly-once via the checkpoint).

    Input contract: ``keyed`` must carry ``key_col`` AND a long
    ``_batch_id`` column (e.g. ``F.lit(batch_id)`` stamped in
    foreachBatch, or a monotonic source batch marker) — it records
    WHICH batch first saw the key. Validated up front so a missing
    column fails at plan time, not inside the executor state function.

    State NEVER expires (NoTimeout): these are exact ledger semantics —
    every key ever seen is remembered, so the store grows with distinct
    keys without bound. That is the correct contract for a processed-
    file ledger (bounded by files, not events), but for high-cardinality
    keys at 100 TB use ``first_seen_keys_ttl`` — bounded state, keys
    re-emit after the TTL horizon."""
    if key_col not in keyed.columns or "_batch_id" not in keyed.columns:
        raise ValueError(
            f"first_seen_keys requires columns [{key_col!r}, '_batch_id']; "
            f"got {keyed.columns}"
        )
    key_type = keyed.schema[key_col].dataType.simpleString()
    if key_type != "string":
        # the output schema pins key to string; a non-string key would
        # fail (or silently coerce) inside the executor state function —
        # surface the contract at plan time as the docstring promises
        raise ValueError(
            f"first_seen_keys: {key_col!r} must be a string column "
            f"(got {key_type}); cast it explicitly — the emitted key "
            "rides the fixed 'key string' output schema"
        )

    def op(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # Drain the iterator even when the key is known: contract of the
        # state func is to consume its input.
        # dropna: a NULL _batch_id row would make min() NaN and
        # int(NaN) kill the streaming query inside the executor
        batch_ids = [
            int(m)
            for m in (pdf["_batch_id"].dropna().min() for pdf in pdfs if len(pdf))
            if not pd.isna(m)
        ]
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


def first_seen_keys_ttl(
    keyed: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    ttl_minutes: int = 60,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """First-seen dedup with BOUNDED state: watermark-driven TTL.

    The scale default for high-cardinality keys: a key's state expires
    ``ttl_minutes`` of EVENT TIME after its last sighting
    (EventTimeTimeout — the timeout fires once the watermark, set here
    as ``withWatermark(ts_col, watermark_delay)``, passes
    last_seen + ttl). The state store therefore holds only keys seen
    within the sliding TTL horizon instead of every key ever — bounded
    by arrival rate x ttl, not by lifetime distinct keys. The trade: a
    key that reappears after expiry re-emits (dedup is exact only
    within the horizon); use ``first_seen_keys`` when exact unbounded
    ledger semantics are required.

    Input contract: ``keyed`` carries ``key_col`` and an event-time
    timestamp ``ts_col``. Output: (key, first_seen_ts) in update mode,
    re-emitted with a fresh first_seen_ts after each expiry.

    Timezone contract: the session timezone is captured ONCE, when this
    operator is built — changing ``spark.sql.session.timeZone`` after
    building requires rebuilding the operator, or the TTL horizon skews
    by the offset delta. During a DST fall-back repeated hour the naive
    timestamp is ambiguous; both readings are computed and the LATER
    epoch wins, so expiry is only ever delayed (by at most the DST
    offset), never fired early.
    """
    if key_col not in keyed.columns or ts_col not in keyed.columns:
        raise ValueError(
            f"first_seen_keys_ttl requires columns [{key_col!r}, {ts_col!r}]; "
            f"got {keyed.columns}"
        )
    ttl_ms = ttl_minutes * 60_000
    # applyInPandasWithState hands the worker tz-NAIVE timestamps
    # rendered in spark.sql.session.timeZone, but the timeout horizon
    # (setTimeoutTimestamp / getCurrentWatermarkMs) is epoch ms.
    # Treating the naive value as UTC (pd.Timestamp(...).value) skews
    # the TTL by the session-tz offset, so capture the session tz at
    # build time and localize before converting. Spark accepts legacy
    # 'GMT+8' / 'GMT+08:00'-style ids that pandas can't parse; their
    # offset normalizes to the zero-padded '+08:00' form, which it can.
    tz = keyed.sparkSession.conf.get("spark.sql.session.timeZone", "UTC") or "UTC"
    m = re.fullmatch(r"(?:GMT|UTC|UT)?([+-])(\d{1,2})(?::?(\d{2}))?", tz, re.I)
    if m:
        sign, hh, mm = m.group(1), int(m.group(2)), m.group(3) or "00"
        tz = f"{sign}{hh:02d}:{mm}"

    def op(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_seen + ttl with no new sightings:
            # forget the key so a later arrival re-emits
            state.remove()
            return
        ts_min = None
        ts_max = None
        for pdf in pdfs:
            if len(pdf):
                lo, hi = pdf[ts_col].min(), pdf[ts_col].max()
                # all-null event times give NaT (not None), and NaT
                # poisons min()/max() and the epoch math below — skip
                if pd.isna(lo):
                    continue
                ts_min = lo if ts_min is None else min(ts_min, lo)
                ts_max = hi if ts_max is None else max(ts_max, hi)
        first = not state.exists
        stored_ms = state.get[0] if state.exists else None
        if ts_max is None or pd.isna(ts_max):
            if stored_ms is not None:
                # GroupState clears the armed timeout on EVERY
                # invocation, so a batch carrying only null event times
                # for a known key must RE-ARM it from the stored
                # last_seen — a bare return would drop the timeout and
                # leak this key's state forever
                state.setTimeoutTimestamp(
                    max(stored_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
                )
            return
        # A fall-back repeated hour makes the naive value ambiguous:
        # resolve by taking the LATER of the two epochs (DST vs
        # standard reading), so the TTL horizon can only be extended
        # (<= DST offset), never shortened — state never expires early.
        last_ms = max(
            int(
                pd.Timestamp(ts_max)
                .tz_localize(tz, ambiguous=amb, nonexistent="shift_forward")
                .value
                // 1_000_000
            )
            for amb in (True, False)
        )
        if stored_ms is not None:
            # last_seen must be monotone: a batch of LATE out-of-order
            # events (all earlier than the stored last sighting) must
            # not pull the TTL horizon backward and expire the key
            # before ttl after its true last sighting
            last_ms = max(last_ms, stored_ms)
        state.update((last_ms,))
        # EventTimeTimeout requires a timestamp beyond the current
        # watermark; late data can put last_seen+ttl behind it
        state.setTimeoutTimestamp(
            max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        if first:
            yield pd.DataFrame(
                {"key": [key[0]], "first_seen_ts": [pd.Timestamp(ts_min)]}
            )

    return (
        keyed.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            op,
            outputStructType=FIRST_SEEN_TTL_SCHEMA,
            stateStructType="last_seen_ms long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
