"""Window / ordered operators (SURVEY.md §2.5, §2.6 L3).

All are pure DataFrame compositions — lag + running sums + ordered
aggregation — so Catalyst plans them as window exchanges partitioned by
the grouping keys. At 100 TB the shuffle key is the partition column
(file/user), which is the natural unit of work; no driver-side loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_islands(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    label_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Gaps-and-islands merge of consecutive same-label segments.

    Matches the reference's speaker-merge semantics
    (reference src/transcription.py:277-299):
      - an island's start is its FIRST segment's start,
      - an island's end is the NEXT island's first start,
      - the FINAL island ends at the final segment's end (last row in
        order, not the max end).

    Returns (part_cols..., island_id, label, island_start, island_end).
    """
    w = Window.partitionBy(*part_cols).orderBy(order_col)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    # first row detected by row_number, label comparison null-SAFE: the
    # old "lag IS NULL" idiom conflated 'first row' with 'previous
    # label is NULL', so a NULL-labeled segment never opened an island
    # and absorbed its successor (eqNullSafe treats NULL as a label
    # value: consecutive NULLs merge, NULL<->non-NULL transitions split)
    flagged = df.withColumn(
        "_chg",
        F.when(
            (F.row_number().over(w) == 1)
            | F.col(label_col).eqNullSafe(F.lag(label_col).over(w)),
            F.lit(0),
        ).otherwise(F.lit(1)),
    ).withColumn("_island", F.sum("_chg").over(w)).withColumn(
        "_final_end", F.last(end_col).over(w_all)
    )

    islands = flagged.groupBy(*part_cols, "_island").agg(
        F.min_by(start_col, order_col).alias("island_start"),
        F.min_by(label_col, order_col).alias("label"),
        F.min(order_col).alias("_ord"),
        F.max("_final_end").alias("_final_end"),
    )
    w_isl = Window.partitionBy(*part_cols).orderBy("_ord")
    return (
        islands.withColumn(
            "island_end",
            F.coalesce(F.lead("island_start").over(w_isl), F.col("_final_end")),
        )
        .withColumn("island_id", F.row_number().over(w_isl) - 1)
        .select(*part_cols, "island_id", "label", "island_start", "island_end")
    )


def tumbling_bucket(ts: Column, seconds: int) -> Column:
    """Tumbling-window bucket id over event time (reference
    src/transcription.py:157 chunked ASR windows, generalized).

    floor(epoch_seconds / width) — arithmetic form so batch results are
    oracle-checkable; streaming uses F.window() with identical boundaries.
    """
    return F.floor(ts.cast("double") / seconds).cast("long")


def sliding_windows(
    df: DataFrame, ts_col: str, width_s: int, slide_s: int
) -> DataFrame:
    """Sliding (hopping) event-time windows via the built-in window()
    generator — each event lands in width/slide windows; boundaries are
    epoch-aligned so batch results equal the streaming operator's.
    Adds `wstart` (epoch seconds of the window start)."""
    return df.withColumn(
        "wstart",
        F.unix_timestamp(
            F.window(F.col(ts_col), f"{width_s} seconds", f"{slide_s} seconds")[
                "start"
            ]
        ),
    )


def session_windows(
    df: DataFrame,
    part_cols: Sequence[str],
    ts_col: str,
    gap_s: int,
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Session windows (gap-based) via the built-in session_window —
    the streaming-capable generalization of merge_islands. Adds
    `session_start`/`session_end` epoch-second doubles; end = last
    event + gap (Spark session semantics).

    ``aggs``: per-session aggregate expressions (already aliased);
    default keeps the historical count/sum-of-``value`` pair, which
    requires a ``value`` column in ``df``.
    """
    if aggs is None:
        aggs = [
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        ]
    sw = F.session_window(F.col(ts_col), f"{gap_s} seconds")
    grouped = df.groupBy(sw.alias("_w"), *part_cols).agg(*aggs)
    agg_out = [c for c in grouped.columns if c != "_w" and c not in part_cols]
    return grouped.select(
        *part_cols,
        F.col("_w.start").cast("double").alias("session_start"),
        F.col("_w.end").cast("double").alias("session_end"),
        *agg_out,
    )


def topn_per_group(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Column],
    n: int,
    rank_name: str = "rn",
) -> DataFrame:
    """Per-group top-N via row_number (reference display-head L3)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= n)
    )


def running_agg(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    agg_col: str,
    how: str = "sum",
) -> DataFrame:
    """Cumulative frame aggregation (reference prefix accumulation W4)."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fn = {"sum": F.sum, "avg": F.avg, "count": F.count, "concat": None}[how]
    if how == "concat":
        run = F.array_join(F.collect_list(agg_col).over(w), " ")
    else:
        run = fn(agg_col).over(w)
    return df.withColumn(f"running_{how}", run)


def trailing_range_agg(
    df: DataFrame,
    part_cols: Sequence[str],
    ts_col: str,
    agg_col: str,
    seconds: int,
) -> DataFrame:
    """Trailing time-range frame aggregation: for every row, the count
    and sum of ``agg_col`` over rows of the same partition whose
    timestamp lies in [ts - seconds, ts] — RANGE frame semantics, so
    all rows sharing a timestamp share one frame and the result is
    deterministic under ties (a ROWS frame would depend on tie order).
    The rate/volume-in-trailing-window primitive (events per user in
    the last hour) that sessionization and rate-limiting audits read.

    The ordering key is the timestamp truncated to whole epoch seconds
    (``cast long``), so engines agree bit-exactly on frame boundaries.

    Scale shape: ONE window partitioned by the entity key —
    parallelism scales with partition cardinality, and Spark evaluates
    a bounded range frame with a sliding two-pointer pass per
    partition (no self-join, no extra shuffle beyond the partitionBy).
    Adds (w_count, w_sum); ``w_count`` counts non-null ``agg_col``."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-int(seconds), 0)
    )
    # one select, not chained withColumns: both expressions share ONE
    # Window node (and one sort) instead of two stacked window passes
    return df.select(
        "*",
        F.count(agg_col).over(w).cast("long").alias("w_count"),
        F.sum(agg_col).over(w).alias("w_sum"),
    )
