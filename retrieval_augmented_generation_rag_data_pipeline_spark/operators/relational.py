"""Relational operator surface (SURVEY.md §2.2/§2.4/§2.6/§2.7).

Thin, explicit, testable DataFrame->DataFrame functions. Catalyst does
the heavy lifting (pushdown, pruning, broadcast selection, codegen);
these wrappers exist to name each capability of the reference pipeline
and pin its exact semantics with a citation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from .pinning import pin


# ---- filters / projections (reference §2.2) --------------------------------

def filter_suffix(df: DataFrame, col: str, suffix: str) -> DataFrame:
    """Case-insensitive suffix predicate (reference src/aws_bucket.py:176)."""
    return df.filter(F.lower(F.col(col)).endswith(suffix.lower()))


def filter_nonempty(df: DataFrame, col: str) -> DataFrame:
    """Drop rows with blank text (reference src/embedding_engine.py:64-68)."""
    return df.filter(F.length(F.trim(F.col(col))) > 0)


def filter_notnull(df: DataFrame, col: str) -> DataFrame:
    """Null guard (reference src/transcription.py:200)."""
    return df.filter(F.col(col).isNotNull())


def filter_year(df: DataFrame, ts_col: str, year: int) -> DataFrame:
    """Year-equality over a timestamp (reference testing/check_bucket_files.py:112)."""
    return df.filter(F.year(F.col(ts_col)) == year)


def project_mb(df: DataFrame, bytes_col: str, out: str = "size_mb") -> DataFrame:
    """Bytes -> MB arithmetic projection (reference testing/check_bucket_files.py:105)."""
    return df.withColumn(out, F.col(bytes_col) / (1024.0 * 1024.0))


def project_derived(df: DataFrame, path_col: str, ts_col: str) -> DataFrame:
    """Derived columns: year / extension / stem (reference
    testing/check_bucket_files.py:53,130; src/embedding_engine.py:60)."""
    return df.select(
        F.col(path_col),
        F.year(F.col(ts_col)).alias("year"),
        F.lower(F.regexp_extract(F.col(path_col), r"\.([^.\\/]+)$", 1)).alias("ext"),
        F.regexp_extract(F.col(path_col), r"([^/]+?)(\.[^./]*)?$", 1).alias("stem"),
    )


# ---- aggregations (reference §2.4) ------------------------------------------

def agg_conditional_counts(df: DataFrame, cond: Column) -> DataFrame:
    """processed/failed counters in one pass (reference src/main.py:57-88)."""
    return df.agg(
        F.count(F.when(cond, 1)).alias("processed_count"),
        F.count(F.when(~cond, 1)).alias("failed_count"),
        F.count("*").alias("total"),
    )


def agg_histogram(df: DataFrame, col: str) -> DataFrame:
    """Frequency histogram ordered by count desc (reference
    testing/check_bucket_files.py:127-132). Tie-break: key asc."""
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc(col))
    )


def agg_by_year(df: DataFrame, ts_col: str) -> DataFrame:
    """Per-year counts, newest first (reference testing/check_bucket_files.py:56-86)."""
    return (
        df.groupBy(F.year(F.col(ts_col)).alias("year"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("year"))
    )


def concat_group_texts(
    df: DataFrame, group_cols: Sequence[str], order_col: str, text_col: str
) -> DataFrame:
    """Ordered string-concat aggregation (reference src/transcription.py:207-208):
    texts stripped and space-joined in explicit order — Spark groups are
    unordered, so the ordering is materialized via sorted structs."""
    return df.groupBy(*group_cols).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col), F.trim(F.col(text_col)).alias("t")))
                ),
                lambda s: s["t"],
            ),
            " ",
        ).alias("text")
    )


# ---- set ops (reference §2.7) ------------------------------------------------

def distinct_keys(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """set() construction (reference src/aws_bucket.py:63)."""
    return df.select(*cols).dropDuplicates(list(cols))


def union_sources(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union-of-globs (reference src/transcription.py:431-432) as unionByName."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def rank_small(
    df: DataFrame,
    order: Sequence[tuple[str, str]],
    rank_col: str = "rank",
) -> DataFrame:
    """Dense 1-based total-order rank for a SMALL (post-limit) DataFrame
    without any window: rank(r) = 1 + count of strictly-better rows,
    computed as a broadcast non-equi self-join + groupBy.

    `order` is [(col, "asc"|"desc"), ...] evaluated lexicographically;
    the key must be total (no ties), e.g. terminated by a unique id.

    Why not `row_number() OVER (ORDER BY ...)`: an unpartitioned window
    funnels input through one task AND logs the WindowExec single-
    partition warning — and Spark 4's EliminateWindowPartitions strips
    a foldable PARTITION BY lit(0), so the window form can't be made
    quiet. For the <= k rows that survive a TakeOrdered limit, the k^2
    broadcast comparison is cheaper than the exchange a window needs.

    "desc" is implemented as unary minus inside the struct key, which
    is only meaningful for numeric columns — a string column would be
    cast to double (NULLs under non-ANSI), silently ranking every row
    1. Enforced: a desc direction on a non-numeric column raises.

    The input is pinned (operators.pinning.pin, a lazy localCheckpoint)
    before the self-join: both join sides otherwise replay the FULL
    upstream lineage — for bm25_search that meant two complete postings
    passes over the corpus just to rank the 20 surviving rows. The
    contract is post-limit (<= k rows), so the pin materializes a
    trivially small frame once. Validation runs BEFORE the pin: the
    checkpoint submits upstream jobs at call time under AQE, and a
    schema error is decidable without executing anything.
    """
    for c, direction in order:
        if direction == "desc" and not isinstance(
            df.schema[c].dataType, NumericType
        ):
            raise ValueError(
                f"rank_small: desc ordering requires a numeric column; "
                f"{c!r} is {df.schema[c].dataType.simpleString()} — negate "
                "via an explicit numeric key expression instead"
            )
    df = pin(df)

    def _key(prefix: str) -> Column:
        # struct comparison is ascending lexicographic; negate desc
        # numeric fields to reuse it for mixed directions
        fields = []
        for i, (c, direction) in enumerate(order):
            col = F.col(f"{prefix}.{c}")
            if direction == "desc":
                col = -col
            elif direction != "asc":
                raise ValueError(f"direction must be asc|desc, got {direction}")
            fields.append(col.alias(f"_k{i}"))
        return F.struct(*fields)

    left = df.alias("_l")
    right = df.select(*[c for c, _ in order]).alias("_r")
    better = _key("_r") < _key("_l")
    out_cols = df.columns
    return (
        left.join(F.broadcast(right), better, "left")
        .groupBy(*[F.col(f"_l.{c}").alias(c) for c in out_cols])
        .agg((F.count(f"_r.{order[0][0]}") + 1).cast("long").alias(rank_col))
    )
