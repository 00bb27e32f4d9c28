"""Sinks (SURVEY.md §2.1 S5-S8).

The FAISS index + pickle sidecar pair (reference
src/embedding_engine.py:74-99) is unified into one Parquet vector-index
table partitioned by source_file — same per-file layout, but queryable,
schema'd, and splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON sink (reference src/transcription.py:349-351)."""
    df.write.mode(mode).json(path)


def write_dialogue_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Formatted-dialogue text sink (reference src/transcription.py:353-359).
    Expects a single 'line' column (operators.text.format_dialogue)."""
    df.select(F.col("line").alias("value")).write.mode(mode).text(path)


def write_vector_index(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Vector-index sink (S7): (vec_id, embedding, text, source_file)
    partitioned by source_file — one 'index' per source file, matching the
    reference's per-file FAISS layout (src/embedding_engine.py:74-84)."""
    df.write.mode(mode).partitionBy("source_file").parquet(path)


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Date-partitioned parquet sink for event streams.

    Hive-style `event_date=YYYY-MM-DD/` directories let Catalyst prune
    whole partitions for time-range predicates (the reference's
    year-filter diagnosis at testing/check_bucket_files.py:112 becomes a
    metadata-only operation instead of a full scan). Files within a
    partition are range-sorted on the timestamp so min/max row-group
    stats prune within the partition too.
    """
    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .repartition(F.col("event_date"))
        .sortWithinPartitions(ts_col)
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_vector_index(spark: SparkSession, path: str) -> DataFrame:
    """Vector-index load (S8, reference src/embedding_engine.py:88-99).
    Partition pruning on source_file replaces the per-file .faiss open."""
    return spark.read.parquet(path)
