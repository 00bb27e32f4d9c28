"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — islands (W1) -> as-of alignment (J2) ->
  per-segment agg (A5+A8) -> dialogue projection (S6) over the sf0.001
  events table (the reference's core transcript/diarization dataflow,
  reference src/transcription.py:199-299, restated relationally).
- ``queries()`` / ``oracle_sql()``: the SURVEY.md §2 operator inventory
  + the LLM-data-pipeline extension set, each Spark query paired with a
  DuckDB oracle (see package plans/queries.py).
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.joins import (
    asof_align,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.operators.windows import (
    merge_islands,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.plans.queries import (
    REGISTRY,
    _event_chunks,
    _event_segments,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: speaker-merge islands -> as-of chunk alignment -> dialogue."""
    chunks = _event_chunks(spark, SF0001)
    raw_segments = _event_segments(spark, SF0001)
    islands = merge_islands(
        raw_segments, ["file"], "seg_id", "speaker", "spk_end", "spk_end"
    )
    segments = islands.select(
        "file",
        F.col("island_id").alias("seg_id"),
        F.col("label").alias("speaker"),
        F.col("island_end").alias("spk_end"),
    )
    aligned = asof_align(chunks, segments)
    return aligned.select(
        F.col("file").alias("user_id"),
        "seg_id",
        "speaker",
        "t_start",
        "t_end",
        "confidence",
        F.format_string(
            "[%.2f-%.2f] %s: %s",
            F.col("t_start"),
            F.col("t_end"),
            F.col("speaker"),
            F.col("text"),
        ).alias("line"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
