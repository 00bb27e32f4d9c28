"""Sources (SURVEY.md §2.1).

The reference's hand-rolled S3 listing/pagination/download
(reference src/aws_bucket.py:101-191) collapses into Spark's binaryFile
source: the file index parallelizes listing, `pathGlobFilter` pushes the
suffix predicate into the listing (F1), and the `content` column replaces
the download step (S2). Against a real bucket the same code takes an
`s3a://` URI — locality, retries, and credential wiring live in the
Hadoop S3A layer, not here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet table from a driver testdata scale dir."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def scan_catalog(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    with_content: bool = False,
) -> DataFrame:
    """Object-store catalog scan (S1): path/length/modificationTime rows.

    `binaryFile` + pathGlobFilter = the reference's paginated
    list_objects_v2 + suffix filter (src/aws_bucket.py:160-176), with the
    listing parallelized by Spark's InMemoryFileIndex.
    """
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if not with_content:
        df = df.drop("content")
    return df


def scan_globs(spark: SparkSession, path: str, globs: Sequence[str]) -> DataFrame:
    """Multi-extension union scan (reference src/transcription.py:431-432)."""
    dfs = [scan_catalog(spark, path, g) for g in globs]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def scan_text_documents(spark: SparkSession, path: str, glob: str = "*.txt") -> DataFrame:
    """Whole-file text scan (S4, reference src/embedding_engine.py:58-64):
    one row per file -> (source_file, text)."""
    return (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            F.input_file_name().alias("source_file"),
            F.col("value").alias("text"),
        )
    )
