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
from pyspark.sql import types as T

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# The fixed table contract of the driver's testdata (identical at every
# scale factor — the generator is deterministic). Passing the schema
# explicitly skips the per-construction parquet footer read + schema
# inference: measured 0.12-0.17 s vs 0.03 s per spark.read at bench
# scale, and the bench constructs every query fresh each run (round 16,
# guide §1 — the cost is inside the timed region 64 queries x 3 sweeps
# deep). Unknown table names fall back to inference; drift between
# these DDLs and the files fails tests/test_sources.py loudly.
SCHEMAS: dict[str, str] = {
    "region": "r_regionkey INT,r_name STRING",
    "nation": "n_nationkey INT,n_name STRING,n_regionkey INT",
    "customer": "c_custkey BIGINT,c_name STRING,c_nationkey INT,c_acctbal DOUBLE,c_mktsegment STRING",
    "supplier": "s_suppkey BIGINT,s_name STRING,s_nationkey INT,s_acctbal DOUBLE",
    "part": "p_partkey BIGINT,p_name STRING,p_brand STRING,p_type STRING,p_size INT,p_retailprice DOUBLE",
    "orders": "o_orderkey BIGINT,o_custkey BIGINT,o_orderstatus STRING,o_totalprice DOUBLE,o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING",
    "lineitem": "l_orderkey BIGINT,l_partkey BIGINT,l_suppkey BIGINT,l_linenumber INT,l_quantity DOUBLE,l_extendedprice DOUBLE,l_discount DOUBLE,l_tax DOUBLE,l_returnflag STRING,l_linestatus STRING,l_shipdate TIMESTAMP_NTZ",
    "events": "event_id BIGINT,ts TIMESTAMP_NTZ,user_id BIGINT,event_type STRING,value DOUBLE,props STRING",
    "documents": "doc_id BIGINT,text STRING,lang STRING,source STRING,n_chars BIGINT",
    "embeddings": "vec_id BIGINT,embedding ARRAY<FLOAT>,label INT",
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet table from a driver testdata scale dir."""
    if name == "events":
        return load_events(spark, sf_dir)
    ddl = SCHEMAS.get(name)
    if ddl is None:
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return spark.read.schema(ddl).parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-robust loader for the TIMESTAMP(NANOS) `ts` column in
    events.parquet (Spark has no nanosecond timestamp type).

    - Spark <= 4.0 honors ``spark.sql.legacy.parquet.nanosAsLong``: the
      column surfaces as raw int64 nanos, which we truncate to micros.
    - Spark 4.1+ ignores that legacy conf and reads nanos natively as
      TIMESTAMP_NTZ, already micro-truncated; casting to TIMESTAMP under
      the UTC session timezone yields the identical instants.

    Both paths produce the same micros values DuckDB surfaces for the
    same file (oracle parity), with a stable TIMESTAMP (ltz) schema.

    On 4.1+ the native NTZ schema is known up front, so it is passed
    explicitly — skipping the footer/schema-inference read like
    ``load_table`` (round 16); the legacy-conf dance below only runs
    on older runtimes where the surfaced type is conf-dependent.
    """
    version = tuple(int(x) for x in spark.version.split(".")[:2])
    if version >= (4, 1):
        df = spark.read.schema(SCHEMAS["events"]).parquet(
            f"{sf_dir}/events.parquet"
        )
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(conf_key, None)
    except Exception:
        prev = None
    try:
        spark.conf.set(conf_key, "true")
        changed = True
    except Exception:
        changed = False  # conf removed — the native-read branch handles it
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):
        # legacy path (Spark <= 4.0): the conf is consulted again at
        # execution, so it must STAY set for this frame's lifetime —
        # the session-wide leak is inherent to the legacy conf design
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # native path (Spark 4.1+ ignores the conf): restore it so later
    # unrelated nanos-parquet reads in the session keep their schema
    if changed:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


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
    """Multi-extension scan (reference src/transcription.py:431-432).

    Simple patterns are combined into ONE Hadoop brace alternation
    (`{*.wav,*.mp3}`) so the store prefix is listed once — N separate
    scans would each run a full recursive listing (N rounds of
    paginated LIST calls on an object store). Falls back to a union of
    per-glob scans only when a pattern already contains braces (nested
    alternation isn't portable — and when any glob contains a comma,
    which the brace join would reinterpret as an alternation
    separator); a file matching several globs appears ONCE on either
    path (the fallback union dedupes on path to keep the two code
    paths' semantics identical).
    """
    globs = list(globs)
    if not globs:
        raise ValueError("scan_globs: at least one glob pattern required")
    if len(globs) > 1 and not any(
        "{" in g or "}" in g or "," in g for g in globs
    ):
        return scan_catalog(spark, path, "{" + ",".join(globs) + "}")
    dfs = [scan_catalog(spark, path, g) for g in globs]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    # overlapping globs match the same file more than once on the
    # union path; the combined-brace path lists it once
    return out if len(dfs) == 1 else out.dropDuplicates(["path"])


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


def scan_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    glob: str | None = None,
) -> DataFrame:
    """JSON-lines scan — the interchange format most text corpora ship
    in (one document object per line; the reference's own per-file JSON
    transcripts, src/transcription.py:349-351, are the single-object
    cousin).

    Pass ``schema`` in production: without it Spark runs a FULL
    inference pass over the data before the real scan — at 100 TB that
    is a second read of the corpus. With a schema the scan is one pass,
    line-splittable (plain .jsonl parallelizes by byte range; gzipped
    files are one split each — prefer uncompressed or zstd-seekable
    shards at scale), and malformed lines land in the standard
    ``_corrupt_record`` column instead of failing the job.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.option("recursiveFileLookup", "true").json(path)


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    glob: str | None = None,
) -> DataFrame:
    """CSV scan with the same schema-first stance as scan_jsonl
    (inference costs a full extra pass; headers alone don't give
    types). Recursive like every sibling scanner — nested shard
    layouts (path/source=x/part-*.csv) are read fully, not silently
    truncated to the top-level directory."""
    reader = spark.read.option("header", str(header).lower()).option(
        "delimiter", delimiter
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.option("recursiveFileLookup", "true").csv(path)
