"""Sinks (SURVEY.md §2.1 S5-S8).

The FAISS index + pickle sidecar pair (reference
src/embedding_engine.py:74-99) is unified into one Parquet vector-index
table partitioned by source_file — same per-file layout, but queryable,
schema'd, and splittable.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ivf_meta(
    dim: int, n_cells: int, centroids: list[list[float]] | None, vec_col: str
) -> dict:
    """Canonical IVF-index metadata: everything a later probe must agree
    with. Centroids collapse to a short fingerprint (6-decimal-rounded
    md5) so the sidecar stays metadata-sized at any n_cells x dim;
    ``None`` means the deterministic default pseudo-random family, which
    is fully determined by (dim, n_cells)."""
    if centroids is None:
        chash = "default-family"
    else:
        canon = json.dumps(
            [[round(float(x), 6) for x in c] for c in centroids]
        )
        chash = hashlib.md5(canon.encode("utf-8")).hexdigest()
    return {
        "dim": int(dim),
        "n_cells": int(n_cells),
        "vec_col": vec_col,
        "centroid_hash": chash,
    }


def _hadoop_path_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return p, fs


def write_sidecar_text(spark: SparkSession, path: str, content: str) -> None:
    """Write a small text sidecar through the Hadoop FileSystem API, so
    the same call works on local paths and object stores (s3a://...)
    alike — no local-filesystem assumption."""
    p, fs = _hadoop_path_fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_sidecar_text(spark: SparkSession, path: str) -> str | None:
    """Read a sidecar written by ``write_sidecar_text``; None if absent."""
    p, fs = _hadoop_path_fs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    baos = spark._jvm.java.io.ByteArrayOutputStream()
    spark._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
        stream, baos, spark._jsc.hadoopConfiguration(), True
    )
    return bytes(baos.toByteArray()).decode("utf-8")


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


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Bucketed+sorted external table for co-located joins.

    Two tables bucketed by the same key into the same bucket count
    join with ZERO shuffle (sort-merge over pre-bucketed files) — the
    standard layout for fact tables that are repeatedly joined on the
    same key at 100 TB. Registered in the session catalog with explicit
    storage at ``path``.
    """
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def _guard_sidecar_append(spark, sidecar_path: str, meta: dict, mode: str) -> None:
    """Appending to an existing index with DIFFERENT quantizer params
    would pass the reader's sidecar assert (the sidecar records the new
    params) while the previously-written rows stay binned by the old
    ones — the exact silent-wrong-neighbors failure the sidecar exists
    to prevent. On mode='append', an existing sidecar must match the
    new metadata exactly; raises BEFORE any data is written."""
    if mode != "append":
        return
    existing = read_sidecar_text(spark, sidecar_path)
    if existing is not None and json.loads(existing) != meta:
        raise ValueError(
            f"append to {sidecar_path.rsplit('/', 1)[0]!r} with different "
            "quantizer parameters than the existing index sidecar; "
            "rewrite with mode='overwrite' or reuse the original "
            "centroids/codebooks"
        )


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    n_cells: int = 8,
    centroids: list[list[float]] | None = None,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist a vector corpus as an IVF inverted-list LAYOUT: parquet
    partitioned by the coarse-quantizer cell (`_cell=<k>/` directories).

    This is FAISS's inverted-list storage restated as a partitioned
    table (reference src/embedding_engine.py:74-84 persists a flat
    index): a search that probes ``nprobe`` cells prunes every other
    partition at the metadata level — the scan never opens the files
    (see operators.vectors.ann_ivf_topk_indexed, plan-asserted in
    tests/test_plans.py). Pass the same ``centroids`` (e.g. from
    ``train_ivf_centroids``) at write and search time.

    The quantizer parameters are persisted alongside the data as an
    ``_ivf_meta.json`` sidecar (underscore-prefixed, so Spark's file
    listing skips it like ``_SUCCESS``): a probe with a different
    dim / n_cells / centroid set would silently return wrong neighbors,
    so ``ann_ivf_topk_indexed`` asserts against the sidecar up front.
    """
    from ..operators.vectors import ivf_cell

    if centroids is not None:
        n_cells = len(centroids)
    meta = ivf_meta(dim, n_cells, centroids, vec_col)
    sidecar = path.rstrip("/") + "/_ivf_meta.json"
    _guard_sidecar_append(corpus.sparkSession, sidecar, meta, mode)
    (
        corpus.select(F.col(corpus_id), F.col(vec_col))
        .withColumn("_cell", ivf_cell(vec_col, dim, n_cells, centroids))
        .write.mode(mode)
        .partitionBy("_cell")
        .parquet(path)
    )
    write_sidecar_text(corpus.sparkSession, sidecar, json.dumps(meta))


def morton_key_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """Morton (Z-order) curve key: interleave the low ``bits`` bits of
    two non-negative int columns (a on even positions, b on odd). Rows
    close on the curve are close in BOTH dimensions, so sorting by the
    key clusters parquet row-group min/max stats for a AND b at once —
    the standard multi-column data-skipping layout (Delta/Iceberg
    OPTIMIZE ZORDER does the same thing).

    Emitted as one engine-portable SQL string (>>, &, <<, + behave
    identically in Spark SQL and DuckDB), so the key is
    oracle-checkable verbatim.

    Operands are CAST to BIGINT inside the generated SQL: with the
    default bits=16 the interleave shifts up to <<31, which on a
    32-bit INT column overflows into the sign bit and mis-orders the
    curve. Inputs must be non-negative; values >= 2**bits contribute
    only their low ``bits`` bits, so distinct rows can alias into the
    same curve region (clustering quality, not correctness) — pick
    ``bits`` to cover the value range.

    ``bits`` is capped at 31: at 32 the b-operand's top bit lands on
    BIGINT bit 63 (the sign), making large-b keys NEGATIVE — they sort
    FIRST and interleave unrelated ranges into the same files, which
    silently defeats min/max data skipping."""
    if not 1 <= bits <= 31:
        raise ValueError(
            f"bits must be in [1, 31] (got {bits}): bit 2*{bits}-1 "
            "would reach the BIGINT sign bit and invert the curve order"
        )
    a = f"CAST({col_a} AS BIGINT)"
    b = f"CAST({col_b} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ordered on two columns: range-partition by the
    Morton key (each output file owns a curve segment), sort within
    partitions, drop the key. A later scan filtering on EITHER column
    prunes most files from their footer min/max stats — single-column
    sorting can only ever serve one of the two predicates.
    """
    z = df.withColumn("_z", F.expr(morton_key_sql(col_a, col_b, bits)))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def pq_meta(codebooks: list[list[list[float]]]) -> dict:
    """Canonical PQ metadata: subspace layout + a 6-decimal-rounded md5
    fingerprint of the codebooks (metadata-sized at any m x ksub x dsub)."""
    canon = json.dumps(
        [[[round(float(x), 6) for x in c] for c in cb] for cb in codebooks]
    )
    return {
        "m": len(codebooks),
        "ksub": len(codebooks[0]),
        "dsub": len(codebooks[0][0]),
        "codebook_hash": hashlib.md5(canon.encode("utf-8")).hexdigest(),
    }


def write_ivfpq_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    codebooks: list[list[list[float]]],
    n_cells: int = 8,
    centroids: list[list[float]] | None = None,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist an IVF+PQ index: PQ codes (m small ints per vector, not
    the float vectors) in parquet partitioned by coarse-quantizer cell —
    FAISS's IndexIVFPQ storage restated as a partitioned table.

    At rest this is the full scale story: a probe prunes to nprobe/
    n_cells of the PARTITIONS (metadata-level, files never opened) and
    what it does scan is m bytes per vector instead of dim x 4 — the
    two reductions compound (e.g. 2-of-64 probe over 8-byte codes scans
    ~0.1% of the bytes a flat float index would). Quantizer parameters
    (IVF + PQ) persist in an ``_ivfpq_meta.json`` sidecar;
    ``ann_ivfpq_topk`` asserts against it before probing.
    """
    from ..operators.vectors import (
        _pq_one_row,
        _pq_table_encode_expr,
        ivf_cell,
    )

    if centroids is not None:
        n_cells = len(centroids)
    meta = ivf_meta(dim, n_cells, centroids, vec_col)
    meta.update(pq_meta(codebooks))
    sidecar = path.rstrip("/") + "/_ivfpq_meta.json"
    _guard_sidecar_append(corpus.sparkSession, sidecar, meta, mode)
    m = len(codebooks)
    (
        # one pass: id + codes + cell in a single projection — no
        # self-join, the corpus is read exactly once; the PQ codebook
        # rides a one-row broadcast (round-15 — constant-size plan
        # instead of m*ksub literal dot subtrees; stream partitioning,
        # and so the written file layout, is untouched)
        corpus.crossJoin(
            F.broadcast(_pq_one_row(corpus.sparkSession, codebooks))
        )
        .select(
            F.col(corpus_id),
            _pq_table_encode_expr(vec_col, m, dim // m).alias("codes"),
            ivf_cell(vec_col, dim, n_cells, centroids).alias("_cell"),
        )
        .write.mode(mode)
        .partitionBy("_cell")
        .parquet(path)
    )
    write_sidecar_text(corpus.sparkSession, sidecar, json.dumps(meta))


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 256,
) -> int:
    """Rewrite a parquet dataset into ~target_mb files (small-files
    maintenance).

    Streaming ingest with per-trigger rate caps (the reference writes one
    output per file per cycle) accumulates thousands of tiny files; at
    scale that degrades listing, scheduling, and scan throughput. Sizing
    comes from the actual on-disk bytes. Returns the number of output
    files.

    Both directions are handled: shrinking the file count is a
    shuffle-free ``coalesce``; growing it (splitting oversized files)
    needs a real ``repartition`` — ``coalesce`` can only merge existing
    partitions, so asking it for more is a silent no-op that would leave
    the big files untouched.

    Sizing uses the catalog listing (``scan_catalog``'s ``length``
    column — file-status metadata, no content read), so the same call
    works against local paths and object stores (s3a://...) alike; no
    local-filesystem assumption anywhere.
    """
    from .readers import scan_catalog

    df = spark.read.parquet(path)
    total_bytes = (
        scan_catalog(spark, path, glob="*.parquet")
        .agg(F.sum("length").alias("_bytes"))
        .collect()[0]["_bytes"]
    ) or 0
    n = int(max(1, -(-total_bytes // (target_mb * 1024 * 1024))))
    if n > df.rdd.getNumPartitions():
        df = df.repartition(n)
    else:
        df = df.coalesce(n)
    df.write.mode("overwrite").parquet(out_path)
    return n
