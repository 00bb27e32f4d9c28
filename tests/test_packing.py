"""Sequence packing (operators/packing.py): coordinate correctness
against a driver-side reference, degenerate inputs, and the
no-single-partition-stage scale contract."""

from __future__ import annotations

import pathlib
import sys

import pytest
from pyspark.sql import functions as F

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.packing import pack_sequences  # noqa: E402


def reference_pack(counts, seq_len):
    out, acc = {}, 0
    for doc_id, n in sorted(counts):
        start = acc
        last = start + max(n, 1) - 1
        out[doc_id] = (
            n,
            start,
            start // seq_len,
            last // seq_len,
            last // seq_len - start // seq_len,
            start % seq_len,
        )
        acc += n
    return out


def test_pack_matches_reference_across_partitions(spark):
    import random

    rng = random.Random(3)
    rows = [(i, rng.randint(0, 700)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    for num_parts in (1, 7):  # offsets must be partitioning-invariant
        got = {
            r.doc_id: (
                r.n_tokens, r.tok_start, r.seq_first, r.seq_last,
                r.n_splits, r.seq_offset,
            )
            for r in pack_sequences(
                df, seq_len=512, num_parts=num_parts
            ).collect()
        }
        assert got == reference_pack(rows, 512), f"num_parts={num_parts}"


def test_pack_zero_token_docs_keep_one_row(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 0), (3, 50)], ["doc_id", "n_tokens"]
    )
    got = {r.doc_id: r for r in pack_sequences(df, seq_len=64).collect()}
    assert len(got) == 3
    # doc 2 occupies no positions: doc 3 starts where doc 1 ended
    assert got[2].tok_start == 100 and got[3].tok_start == 100
    assert got[2].seq_first == got[2].seq_last and got[2].n_splits == 0


def test_pack_rejects_bad_inputs(spark):
    df = spark.createDataFrame([(1, -5)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError, match="negative"):
        pack_sequences(df)
    ok = spark.createDataFrame([(1, 5)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError, match="seq_len must be positive"):
        pack_sequences(ok, seq_len=0)


def test_pack_empty_frame(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(df).count() == 0


def test_pack_plan_has_no_single_partition_stage(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 90).alias("n_tokens")
    )
    plan = pack_sequences(df, seq_len=256)._jdf.queryExecution().explainString(
        spark.sparkContext._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "SinglePartition" not in plan
