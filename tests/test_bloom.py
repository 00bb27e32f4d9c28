"""Bloom-filter membership + exact anti-join (operators/bloom.py).

Replaces the reference's driver-side processed-set check
(`/root/reference/src/aws_bucket.py` tracked-files ledger) with a
broadcast bitmap whose build is a bounded groupBy(word).bit_or shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.operators import bloom


def test_bloom_params_shape():
    m, k = bloom.bloom_params(1000, 0.01)
    assert m % 64 == 0
    assert m >= 9000  # ~9.6 bits/item at 1% fpp
    assert 5 <= k <= 9
    # degenerate inputs stay usable
    assert bloom.bloom_params(0) == (64, 1)
    with pytest.raises(ValueError):
        bloom.bloom_params(10, 1.5)


def test_no_false_negatives_and_bounded_fpp(spark):
    members = spark.range(0, 2000).select(F.col("id").alias("k"))
    bitmap, m, k = bloom.build_bloom(members, "k", fpp=0.01)
    # every member must test positive
    probed = bloom.with_bloom_contains(members, bitmap, m, k, "k")
    assert probed.filter(~F.col("_bloom_maybe")).count() == 0
    # non-members: false-positive rate near the configured 1%
    outsiders = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    fp = (
        bloom.with_bloom_contains(outsiders, bitmap, m, k, "k")
        .filter(F.col("_bloom_maybe"))
        .count()
    )
    assert fp / 10_000 < 0.05  # generous margin over the 1% design point


def test_bloom_anti_join_exact(spark):
    # duplicates on the probe side + overlap with the key set: result
    # must be bit-identical to the plain left-anti join
    left = spark.createDataFrame(
        [(i % 700, f"p{i}") for i in range(2000)], ["k", "payload"]
    )
    keys = spark.range(0, 350).select(F.col("id").alias("k"))
    got = bloom.bloom_anti_join(left, keys, "k", fpp=0.2)  # high fpp: force recheck path
    want = left.join(keys, "k", "left_anti")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_anti_join_distinct_key_col_name(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    keys = spark.createDataFrame([(2,), (9,)], ["other"])
    got = bloom.bloom_anti_join(left, keys, "k", key_col="other")
    assert sorted(r.k for r in got.collect()) == [1, 3]


def test_bloom_anti_join_plan_shape(spark):
    """The definite-out branch (Bloom says no) must reach the output
    without any Exchange: the bitmap probe is a narrow filter, so rows
    that fail it bypass every shuffle. Only the maybe branch joins.
    Built with pinning DISABLED to see the full lineage — in production
    the flagged frame is pinned so the scan + k-hash UDF evaluate once
    for both branches, and the plan shows the checkpoint scan instead."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.pinning import pinning_disabled

    left = spark.range(0, 10_000).select(F.col("id").alias("k"))
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    with pinning_disabled():
        out = bloom.bloom_anti_join(left, keys, "k")
        jvm = spark.sparkSession._jvm if hasattr(spark, "sparkSession") else spark.sparkContext._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = out._jdf.queryExecution().explainString(mode)
    assert "ArrowEvalPython" in plan  # vectorized probe, not row-at-a-time
    # union of (filtered scan) and (recheck join): the first union child
    # must contain no Exchange — locate the subtree between Union and
    # the join branch
    assert "Union" in plan
    first_branch = plan.split("Union")[1].split("Join")[0]
    assert "Exchange" not in first_branch


def test_bloom_anti_join_mixed_numeric_types(spark):
    """BIGINT keys vs DOUBLE probe: the join coerces to a common type,
    so the Bloom hash must too — a member row must never slip through
    as a false negative (reviewed bug: '1' vs '1.0' string hashes)."""
    left = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (3.5, "c")], ["k", "v"]
    )
    keys = spark.createDataFrame([(1,), (3,)], "k long")
    got = sorted(r.v for r in bloom.bloom_anti_join(left, keys, "k").collect())
    want = sorted(
        r.v for r in left.join(keys.withColumnRenamed("k", "kk"),
                               F.col("k") == F.col("kk"), "left_anti").collect()
    )
    assert got == want == ["b", "c"]


def test_bloom_contains_rejects_existing_out_col(spark):
    df = spark.createDataFrame([(1, True)], ["k", "_bloom_maybe"])
    keys = spark.range(5).select(F.col("id").alias("k"))
    bitmap, m, k = bloom.build_bloom(keys, "k")
    with pytest.raises(ValueError, match="_bloom_maybe"):
        bloom.with_bloom_contains(df, bitmap, m, k, "k")
    # bloom_anti_join must still work and preserve the caller's column
    out = bloom.bloom_anti_join(df, keys, "k")
    assert out.columns == ["k", "_bloom_maybe"]
    assert out.count() == 0


def test_bloom_anti_join_rejects_string_vs_numeric_key(spark):
    """Round-5 advisory: a STRING probe vs BIGINT key would join-coerce
    both to DOUBLE while the Bloom hashes raw strings — a false negative
    the recheck never sees. The precondition is now enforced."""
    left = spark.createDataFrame([("1.0", "a"), ("2.5", "b")], ["k", "v"])
    keys = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="equal types or both be numeric"):
        bloom.bloom_anti_join(left, keys, "k")


def test_build_bloom_hll_sizing(spark):
    """No expected_items -> HLL-estimated distinct count (+30% margin)
    sizes the bitmap: zero false negatives, fpp near target, and m in
    the right ballpark for ~3000 distinct keys. Duplicate keys must NOT
    inflate m (distinct count, not row count, is the sizing quantity)."""
    members = spark.range(0, 3000).select(F.col("id").alias("k"))
    bitmap, m, k = bloom.build_bloom(members, "k", fpp=0.01)
    lo, _ = bloom.bloom_params(int(3000 * 0.7), 0.01)
    hi, _ = bloom.bloom_params(int(3000 * 2.0), 0.01)
    assert lo <= m <= hi, (lo, m, hi)
    probed = bloom.with_bloom_contains(members, bitmap, m, k, "k")
    assert probed.filter(~F.col("_bloom_maybe")).count() == 0
    outsiders = spark.range(5_000_000, 5_010_000).select(F.col("id").alias("k"))
    fp = (
        bloom.with_bloom_contains(outsiders, bitmap, m, k, "k")
        .filter(F.col("_bloom_maybe"))
        .count()
    )
    assert fp / 10_000 < 0.05
    # duplicate-heavy ledger: same distinct keys 10x over -> same-size m
    dup = members.crossJoin(spark.range(10).select(F.lit(1).alias("_d"))).select("k")
    _, m_dup, _ = bloom.build_bloom(dup, "k", fpp=0.01)
    assert m_dup <= hi, (m_dup, hi)


def test_build_bloom_empty_keys(spark):
    keys = spark.range(0).select(F.col("id").alias("k"))
    bitmap, m, k = bloom.build_bloom(keys, "k")
    assert (bitmap == 0).all() and m == 64 and k == 1
    # the all-zero bitmap means "definitively absent": no probe row may
    # come back maybe-present
    probe = spark.range(5).select(F.col("id").alias("k"))
    flagged = bloom.with_bloom_contains(probe, bitmap, m, k, "k")
    assert flagged.filter(F.col("_bloom_maybe")).count() == 0


def test_build_bloom_rejects_nonpositive_expected_items(spark):
    """Round-6 advisory: an explicit expected_items<=0 with non-empty
    keys must raise, NOT return the all-zero 'definitively absent'
    bitmap — bloom_anti_join never rechecks Bloom-negative rows, so the
    shortcut would let real members survive the anti-join."""
    keys = spark.range(5).select(F.col("id").alias("k"))
    for bad in (0, -3):
        with pytest.raises(ValueError, match="expected_items must be positive"):
            bloom.build_bloom(keys, "k", expected_items=bad)
        with pytest.raises(ValueError, match="expected_items must be positive"):
            bloom.bloom_anti_join(keys, keys, "k", expected_items=bad)
    # (the measured-empty shortcut is test_build_bloom_empty_keys' subject)
