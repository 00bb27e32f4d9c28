"""Join operators (SURVEY.md §2.3).

The centerpiece is ``asof_align`` — a fully-relational restatement of the
reference's sequential "argmin over remaining chunks + prefix consumption"
alignment loop (reference src/transcription.py:199-224).

Derivation (why this is NOT a sequential loop):
  Let chunks c_0..c_{n-1} per file be ordered with non-decreasing end
  times e_k, and segments s_0..s_{m-1} in diarization order with end
  times t_j. The reference computes, per segment,
      upto = argmin_k |e_k - t_j|   over the REMAINING chunks
  then consumes the prefix. Let g_j be the argmin over ALL chunks
  (ties -> lowest k, matching np.argmin). One can show the consumed
  boundary obeys b_j = max(g_j, b_{j-1}+1)  (if the global nearest was
  already consumed, the nearest remaining chunk is the first remaining
  one, because |e_k - t_j| is non-decreasing for k >= g_j). Unrolling:
      b_j = j + max_{i<=j} (g_i - i)
  — a running max, i.e. a plain window function. Chunk k is then
  assigned to segment j iff b_{j-1} < k <= b_j, and segments whose
  range is empty (transcript exhausted -> reference breaks) emit no row.

This keeps alignment distributed (parallel across files, window + range
join within a file) with zero driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_align(
    chunks: DataFrame,
    segments: DataFrame,
    file_col: str = "file",
    chunk_order: str = "chunk_id",
    seg_order: str = "seg_id",
) -> DataFrame:
    """Align transcript chunks to diarization segments.

    chunks:   (file, <chunk_order>, text, t_start, t_end, confidence)
              t_end must be non-decreasing in chunk order within a file.
    segments: (file, <seg_order>, speaker, spk_end)

    Returns one row per segment that consumed >= 1 chunk:
      (file, seg_id, speaker, text, t_start, t_end, confidence)
    with text = space-joined stripped chunk texts in chunk order,
    t_start = first assigned chunk's start, t_end = last assigned
    chunk's end, confidence = mean(coalesce(confidence, 1.0))
    (reference src/transcription.py:206-218).

    Null chunk end times are dropped first (reference :200 builds
    end_timestamps over non-null ends only).
    """
    wc = Window.partitionBy(file_col).orderBy(chunk_order)
    c = (
        chunks.filter(F.col("t_end").isNotNull())
        .withColumn("_k", F.row_number().over(wc) - 1)
        .select(
            F.col(file_col).alias("_file"),
            "_k",
            F.trim(F.col("text")).alias("_text"),
            F.col("t_start").alias("_t0"),
            F.col("t_end").alias("_t1"),
            F.coalesce(F.col("confidence"), F.lit(1.0)).alias("_conf"),
        )
    )

    ws = Window.partitionBy(file_col).orderBy(seg_order)
    s = segments.withColumn("_j", F.row_number().over(ws) - 1).select(
        F.col(file_col).alias("_sfile"),
        "_j",
        F.col(seg_order).alias("_seg_id"),
        "speaker",
        F.col("spk_end").alias("_te"),
    )

    # g_j: globally nearest chunk per segment (ties -> lowest chunk index,
    # matching np.argmin first-match). Per-file pair join: |S|x|C| stays
    # bounded per file; files parallelize across the cluster. seg_id and
    # speaker ride along as group keys (same cardinality as (_sfile,_j))
    # so the segment side is scanned exactly once — no rejoin later.
    pairs = s.join(c, s["_sfile"] == c["_file"], "inner").select(
        "_sfile",
        "_j",
        "_seg_id",
        "speaker",
        "_k",
        F.abs(F.col("_t1") - F.col("_te")).alias("_d"),
    )
    nearest = pairs.groupBy("_sfile", "_j", "_seg_id", "speaker").agg(
        F.min(F.struct("_d", "_k")).getField("_k").alias("_g")
    )

    # b_j = j + running max(g_i - i); empty ranges drop out of the join.
    wj = Window.partitionBy("_sfile").orderBy("_j")
    bounds = nearest.withColumn(
        "_b",
        F.col("_j")
        + F.max(F.col("_g") - F.col("_j")).over(
            wj.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("_lo", F.coalesce(F.lag("_b").over(wj) + 1, F.lit(0)))

    assigned = bounds.join(
        c,
        (bounds["_sfile"] == c["_file"])
        & (c["_k"] >= bounds["_lo"])
        & (c["_k"] <= bounds["_b"]),
        "inner",
    )

    return (
        assigned.groupBy("_sfile", "_j", "_seg_id", "speaker")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_k", "_text"))),
                    lambda x: x["_text"],
                ),
                " ",
            ).alias("text"),
            F.min_by("_t0", "_k").alias("t_start"),
            F.max_by("_t1", "_k").alias("t_end"),
            F.avg("_conf").alias("confidence"),
        )
        .select(
            F.col("_sfile").alias(file_col),
            F.col("_seg_id").alias("seg_id"),
            "speaker",
            "text",
            "t_start",
            "t_end",
            "confidence",
        )
    )


def anti_join_ledger(
    candidates: DataFrame, ledger: DataFrame, key: str = "key"
) -> DataFrame:
    """Skip already-processed keys (reference src/aws_bucket.py:180).

    left_anti against the ledger; the ledger side is broadcast when small
    (Catalyst/AQE decides; at 100 TB keep the ledger compact or switch to
    the streaming checkpoint which tracks files natively).
    """
    return candidates.join(F.broadcast(ledger.select(key).distinct()), key, "left_anti")


def broadcast_lookup(
    facts: DataFrame, dim: DataFrame, key: str, how: str = "inner"
) -> DataFrame:
    """Dict-lookup join (reference src/embedding_engine.py:82,96-99) as an
    explicit broadcast hash join — no shuffle of the fact side."""
    return facts.join(F.broadcast(dim), key, how)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: fact keys salted into ``salt`` sub-keys,
    the dimension side replicated once per salt value.

    For hot keys (one key = one straggler task in a plain shuffle join)
    this spreads each key over ``salt`` reducers at the cost of a
    ``salt``x dimension replication — the classic remedy when AQE's
    skew-join split isn't available (e.g. the skewed side feeds an
    aggregation that blocks the AQE rewrite). Keys must be non-null on
    the fact side (null never matches an equi-join anyway).
    """
    f = facts.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")


def positional_zip_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Pair rows by position (reference src/main.py:75 ``zip``).

    Generic distributed form: monotonically-ordered row_number on both
    sides + equi-join. Requires an explicit ordering column on each side
    named '_ord'; callers who have a natural key should join on it
    instead (carrying the key beats positional pairing at scale).
    """
    wl = Window.orderBy("_ord")
    l = left.withColumn("_rn", F.row_number().over(wl))
    r = right.withColumn("_rn", F.row_number().over(wl))
    return l.join(r.withColumnRenamed("_ord", "_ord_r"), "_rn", "inner")
