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

Both lookups are sorted merges, not joins: g_j comes from a union of
chunk-ends and segment-ends with predecessor/successor window fills
(the nearest sorted value is always one of the two), and the chunk ->
segment assignment exploits that b_j is strictly increasing, so each
chunk's owner is the first boundary >= its index — another union +
forward fill. Cost is O((S+C) log(S+C)) per file instead of the naive
|S|x|C| pair join; files parallelize across the cluster and there is
zero driver-side iteration.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# range_parted_offsets: max partition count for which the partition->
# prefix-offset mapping is inlined as a literal create_map (O(n) per-row
# GetMapValue scan + 2n-node Catalyst expression — fine at local-mode
# partition counts, a blowup at cluster-scale ones). Above this, the
# mapping is broadcast-joined instead (constant per-row probe).
OFFSETS_MAP_MAX = 1024


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
    end_timestamps over non-null ends only); null SEGMENT end times are
    dropped symmetrically — unfiltered, a NULL spk_end resolves through
    the nulls-first/nulls-last window fills to the file's SMALLEST
    chunk end, silently stealing a chunk from the next segment and
    shifting every later segment's text by one.

    Expression transport (round 16, the minhash_signature lesson): the
    whole alignment is emitted as selectExpr/SQL strings — the Column
    API costs one py4j round trip per node, and this operator's ~1500
    nodes measured ~0.9 s of pure driver chatter per construction at
    bench scale. The parsed expressions are semantically identical
    (same windows, frames, struct fills, casts); the doubles are cast
    explicitly because bare SQL ``1.0`` parses as decimal.
    """
    segments = segments.filter("spk_end IS NOT NULL")
    # the file->_file rename lives in its OWN projection ABOVE the
    # row_number window: alias-aware output partitioning rewrites
    # hash(file) -> hash(_file) only when the alias sits directly over
    # the exchange's output — fused into the window projection, the
    # partitioning dies at the rename and the merged union below pays
    # a fourth exchange (measured: plan_guard caught Exchange 3 -> 4)
    c = chunks.filter("t_end IS NOT NULL").selectExpr(
        "*",
        f"row_number() OVER (PARTITION BY `{file_col}` "
        f"ORDER BY `{chunk_order}`) - 1 AS _k",
    ).selectExpr(
        f"`{file_col}` AS _file",
        "_k",
        "trim(text) AS _text",
        "t_start AS _t0",
        "t_end AS _t1",
        "coalesce(confidence, CAST(1.0 AS DOUBLE)) AS _conf",
    )

    # preserve the caller's seg-id dtype through the unions below — a
    # hard cast to long would null out string/decimal seg ids
    seg_sql = segments.schema[seg_order].dataType.simpleString()
    t0_sql = c.schema["_t0"].dataType.simpleString()
    t1_sql = c.schema["_t1"].dataType.simpleString()
    s = segments.selectExpr(
        "*",
        f"row_number() OVER (PARTITION BY `{file_col}` "
        f"ORDER BY `{seg_order}`) - 1 AS _j",
    ).selectExpr(
        f"`{file_col}` AS _sfile",
        "_j",
        f"`{seg_order}` AS _seg_id",
        "speaker",
        "spk_end AS _te",
    )

    # g_j: globally nearest chunk per segment (ties -> lowest chunk index,
    # matching np.argmin first-match). NOT an |S|x|C| pair join — since
    # chunk ends are non-decreasing, the nearest end is either the
    # predecessor (last end <= te) or the successor (first end > te), so
    # a sorted merge (union + window fills) finds it in O((S+C) log) per
    # file. Tie (equidistant) -> predecessor, whose index is smaller;
    # equal end values -> the run's first index, resolved INSIDE the
    # fills by carrying (end, index) structs: max(struct(e, -k)) picks
    # the largest end then the smallest index, min(struct(e, k)) the
    # smallest end then the smallest index — no separate min-k-per-end
    # aggregate and no join-back needed (that branch re-scanned the
    # chunk table and cost an extra exchange + window + two aggregates
    # + a broadcast join).
    merged = c.selectExpr(
        "_file",
        "_t1 AS _t",
        "0 AS _typ",
        "_t1 AS _ce",
        "_k AS _ck",
        "CAST(NULL AS BIGINT) AS _j",
        f"CAST(NULL AS {seg_sql}) AS _seg_id",
        "CAST(NULL AS STRING) AS speaker",
    ).unionByName(
        s.selectExpr(
            "_sfile AS _file",
            "_te AS _t",
            "1 AS _typ",
            f"CAST(NULL AS {t1_sql}) AS _ce",
            "CAST(NULL AS BIGINT) AS _ck",
            "_j",
            "_seg_id",
            "speaker",
        )
    )
    # chunks sort before segments at equal time (_typ 0 < 1), so an
    # end == te lands on the predecessor side (distance 0, lowest index).
    #
    # Both fills use GROWING frames (unboundedPreceding..currentRow),
    # which Spark evaluates incrementally in O(n); the successor comes
    # from a reverse-ordered growing frame because a
    # (offset, unboundedFollowing) frame re-scans to the partition end
    # for every row — O(n^2), measured 74s on a single 30k-row file.
    # The segment's own row holds a null _ce, so including currentRow in
    # the reverse frame is harmless, and equal-time chunks sort after
    # the segment in reverse order, keeping the successor strictly later.
    # Chunk-only (e, k) structs — null on segment rows so max/min skip
    # them, like last(ignorenulls) did for the scalar fills. -_ck is
    # safe: _k is a row_number-derived index (>= 0, far from overflow).
    grow = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    pred = (
        "max(CASE WHEN _typ = 0 THEN named_struct('e', _ce, 'nk', -_ck) END)"
        f" OVER (PARTITION BY _file ORDER BY _t, _typ {grow})"
    )
    succ = (
        "min(CASE WHEN _typ = 0 THEN named_struct('e', _ce, 'k', _ck) END)"
        f" OVER (PARTITION BY _file ORDER BY _t DESC, _typ DESC {grow})"
    )
    # segments in chunk-less files have null pred AND succ -> null _g
    # -> dropped by the filter, matching the reference's no-transcript
    # break (previously an inner join against first_k did the drop)
    nearest = (
        merged.selectExpr(
            "_file", "_j", "_seg_id", "speaker", "_t", "_typ",
            f"{pred} AS _pred", f"{succ} AS _succ",
        )
        .filter("_typ = 1")
        .selectExpr(
            "_file",
            "_j",
            "_seg_id",
            "speaker",
            "CASE WHEN _pred IS NULL THEN _succ.k"
            " WHEN _succ IS NULL THEN -_pred.nk"
            " WHEN (_t - _pred.e) <= (_succ.e - _t) THEN -_pred.nk"
            " ELSE _succ.k END AS _g",
        )
        .filter("_g IS NOT NULL")
    )

    # b_j = j + running max(g_i - i): consumed-prefix boundary per segment.
    bounds = nearest.selectExpr(
        "*",
        f"_j + max(_g - _j) OVER (PARTITION BY _file ORDER BY _j {grow})"
        " AS _b",
    )

    # b is strictly increasing (b_j - b_{j-1} >= 1), so the segment
    # ranges (prev_b, b] tile the chunk indices contiguously and each
    # chunk's owner is the first segment with b >= k — again a sorted
    # merge, not a range join. Chunks past the last boundary stay
    # unassigned (reference: leftovers after the final segment are
    # dropped), as are chunk-less segments (empty range -> no rows).
    bm = c.selectExpr(
        "_file",
        "_k AS _pos",
        "0 AS _typ",
        "_k",
        "_text",
        "_t0",
        "_t1",
        "_conf",
        "CAST(NULL AS BIGINT) AS _j",
        f"CAST(NULL AS {seg_sql}) AS _seg_id",
        "CAST(NULL AS STRING) AS speaker",
    ).unionByName(
        bounds.selectExpr(
            "_file",
            "_b AS _pos",
            "1 AS _typ",
            "CAST(NULL AS BIGINT) AS _k",
            "CAST(NULL AS STRING) AS _text",
            f"CAST(NULL AS {t0_sql}) AS _t0",
            f"CAST(NULL AS {t1_sql}) AS _t1",
            "CAST(NULL AS DOUBLE) AS _conf",
            "_j",
            "_seg_id",
            "speaker",
        )
    )
    # same O(n) reverse-growing-frame trick as the nearest-end fill: the
    # owning boundary (first bound with b >= k in forward order) is the
    # last non-null in reverse order; at equal pos the bound sorts first
    # in reverse, so a chunk exactly on a boundary is assigned to it.
    # One struct-valued last() instead of three scalar fills.
    owner = (
        "last(CASE WHEN _typ = 1 THEN"
        " named_struct('_j', _j, '_seg_id', _seg_id, 'speaker', speaker)"
        " END, true)"
        f" OVER (PARTITION BY _file ORDER BY _pos DESC, _typ DESC {grow})"
    )
    assigned = (
        bm.selectExpr("*", f"{owner} AS _own")
        .filter("_typ = 0 AND _own._j IS NOT NULL")
        .selectExpr(
            "_file AS _sfile",
            "_own._j AS _j",
            "_own._seg_id AS _seg_id",
            "_own.speaker AS speaker",
            "_k",
            "_text",
            "_t0",
            "_t1",
            "_conf",
        )
    )

    return (
        assigned.groupBy("_sfile", "_j", "_seg_id", "speaker")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(_k, _text))), x -> x._text), ' ')"
            ).alias("text"),
            F.expr("min_by(_t0, _k)").alias("t_start"),
            F.expr("max_by(_t1, _k)").alias("t_end"),
            F.avg("_conf").alias("confidence"),
        )
        .selectExpr(
            f"_sfile AS `{file_col}`",
            "_seg_id AS seg_id",
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

    left_anti against the ledger. No broadcast hint: a ledger grows
    without bound (every key ever processed), so AQE must pick the
    strategy — broadcast while it fits, shuffle join after. At 100 TB
    prefer the streaming checkpoint, which tracks files natively.
    """
    return candidates.join(ledger.select(key).distinct(), key, "left_anti")


def broadcast_lookup(
    facts: DataFrame, dim: DataFrame, key: str, how: str = "inner"
) -> DataFrame:
    """Dict-lookup join (reference src/embedding_engine.py:82,96-99) as an
    explicit broadcast hash join — no shuffle of the fact side."""
    return facts.join(F.broadcast(dim), key, how)


def _contains_map(dt) -> bool:
    """True when ``dt`` is or nests a MapType anywhere (array element,
    struct field, map key/value) — the exact recursion xxhash64 uses to
    reject unhashable inputs, so the salted-join column filter and the
    hash agree on every schema."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


# Joins where replicating the dim side `salt` times cannot duplicate
# output rows: every dim row's copies either all match the same fact
# sub-keys (inner/left/semi) or are never emitted on their own.
# left_anti is also safe: the dim copy with the fact row's own salt
# exists iff the key exists at all, so the anti result is exactly
# facts-without-key — dim replication can't duplicate fact rows.
_SALT_SAFE_HOW = {
    "inner",
    "left",
    "leftouter",
    "left_outer",
    "leftsemi",
    "left_semi",
    "leftanti",
    "left_anti",
}


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

    ``how`` is restricted to fact-preserving joins (inner/left/
    left_semi/left_anti — the anti form covers the skewed ledger skip-
    join): any join that can emit unmatched DIM rows (right/full) would
    emit each one ``salt`` times because the dim side is replicated —
    a silent row duplication, so it raises.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched dim rows "
            f"{salt}x (dim side is replicated per salt); use one of "
            f"{sorted(_SALT_SAFE_HOW)} or an AQE skew join instead"
        )
    # deterministic salt — pmod(xxhash64(row)), NOT rand(): rand()
    # re-evaluates over a nondeterministically-ordered input when a
    # stage recomputes after a shuffle-fetch failure (the
    # indeterminate-stage class), re-dealing salts so the retried join
    # can double-count or lose rows; a full-row hash deals identically
    # on every attempt (exact-duplicate rows share a salt — harmless
    # unless a hot key is also exactly duplicated, which no row-level
    # salt could split anyway). Map columns aren't hashable — excluded
    # RECURSIVELY (xxhash64's own MapType rejection walks nested types,
    # so an array<map<...>> or struct-wrapped map would pass a naive
    # top-level check and blow up at plan time); if every column nests
    # a map the key itself is the fallback (key is an equi-join key,
    # so it can never be a map).
    hashable = [
        c
        for c in facts.schema.fields
        if not _contains_map(c.dataType)
    ]
    hashable = [c.name for c in hashable]
    f = facts.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in (hashable or [key])]),
            F.lit(int(salt)),
        ).cast("int"),
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")


# Above this many hot-key hashes, hot_salted_count_join stops inlining
# them as IN-list expression literals (py4j shipping cost + serialized
# plan size on BOTH join sides) and broadcasts a tiny hot-hash frame
# instead. InSet evaluation is O(1) either way; this bounds the PLAN.
HOT_INSET_MAX = 1024


def hot_salted_count_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    count_col: str,
    salt_src: str | Sequence[str],
    hot_threshold: int = 4096,
    n_salts: int = 16,
    null_safe: bool = False,
    max_hot_keys: int = 100_000,
    hot_hashes_override: Sequence[int] | None = None,
) -> DataFrame:
    """Inner equi-join of a big ``probe`` against a per-key-UNIQUE
    ``build`` where ONLY the hot keys are salted — the deterministic
    skew remedy for aggregate-then-join-back operators (dedup_exact,
    span_hits) whose hot keys AQE's skew split cannot be trusted to
    catch.

    Why not just AQE: OptimizeSkewedJoin detects skew in shuffle
    BYTES, and a hot key's probe rows are maximally compressible
    (constant key, often sequential ids) — measured in
    tools/scale_probe.py ``exact_skew``: a 10%-of-corpus identical-
    digest partition compressed BELOW the median partition's bytes and
    was never split, even at a 1k threshold. Row-skew without
    byte-skew is invisible to AQE; salting splits it by construction.

    Why not ``salted_join``: that replicates the ENTIRE dim per salt —
    fine for a broadcast-scale dim, ruinous for a vocabulary-sized
    build (the dedup_exact groups frame is one row per distinct
    digest; 16x that can exceed the probe itself). Here only keys with
    ``count_col >= hot_threshold`` replicate.

    How the probe learns hotness (round 11; was a broadcast-left-join):
    the hot keys are read once from the PINNED aggregate at
    plan-construction time as ``xxhash64(key)`` longs — a driver read
    bounded by ``max_hot_keys`` (the call raises past the cap with
    guidance to raise ``hot_threshold``, instead of the round-10
    failure mode: an unbounded forced broadcast silently OOMing the
    driver). Both sides then test the SAME ``xxhash64(key) IN <set>``
    predicate (an InSet over longs, type-agnostic — works for string
    digests and struct span keys alike; xxhash64(NULL) is the constant
    seed, so the null_safe NULL group is consistent too). A cold key
    whose hash collides with a hot one is merely salted on BOTH sides
    — results stay exact; the only effect is one extra replicated
    build row per ~2^-64 collision. With NO hot keys (the common case)
    the whole operator degenerates to a plain equi-join on a constant
    salt: no broadcast exchange, no per-probe-row hot-set probe — that
    broadcast-left-join overhead was the round-10 fixed cost flagged
    on dedup_exact.

    Contract: ``build`` has exactly one row per ``key`` carrying
    ``count_col`` (a monotone proxy for probe rows per key — group
    size, distinct-doc count); at most total_probe_rows/hot_threshold
    keys can be hot, so size the threshold (and, for pathological
    corpora, ``max_hot_keys``) to the corpus. ``salt_src`` names a
    probe column — or several, hashed together — whose values spread a
    hot key's rows. The per-task bound (max rows/task per hot key ~
    count/n_salts) holds only if salt_src is high-cardinality WITHIN
    each hot key: span_hits passes (doc_id, pos) because its postings
    count is hot precisely under within-doc repetition, where doc_id
    alone is one value and would put the whole log-spam document on
    one reducer. ``null_safe`` joins NULL keys as equal (dedup_exact's
    md5(NULL) group). Output: probe columns + build's other columns;
    bookkeeping columns are dropped.

    ``build`` is pinned (an EAGER localCheckpoint on the default path —
    round-11 verdict item 5 folded the bounded hot-set read into the
    build materialization, so the aggregation lineage — often a full
    corpus pass — runs as ONE job whose checkpointed output serves the
    hot read AND the executed join build; the lazy-pin + filter-collect
    pair it replaced submitted the same stages twice). The pinned frame
    is the per-key aggregate: key + counts, orders of magnitude narrower
    than the probe it summarizes. Note the construction-time
    materialization makes this operator EAGER (it runs the build's jobs
    when called, not at the first downstream action) — bench.py times
    construction+action together, so the cost stays measured. The
    override / plan-inspection paths keep the lazy ``pin`` (no collect
    happens there, so there is nothing to fold).

    How the hot set rides back into the plan: up to ``HOT_INSET_MAX``
    hashes it is an ``IN <literals>`` predicate (Catalyst compiles it
    to an O(1) InSet) — the join-free common case. Past that, ~100k
    64-bit literals would ship through py4j into BOTH sides'
    expression trees (slow plan construction, a multi-MB serialized
    plan — the literal-centroid ceiling class of cost), so the hot set
    instead becomes a tiny one-column frame and hotness is a broadcast
    LEFT join + null test on each side. Same results either way.

    ``hot_hashes_override`` injects a synthetic hot-hash set and skips
    the construction-time read entirely — the plan-inspection seam
    (tools/plan_guard.py guards the salted plan shapes through it;
    under ``pinning_disabled`` the default path can only ever show the
    cold plan).
    """
    from .pinning import pin, pinning_is_disabled

    salt_cols = [salt_src] if isinstance(salt_src, str) else list(salt_src)
    if hot_hashes_override is not None:
        build = pin(build)
        hot_rows = [{"_hx": int(v)} for v in hot_hashes_override]
    elif pinning_is_disabled():
        # plan-inspection context (plan_guard / make_explain): the
        # construction-time hot-key read would execute the build's full
        # aggregation lineage — exactly what pinning_disabled promises
        # NOT to do. Skip it and build the cold-path plan (no hot keys
        # -> plain equi-join on a constant salt), which is also the
        # runtime plan for every gate-scale input.
        build = pin(build)
        hot_rows: list = []
    else:
        # Fold the build materialization and the hot-set read into ONE
        # aggregation pass (round-11 verdict item 5): an EAGER local
        # checkpoint runs every stage of the build's lineage in a single
        # job and pins the result; the bounded hot read below then scans
        # only the checkpointed per-key aggregate (trivial next to the
        # aggregation). The previous lazy-pin + filter-collect pair paid
        # two submissions for the same work — AQE submits the lazy
        # checkpoint's shuffle stages at .localCheckpoint() call time,
        # and the collect then ran the final stage under CollectLimit's
        # incremental partition scans on top.
        build = build.localCheckpoint(eager=True)
        hot_rows = (
            build.filter(F.col(count_col) >= hot_threshold)
            .select(F.xxhash64(F.col(key)).alias("_hx"))
            .limit(max_hot_keys + 1)
            .collect()
        )
    if len(hot_rows) > max_hot_keys:
        raise ValueError(
            f"hot_salted_count_join: more than {max_hot_keys} keys have "
            f"{count_col} >= {hot_threshold}; the hot-key set must stay "
            "driver-resident. Raise hot_threshold (each hot key already "
            f"carries >= {hot_threshold} probe rows, so fewer keys can "
            "be hot) or max_hot_keys if the driver has the memory."
        )
    hot_vals = sorted({r["_hx"] for r in hot_rows})
    if hot_vals:
        probe_salt_for = lambda hot: (  # noqa: E731
            F.when(
                hot,
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in salt_cols]),
                    F.lit(n_salts),
                ).cast("int"),
            ).otherwise(F.lit(0))
        )
        build_salts_for = lambda hot: F.when(  # noqa: E731
            hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
        ).otherwise(F.array(F.lit(0)))
        if len(hot_vals) <= HOT_INSET_MAX:
            def _is_hot(c):
                return F.xxhash64(c).isin(hot_vals)

            salted_probe = probe.withColumn(
                "_salt", probe_salt_for(_is_hot(F.col(key)))
            )
            salted_build = build.withColumn(
                "_salt", F.explode(build_salts_for(_is_hot(F.col(key))))
            )
        else:
            # large hot set: a broadcast join against a tiny hot-hash
            # frame instead of shipping every hash as an expression
            # literal through py4j into both sides' plans
            hot_df = probe.sparkSession.createDataFrame(
                [(int(v),) for v in hot_vals], "_hx bigint"
            )

            def _mark(df, salt_expr_for):
                marked = df.join(
                    F.broadcast(hot_df),
                    F.xxhash64(F.col(key)) == F.col("_hx"),
                    "left",
                )
                return marked.withColumn(
                    "_salt", salt_expr_for(F.col("_hx").isNotNull())
                ).drop("_hx")

            salted_probe = _mark(probe, probe_salt_for)
            salted_build = _mark(
                build, lambda hot: F.explode(build_salts_for(hot))
            )
    else:
        salted_probe = probe.withColumn("_salt", F.lit(0))
        salted_build = build.withColumn(
            "_salt", F.explode(F.array(F.lit(0)))
        )
    if not null_safe:
        return salted_probe.join(salted_build, [key, "_salt"], "inner").drop("_salt")
    b_cols = [c for c in build.columns if c != key]
    joined = salted_probe.alias("_sp").join(
        salted_build.alias("_sb"),
        F.col(f"_sp.{key}").eqNullSafe(F.col(f"_sb.{key}"))
        & (F.col("_sp._salt") == F.col("_sb._salt")),
        "inner",
    )
    return joined.select(
        *[F.col(f"_sp.{c}") for c in probe.columns],
        *[F.col(f"_sb.{c}") for c in b_cols],
    )


def _resolve_num_parts(df: DataFrame, num_parts: int | None) -> int:
    """Shared partition-count resolution for the range-parted offset
    helpers: explicit override, else spark.sql.shuffle.partitions —
    which can be non-numeric ('auto' under AQE auto-optimized shuffle
    on some platforms) — else the input's own parallelism, else the
    cluster default. One copy so the twins cannot drift."""
    if num_parts:
        return num_parts
    spark = df.sparkSession
    conf = spark.conf.get("spark.sql.shuffle.partitions", "")
    return (
        int(conf)
        if conf.isdigit()
        else (df.rdd.getNumPartitions() or spark.sparkContext.defaultParallelism)
    )


def range_parted_offsets(
    df: DataFrame,
    order_cols: list,
    num_parts: int | None = None,
    weight_col: str | None = None,
):
    """Shared machinery for distributed global prefix sums: range-
    partition ``df`` on ``order_cols``, pin the exchange, and return
    ``(parted, off)`` — the partitioned frame (with a ``_part`` column)
    and a Column mapping each row's partition to the total weight of
    all PRECEDING partitions (row count when ``weight_col`` is None,
    else ``sum(weight_col)``). Only one stats row per partition reaches
    the driver — the zipWithIndex trick generalized to weighted prefix
    sums. Consumers add a per-partition running value (window or
    row_number partitioned by ``_part``) on top.

    The partition->offset mapping rides back into the plan one of two
    ways, switched on ``OFFSETS_MAP_MAX``: at local-mode partition
    counts it is a literal ``create_map`` (join-free plan); above the
    threshold it is a broadcast join of the tiny (part, offset) frame —
    ``parted`` then carries a ``_poff`` column and ``off`` references
    it. Consumers must drop BOTH ``_part`` and ``_poff`` when done
    (``drop`` ignores absent columns, so unconditionally dropping both
    is safe on either path).

    The range exchange is pinned with a local checkpoint so the stats
    job and the downstream query read the same materialized partitions
    (partition ids must agree between the two jobs). The checkpoint is
    LAZY (round-15, guide §1): the stats collect is the first action,
    so the persist rides that scan instead of paying a separate
    eager-materialization pass over the full frame — one less job and
    one less full-data pass per consumer; downstream actions read the
    blocks the stats job persisted, so partition ids still agree.

    Honest plan note: consumers pay TWO full-data exchanges of ``df`` —
    the range exchange (hidden inside the eager checkpoint job) plus a
    hash exchange on ``_part`` that EnsureRequirements inserts for the
    downstream window, because the checkpointed scan can no longer
    prove partition-id clustering. Both move only the frame being
    indexed — callers should pass the NARROW projection (ids + weights,
    ~16 bytes/row; even a 10^10-doc corpus shuffles ~160 GB twice, not
    the corpus itself) and join coordinates back by id if wide payloads
    are needed downstream.

    When ``weight_col`` is set, the stats job also validates it:
    negative, NULL, or NON-INTEGRAL weights raise (negatives/NULLs
    would silently corrupt every downstream offset — NULLs are skipped
    by sum() so successors shift as if the row weighed 0 while the row
    itself gets NULL coordinates; fractional weights would truncate
    differently on the literal-map vs broadcast-offsets path, making
    offsets depend on the partition count).
    """
    spark = df.sparkSession
    n = _resolve_num_parts(df, num_parts)
    parted = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_part", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    if weight_col is None:
        stats = (
            parted.groupBy("_part").agg(F.count("*").alias("_w")).collect()
        )
    else:
        stats = (
            parted.groupBy("_part")
            .agg(
                F.sum(weight_col).alias("_w"),
                F.min(weight_col).alias("_m"),
                (F.count("*") - F.count(weight_col)).alias("_nulls"),
                F.sum(
                    (F.col(weight_col) != F.floor(weight_col)).cast("int")
                ).alias("_frac"),
            )
            .collect()
        )
        bad = [r["_part"] for r in stats if r["_m"] is not None and r["_m"] < 0]
        if bad:
            raise ValueError(
                f"range_parted_offsets: negative values in {weight_col!r} "
                f"(partitions {sorted(bad)[:5]}); weights must be >= 0"
            )
        nulls = [r["_part"] for r in stats if r["_nulls"]]
        if nulls:
            raise ValueError(
                f"range_parted_offsets: NULL values in {weight_col!r} "
                f"(partitions {sorted(nulls)[:5]}); coalesce them to 0 "
                "explicitly if that is the intended weight"
            )
        frac = [r["_part"] for r in stats if r["_frac"]]
        if frac:
            raise ValueError(
                f"range_parted_offsets: non-integral values in "
                f"{weight_col!r} (partitions {sorted(frac)[:5]}); prefix "
                "offsets are integer counts and fractional weights would "
                "silently truncate — round or cast the weight column "
                "explicitly"
            )
    sums = {r["_part"]: (r["_w"] or 0) for r in stats}
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(sums):
        offsets[p] = acc
        acc += sums[p]
    if not offsets:
        return parted, F.lit(0)
    if len(offsets) <= OFFSETS_MAP_MAX:
        # small partition counts: a literal map keeps the plan join-free
        # (the per-row GetMapValue scan over <= OFFSETS_MAP_MAX entries
        # is cheaper than a join, and local-mode plan shapes stay pinned)
        off = F.element_at(
            F.create_map(
                *[F.lit(v) for p in sorted(offsets) for v in (p, offsets[p])]
            ),
            F.col("_part"),
        )
        return parted, off
    # Cluster-scale partition counts: element_at(create_map(2n literals))
    # is an O(n) PER-ROW scan of the expression tree AND a Catalyst
    # expression blowup (the tree itself has 2n nodes) — at the 10^4-10^5
    # shuffle partitions a 100 TB corpus implies, both bite. Join the
    # offsets back via a broadcast of the tiny (part, offset) frame
    # instead: one BroadcastHashJoin, constant per-row probe, plan size
    # independent of partition count.
    offs_df = spark.createDataFrame(
        [(int(p), int(offsets[p])) for p in sorted(offsets)],
        "_part int, _poff long",
    )
    parted = parted.join(F.broadcast(offs_df), "_part")
    return parted, F.col("_poff")


def range_parted_offsets_grouped(
    df: DataFrame,
    group_cols: list,
    order_cols: list,
    num_parts: int | None = None,
    weight_col: str | None = None,
):
    """``range_parted_offsets`` with PER-GROUP prefix offsets: range-
    partition on ``group_cols + order_cols`` (each group occupies a
    contiguous partition span) and return ``(parted, off)`` where
    ``off`` maps each row's (partition, group) to the total weight of
    preceding partitions WITHIN THE SAME GROUP. Consumers add a window
    partitioned by ``(_part, *group_cols)`` on top and get one
    independent global prefix sum per group — the per-domain running
    token totals of ``select_token_budget_grouped`` — without ever
    funnelling a group through a single task.

    Stats collect stays metadata-sized by construction: groups are
    contiguous under the range exchange, so the per-(partition, group)
    frame holds at most ``num_parts + n_groups - 1`` rows regardless of
    data volume. The offsets always ride back as a broadcast join on
    ``(_part, *group_cols)`` (no literal-map fast path — the composite
    key would need struct literals for marginal gain); consumers drop
    ``_part`` and ``_goff`` when done. Weight validation (no negatives,
    no NULLs) matches the ungrouped helper. NULL group values form
    their own group (groupBy and the null-safe join condition both
    treat NULL as a value).
    """
    spark = df.sparkSession
    n = _resolve_num_parts(df, num_parts)
    parted = (
        df.repartitionByRange(n, *group_cols, *order_cols)
        .withColumn("_part", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    if weight_col is None:
        stats = (
            parted.groupBy("_part", *group_cols)
            .agg(F.count("*").alias("_w"))
            .collect()
        )
    else:
        stats = (
            parted.groupBy("_part", *group_cols)
            .agg(
                F.sum(weight_col).alias("_w"),
                F.min(weight_col).alias("_m"),
                (F.count("*") - F.count(weight_col)).alias("_nulls"),
                F.sum(
                    (F.col(weight_col) != F.floor(weight_col)).cast("int")
                ).alias("_frac"),
            )
            .collect()
        )
        bad = [r["_part"] for r in stats if r["_m"] is not None and r["_m"] < 0]
        if bad:
            raise ValueError(
                f"range_parted_offsets_grouped: negative values in "
                f"{weight_col!r} (partitions {sorted(bad)[:5]}); weights "
                "must be >= 0"
            )
        nulls = [r["_part"] for r in stats if r["_nulls"]]
        if nulls:
            raise ValueError(
                f"range_parted_offsets_grouped: NULL values in "
                f"{weight_col!r} (partitions {sorted(nulls)[:5]}); "
                "coalesce them to 0 explicitly if that is the intended "
                "weight"
            )
        frac = [r["_part"] for r in stats if r["_frac"]]
        if frac:
            raise ValueError(
                f"range_parted_offsets_grouped: non-integral values in "
                f"{weight_col!r} (partitions {sorted(frac)[:5]}); prefix "
                "offsets are integer counts and fractional weights would "
                "silently truncate — round or cast the weight column "
                "explicitly"
            )
    # per-group running offsets in partition order
    acc: dict[tuple, int] = {}
    rows = []
    for r in sorted(stats, key=lambda r: r["_part"]):
        g = tuple(r[c] for c in group_cols)
        rows.append((int(r["_part"]), *g, int(acc.get(g, 0))))
        acc[g] = acc.get(g, 0) + int(r["_w"] or 0)
    if not rows:
        return parted, F.lit(0).cast("long")
    offs_schema = parted.select("_part", *group_cols).schema.add(
        "_goff", "long", False
    )
    offs_df = spark.createDataFrame(rows, offs_schema)
    cond = F.col("_l._part") == F.col("_r._part")
    for c in group_cols:
        cond = cond & F.col(f"_l.{c}").eqNullSafe(F.col(f"_r.{c}"))
    parted = (
        parted.alias("_l")
        .join(F.broadcast(offs_df.alias("_r")), cond)
        .select("_l.*", F.col("_r._goff").alias("_goff"))
    )
    return parted, F.col("_goff")


def global_index(
    df: DataFrame,
    order_cols: list,
    index_col: str = "_rn",
    num_parts: int | None = None,
) -> DataFrame:
    """1-based global row index in ``order_cols`` order — distributed.

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels
    every row through a single task (Exchange SinglePartition) — the
    classic scale killer. Instead: ``range_parted_offsets`` (range
    repartition + driver-side per-partition prefix counts) plus a
    per-partition row_number. See that helper for the plan-shape and
    shuffle-volume notes.
    """
    parted, off = range_parted_offsets(df, order_cols, num_parts)
    w = Window.partitionBy("_part").orderBy(*order_cols)
    return parted.withColumn(
        index_col, (off + F.row_number().over(w)).cast("long")
    ).drop("_part", "_poff")


def positional_zip_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list | None = None,
    right_order: list | None = None,
) -> DataFrame:
    """Pair rows by position (reference src/main.py:75 ``zip``).

    Both sides get a distributed global index (``global_index``: range
    exchange + per-partition window + driver-side prefix offsets — no
    single-partition stage anywhere in the plan) and are equi-joined on
    it. Order defaults to a '_ord' column on each side; callers who
    have a natural key should join on it instead (carrying the key
    beats positional pairing at scale).

    The two sides' indexes are INDEPENDENT (separate inputs, separate
    range exchanges), but each one eagerly runs a checkpoint job plus a
    stats collect — built sequentially, the second side's jobs wait for
    the first side's stragglers. Build them from two driver threads
    instead (guide §2.6 — actions are only sequential because driver
    code calls them sequentially): same plans, same results, the two
    materializations just overlap. contextvars (the pinning switch) are
    captured explicitly because worker threads don't inherit them.
    """
    import contextvars
    from concurrent.futures import ThreadPoolExecutor

    ctx = contextvars.copy_context()
    with ThreadPoolExecutor(max_workers=2) as pool:
        fl = pool.submit(
            ctx.copy().run,
            global_index,
            left,
            left_order if left_order is not None else ["_ord"],
        )
        fr = pool.submit(
            ctx.copy().run,
            global_index,
            right,
            right_order if right_order is not None else ["_ord"],
        )
        l, r = fl.result(), fr.result()
    if "_ord" in l.columns and "_ord" in r.columns:
        r = r.withColumnRenamed("_ord", "_ord_r")
    return l.join(r, "_rn", "inner")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    lo_col: str,
    hi_col: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 600,
) -> DataFrame:
    """Point-in-interval join (t in [lo, hi)) as a bucketed EQUI-join —
    the scale-safe formulation of a range/theta join.

    Spark plans a bare `t BETWEEN lo AND hi` predicate as a
    BroadcastNestedLoopJoin (every point against every interval — O(n*m)
    and only legal while one side fits in memory). Bucketing restores
    hash-join shape: each point lands in its time bucket; each interval
    explodes into the buckets it covers; the equi-join on (keys...,
    bucket) produces candidates and the exact predicate filters them.
    A matching pair meets in exactly ONE bucket (the point's), so no
    dedup step is needed.

    Cost: shuffle keyed on (keys..., bucket); the interval side expands
    by ~span/bucket_seconds rows — size ``bucket_seconds`` near the
    typical interval span so the expansion stays a small constant.
    Timestamps are compared at full microsecond precision; bucketing
    (seconds-truncated, monotonic) only generates candidates.
    """
    keys = keys or []
    # "_b" is the internal bucket key; silently overwriting (then
    # dropping) a real user column of that name would corrupt output
    for side, df in (("points", points), ("intervals", intervals)):
        if "_b" in df.columns:
            raise ValueError(
                f"interval_join: {side} already has a '_b' column, which "
                "collides with the internal bucket key — rename it first"
            )
    p_b = F.floor(F.col(t_col).cast("double") / bucket_seconds)
    pts = points.withColumn("_b", p_b.cast("long"))
    span = F.sequence(
        F.floor(F.col(lo_col).cast("double") / bucket_seconds).cast("long"),
        F.floor(F.col(hi_col).cast("double") / bucket_seconds).cast("long"),
    )
    ivs = intervals.withColumn("_b", F.explode(span))
    out = pts.join(ivs, [*keys, "_b"]).filter(
        (F.col(t_col) >= F.col(lo_col)) & (F.col(t_col) < F.col(hi_col))
    )
    return out.drop("_b")
