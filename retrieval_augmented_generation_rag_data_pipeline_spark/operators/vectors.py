"""Vector operators (SURVEY.md §2.3 J6, §1.1 D6).

Replaces the reference's FAISS IndexFlatIP + pickle sidecar
(reference src/embedding_engine.py:15-30,74-99) with relational operators
over an ARRAY<FLOAT/DOUBLE> column:

- exact brute-force top-k (IndexFlatIP semantics — exact inner product)
  as a broadcast-join + per-query window top-k;
- sign-LSH bucketing as the approximate scale path (at 100 TB the
  bucket join replaces the O(n*m) cross join; candidates are reranked
  exactly within buckets).

All arithmetic stays JVM-side (higher-order functions, codegen) — no
Python UDFs in the hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hyperplane_component


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product (deterministic fold order —
    bit-identical to the DuckDB oracle fragment).

    Guarded against silent length mismatch: zip_with null-pads the
    shorter array, which would make the whole sum NULL and quietly rank
    every candidate arbitrarily — assert_true turns that into a loud
    error instead. The guard term comes FIRST in the sum: Spark's
    null-safe Add short-circuits when the left operand is NULL, and a
    mismatch always NULLs the aggregate, so ``raw + guard`` would never
    evaluate the assertion (the round-5 advisory found exactly that dead
    guard). A NULL input vector is explicitly allowed through and yields
    a NULL dot (NULL-in -> NULL-out), matching pre-guard behavior.
    """
    raw = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    guard = F.coalesce(
        F.assert_true(
            a.isNull() | b.isNull() | (F.size(a) == F.size(b)),
            F.lit("dot(): vector length mismatch"),
        ).cast("double"),
        F.lit(0.0),
    )
    return guard + raw


def dot_sql(a: str, b: str) -> str:
    """SQL-string twin of ``dot`` over two array references — same tree
    (guard first, then the sequential fold), ONE parse instead of ~50
    py4j round trips; shared by every ANN scorer's hot projection
    (round 16). Keep in lockstep with ``dot``."""
    guard = (
        f"coalesce(CAST(assert_true((({a} IS NULL) OR ({b} IS NULL)) OR "
        f"(size({a}) = size({b})), 'dot(): vector length mismatch') "
        "AS DOUBLE), CAST(0.0 AS DOUBLE))"
    )
    raw = (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )
    return f"({guard} + {raw})"


def l2_norm_sql(a: str) -> str:
    """SQL-string twin of ``l2_norm`` (same tree, one parse)."""
    return (
        f"sqrt(aggregate(transform({a}, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v))"
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )


def l2_normalize(a: Column) -> Column:
    """L2-normalize (reference normalize_embeddings=True at
    src/embedding_engine.py:20; torch F.normalize at src/transcription.py:187).

    Both the input array and its norm are let-bound: the norm is
    referenced inside the transform lambda, and HOF lambdas run
    interpreted (no subexpression elimination), so an inline norm would
    be re-aggregated once PER ELEMENT — O(dim^2) per row; the array
    itself is referenced twice (norm + transform), which doubles
    expensive inputs like the mock-embed md5 component array."""
    from ..functions.binding import let

    # try_divide: a zero vector has norm 0 and a bare per-element
    # division aborts the job under Spark 4's default ANSI mode; the
    # normalized form of a zero vector is all-NULL (undefined direction)
    return let(
        a,
        lambda arr: let(
            l2_norm(arr),
            lambda n: F.transform(
                arr, lambda x: F.try_divide(x.cast("double"), n)
            ),
        ),
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide, not /: an all-zero vector has norm 0 and a bare
    # division aborts the job with DIVIDE_BY_ZERO under Spark 4's
    # default ANSI mode; NULL-on-zero matches the DuckDB oracle's
    # nullif(norm*norm, 0) — a zero vector is similar to nothing
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def _topk_per_query(scored, corpus_id: str, k: int, score_col: str = "sim"):
    """Shared per-query top-k tail: rank within query by score desc,
    tie-break lowest corpus id, keep k. One definition so a tie-break
    or column change can never drift between the ANN variants.
    Emitted as SQL strings (round 16 py4j discipline)."""
    return (
        scored.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY query_id ORDER BY "
            f"`{score_col}` DESC, `{corpus_id}` ASC) AS rank",
        )
        .filter(f"rank <= {int(k)}")
        .selectExpr("query_id", f"`{corpus_id}`", f"`{score_col}`", "rank")
    )


def knn_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k similarity join (reference FAISS IndexFlatIP search,
    src/embedding_engine.py:24-30).

    queries is broadcast (the small side by construction — a query batch);
    the corpus streams through without shuffling, each partition scoring
    locally; the only shuffle is the per-query top-k window, whose input
    was already cut to k rows per (query, partition) by a partial top-k.
    Deterministic tie-break: higher sim first, then lower corpus id.

    The corpus side routes through ``ensure_parallelism`` (round-15):
    scoring is |Q| interpreted dot folds per corpus row, exactly the
    compute-bound shape a one-file local scan single-threads; a no-op
    on already-split inputs, so at scale the scan's own parallelism
    stands.
    """
    from ..session import ensure_parallelism

    q = queries.selectExpr(
        f"`{query_id}` AS query_id", f"`{vec_col}` AS _qv"
    )
    c = ensure_parallelism(corpus).selectExpr(
        f"`{corpus_id}` AS `{corpus_id}`", f"`{vec_col}` AS _cv"
    )
    if metric == "cosine":
        # norms depend on ONE side each — computing cosine() per pair
        # would re-derive both inside the O(|Q|x|C|) loop (3 array
        # traversals per pair instead of 1). Same expressions on the
        # same arrays, so the factored sim is bit-identical.
        q = q.selectExpr("*", f"{l2_norm_sql('_qv')} AS _qn")
        c = c.selectExpr("*", f"{l2_norm_sql('_cv')} AS _cn")
        # try_divide: a zero vector (norm 0) must score NULL (ranked
        # last), not abort the job with ANSI DIVIDE_BY_ZERO
        sim = f"try_divide({dot_sql('_qv', '_cv')}, _qn * _cn)"
    elif metric == "dot":
        sim = dot_sql("_qv", "_cv")
    else:
        raise ValueError(
            f"knn_topk: metric must be 'cosine' or 'dot', got {metric!r} — "
            "a silent fallback to raw inner product would return "
            "plausible-looking but wrong neighbors"
        )
    scored = c.join(F.broadcast(q)).selectExpr(
        "query_id", f"`{corpus_id}`", f"{sim} AS sim"
    )
    return _topk_per_query(scored, corpus_id, k, "sim")


def lsh_bucket(vec_col: str, dim: int, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id: bit p set iff dot(vec, plane_p) > 0.

    Planes are deterministic pseudo-random (md5-derived, see
    functions.hashing.hyperplane_component) so the bucketing is
    reproducible in SQL for the oracle and across cluster restarts.
    Takes the vector COLUMN NAME; the expression is generated as one
    SQL string to avoid ~n_planes*dim py4j literal-building calls.
    """
    terms = " + ".join(
        f"(CASE WHEN {_dot_sql(vec_col, [hyperplane_component(p, d) for d in range(dim)])}"
        f" > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return F.expr(terms)


# Offset keeps the multi-table near-dup plane family disjoint from the
# single-table ANN planes (0..) and the IVF centroids (1000..).
LSH_TABLE_OFFSET = 2000


def lsh_band_keys(
    vec_col: str, dim: int, n_tables: int = 4, n_planes: int = 4
) -> Column:
    """Array of (tbl, bkt) multi-table sign-LSH keys — one bucket id per
    hash table, each table built from its own ``n_planes`` hyperplanes.

    Multi-table banding is the standard recall amplifier for sign-LSH
    (Indyk/Motwani LSH; Leskovec/Rajaraman/Ullman ch. 3): a pair at
    angle theta collides in one table with prob (1 - theta/pi)^n_planes
    and is MISSED by all tables with prob
    (1 - (1-theta/pi)^n_planes)^n_tables — e.g. cos >= 0.9 with 4x4
    tables is found with ~0.97 probability. Takes the vector COLUMN
    NAME; emitted as one SQL string (py4j-cheap, see lsh_bucket).
    """
    entries = []
    for t in range(n_tables):
        terms = " + ".join(
            f"(CASE WHEN "
            f"{_dot_sql(vec_col, [hyperplane_component(LSH_TABLE_OFFSET + t * n_planes + p, d) for d in range(dim)])}"
            f" > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes)
        )
        entries.append(f"named_struct('tbl', {t}, 'bkt', {terms})")
    return F.expr("array(" + ", ".join(entries) + ")")


def ivf_centroid(cell: int, dim: int) -> list[float]:
    """Deterministic pseudo-random IVF centroid (offset 1000 keeps the
    centroid family disjoint from the sign-LSH hyperplanes). The ORACLE
    quantizer — reproducible in SQL; production recall wants
    ``train_ivf_centroids`` instead."""
    return [hyperplane_component(1000 + cell, d) for d in range(dim)]


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 20,
) -> list[list[float]]:
    """k-means IVF centroids trained on (a sample of) the corpus — the
    production coarse quantizer (FAISS trains its IVF the same way;
    reference src/embedding_engine.py:15-30 uses a flat index, this is
    the scale path beyond it).

    MLlib KMeans runs distributed over the executors; only the
    ``n_cells x dim`` centroid floats come back to the driver —
    metadata-sized, exactly like any broadcast dimension. Centroids are
    L2-normalized so the argmax-dot cell assignment (``ivf_cell``)
    ranks them by cosine. At 100 TB train on ``sample_fraction`` (a few
    million vectors is plenty for k-means) — never the full corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features")
    )
    if sample_fraction is not None:
        feats = feats.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    cents: list[list[float]] = []
    for c in model.clusterCenters():
        v = [float(x) for x in c]
        n = sum(x * x for x in v) ** 0.5 or 1.0
        cents.append([x / n for x in v])
    return cents


def frozen_quantizer(
    path: str | None = None,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """(centroids, codebooks) from the committed trained-quantizer
    artifact (artifacts/quantizer.json, written by
    tools/train_quantizer.py — seeded MLlib k-means over the sf0.01
    eval corpus). Train-on-sample / freeze / apply-anywhere is the
    100 TB deployment shape: the artifact is metadata-sized (~40 KB)
    and applies to any corpus at any sf; only TRAINING touched a
    Spark job. Loaded once per process (tiny, cached)."""
    import json as _json
    import pathlib as _pathlib

    if path is None:
        path = str(
            _pathlib.Path(__file__).resolve().parents[2]
            / "artifacts"
            / "quantizer.json"
        )
    cached = _FROZEN_CACHE.get(path)
    if cached is None:
        art = _json.loads(_pathlib.Path(path).read_text())
        cached = (art["centroids"], art["codebooks"])
        _FROZEN_CACHE[path] = cached
    return cached


_FROZEN_CACHE: dict[str, tuple] = {}


def _dot_sql(col_name: str, values: list[float], guard: bool = True) -> str:
    """SQL-text dot product against a literal vector — same fold order
    as the Column-API `dot` (zip_with then sequential aggregate).

    Guarded like `dot`: a dim mismatch (wrong `dim` argument vs actual
    vector length) null-pads zip_with, nulls the sum, and silently
    collapses IVF/LSH cell assignment — assert_true raises instead.
    The guard term is emitted FIRST (``guard + agg``): null-safe Add
    short-circuits on a NULL left operand, and the aggregate is NULL
    exactly when the guard must fire, so ``agg + guard`` never raises
    (round-5 advisory). A NULL vector column passes the guard and
    yields NULL. The passing branch returns NULL, so the coalesce adds
    0D and the numeric result is bit-unchanged. Generated families that emit MANY
    dots over the SAME column per row (cell ranking, PQ codebooks) pass
    guard=False on all but one — one size check per row suffices, and
    the per-dot guard measurably slowed the ADC path (1.7s -> 2.7s at
    sf0.1 before this flag).
    """
    n = len(values)
    arr = "array(" + ",".join(f"{v!r}D" for v in values) + ")"
    agg = (
        f"aggregate(zip_with({col_name}, {arr}, "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, v) -> a + v)"
    )
    if not guard:
        return f"({agg})"
    g = (
        f"coalesce(CAST(assert_true({col_name} IS NULL OR size({col_name}) = {n}, "
        f"'vector length <> dim={n}') AS DOUBLE), 0D)"
    )
    return f"({g} + {agg})"


def _cell_rank_sql(
    col_name: str,
    dim: int,
    n_cells: int,
    centroids: list[list[float]] | None = None,
) -> str:
    """SQL text for the sorted cell ranking.

    Built as ONE SQL string parsed JVM-side: the equivalent Column-API
    tree needs ~n_cells*dim py4j calls for the literals, which costs
    more wall-clock to BUILD (1.6s measured for 8x64 used twice) than
    the query takes to run. Element 1 = best cell (max dot, ties ->
    lowest cell id). ``centroids`` overrides the fixed pseudo-random
    family (pass ``train_ivf_centroids`` output for production recall).
    """
    cents = (
        centroids
        if centroids is not None
        else [ivf_centroid(c, dim) for c in range(n_cells)]
    )
    cells = ", ".join(
        f"named_struct('nd', -({_dot_sql(col_name, cents[c], guard=(c == 0))}), 'c', {c})"
        for c in range(len(cents))
    )
    return f"array_sort(array({cells}))"


def ivf_cell(
    vec_col: str,
    dim: int,
    n_cells: int = 8,
    centroids: list[list[float]] | None = None,
) -> Column:
    """Coarse-quantizer cell assignment: argmax dot(vec, centroid).
    Takes the vector COLUMN NAME (the expression is generated as SQL
    text — see _cell_rank_sql).

    A NULL vector gets a NULL cell — every dot is NULL, there is no
    argmax. Without the explicit guard the ranking's array_sort is
    stable over all-NULL keys and the first literal (cell 0) would win,
    silently counting NULL vectors toward cell 0's ``max_cell_size``
    budget while ``assign_cells_table`` put them in the NULL cell —
    the round-12 advisory's literal/table divergence. With the guard
    the two paths agree on EVERY input row, NULLs included."""
    return F.expr(
        f"IF({vec_col} IS NULL, CAST(NULL AS INT), "
        f"element_at({_cell_rank_sql(vec_col, dim, n_cells, centroids)}, 1).c)"
    )


# Literal-centroid ceiling: ivf_cell / _cell_rank_sql embed n_cells x
# dim doubles as EXPRESSION literals, and the serialized task binary
# grows with the plan (~130 MB at 800 cells x 64 dims, measured in the
# round-11 100x probe — with an OOM on the shared JVM at that size).
# The ceiling therefore sits BELOW the measured-fragile 800-cell
# point, not above it (round-12 advisory): past this bound,
# quantizer-applying operators switch to assign_cells_table — centroid
# data rides a broadcast, not the plan.
CELL_LITERAL_MAX = 512

# Exact-fold ceiling for AUTO path selection: past this cell count the
# interpreted HOF fold (k x dim multiply-adds per row, ~10x slower
# than the GEMM at 10k cells and growing with k — round-12 verdict
# item 1) is compute-infeasible at SemDeDup's own cost model (50k
# cells / 5B embeddings), so ``assign=None`` switches to the
# Arrow/numpy-GEMM path. Callers that need the SQL-replayable
# bit-exact fold above this count (oracle replay, parity harnesses)
# pass assign="table" explicitly — the table path has no ceiling,
# only the throughput trade documented on assign_cells_arrow.
CELL_EXACT_AUTO_MAX = 4096


def assign_cells_table(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    out_col: str = "_cell",
) -> DataFrame:
    """Coarse-quantizer cell assignment via a broadcast centroid TABLE
    — the >``CELL_LITERAL_MAX``-cells path (SemDeDup's cost model wants
    cells ~ corpus/target_cell_size; the paper runs 50k cells for 5B
    embeddings, and 50k x 64 dims is ~25 MB of centroid data — two
    orders of magnitude past the literal-expression ceiling).

    Plan shape: the (cell, centroid) table is collapsed to ONE row
    holding a cell-ordered ``array<struct<c, cent>>`` and broadcast; a
    BroadcastNestedLoopJoin against that single row attaches it to
    every vector (no shuffle, no per-vector data movement — the stream
    side's partitioning is untouched), and a per-row fold computes
    argmax-dot in place: ``transform`` scores each centroid once, the
    ``aggregate`` keeps the first strict minimum of (-dot), so ties go
    to the LOWEST cell id — exactly ``_cell_rank_sql``'s ``array_sort``
    element 1. Plan size, broadcast payload per executor, and shuffle
    volume (zero) are all independent of n_cells.

    NOT the join-per-(vector, cell) shape: scoring as a
    BroadcastNestedLoopJoin row PER CANDIDATE materializes n x k joined
    rows each carrying the 64-dim vector into a re-grouping aggregate —
    measured 180s for 2k vectors x 1k cells at sf0.1 against ~2s for
    this in-place fold, which evaluates the same dots without ever
    widening or regrouping the stream.

    Parity: the dot is the same sequential zip_with/aggregate fold over
    the same doubles as ``_dot_sql``'s literal path — the two
    assignment paths agree bit-for-bit on shared centroids
    (tests/test_vectors.py::test_table_assignment_matches_literal).
    One dim-guard per row (``assert_true`` folded into the fold's
    init), matching the literal path's guard-once convention. NULL
    vectors get a NULL cell (every -dot is NULL, the fold never
    improves on the NULL-cell init) rather than an arbitrary one.

    Returns ``df``'s columns plus ``out_col``. Cost is n x k dots of
    interpreted higher-order-function work regardless of path — size
    the STREAM side's partitioning to the cluster (a single-file local
    read is one partition and will single-thread; ``.repartition()``
    first if the scan's natural parallelism is low).
    """
    spark = df.sparkSession
    dim = len(centroids[0]) if centroids else 0
    best = F.expr(
        f"""aggregate(
  transform(_cents, s -> named_struct('nd', {_table_nd_sql(vec_col)}, 'c', s.c)),
  named_struct('nd', {_table_guard_sql(vec_col, dim, 'assign_cells_table')} + CAST('Infinity' AS DOUBLE),
               'c', CAST(NULL AS INT)),
  (acc, x) -> IF(x.nd < acc.nd, x, acc)).c"""
    )
    return (
        df.crossJoin(F.broadcast(_cells_one_row(spark, centroids)))
        .withColumn(out_col, best.cast("int"))
        .drop("_cents")
    )


def _cells_one_row(spark, centroids: list[list[float]]) -> DataFrame:
    """The broadcast side of the table-assignment family: the whole
    centroid table collapsed to ONE row holding a cell-ordered
    ``_cents array<struct<c, cent>>`` (struct comparison sorts on the
    leading c field, so array_sort restores cell-id order regardless of
    collect_list's arrival order)."""
    # Arrow pd.DataFrame path, not the row-pickling list path: at the
    # paper's 50k cells the pickled build alone cost ~8s per job (the
    # measurement that moved the two-level fine table to Arrow); the
    # int64->INT cast below mirrors that table's struct pin
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "_cc": list(range(len(centroids))),
            "_cent": [[float(x) for x in v] for v in centroids],
        }
    )
    return spark.createDataFrame(pdf).select(
        F.col("_cc").cast("int").alias("_cc"), F.col("_cent")
    ).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("_cc").alias("c"), F.col("_cent").alias("cent"))
            )
        ).alias("_cents")
    )


def _table_nd_sql(vec_col: str) -> str:
    """-dot(vec, s.cent) as SQL text for lambdas iterating the
    broadcast ``_cents`` array — the same sequential zip_with/aggregate
    fold (same doubles, same order) as ``_dot_sql``'s literal path."""
    vq = f"`{vec_col}`"
    return (
        f"-(aggregate(zip_with({vq}, s.cent, (x, y) -> CAST(x AS DOUBLE) * y), "
        f"0D, (a, v) -> a + v))"
    )


def _table_guard_sql(vec_col: str, dim: int, who: str) -> str:
    """One dim-guard per ROW (not per cell) for the table-assignment
    family — evaluates to 0D or raises, mirroring ``_dot_sql``'s
    guard-once convention (guard=True only on cell 0)."""
    vq = f"`{vec_col}`"
    return (
        f"coalesce(CAST(assert_true({vq} IS NULL OR size({vq}) = {dim}, "
        f"'{who}: vector length <> dim={dim}') AS DOUBLE), 0D)"
    )


def group_centroids(
    centroids: list[list[float]],
    n_coarse: int | None = None,
    seed: int = 42,
    max_iter: int = 20,
) -> tuple[list[list[float]], list[int]]:
    """Cluster the FINE centroid table into coarse groups for
    ``assign_cells_two_level`` — driver-side seeded numpy Lloyd's over
    the k x dim centroid matrix (metadata-sized: the 50k x 64 paper
    config is 3 MB; this is offline artifact work like
    train_ivf_centroids, never a per-row cost). Returns
    (coarse_centroids, fine_to_coarse) with every coarse group
    non-empty; default ``n_coarse`` = ceil(sqrt(k)), the cost-balanced
    choice (coarse dots == avg fine dots per row)."""
    import hashlib
    import math

    import numpy as np

    cmat = np.asarray(centroids, dtype=np.float64)
    k = cmat.shape[0]
    if n_coarse is None:
        n_coarse = max(1, math.ceil(math.sqrt(k)))
    n_coarse = min(n_coarse, k)
    # memoized per process on the centroid BYTES (md5 of 25 MB ~ tens
    # of ms vs ~11s of Lloyd's at 50k cells): repeated jobs against
    # the same frozen quantizer — the deployment shape — pay the
    # grouping once, like the frozen-artifact caches elsewhere
    ckey = (
        hashlib.md5(np.ascontiguousarray(cmat).tobytes()).hexdigest(),
        n_coarse,
        seed,
        max_iter,
    )
    cached = _GROUPING_CACHE.get(ckey)
    if cached is not None:
        return cached
    rng = np.random.RandomState(seed)
    # k-means++-style farthest-point seeding (deterministic): a plain
    # random draw of n_coarse seeds regularly lands two seeds in one
    # natural cluster and zero in another, and Lloyd's cannot escape
    # the split/merge — measured 88/100 flat-argmax agreement on a
    # 16-anchor synthetic family vs 100/100 with spread seeds
    seeds = [int(rng.randint(k))]
    # cosine-family distance: smaller dot = farther
    closeness = cmat @ cmat[seeds[0]]
    for _ in range(n_coarse - 1):
        nxt = int(np.argmin(closeness))
        seeds.append(nxt)
        closeness = np.maximum(closeness, cmat @ cmat[nxt])
    coarse = cmat[seeds].copy()
    for _ in range(max_iter):
        # cosine-family geometry: nearest by max dot, matching the
        # assignment rule the groups will serve
        assign = np.argmax(cmat @ coarse.T, axis=1)
        new = np.vstack(
            [
                cmat[assign == g].mean(axis=0)
                if (assign == g).any()
                else coarse[g]
                for g in range(n_coarse)
            ]
        )
        if np.allclose(new, coarse):
            coarse = new
            break
        coarse = new
    assign = np.argmax(cmat @ coarse.T, axis=1)
    # an empty coarse group would strand its slot (assign_cells_two_level's
    # left join would hand every vector routed there a NULL cell); reseat
    # each empty group on the worst-fit fine centroid, drawing DONORS only
    # from groups that keep >=1 member after the move — a naive global
    # argmin can steal the sole member of an already-filled group and
    # re-empty it. Pigeonhole guarantees a >=2-member donor group exists
    # while any group is empty (k >= n_coarse), so this converges in at
    # most n_coarse reseats.
    while True:
        counts = np.bincount(assign, minlength=n_coarse)
        empties = np.flatnonzero(counts == 0)
        if empties.size == 0:
            break
        g = int(empties[0])
        fit = np.max(cmat @ coarse.T, axis=1)
        fit[counts[assign] < 2] = np.inf  # sole members can't be donors
        worst = int(np.argmin(fit))
        coarse[g] = cmat[worst]
        assign[worst] = g
    assert np.bincount(assign, minlength=n_coarse).min() > 0, (
        "group_centroids: empty coarse group after reseat"
    )
    out = (
        [list(map(float, c)) for c in coarse],
        [int(a) for a in assign],
    )
    _GROUPING_CACHE[ckey] = out
    return out


_GROUPING_CACHE: dict[tuple, tuple] = {}


def assign_cells_two_level(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    out_col: str = "_cell",
    n_coarse: int | None = None,
    grouping: tuple[list[list[float]], list[int]] | None = None,
) -> DataFrame:
    """Two-level coarse->fine cell assignment — the SQL-replayable
    exact-FOLD family's paper-scale route (round-12 verdict item 1's
    sketched alternative): instead of k dots per row, score ~sqrt(k)
    coarse centroids (the flat ``assign_cells_table`` machinery), then
    argmax over only the fine centroids grouped under the winning
    coarse cell — ~2*sqrt(k) interpreted dots per row, EXACT WITHIN
    THE SELECTED COARSE GROUP. At the paper's 50k cells that is ~450
    dots/row instead of 50k (~100x less interpreted work), with every
    dot still the oracle's sequential zip_with/aggregate fold over
    shared literals — a DuckDB oracle replays both levels verbatim,
    which ``assign_cells_arrow``'s GEMM cannot guarantee.

    SEMANTICS CAVEAT (why this is opt-in and not the auto tier): the
    result is the standard IVF-style approximation, not the flat
    argmax — a vector whose true nearest fine centroid lives in a
    NON-winning coarse group gets its group-local best instead
    (agreement with flat argmax is high when the centroid table
    clusters well; measured on the probe corpus in
    tests/test_vectors.py). Deployments wanting bit-identical flat
    argmax keep ``assign="table"``; deployments wanting raw speed use
    ``assign="arrow"``; this path is for BOTH big k and a SQL oracle.

    Plan shape: one BroadcastNestedLoopJoin against the one-row coarse
    table (the flat path's shape at sqrt(k) size), then one
    BroadcastHashJoin on the winning coarse id against an
    n_coarse-row grouped-fine table — no shuffle on the stream side,
    plan size independent of k. NULL vectors ride a left join to a
    NULL cell, the family's NULL contract.

    ``grouping`` injects a precomputed ``group_centroids`` result (the
    frozen-artifact seam: compute once offline, replay its literals in
    the oracle); None derives it here deterministically (seeded).
    """
    spark = df.sparkSession
    coarse_cents, fine_to_coarse = (
        grouping
        if grouping is not None
        else group_centroids(centroids, n_coarse=n_coarse)
    )
    coarse = assign_cells_table(
        df, coarse_cents, vec_col, out_col="_coarse"
    )
    # the k-row fine table rides the Arrow createDataFrame path (one
    # zero-copy batch), not the row-pickling default — at the paper's
    # 50k cells the pickled build alone cost 8s per job, ~2x the
    # assignment itself
    fine_pdf = pd.DataFrame(
        {
            "_g": [int(g) for g in fine_to_coarse],
            "_fc": list(range(len(centroids))),
            "_fcent": [[float(x) for x in v] for v in centroids],
        }
    )
    # Arrow infers int64 — pin the struct's c to INT so the fold's
    # typed NULL-cell init matches
    groups = spark.createDataFrame(fine_pdf).groupBy(
        F.col("_g").cast("int").alias("_g")
    ).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("_fc").cast("int").alias("c"),
                    F.col("_fcent").alias("cent"),
                )
            )
        ).alias("_fines")
    )
    # same strict-minimum fold as assign_cells_table, over the winning
    # group's fine centroids; the row-level dim guard already fired in
    # the coarse stage, so the fine fold can skip it (guard-once)
    best = F.expr(
        """aggregate(
  transform(_fines, s -> named_struct('nd', %s, 'c', s.c)),
  named_struct('nd', CAST('Infinity' AS DOUBLE), 'c', CAST(NULL AS INT)),
  (acc, x) -> IF(x.nd < acc.nd, x, acc)).c"""
        % _table_nd_sql(vec_col)
    )
    return (
        coarse.join(
            F.broadcast(groups),
            coarse["_coarse"] == groups["_g"],
            "left",
        )
        .withColumn(out_col, best.cast("int"))
        .drop("_g", "_fines", "_coarse")
    )


def assign_cells_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    out_col: str = "_cell",
) -> DataFrame:
    """Arrow-vectorized cell assignment — the RAW-THROUGHPUT variant of
    ``assign_cells_table`` for paper-scale cell counts: one numpy
    float64 matmul per Arrow batch against a centroid matrix shipped
    once per executor via ``SparkContext.broadcast`` (never in the
    plan, never per task). Measured ~3 orders of magnitude faster than
    the interpreted-HOF fold at 10k cells (tools/scale_probe.py
    ``semantic_arrow_assign``) — this is the shape SemDeDup itself
    runs (dense GEMM on accelerators), expressed as the engine's
    sanctioned Pandas-UDF slow path for work the built-in operators
    cannot vectorize.

    PARITY CAVEAT (why this is opt-in, never the oracle path): numpy
    sums the dot products pairwise/SIMD, not in the oracle's
    sequential fold order, so two centroids whose dots differ by under
    ~1 ulp can rank differently than the literal/table paths. Ties
    break to the LOWEST cell id (numpy argmax returns the first
    maximum), matching the exact paths' rule — on real embedding data
    exact cross-centroid ties don't occur and all three paths agree
    (asserted on the test corpora), but the guarantee here is
    argmax-under-float64-GEMM, not bit-parity. Use ``assign="table"``
    where the SQL oracle must replay the assignment; use this where
    throughput matters.

    NULL vectors get a NULL cell; a dim mismatch raises loudly from
    the batch (same contract as the guarded paths).
    """
    import numpy as np

    cmat = np.asarray(centroids, dtype=np.float64)
    if cmat.ndim != 2 or cmat.shape[1] == 0:
        raise ValueError(
            "assign_cells_arrow: centroids must be a non-empty "
            f"rectangular k x dim table, got shape {cmat.shape}"
        )
    bc = df.sparkSession.sparkContext.broadcast(cmat)

    @F.pandas_udf("int")
    def _cell(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cents = bc.value
        for v in batches:
            out = np.full(len(v), -1, dtype="int64")
            mask = v.notna().to_numpy()
            if mask.any():
                try:
                    mat = np.vstack(
                        [np.asarray(x, dtype=np.float64) for x in v[mask]]
                    )
                except ValueError as e:
                    raise ValueError(
                        "assign_cells_arrow: ragged vector batch (length "
                        f"mismatch inside one Arrow batch): {e}"
                    ) from e
                if mat.shape[1] != cents.shape[1]:
                    raise ValueError(
                        f"assign_cells_arrow: vector length "
                        f"{mat.shape[1]} <> dim={cents.shape[1]}"
                    )
                out[mask] = np.argmax(mat @ cents.T, axis=1)
            res = pd.Series(out).astype("Int64")
            res[~mask] = pd.NA
            yield res.astype("Int32")

    return df.withColumn(out_col, _cell(F.col(vec_col)))


def probe_cells_table(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    nprobe: int,
    out_col: str = "_probes",
) -> DataFrame:
    """Top-``nprobe`` nearest cells per vector via the broadcast
    centroid TABLE — the query-side companion of ``assign_cells_table``
    (IVF probing needs the nprobe BEST cells, not just the argmax).
    Same one-row broadcast, same dots, and the ranking is
    ``array_sort`` over (nd, c) structs — element-for-element the
    ordering ``_cell_rank_sql`` produces, so literal and table probes
    select identical cell lists. Adds ``out_col`` as an
    ``array<int>`` of cell ids, best first; the dim guard fires once
    per row via the IF wrapper (the guard expression is 0D or raises).
    """
    spark = df.sparkSession
    dim = len(centroids[0]) if centroids else 0
    ranked = F.expr(
        f"""IF({_table_guard_sql(vec_col, dim, 'probe_cells_table')} = 0D,
  transform(
    slice(array_sort(transform(_cents, s -> named_struct('nd', {_table_nd_sql(vec_col)}, 'c', s.c))),
          1, {int(nprobe)}),
    s -> s.c),
  NULL)"""
    )
    return (
        df.crossJoin(F.broadcast(_cells_one_row(spark, centroids)))
        .withColumn(out_col, ranked)
        .drop("_cents")
    )


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
    assign: str | None = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization.

    Corpus vectors are assigned to their nearest of ``n_cells``
    centroids (the inverted lists); each query probes its ``nprobe``
    nearest cells and reranks candidates exactly by cosine. At scale the
    corpus is partitioned (or bucketed) by cell so a probe touches
    ~nprobe/n_cells of the data — the same pruning FAISS IVF does, but
    expressed as a partition-pruned equi-join.

    Default centroids are fixed pseudo-random (deterministic for the
    SQL oracle); pass ``centroids=train_ivf_centroids(corpus, ...)``
    for the production path — trained cells track the data's density,
    measurably better recall at every nprobe (see
    tests/test_vectors.py::test_trained_centroids_beat_fixed). Probing
    all cells (nprobe = n_cells) degenerates to exact search.

    ``assign`` switches the centroid transport exactly like
    ``semantic_dedup``: None auto-selects the literal-expression path
    up to ``CELL_LITERAL_MAX`` cells and the broadcast-centroid-TABLE
    path (``assign_cells_table`` / ``probe_cells_table``) past it —
    FAISS-scale IVF wants n_cells ~ sqrt(corpus), which outgrows plan
    literals around a billion vectors. Both paths fold identical
    doubles, so cell lists and the final top-k agree bit-for-bit
    (tests/test_vectors.py::test_ivf_table_path_matches_literal).
    """
    if centroids is not None:
        n_cells = len(centroids)
    if assign not in (None, "literal", "table"):
        raise ValueError(
            f"ann_ivf_topk: assign must be None, 'literal' or 'table', "
            f"got {assign!r}"
        )
    use_table = assign == "table" or (
        assign is None and n_cells > CELL_LITERAL_MAX
    )
    cb = corpus.select(
        F.col(corpus_id).alias(corpus_id), F.col(vec_col).alias("_cv")
    )
    # a NULL query vector must emit NO result rows (the corpus side
    # maps NULL vectors to a NULL cell): unfiltered, every centroid dot
    # is NULL and the null-first struct ordering would probe arbitrary
    # cells, fabricating k rows of NULL-sim "neighbors" for that query
    qb = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    if use_table:
        from ..session import ensure_parallelism

        cents = (
            centroids
            if centroids is not None
            else [ivf_centroid(c, dim) for c in range(n_cells)]
        )
        # corpus assignment past the literal ceiling is >=32k
        # interpreted multiply-adds per row — spread an
        # under-parallelized local scan before paying it (no-op at
        # cluster partition counts); queries ride the broadcast join
        # as-is (they are the small side by construction)
        cb = assign_cells_table(
            ensure_parallelism(cb), cents, "_cv", out_col="_cell"
        )
        qb = probe_cells_table(qb, cents, "_qv", nprobe, out_col="_probes")
        probes = F.col("_probes")
    else:
        cb = cb.withColumn(
            "_cell", ivf_cell("_cv", dim, n_cells, centroids)
        )
        probes = F.expr(
            f"transform(slice({_cell_rank_sql('_qv', dim, n_cells, centroids)}, 1, {nprobe}), s -> s.c)"
        )
    cb = cb.selectExpr(
        "*", f"{l2_norm_sql('_cv')} AS _cn"  # once per corpus row, not per pair
    )
    qb = qb.select(
        "query_id", "_qv", F.explode(probes).alias("_cell")
    ).selectExpr("*", f"{l2_norm_sql('_qv')} AS _qn")
    # try_divide: a zero vector (norm 0) scores NULL (ranked last),
    # never an ANSI DIVIDE_BY_ZERO job abort — same as cosine()
    scored = cb.join(F.broadcast(qb), "_cell").selectExpr(
        "query_id",
        f"`{corpus_id}`",
        f"try_divide({dot_sql('_qv', '_cv')}, _qn * _cn) AS sim",
    )
    return _topk_per_query(scored, corpus_id, k, "sim")


def ann_ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int,
    dim: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec_col: str = "embedding",
    index_vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
    allow_missing_meta: bool = False,
) -> DataFrame:
    """IVF top-k over a PERSISTED inverted-list index
    (sources.sinks.write_ivf_index): reads ONLY the probed partitions.

    ``query_vec_col`` names the vector column in ``queries``;
    ``index_vec_col`` must match the ``vec_col`` the index was WRITTEN
    with (its schema is fixed at write time).

    The probe cells are computed driver-side from the query batch —
    queries are the broadcast-small side by definition, so this is
    nqueries x nprobe integers, metadata-sized, never corpus data. The
    static ``_cell IN (...)`` predicate becomes a parquet
    PartitionFilter: at 100 TB a 2-of-64-cell probe scans ~3% of the
    index files and the rest are pruned from the file listing, the same
    pruning FAISS gets by opening only nprobe inverted lists. Results
    are identical to ``ann_ivf_topk`` on the same corpus + centroids
    (each query still joins only its own cells).

    The index's ``_ivf_meta.json`` sidecar (written by
    ``write_ivf_index``) is checked before probing: a quantizer
    mismatch — different dim, n_cells, vector column, or centroid set
    than the index was written with — would silently return wrong
    neighbors, so it raises instead. A MISSING sidecar (foreign or
    partially-written index) also raises — an unverifiable quantizer is
    as dangerous as a mismatched one; pass ``allow_missing_meta=True``
    only for indexes known to predate the sidecar.
    """
    if centroids is not None:
        n_cells = len(centroids)
    from ..sources.sinks import ivf_meta, read_sidecar_text

    raw = read_sidecar_text(spark, index_path.rstrip("/") + "/_ivf_meta.json")
    if raw is None and not allow_missing_meta:
        raise ValueError(
            f"IVF index at {index_path} has no _ivf_meta.json sidecar; cannot "
            "verify it was written with this probe's quantizer (dim/n_cells/"
            "centroids/vec_col). Rebuild with write_ivf_index, or pass "
            "allow_missing_meta=True for a pre-sidecar index you trust."
        )
    if raw is not None:
        import json as _json

        written = _json.loads(raw)
        asked = ivf_meta(dim, n_cells, centroids, index_vec_col)
        bad = {k: (written.get(k), asked[k]) for k in asked if written.get(k) != asked[k]}
        if bad:
            raise ValueError(
                f"IVF index at {index_path} was written with a different "
                f"quantizer than this probe: mismatched "
                + ", ".join(
                    f"{k} (index={w!r}, probe={a!r})" for k, (w, a) in bad.items()
                )
                + ". Probe with the same dim/n_cells/centroids/vec_col the "
                "index was built with, or rebuild the index."
            )
    probes = F.expr(
        f"transform(slice({_cell_rank_sql('_qv', dim, n_cells, centroids)}, 1, {nprobe}), s -> s.c)"
    )
    # pin the query-side lineage once: the cell ranking feeds BOTH the
    # driver-side partition-filter collect and the broadcast join —
    # without this the (n_cells x dim) ranking re-executes from source
    qb = (
        # NULL query vectors dropped — see ann_ivf_topk
        queries.filter(F.col(query_vec_col).isNotNull())
        .select(
            F.col(query_id).alias("query_id"), F.col(query_vec_col).alias("_qv")
        )
        .select("query_id", "_qv", F.explode(probes).alias("_cell"))
        .localCheckpoint(eager=True)
    )
    cells = sorted(r["_cell"] for r in qb.select("_cell").distinct().collect())
    corpus = spark.read.parquet(index_path).filter(F.col("_cell").isin(cells))
    scored = (
        corpus.withColumn("_cn", l2_norm(F.col(index_vec_col)))
        .join(F.broadcast(qb.withColumn("_qn", l2_norm(F.col("_qv")))), "_cell")
        .select(
            "query_id",
            corpus_id,
            # try_divide: zero-norm vectors score NULL, never abort
            F.try_divide(
                dot(F.col("_qv"), F.col(index_vec_col)),
                F.col("_qn") * F.col("_cn"),
            ).alias("sim"),
        )
    )
    return _topk_per_query(scored, corpus_id, k, "sim")


# Offset keeps the PQ codebook family disjoint from the sign-LSH
# hyperplanes (0.. / 2000..) and the IVF centroids (1000..).
# BOUNDARY (documented, not enforced): the disjointness holds for
# DEFAULT ivf_centroid families up to 1000 cells — past that the
# default centroids run into the LSH (2000+) and PQ (3000+) index
# ranges, so a pipeline COMBINING large default-centroid IVF with
# banding or PQ would share pseudo-random points across families.
# Every at-scale path already takes explicit/trained centroids
# (train_ivf_centroids, the frozen quantizer artifact), which carry
# no family coupling; pass them when mixing families above 1000
# default cells.
PQ_FAMILY_OFFSET = 3000


def pq_codebook(j: int, ksub: int, dsub: int) -> list[list[float]]:
    """Deterministic pseudo-random codebook for subspace ``j`` (``ksub``
    centroids of ``dsub`` dims). The ORACLE quantizer — reproducible in
    SQL; production recall wants ``train_pq_codebooks`` instead."""
    return [
        [hyperplane_component(PQ_FAMILY_OFFSET + j * ksub + ci, d) for d in range(dsub)]
        for ci in range(ksub)
    ]


def default_pq_codebooks(dim: int, m: int = 8, ksub: int = 16) -> list[list[list[float]]]:
    assert dim % m == 0, "dim must divide evenly into m subspaces"
    dsub = dim // m
    return [pq_codebook(j, ksub, dsub) for j in range(m)]


def train_pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 20,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou, Douze & Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
    splits into ``m`` subspaces of dim/m dims; each subspace gets its
    own ``ksub``-centroid k-means codebook.

    ``m`` MLlib KMeans fits on (a sample of) the corpus — distributed;
    only m x ksub x dsub floats return to the driver (KBs). At 100 TB
    train on a few-million-vector sample, never the full corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    assert dim % m == 0, "dim must divide evenly into m subspaces"
    dsub = dim // m
    base = corpus.select(F.col(vec_col).alias("_v"))
    if sample_fraction is not None:
        base = base.sample(fraction=sample_fraction, seed=seed)
    base = base.localCheckpoint(eager=False)
    books: list[list[list[float]]] = []
    for j in range(m):
        feats = base.select(
            array_to_vector(
                F.transform(
                    F.slice("_v", j * dsub + 1, dsub), lambda x: x.cast("double")
                )
            ).alias("features")
        )
        model = KMeans(k=ksub, seed=seed + j, maxIter=max_iter).fit(feats)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    return books


def _pq_encode_sql(col_name: str, codebooks: list[list[list[float]]]) -> str:
    """SQL text for the PQ code array: per subspace, the centroid
    minimizing L2 distance — argmax of dot(x_j, c) - ||c||²/2 (the
    ||x_j||² term is constant per row and drops out). The half-norms are
    precomputed in Python and embedded as literals so the Spark and
    DuckDB sides compare the same doubles. Ties -> lowest code id
    (array_sort on (negated score, code))."""
    # total-length guard: the per-subspace slice guards catch an
    # UNDER-length vector (the last slice comes up short) but an
    # OVER-length one slices cleanly everywhere and would be silently
    # encoded from its first m*dsub components — assert the full size
    # once per row, mirroring the IVF family's size(col) = dim check
    m = len(codebooks)
    dsub0 = len(codebooks[0][0])
    total = m * dsub0
    tguard = (
        f"coalesce(CAST(assert_true({col_name} IS NULL OR "
        f"size({col_name}) = {total}, "
        f"'pq: expected {total}-dim vector') AS DOUBLE), 0D) + "
    )
    parts = []
    for j, cb in enumerate(codebooks):
        dsub = len(cb[0])
        sub = f"slice({col_name}, {j * dsub + 1}, {dsub})"
        cells = ", ".join(
            f"named_struct('nd', {tguard if (j == 0 and ci == 0) else ''}"
            f"-({_dot_sql(sub, c, guard=(ci == 0))} - {0.5 * sum(x * x for x in c)!r}D), 'c', {ci})"
            for ci, c in enumerate(cb)
        )
        parts.append(f"element_at(array_sort(array({cells})), 1).c")
    return "array(" + ", ".join(parts) + ")"


def _pq_one_row(spark, codebooks: list[list[list[float]]]) -> DataFrame:
    """The broadcast side of the PQ table family: the whole codebook
    collapsed to ONE row holding ``_pqcb array<struct<j, cents>>``
    (subspace-ordered; each ``cents`` is centroid-id-ordered
    ``array<struct<c, cent, hn>>`` with the half-norm ``hn`` =
    0.5*||c||² precomputed in Python — the SAME doubles the literal
    builders embed, so the two paths fold identical values)."""
    # built as ONE driver-side row (no collect_list aggregate: the
    # codebook is metadata-sized — m*ksub entries — so the agg's two
    # exchanges would cost more stages than the data is worth; the IVF
    # _cells_one_row keeps its agg because 50k-cell centroid tables
    # made the pickled single-row build measurably slow)
    row = [
        (
            j,
            [
                (ci, [float(x) for x in c], 0.5 * sum(x * x for x in c))
                for ci, c in enumerate(cb)
            ],
        )
        for j, cb in enumerate(codebooks)
    ]
    return spark.createDataFrame(
        [(row,)],
        "_pqcb array<struct<j:int,cents:array<struct<c:int,cent:array<double>,hn:double>>>>",
    )


def _pq_table_sub(vec_col: str, dsub: int) -> str:
    """slice/dot/guard fragments over the broadcast ``_pqcb`` lambdas —
    textually the same fold as ``_dot_sql`` (zip_with then sequential
    aggregate, guard emitted first) with the literal centroid replaced
    by ``s.cent`` and the literal half-norm by ``s.hn``."""
    sub = f"slice(`{vec_col}`, sb.j * {dsub} + 1, {dsub})"
    agg = (
        f"aggregate(zip_with({sub}, s.cent, "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, v) -> a + v)"
    )
    g = (
        f"coalesce(CAST(assert_true({sub} IS NULL OR size({sub}) = {dsub}, "
        f"'vector length <> dim={dsub}') AS DOUBLE), 0D)"
    )
    return sub, agg, g


def _pq_table_encode_expr(vec_col: str, m: int, dsub: int):
    """PQ code array over the broadcast ``_pqcb`` column — the SAME
    structure as ``_pq_encode_sql`` (array_sort argmin of
    -(dot - halfnorm), ties -> lowest code id, total-size assert on the
    first cell, per-subspace slice guard on centroid 0) with the
    codebook riding the broadcast row instead of the expression tree.
    Round-15 (guide §2.3/§4): the literal form expanded m*ksub dot
    subtrees — a ~39 KB expression parsed, analyzed, and shipped in the
    task binary per query, for folds that execute interpreted either
    way; this form is a constant-size template plus one broadcast row."""
    total = m * dsub
    tguard = (
        f"coalesce(CAST(assert_true(`{vec_col}` IS NULL OR "
        f"size(`{vec_col}`) = {total}, "
        f"'pq: expected {total}-dim vector') AS DOUBLE), 0D)"
    )
    _sub, agg, g = _pq_table_sub(vec_col, dsub)
    nd_guarded = f"-((({g}) + {agg}) - s.hn)"
    nd_plain = f"-(({agg}) - s.hn)"
    return F.expr(
        f"""transform(_pqcb, sb ->
  element_at(array_sort(transform(sb.cents, s ->
    named_struct('nd',
      CASE WHEN s.c = 0 AND sb.j = 0 THEN ({tguard}) + {nd_guarded}
           WHEN s.c = 0 THEN {nd_guarded}
           ELSE {nd_plain} END,
      'c', s.c))), 1).c)"""
    )


def _pq_table_tabs_expr(vec_col: str, dsub: int):
    """Flat m*ksub ADC lookup table over the broadcast ``_pqcb`` column
    — same entry order (subspace-major, centroid-minor) and same
    guard-on-centroid-0 convention as ``_pq_tables_sql``."""
    _sub, agg, g = _pq_table_sub(vec_col, dsub)
    return F.expr(
        f"""flatten(transform(_pqcb, sb ->
  transform(sb.cents, s ->
    CASE WHEN s.c = 0 THEN (({g}) + {agg}) ELSE ({agg}) END)))"""
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes): each vector compressed to m small ints — the
    32x-and-up storage/IO squeeze that makes billion-vector search
    scan-able (m bytes per vector at rest instead of dim x 4).

    Round-15: the codebook rides a ONE-ROW broadcast
    (BroadcastNestedLoopJoin against a single row — the
    ``assign_cells_table`` shape; the stream side's partitioning is
    untouched) and the per-row argmin is a constant-size expression
    template. The previous literal form (``_pq_encode_sql``, kept for
    the oracle/parity harness) expanded every codebook centroid into
    the expression tree: ~39 KB of SQL parsed and shipped per task
    binary, for folds that run interpreted either way. Same doubles,
    same tie/NULL/guard semantics — pinned by
    tests comparing the two paths row-for-row.
    """
    return corpus.crossJoin(
        F.broadcast(_pq_one_row(corpus.sparkSession, codebooks))
    ).select(
        F.col(corpus_id).alias(corpus_id),
        _pq_table_encode_expr(vec_col, len(codebooks), len(codebooks[0][0])).alias(
            "codes"
        ),
    )


def _pq_tables_sql(col_name: str, codebooks: list[list[list[float]]]) -> str:
    """Flat m*ksub lookup table of dot(query_subvector, centroid) —
    computed ONCE per query row, before the candidate join."""
    entries = []
    for j, cb in enumerate(codebooks):
        dsub = len(cb[0])
        sub = f"slice({col_name}, {j * dsub + 1}, {dsub})"
        entries.extend(
            _dot_sql(sub, c, guard=(i == 0)) for i, c in enumerate(cb)
        )
    return "array(" + ", ".join(entries) + ")"


def ann_pq_topk(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k inner product over PQ codes via asymmetric
    distance computation (ADC, Jégou et al. 2011 §III): each query
    precomputes its m x ksub dot-product lookup table; scoring a
    candidate is then m table lookups + adds — no float vectors are
    read or multiplied per candidate.

    Scale shape: ``corpus_codes`` (from ``pq_encode``, possibly
    persisted) streams through without shuffling and its scan reads m
    small ints per row; queries + tables broadcast. The only shuffle is
    the per-query top-k window, pre-cut by a partial WindowGroupLimit.
    Compose with the IVF cell join (``ann_ivf_topk``) for IndexIVFPQ
    semantics — probe inverted lists first, ADC-score inside them.

    The fold over subspaces is an ordered ``aggregate(sequence(...))``,
    so scores are bit-reproducible (and oracle-comparable) — not a
    shuffle-order-dependent sum.
    """
    m = len(codebooks)
    ksub = len(codebooks[0])
    qb = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    ).crossJoin(
        F.broadcast(_pq_one_row(queries.sparkSession, codebooks))
    ).select(
        "query_id",
        _pq_table_tabs_expr("_qv", len(codebooks[0][0])).alias("_tab"),
    )
    score = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D, "
        f"(a, j) -> a + element_at(_tab, j * {ksub} + element_at(codes, j + 1) + 1))"
    )
    scored = corpus_codes.join(F.broadcast(qb)).select(
        "query_id", corpus_id, score.alias("score")
    )
    return _topk_per_query(scored, corpus_id, k, "score")


def ann_ivfpq_topk_mem(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    codebooks: list[list[list[float]]],
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """In-memory IndexIVFPQ semantics: IVF cell blocking (each query
    probes its nprobe nearest cells) + PQ/ADC scoring inside the probed
    cells — the candidate set shrinks to ~nprobe/n_cells of the corpus
    AND each candidate costs m table lookups instead of a dim-wide dot.

    One corpus pass emits (id, codes, cell); the cell equi-join against
    the broadcast query batch replaces ``ann_pq_topk``'s cross join.
    Use ``ann_ivfpq_topk`` (the persisted variant) when the index lives
    on disk — it additionally prunes the scan to the probed partitions.
    Deterministic with the default codebook/centroid families, so the
    whole path is DuckDB-oracle-checkable (query ``ann_ivfpq_mem``).
    """
    if centroids is not None:
        n_cells = len(centroids)
    m = len(codebooks)
    ksub = len(codebooks[0])
    from ..session import ensure_parallelism

    # ensure_parallelism: the per-row encode (m*ksub interpreted dot
    # folds) is exactly the compute-bound shape a single-file local
    # scan would single-thread; a no-op on already-split inputs
    cb = ensure_parallelism(corpus).crossJoin(
        F.broadcast(_pq_one_row(corpus.sparkSession, codebooks))
    ).select(
        F.col(corpus_id).alias(corpus_id),
        _pq_table_encode_expr(vec_col, m, dim // m).alias("codes"),
        ivf_cell(vec_col, dim, n_cells, centroids).alias("_cell"),
    )
    probes = F.expr(
        f"transform(slice({_cell_rank_sql('_qv', dim, n_cells, centroids)}, 1, {nprobe}), s -> s.c)"
    )
    qb = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    ).crossJoin(
        F.broadcast(_pq_one_row(queries.sparkSession, codebooks))
    ).select(
        "query_id",
        _pq_table_tabs_expr("_qv", dim // m).alias("_tab"),
        F.explode(probes).alias("_cell"),
    )
    score = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D, "
        f"(a, j) -> a + element_at(_tab, j * {ksub} + element_at(codes, j + 1) + 1))"
    )
    scored = cb.join(F.broadcast(qb), "_cell").select(
        "query_id", corpus_id, score.alias("score")
    )
    return _topk_per_query(scored, corpus_id, k, "score")


def ann_ivfpq_topk(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int,
    dim: int,
    codebooks: list[list[list[float]]],
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec_col: str = "embedding",
    index_vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
    allow_missing_meta: bool = False,
) -> DataFrame:
    """IndexIVFPQ search over a persisted index
    (sources.sinks.write_ivfpq_index): partition-pruned scan of PQ codes
    + ADC lookup-table scoring.

    The two scale reductions compound: the ``_cell IN (...)`` predicate
    prunes to the probed partitions at the file-listing level (same as
    ``ann_ivf_topk_indexed``), and the surviving scan reads m small ints
    per vector instead of dim floats; scoring is m table lookups. The
    ``_ivfpq_meta.json`` sidecar is asserted before probing — a
    different dim/n_cells/centroids/codebooks than the index was
    written with raises instead of silently returning wrong neighbors,
    and so does a MISSING sidecar (unverifiable quantizer) unless
    ``allow_missing_meta=True``.
    """
    if centroids is not None:
        n_cells = len(centroids)
    from ..sources.sinks import ivf_meta, pq_meta, read_sidecar_text

    raw = read_sidecar_text(spark, index_path.rstrip("/") + "/_ivfpq_meta.json")
    if raw is None and not allow_missing_meta:
        raise ValueError(
            f"IVFPQ index at {index_path} has no _ivfpq_meta.json sidecar; "
            "cannot verify it was written with this probe's quantizer "
            "(dim/n_cells/centroids/codebooks). Rebuild with "
            "write_ivfpq_index, or pass allow_missing_meta=True for a "
            "pre-sidecar index you trust."
        )
    if raw is not None:
        import json as _json

        written = _json.loads(raw)
        asked = ivf_meta(dim, n_cells, centroids, index_vec_col)
        asked.update(pq_meta(codebooks))
        bad = {k2: (written.get(k2), asked[k2]) for k2 in asked if written.get(k2) != asked[k2]}
        if bad:
            raise ValueError(
                f"IVFPQ index at {index_path} was written with a different "
                f"quantizer than this probe: mismatched "
                + ", ".join(
                    f"{k2} (index={w!r}, probe={a!r})" for k2, (w, a) in bad.items()
                )
                + ". Probe with the same dim/n_cells/centroids/codebooks "
                "the index was built with, or rebuild the index."
            )
    m = len(codebooks)
    ksub = len(codebooks[0])
    probes = F.expr(
        f"transform(slice({_cell_rank_sql('_qv', dim, n_cells, centroids)}, 1, {nprobe}), s -> s.c)"
    )
    qb = (
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec_col).alias("_qv")
        )
        .crossJoin(F.broadcast(_pq_one_row(queries.sparkSession, codebooks)))
        .select(
            "query_id",
            _pq_table_tabs_expr("_qv", dim // len(codebooks)).alias("_tab"),
            F.explode(probes).alias("_cell"),
        )
        .localCheckpoint(eager=True)  # pin: feeds the filter collect AND the join
    )
    cells = sorted(r["_cell"] for r in qb.select("_cell").distinct().collect())
    corpus = spark.read.parquet(index_path).filter(F.col("_cell").isin(cells))
    score = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0D, "
        f"(a, j) -> a + element_at(_tab, j * {ksub} + element_at(codes, j + 1) + 1))"
    )
    scored = corpus.join(F.broadcast(qb), "_cell").select(
        "query_id", corpus_id, score.alias("score")
    )
    return _topk_per_query(scored, corpus_id, k, "score")


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket equi-join + exact rerank.

    The equi-join on bucket id replaces the cross join — at 100 TB this
    is a standard shuffle (or broadcast, if the query side is small)
    keyed on the bucket, candidates ~ n/2^planes per bucket.
    """
    qb = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_bucket", lsh_bucket("_qv", dim, n_planes))
    cb = corpus.select(
        F.col(corpus_id).alias(corpus_id), F.col(vec_col).alias("_cv")
    ).withColumn("_bucket", lsh_bucket("_cv", dim, n_planes)).withColumn(
        "_cn", l2_norm(F.col("_cv"))
    )
    scored = cb.join(
        F.broadcast(qb.withColumn("_qn", l2_norm(F.col("_qv")))), "_bucket"
    ).select(
        "query_id",
        corpus_id,
        # try_divide: a zero vector (norm 0) scores NULL (ranked last),
        # never an ANSI DIVIDE_BY_ZERO job abort — same as cosine()
        F.try_divide(
            dot(F.col("_qv"), F.col("_cv")), F.col("_qn") * F.col("_cn")
        ).alias("sim"),
    )
    return _topk_per_query(scored, corpus_id, k, "sim")


def ann_ivfpq_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    codebooks: list[list[list[float]]],
    refine: int = 4,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVFPQ shortlist + EXACT rerank — the FAISS IndexRefineFlat
    recipe (Jégou et al. 2011 §V "re-ranking with source coding"; FAISS
    pairs IndexIVFPQ with a refine stage the same way): ADC's m-lookup
    scores are quantized approximations, so the standard quality step
    keeps an oversized shortlist of ``k * refine`` candidates per query
    from the cheap path, reads TRUE vectors for only those candidates,
    and reranks by exact inner product. Recall approaches the exact
    search's while the full corpus is still touched only through
    m-byte codes (tests pin shortlist containment and the recall gain
    over raw ADC).

    Scale shape: the shortlist is queries x (k*refine) rows — metadata-
    sized — so fetching true vectors is ONE BroadcastHashJoin of the
    shortlist against the corpus (the corpus never shuffles and only
    shortlisted rows ever surface their float vectors); query vectors
    ride a second broadcast; the final per-query top-k reuses the
    shared WindowGroupLimit tail. Exact scores use the same sequential
    zip_with/aggregate fold as ``knn_topk``, so the whole path is
    DuckDB-oracle-replayable (gate ``ann_ivfpq_rerank``).
    """
    shortlist = ann_ivfpq_topk_mem(
        queries,
        corpus,
        k=int(k) * int(refine),
        dim=dim,
        codebooks=codebooks,
        query_id=query_id,
        corpus_id=corpus_id,
        vec_col=vec_col,
        n_cells=n_cells,
        nprobe=nprobe,
        centroids=centroids,
    ).select("query_id", corpus_id)
    cand = corpus.select(
        F.col(corpus_id), F.col(vec_col).alias("_cv")
    ).join(F.broadcast(shortlist), corpus_id)
    qv = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    scored = cand.join(F.broadcast(qv), "query_id").select(
        "query_id",
        corpus_id,
        dot(F.col("_qv"), F.col("_cv")).alias("score"),
    )
    return _topk_per_query(scored, corpus_id, k, "score")
