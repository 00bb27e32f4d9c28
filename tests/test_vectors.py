from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
    ann_lsh_topk,
    cosine,
    dot,
    knn_topk,
    l2_normalize,
)

SF = "/root/testdata/sf0.001"


def test_dot_and_norm(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 0.0, 1.0])], ["a", "b"])
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        l2_normalize(F.col("a")).alias("n"),
        cosine(F.col("a"), F.col("a")).alias("self_cos"),
    ).first()
    assert row.d == 4.0
    assert row.n == pytest.approx([1 / 3, 2 / 3, 2 / 3])
    assert row.self_cos == pytest.approx(1.0)


def test_knn_full_k_equals_sorted_crossjoin(spark):
    # property (SURVEY §5.4): k = corpus size -> every (q, c) pair ranked
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.col("vec_id") < 30)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_topk(q, emb, k=30)
    assert out.count() == 3 * 30
    # rank 1 of a query that is in the corpus must be itself (cos=1)
    top = {r.query_id: (r.vec_id, r.sim) for r in out.filter("rank = 1").collect()}
    for qid, (vid, sim) in top.items():
        assert vid == qid
        assert sim == pytest.approx(1.0)


def test_ann_lsh_topk_self_hit(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.col("vec_id") < 50)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_lsh_topk(q, emb, k=5, dim=64, n_planes=2).collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    # each query lands in its own bucket, so its self-match must appear
    for qid, rows in by_q.items():
        best = min(rows, key=lambda r: r.rank)
        assert best.vec_id == qid and best.sim == pytest.approx(1.0)


def test_ivf_topk_self_hit_and_recall(spark):
    # each query is in the corpus and always probes its own cell ->
    # top-1 must be the query itself at sim ~= 1
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        ann_ivf_topk,
        knn_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann_ivf_topk(q, emb, k=3, dim=64, n_cells=8, nprobe=2).collect()
    top1 = {r.query_id: (r.vec_id, r.sim) for r in got if r.rank == 1}
    assert set(top1) == {0, 1, 2, 3, 4}
    for qid, (vid, sim) in top1.items():
        assert vid == qid and abs(sim - 1.0) < 1e-9
    # approximate results are a subset of the corpus scored exactly:
    # every (q, v, sim) in IVF output matches the exact cosine from knn
    exact = {
        (r.query_id, r.vec_id): r.sim
        for r in knn_topk(q, emb, k=emb.count()).collect()
    }
    for r in got:
        assert abs(exact[(r.query_id, r.vec_id)] - r.sim) < 1e-9


def test_trained_centroids_beat_fixed(spark):
    """train_ivf_centroids (MLlib KMeans) is the production quantizer:
    at the same nprobe its recall vs exact kNN must beat the fixed
    pseudo-random centroids, and probing every cell must be exact.

    The synthetic embeddings are near-isotropic (mean pairwise cosine
    ~0), which caps ANY 8-cell IVF around ~0.5 recall@5 at nprobe=2 —
    real-world embedding corpora are clustered, where trained cells is
    where the win compounds. The assertions here pin the structural
    properties, not a corpus-dependent absolute."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        ann_ivf_topk,
        knn_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in knn_topk(queries, emb, k=5).collect()
    }
    trained = train_ivf_centroids(emb, n_cells=8)
    assert len(trained) == 8 and len(trained[0]) == 64

    def recall(centroids, nprobe):
        got = {
            (r.query_id, r.vec_id)
            for r in ann_ivf_topk(
                queries, emb, k=5, dim=64, n_cells=8,
                nprobe=nprobe, centroids=centroids,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_trained = recall(trained, 2)
    r_fixed = recall(None, 2)
    assert r_trained > r_fixed, (r_trained, r_fixed)
    assert r_trained >= 0.45  # well above the 2/8 random-probe floor
    # probing every cell degenerates to exact search
    assert recall(trained, 8) == 1.0


def test_pq_encode_codes_in_range_and_deterministic(spark):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        default_pq_codebooks,
        pq_encode,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = default_pq_codebooks(64, m=8, ksub=16)
    codes = {r.vec_id: r.codes for r in pq_encode(emb, books).collect()}
    assert len(codes) == emb.count()
    for cs in codes.values():
        assert len(cs) == 8
        assert all(0 <= c < 16 for c in cs)
    again = {r.vec_id: r.codes for r in pq_encode(emb.repartition(5), books).collect()}
    assert codes == again  # pure function of the vector, not of layout


def test_pq_adc_approximates_exact_dot(spark):
    """ADC over trained codebooks: scores approximate the true inner
    product and recall@5 vs exact dot ranking clears a floor well above
    random (5/500 = 1%). Trained books must beat the fixed
    pseudo-random family on reconstruction quality."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        ann_pq_topk,
        default_pq_codebooks,
        knn_topk,
        pq_encode,
        train_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in knn_topk(queries, emb, k=5, metric="dot").collect()
    }

    def recall(books):
        codes = pq_encode(emb, books)
        got = {
            (r.query_id, r.vec_id)
            for r in ann_pq_topk(queries, codes, books, k=5).collect()
        }
        return len(got & exact) / len(exact)

    trained = train_pq_codebooks(emb, dim=64, m=8, ksub=16)
    assert len(trained) == 8 and len(trained[0]) == 16 and len(trained[0][0]) == 8
    r_trained = recall(trained)
    r_fixed = recall(default_pq_codebooks(64, m=8, ksub=16))
    assert r_trained > r_fixed, (r_trained, r_fixed)
    assert r_trained >= 0.30, r_trained  # 8x16 PQ on isotropic data; >> 1% random


def test_dot_guard_raises_on_length_mismatch(spark):
    """Round-5 advisory: `raw + guard` never evaluated the assertion
    (null-safe Add short-circuits on the NULL left operand a mismatch
    produces). The guard now comes first and must actually fire."""
    df = spark.createDataFrame([([1.0, 2.0], [1.0])], ["a", "b"])
    with pytest.raises(Exception, match="length mismatch"):
        df.select(dot(F.col("a"), F.col("b")).alias("d")).collect()


def test_dot_null_vector_yields_null_not_error(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0], None), (None, [1.0, 2.0]), ([1.0, 2.0], [3.0, 4.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(dot(F.col("a"), F.col("b")).alias("d")).collect()
    assert [r.d for r in rows] == [None, None, 11.0]


def test_dot_sql_guard_raises_on_dim_mismatch(spark):
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import _dot_sql

    df = spark.createDataFrame([([1.0, 2.0],)], ["v"])
    # wrong declared dim (1 element vs length-2 column) must raise, not NULL
    with pytest.raises(Exception, match="dim=1"):
        df.selectExpr(f"{_dot_sql('v', [1.0])} AS d").collect()
    # matching dim still computes; NULL vector passes through as NULL
    ok = spark.createDataFrame(
        [([1.0, 2.0],), (None,)], "v array<double>"
    ).selectExpr(f"{_dot_sql('v', [3.0, 4.0])} AS d").collect()
    assert [r.d for r in ok] == [11.0, None]


def test_frozen_quantizer_artifact_integrity():
    """The committed artifacts/quantizer.json is the gate's trained
    quantizer (tools/train_quantizer.py): right shapes for the
    dim=64 / n_cells=8 / m=8 / ksub=16 eval geometry, L2-normalized
    coarse centroids (ivf_cell ranks by cosine via argmax-dot), all
    finite — a corrupted or hand-edited artifact fails here before it
    silently skews the oracle-checked recall numbers."""
    import math

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        frozen_quantizer,
    )

    cents, books = frozen_quantizer()
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    for c in cents:
        n = math.sqrt(sum(x * x for x in c))
        assert abs(n - 1.0) < 1e-9
        assert all(math.isfinite(x) for x in c)
    assert len(books) == 8
    for cb in books:
        assert len(cb) == 16 and all(len(c) == 8 for c in cb)
        assert all(math.isfinite(x) for c in cb for x in c)


def test_frozen_quantizer_matches_live_training_slice():
    """Training-slice drift guard (round-11 verdict item 5): the
    artifact's embedded fingerprint must match a fresh fingerprint of
    the live testdata slice it claims to be trained on. If the driver
    ever reseeds /root/testdata, the frozen quantizer would silently
    measure a stale distribution (recall quietly degrades, every gate
    stays green) — this test fails loudly instead; re-run
    tools/train_quantizer.py to retrain and refreeze."""
    import json
    import pathlib

    from retrieval_augmented_generation_rag_data_pipeline_spark.functions.artifacts import (
        corpus_fingerprint,
    )

    art = json.loads(
        (
            pathlib.Path(__file__).resolve().parent.parent
            / "artifacts"
            / "quantizer.json"
        ).read_text()
    )
    live = corpus_fingerprint(
        "/root/testdata/sf0.01/embeddings.parquet",
        "vec_id",
        "embedding",
        where="vec_id >= 8",
    )
    assert art["fingerprint"] == live, (
        "artifacts/quantizer.json was trained on a DIFFERENT corpus "
        f"than the live testdata slice ({art['fingerprint']} vs {live})"
        " — regenerate with tools/train_quantizer.py"
    )


def test_table_assignment_matches_literal(spark):
    """assign_cells_table must agree BIT-FOR-BIT with the literal
    ivf_cell path on shared centroids — both on the fixed pseudo-random
    family and on the frozen trained artifact — because semantic_dedup
    auto-switches between them on cell count and the switch must never
    move a vector's cell (and therefore its keep/drop)."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        assign_cells_table,
        frozen_quantizer,
        ivf_cell,
        ivf_centroid,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").alias("_v")
    )
    trained, _ = frozen_quantizer()
    for cents in ([ivf_centroid(c, 64) for c in range(8)], trained):
        lit = {
            r.vec_id: r.c
            for r in emb.withColumn(
                "c", ivf_cell("_v", 64, len(cents), cents).cast("int")
            ).collect()
        }
        tab = {
            r.vec_id: r._cell
            for r in assign_cells_table(
                emb, cents, vec_col="_v"
            ).collect()
        }
        assert lit == tab
    # NULL vector -> NULL cell on BOTH paths (round-12 advisory: the
    # literal path's all-NULL sort keys used to leave cell 0 first, so
    # NULL vectors silently landed in cell 0 on one path and the NULL
    # cell on the other — with max_cell_size that asymmetry could flip
    # keep/drop at the auto-switch)
    one = spark.createDataFrame([(1, None)], "vec_id int, _v array<double>")
    cents4 = [ivf_centroid(c, 64) for c in range(4)]
    row = assign_cells_table(one, cents4, "_v").first()
    assert row._cell is None
    lit_row = one.select(
        ivf_cell("_v", 64, 4, cents4).alias("c")
    ).first()
    assert lit_row.c is None


def test_semantic_dedup_table_path_matches_literal(spark):
    """Forcing assign='table' must reproduce the literal path's full
    (keep, dup_of, cell) output — the auto-switch is pure plumbing."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.dedup import (
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    key = lambda rows: sorted(  # noqa: E731
        (r.vec_id, r.cell, r.keep, r.dup_of, r.cos_max) for r in rows
    )
    lit = key(
        semantic_dedup(emb, 0.35, 64, n_cells=8, assign="literal").collect()
    )
    tab = key(
        semantic_dedup(emb, 0.35, 64, n_cells=8, assign="table").collect()
    )
    assert lit == tab and len(lit) == emb.count()


def test_ivf_table_path_matches_literal(spark):
    """ann_ivf_topk's table path must reproduce the literal path's full
    top-k (ids, sims, ranks) — probes and assignments fold identical
    doubles, so the result sets are bit-equal, not merely same-recall."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        ann_ivf_topk,
        frozen_quantizer,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    trained, _ = frozen_quantizer()
    key = lambda rows: sorted(  # noqa: E731
        (r.query_id, r.vec_id, r.sim, r.rank) for r in rows
    )
    for cents in (None, trained):
        lit = key(
            ann_ivf_topk(
                q, emb, k=5, dim=64, nprobe=2, centroids=cents,
                assign="literal",
            ).collect()
        )
        tab = key(
            ann_ivf_topk(
                q, emb, k=5, dim=64, nprobe=2, centroids=cents,
                assign="table",
            ).collect()
        )
        assert lit == tab and len(lit) == 25


def test_arrow_assignment_agrees_on_real_data(spark):
    """assign_cells_arrow (numpy GEMM) must agree with the exact paths
    on the test corpora — real embeddings have no cross-centroid dot
    ties, so argmax-under-GEMM and the bit-exact folds coincide (the
    documented guarantee; exact ties are the only divergence surface).
    NULL vectors get NULL cells; dim mismatch raises from the batch."""
    import pytest

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        assign_cells_arrow,
        frozen_quantizer,
        ivf_cell,
        ivf_centroid,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").alias("_v")
    )
    trained, _ = frozen_quantizer()
    for cents in ([ivf_centroid(c, 64) for c in range(8)], trained):
        lit = {
            r.vec_id: r.c
            for r in emb.withColumn(
                "c", ivf_cell("_v", 64, len(cents), cents).cast("int")
            ).collect()
        }
        arw = {
            r.vec_id: r._cell
            for r in assign_cells_arrow(emb, cents, "_v").collect()
        }
        assert lit == arw
    one = spark.createDataFrame(
        [(1, None), (2, [0.0] * 64)], "vec_id int, _v array<double>"
    )
    rows = {
        r.vec_id: r._cell
        for r in assign_cells_arrow(
            one, [ivf_centroid(c, 64) for c in range(4)], "_v"
        ).collect()
    }
    assert rows[1] is None and rows[2] is not None
    bad = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id int, _v array<double>")
    with pytest.raises(Exception, match="dim"):
        assign_cells_arrow(
            bad, [ivf_centroid(c, 64) for c in range(4)], "_v"
        ).collect()


def test_semantic_dedup_arrow_path_matches_exact_paths(spark):
    """assign='arrow' reproduces the literal path's full output on the
    test corpus (no dot ties on real data), and rejects unknown modes."""
    import pytest

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.dedup import (
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    key = lambda rows: sorted(  # noqa: E731
        (r.vec_id, r.cell, r.keep, r.dup_of, r.cos_max) for r in rows
    )
    lit = key(semantic_dedup(emb, 0.35, 64, n_cells=8, assign="literal").collect())
    arw = key(semantic_dedup(emb, 0.35, 64, n_cells=8, assign="arrow").collect())
    assert lit == arw
    with pytest.raises(ValueError, match="assign"):
        semantic_dedup(emb, 0.35, 64, assign="gpu")


def test_two_level_assignment_exact_within_group(spark):
    """assign_cells_two_level: ~2*sqrt(k) dots per row, exact within
    the winning coarse group — for every vector the chosen fine cell
    must be the flat-argmax BEST among the fine centroids of its
    winning coarse group (computed independently in numpy here), and
    agreement with the flat argmax must be high on the probe corpus
    (the IVF-style approximation caveat, quantified). NULL vectors get
    the family's NULL cell."""
    import numpy as np

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        assign_cells_table,
        assign_cells_two_level,
        group_centroids,
        ivf_centroid,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(100)
        .select("vec_id", F.col("embedding").alias("_v"))
    )
    cents = [ivf_centroid(c, 64) for c in range(256)]
    grouping = group_centroids(cents)
    coarse_cents, fine_to_coarse = grouping
    two = {
        r.vec_id: r._cell
        for r in assign_cells_two_level(
            emb, cents, "_v", grouping=grouping
        ).collect()
    }
    flat = {
        r.vec_id: r._cell
        for r in assign_cells_table(emb, cents, "_v").collect()
    }
    vecs = {r.vec_id: np.array(r._v) for r in emb.collect()}
    cmat = np.asarray(cents)
    co = np.asarray(coarse_cents)
    f2c = np.asarray(fine_to_coarse)
    for vid, v in vecs.items():
        g = int(np.argmax(v @ co.T))  # winning coarse group
        members = np.where(f2c == g)[0]
        best = int(members[np.argmax(v @ cmat[members].T)])
        assert two[vid] == best, (vid, two[vid], best)
    del flat  # exactness holds on ANY family; agreement is tested below
    # NULL contract
    one = spark.createDataFrame([(1, None)], "vec_id int, _v array<double>")
    assert (
        assign_cells_two_level(one, cents, "_v", grouping=grouping)
        .first()
        ._cell
        is None
    )


def test_two_level_agreement_on_clustered_centroids(spark):
    """The IVF premise, quantified: when the fine centroid table has
    cluster structure (as k-means-trained centroids do — the
    deployment case), the two-level winner agrees with the flat argmax
    almost always. On an ISOTROPIC random family the coarse level
    carries no signal and agreement collapses (~28/100 measured on
    the 256-cell pseudo-random family) — which is exactly why
    two_level is opt-in with a documented caveat, not the auto tier.
    This builds 16 anchor directions with 16 tightly-packed fine
    centroids each; group_centroids must recover the anchors and the
    two-level assignment must then match flat argmax >= 95%."""
    import numpy as np

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        assign_cells_table,
        assign_cells_two_level,
        group_centroids,
        ivf_centroid,
    )

    rng = np.random.RandomState(7)
    anchors = rng.normal(size=(16, 64))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    fine = []
    for c in range(256):
        v = anchors[c % 16] + 0.08 * rng.normal(size=64)
        fine.append([float(x) for x in v / np.linalg.norm(v)])
    # queries drawn from the SAME clustered distribution — the
    # deployment geometry (centroids are k-means output OF the data,
    # so data and centroids share structure); an isotropic query set
    # against clustered centroids reads ~62/100 because near-tied
    # anchor clusters flip the global argmax
    qs = []
    for i in range(100):
        v = anchors[i % 16] + 0.15 * rng.normal(size=64)
        qs.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    emb = spark.createDataFrame(qs, "vec_id int, _v array<double>")
    grouping = group_centroids(fine, n_coarse=16)
    two = {
        r.vec_id: r._cell
        for r in assign_cells_two_level(
            emb, fine, "_v", grouping=grouping
        ).collect()
    }
    flat = {
        r.vec_id: r._cell
        for r in assign_cells_table(emb, fine, "_v").collect()
    }
    agree = sum(two[k] == flat[k] for k in flat)
    assert agree / len(flat) >= 0.95, f"agreement {agree}/{len(flat)}"


def test_semantic_dedup_two_level_drops_planted_dups(spark):
    """semantic_dedup(assign='two_level') preserves the dedup
    semantics: planted exact-duplicate vectors land in the same cell
    on ANY assignment (identical vectors always share a winning
    group) and the lower-id copy survives."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.dedup import (
        semantic_dedup,
    )
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        ivf_centroid,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(40)
    )
    dup = emb.withColumn("vec_id", F.col("vec_id") + 100000)
    corpus = emb.unionByName(dup)
    cents = [ivf_centroid(c, 64) for c in range(600)]
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            corpus, threshold=0.999, dim=64, centroids=cents,
            assign="two_level",
        ).collect()
    }
    for r in emb.select("vec_id").collect():
        assert out[r.vec_id].keep
        assert not out[r.vec_id + 100000].keep
        assert out[r.vec_id + 100000].dup_of == r.vec_id


def test_group_centroids_reseat_never_leaves_empty_groups():
    """Round-13 ADVICE (medium): the empty-group reseat used a global
    argmin that could steal the SOLE member of an already-filled group,
    re-emptying it — downstream, assign_cells_two_level's left join
    would then silently hand valid vectors a NULL cell. Degenerate
    centroid tables (many identical centroids -> argmax piles everything
    into one group) force multiple reseats; every coarse group must end
    non-empty and every fine centroid must keep a valid group."""
    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        group_centroids,
    )

    # all-identical: worst case, argmax ties everything to one group
    same = [[1.0, 0.0, 0.0]] * 6
    coarse, assign = group_centroids(same, n_coarse=3, seed=1)
    assert len(coarse) == 3
    assert set(assign) == {0, 1, 2} or all(
        any(a == g for a in assign) for g in range(3)
    )
    assert len(assign) == 6 and all(0 <= a < 3 for a in assign)

    # two tight natural clusters, many coarse slots: reseats must fill
    # every slot without orphaning the tight clusters' sole donors
    import math

    tight = [[1.0, e, 0.0] for e in (0.0, 1e-9, 2e-9)] + [
        [0.0, 1.0, e] for e in (0.0, 1e-9, 2e-9)
    ]
    coarse2, assign2 = group_centroids(tight, n_coarse=6, seed=3)
    counts = [assign2.count(g) for g in range(6)]
    assert min(counts) >= 1
    assert len(assign2) == 6

    # n_coarse == k on duplicated rows
    dup = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]]
    coarse3, assign3 = group_centroids(dup, n_coarse=4, seed=5)
    counts3 = [assign3.count(g) for g in range(4)]
    assert min(counts3) >= 1
    assert not any(math.isnan(x) for c in coarse3 for x in c)


def test_ann_ivfpq_rerank_exact_scores_and_recall_gain(spark):
    """IndexRefineFlat semantics: (1) rerank output is a subset of the
    ADC shortlist with EXACT inner-product scores (bit-equal to
    knn_topk's dot on the same pairs); (2) recall@k vs exact search is
    at least the raw ADC path's — the refine stage can reorder within
    the shortlist, never invent candidates outside it."""
    from pyspark.sql import functions as F

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        ann_ivfpq_rerank,
        ann_ivfpq_topk_mem,
        default_pq_codebooks,
        knn_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = default_pq_codebooks(64, m=8, ksub=16)
    q = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 5
    rer = ann_ivfpq_rerank(
        q, emb, k=k, dim=64, codebooks=books, refine=4, n_cells=8, nprobe=2
    ).collect()
    short = ann_ivfpq_topk_mem(
        q, emb, k=k * 4, dim=64, codebooks=books, n_cells=8, nprobe=2
    ).collect()
    adc = ann_ivfpq_topk_mem(
        q, emb, k=k, dim=64, codebooks=books, n_cells=8, nprobe=2
    ).collect()
    exact = knn_topk(q, emb, k=k, metric="dot").collect()

    short_set = {(r.query_id, r.vec_id) for r in short}
    assert all((r.query_id, r.vec_id) in short_set for r in rer)

    # exact scores: compare against the brute-force dot for the same pairs
    exact_all = {
        (r.query_id, r.vec_id): r.sim
        for r in knn_topk(q, emb, k=emb.count(), metric="dot").collect()
    }
    for r in rer:
        assert r.score == exact_all[(r.query_id, r.vec_id)]

    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    def recall(rows):
        hit = sum(1 for r in rows if r.vec_id in truth[r.query_id])
        return hit / sum(len(v) for v in truth.values())

    assert recall(rer) >= recall(adc)

    # the refine stage's defining property: per query, the reranked
    # top-k is EXACTLY the exact-dot top-k restricted to the shortlist
    # (same score-desc, id-asc tie-break) — refine repairs every ADC
    # ordering error inside the shortlist and can do nothing outside it
    short_by_q: dict = {}
    for r in short:
        short_by_q.setdefault(r.query_id, []).append(r.vec_id)
    rer_by_q: dict = {}
    for r in sorted(rer, key=lambda r: (r.query_id, r.rank)):
        rer_by_q.setdefault(r.query_id, []).append(r.vec_id)
    for qid, cands in short_by_q.items():
        want = sorted(cands, key=lambda v: (-exact_all[(qid, v)], v))[:k]
        assert rer_by_q[qid] == want


def test_ann_paths_tolerate_zero_and_null_vectors(spark):
    """Round-14 hardening: an all-zero embedding (norm 0) must score
    NULL-sim via try_divide instead of aborting under ANSI, and a NULL
    QUERY vector must emit no rows (the corpus side already maps NULL
    vectors to a NULL cell — unfiltered, the query side probed
    arbitrary cells and fabricated k NULL-sim neighbors)."""
    from pyspark.sql import functions as F

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        ann_ivf_topk,
        ann_lsh_topk,
        knn_topk,
        l2_normalize,
    )

    dim = 8
    rows = [(i, [float((i + j) % 5) + 0.5 for j in range(dim)]) for i in range(20)]
    rows.append((100, [0.0] * dim))  # zero vector in the corpus
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, rows[0][1]), (1, None)], "query_id long, embedding array<double>"
    )
    out = ann_ivf_topk(q, corpus, k=3, dim=dim, n_cells=4, nprobe=4)
    got = {r.query_id for r in out.collect()}
    assert got == {0}  # NULL-vector query emits nothing; job survives
    out2 = ann_lsh_topk(q.filter("query_id = 0"), corpus, k=3, dim=dim)
    assert all(r.query_id == 0 for r in out2.collect())
    # l2_normalize of the zero vector: all-NULL, not a crash
    z = corpus.filter("vec_id = 100").select(
        l2_normalize(F.col("embedding")).alias("n")
    ).collect()[0].n
    assert all(v is None for v in z)


def test_knn_topk_rejects_unknown_metric(spark):
    import pytest

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import knn_topk

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, embedding array<double>")
    with pytest.raises(ValueError, match="metric"):
        knn_topk(q, df, k=1, metric="cosin")


def test_pq_encode_rejects_overlength_vectors(spark):
    """The per-subspace slice guards catch UNDER-length vectors; the
    total-size guard must catch OVER-length ones too (a 12-dim vector
    used to be silently encoded from its first 8 components)."""
    import pytest

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import pq_codebook, pq_encode

    books = [pq_codebook(j, 4, 4) for j in range(2)]  # dim 8
    ok = spark.createDataFrame([(1, [0.1] * 8)], "vec_id long, embedding array<double>")
    assert len(pq_encode(ok, books).collect()[0].codes) == 2
    over = spark.createDataFrame([(2, [0.1] * 12)], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="8-dim"):
        pq_encode(over, books).collect()
