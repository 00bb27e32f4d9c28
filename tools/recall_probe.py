"""ANN recall probe: recall@k of every approximate search path vs exact
knn_topk, at a chosen scale — the number a user sizing nprobe / codebook
m actually needs (the bench and oracle suites only prove the ANN paths
are *correct implementations of their approximation*, not how much
recall the approximation gives up).

Usage: python tools/recall_probe.py [sf_dir | perturb:N[:base_dir]] [n_queries] [k]
  defaults: perturb:10 (see below), 32, 10

The id-shifted sf1 replica (make_scale_replica.py) duplicates vectors
VERBATIM, so every query's exact top-k is its own copies and recall is
trivially 1.0 for any method that finds the query's bucket — a
meaningless testbed. ``perturb:N`` instead builds an N x corpus from
the sf0.1 embeddings where copy i gets seeded Gaussian noise graded by
i (cosine ~0.997 down to ~0.92 vs its source): near-neighbors at graded
similarity, the shape a dedup/retrieval corpus actually has.

Prints one JSON line:
  {"sf_dir": ..., "corpus_rows": N, "n_queries": Q, "k": K,
   "recall": {"ann_lsh_topk": r, "ivf fixed nprobe=2": r, ...}}

Each ANN result is joined to the exact top-k on (query_id, vec_id);
recall = matched / (Q * K), macro-averaged over queries implicitly
(every query contributes exactly K ground-truth rows).
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.operators import vectors
from retrieval_augmented_generation_rag_data_pipeline_spark.session import get_spark

DIM = 64


def recall_vs(exact, approx) -> float:
    """|approx top-k ∩ exact top-k| / |exact top-k|."""
    total = exact.count()
    hit = exact.select("query_id", "vec_id").join(
        approx.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    ).count()
    return round(hit / total, 4)


def perturbed_corpus(spark, base_dir: str, n_copies: int):
    """N x corpus of seeded-noise variants (driver-side numpy — the base
    table is 2k x 64 floats; the PROBE corpus is metadata-sized even at
    10x, the operators under test are what run distributed). Copy i's
    per-dim noise std is 0.01 + 0.005*i: noise norm 0.08..0.43 against
    unit vectors, i.e. cosine ~0.997 (copy 1) down to ~0.92 (copy 9)."""
    import numpy as np
    import pandas as pd

    base = (
        spark.read.parquet(f"{base_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = base["vec_id"].to_numpy()
    vecs = np.stack(base["embedding"].to_numpy()).astype(np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    frames = []
    for i in range(n_copies):
        if i == 0:
            pert = vecs
        else:
            rng = np.random.default_rng(1000 + i)
            pert = vecs + (0.01 + 0.005 * i) * rng.standard_normal(vecs.shape)
            pert /= np.linalg.norm(pert, axis=1, keepdims=True)
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": ids + i * 10_000_000,
                    "embedding": [row.astype(np.float32).tolist() for row in pert],
                }
            )
        )
    return spark.createDataFrame(
        pd.concat(frames, ignore_index=True),
        "vec_id bigint, embedding array<float>",
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "perturb:10"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("recall_probe")
    if sf_dir.startswith("perturb:"):
        parts = sf_dir.split(":")
        n_copies = int(parts[1])
        base_dir = parts[2] if len(parts) > 2 else "/root/testdata/sf0.1"
        emb = perturbed_corpus(spark, base_dir, n_copies).localCheckpoint(
            eager=True
        )
    else:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
    corpus_rows = emb.count()
    q = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    exact = vectors.knn_topk(q, emb, k=k).localCheckpoint(eager=True)
    out: dict[str, float] = {}

    # sign-LSH (the registry ann_lsh_topk shape: single-table buckets)
    out["ann_lsh_topk (8 planes)"] = recall_vs(
        exact, vectors.ann_lsh_topk(q, emb, k=k, dim=DIM, n_planes=8)
    )

    # IVF: fixed pseudo-random centroids (the oracle quantizer) vs
    # k-means-trained — at each nprobe. n_cells sized ~sqrt(corpus).
    n_cells = 16
    trained = vectors.train_ivf_centroids(emb, n_cells=n_cells)
    for nprobe in (1, 2, 4):
        out[f"ivf fixed n_cells={n_cells} nprobe={nprobe}"] = recall_vs(
            exact,
            vectors.ann_ivf_topk(q, emb, k=k, dim=DIM, n_cells=n_cells, nprobe=nprobe),
        )
        out[f"ivf trained n_cells={n_cells} nprobe={nprobe}"] = recall_vs(
            exact,
            vectors.ann_ivf_topk(
                q, emb, k=k, dim=DIM, nprobe=nprobe, centroids=trained
            ),
        )

    # PQ/ADC over the full corpus: fixed vs trained codebooks (m=8 -> 8
    # bytes/vector). PQ approximates the DOT metric; recall is vs the
    # cosine exact list, same as the registry queries compare.
    fixed_books = vectors.default_pq_codebooks(DIM, m=8, ksub=16)
    codes_f = vectors.pq_encode(emb, fixed_books).localCheckpoint(eager=True)
    out["pq fixed m=8 ksub=16"] = recall_vs(
        exact, vectors.ann_pq_topk(q, codes_f, fixed_books, k=k)
    )
    trained_books = vectors.train_pq_codebooks(emb, dim=DIM, m=8, ksub=16)
    codes_t = vectors.pq_encode(emb, trained_books).localCheckpoint(eager=True)
    out["pq trained m=8 ksub=16"] = recall_vs(
        exact, vectors.ann_pq_topk(q, codes_t, trained_books, k=k)
    )

    # IndexIVFPQ semantics (cell blocking + ADC), trained quantizers
    for nprobe in (2, 4):
        out[f"ivfpq trained n_cells={n_cells} nprobe={nprobe} m=8"] = recall_vs(
            exact,
            vectors.ann_ivfpq_topk_mem(
                q, emb, k=k, dim=DIM, codebooks=trained_books,
                n_cells=n_cells, nprobe=nprobe, centroids=trained,
            ),
        )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "corpus_rows": corpus_rows,
                "n_queries": n_q,
                "k": k,
                "recall": out,
            }
        )
    )


if __name__ == "__main__":
    main()
