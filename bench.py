"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <warm total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "cold_value": <first-run total>,
   "cold_queries": {...}, "sf": <sf>,
   "loadavg_start": [1m, 5m, 15m], "loadavg_end": [1m, 5m, 15m]}

The loadavg fields make each recording self-describing (round-6 lesson:
a 36.5s loaded reading vs 25.3s idle reading of the SAME code cost a
whole investigation) — loadavg_start is the host's OTHER load (sampled
before Spark starts); loadavg_end includes the bench's own 32 threads,
so compare start values across rounds.

Protocol: two passes per query. "cold" = the first pass (includes
whole-stage-codegen compilation and any page-cache misses); "warm" =
min of the two (the steady-state cost estimator on a shared box —
single runs vary up to 3x with noisy neighbors). BOTH totals are
emitted so the headline `value` (warm) is never silently flattered by
the protocol; compare like with like.

Each query is executed to completion (count() over the result — no
driver-side materialization of payload columns beyond the action).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from retrieval_augmented_generation_rag_data_pipeline_spark.plans.queries import REGISTRY
from retrieval_augmented_generation_rag_data_pipeline_spark.session import get_spark

HEADLINE = [
    "agg_tpch_q1",
    "top_revenue_orders",
    "join_asof",
    "sessionize_islands",
    "window_tumbling",
    "knn_topk",
    "ann_lsh_buckets",
    "ann_ivf_topk",
    "dedup_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_corpus",
    "dedup_embedding_cosine",
    "join_positional",
    "quality_score",
    "token_count",
    "chunk_documents",
    "decontaminate",
    "tfidf_top_terms",
    "bm25_search",
    "hybrid_rrf",
    "ann_pq_topk",
    "bloom_anti_join",
    "dedup_chunks",
    "dedup_incremental",
    "prepare_corpus",
    "sample_weighted_k",
    "pack_sequences",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # dir names look like .../sf0.1; report sf=-1 rather than crash on
    # a non-conforming name (e.g. a scale-replica dir)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    load_start = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark(app_name="bench")

    # JVM + parquet-footer warmup so per-query numbers measure the
    # queries, not session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for rnd in range(2):
        for name in HEADLINE:
            fn, _sql = REGISTRY[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            if rnd == 0:
                cold[name] = dt
            warm[name] = min(warm.get(name, dt), dt)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(warm.values()), 3),
                "unit": "sec",
                "queries": warm,
                "cold_value": round(sum(cold.values()), 3),
                "cold_queries": cold,
                "sf": sf,
                "loadavg_start": load_start,
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
