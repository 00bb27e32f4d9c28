"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <median-of-3 total sec>, "unit": "sec",
   "queries": {name: median sec, ...}, "runs": 3,
   "min_value": <best-run total>, "cold_value": <first-run total>,
   "sf": <sf>, "loadavg_start": [...], "loadavg_end": [...],
   "detail": "BENCH_DETAIL.json"}

TRUNCATION CONTRACT (round 9, per the round-8 verdict): the driver
records only the LAST ~2000 chars of stdout, and round 8's line — with
three 35-entry per-query maps — outgrew that window, decapitating the
headline `value` in BENCH_r08.json. The stdout line therefore stays
compact (headline totals + the single most important per-query map,
the medians — ~1.1 KB, well inside the window even if the headline
set grows); the per-query min/cold maps move to BENCH_DETAIL.json
next to this script (overwritten per run, same fields as the old fat
line). Pre-r9 artifacts with inline min_queries/cold_queries compare
against the detail file.

The loadavg fields make each recording self-describing (round-6 lesson:
a 36.5s loaded reading vs 25.3s idle reading of the SAME code cost a
whole investigation) — loadavg_start is the host's OTHER load (sampled
before Spark starts); loadavg_end includes the bench's own 32 threads,
so compare start values across rounds.

Protocol (round 8, per the round-7 verdict): THREE passes per query so
the headline `value` is a per-query MEDIAN — one noisy-neighbor spike
no longer moves the trend line, and the BENCH_r* history stops needing
post-hoc idle re-runs to interpret. "cold" = the first pass (includes
whole-stage-codegen compilation and page-cache misses); "min" = best
of the three (the old "warm" figure — compare pre-r8 recordings, which
were min-of-2, against min_*, not value). Medians are per-query, so
`value` is the sum of per-query medians, not the median of totals.

Each query is executed to completion (count() over the result — no
driver-side materialization of payload columns beyond the action).
"""

from __future__ import annotations

import json
import os
import pathlib
import statistics
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
    "pack_assembly",
    "retrieval_eval",
    "dedup_eval",
    "mix_report",
    "retrieval_eval_ivf",
    "dedup_spans",
    "dedup_spans_strip",
    "dedup_spans_strip_raw",
    "dedup_semantic",
    "lm_perplexity",
    "lm_perplexity_bigram",
    "select_token_budget",
    "select_budget_grouped",
    "quality_classifier",
    "select_budget_classifier",
    "dedup_corpus_best",
    "ccnet_buckets",
    "c4_line_filter",
    "url_filter",
    "domain_caps",
    "mix_temperature",
    "url_dedup",
    "ann_ivfpq_rerank",
    "html_clean",
    "join_tpch_q5",
    "split_by_host",
    "window_time_range",
    "url_filter_psl",
    "lang_id_trained",
    "dsir_select",
    "dedup_image_phash",
    "decontaminate_fuzzy",
    "token_count_subword",
]

RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # dir names look like .../sf0.1; SPARK_GRAFT_SF overrides for dirs
    # whose name carries no sf suffix (a 10x scale replica of sf0.1 is
    # sf1 — run with SPARK_GRAFT_SF=1); report sf=-1 rather than crash
    # when neither source yields a number
    try:
        sf = float(
            os.environ.get(
                "SPARK_GRAFT_SF", sf_dir.rstrip("/").rsplit("sf", 1)[-1]
            )
        )
    except ValueError:
        sf = -1.0
    load_start = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark(app_name="bench")

    # JVM + parquet-footer warmup so per-query numbers measure the
    # queries, not session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _rnd in range(RUNS):
        for name in HEADLINE:
            fn, _sql = REGISTRY[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            times[name].append(round(time.time() - t0, 3))

    med = {n: round(statistics.median(ts), 3) for n, ts in times.items()}
    best = {n: min(ts) for n, ts in times.items()}
    cold = {n: ts[0] for n, ts in times.items()}
    summary = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "queries": med,
        "runs": RUNS,
        "min_value": round(sum(best.values()), 3),
        "cold_value": round(sum(cold.values()), 3),
        "sf": sf,
        "loadavg_start": load_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "detail": "BENCH_DETAIL.json",
    }
    # headline FIRST: if the side-artifact write fails (read-only
    # checkout, disk full), the stdout recording must still carry the
    # numbers this contract exists to protect
    print(json.dumps(summary), flush=True)
    # per-query min/cold maps: side artifact, never on stdout (see the
    # TRUNCATION CONTRACT in the module docstring)
    detail_path = pathlib.Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(
        json.dumps(
            {**summary, "min_queries": best, "cold_queries": cold}, indent=1
        )
        + "\n"
    )


if __name__ == "__main__":
    main()
