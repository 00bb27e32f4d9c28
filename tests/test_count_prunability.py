"""Count-prunability guard (round 16, VERDICT r15 item 4).

The bench's action is ``count()``; Catalyst prunes compute the row count
does not depend on, so a query can silently become a file-count
measurement (the round-15 spine-join trap). This test pins, for every
headline query, WHICH load-bearing operators its count-plan is allowed
to lose relative to its full plan (the audited classification in
plans/r16/count_prunability_audit.md). A new query, or a reshaping of
an existing one, that prunes MORE than the recorded envelope fails here
and must be consciously classified (and its noop-sink cost recorded)
before it ships.

Plans are built under ``pinning_disabled`` so the diff covers the FULL
lineage deterministically (pins would truncate it to an ExistingRDD and
hide upstream pruning); the CC-closure queries still execute their
eager per-round checkpoints at construction — that compute is executed,
not prunable, by construction.
"""

from __future__ import annotations

import pytest

from retrieval_augmented_generation_rag_data_pipeline_spark.operators.pinning import (
    pinning_disabled,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.plans.queries import (
    REGISTRY,
)

MARKERS = ["Join", "Generate", "Aggregate", "Window", "split(lower("]

# name -> {marker: (full_count, count_plan_count)} — ONLY markers that
# are allowed to shrink under count(), with their audited envelope.
# Regenerate via the procedure in plans/r16/count_prunability_audit.md.
ALLOWED_LOSS: dict[str, dict[str, tuple[int, int]]] = {
    "c4_line_filter": {"split(lower(": (1, 0)},
    "ccnet_buckets": {"Join": (3, 1)},
    "dedup_chunks": {"Generate": (2, 1), "Join": (1, 0), "split(lower(": (2, 1)},
    "dedup_corpus_best": {"Join": (1, 0), "Window": (1, 0), "split(lower(": (2, 0)},
    "dedup_eval": {"split(lower(": (3, 1)},
    "dedup_minhash": {"split(lower(": (1, 0)},
    "dedup_simhash": {"split(lower(": (1, 0)},
    "html_clean": {"split(lower(": (1, 0)},
    "join_asof": {"Window": (8, 7)},
    "lang_id_trained": {"Join": (1, 0)},
    "lm_perplexity": {"Join": (1, 0)},
    "lm_perplexity_bigram": {"Join": (3, 0)},
    "mix_report": {"split(lower(": (1, 0)},
    "pack_sequences": {"Window": (1, 0)},
    "prepare_corpus": {"split(lower(": (2, 0)},
    "quality_classifier": {"Join": (1, 0)},
    "quality_score": {"split(lower(": (1, 0)},
    "retrieval_eval": {"Join": (8, 4), "Window": (8, 4)},
    "retrieval_eval_ivf": {"Generate": (2, 1), "Join": (12, 6), "Window": (8, 4)},
    "sessionize_islands": {"Window": (3, 2)},
    "token_count": {"split(lower(": (1, 0)},
    "token_count_subword": {"Generate": (2, 1), "Join": (1, 0), "split(lower(": (2, 1)},
    "window_time_range": {"Window": (1, 0)},
}


def _headline():
    from bench import HEADLINE

    return HEADLINE


SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", _headline())
def test_count_plan_prunes_no_more_than_audited(spark, name):
    fn, _sql = REGISTRY[name]
    with pinning_disabled():
        q = fn(spark, SF_DIR)
        full = q._jdf.queryExecution().optimizedPlan().toString()
        cnt = q.groupBy().count()._jdf.queryExecution().optimizedPlan().toString()
    allowed = ALLOWED_LOSS.get(name, {})
    for m in MARKERS:
        nf, nc = full.count(m), cnt.count(m)
        if nc >= nf:
            continue  # nothing lost for this marker
        assert m in allowed, (
            f"{name}: count() prunes {m} ({nf} -> {nc}) but the audit "
            "allows no loss for that marker — classify it in "
            "plans/r16/count_prunability_audit.md and record its "
            "noop-sink cost before pinning it here"
        )
        af, ac = allowed[m]
        # the envelope is the RATIO of survivors: at sf boundaries the
        # absolute counts can shift with plan size, but count() must
        # keep at least the audited fraction of the full plan's nodes
        assert nc * max(af, 1) >= ac * nf, (
            f"{name}: count() now prunes {m} deeper than audited "
            f"({nf} -> {nc}; audited {af} -> {ac})"
        )
