"""Load-independent perf signal: the physical plan shape of every bench
headline query must match the recorded PLAN_GUARD.json.

Wall-clock on a shared box moves up to 3x with neighbor load, so
bench.py alone can't distinguish host noise from a plan regression. An
extra Exchange, a broadcast join degrading to sort-merge, a window
appearing in a TakeOrdered path, or row-at-a-time Python creeping in
all fail here deterministically. Plans are built with lineage pinning
disabled so lazily-pinned queries expose their full lineage; building
them is still not execution-free (bloom bitmap builds, positional-zip
counts, and the iterative closure run bounded construction-time jobs) —
see tools/plan_guard.py for the guard's honest boundaries, including
the two iterative queries whose recorded shape is legitimately {}.

On intentional plan changes: `python tools/plan_guard.py --record`.
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def test_headline_plan_shapes_match_recorded(spark):
    from bench import HEADLINE
    from tools.plan_guard import GUARD_FILE, SF_DIR, count_nodes

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.pinning import pinning_disabled
    from retrieval_augmented_generation_rag_data_pipeline_spark.plans.queries import REGISTRY

    want = json.loads(GUARD_FILE.read_text())
    assert set(want) == set(HEADLINE), (
        "PLAN_GUARD.json is stale vs bench.HEADLINE — rerun "
        "tools/plan_guard.py --record"
    )
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    drift = {}
    with pinning_disabled():
        for name in HEADLINE:
            df = REGISTRY[name][0](spark, SF_DIR)
            got = count_nodes(df._jdf.queryExecution().explainString(mode))
            if got != want[name]:
                drift[name] = {"want": want[name], "got": got}
    assert not drift, json.dumps(drift, indent=2, sort_keys=True)


def test_no_row_at_a_time_python_in_headline_plans():
    """BatchEvalPython (row-at-a-time UDF) must never appear; the only
    Python in any headline plan is Arrow-vectorized."""
    from tools.plan_guard import GUARD_FILE

    want = json.loads(GUARD_FILE.read_text())
    offenders = {n: s for n, s in want.items() if s.get("BatchEvalPython")}
    assert not offenders
    cartesian = {n: s for n, s in want.items() if s.get("CartesianProduct")}
    assert not cartesian
