"""Plan-shape guard: physical-operator counts for every bench headline
query, recorded to PLAN_GUARD.json and asserted by tests/test_plan_guard.py.

Why: wall-clock on a shared box moves up to 3x with neighbor load
(README idle-vs-noisy study), so bench.py alone can't distinguish "host
was busy" from "a plan regressed". Operator counts are load-independent:
an extra Exchange, a join that stopped broadcasting, a window that
appeared in a TakeOrdered path, or Python eval creeping into a JVM
pipeline all show up here deterministically.

Counts are taken from the FORMATTED explain tree (initial plan — no
execution, so AQE runtime re-planning doesn't add noise) at sf0.001;
plan shapes are scale-independent apart from AQE coalescing, and both
record and check use the same SF so broadcast-threshold effects cancel.

Usage:
  python tools/plan_guard.py --record   # rewrite PLAN_GUARD.json
  python tools/plan_guard.py            # check, non-zero exit on drift
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent
GUARD_FILE = REPO / "PLAN_GUARD.json"
SF_DIR = "/root/testdata/sf0.001"

# Physical nodes worth guarding. \b-bounded so e.g. BroadcastExchange
# never double-counts as Exchange, SortMergeJoin never as Sort.
NODES = [
    "Exchange",            # shuffle exchanges (broadcast counted separately)
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Window",
    "WindowGroupLimit",
    "Sort",
    "TakeOrderedAndProject",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "ArrowEvalPython",     # vectorized pandas UDF (allowed, bounded)
    "BatchEvalPython",     # row-at-a-time Python UDF (should stay 0)
]


def tree_of(plan: str) -> str:
    """The tree block of a formatted plan (detail sections repeat node
    names, so counting must stop at the first '(N) ' detail line)."""
    lines = []
    for ln in plan.splitlines():
        if re.match(r"^\(\d+\) ", ln):
            break
        lines.append(ln)
    return "\n".join(lines)


def count_nodes(plan: str) -> dict[str, int]:
    tree = tree_of(plan)
    out = {}
    for node in NODES:
        n = len(re.findall(rf"\b{node}\b", tree))
        if n:
            out[node] = n
    return out


def collect(names: list[str]) -> dict[str, dict[str, int]]:
    from retrieval_augmented_generation_rag_data_pipeline_spark.plans.queries import REGISTRY
    from retrieval_augmented_generation_rag_data_pipeline_spark.session import get_spark

    spark = get_spark("plan_guard")
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    shapes = {}
    for name in names:
        df = REGISTRY[name][0](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        shapes[name] = count_nodes(plan)
    return shapes


def main() -> int:
    from bench import HEADLINE

    record = "--record" in sys.argv
    shapes = collect(HEADLINE)
    if record:
        GUARD_FILE.write_text(json.dumps(shapes, indent=2, sort_keys=True) + "\n")
        print(f"recorded {len(shapes)} plan shapes -> {GUARD_FILE}")
        return 0
    want = json.loads(GUARD_FILE.read_text())
    drift = {
        n: {"want": want.get(n), "got": shapes.get(n)}
        for n in set(want) | set(shapes)
        if want.get(n) != shapes.get(n)
    }
    if drift:
        print("PLAN DRIFT:\n" + json.dumps(drift, indent=2, sort_keys=True))
        return 1
    print(f"all {len(shapes)} headline plan shapes match PLAN_GUARD.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
