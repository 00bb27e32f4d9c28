"""Registry-rotation staleness policy (codified round 8).

The driver records correctness for the FIRST 50 registry entries each
round; with a >100-entry registry the full-coverage cycle is two
windows plus overflow, so the policy is: no entry's latest driver
evidence may ever be more than TWO rounds old. This test derives
per-entry evidence from the CORRECTNESS_r*.json files committed at the
repo root and enforces, timing-robustly:

- HARD CAP (always): every entry that has evidence must have it from
  round >= max_round - 2. Breaching this means a rotation was skipped
  — the test fails until the stale entries are moved into the window.
- ORDERING (only before the current window has been recorded): every
  entry with NO evidence, and every entry whose evidence is exactly
  max_round - 2 (it would breach the cap at the next recording), must
  sit inside the first 50 positions.

The ordering check is suppressed in the post-record / pre-rotation gap
(detected as: the latest CORRECTNESS file's keys == the current first
50), because in that state the max_round-2 cohort is by design the set
QUEUED to lead the next round's rotation, not a violation. The hard
cap still fails the NEXT round's run if that rotation never happens.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from retrieval_augmented_generation_rag_data_pipeline_spark.plans.queries import (  # noqa: E402
    REGISTRY,
)

WINDOW = 50


def _evidence() -> tuple[dict[str, int], int, list[str]]:
    """(latest green round per query, max recorded round, latest file's
    window keys in order). Entries recorded with a non-null err don't
    count as evidence."""
    ev: dict[str, int] = {}
    max_round = 0
    latest_keys: list[str] = []
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.loads(path.read_text())
        for name, rec in data.items():
            if isinstance(rec, dict) and rec.get("err") is not None:
                continue
            ev[name] = max(ev.get(name, 0), rnd)
        if rnd > max_round:
            max_round = rnd
            latest_keys = list(data)
    return ev, max_round, latest_keys


def test_no_registry_entry_evidence_older_than_two_rounds():
    ev, max_round, _ = _evidence()
    assert max_round > 0, "no CORRECTNESS_r*.json files found"
    breaches = {
        name: ev[name]
        for name in REGISTRY
        if name in ev and ev[name] < max_round - 2
    }
    assert not breaches, (
        f"staleness cap breached (latest round r{max_round}, cap 2): "
        f"{breaches} — a rotation was skipped; move these into the "
        "first 50 positions (see the STALENESS POLICY note in "
        "plans/queries.py)"
    )


def test_stale_and_new_entries_lead_the_window():
    ev, max_round, latest_keys = _evidence()
    window = list(REGISTRY)[:WINDOW]
    if set(latest_keys) == set(window):
        # post-record, pre-rotation gap: the current ordering has
        # already been recorded; the max_round-2 cohort is the queued
        # NEXT rotation, enforced by the hard-cap test above.
        return
    must_refresh = [
        name
        for name in REGISTRY
        if name not in ev or ev[name] <= max_round - 2
    ]
    assert len(must_refresh) <= WINDOW, (
        f"{len(must_refresh)} entries need refreshing but the window "
        f"holds {WINDOW} — registry grew faster than the rotation "
        "slack; stop adding queries until the backlog drains"
    )
    outside = [n for n in must_refresh if n not in window]
    assert not outside, (
        f"entries that must be refreshed this round (no evidence, or "
        f"evidence from r{max_round - 2} with latest r{max_round}) sit "
        f"outside the first {WINDOW} registry positions: {outside}"
    )


def test_window_has_no_duplicates_and_priority_names_resolve():
    from retrieval_augmented_generation_rag_data_pipeline_spark.plans.queries import (
        _PRIORITY_QUERIES,
    )

    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= WINDOW
    # every priority entry must name a real registry query, appear only
    # once, and actually occupy its intended leading position —
    # asserted here directly, not just as an import-time side effect of
    # _reorder_registry's unknown-name raise
    assert len(_PRIORITY_QUERIES) == len(set(_PRIORITY_QUERIES))
    missing = [n for n in _PRIORITY_QUERIES if n not in REGISTRY]
    assert not missing, f"priority entries not in REGISTRY: {missing}"
    assert names[: len(_PRIORITY_QUERIES)] == list(_PRIORITY_QUERIES)


def test_registry_size_within_rotation_budget():
    """Round-10 verdict item 4: the <=2-round staleness cap means every
    entry must re-enter the 50-slot window at least once per THREE
    recordings, so the registry can never sustainably exceed
    3 x WINDOW = 150 entries. Assert it (was a prose warning), so a
    future round cannot silently make the staleness invariant
    unsatisfiable — by the time the ordering test starts failing, the
    backlog is already multiple rounds deep."""
    assert len(REGISTRY) <= 3 * WINDOW, (
        f"registry has {len(REGISTRY)} entries; the {WINDOW}-slot "
        f"window under the 2-round staleness cap supports at most "
        f"{3 * WINDOW} — remove or consolidate queries before adding "
        "more"
    )
