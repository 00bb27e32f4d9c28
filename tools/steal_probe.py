"""CPU-steal probe (round 16): the box's bench noise turned out to be
HYPERVISOR STEAL, invisible to loadavg — identical-HEAD bench runs read
54.2 s and 76.4 s minutes apart while loadavg_start was ~0 both times;
a full-core spin measured 13.6% steal during the slow window. Run this
BEFORE trusting any bench reading: steal% under load is the arbiter of
run quality, not loadavg.

Usage: python tools/steal_probe.py [seconds]
Prints one JSON line: {"steal_pct": ..., "user_pct": ..., "secs": ...}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _read() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def _spin(secs: float) -> None:
    t = time.time()
    while time.time() - t < secs:
        pass


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    n = os.cpu_count() or 8
    a = _read()
    with mp.Pool(n) as p:
        p.starmap(_spin, [(secs,)] * n)
    b = _read()
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    print(
        json.dumps(
            {
                "steal_pct": round(100 * d[7] / tot, 1),
                "user_pct": round(100 * d[0] / tot, 1),
                "idle_pct": round(100 * d[3] / tot, 1),
                "secs": secs,
                "cpus": n,
            }
        )
    )


if __name__ == "__main__":
    main()
