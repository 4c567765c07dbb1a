"""Pure-python weak-scaling calibration kernel (no Spark, no disk).

The sandbox host's multicore throughput oscillates ~2× on a
tens-of-minutes period (BENCH/BASELINE.md r3 forensics), so a scaling
pair is only meaningful if the HARDWARE scales cleanly at launch time.
This kernel measures that: 2 vs 8 processes, EQUAL work per process
(weak scaling — ideal wall ratio is 1.0), each leg pinned to the same
cpus the Spark legs use (local[2] → cpus 0-1, local[8] → cpus 0-7).

Protocol (CLAUDE.md): launch the design-point Spark pair only when this
prints efficiency ≥ 0.95; record readings before AND after both legs.
r2 measured 0.97 here; r3's degraded host measured 0.83–0.91.

Usage: python bench/calibrate.py [reps]   # prints one JSON line per rep
"""

import json
import multiprocessing as mp
import os
import sys
import time

KNL_N = 60_000_000  # iterations per process — frozen (r2/r3 comparable)


def kernel(args):
    aff, n = args
    os.sched_setaffinity(0, aff)
    h = 0
    for i in range(n):
        h = (h * 1315423911 + i) & 0xFFFFFFFFFFFF
    return h


def measure() -> dict:
    walls = {}
    for procs, aff in ((2, frozenset({0, 1})), (8, frozenset(range(8)))):
        with mp.Pool(procs) as pool:
            t0 = time.time()
            pool.map(kernel, [(aff, KNL_N)] * procs)
            walls[procs] = time.time() - t0
    return {
        "wall2_s": round(walls[2], 2),
        "wall8_s": round(walls[8], 2),
        "hw_efficiency": round(walls[2] / walls[8], 3),
    }


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    for _ in range(reps):
        print(json.dumps(measure()), flush=True)
