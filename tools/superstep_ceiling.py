"""Pinned 2-vs-8-core ceiling probe at the scaling-run working-set shape.

Runs the pure per-partition superstep kernel (a 4M-vertex ``bincount``
gather over 4M edges, P=8 concurrent tasks, barrier on the slowest — the
exact shape of one BSP superstep at GRAFT_SCALE_EDGES=32M) on taskset-
pinned 2-core and 8-core sets, no Ray. The reported
``machine_ceiling_2_to_8`` is the best efficiency ANY engine could show
from 2 to 8 cores on this box at this working-set size: beyond it the
shared DRAM bandwidth, not software, is the limit. Compare
``bench.py --scaling``'s pagerank efficiency against this number, not
against 1.0.

Usage: python tools/superstep_ceiling.py  -> one JSON line.
"""

import json
import multiprocessing as mp
import os
import time

import numpy as np

N_VERTS = 4_000_000
N_EDGES_PER_PART = 4_000_000
P = 8


_barrier = None


def _init(b):
    global _barrier
    _barrier = b


def _kernel(_):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, N_VERTS, N_EDGES_PER_PART)
    w = rng.random(N_EDGES_PER_PART)
    # all P tasks start their timed window together — the BSP barrier
    # means all partitions compute simultaneously, so an unsynchronized
    # probe understates contention (staggered Pool starts let timed
    # windows dodge each other at oversubscribed levels)
    _barrier.wait()
    t0 = time.perf_counter()
    for _ in range(5):
        np.bincount(idx, weights=w, minlength=N_VERTS)
    return (time.perf_counter() - t0) / 5


def run_level(cores: int) -> float:
    os.sched_setaffinity(0, set(range(cores)))
    b = mp.Barrier(P)
    try:
        with mp.Pool(P, initializer=_init, initargs=(b,)) as pool:
            ts = pool.map(_kernel, range(P))
    finally:
        os.sched_setaffinity(0, set(range(os.cpu_count() or 32)))
    return max(ts)  # the superstep barrier waits for the slowest partition


if __name__ == "__main__":
    # interleave two repeats per level, keep the best (steal robustness)
    t8 = min(run_level(8), run_level(8))
    t2 = min(run_level(2), run_level(2))
    print(
        json.dumps(
            {
                "t2_per_round_sec": round(t2, 4),
                "t8_per_round_sec": round(t8, 4),
                "machine_ceiling_2_to_8": round(t2 / t8 / 4.0, 3),
            }
        )
    )
