"""Hardware scaling ceiling probe (no Ray).

Runs an identical numpy kernel in N concurrent processes and reports the
per-task slowdown vs a single process — the machine's achievable
parallel-efficiency ceiling for any CPU-bound engine work. This sandbox
reports 32 cores / 1 thread-per-core (lscpu), but it is a VM on shared
hardware: per-task time grows ~1.5-1.8x from 8 to 32 concurrent workers
even for embarrassingly parallel numpy (shared memory bandwidth + CPU
steal), capping ANY 8-vs-32 efficiency at ~0.6-0.75. The BENCH scaling
pair is therefore taskset-pinned 2 vs 8 cores (N vs 4N inside the
bandwidth budget) — on a real cluster, 4x the NODES multiplies memory
bandwidth and cores together, which a single box cannot emulate past
its socket.

Usage: python tools/cpu_ceiling.py  → one JSON line.
"""

import json
import multiprocessing as mp
import time

import numpy as np


def work_stream(_):
    """Memory-streaming kernel (the GAS gather shape)."""
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 500_000, 2_000_000)
    w = rng.random(2_000_000)
    t0 = time.perf_counter()
    for _ in range(10):
        np.bincount(idx, weights=w, minlength=500_000)
    return time.perf_counter() - t0


def work_cache(_):
    """Cache-resident kernel."""
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 50_000, 200_000)
    w = rng.random(200_000)
    t0 = time.perf_counter()
    for _ in range(100):
        np.bincount(idx, weights=w, minlength=50_000)
    return time.perf_counter() - t0


def measure(fn, nproc):
    with mp.Pool(nproc) as pool:
        pool.map(fn, range(nproc))  # warm the pool
        times = pool.map(fn, range(nproc))
    return float(np.mean(times))


if __name__ == "__main__":
    out = {}
    for name, fn in (("stream", work_stream), ("cache", work_cache)):
        base = measure(fn, 1)
        for n in (2, 8, 32):
            t = measure(fn, n)
            out[f"{name}_pertask_x{n}_vs_x1"] = round(t / base, 3)
            out[f"{name}_effective_cores_at_{n}"] = round(n * base / t, 1)
    print(json.dumps(out))
