"""Deterministic synthetic power-law edge tables (bench/scaling input).

The north-rule scaling measurement needs a link graph big enough that
per-superstep kernels dominate the fixed per-round overhead (the
10^7-10^8 edges regime) — far larger than the extractor-derived test
graphs. This generator produces a Common-Crawl-*shaped* edge table
(integer vertex ids standing in for urls, power-law-ish degree skew on
both endpoints, small integer weights standing in for repeated hrefs)
fully deterministically (Philox keyed on (seed, shard)), sharded across
Ray tasks, cached as parquet so every scaling level reads the identical
input.

Skew model: endpoint id = floor(V * u^a) with a > 1, i.e.
P(id <= x) ∝ (x/V)^(1/a) — density ∝ x^(1/a - 1), a heavy low-id head
(hubs) with a long tail, the qualitative shape of web-graph in/out
degrees. No external data; no attempt at Common-Crawl fidelity beyond
shape (BASELINE.json input_hint governs the *pages* table; this is the
derived edge table at bench scale).
"""

from __future__ import annotations

import os

import numpy as np

_MARKER = "_COMPLETE"


def powerlaw_edges_parquet(
    n_edges: int,
    n_vertices: int,
    *,
    seed: int = 7,
    skew: float = 2.2,
    n_shards: int = 32,
    root: str = "/tmp/mgr_synth_graph",
) -> str:
    """Generate (or reuse) a cached edge table; returns its directory.

    Schema: src:int64, dst:int64, weight:float64. Deterministic for a
    given (n_edges, n_vertices, seed, skew, n_shards).
    """
    import ray

    path = os.path.join(root, f"E{n_edges}_V{n_vertices}_s{seed}_a{skew}_h{n_shards}")
    marker = os.path.join(path, _MARKER)
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)

    per = n_edges // n_shards
    sizes = [per + (1 if i < n_edges - per * n_shards else 0) for i in range(n_shards)]

    @ray.remote(num_cpus=1)
    def _gen(shard: int, count: int) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.Generator(np.random.Philox(key=[seed, shard]))
        u = rng.random(count)
        v = rng.random(count)
        src = np.minimum(np.floor(n_vertices * u**skew), n_vertices - 1).astype(np.int64)
        dst = np.minimum(np.floor(n_vertices * v**skew), n_vertices - 1).astype(np.int64)
        w = rng.integers(1, 4, size=count).astype(np.float64)
        t = pa.table({"src": pa.array(src), "dst": pa.array(dst), "weight": pa.array(w)})
        pq.write_table(t, os.path.join(path, f"shard_{shard:04d}.parquet"))
        return count

    total = sum(ray.get([_gen.remote(i, s) for i, s in enumerate(sizes)]))
    with open(marker, "w") as f:
        f.write(str(total))
    return path
