"""Gather-Apply-Scatter superstep engine on partitioned CSR blocks.

The iterative-algorithm core (SURVEY.md §7 step 3; north_star dataflow):

- **state** between supersteps is a materialized ``ray.data.Dataset`` of
  one row per vertex, always complete, with ``part = id % P`` — the
  checkpointable unit (state/checkpoint.py writes/reads exactly this).
- **scatter**: ``state.groupby("part").map_groups`` — each group is one
  source partition; the task zero-copy-reads its static CSR block from
  the object store, builds the dense local state vector (``id // P``),
  and emits pre-combined per-destination messages *plus* one self row per
  vertex carrying the old state (so every vertex exists downstream and
  convergence deltas never need a join).
- **gather+apply (fused)**: messages carry ``gpart = dst % P``;
  ``groupby("gpart").map_groups`` aggregates them into dense local
  vectors (bincount / reduceat — no per-vertex Python) and applies the
  vertex program, emitting the next state.

So one superstep is exactly two groupby shuffles — both keyed on the
vertex partition, both with P coarse groups, both fully vectorized inside.
Hub skew is structurally bounded: scatter pre-combines per (source
partition, destination), so a vertex with 10^9 in-edges receives at most
P partial rows, combined in the gather (the "split high-degree vertices
across partitions with a final combine" requirement).

Scatter/apply callbacks are plain functions over numpy dicts; algorithms
(algos/*) plug their semantics in without touching the shuffle plumbing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mercury_graph_ray.stages.csr import (
    CsrBlock,
    build_csr_blocks,
    local_ids,
    n_local_vertices,
)


class GasGraph:
    """Static partitioned adjacency + superstep plumbing for one graph."""

    def __init__(self, csr_refs: dict, n_vertices: int, n_parts: int):
        self.csr_refs = csr_refs
        self.n = n_vertices
        self.p = n_parts

    @classmethod
    def build(cls, edges_enc, n_vertices: int, n_parts: int, workdir: str) -> "GasGraph":
        refs = build_csr_blocks(edges_enc, n_vertices, n_parts, workdir)
        return cls(refs, n_vertices, n_parts)

    # ------------------------------------------------------------ plumbing
    def init_state(self, columns: dict):
        """Dense initial state: one row per vertex. ``columns`` maps column
        name -> callable(ids: uint64 array) -> np array (vectorized)."""
        import ray.data as rd

        n, p = self.n, self.p

        def _gen(batch: dict) -> dict:
            ids = batch["id"].astype(np.uint64)
            out = {"id": ids, "part": (ids % np.uint64(p)).astype(np.int64)}
            for name, fn in columns.items():
                out[name] = fn(ids)
            return out

        return (
            rd.range(n)
            .map_batches(_gen, batch_format="numpy", batch_size=1 << 20)
            .materialize()
        )

    def superstep(
        self, state, scatter_fn, gather_apply_fn, scatter_kwargs=None, state_schema=None
    ):
        """Run one superstep; returns the next (materialized) state Dataset.

        ``scatter_fn(csr: CsrBlock, group: dict[str, np.ndarray]) -> dict``
        must emit numpy columns including ``gpart`` (int64 dst partition).
        ``gather_apply_fn(part: int, n_local: int, ids: np.ndarray,
        group: dict) -> dict`` emits the next state columns for the
        partition (must include ``id`` and ``part``).

        ``state_schema`` (dict name -> pyarrow type): when given, the new
        state's blocks are normalized to it — Ray groupby emits
        schema-LESS empty blocks when reduce partitions outnumber groups,
        and those poison any later join/export.
        """
        from mercury_graph_ray.stages.util import ensure_schema

        refs = self.csr_refs
        n, p = self.n, self.p

        def _scatter(group: dict) -> dict:
            import ray

            part = int(group["part"][0])
            csr: CsrBlock = ray.get(refs[part])
            return scatter_fn(csr, group, **(scatter_kwargs or {}))

        def _gather(group: dict) -> dict:
            part = int(group["gpart"][0])
            n_local = n_local_vertices(n, part, p)
            ids = local_ids(n, part, p)
            return gather_apply_fn(part, n_local, ids, group)

        msgs = state.groupby("part").map_groups(_scatter, batch_format="numpy")
        new_state = msgs.groupby("gpart").map_groups(_gather, batch_format="numpy")
        if state_schema is not None:
            new_state = ensure_schema(new_state, state_schema)
        return new_state.materialize()


# ------------------------------------------------------- shared helpers
def dense_from_group(group: dict, col: str, n_local: int, n_parts: int) -> np.ndarray:
    """Scatter-group rows -> dense local vector (state is always complete)."""
    local = (group["id"] // np.uint64(n_parts)).astype(np.int64)
    out = np.empty(n_local, dtype=np.asarray(group[col]).dtype)
    out[local] = group[col]
    return out


def segment_min(keys: np.ndarray, values: np.ndarray):
    """(unique_keys, per-key min) — vectorized via sort + reduceat."""
    if len(keys) == 0:
        return keys, values
    order = np.argsort(keys, kind="stable")
    k, v = keys[order], values[order]
    starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    return k[starts], np.minimum.reduceat(v, starts)


def segment_sum_2key(k1: np.ndarray, k2: np.ndarray, w: np.ndarray):
    """Per-(k1,k2) sums, output sorted by (k1 asc, k2 asc) — lexsort+reduceat."""
    if len(k1) == 0:
        return k1, k2, w
    order = np.lexsort((k2, k1))
    a, b, v = k1[order], k2[order], w[order]
    new = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    starts = np.flatnonzero(new)
    return a[starts], b[starts], np.add.reduceat(v, starts)
