"""DAG longest-path levels (critical-path layering) on the BSP engine.

``level(v)`` = number of edges on the longest directed path ending at
``v`` — the layer assignment of topological scheduling / critical-path
analysis, and (per edge-orientation) the "height" used by dependency
planners. Beyond-ref operator (SURVEY.md §2.11 family): the reference
has no DAG utilities, but a link-graph engine meets DAGs constantly
(crawl frontiers by discovery date, id-oriented simple graphs,
dependency tables).

Semantics (pinned for the SQL oracle):

- input must be DIRECTED (``ValueError`` otherwise — the SCC guard);
- ``level`` starts at 0 everywhere; per superstep every edge (u, v)
  proposes ``level(u) + 1`` to ``v`` and ``v`` keeps the max;
- the fixpoint is the exact longest-path level on a DAG; on a cyclic
  input levels grow past ``n_vertices`` and fit() raises RuntimeError —
  the operator doubles as a distributed cycle detector.

Execution (stages/bsp.py): values only INCREASE and the fold is max, so
the scatter is sparse-by-construction — after round 1 a partition
re-sends only the out-edges of rows whose level changed last round
(per-route source-grouped edge plans, the ``KCore`` ragged-take
pattern), pre-combined per destination (sort + ``maximum.reduceat``).
Quiet regions of the DAG cost nothing; total traffic over a run is
O(sum of per-vertex level changes) = O(E) in the worst case, not
O(E x depth).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram


class _LongestPathProgram(VertexProgram):
    state_columns = ("level",)

    def prepare(self, csr):
        E = csr.n_edges
        U = len(csr.uniq_dst)
        seg_len = np.diff(np.append(csr.dst_seg_starts, E)).astype(np.int64)
        # per-edge destination LOCAL row at the owner, dst-major order
        per_edge_local = (csr.uniq_dst // np.uint64(csr.n_parts)).astype(np.int64)
        per_edge_local = np.repeat(per_edge_local, seg_len)
        us = csr.uniq_part_starts
        edge_bounds = []
        for q in range(csr.n_parts):
            a = int(csr.dst_seg_starts[us[q]]) if us[q] < U else E
            b = int(csr.dst_seg_starts[us[q + 1]]) if us[q + 1] < U else E
            edge_bounds.append((a, b))
        # per-route sender plan grouped by SOURCE local row: a delta
        # scatter touches only the changed rows' edges, O(changed edges)
        n_local = csr.n_local
        send = []
        for a, b in edge_bounds:
            rows = csr.row_by_dst[a:b]
            ordq = np.argsort(rows, kind="stable").astype(np.int64)
            cnt = np.bincount(rows, minlength=n_local).astype(np.int64)
            indptr = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int64)
            dloc = per_edge_local[a:b][ordq]  # dest local row, send order
            send.append((ordq, indptr, dloc))
        return {"send": send}

    def init(self, csr, cache) -> dict:
        return {"level": np.zeros(csr.n_local, np.int64)}

    def scatter(self, csr, state, cache) -> list:
        lev = state["level"]
        changed = state.get("_changed")  # None on round 1 -> ship everything
        rows = (
            np.arange(csr.n_local, dtype=np.int64)
            if changed is None
            else np.flatnonzero(changed)
        )
        out = []
        for ordq, indptr, dloc in cache["send"]:
            starts = indptr[rows]
            lens = indptr[rows + 1] - starts
            total = int(lens.sum())
            if total == 0:
                out.append((np.array([], np.int64), np.array([], np.int64)))
                continue
            # ragged take of the selected rows' edges (send order)
            base = np.repeat(np.cumsum(lens) - lens, lens)
            idx = np.repeat(starts, lens) + (np.arange(total) - base)
            d = dloc[idx]
            v = np.repeat(lev[rows] + 1, lens)
            # pre-combine per destination: one sorted reduceat max
            o = np.argsort(d, kind="stable")
            ds_, vs = d[o], v[o]
            seg = np.flatnonzero(np.concatenate([[True], ds_[1:] != ds_[:-1]]))
            out.append((ds_[seg], np.maximum.reduceat(vs, seg)))
        return out

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        old = state["level"]
        new = old.copy()
        for rows_p, vals_p in payloads:
            if len(rows_p):
                np.maximum.at(new, rows_p, vals_p)
        changed = new != old
        state["level"] = new
        state["_changed"] = changed
        return {
            "n_changed": int(changed.sum()),
            "max_level": int(new.max()) if len(new) else 0,
        }


class DagLongestPath(BaseClass):
    """``DagLongestPath().fit(g)`` sets ``levels_``: a Dataset of
    (id, level) in original key space — the longest-path layer of every
    vertex — plus ``n_iter_`` (supersteps) and ``depth_`` (max level).
    Directed graphs only; raises RuntimeError on cyclic input."""

    def __init__(
        self,
        max_iter: int | None = None,
        n_parts: int | None = None,
        workdir: str | None = None,
        actor_num_cpus: float | None = None,
    ):
        self.max_iter = max_iter
        self.n_parts = n_parts
        self.workdir = workdir
        self.actor_num_cpus = actor_num_cpus

    def fit(self, g) -> "DagLongestPath":
        from mercury_graph_ray.stages.util import ensure_schema

        if not g.directed:
            raise ValueError(
                "DagLongestPath needs a DIRECTED acyclic graph; an "
                "undirected graph with any edge is cyclic by definition"
            )
        vd, gas = prepare(g, symmetrize=False, n_parts=self.n_parts,
                          workdir=self.workdir, distinct=True)
        engine = BspEngine(
            gas,
            _LongestPathProgram(),
            actor_num_cpus=self.actor_num_cpus,
        )
        n = vd.n  # vertex count: any level >= n certifies a cycle
        limit = self.max_iter
        it = 0
        depth = 0
        try:
            while True:
                it += 1
                metrics = engine.superstep()
                n_changed = sum(m["n_changed"] for m in metrics)
                depth = max(m["max_level"] for m in metrics)
                if n_changed == 0:
                    break
                if (limit is not None and it >= limit) or (
                    n is not None and depth >= n
                ):
                    raise RuntimeError(
                        f"DagLongestPath did not converge after {it} "
                        f"supersteps (max level {depth}): the input has a "
                        "directed cycle or exceeds max_iter"
                    )
            self.n_iter_ = it
            self.depth_ = depth
            state = engine.state_dataset()
        finally:
            engine.shutdown()

        out = ensure_schema(
            state.select_columns(["id", "level"]),
            {"id": pa.uint64(), "level": pa.int64()},
        )
        self.levels_ = vd.decode(out, col="id")
        return self
