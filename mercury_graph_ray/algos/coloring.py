"""Greedy graph coloring — Jones-Plassmann on the BSP engine.

Not in the reference (beyond-ref, SURVEY.md §2.11). Proper vertex
coloring of the simple undirected graph under the deterministic priority
permutation of algos/mis.py (``lcg_priority`` over dense vids, which SQL
reproduces as ``row_number() OVER (ORDER BY id) - 1``): a vertex colors
itself once ALL its higher-priority neighbors are colored, taking the
smallest color unused by them (mex). The final coloring is
schedule-independent — each color is a well-founded recursion over the
priority DAG — so the DuckDB oracle just unrolls rounds to the fixpoint
and the driver query (``coloring_heavy_parts``) matches exactly.

Scale shape: one superstep per wave on the persistent partition actors.
Each edge carries exactly ONE message over the whole run — the source's
color, sent the round after it colors, only toward lower-priority
neighbors — so total traffic is O(E) regardless of round count, and a
round's scatter cost is proportional to the newly-colored vertices'
out-degrees (delta-indexed via indptr, no full-edge scan). Rounds equal
the longest decreasing-priority path, O(log n) w.h.p. for dispersed
priorities. Known cost ceiling: the receiver keeps its received
(row, color) pool flat and rescans it per round to serve newly-ready
rows (O(E_p) per round); bucketing the pool by row would remove the
rescan if round counts ever grow.
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import DEFAULT_N_PARTS
from mercury_graph_ray.algos.kcore import simple_gas
from mercury_graph_ray.algos.mis import lcg_priority
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram


def _mex_per_segment(rows: np.ndarray, colors: np.ndarray) -> tuple:
    """For (row, color) pairs: per distinct row, the smallest color NOT
    present. Vectorized: lexsort, dedupe, then compare each segment's
    sorted unique colors against 0,1,2,... — the first mismatch is the
    mex; all-match means mex = segment length."""
    order = np.lexsort((colors, rows))
    r, c = rows[order], colors[order]
    keep = np.ones(len(r), bool)
    keep[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    r, c = r[keep], c[keep]
    seg = np.flatnonzero(np.concatenate([[True], r[1:] != r[:-1]]))
    seg_rows = r[seg]
    pos = np.arange(len(r)) - np.repeat(seg, np.diff(np.append(seg, len(r))))
    mismatch = c != pos
    mex = np.diff(np.append(seg, len(r))).astype(np.int64)  # default: run len
    # first mismatch index within each segment, if any
    mm = np.flatnonzero(mismatch)
    if len(mm):
        seg_of_mm = np.searchsorted(seg, mm, side="right") - 1
        first = np.full(len(seg), -1, np.int64)
        # reversed scatter keeps the FIRST mismatch per segment
        first[seg_of_mm[::-1]] = mm[::-1]
        has = first >= 0
        mex[has] = (first - seg)[has]
    return seg_rows, mex


class _JpProgram(VertexProgram):
    state_columns = ("color",)

    def init(self, csr, cache) -> dict:
        vids = np.arange(csr.part, csr.n_vertices, csr.n_parts, dtype=np.int64)
        prio = lcg_priority(vids)
        # wait = # higher-priority neighbors, computable locally: the
        # symmetric CSR's out-list IS the neighbor list, and priority is
        # a pure function of the globally-known dst vid
        dprio = lcg_priority(csr.dst.astype(np.int64))
        higher = dprio > prio[csr.row_of_edge]
        wait = np.bincount(
            csr.row_of_edge, weights=higher, minlength=csr.n_local
        ).astype(np.int64)
        color = np.full(csr.n_local, -1, np.int64)
        newly = wait == 0
        color[newly] = 0  # no higher-priority neighbors -> mex of {} = 0
        return {
            "color": color,
            "prio": prio,
            "wait": wait,
            "newly": newly,
            "pool_rows": [],
            "pool_colors": [],
        }

    def scatter(self, csr, state, cache) -> list:
        p = csr.n_parts
        e = np.array([], np.int64)
        rows = np.flatnonzero(state["newly"])
        if csr.n_edges == 0 or rows.size == 0:
            return [(e, e) for _ in range(p)]
        starts, ends = csr.indptr[rows], csr.indptr[rows + 1]
        cnt = ends - starts
        total = int(cnt.sum())
        if total == 0:
            return [(e, e) for _ in range(p)]
        # delta-indexed out-edges of the newly colored rows only
        off = np.repeat(starts - np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        eids = off + np.arange(total)
        dvid = csr.dst[eids].astype(np.int64)
        srow = csr.row_of_edge[eids]
        lower = lcg_priority(dvid) < state["prio"][srow]
        dvid, srow = dvid[lower], srow[lower]
        q_of = dvid % p
        dloc = dvid // p
        col = state["color"][srow]
        order = np.argsort(q_of, kind="stable")
        q_of, dloc, col = q_of[order], dloc[order], col[order]
        bounds = np.searchsorted(q_of, np.arange(p + 1))
        return [
            (dloc[a:b], col[a:b]) for a, b in zip(bounds[:-1], bounds[1:])
        ]

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        color, wait = state["color"], state["wait"]
        rows = [pl[0] for pl in payloads if len(pl[0])]
        if rows:
            rr = np.concatenate(rows)
            cc = np.concatenate([pl[1] for pl in payloads if len(pl[0])])
            wait -= np.bincount(rr, minlength=len(wait)).astype(np.int64)
            state["pool_rows"].append(rr)
            state["pool_colors"].append(cc)
        ready = (wait == 0) & (color < 0)
        n_ready = int(ready.sum())
        if n_ready:
            pr = (
                np.concatenate(state["pool_rows"])
                if state["pool_rows"]
                else np.array([], np.int64)
            )
            pc_ = (
                np.concatenate(state["pool_colors"])
                if state["pool_colors"]
                else np.array([], np.int64)
            )
            m = ready[pr]
            seg_rows, mex = _mex_per_segment(pr[m], pc_[m])
            newc = np.zeros(len(color), np.int64)  # ready w/o pool entries: 0
            newc[seg_rows] = mex
            color[ready] = newc[ready]
        state["newly"] = ready
        return {
            "n_colored": n_ready,
            "n_uncolored": int((color < 0).sum()),
        }


class GreedyColoring(BaseClass):
    """``GreedyColoring().fit(g)`` sets ``colors_`` (Dataset of id, color),
    ``n_colors_`` and ``n_iter_`` (waves run). Proper coloring of the
    simple undirected graph; deterministic across any layout/parallelism."""

    def __init__(
        self,
        n_parts: int | None = None,
        max_iter: int = 500,
        workdir: str | None = None,
        actor_num_cpus: float | None = None,
    ):
        self.n_parts = n_parts
        self.max_iter = max_iter
        self.workdir = workdir
        self.actor_num_cpus = actor_num_cpus

    def fit(self, g) -> "GreedyColoring":
        n_parts = self.n_parts or DEFAULT_N_PARTS
        gas = simple_gas(g, n_parts, workdir=self.workdir)
        vd = g._cache["vertex_dict"]
        engine = BspEngine(gas, _JpProgram(), actor_num_cpus=self.actor_num_cpus)
        it = 0
        for it in range(1, self.max_iter + 1):
            metrics = engine.superstep()
            if sum(m["n_uncolored"] for m in metrics) == 0:
                break
        else:
            engine.shutdown()
            raise RuntimeError(f"coloring did not settle in {self.max_iter} waves")
        self.n_iter_ = it
        state = engine.state_dataset().select_columns(["id", "color"])
        engine.shutdown()
        self.colors_ = vd.decode(state)
        self.n_colors_ = (
            int(self.colors_.max("color")) + 1 if self.colors_.count() else 0
        )
        return self
