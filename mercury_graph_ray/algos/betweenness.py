"""Landmark betweenness centrality — level-synchronous Brandes on the BSP engine.

The reference's ``betweenness_centrality`` is a small-graph networkx call
(mercury/graph/core/graph.py:673-679, same family as its closeness); this
is the scale path (beyond-ref, SURVEY.md §2.11), exactly like
``algos/bfs.py`` is for closeness: run Brandes' dependency accumulation
from a FIXED landmark set and report the partial betweenness
``bc(v) = Σ_s δ_s(v)`` (unnormalized; with sources = all vertices this is
exactly 2× networkx's unnormalized undirected betweenness, each unordered
pair counted from both endpoints — asserted in tests).

Per source s, Brandes (level-synchronous BFS — all landmarks advance in
lockstep, one shared level counter):

- **forward**: frontier vertices at distance t ship their path counts
  σ; an unvisited receiver at distance t+1 sets σ = Σ incoming (its
  shortest-path count). One dst-major ``add.reduceat`` per source per
  superstep; payloads are (k_sources × slice) float64 partials.
- **backward**: levels descend from the deepest; a vertex w at level L
  ships ``(1 + δ_w) / σ_w`` and a receiver v accepts only if
  ``d_v == L-1`` (its predecessors relation), folding
  ``δ_v += σ_v · Σ incoming``. The level-L filter is receiver-side —
  senders are all at level L, so one mask suffices.

The graph is the SIMPLE undirected graph via ``algos.kcore.simple_gas``
(duplicate edges would double-count σ; self-loops never lie on shortest
paths). **A directed Graph is deliberately treated as undirected** —
edge direction is discarded by the symmetrized simple graph, exactly
like closeness/harmonic (``algos/bfs.py``) and unlike SCC (which raises
on an undirected input because direction is its whole point). Callers
needing directed betweenness must symmetrize intent explicitly.
σ is integer-valued in float64 — exact below 2^53 paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import DEFAULT_N_PARTS, simple_pairs
from mercury_graph_ray.algos.kcore import simple_gas
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram, dest_partition_slices

_UNSEEN = np.int64(-1)


class _BrandesProgram(VertexProgram):
    def __init__(self, source_vids: np.ndarray):
        self.sources = np.asarray(source_vids, np.int64)
        self.k = len(self.sources)
        self.state_columns = tuple(
            f"{c}{i}" for i in range(self.k) for c in ("d", "sigma", "delta")
        )

    def prepare(self, csr):
        return dest_partition_slices(csr)

    def scatter_meta(self, csr, cache):
        return cache[1]

    def prepare_recv(self, csr, cache, metas):
        li = np.concatenate(metas) if metas else np.array([], np.int64)
        li = li.astype(np.int64, copy=False)
        order = np.argsort(li, kind="stable")
        ls = li[order]
        starts = np.flatnonzero(np.concatenate([[True], ls[1:] != ls[:-1]])) if len(ls) else ls
        uniq_local = ls[starts] if len(ls) else ls
        return {"order": order, "starts": starts, "uniq_local": uniq_local}

    def init(self, csr, cache) -> dict:
        state = {"_mode": "fwd", "_level": 0}
        for i in range(self.k):
            d = np.full(csr.n_local, _UNSEEN, np.int64)
            sig = np.zeros(csr.n_local, np.float64)
            if self.sources[i] % csr.n_parts == csr.part:
                row = self.sources[i] // csr.n_parts
                d[row] = 0
                sig[row] = 1.0
            state[f"d{i}"] = d
            state[f"sigma{i}"] = sig
            state[f"delta{i}"] = np.zeros(csr.n_local, np.float64)
        return state

    def _ship(self, csr, cache, vals):
        bounds, local = cache
        return [vals[:, a:b] for a, b in bounds]

    def scatter(self, csr, state, cache) -> list:
        p = csr.n_parts
        t = state["_level"]
        if csr.n_edges == 0:
            empty = np.empty((self.k, 0), np.float64)
            return [empty for _ in range(p)]
        row = csr.row_by_dst
        out = np.empty((self.k, len(csr.uniq_dst)), np.float64)
        if state["_mode"] == "fwd":
            # frontier (d == t) ships sigma
            for i in range(self.k):
                vals = np.where(state[f"d{i}"][row] == t, state[f"sigma{i}"][row], 0.0)
                out[i] = np.add.reduceat(vals, csr.dst_seg_starts)
        else:
            # level-L senders ship (1 + delta) / sigma
            for i in range(self.k):
                d, sig, dl = state[f"d{i}"], state[f"sigma{i}"], state[f"delta{i}"]
                mask = d[row] == t
                contrib = np.where(
                    mask, (1.0 + dl[row]) / np.where(sig[row] > 0, sig[row], 1.0), 0.0
                )
                out[i] = np.add.reduceat(contrib, csr.dst_seg_starts)
        return self._ship(csr, cache, out)

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        t = state["_level"]
        inc = (
            np.concatenate(payloads, axis=1)
            if payloads
            else np.empty((self.k, 0), np.float64)
        )
        n_new = 0
        if state["_mode"] == "fwd":
            if inc.shape[1]:
                ul = recv["uniq_local"]
                for i in range(self.k):
                    sums = np.add.reduceat(inc[i][recv["order"]], recv["starts"])
                    d = state[f"d{i}"]
                    fresh = (d[ul] == _UNSEEN) & (sums > 0)
                    rows = ul[fresh]
                    d[rows] = t + 1
                    state[f"sigma{i}"][rows] = sums[fresh]
                    n_new += int(fresh.sum())
            state["_level"] = t + 1
            return {"n_new": n_new}
        if inc.shape[1]:
            ul = recv["uniq_local"]
            for i in range(self.k):
                sums = np.add.reduceat(inc[i][recv["order"]], recv["starts"])
                d = state[f"d{i}"]
                # predecessors only: receivers one level above the senders
                acc = (d[ul] == t - 1) & (sums > 0)
                rows = ul[acc]
                state[f"delta{i}"][rows] += state[f"sigma{i}"][rows] * sums[acc]
        state["_level"] = t - 1
        return {"n_new": 0}


class BetweennessLandmarks(BaseClass):
    """``BetweennessLandmarks(sources=[...]).fit(g)`` sets
    ``betweenness_``: a Dataset of (id, betweenness = Σ_s δ_s(v), the
    source's own row contributing 0 for its own BFS — Brandes' v ≠ s
    rule), plus ``n_iter_`` (total supersteps) and ``depth_`` (deepest
    BFS level reached from any landmark)."""

    def __init__(
        self,
        sources: list,
        max_iter: int = 10_000,
        n_parts: int | None = None,
        workdir: str | None = None,
        actor_num_cpus: float | None = None,
    ):
        self.sources = list(sources)
        self.max_iter = max_iter
        self.n_parts = n_parts or DEFAULT_N_PARTS
        self.workdir = workdir
        self.actor_num_cpus = actor_num_cpus

    def fit(self, g) -> "BetweennessLandmarks":
        from mercury_graph_ray.algos.common import keys_to_vids
        from mercury_graph_ray.stages.util import ensure_schema

        vd, _, _ = simple_pairs(g)
        gas = simple_gas(g, self.n_parts, self.workdir)
        skeys = [str(s) for s in self.sources]
        vids = keys_to_vids(vd, skeys)
        program = _BrandesProgram(vids)
        engine = BspEngine(gas, program, actor_num_cpus=self.actor_num_cpus)

        it = 0
        depth = 0
        while it < self.max_iter:
            it += 1
            if sum(m["n_new"] for m in engine.superstep()) == 0:
                break
            depth += 1
        else:
            engine.shutdown()
            raise RuntimeError(f"forward BFS did not finish in {self.max_iter} supersteps")
        # descend from the deepest frontier; level 1 senders update the
        # sources' own delta rows, which the export masks out
        engine.broadcast_state(_mode="bwd", _level=depth)
        for _ in range(depth):
            it += 1
            engine.superstep()
        self.n_iter_ = it
        self.depth_ = depth

        state = engine.state_dataset()
        engine.shutdown()

        k = len(skeys)
        src_vids = np.asarray(vids, np.uint64)

        def _bc(t: pa.Table) -> pa.Table:
            ids = t["id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
            bc = np.zeros(len(ids), np.float64)
            for i in range(k):
                dl = t[f"delta{i}"].combine_chunks().to_numpy(zero_copy_only=False)
                bc = bc + np.where(ids == src_vids[i], 0.0, dl)
            return pa.table({"id": pa.array(ids), "betweenness": pa.array(bc, pa.float64())})

        out = ensure_schema(
            state.map_batches(_bc, batch_format="pyarrow"),
            {"id": pa.uint64(), "betweenness": pa.float64()},
        )
        self.betweenness_ = vd.decode(out, col="id")
        return self
