"""Multi-source BFS hop distances on the BSP engine.

Beyond the reference's surface (its closeness centrality collects the
graph to networkx, mercury/graph/core/graph.py:656-671 — explicitly
small-graph): this is the scale path for hop-distance / landmark
(approximate closeness) queries over the partitioned CSR. One state
column per source; a superstep is the CC min-propagation kernel on
``dist + 1`` — per-destination minima pre-combined with ``reduceat``
inside the owning actor (the hub-splitting partial), receivers fold P
partial minima, the driver moves changed-counts only. Converges in
O(diameter) supersteps.

Closeness from k landmarks: ``1 / mean(hops to landmarks)`` — the
standard approximation; exact closeness stays the reference's
small-graph networkx op (``Graph.closeness_centrality``).
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram, dest_partition_slices

_INF = np.int64(1) << np.int64(60)


class _BfsProgram(VertexProgram):
    """``weighted=False``: hop counts (int64, Bellman-Ford on dist+1).
    ``weighted=True``: non-negative-weight SSSP (float64, dist+w) — the
    same monotone min-propagation, O(longest shortest path in hops)
    supersteps."""

    def __init__(self, source_vids: np.ndarray, weighted: bool = False):
        self.sources = np.asarray(source_vids, np.int64)
        self.k = len(self.sources)
        self.weighted = weighted
        self.dtype = np.float64 if weighted else np.int64
        self.inf = np.float64("inf") if weighted else _INF
        self.state_columns = tuple(f"d{i}" for i in range(self.k))

    def prepare(self, csr):
        # dst-major static layout: sequential reduceat, contiguous slices
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
        state = {}
        for i in range(self.k):
            d = np.full(csr.n_local, self.inf, self.dtype)
            if self.sources[i] % csr.n_parts == csr.part:
                d[self.sources[i] // csr.n_parts] = 0
            state[f"d{i}"] = d
        return state

    def scatter(self, csr, state, cache) -> list:
        bounds, local = cache
        p = csr.n_parts
        if csr.n_edges == 0:
            empty = np.empty((self.k, 0), self.dtype)
            return [empty for _ in range(p)]
        # (k, n_uniq_dst) per-destination minima of dist+step, one reduceat
        # per source; step = 1 (hops) or the edge weight (SSSP)
        step = csr.weight_by_dst if self.weighted else 1
        mins = np.empty((self.k, len(csr.uniq_dst)), self.dtype)
        for i in range(self.k):
            cand = state[f"d{i}"][csr.row_by_dst] + step
            mins[i] = np.minimum.reduceat(cand, csr.dst_seg_starts)
        return [mins[:, a:b] for a, b in bounds]

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        inc = np.concatenate(payloads, axis=1)  # (k, total_msgs)
        changed = 0
        if inc.shape[1]:
            ul = recv["uniq_local"]
            for i in range(self.k):
                mins = np.minimum.reduceat(inc[i][recv["order"]], recv["starts"])
                d = state[f"d{i}"]
                new = np.minimum(d[ul], mins)
                changed += int((new != d[ul]).sum())
                d[ul] = new
        return {"n_changed": changed}


class BfsDistances(BaseClass):
    """``BfsDistances(sources=[...]).fit(g)`` sets ``distances_``: a
    Dataset of (id, hops_<source>...) with -1 for unreachable vertices,
    plus three landmark centralities derived from it:

    - ``closeness_``: (id, closeness = n_reached / sum(dist over reached
      landmarks); 0.0 when no landmark is at positive distance);
    - ``harmonic_``: (id, harmonic = sum of 1/dist over landmarks at
      positive distance — nx.harmonic_centrality ``sources=`` semantics);
    - ``ecc_``: (id, ecc_lb = max dist to any reached landmark, -1 when
      none reachable — the lower bound whose max is the pseudo-diameter).
    """

    def __init__(self, sources: list, *, undirected: bool = True,
                 weighted: bool = False, max_iter: int = 200,
                 n_parts: int | None = None, workdir: str | None = None):
        self.sources = list(sources)
        self.undirected = undirected
        self.weighted = weighted  # True: non-negative-weight SSSP (cost_<s> float64)
        self.max_iter = max_iter
        self.n_parts = n_parts
        self.workdir = workdir

    def fit(self, g) -> "BfsDistances":
        import pyarrow as pa

        from mercury_graph_ray.stages.util import ensure_schema

        vd, gas = prepare(
            g, symmetrize=self.undirected, n_parts=self.n_parts, workdir=self.workdir
        )
        # source keys -> vids via the distributed mapping (tiny filter)
        from mercury_graph_ray.algos.common import keys_to_vids

        skeys = [str(s) for s in self.sources]
        vids = keys_to_vids(vd, skeys)

        engine = BspEngine(gas, _BfsProgram(vids, weighted=self.weighted))
        it = 0
        for it in range(1, self.max_iter + 1):
            metrics = engine.superstep()
            if sum(mm["n_changed"] for mm in metrics) == 0:
                break
        else:
            raise RuntimeError(f"BFS did not converge in {self.max_iter} supersteps")
        self.n_iter_ = it

        state = engine.state_dataset()
        engine.shutdown()

        weighted = self.weighted
        prefix = "cost" if weighted else "hops"

        def _final(t: pa.Table) -> pa.Table:
            cols = {"id": t["id"]}
            for i, s in enumerate(skeys):
                d = t[f"d{i}"].combine_chunks().to_numpy(zero_copy_only=False)
                if weighted:
                    cols[f"cost_{s}"] = pa.array(
                        np.where(np.isinf(d), np.float64(-1.0), d), pa.float64()
                    )
                else:
                    cols[f"hops_{s}"] = pa.array(
                        np.where(d >= _INF, np.int64(-1), d)
                    ).cast(pa.int64())
            return pa.table(cols)

        out = state.map_batches(_final, batch_format="pyarrow")
        vtype = pa.float64() if weighted else pa.int64()
        out = ensure_schema(
            out,
            {"id": pa.uint64(), **{f"{prefix}_{s}": vtype for s in skeys}},
        )
        self.distances_ = vd.decode(out, col="id")

        # landmark closeness (the documented fitted attribute): per vertex,
        # n_reached / sum(dist over reached landmarks); 0.0 when no landmark
        # is at positive distance (isolated vertices, k=1 self row) — the
        # scale-path approximation of the reference's exact closeness
        # (mercury/graph/core/graph.py:656-671, small-graph networkx op)
        dist_cols = [f"{prefix}_{s}" for s in skeys]

        def _closeness(t: pa.Table) -> pa.Table:
            m = np.stack(
                [
                    t[c].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
                    for c in dist_cols
                ]
            )
            reached = m >= 0
            n_reached = reached.sum(axis=0)
            sum_d = np.where(reached, m, 0.0).sum(axis=0)
            with np.errstate(divide="ignore", invalid="ignore"):
                c = np.where(sum_d > 0, n_reached / sum_d, 0.0)
            return pa.table({"id": t["id"], "closeness": pa.array(c, pa.float64())})

        self.closeness_ = self.distances_.map_batches(_closeness, batch_format="pyarrow")

        # harmonic centrality restricted to the landmark set: sum of 1/d
        # over landmarks at positive distance (nx.harmonic_centrality
        # sources= semantics — self distance 0 and unreachable landmarks
        # contribute nothing). Landmark-order summation matches the SQL
        # oracle's left-to-right addition bit-for-bit.
        def _harmonic(t: pa.Table) -> pa.Table:
            h = np.zeros(t.num_rows, np.float64)
            for c in dist_cols:
                d = t[c].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
                h = h + np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
            return pa.table({"id": t["id"], "harmonic": pa.array(h, pa.float64())})

        self.harmonic_ = self.distances_.map_batches(_harmonic, batch_format="pyarrow")

        # landmark eccentricity LOWER BOUND: max distance to any reached
        # landmark (-1 when no landmark is reachable). True eccentricity
        # needs all-pairs; max-over-landmarks is the standard lower bound
        # whose max over vertices is the pseudo-diameter.
        def _ecc(t: pa.Table) -> pa.Table:
            m = np.stack(
                [
                    t[c].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
                    for c in dist_cols
                ]
            )
            e = m.max(axis=0)  # unreachable is already -1 in every column
            arr = pa.array(e, pa.float64()) if weighted else pa.array(e.astype(np.int64))
            return pa.table({"id": t["id"], "ecc_lb": arr})

        self.ecc_ = self.distances_.map_batches(_ecc, batch_format="pyarrow")
        return self
