"""Katz centrality on the BSP engine — beyond-reference op (SURVEY §2.11).

Frozen semantics so a fixed-iteration DuckDB unroll verifies the run
exactly (the same contract pattern as pagerank_fixed20 / HITS):

- ``x_0 = 0``; per iteration ``x_{t+1}(v) = beta + alpha · Σ_{u→v} w_uv ·
  x_t(u)`` (incoming-edge sum — networkx katz_centrality's update);
- ``weighted=False`` uses binary adjacency (each distinct edge counts 1):
  duplicate (src, dst) rows are collapsed before the CSR build on BOTH
  the directed and undirected paths (``prepare(distinct=True)`` /
  ``undirected_edges``), so multigraph-ish edge tables match the
  DISTINCT-edge SQL oracle and nx parity. ``weighted=True`` keeps every
  row: duplicate directed rows contribute their weights additively;
- exactly ``max_iter`` iterations when ``tol=0``, else stop at L1
  residual < tol;
- ``normalized=True`` scales by 1/||x||_2 at the END (nx semantics),
  computed from per-batch partial sums of squares — a scalar reduce.

Execution is the PageRank exchange minus normalization: dst-major
``add.reduceat`` pre-combine per unique destination, static routes,
scalar-only driver traffic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram, dest_partition_slices


class _KatzProgram(VertexProgram):
    state_columns = ("x",)

    def __init__(self, alpha: float, beta: float, weighted: bool):
        self.alpha = alpha
        self.beta = beta
        self.weighted = weighted

    def prepare(self, csr):
        return dest_partition_slices(csr)

    def scatter_meta(self, csr, cache):
        return cache[1]

    def prepare_recv(self, csr, cache, metas):
        li = np.concatenate(metas) if metas else np.array([], np.int64)
        return li.astype(np.int64, copy=False)

    def init(self, csr, cache) -> dict:
        return {"x": np.zeros(csr.n_local, np.float64)}

    def scatter(self, csr, state, cache) -> list:
        bounds, local = cache
        x = state["x"]
        if csr.n_edges:
            contrib = x[csr.row_by_dst]
            if self.weighted:
                contrib = contrib * csr.weight_by_dst
            sums = np.add.reduceat(contrib, csr.dst_seg_starts)
        else:
            sums = np.zeros(0, np.float64)
        return [sums[a:b] for a, b in bounds]

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        n_local = csr.n_local
        c = np.concatenate(payloads) if payloads else np.zeros(0, np.float64)
        acc = (
            np.bincount(recv, weights=c, minlength=n_local)
            if len(c)
            else np.zeros(n_local, np.float64)
        )
        new = self.beta + self.alpha * acc
        resid = float(np.abs(new - state["x"]).sum())
        state["x"] = new
        return {"resid": resid, "ssq": float((new * new).sum())}


class _PowerIterProgram(VertexProgram):
    """Power iteration with DEFERRED L1 scaling (the HITS trick): gather
    stores the raw incoming sums and returns the L1 mass partial; the
    driver broadcasts the scalar scale, which the next scatter applies —
    no vertex data through the driver, one extra scalar RPC per step."""

    state_columns = ("x",)

    def __init__(self, weighted: bool):
        self.weighted = weighted

    def prepare(self, csr):
        return dest_partition_slices(csr)

    def scatter_meta(self, csr, cache):
        return cache[1]

    def prepare_recv(self, csr, cache, metas):
        li = np.concatenate(metas) if metas else np.array([], np.int64)
        return li.astype(np.int64, copy=False)

    def init(self, csr, cache) -> dict:
        return {"x": np.ones(csr.n_local, np.float64)}

    def scatter(self, csr, state, cache) -> list:
        bounds, local = cache
        s = state.pop("_scale", None)
        if s is not None and s > 0:
            xn = state["x"] / s
            # residual between consecutive L1-normalized iterates — the
            # scale arrives one step late, so the metric is too (gather
            # reports the previous step's change; fine for a stop rule)
            prev = state.get("_prev_norm")
            state["_resid"] = (
                float(np.abs(xn - prev).sum()) if prev is not None else float("inf")
            )
            state["_prev_norm"] = xn
            state["x"] = xn
        x = state["x"]
        if csr.n_edges:
            contrib = x[csr.row_by_dst]
            if self.weighted:
                contrib = contrib * csr.weight_by_dst
            sums = np.add.reduceat(contrib, csr.dst_seg_starts)
        else:
            sums = np.zeros(0, np.float64)
        return [sums[a:b] for a, b in bounds]

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        n_local = csr.n_local
        c = np.concatenate(payloads) if payloads else np.zeros(0, np.float64)
        new = (
            np.bincount(recv, weights=c, minlength=n_local)
            if len(c)
            else np.zeros(n_local, np.float64)
        )
        state["x"] = new
        return {
            "mass": float(new.sum()),
            "ssq": float((new * new).sum()),
            "resid": state.get("_resid", float("inf")),
        }


class EigenvectorCentrality(BaseClass):
    """``EigenvectorCentrality().fit(g)`` sets ``eigenvector_``: a
    Dataset of (id, eigenvector), plus ``n_iter_``. Frozen semantics for
    the SQL oracle: x0 = 1, per iteration the incoming-edge sum scaled by
    its global L1 mass (the deferred-scale power iteration); ``tol=0``
    runs exactly ``max_iter`` steps. ``normalized=True`` applies nx's
    final 1/||x||_2 instead of the last L1 scale, so the converged
    direction matches nx.eigenvector_centrality (which L2-scales every
    step — irrelevant at the fixpoint)."""

    def __init__(
        self,
        max_iter: int = 100,
        tol: float = 0.0,
        weighted: bool = False,
        normalized: bool = False,
        n_parts: int | None = None,
        workdir: str | None = None,
        actor_num_cpus: float | None = None,
    ):
        self.max_iter = max_iter
        self.tol = tol
        self.weighted = weighted
        self.normalized = normalized
        self.n_parts = n_parts
        self.workdir = workdir
        self.actor_num_cpus = actor_num_cpus

    def fit(self, g) -> "EigenvectorCentrality":
        from mercury_graph_ray.stages.util import ensure_schema

        vd, gas = prepare(g, symmetrize=not g.directed, n_parts=self.n_parts,
                          workdir=self.workdir, distinct=not self.weighted)
        engine = BspEngine(
            gas,
            _PowerIterProgram(self.weighted),
            actor_num_cpus=self.actor_num_cpus,
        )
        it = 0
        mass = ssq = 0.0
        for it in range(1, self.max_iter + 1):
            metrics = engine.superstep()
            mass = sum(m["mass"] for m in metrics)
            ssq = sum(m["ssq"] for m in metrics)
            resid = sum(m["resid"] for m in metrics)
            if mass <= 0:  # no edges / all mass drained: fixpoint is 0
                break
            engine.broadcast_state(_scale=mass)
            if self.tol > 0 and resid < self.tol:
                break
        self.n_iter_ = it
        state = engine.state_dataset()
        engine.shutdown()

        if self.normalized:
            scale = (1.0 / np.sqrt(ssq)) if ssq > 0 else 1.0
        else:
            scale = (1.0 / mass) if mass > 0 else 1.0

        def _final(t: pa.Table) -> pa.Table:
            x = t["x"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {"id": t["id"], "eigenvector": pa.array(x * scale, pa.float64())}
            )

        out = ensure_schema(
            state.map_batches(_final, batch_format="pyarrow"),
            {"id": pa.uint64(), "eigenvector": pa.float64()},
        )
        self.eigenvector_ = vd.decode(out, col="id")
        return self


class KatzCentrality(BaseClass):
    """``KatzCentrality(alpha=0.005, beta=1.0).fit(g)`` sets ``katz_``:
    a Dataset of (id, katz) in original key space, plus ``n_iter_``.
    ``tol=0`` runs exactly ``max_iter`` iterations (the SQL-checkable
    mode); ``normalized=True`` applies nx's final 1/||x||_2 scale."""

    def __init__(
        self,
        alpha: float = 0.005,
        beta: float = 1.0,
        max_iter: int = 100,
        tol: float = 0.0,
        weighted: bool = False,
        normalized: bool = False,
        n_parts: int | None = None,
        workdir: str | None = None,
        actor_num_cpus: float | None = None,
    ):
        self.alpha = alpha
        self.beta = beta
        self.max_iter = max_iter
        self.tol = tol
        self.weighted = weighted
        self.normalized = normalized
        self.n_parts = n_parts
        self.workdir = workdir
        self.actor_num_cpus = actor_num_cpus

    def fit(self, g) -> "KatzCentrality":
        from mercury_graph_ray.stages.util import ensure_schema

        vd, gas = prepare(g, symmetrize=not g.directed, n_parts=self.n_parts,
                          workdir=self.workdir, distinct=not self.weighted)
        engine = BspEngine(
            gas,
            _KatzProgram(self.alpha, self.beta, self.weighted),
            actor_num_cpus=self.actor_num_cpus,
        )
        it = 0
        ssq = 0.0
        for it in range(1, self.max_iter + 1):
            metrics = engine.superstep()
            resid = sum(m["resid"] for m in metrics)
            ssq = sum(m["ssq"] for m in metrics)
            if self.tol > 0 and resid < self.tol:
                break
        self.n_iter_ = it
        state = engine.state_dataset()
        engine.shutdown()

        scale = (1.0 / np.sqrt(ssq)) if (self.normalized and ssq > 0) else 1.0

        def _final(t: pa.Table) -> pa.Table:
            x = t["x"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({"id": t["id"], "katz": pa.array(x * scale, pa.float64())})

        out = ensure_schema(
            state.map_batches(_final, batch_format="pyarrow"),
            {"id": pa.uint64(), "katz": pa.float64()},
        )
        self.katz_ = vd.decode(out, col="id")
        return self
