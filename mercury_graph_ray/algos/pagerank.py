"""PageRank — networkx-path semantics of the reference, on the GAS engine.

Reference contract (mercury/graph/core/graph.py:681-690 -> ``nx.pagerank``
defaults, SURVEY.md §2.9): alpha=0.85, uniform teleport and uniform
dangling redistribution, edge weights normalized by the source's total
out-weight, power iteration from x0=1/N, L1 stopping rule
``err < N * tol`` with tol=1e-6, scores sum to 1; raises after
``max_iter`` without convergence (nx.PowerIterationFailedConvergence).

Dataflow per superstep (stages/gas.py): scatter emits per-destination
pre-combined contributions ``rank[src] * w/Σw_out(src)``, one self row per
vertex carrying the old rank, and P sentinel rows broadcasting the
partition's dangling-rank partial to every gather partition (so the
global dangling mass D is exact everywhere without a driver round-trip);
gather bincounts contributions into the dense local vector and applies

    rank' = (1-α)/N + α · (Σ contrib + D/N)

The driver loop only moves scalars (the L1 residual) per superstep.
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.csr import CsrBlock
from mercury_graph_ray.stages.gas import dense_from_group

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


class PowerIterationFailedConvergence(RuntimeError):
    pass


def _scatter(csr: CsrBlock, group: dict) -> dict:
    p = csr.n_parts
    r_local = dense_from_group(group, "rank", csr.n_local, p)
    contrib_edge = r_local[csr.row_of_edge] * csr.w_norm
    sums = np.bincount(csr.dst_inv, weights=contrib_edge, minlength=len(csr.uniq_dst))
    d_partial = float(r_local[csr.dangling].sum())

    n_u, n_s = len(csr.uniq_dst), len(group["id"])
    dst = np.concatenate([csr.uniq_dst, group["id"], np.full(p, SENTINEL, np.uint64)])
    contrib = np.concatenate([sums, np.zeros(n_s), np.full(p, d_partial)])
    old = np.concatenate([np.full(n_u, np.nan), group["rank"], np.full(p, np.nan)])
    gpart = np.concatenate(
        [
            (csr.uniq_dst % np.uint64(p)).astype(np.int64),
            np.asarray(group["part"], np.int64),
            np.arange(p, dtype=np.int64),
        ]
    )
    return {"gpart": gpart, "dst": dst, "contrib": contrib, "old": old}


def _make_gather(n: int, p: int, alpha: float):
    def _gather(part: int, n_local: int, ids: np.ndarray, group: dict) -> dict:
        dst = np.asarray(group["dst"], np.uint64)
        contrib = np.asarray(group["contrib"], np.float64)
        old = np.asarray(group["old"], np.float64)
        sent = dst == SENTINEL
        d_total = float(contrib[sent].sum())
        dstn, contribn, oldn = dst[~sent], contrib[~sent], old[~sent]
        local = (dstn // np.uint64(p)).astype(np.int64)
        acc = np.bincount(local, weights=contribn, minlength=n_local)
        old_vec = np.empty(n_local, np.float64)
        self_mask = ~np.isnan(oldn)
        old_vec[local[self_mask]] = oldn[self_mask]
        rank = (1.0 - alpha) / n + alpha * (acc + d_total / n)
        return {
            "id": ids,
            "part": np.full(n_local, part, np.int64),
            "rank": rank,
            "resid": np.abs(rank - old_vec),
        }

    return _gather


class PageRank:
    """Scikit-style estimator (reference convention, core/graph.py:128-137):
    ``PageRank().fit(g)`` sets ``pagerank_`` (Dataset of id, rank) plus
    ``n_iter_`` and ``err_``."""

    def __init__(
        self,
        alpha: float = 0.85,
        tol: float = 1e-6,
        max_iter: int = 100,
        n_parts: int | None = None,
        workdir: str | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 5,
        resume: bool = False,
    ):
        self.alpha = alpha
        self.tol = tol
        self.max_iter = max_iter
        self.n_parts = n_parts
        self.workdir = workdir
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.resume = resume

    def fit(self, g) -> "PageRank":
        from mercury_graph_ray.state.checkpoint import CheckpointManager

        import pyarrow as pa

        vd, gas = prepare(g, symmetrize=not g.directed, n_parts=self.n_parts, workdir=self.workdir)
        n = gas.n
        gather = _make_gather(n, gas.p, self.alpha)
        schema = {
            "id": pa.uint64(),
            "part": pa.int64(),
            "rank": pa.float64(),
            "resid": pa.float64(),
        }

        ckpt = None
        if self.checkpoint_dir:
            ckpt = CheckpointManager(
                self.checkpoint_dir,
                "pagerank",
                fingerprint={"n": n, "p": gas.p, "alpha": self.alpha, "tol": self.tol},
            )

        start_iter = 0
        state = None
        if ckpt and self.resume:
            found = ckpt.latest()
            if found is not None:
                start_iter = found[0]
                state = ckpt.load(start_iter)
        if state is None:
            state = gas.init_state({"rank": lambda ids: np.full(len(ids), 1.0 / n)})

        err = float("inf")
        it = start_iter
        for it in range(start_iter + 1, self.max_iter + 1):
            state = gas.superstep(state, _scatter, gather, state_schema=schema)
            err = state.sum("resid")
            if ckpt and (it % self.checkpoint_every == 0):
                ckpt.save(it, state, {"err": err, "n_iter": it})
            if err < n * self.tol:
                break
        else:
            raise PowerIterationFailedConvergence(
                f"pagerank failed to converge in {self.max_iter} iterations (err={err})"
            )
        if ckpt:
            ckpt.save(it, state, {"err": err, "n_iter": it, "converged": True})

        self.n_iter_ = it
        self.err_ = err
        self.pagerank_raw_ = state.select_columns(["id", "rank"])
        self.pagerank_ = vd.decode(self.pagerank_raw_)
        return self
