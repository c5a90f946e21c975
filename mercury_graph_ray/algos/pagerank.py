"""PageRank — networkx-path semantics of the reference, on the BSP engine.

Reference contract (mercury/graph/core/graph.py:681-690 -> ``nx.pagerank``
defaults, SURVEY.md §2.9): alpha=0.85, uniform teleport and uniform
dangling redistribution, edge weights normalized by the source's total
out-weight, power iteration from x0=1/N, L1 stopping rule
``err < N * tol`` with tol=1e-6, scores sum to 1; raises after
``max_iter`` without convergence (nx.PowerIterationFailedConvergence).

Execution (stages/bsp.py): P persistent partition actors each hold their
static CSR block and dense rank vector. Per superstep each actor emits P
pre-combined per-destination contribution payloads (plus its dangling-rank
partial, so the global dangling mass is exact everywhere without a driver
round-trip), then applies

    rank' = (1-α)/N + α · (Σ contrib + D/N)

and returns only its L1-residual partial — the driver moves scalars, the
convergence check costs no extra job, and the per-superstep floor is two
actor-call rounds instead of two Ray Data shuffle jobs (the round-1
scaling bottleneck, VERDICT "Next round" #2).

Checkpoints: every ``checkpoint_every`` supersteps each actor writes its
partition (``state/part=<p>/data.parquet``) and the driver commits the
manifest; ``resume=True`` loads the newest complete manifest — honoring
its ``converged`` flag (a finished run resumed with a smaller ``max_iter``
returns the loaded state instead of raising).
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram, dest_partition_slices


class PowerIterationFailedConvergence(RuntimeError):
    pass


class _PageRankProgram(VertexProgram):
    """Scatter runs on the dst-major static layout: one sequential
    ``np.add.reduceat`` per superstep (no bincount scatter into the
    U_p-sized array — the round-2 bandwidth plateau, BASELINE.md), and
    per-destination-partition payloads are contiguous slices. With
    ``payload_dtype=float32`` the exchanged contribution sums are
    halved in size; the rank accumulator stays float64 (nx parity at
    1e-6 survives f32 partials — VERDICT r2 next-round #1a)."""

    state_columns = ("rank",)

    def __init__(self, n: int, alpha: float, payload_dtype=np.float32, seed_vids=None):
        self.n = n
        self.alpha = alpha
        self.payload_dtype = np.dtype(payload_dtype)
        # personalized teleport (nx semantics): p_i = 1/|S| on the seed
        # set, 0 elsewhere; teleport AND dangling mass both follow p.
        # None -> uniform p = 1/N (classic PageRank, the fast path).
        self.seed_vids = None if seed_vids is None else np.asarray(seed_vids, np.int64)

    def prepare(self, csr):
        return dest_partition_slices(csr)

    def scatter_meta(self, csr, cache):
        # destinations are static -> ship local row ids once at setup
        bounds, local = cache
        return local

    def prepare_recv(self, csr, cache, metas):
        li = (
            np.concatenate(metas)
            if metas
            else np.array([], np.int64)
        )
        return li.astype(np.int64, copy=False)

    def init(self, csr, cache) -> dict:
        state = {"rank": np.full(csr.n_local, 1.0 / self.n, np.float64)}
        if self.seed_vids is not None:
            # local slice of the teleport vector: vid -> (vid % P) owner,
            # vid // P local row (the engine's static placement rule)
            p = np.zeros(csr.n_local, np.float64)
            mine = self.seed_vids[self.seed_vids % csr.n_parts == csr.part]
            p[mine // csr.n_parts] = 1.0 / len(self.seed_vids)
            state["__p"] = p
        return state

    def scatter(self, csr, state, cache) -> list:
        bounds, local = cache
        r = state["rank"]
        if csr.n_edges:
            contrib_edge = r[csr.row_by_dst] * csr.w_norm_by_dst
            sums = np.add.reduceat(contrib_edge, csr.dst_seg_starts)
        else:
            sums = np.zeros(0, np.float64)
        if self.payload_dtype != np.float64:
            sums = sums.astype(self.payload_dtype)
        d_partial = float(r[csr.dangling].sum())
        return [(sums[a:b], d_partial) for a, b in bounds]

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        n_local = csr.n_local
        d_total = float(sum(p[1] for p in payloads))
        c = np.concatenate([p[0] for p in payloads])
        acc = (
            np.bincount(recv, weights=c, minlength=n_local)
            if len(c)
            else np.zeros(n_local, np.float64)
        )
        p = state.get("__p")
        if p is None:
            new = (1.0 - self.alpha) / self.n + self.alpha * (acc + d_total / self.n)
        else:
            new = (1.0 - self.alpha) * p + self.alpha * (acc + d_total * p)
        resid = float(np.abs(new - state["rank"]).sum())
        state["rank"] = new
        return {"resid": resid}


class PageRank(BaseClass):
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
        actor_num_cpus: float | None = None,
        strict: bool = True,
        payload_dtype: str = "float32",
        personalization: list | None = None,
    ):
        self.alpha = alpha
        self.tol = tol
        self.max_iter = max_iter
        self.n_parts = n_parts
        self.workdir = workdir
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.resume = resume
        self.actor_num_cpus = actor_num_cpus
        # strict=False: record converged_=False at max_iter instead of
        # raising (bench mode: fixed-superstep throughput runs)
        self.strict = strict
        # float32 halves the per-superstep exchange bytes; rank state and
        # accumulation stay float64 (nx parity 1e-6 holds). float64 is for
        # consumers that need ~1e-9 agreement with an exact-arithmetic
        # oracle (the pagerank_fixed20 DuckDB unroll rounds to 9 decimals).
        self.payload_dtype = payload_dtype
        # personalized PageRank: original vertex keys forming the teleport
        # set (uniform over the DISTINCT keys — nx's normalized
        # personalization dict with equal weights). Teleport and dangling
        # mass both go to the set; x0 stays uniform 1/N (nx semantics).
        self.personalization = personalization

    def fit(self, g) -> "PageRank":
        from mercury_graph_ray.state.checkpoint import CheckpointManager

        vd, gas = prepare(g, symmetrize=not g.directed, n_parts=self.n_parts, workdir=self.workdir)
        n = gas.n
        seed_vids = None
        seed_keys = None
        if self.personalization is not None:
            from mercury_graph_ray.algos.common import keys_to_vids

            seed_keys = sorted({str(k) for k in self.personalization})
            if not seed_keys:
                raise ValueError("personalization must name at least one vertex")
            seed_vids = keys_to_vids(vd, seed_keys)
        engine = BspEngine(
            gas,
            _PageRankProgram(
                n, self.alpha, payload_dtype=self.payload_dtype, seed_vids=seed_vids
            ),
            actor_num_cpus=self.actor_num_cpus,
        )

        ckpt = None
        if self.checkpoint_dir:
            ckpt = CheckpointManager(
                self.checkpoint_dir,
                "pagerank",
                fingerprint={
                    "n": n,
                    "p": gas.p,
                    "alpha": self.alpha,
                    "tol": self.tol,
                    "seeds": seed_keys,
                },
            )

        start_iter = 0
        err = float("inf")
        converged = False
        if ckpt and self.resume:
            found = ckpt.latest()
            if found is not None:
                start_iter, manifest = found
                engine.load_checkpoint(ckpt, start_iter)
                m = manifest.get("metrics", {})
                err = float(m.get("err", err))
                # honor the manifest's converged flag (ADVICE: a converged
                # run resumed with start_iter >= max_iter must not raise)
                converged = bool(m.get("converged", False)) or err < n * self.tol

        import time

        it = start_iter
        t_loop = time.perf_counter()
        self.superstep_times_: list[float] = []
        if not converged:
            for it in range(start_iter + 1, self.max_iter + 1):
                t_ss = time.perf_counter()
                metrics = engine.superstep()
                self.superstep_times_.append(time.perf_counter() - t_ss)
                err = float(sum(m["resid"] for m in metrics))
                if ckpt and (it % self.checkpoint_every == 0):
                    engine.save_checkpoint(ckpt, it, {"err": err, "n_iter": it})
                if err < n * self.tol:
                    converged = True
                    break
            if not converged and self.strict:
                raise PowerIterationFailedConvergence(
                    f"pagerank failed to converge in {self.max_iter} iterations (err={err})"
                )
        self.loop_secs_ = time.perf_counter() - t_loop
        self.superstep_secs_ = self.loop_secs_ / max(1, it - start_iter)
        # median is the robust throughput statistic on shared hosts where
        # transient CPU-steal episodes poison a mean
        self.superstep_median_ = (
            float(np.median(self.superstep_times_)) if self.superstep_times_
            else self.superstep_secs_
        )
        self.converged_ = converged
        if ckpt:
            engine.save_checkpoint(
                ckpt, it, {"err": err, "n_iter": it, "converged": converged}
            )

        self.n_iter_ = it
        self.err_ = err
        self.pagerank_raw_ = engine.state_dataset().select_columns(["id", "rank"])
        self.pagerank_ = vd.decode(self.pagerank_raw_)
        engine.shutdown()
        return self
