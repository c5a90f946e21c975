"""Distributed random walks (reference:
mercury/graph/ml/spark_randomwalker.py:68-186).

Reference behavior reproduced: one walker per source node; per epoch a
walker at ``u`` moves along an out-edge with probability
``w(u,v)/Σw_out(u)`` (the per-src CDF the reference precomputes with
windows, spark_randomwalker.py:111-127 — our CSR rows replace the
windows); ``paths_`` rows carry the visited node array plus the
cumulative path-probability array (weights[0]=1.0, weights[k] =
weights[k-1]·p_k); dead-end walkers simply stop growing. Optional
``n_sampling_edges`` reproduces the reference's hub skew control
(spark_randomwalker.py:168-186): per epoch keep the top-k out-edges of a
node ranked by ``rand()·p`` and walk only among them (probabilities stay
normalized by the FULL out-weight, as in the reference).

Unlike the reference's unseeded ``f.rand()`` (a nondeterminism hazard,
SURVEY.md §4), every random draw is keyed ``[seed, epoch, walker|src]``
— identical walks at any parallelism, resumable mid-walk.

The walker state is a Dataset partitioned by the walker's *current*
vertex (``part = curr % P``), so each step reads only its partition's
CSR block; the per-epoch shuffle moves walker rows, never edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.csr import CsrBlock


class RandomWalker:
    """``RandomWalker(num_epochs=10).fit(g, source_id)`` sets ``paths_``:
    Dataset of (random_walks: list, weights: list<float>)."""

    def __init__(self, num_epochs: int = 10, n_sampling_edges: int | None = None,
                 seed: int = 42, n_parts: int | None = None, workdir: str | None = None):
        self.num_epochs = num_epochs
        self.n_sampling_edges = n_sampling_edges
        self.seed = seed
        self.n_parts = n_parts
        self.workdir = workdir

    def fit(self, g, source_id: list) -> "RandomWalker":
        import ray
        import ray.data as rd

        vd, gas = prepare(g, symmetrize=False, n_parts=self.n_parts, workdir=self.workdir)
        p = gas.p
        seed = self.seed
        k_sample = self.n_sampling_edges
        csr_refs = gas.csr_refs

        mapping = vd.mapping.to_pandas()
        src_keys = set(map(str, source_id))
        sources = mapping.loc[mapping["id"].astype(str).isin(src_keys), "vid"].to_numpy(
            np.uint64
        )
        if len(sources) == 0:
            raise ValueError("no source_id found in the graph")
        init = pd.DataFrame(
            {
                "walker": np.arange(len(sources), dtype=np.int64),
                "curr": sources,
                "part": (sources % np.uint64(p)).astype(np.int64),
                "path": [[int(s)] for s in sources],
                "wts": [[1.0] for _ in sources],
            }
        )
        state = rd.from_pandas(init).materialize()

        def _step(group: pd.DataFrame, *, epoch: int) -> pd.DataFrame:
            part = int(group["part"].iloc[0])
            csr: CsrBlock = ray.get(csr_refs[part])
            out = {"walker": [], "curr": [], "part": [], "path": [], "wts": []}
            for _, row in group.iterrows():
                u = int(row["curr"])
                local = u // p
                s, e = csr.indptr[local], csr.indptr[local + 1]
                dsts = csr.dst[s:e]
                probs = csr.w_norm[s:e]
                nxt = None
                if len(dsts):
                    if k_sample and len(dsts) > k_sample:
                        rng_e = np.random.default_rng([seed, epoch, u, 7])
                        keep = np.argsort(-(rng_e.random(len(dsts)) * probs),
                                          kind="stable")[:k_sample]
                        keep = np.sort(keep)
                        dsts, probs = dsts[keep], probs[keep]
                    rng_w = np.random.default_rng([seed, epoch, int(row["walker"])])
                    r = rng_w.random()
                    cum = np.cumsum(probs)
                    pos = int(np.searchsorted(cum, r, side="right"))
                    if pos < len(dsts):
                        nxt = (int(dsts[pos]), float(probs[pos]))
                if nxt is None:  # dead end (or sampled mass < r): walk halts
                    out["walker"].append(row["walker"])
                    out["curr"].append(row["curr"])
                    out["part"].append(part)
                    out["path"].append(row["path"])
                    out["wts"].append(row["wts"])
                else:
                    v, prob = nxt
                    out["walker"].append(row["walker"])
                    out["curr"].append(v)
                    out["part"].append(v % p)
                    out["path"].append(list(row["path"]) + [v])
                    out["wts"].append(list(row["wts"]) + [row["wts"][-1] * prob])
            return pd.DataFrame(out)

        import functools

        for epoch in range(self.num_epochs):
            state = (
                state.groupby("part")
                .map_groups(functools.partial(_step, epoch=epoch), batch_format="pandas")
                .materialize()
            )

        keys_ref = vd._broadcast_ref

        def _decode(batch: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(keys_ref)
            return pd.DataFrame(
                {
                    "random_walks": [
                        [keys[int(v)] for v in path] for path in batch["path"]
                    ],
                    "weights": list(batch["wts"]),
                }
            )

        self.paths_ = state.map_batches(_decode, batch_format="pandas")
        return self
