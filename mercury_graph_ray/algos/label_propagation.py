"""Synchronous label propagation (community detection surface) — BSP.

The north rule names "label propagation"; the reference's community
surface is Louvain/Spectral (SURVEY.md scope note #1), so the LPA
semantics are defined here and frozen (SURVEY.md §2.9 row "Label
propagation"):

- undirected (symmetrized) weighted graph; initial label = own vertex id;
- each superstep every vertex *synchronously* adopts the label with the
  largest incoming weight sum over its neighbors
  (``argmax_l Σ_{u∈N(v), label(u)=l} w(u,v)``);
- ties break to the SMALLER label (deterministic under any parallelism);
- a vertex with no neighbors keeps its label;
- stop when no label changes or after ``max_iter`` supersteps
  (synchronous LPA can oscillate on bipartite-ish structures, so
  non-convergence at the cap is recorded, not raised).

Execution (stages/bsp.py): persistent partition actors. Scatter
pre-combines (destination, label) weight sums per source partition
(lexsort+reduceat — the hub-splitting partial combine) and routes them by
destination partition; gather merges the P partials plus one zero-weight
self row per vertex (so every vertex has a candidate row), then takes the
per-destination argmax with the first-max-wins rule over label-ascending
segments — identical numerics to the round-1 Dataset-engine gather, minus
the two shuffle jobs per superstep.
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram
from mercury_graph_ray.stages.gas import segment_sum_2key


class _LpaProgram(VertexProgram):
    state_columns = ("label",)

    def init(self, csr, cache) -> dict:
        ids = np.arange(csr.part, csr.n_vertices, csr.n_parts, dtype=np.uint64)
        return {"label": ids}

    def scatter(self, csr, state, cache) -> list:
        p = csr.n_parts
        lab_edge = state["label"][csr.row_of_edge]
        dsts, labs, wsums = segment_sum_2key(csr.dst, lab_edge, csr.weight)
        # (dst, label) keys change every superstep -> dynamic split by
        # destination partition (stable sort keeps dst-ascending order
        # within each partition, which the gather's reduceat relies on)
        qs = (dsts % np.uint64(p)).astype(np.int64)
        order = np.argsort(qs, kind="stable")
        qsorted = qs[order]
        starts = np.searchsorted(qsorted, np.arange(p))
        ends = np.searchsorted(qsorted, np.arange(p), side="right")
        out = []
        for q in range(p):
            ix = order[starts[q]:ends[q]]
            out.append(((dsts[ix] // np.uint64(p)).astype(np.int64), labs[ix], wsums[ix]))
        return out

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        old = state["label"]
        n_local = csr.n_local
        # one zero-weight self row per vertex: every vertex has a candidate
        # and an isolated vertex keeps its own label (frozen round-1 rule)
        li = np.concatenate([p[0] for p in payloads] + [np.arange(n_local, dtype=np.int64)])
        lab = np.concatenate([p[1] for p in payloads] + [old])
        w = np.concatenate([p[2] for p in payloads] + [np.zeros(n_local)])
        ml, mlab, mw = segment_sum_2key(li, lab.astype(np.uint64), w)
        # per-dst argmax, first max wins -> smallest label on ties
        seg_starts = np.flatnonzero(np.concatenate([[True], ml[1:] != ml[:-1]]))
        seg_id = np.cumsum(np.concatenate([[0], (ml[1:] != ml[:-1]).astype(np.int64)]))
        max_w = np.maximum.reduceat(mw, seg_starts)
        is_max = mw == max_w[seg_id]
        row_idx = np.arange(len(ml), dtype=np.int64)
        big = len(ml)
        first_max = np.minimum.reduceat(np.where(is_max, row_idx, big), seg_starts)
        new = old.copy()
        new[ml[seg_starts]] = mlab[first_max]
        changed = int((new != old).sum())
        state["label"] = new
        return {"n_changed": changed}


class _SeededLpaProgram(_LpaProgram):
    """Semi-supervised LPA: the seed vertices' labels are FROZEN to their
    own vertex id — they emit influence every superstep but never adopt a
    neighbor's label (the production "grow communities around chosen
    exemplars" ask, VERDICT r4 #9). Shares ``_LpaProgram``'s scatter and
    argmax gather verbatim; apply clamps the seed rows back after the
    majority step, and n_changed is recomputed post-clamp so convergence
    means "no NON-seed vertex moved"."""

    def __init__(self, seed_vids: np.ndarray):
        self.seed_vids = np.asarray(seed_vids, np.uint64)
        self._li = None  # per-actor lazy: this partition's seed rows

    def _local_seeds(self, csr) -> np.ndarray:
        if self._li is None:
            mine = (self.seed_vids % np.uint64(csr.n_parts)) == csr.part
            self._li = (self.seed_vids[mine] // np.uint64(csr.n_parts)).astype(
                np.int64
            )
        return self._li

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        old = state["label"].copy()
        super().gather_apply(csr, state, payloads, cache, recv)
        li = self._local_seeds(csr)
        state["label"][li] = old[li]  # seeds keep their frozen label
        return {"n_changed": int((state["label"] != old).sum())}


class LabelPropagation(BaseClass):
    """``LabelPropagation().fit(g)`` sets ``labels_``: Dataset of
    (id, label) in original key space (label = key of some member vertex),
    plus ``n_iter_`` and ``converged_``.

    ``fit(g, seed_ids=[...])`` runs the semi-supervised variant: the
    listed vertices keep their own id as a frozen label (they propagate
    but never change), every other vertex follows the frozen synchronous
    argmax rule unchanged."""

    def __init__(
        self,
        max_iter: int = 30,
        n_parts: int | None = None,
        workdir: str | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 5,
        resume: bool = False,
        actor_num_cpus: float | None = None,
    ):
        self.max_iter = max_iter
        self.n_parts = n_parts
        self.workdir = workdir
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.resume = resume
        self.actor_num_cpus = actor_num_cpus

    def fit(self, g, seed_ids: list | None = None) -> "LabelPropagation":
        from mercury_graph_ray.state.checkpoint import CheckpointManager

        vd, gas = prepare(g, symmetrize=True, n_parts=self.n_parts, workdir=self.workdir)
        if seed_ids is not None:
            from mercury_graph_ray.algos.common import keys_to_vids

            seed_vids = np.sort(keys_to_vids(vd, seed_ids)).astype(np.uint64)
            program = _SeededLpaProgram(seed_vids)
            fingerprint = {
                "n": gas.n,
                "p": gas.p,
                "seeds": [int(v) for v in seed_vids],
            }
        else:
            program = _LpaProgram()
            fingerprint = {"n": gas.n, "p": gas.p}
        engine = BspEngine(gas, program, actor_num_cpus=self.actor_num_cpus)

        ckpt = None
        if self.checkpoint_dir:
            ckpt = CheckpointManager(
                self.checkpoint_dir, "lpa", fingerprint=fingerprint
            )
        start_iter = 0
        self.converged_ = False
        if ckpt and self.resume:
            found = ckpt.latest()
            if found is not None:
                start_iter, manifest = found
                engine.load_checkpoint(ckpt, start_iter)
                m = manifest.get("metrics", {})
                self.converged_ = bool(m.get("converged", False)) or m.get("n_changed") == 0

        it = start_iter
        if not self.converged_:
            for it in range(start_iter + 1, self.max_iter + 1):
                metrics = engine.superstep()
                n_changed = int(sum(m["n_changed"] for m in metrics))
                if ckpt and (it % self.checkpoint_every == 0):
                    engine.save_checkpoint(ckpt, it, {"n_changed": n_changed, "n_iter": it})
                if n_changed == 0:
                    self.converged_ = True
                    break
        if ckpt:
            engine.save_checkpoint(ckpt, it, {"n_iter": it, "converged": self.converged_})
        self.n_iter_ = it
        state = engine.state_dataset()
        engine.shutdown()
        labels = state.select_columns(["id", "label"])
        out = vd.decode(labels, col="id")
        self.labels_ = vd.decode(out, col="label")
        return self
