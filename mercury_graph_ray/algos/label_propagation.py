"""Synchronous label propagation (community detection surface).

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

Dataflow: scatter pre-combines (destination, label) weight sums per
source partition (lexsort+reduceat — the hub-splitting partial combine);
gather merges partials, then takes the per-destination argmax with the
first-max-wins rule over label-ascending segments (vectorized, no
per-vertex Python).
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.csr import CsrBlock
from mercury_graph_ray.stages.gas import dense_from_group, segment_sum_2key

NOVAL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _scatter(csr: CsrBlock, group: dict) -> dict:
    p = csr.n_parts
    lab_local = dense_from_group(group, "label", csr.n_local, p)
    lab_edge = lab_local[csr.row_of_edge]
    dsts, labs, wsums = segment_sum_2key(csr.dst, lab_edge, csr.weight)
    ids = np.asarray(group["id"], np.uint64)
    own = np.asarray(group["label"], np.uint64)
    dst = np.concatenate([dsts, ids])
    lab = np.concatenate([labs, own])
    w = np.concatenate([wsums, np.zeros(len(ids))])
    old = np.concatenate([np.full(len(dsts), NOVAL, np.uint64), own])
    gpart = (dst % np.uint64(p)).astype(np.int64)
    return {"gpart": gpart, "dst": dst, "lab": lab, "w": w, "old": old}


def _make_gather(p: int):
    def _gather(part: int, n_local: int, ids: np.ndarray, group: dict) -> dict:
        dst = np.asarray(group["dst"], np.uint64)
        lab = np.asarray(group["lab"], np.uint64)
        w = np.asarray(group["w"], np.float64)
        old = np.asarray(group["old"], np.uint64)

        old_vec = np.empty(n_local, np.uint64)
        self_mask = old != NOVAL
        old_vec[(dst[self_mask] // np.uint64(p)).astype(np.int64)] = old[self_mask]

        local = (dst // np.uint64(p)).astype(np.int64)
        # merge cross-partition partials: per (dst, label) total weight,
        # sorted by (dst asc, label asc)
        ml, mlab, mw = segment_sum_2key(local, lab, w)
        # per-dst argmax, first max wins -> smallest label on ties
        seg_starts = np.flatnonzero(np.concatenate([[True], ml[1:] != ml[:-1]]))
        seg_id = np.cumsum(np.concatenate([[0], (ml[1:] != ml[:-1]).astype(np.int64)]))
        max_w = np.maximum.reduceat(mw, seg_starts)
        is_max = mw == max_w[seg_id]
        row_idx = np.arange(len(ml), dtype=np.int64)
        big = len(ml)
        first_max = np.minimum.reduceat(np.where(is_max, row_idx, big), seg_starts)
        new_lab_vec = old_vec.copy()  # vertices with no rows keep own label
        new_lab_vec[ml[seg_starts]] = mlab[first_max]
        changed = new_lab_vec != old_vec
        return {
            "id": ids,
            "part": np.full(n_local, part, np.int64),
            "label": new_lab_vec,
            "changed": changed.astype(np.int64),
        }

    return _gather


class LabelPropagation:
    """``LabelPropagation().fit(g)`` sets ``labels_``: Dataset of
    (id, label) in original key space (label = key of some member vertex),
    plus ``n_iter_`` and ``converged_``."""

    def __init__(
        self,
        max_iter: int = 30,
        n_parts: int | None = None,
        workdir: str | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 5,
        resume: bool = False,
    ):
        self.max_iter = max_iter
        self.n_parts = n_parts
        self.workdir = workdir
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.resume = resume

    def fit(self, g) -> "LabelPropagation":
        from mercury_graph_ray.state.checkpoint import CheckpointManager

        vd, gas = prepare(g, symmetrize=True, n_parts=self.n_parts, workdir=self.workdir)
        import pyarrow as pa

        gather = _make_gather(gas.p)
        schema = {
            "id": pa.uint64(),
            "part": pa.int64(),
            "label": pa.uint64(),
            "changed": pa.int64(),
        }

        ckpt = None
        if self.checkpoint_dir:
            ckpt = CheckpointManager(
                self.checkpoint_dir, "lpa", fingerprint={"n": gas.n, "p": gas.p}
            )
        start_iter, state = 0, None
        if ckpt and self.resume:
            found = ckpt.latest()
            if found is not None:
                start_iter = found[0]
                state = ckpt.load(start_iter)
        if state is None:
            state = gas.init_state({"label": lambda ids: ids.copy()})

        self.converged_ = False
        it = start_iter
        for it in range(start_iter + 1, self.max_iter + 1):
            state = gas.superstep(state, _scatter, gather, state_schema=schema)
            n_changed = state.sum("changed")
            if ckpt and (it % self.checkpoint_every == 0):
                ckpt.save(it, state, {"n_changed": int(n_changed), "n_iter": it})
            if n_changed == 0:
                self.converged_ = True
                break
        if ckpt:
            ckpt.save(it, state, {"n_iter": it, "converged": self.converged_})
        self.n_iter_ = it
        labels = state.select_columns(["id", "label"])
        out = vd.decode(labels, col="id")
        self.labels_ = vd.decode(out, col="label")
        return self
