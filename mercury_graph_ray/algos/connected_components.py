"""Connected components — min-label propagation on the GAS engine.

Reference semantics (mercury/graph/core/graph.py:692-720, SURVEY.md §2.9):
directed graphs are first converted undirected, each node gets
``{component, component_size}``; the reference's cc_id is an arbitrary
enumeration index and its tests assert only membership + sizes
(unit_tests/test_core_graph.py:152-158), so we canonicalize
``component = min vertex id in the component`` (in original key space),
which min-label propagation converges to naturally.

Superstep: scatter emits the per-destination minimum of the neighbors'
labels (pre-combined per source partition via sort+reduceat) plus a self
row carrying the old label; gather takes the running minimum and counts
changes. Converges in O(diameter) supersteps; the driver only sees the
changed-vertex count scalar.
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.csr import CsrBlock
from mercury_graph_ray.stages.gas import dense_from_group, segment_min

NOVAL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _scatter(csr: CsrBlock, group: dict) -> dict:
    p = csr.n_parts
    lab_local = dense_from_group(group, "label", csr.n_local, p)
    lab_edge = lab_local[csr.row_of_edge]
    # min incoming label per distinct destination (partition-level combine)
    dsts, mins = segment_min(csr.dst, lab_edge)
    ids = np.asarray(group["id"], np.uint64)
    dst = np.concatenate([dsts, ids])
    lab = np.concatenate([mins, np.asarray(group["label"], np.uint64)])
    old = np.concatenate([np.full(len(dsts), NOVAL, np.uint64), np.asarray(group["label"], np.uint64)])
    gpart = (dst % np.uint64(p)).astype(np.int64)
    return {"gpart": gpart, "dst": dst, "lab": lab, "old": old}


def _make_gather(p: int):
    def _gather(part: int, n_local: int, ids: np.ndarray, group: dict) -> dict:
        dst = np.asarray(group["dst"], np.uint64)
        lab = np.asarray(group["lab"], np.uint64)
        old = np.asarray(group["old"], np.uint64)
        local = (dst // np.uint64(p)).astype(np.int64)
        acc = np.full(n_local, NOVAL, np.uint64)
        uniq_local, mins = segment_min(local, lab)
        acc[uniq_local] = mins
        old_vec = np.empty(n_local, np.uint64)
        self_mask = old != NOVAL
        old_vec[local[self_mask]] = old[self_mask]
        changed = acc != old_vec
        return {
            "id": ids,
            "part": np.full(n_local, part, np.int64),
            "label": acc,
            "changed": changed.astype(np.int64),
        }

    return _gather


class ConnectedComponents:
    """``ConnectedComponents().fit(g)`` sets ``components_``: a Dataset of
    (id, component, component_size) in original key space, plus
    ``n_components_`` and ``n_iter_``."""

    def __init__(
        self,
        max_iter: int = 200,
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

    def fit(self, g) -> "ConnectedComponents":
        from ray.data.aggregate import Count

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
                self.checkpoint_dir, "cc", fingerprint={"n": gas.n, "p": gas.p}
            )
        start_iter, state = 0, None
        if ckpt and self.resume:
            found = ckpt.latest()
            if found is not None:
                start_iter = found[0]
                state = ckpt.load(start_iter)
        if state is None:
            state = gas.init_state({"label": lambda ids: ids.copy()})

        it = start_iter
        for it in range(start_iter + 1, self.max_iter + 1):
            state = gas.superstep(state, _scatter, gather, state_schema=schema)
            n_changed = state.sum("changed")
            if ckpt and (it % self.checkpoint_every == 0):
                ckpt.save(it, state, {"n_changed": int(n_changed), "n_iter": it})
            if n_changed == 0:
                break
        else:
            raise RuntimeError(f"connected components did not converge in {self.max_iter} iters")
        if ckpt:
            ckpt.save(it, state, {"n_changed": 0, "n_iter": it, "converged": True})
        self.n_iter_ = it

        import pyarrow as pa

        from mercury_graph_ray.stages.util import ensure_schema

        # int64 label: Ray's hash-join requires exactly matching key types
        # (groupby outputs int64 keys); ensure_schema also scrubs the
        # schema-less empty blocks that would break the acero join.
        labels = ensure_schema(
            state.select_columns(["id", "label"]),
            {"id": pa.uint64(), "label": pa.int64()},
        )
        sizes = ensure_schema(
            labels.groupby("label").aggregate(Count(alias_name="component_size")),
            {"label": pa.int64(), "component_size": pa.int64()},
        )
        self.n_components_ = sizes.count()
        from mercury_graph_ray.stages.join import hash_join

        joined = hash_join(labels, sizes, on=("label",), num_buckets=max(2, gas.p))
        out = vd.decode(joined, col="id")
        out = vd.decode(out, col="label", out_col="component")
        self.components_ = out.select_columns(["id", "component", "component_size"])
        return self
