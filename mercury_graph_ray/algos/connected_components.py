"""Connected components — min-label propagation on the BSP engine.

Reference semantics (mercury/graph/core/graph.py:692-720, SURVEY.md §2.9):
directed graphs are first converted undirected, each node gets
``{component, component_size}``; the reference's cc_id is an arbitrary
enumeration index and its tests assert only membership + sizes
(unit_tests/test_core_graph.py:152-158), so we canonicalize
``component = min vertex id in the component`` (in original key space),
which min-label propagation converges to naturally.

Execution (stages/bsp.py): persistent partition actors; per superstep
each actor emits the per-destination minimum of its local labels
(sort+reduceat pre-combine — the hub-splitting partial), the receiving
actor folds the P partial minima into its dense label vector
(``label' = min(label, incoming)``) and returns only its changed-vertex
count. Converges in O(diameter) supersteps; the driver moves scalars.

Resume honors the manifest's ``converged`` flag (ADVICE: a finished run
resumed with a smaller ``max_iter`` must not raise).
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram, dest_partition_slices


class _CcProgram(VertexProgram):
    state_columns = ("label",)

    def prepare(self, csr):
        # dst-major static layout (csr.row_by_dst / dst_seg_starts): one
        # sequential reduceat per superstep, contiguous payload slices
        return dest_partition_slices(csr)

    def scatter_meta(self, csr, cache):
        # message destinations are the static unique-dst set -> exchange
        # local row ids once; per-superstep payloads carry minima only
        bounds, local = cache
        return local

    def prepare_recv(self, csr, cache, metas):
        li = np.concatenate(metas) if metas else np.array([], np.int64)
        li = li.astype(np.int64, copy=False)
        # static combine plan: sorted order + segment boundaries, so the
        # per-superstep fold is a single reduceat (no per-superstep sort)
        order = np.argsort(li, kind="stable")
        ls = li[order]
        starts = np.flatnonzero(np.concatenate([[True], ls[1:] != ls[:-1]])) if len(ls) else ls
        uniq_local = ls[starts] if len(ls) else ls
        return {"order": order, "starts": starts, "uniq_local": uniq_local}

    def init(self, csr, cache) -> dict:
        ids = np.arange(csr.part, csr.n_vertices, csr.n_parts, dtype=np.uint64)
        return {"label": ids}

    def scatter(self, csr, state, cache) -> list:
        bounds, local = cache
        if csr.n_edges == 0:
            empty = np.array([], np.uint64)
            return [empty for _ in range(csr.n_parts)]
        lab_edge = state["label"][csr.row_by_dst]
        mins = np.minimum.reduceat(lab_edge, csr.dst_seg_starts)
        return [mins[a:b] for a, b in bounds]

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        old = state["label"]
        lab = np.concatenate(payloads)
        new = old.copy()
        if len(lab):
            mins = np.minimum.reduceat(lab[recv["order"]], recv["starts"])
            ul = recv["uniq_local"]
            new[ul] = np.minimum(new[ul], mins)
        changed = int((new != old).sum())
        state["label"] = new
        return {"n_changed": changed}


class _CcJumpProgram(_CcProgram):
    """Min-hook + pointer-jumping CC: O(log n) supersteps, not O(diameter).

    Web graphs have long chains (redirect ladders, pagination trails), so
    pure min-label propagation pays diameter-many rounds. This program
    interleaves the static-route edge-min superstep (``_mode='edge'``,
    inherited) with label-forest shortcutting ``f[v] <- f[f[v]]``, the
    Shiloach-Vishkin / pointer-doubling step that halves every chain per
    application. The shortcut needs a value owned by another partition, so
    it runs as a two-superstep request/reply exchange with DYNAMIC routes
    (each partition asks the owners of its distinct current labels):

    - ``_mode='req'``: scatter ships ``unique(label)`` split by owner
      partition (``parent %% P``); gather stores the incoming queries.
    - ``_mode='reply'``: scatter answers each stored query array with the
      owners' current labels (order-preserving); gather folds
      ``label = min(label, label[label])`` via one searchsorted lookup
      and flips back to ``'req'``.

    Monotonicity keeps it exact: labels start at the vertex id, only ever
    decrease via mins over same-component ids, and the component minimum
    is a fixed point — so an edge superstep with zero changes certifies
    the same (id, min-id component) output as plain propagation.

    The driver owns phase switches (``BspEngine.broadcast_state``): one
    edge step, then req/reply pairs until no label changes, repeated until
    the edge step itself is a no-op.
    """

    def scatter(self, csr, state, cache) -> list:
        mode = state.get("_mode", "edge")
        if mode == "edge":
            return super().scatter(csr, state, cache)
        p = csr.n_parts
        f = state["label"]
        if mode == "req":
            parents = np.unique(f) if len(f) else np.array([], np.uint64)
            owner = (parents % np.uint64(p)).astype(np.int64)
            reqs = [parents[owner == r] for r in range(p)]
            state["_reqs"] = reqs
            return reqs
        # mode == "reply": answer the stored queries (vertex ids we own)
        pp = np.uint64(p)
        return [
            f[((q // pp)).astype(np.int64)] if len(q) else np.array([], np.uint64)
            for q in state["_inc"]
        ]

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        mode = state.get("_mode", "edge")
        if mode == "edge":
            return super().gather_apply(csr, state, payloads, cache, recv)
        if mode == "req":
            state["_inc"] = [np.asarray(x, np.uint64) for x in payloads]
            state["_mode"] = "reply"
            return {"n_changed": 0}
        # reply: payloads[r] answers state["_reqs"][r] positionally
        state["_mode"] = "req"
        old = state["label"]
        keys = np.concatenate(state["_reqs"]) if state["_reqs"] else np.array([], np.uint64)
        vals = np.concatenate([np.asarray(x, np.uint64) for x in payloads])
        if len(old) == 0 or len(keys) == 0:
            return {"n_changed": 0}
        order = np.argsort(keys, kind="stable")
        pos = np.searchsorted(keys[order], old)
        new = np.minimum(old, vals[order][pos])
        changed = int((new != old).sum())
        state["label"] = new
        return {"n_changed": changed}


class ConnectedComponents(BaseClass):
    """``ConnectedComponents().fit(g)`` sets ``components_``: a Dataset of
    (id, component, component_size) in original key space, plus
    ``n_components_`` and ``n_iter_`` (supersteps run).

    ``pointer_jumping=True`` (default) runs the O(log n)-superstep
    min-hook + shortcut program (:class:`_CcJumpProgram`); ``False`` keeps
    pure min-label propagation (O(diameter) supersteps). Identical exact
    output either way."""

    def __init__(
        self,
        max_iter: int = 200,
        n_parts: int | None = None,
        workdir: str | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 5,
        resume: bool = False,
        actor_num_cpus: float | None = None,
        pointer_jumping: bool = True,
    ):
        self.max_iter = max_iter
        self.n_parts = n_parts
        self.workdir = workdir
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.resume = resume
        self.actor_num_cpus = actor_num_cpus
        self.pointer_jumping = pointer_jumping

    def fit(self, g) -> "ConnectedComponents":
        from ray.data.aggregate import Count

        from mercury_graph_ray.state.checkpoint import CheckpointManager

        vd, gas = prepare(g, symmetrize=True, n_parts=self.n_parts, workdir=self.workdir)
        program = _CcJumpProgram() if self.pointer_jumping else _CcProgram()
        engine = BspEngine(gas, program, actor_num_cpus=self.actor_num_cpus)

        ckpt = None
        if self.checkpoint_dir:
            ckpt = CheckpointManager(
                self.checkpoint_dir, "cc", fingerprint={"n": gas.n, "p": gas.p}
            )
        start_iter = 0
        converged = False
        if ckpt and self.resume:
            found = ckpt.latest()
            if found is not None:
                start_iter, manifest = found
                engine.load_checkpoint(ckpt, start_iter)
                m = manifest.get("metrics", {})
                converged = bool(m.get("converged", False)) or m.get("n_changed") == 0

        def _run(fn) -> int:
            return int(sum(m["n_changed"] for m in fn()))

        it = start_iter
        if not converged and not self.pointer_jumping:
            for it in range(start_iter + 1, self.max_iter + 1):
                n_changed = _run(engine.superstep)
                if ckpt and (it % self.checkpoint_every == 0):
                    engine.save_checkpoint(ckpt, it, {"n_changed": n_changed, "n_iter": it})
                if n_changed == 0:
                    converged = True
                    break
        elif not converged:
            # phase loop: one edge-min superstep; if it changed anything,
            # shortcut with req/reply pairs until the jump is a no-op;
            # repeat. An edge step with zero changes certifies the exact
            # min-label fixed point (see _CcJumpProgram).
            last_ckpt = start_iter
            while it < self.max_iter:
                engine.broadcast_state(_mode="edge")
                it += 1
                edge_changed = _run(engine.superstep)
                # edge-step states are the resumable points of the phase
                # loop, but the checkpoint_every contract still bounds the
                # full-state write frequency (the write is all P actors
                # rewriting their label vectors — it must not eat the
                # O(log n) superstep win)
                if ckpt and (it - last_ckpt >= self.checkpoint_every):
                    engine.save_checkpoint(
                        ckpt, it, {"n_changed": edge_changed, "n_iter": it}
                    )
                    last_ckpt = it
                if edge_changed == 0:
                    converged = True
                    break
                engine.broadcast_state(_mode="req")
                while it + 2 <= self.max_iter:
                    it += 1
                    engine.superstep()  # request: ship distinct labels
                    it += 1
                    if _run(engine.superstep) == 0:  # reply: apply f[f[v]]
                        break
        if not converged:
            raise RuntimeError(
                f"connected components did not converge in {self.max_iter} supersteps"
            )
        if ckpt:
            engine.save_checkpoint(ckpt, it, {"n_changed": 0, "n_iter": it, "converged": True})
        self.n_iter_ = it

        import pyarrow as pa

        from mercury_graph_ray.stages.util import ensure_schema

        state = engine.state_dataset()
        engine.shutdown()
        # int64 label: Ray groupby outputs int64 keys; ensure_schema also
        # scrubs schema-less empty blocks that would break later joins.
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
