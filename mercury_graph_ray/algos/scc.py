"""Strongly connected components — FW-BW min-color peeling on the BSP engine.

Not in the reference (beyond-ref, SURVEY.md §2.11): the reference's
connected components are undirected only, but the web graph the north
star targets is DIRECTED and its SCC structure (the bowtie: giant core,
IN/OUT tendrils) is a standard link-graph analysis. Semantics are frozen
for exact verification: ``scc(v) = min vertex id among v's mutual-reach
set`` (nx.strongly_connected_components parity; the SQL oracle computes
the same label from a transitive closure).

Algorithm (Orzan-style coloring, a BSP-friendly FW-BW):

- **forward phase**: every ACTIVE vertex starts colored with its own vid;
  colors propagate along forward edges to a fixpoint, so
  ``f(v) = min id of an active vertex that can reach v``. Same static
  forward route + per-destination ``minimum.reduceat`` pre-combine as
  connected components — masked to active vertices by a max-uint64
  sentinel.
- **backward phase**: roots are vertices with ``f(r) == r``; the reached
  flag propagates along REVERSE edges restricted to the root's color
  class. The reverse exchange reuses the HITS trick: the one-time
  forward-route metas are exactly the reverse route, so destination
  owners ship their (f, reached) values back along the transposed static
  route and the sender folds them over its dst-major edge layout — no
  extra routing state.
- **settle**: reached vertices belong to their root's SCC exactly
  (a color class IS one whole SCC plus forward-only hangers-on that the
  backward pass excludes — see the invariant below); they record
  ``scc = f`` and deactivate; remaining vertices reset color and repeat.

Invariant making the label exact: if v settles with color r then v ⇝ r
(backward reach) and r ⇝ v (color), so r ∈ SCC(v); every member w of
SCC(v) shares the color (an outside smaller ancestor of w would also be
an ancestor of r, contradicting f(r) = r), and no member is smaller than
r (it would be an ancestor of r). So a settled class = one SCC labeled
by its minimum member.

Phases peel at least one SCC layer of the condensation each round
(every source SCC of the remaining condensation is a root class), so the
phase count is bounded by the condensation depth — small on real link
graphs; ``max_iter`` bounds the total superstep budget either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram, dest_partition_slices

_SENT = np.uint64(0xFFFFFFFFFFFFFFFF)


class _SccProgram(VertexProgram):
    state_columns = ("f", "scc", "active", "reached")

    def prepare(self, csr):
        bounds, local = dest_partition_slices(csr)
        seg_len = np.diff(np.append(csr.dst_seg_starts, csr.n_edges)).astype(np.int64)
        return bounds, local, seg_len

    def scatter_meta(self, csr, cache):
        bounds, local, seg_len = cache
        return local

    def prepare_recv(self, csr, cache, metas):
        per_sender = [
            (m if m is not None else np.array([], np.int64)).astype(np.int64, copy=False)
            for m in metas
        ]
        li = np.concatenate(per_sender) if per_sender else np.array([], np.int64)
        # static fold plan for the forward-min combine (CC's pattern)
        order = np.argsort(li, kind="stable")
        ls = li[order]
        starts = (
            np.flatnonzero(np.concatenate([[True], ls[1:] != ls[:-1]])) if len(ls) else ls
        )
        uniq_local = ls[starts] if len(ls) else ls
        return {
            "order": order,
            "starts": starts,
            "uniq_local": uniq_local,
            "per_sender": per_sender,
        }

    def init(self, csr, cache) -> dict:
        ids = np.arange(csr.part, csr.n_vertices, csr.n_parts, dtype=np.uint64)
        return {
            "ids": ids,
            "f": ids.copy(),
            "scc": np.full(csr.n_local, _SENT, np.uint64),
            "active": np.ones(csr.n_local, bool),
            "reached": np.zeros(csr.n_local, bool),
            "_mode": "fwd",
        }

    def scatter(self, csr, state, cache) -> list:
        bounds, local, seg_len = cache
        p = csr.n_parts
        mode = state["_mode"]
        if mode == "settle":
            return [None for _ in range(p)]
        if mode == "fwd":
            if csr.n_edges == 0:
                empty = np.array([], np.uint64)
                return [empty for _ in range(p)]
            row = csr.row_by_dst
            vals = np.where(state["active"][row], state["f"][row], _SENT)
            mins = np.minimum.reduceat(vals, csr.dst_seg_starts)
            return [mins[a:b] for a, b in bounds]
        # bwd: the root flag is seeded at the mode switch (driver sets
        # _init_bwd=True via broadcast_state)
        if state.pop("_init_bwd", False):
            state["reached"] = state["active"] & (state["f"] == state["ids"])
        f, reached = state["f"], state["reached"]
        return [
            (f[m], reached[m]) for m in state["__recv_per_sender"]
        ]

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        bounds, local, seg_len = cache
        if "__recv_per_sender" not in state:
            state["__recv_per_sender"] = recv["per_sender"]
        mode = state["_mode"]
        if mode == "fwd":
            f, active = state["f"], state["active"]
            lab = (
                np.concatenate(payloads)
                if payloads and csr.n_parts > 0
                else np.array([], np.uint64)
            )
            changed = 0
            if len(lab):
                mins = np.minimum.reduceat(lab[recv["order"]], recv["starts"])
                ul = recv["uniq_local"]
                upd = active[ul] & (mins < f[ul])
                changed = int(upd.sum())
                f[ul[upd]] = mins[upd]
            return {"n_changed": changed}
        if mode == "bwd":
            f, active, reached = state["f"], state["active"], state["reached"]
            if csr.n_edges == 0:
                return {"n_changed": 0}
            f_w = np.concatenate([pl[0] for pl in payloads])
            r_w = np.concatenate([pl[1] for pl in payloads])
            row = csr.row_by_dst
            f_edge = np.repeat(f_w, seg_len)
            r_edge = np.repeat(r_w, seg_len)
            cand = r_edge & (f_edge == f[row]) & active[row] & ~reached[row]
            if not cand.any():
                return {"n_changed": 0}
            upd = np.zeros(csr.n_local, bool)
            upd[row[cand]] = True
            upd &= ~reached
            reached |= upd
            return {"n_changed": int(upd.sum())}
        # settle: reached vertices record their SCC and leave the game;
        # survivors reset color for the next forward phase
        f, active, reached = state["f"], state["active"], state["reached"]
        sel = active & reached
        state["scc"][sel] = f[sel]
        active[sel] = False
        n_settled = int(sel.sum())
        f[active] = state["ids"][active]
        reached[:] = False
        return {"n_settled": n_settled, "n_active": int(active.sum())}


class StronglyConnectedComponents(BaseClass):
    """``StronglyConnectedComponents().fit(g)`` sets ``components_``:
    a Dataset of (id, scc, scc_size) in original key space — ``scc`` is
    the minimum member key of the vertex's strongly connected component —
    plus ``n_components_``, ``n_iter_`` (total supersteps) and
    ``n_phases_`` (FW-BW peel rounds)."""

    def __init__(
        self,
        max_iter: int = 10_000,
        n_parts: int | None = None,
        workdir: str | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        resume: bool = False,
        actor_num_cpus: float | None = None,
    ):
        self.max_iter = max_iter
        self.n_parts = n_parts
        self.workdir = workdir
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every  # in PHASES (peel rounds)
        self.resume = resume
        self.actor_num_cpus = actor_num_cpus

    def fit(self, g) -> "StronglyConnectedComponents":
        from ray.data.aggregate import Count

        from mercury_graph_ray.stages.join import hash_join
        from mercury_graph_ray.stages.util import ensure_schema
        from mercury_graph_ray.state.checkpoint import CheckpointManager

        if not g.directed:
            raise ValueError(
                "SCC is a directed-graph operation; use ConnectedComponents "
                "for undirected graphs"
            )
        vd, gas = prepare(g, symmetrize=False, n_parts=self.n_parts, workdir=self.workdir)
        engine = BspEngine(gas, _SccProgram(), actor_num_cpus=self.actor_num_cpus)

        # checkpoints land on PHASE boundaries (after settle), where
        # reached is all-False and _mode resets to 'fwd' — the whole
        # phase-loop state is then exactly the persisted state_columns
        ckpt = None
        if self.checkpoint_dir:
            ckpt = CheckpointManager(
                self.checkpoint_dir, "scc", fingerprint={"n": gas.n, "p": gas.p}
            )
        it = 0
        phases = 0
        n_active = gas.n
        if ckpt and self.resume:
            found = ckpt.latest()
            if found is not None:
                t, manifest = found
                engine.load_checkpoint(ckpt, t)
                m = manifest.get("metrics", {})
                it = t
                phases = int(m.get("phase", 0))
                n_active = int(m.get("n_active", n_active))

        def _run() -> int:
            return int(sum(m.get("n_changed", 0) for m in engine.superstep()))

        def _to_fixpoint(mode: str, **kv) -> None:
            nonlocal it
            engine.broadcast_state(_mode=mode, **kv)
            while it < self.max_iter:
                it += 1
                if _run() == 0:
                    return
            engine.shutdown()
            raise RuntimeError(
                f"SCC did not finish in {self.max_iter} supersteps "
                f"(budget ended during the {mode} pass of phase {phases})"
            )

        while n_active > 0:
            phases += 1
            _to_fixpoint("fwd")
            _to_fixpoint("bwd", _init_bwd=True)
            engine.broadcast_state(_mode="settle")
            it += 1
            metrics = engine.superstep()
            n_settled = sum(m["n_settled"] for m in metrics)
            n_active = sum(m["n_active"] for m in metrics)
            if n_settled == 0 and n_active > 0:  # pragma: no cover - safety
                engine.shutdown()
                raise RuntimeError("SCC made no progress (bug): active vertices remain")
            if ckpt and (phases % self.checkpoint_every == 0 or n_active == 0):
                engine.save_checkpoint(
                    ckpt,
                    it,
                    {
                        "phase": phases,
                        "n_active": n_active,
                        "n_settled": n_settled,
                        "converged": n_active == 0,
                    },
                )
        self.n_iter_ = it
        self.n_phases_ = phases

        state = engine.state_dataset()
        engine.shutdown()
        labels = ensure_schema(
            state.select_columns(["id", "scc"]),
            {"id": pa.uint64(), "scc": pa.uint64()},
        )
        sizes = ensure_schema(
            labels.groupby("scc").aggregate(Count(alias_name="scc_size")),
            {"scc": pa.uint64(), "scc_size": pa.int64()},
        )
        self.n_components_ = sizes.count()
        joined = hash_join(labels, sizes, on=("scc",), num_buckets=max(2, gas.p))
        out = vd.decode(joined, col="id")
        out = vd.decode(out, col="scc")
        self.components_ = out.select_columns(["id", "scc", "scc_size"])
        return self
