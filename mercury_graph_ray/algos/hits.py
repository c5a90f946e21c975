"""HITS (hubs & authorities) on the BSP engine — beyond-reference op.

The reference has no HITS (SURVEY.md §2.11 beyond-reference family); the
semantics here are frozen so a fixed-iteration DuckDB unroll can verify
the run exactly:

- init: hub = 1/N for every vertex, authority = 0;
- per iteration (weighted, directed):
    authority_i = Σ_{j→i} w_ji · hub_j,   then authority ← authority / Σ authority
    hub_j       = Σ_{j→i} w_ji · authority_i, then hub ← hub / Σ hub
  (L1 normalization — a plain SQL ``sum``, unlike the L2 norm);
- exactly ``max_iter`` iterations (2·max_iter supersteps), no stopping
  rule: a fixed count is what makes the dataflow a pure deterministic
  function that the unrolled oracle reproduces to ~1e-13.

Execution: each HITS iteration is two BSP supersteps on the SAME static
routes PageRank uses (stages/bsp.py):

- **authority phase** — forward exchange, identical shape to PageRank's
  scatter: per-unique-destination ``np.add.reduceat`` sums of
  ``hub · weight`` over the dst-major layout, contiguous per-partition
  payload slices;
- **hub phase** — reverse exchange with ZERO extra routing state: the
  one-time ``scatter_meta`` arrays (each sender's destination row ids on
  the receiver) are exactly the values the destination owner must send
  back, so the authority values return along the transposed route and the
  hub update is one ``np.repeat`` + ``bincount`` over the dst-major edges.

Normalization is driver-coordinated but scalar-only: each gather returns
its partition's raw L1 mass partial, the driver sums P floats and
broadcasts the scale, and the next scatter applies it in place — no
vertex data ever moves through the driver.
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram, dest_partition_slices


class _HitsProgram(VertexProgram):
    state_columns = ("authority", "hub")

    def __init__(self, n: int, payload_dtype=np.float32):
        self.n = n
        self.payload_dtype = np.dtype(payload_dtype)

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
        li = (
            np.concatenate(per_sender) if per_sender else np.array([], np.int64)
        )
        return li, per_sender

    def init(self, csr, cache) -> dict:
        return {
            "hub": np.full(csr.n_local, 1.0 / self.n, np.float64),
            "authority": np.zeros(csr.n_local, np.float64),
            "phase": 0,
        }

    def _apply_pending(self, state, key, vec_key):
        s = state.pop(key, None)
        if s is not None and s > 0:
            state[vec_key] = state[vec_key] / s

    def scatter(self, csr, state, cache) -> list:
        bounds, local, seg_len = cache
        phase = state["phase"]
        state["phase"] = phase + 1
        if phase % 2 == 0:
            # authority phase: forward hub·w sums per unique destination
            self._apply_pending(state, "hub_scale", "hub")
            h = state["hub"]
            if csr.n_edges:
                sums = np.add.reduceat(
                    h[csr.row_by_dst] * csr.weight_by_dst, csr.dst_seg_starts
                )
            else:
                sums = np.zeros(0, np.float64)
            if self.payload_dtype != np.float64:
                sums = sums.astype(self.payload_dtype)
            return [(0, sums[a:b]) for a, b in bounds]
        # hub phase: return normalized authority values along the
        # transposed static route (sender q owns the authorities; the
        # index arrays are the metas the receivers shipped at setup)
        self._apply_pending(state, "auth_scale", "authority")
        a = state["authority"]
        if self.payload_dtype != np.float64:
            a = a.astype(self.payload_dtype)
        # __recv_per_sender was stashed by the first gather_apply (the
        # engine passes recv only to gather); the first hub-phase scatter
        # always runs after at least one authority-phase gather
        return [(1, a[m]) for m in state["__recv_per_sender"]]

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        bounds, local, seg_len = cache
        li, per_sender = recv
        if "__recv_per_sender" not in state:
            # scatter needs the per-sender reverse-route index arrays;
            # they arrive via prepare_recv on the receiving side
            state["__recv_per_sender"] = per_sender
        n_local = csr.n_local
        tag = payloads[0][0] if payloads else 0
        vals = [p[1] for p in payloads]
        if tag == 0:
            c = (
                np.concatenate(vals).astype(np.float64)
                if vals
                else np.zeros(0, np.float64)
            )
            auth = (
                np.bincount(li, weights=c, minlength=n_local)
                if len(c)
                else np.zeros(n_local, np.float64)
            )
            state["authority"] = auth
            return {"mass": float(auth.sum())}
        a_uniq = (
            np.concatenate(vals).astype(np.float64)
            if vals
            else np.zeros(0, np.float64)
        )
        if csr.n_edges:
            a_edge = np.repeat(a_uniq, seg_len)
            hub = np.bincount(
                csr.row_by_dst,
                weights=csr.weight_by_dst * a_edge,
                minlength=n_local,
            )
        else:
            hub = np.zeros(n_local, np.float64)
        state["hub"] = hub
        return {"mass": float(hub.sum())}


class Hits(BaseClass):
    """``Hits(max_iter=20).fit(g)`` sets ``hits_`` (Dataset of id,
    authority, hub — each column L1-normalized) and ``n_iter_``."""

    def __init__(
        self,
        max_iter: int = 20,
        n_parts: int | None = None,
        workdir: str | None = None,
        payload_dtype: str = "float32",
    ):
        self.max_iter = max_iter
        self.n_parts = n_parts
        self.workdir = workdir
        self.payload_dtype = payload_dtype

    def fit(self, g) -> "Hits":
        vd, gas = prepare(
            g, symmetrize=not g.directed, n_parts=self.n_parts, workdir=self.workdir
        )
        n = gas.n
        engine = BspEngine(gas, _HitsProgram(n, payload_dtype=self.payload_dtype))
        hub_scale = 1.0
        for _ in range(self.max_iter):
            m = engine.superstep()  # authority phase
            s_a = float(sum(x["mass"] for x in m))
            engine.broadcast_state(auth_scale=s_a if s_a > 0 else 1.0)
            m = engine.superstep()  # hub phase
            hub_scale = float(sum(x["mass"] for x in m))
            engine.broadcast_state(hub_scale=hub_scale if hub_scale > 0 else 1.0)

        raw = engine.state_dataset().select_columns(["id", "authority", "hub"])
        # the final hub normalization is pending (it is applied lazily in
        # the NEXT scatter, which never runs) — same IEEE op, done here
        inv = hub_scale if hub_scale > 0 else 1.0

        def _norm(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            return t.set_column(
                t.schema.get_field_index("hub"),
                "hub",
                pc.divide(t["hub"], pa.scalar(inv, pa.float64())),
            )

        raw = raw.map_batches(_norm, batch_format="pyarrow")
        self.n_iter_ = self.max_iter
        self.hits_ = vd.decode(raw)
        engine.shutdown()
        return self
