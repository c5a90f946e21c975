"""k-core decomposition (fixed k) — distributed peeling on the BSP engine.

Not in the reference (beyond-ref, SURVEY.md §2.11). The k-core is the
maximal subgraph of the simple undirected graph in which every vertex has
degree >= k (nx.k_core oracle). Peeling as a vertex program on the
persistent partition actors (stages/bsp.py — the same executor PageRank /
CC / LPA use, chosen over a Dataset join loop because each peel round is
otherwise 3 shuffle jobs whose fixed launch cost dwarfs the kernel):

- state per local vertex: remaining degree ``deg`` and a ``dead`` flag;
  a vertex dies the round its degree drops below k.
- superstep: every NEWLY dead vertex sends a decrement along each of its
  edges. scatter pre-combines per unique destination with one dst-major
  ``add.reduceat`` (the hub-splitting partial: a 10^9-degree hub receives
  at most P partial counts), then ships only the NONZERO (local row,
  count) pairs — payloads are proportional to the round's deaths, not to
  E, so quiet late rounds cost almost nothing on the wire.
- gather folds the decrements with one bincount, kills vertices that fell
  below k, and returns the scalar death count; the driver loops until a
  round kills nobody (then no announcements are pending and every
  surviving endpoint has residual degree >= k — the k-core).

Rounds are O(peel depth): the longest chain of cascading removals, small
on real link graphs (a handful of sweeps); adversarial chains (a path
graph peels one layer per round) are bounded by ``max_iter``.

The graph is the SIMPLE undirected graph: ``algos.common.simple_pairs``
(self-loops dropped, duplicate/reverse edges collapsed — shared/cached
with TriangleCount / LinkPrediction over the same Graph), symmetrized in
vid space into its own cached CSR (``gas_simple``).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pyarrow as pa

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import DEFAULT_N_PARTS, simple_pairs
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram, dest_partition_slices


def simple_gas(g, n_parts: int, workdir: str | None = None):
    """GasGraph over the symmetrized SIMPLE graph (canonical pairs from
    ``simple_pairs`` emitted in both directions, weight 1), cached on the
    Graph facade so KCore runs over the same Graph share one CSR build."""
    from mercury_graph_ray.stages.gas import GasGraph

    key = ("gas_simple", n_parts, workdir)
    if key in g._cache:
        return g._cache[key]
    vd, canon, _ = simple_pairs(g)

    def _both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
                "weight": pa.array(np.ones(2 * len(a), np.float64)),
            }
        )

    enc = canon.map_batches(_both_dirs, batch_format="pyarrow")
    if workdir is None:
        workdir = tempfile.mkdtemp(prefix=f"gas_simple{n_parts}_", dir="/tmp")
    gas = GasGraph.build(enc, vd.n, n_parts, workdir)
    g._cache[key] = gas
    return gas


class _KCoreProgram(VertexProgram):
    state_columns = ("deg", "dead", "newly")

    def __init__(self, k: int):
        self.k = k

    def prepare(self, csr):
        return dest_partition_slices(csr)

    def init(self, csr, cache) -> dict:
        deg = np.diff(csr.indptr).astype(np.int64)  # simple symmetric graph
        newly = deg < self.k
        return {"deg": deg, "dead": newly.copy(), "newly": newly}

    def scatter(self, csr, state, cache) -> list:
        bounds, local = cache
        p = csr.n_parts
        newly = state["newly"]
        if csr.n_edges == 0 or not newly.any():
            e = np.array([], np.int64)
            return [(e, e) for _ in range(p)]
        # per-unique-dst count of newly dead in-neighbors (dst-major
        # reduceat), shipped sparsely: only destinations that lost an edge
        counts = np.add.reduceat(
            newly[csr.row_by_dst].astype(np.int64), csr.dst_seg_starts
        )
        out = []
        for (a, b), loc in zip(bounds, local):
            s = counts[a:b]
            nz = np.flatnonzero(s)
            out.append((loc[nz], s[nz]))
        return out

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        deg, dead = state["deg"], state["dead"]
        idxs = [pl[0] for pl in payloads if len(pl[0])]
        if idxs:
            idx = np.concatenate(idxs)
            cnt = np.concatenate([pl[1] for pl in payloads if len(pl[0])])
            deg = deg - np.bincount(idx, weights=cnt, minlength=len(deg)).astype(np.int64)
        newly = (~dead) & (deg < self.k)
        state["deg"] = deg
        state["dead"] = dead | newly
        state["newly"] = newly
        return {"n_died": int(newly.sum())}


class _CoreNumbersProgram(VertexProgram):
    """Iterated h-index (Lü et al. 2016): c_0(v) = deg(v);
    c_{t+1}(v) = H({c_t(u) : u ∈ N(v)}) where H is the h-index (the
    largest h with at least h neighbor values ≥ h). The sequence is
    monotone non-increasing and its fixpoint is exactly the core number
    of every vertex — the FULL k-core decomposition in one run.

    h-index is not an associative reduce, so the exchange carries
    PER-EDGE values — but DELTA-GATED (VERDICT r3 #3, the same
    sparse-payload discipline as KCore's death decrements): each
    superstep a sender ships (edge-offset-within-route int64, new value
    int32) pairs ONLY for edges whose source h-value changed last round
    (round 1 ships everything — every value "changed" from undefined).
    The receiver holds a persistent per-edge value image ``cv`` plus its
    clipped histogram, updates both incrementally from the sparse
    deltas, and re-derives the h-index from the histogram: one global
    reverse-cumsum for segmented suffix counts, one reduceat of the
    monotone condition ``suffix(h) >= h`` — the h-index is
    (#true positions − 1). Wire traffic is proportional to the round's
    CHANGES (late rounds near-free); receiver compute stays O(local E)
    vectorized, no Python loop. The one-time meta exchange ships each
    route's per-edge destination rows so all of this is static-planned.
    """

    state_columns = ("core",)

    def prepare(self, csr):
        E = csr.n_edges
        U = len(csr.uniq_dst)
        seg_len = np.diff(np.append(csr.dst_seg_starts, E)).astype(np.int64)
        # per-edge destination local row, dst-major order, sliced per
        # destination partition by EDGE ranges (contiguous: uniq_dst is
        # grouped by owner partition)
        per_edge_local = (csr.uniq_dst // np.uint64(csr.n_parts)).astype(np.int64)
        per_edge_local = np.repeat(per_edge_local, seg_len)
        us = csr.uniq_part_starts
        edge_bounds = []
        for q in range(csr.n_parts):
            a = int(csr.dst_seg_starts[us[q]]) if us[q] < U else E
            b = int(csr.dst_seg_starts[us[q + 1]]) if us[q + 1] < U else E
            edge_bounds.append((a, b))
        # per-route sender plan: edges of the route grouped by SOURCE
        # local row (ord: route-relative offsets sorted by row; indptr:
        # row -> offset range), so a delta scatter touches only the
        # changed rows' edges — O(changed edges), not O(E)
        n_local = csr.n_local
        send = []
        for a, b in edge_bounds:
            rows = csr.row_by_dst[a:b]
            ordq = np.argsort(rows, kind="stable").astype(np.int64)
            cnt = np.bincount(rows, minlength=n_local).astype(np.int64)
            indptr = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int64)
            send.append((ordq, indptr))
        return {
            "edge_bounds": edge_bounds,
            "per_edge_local": per_edge_local,
            "send": send,
        }

    def scatter_meta(self, csr, cache):
        pel = cache["per_edge_local"]
        return [pel[a:b] for a, b in cache["edge_bounds"]]

    def prepare_recv(self, csr, cache, metas):
        per_sender = [
            (m if m is not None else np.array([], np.int64)).astype(np.int64, copy=False)
            for m in metas
        ]
        # global incoming-edge index = sender_base[s] + route-relative offset
        sender_base = np.concatenate(
            [[0], np.cumsum([len(m) for m in per_sender])]
        ).astype(np.int64)
        li_e = np.concatenate(per_sender) if per_sender else np.array([], np.int64)
        n_local = csr.n_local
        deg = np.bincount(li_e, minlength=n_local).astype(np.int64)
        hist_offset = np.concatenate([[0], np.cumsum(deg + 1)]).astype(np.int64)
        total = int(hist_offset[-1])
        seg_base_e = hist_offset[li_e]  # histogram segment base per edge
        # static per-flat-position row id and in-segment position
        row_of_pos = np.repeat(np.arange(n_local, dtype=np.int64), deg + 1)
        pos_in_seg = np.arange(total, dtype=np.int64) - hist_offset[row_of_pos]
        # persistent per-edge value image + its clipped histogram; every
        # edge starts at value 0 (round 1 ships a full delta that moves
        # each edge to its true slot)
        cv = np.zeros(len(li_e), np.int64)
        hist = np.bincount(seg_base_e, minlength=total).astype(np.int64)
        return {
            "sender_base": sender_base,
            "seg_base_e": seg_base_e,
            "degclip_e": deg[li_e],
            "hist_offset": hist_offset,
            "row_of_pos": row_of_pos,
            "pos_in_seg": pos_in_seg,
            "cv": cv,
            "hist": hist,
        }

    def init(self, csr, cache) -> dict:
        return {"core": np.diff(csr.indptr).astype(np.int64)}

    def scatter(self, csr, state, cache) -> list:
        c = state["core"]
        n_local = csr.n_local
        changed = state.get("_changed")  # None on round 1 -> ship everything
        rows = (
            np.arange(n_local, dtype=np.int64)
            if changed is None
            else np.flatnonzero(changed)
        )
        out = []
        for ordq, indptr in cache["send"]:
            starts = indptr[rows]
            lens = indptr[rows + 1] - starts
            total = int(lens.sum())
            if total == 0:
                out.append((np.array([], np.int64), np.array([], np.int32)))
                continue
            # ragged take: route-relative offsets of the selected rows' edges
            base = np.repeat(np.cumsum(lens) - lens, lens)
            idx = np.repeat(starts, lens) + (np.arange(total, dtype=np.int64) - base)
            out.append((ordq[idx], np.repeat(c[rows], lens).astype(np.int32)))
        return out

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        c = state["core"]
        n_local = len(c)
        if n_local == 0:
            return {"n_changed": 0}
        offs_parts, vals_parts = [], []
        for s, p in enumerate(payloads):
            if p is None:
                continue
            off, val = p
            if len(off):
                offs_parts.append(off + recv["sender_base"][s])
                vals_parts.append(val)
        hist = recv["hist"]
        if offs_parts:
            offs = np.concatenate(offs_parts)
            nv = np.minimum(
                np.concatenate(vals_parts).astype(np.int64), recv["degclip_e"][offs]
            )
            old = recv["cv"][offs]
            slot = recv["seg_base_e"][offs]
            np.subtract.at(hist, slot + old, 1)
            np.add.at(hist, slot + nv, 1)
            recv["cv"][offs] = nv
        s_ = hist[::-1].cumsum()[::-1]
        s_pad = np.append(s_, 0)
        s_end = s_pad[recv["hist_offset"][1:]]  # suffix total of FOLLOWING segments
        within = s_ - s_end[recv["row_of_pos"]]
        cond = within >= recv["pos_in_seg"]
        h = np.add.reduceat(cond, recv["hist_offset"][:-1]) - 1
        chg = h != c
        state["_changed"] = chg  # next scatter ships only these rows' edges
        state["core"] = h.astype(np.int64)
        return {"n_changed": int(chg.sum())}


class CoreNumbers(BaseClass):
    """``CoreNumbers().fit(g)`` sets ``core_numbers_``: a Dataset of
    (id, core) — every vertex's core number (nx.core_number parity) —
    and ``n_iter_`` (h-index iterations to the fixpoint, including the
    certifying no-change one)."""

    def __init__(
        self,
        n_parts: int | None = None,
        max_iter: int = 10_000,
        workdir: str | None = None,
        actor_num_cpus: float | None = None,
    ):
        self.n_parts = n_parts or DEFAULT_N_PARTS
        self.max_iter = max_iter
        self.workdir = workdir
        self.actor_num_cpus = actor_num_cpus

    def fit(self, g) -> "CoreNumbers":
        from mercury_graph_ray.stages.util import ensure_schema

        vd, _, _ = simple_pairs(g)
        gas = simple_gas(g, self.n_parts, self.workdir)
        engine = BspEngine(
            gas, _CoreNumbersProgram(), actor_num_cpus=self.actor_num_cpus
        )
        it = 0
        converged = False
        while it < self.max_iter:
            it += 1
            if sum(m["n_changed"] for m in engine.superstep()) == 0:
                converged = True
                break
        state = engine.state_dataset()
        engine.shutdown()
        if not converged:
            raise RuntimeError(
                f"core numbers did not converge in {self.max_iter} h-index iterations"
            )
        self.n_iter_ = it
        out = ensure_schema(
            state.select_columns(["id", "core"]),
            {"id": pa.uint64(), "core": pa.int64()},
        )
        self.core_numbers_ = vd.decode(out, col="id")
        return self


class KCore(BaseClass):
    """``KCore(k).fit(g)`` sets ``core_`` (Dataset of original vertex keys
    in the k-core, column ``id``) and ``n_iter_`` (peel rounds run —
    the last round is the empty one that certifies the fixpoint)."""

    def __init__(
        self,
        k: int,
        n_parts: int | None = None,
        max_iter: int = 10_000,
        workdir: str | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 5,
        resume: bool = False,
        actor_num_cpus: float | None = None,
    ):
        if k < 1:
            raise ValueError("k must be >= 1 (the 0-core is the whole vertex set)")
        self.k = k
        self.n_parts = n_parts or DEFAULT_N_PARTS
        self.max_iter = max_iter
        self.workdir = workdir
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.resume = resume
        self.actor_num_cpus = actor_num_cpus

    def fit(self, g) -> "KCore":
        import pyarrow.compute as pc

        from mercury_graph_ray.stages.util import ensure_schema
        from mercury_graph_ray.state.checkpoint import CheckpointManager

        vd, _, _ = simple_pairs(g)
        gas = simple_gas(g, self.n_parts, self.workdir)
        engine = BspEngine(
            gas, _KCoreProgram(self.k), actor_num_cpus=self.actor_num_cpus
        )
        # the persisted ``newly`` column carries the round's not-yet-
        # announced deaths, so a checkpoint taken after any round resumes
        # mid-cascade exactly
        ckpt = None
        if self.checkpoint_dir:
            ckpt = CheckpointManager(
                self.checkpoint_dir,
                "kcore",
                fingerprint={"n": gas.n, "p": gas.p, "k": self.k},
            )
        it = 0
        converged = False
        if ckpt and self.resume:
            found = ckpt.latest()
            if found is not None:
                it, manifest = found
                engine.load_checkpoint(ckpt, it)
                converged = bool(manifest.get("metrics", {}).get("converged", False))
        while not converged and it < self.max_iter:
            it += 1
            if sum(m["n_died"] for m in engine.superstep()) == 0:
                converged = True
            if ckpt and (it % self.checkpoint_every == 0 or converged):
                engine.save_checkpoint(ckpt, it, {"n_iter": it, "converged": converged})
        if not converged:
            engine.shutdown()
            raise RuntimeError(f"k-core peel did not finish in {self.max_iter} rounds")
        state = engine.state_dataset()
        engine.shutdown()
        self.n_iter_ = it

        def _alive(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["dead"], False)).select(["id"])

        alive = ensure_schema(
            state.map_batches(_alive, batch_format="pyarrow"), {"id": pa.uint64()}
        )
        # pin the decoded schema: an all-empty core (k above the graph's
        # degeneracy) otherwise reports schema() None (Ray empty-block
        # quirk) and loses the id column in to_pandas
        sch = vd.mapping.schema()
        key_type = dict(zip(sch.names, sch.types))["id"]
        self.core_ = ensure_schema(vd.decode(alive, col="id"), {"id": key_type})
        return self
