"""Maximal independent set — deterministic-priority Luby rounds on the
BSP engine.

Not in the reference (beyond-ref, SURVEY.md §2.11). A maximal independent
set of the simple undirected graph: no two members adjacent, and every
non-member has a member neighbor. Luby's algorithm with a DETERMINISTIC
priority in place of per-round randomness:

    prio(v) = ((vid(v)*A + B) mod M * A2 + B2) mod M     (M=2^31-1 prime)

where ``vid`` is the engine's dense vertex id — assigned by *value order*
of the distinct vertex keys (stages/ids.py), so in SQL it is exactly
``row_number() OVER (ORDER BY id) - 1`` and the whole algorithm unrolls
into an exact DuckDB oracle (the driver query ``mis_heavy_parts``). The
composed LCG is injective on [0, M) (each factor coprime to the prime
modulus), so priorities are collision free for graphs under 2^31
vertices and every round's join set is well defined; intermediate
products stay under 2^51, inside both int64 and SQL BIGINT.

Synchronous round t (one BSP superstep, states undecided/MIS/excluded):

1. exclusion: undecided vertices with a neighbor that joined in round
   t-1 become excluded;
2. join: still-undecided v joins the MIS iff prio(v) < min prio over its
   neighbors that were undecided at round start (a strict total order, so
   two adjacent vertices can never join in the same round).

The global minimum-priority undecided vertex always joins, so every
round makes progress; rounds are O(log n) with high probability for
LCG-dispersed priorities and bounded by ``max_iter`` regardless.

Scale shape (the KCore discipline, algos/kcore.py): one superstep per
round on the persistent partition actors; scatter computes per-unique-
destination [min undecided-neighbor prio] with one dst-major
``minimum.reduceat`` and [any newly-joined neighbor] with one
``add.reduceat``, then ships BOTH channels sparsely — only destinations
with at least one undecided (resp. newly joined) in-neighbor — so
late-round payloads shrink toward zero exactly like KCore's death
decrements. The driver moves scalars only.
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import DEFAULT_N_PARTS
from mercury_graph_ray.algos.kcore import simple_gas
from mercury_graph_ray.stages.bsp import BspEngine, VertexProgram, dest_partition_slices

PRIO_A = 1000003
PRIO_B = 12345
PRIO_A2 = 999983
PRIO_B2 = 54321
PRIO_M = 2147483647  # 2^31 - 1, prime
_INF = np.int64(2**62)


def lcg_priority(vids: np.ndarray) -> np.ndarray:
    """The SQL-reproducible priority permutation over dense vids.

    TWO composed LCG rounds: one round is monotone on inputs small
    enough that ``x*A + B`` never wraps (dense vids, small integer doc
    ids), which makes the "random" order just the id order; the second
    multiply re-disperses the already-M-sized first output. Each factor
    is coprime to the prime modulus, so the composition stays injective
    on [0, M); intermediate products stay under 2^51 (BIGINT-safe for
    the DuckDB replay)."""
    h = (vids.astype(np.int64) * PRIO_A + PRIO_B) % PRIO_M
    return (h * PRIO_A2 + PRIO_B2) % PRIO_M


class _MisProgram(VertexProgram):
    # status: 0 undecided, 1 in MIS, 2 excluded; newly: joined last round
    state_columns = ("status", "newly")

    def prepare(self, csr):
        return dest_partition_slices(csr)

    def init(self, csr, cache) -> dict:
        vids = np.arange(csr.part, csr.n_vertices, csr.n_parts, dtype=np.int64)
        return {
            "status": np.zeros(csr.n_local, np.int8),
            "newly": np.zeros(csr.n_local, bool),
            "prio": lcg_priority(vids),
        }

    def scatter(self, csr, state, cache) -> list:
        bounds, local = cache
        p = csr.n_parts
        if csr.n_edges == 0:
            e = np.array([], np.int64)
            return [(e, e, e) for _ in range(p)]
        undec = state["status"] == 0
        masked = np.where(undec, state["prio"], _INF)
        mins = np.minimum.reduceat(masked[csr.row_by_dst], csr.dst_seg_starts)
        ncnt = np.add.reduceat(
            state["newly"][csr.row_by_dst].astype(np.int64), csr.dst_seg_starts
        )
        out = []
        for (a, b), loc in zip(bounds, local):
            m = mins[a:b]
            fi = np.flatnonzero(m < _INF)  # sparse: undecided senders only
            nz = np.flatnonzero(ncnt[a:b])  # sparse: newly-joined senders only
            out.append((loc[fi], m[fi], loc[nz]))
        return out

    def gather_apply(self, csr, state, payloads, cache, recv) -> dict:
        status, prio = state["status"], state["prio"]
        n_local = csr.n_local
        minnbr = np.full(n_local, _INF, np.int64)
        excl = np.zeros(n_local, bool)
        for idx, mv, nidx in payloads:
            if len(idx):
                # idx rows are unique within one sender's payload (unique
                # destinations), so the fancy-index minimum is exact
                minnbr[idx] = np.minimum(minnbr[idx], mv)
            if len(nidx):
                excl[nidx] = True
        undec = status == 0
        newly_excl = undec & excl
        status[newly_excl] = 2
        join = undec & ~newly_excl & (prio < minnbr)
        status[join] = 1
        state["newly"] = join
        return {
            "n_joined": int(join.sum()),
            "n_excluded": int(newly_excl.sum()),
            "n_undecided": int((status == 0).sum()),
        }


class MaximalIndependentSet(BaseClass):
    """``MaximalIndependentSet().fit(g)`` sets ``mis_`` (Dataset of the
    member vertex ids), ``status_`` (Dataset of id, status with status
    1 = member / 2 = dominated) and ``n_iter_`` (Luby rounds run).

    Operates on the SIMPLE undirected graph (self-loops dropped,
    duplicate / reverse edges collapsed) via the shared cached CSR
    (``simple_gas``), like KCore / CoreNumbers."""

    def __init__(
        self,
        n_parts: int | None = None,
        max_iter: int = 200,
        workdir: str | None = None,
        actor_num_cpus: float | None = None,
    ):
        self.n_parts = n_parts
        self.max_iter = max_iter
        self.workdir = workdir
        self.actor_num_cpus = actor_num_cpus

    def fit(self, g) -> "MaximalIndependentSet":
        import pyarrow as pa

        n_parts = self.n_parts or DEFAULT_N_PARTS
        gas = simple_gas(g, n_parts, workdir=self.workdir)
        vd = g._cache["vertex_dict"]
        engine = BspEngine(
            gas, _MisProgram(), actor_num_cpus=self.actor_num_cpus
        )
        it = 0
        for it in range(1, self.max_iter + 1):
            metrics = engine.superstep()
            if sum(m["n_undecided"] for m in metrics) == 0:
                break
        else:
            engine.shutdown()
            raise RuntimeError(
                f"MIS did not settle in {self.max_iter} rounds"
            )
        self.n_iter_ = it
        state = engine.state_dataset().select_columns(["id", "status"])
        engine.shutdown()

        def _members(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(t["status"], 1)).select(["id"])

        self.status_ = vd.decode(state)
        self.mis_ = vd.decode(
            state.map_batches(_members, batch_format="pyarrow")
        )
        return self
