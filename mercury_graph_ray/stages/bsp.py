"""BSP superstep engine on persistent partition actors.

The Dataset-based GAS engine (stages/gas.py) runs one superstep as two
``groupby().map_groups`` shuffles — correct and fully streaming, but each
superstep pays two Ray Data job launches plus a materialize barrier
(~0.35-1 s in local mode), which dwarfs the ~50 ms of kernel time at test
scale and caps measured scaling efficiency (VERDICT round 1). This module
is the low-latency executor for the tight iterative loops (PageRank, CC,
LPA): the north_star's "map_batches on stateful actor pools holds
per-partition adjacency state" taken to its conclusion — the pool is P
persistent ``@ray.remote`` actors, one per hash partition, created once
per fit:

- each actor holds its static :class:`CsrBlock` (zero-copy from the
  object store) and its dense per-vertex state vectors for the whole run;
- a superstep is ``P`` ``scatter`` calls, each returning ``P`` separate
  objects (``num_returns=P``) so every gather partition fetches ONLY its
  own pre-combined payload — the same destination-keyed exchange as the
  groupby shuffle, minus the job/barrier overhead (payloads move through
  the object store exactly like shuffle blocks, so multi-node placement
  is unchanged);
- ``P`` ``gather_apply`` calls combine payloads into the dense local
  vector and return *scalars only* (residual / changed-count partials) —
  the driver moves no vertex data, and convergence checks are free (no
  extra ``Dataset.sum`` job per superstep);
- checkpoints are written by the actors themselves
  (``state/part=<p>/data.parquet``, one file per partition = the
  per-partition lineage unit), with the manifest written last by the
  driver via :class:`CheckpointManager`.

Hub skew remains structurally bounded exactly as in gas.py: scatter
pre-combines per (source partition, destination vertex), so a vertex with
10^9 in-edges receives at most P partial rows.

Algorithms plug in as a :class:`VertexProgram`: plain-numpy ``init`` /
``scatter`` / ``gather_apply`` over one partition's dense state — the
same kernels the Dataset engine runs inside map_groups, minus the
row-table plumbing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


class VertexProgram:
    """Per-partition kernels of one iterative algorithm (all numpy).

    ``state`` is a dict of dense arrays of length ``csr.n_local`` (row i
    is vertex ``part + i * P``). Payloads are arbitrary picklable objects
    (tuples of numpy arrays); ``scatter`` returns one payload per
    destination partition; ``gather_apply`` consumes the P payloads
    addressed to this partition and returns scalar metric partials.

    Static-route optimization: when the *destinations* of a partition's
    messages never change across supersteps (PageRank, CC — the message
    keys are the static unique-dst set), implement ``scatter_meta`` /
    ``prepare_recv`` to exchange the destination index arrays ONCE at
    engine setup; per-superstep payloads then carry only the values, and
    the receiver can pre-plan its combine (e.g. a static reduceat order).
    """

    #: state columns persisted to / restored from checkpoints
    state_columns: tuple = ()

    def prepare(self, csr) -> object:  # pragma: no cover - trivial default
        """One-time per-partition precompute (e.g. destination grouping);
        result is passed back into scatter/gather_apply as ``cache``."""
        return None

    def scatter_meta(self, csr, cache) -> list | None:
        """Static per-destination-partition routing metadata (one object
        per partition), exchanged once at setup; None = no static route."""
        return None

    def prepare_recv(self, csr, cache, metas: list) -> object:
        """Pre-plan the combine from the P senders' static metadata."""
        return None

    def init(self, csr, cache) -> dict:
        raise NotImplementedError

    def scatter(self, csr, state: dict, cache) -> list:
        raise NotImplementedError

    def gather_apply(self, csr, state: dict, payloads: list, cache, recv) -> dict:
        """Mutate/replace ``state`` in place; return metric partials."""
        raise NotImplementedError


def dest_partition_slices(csr):
    """``(bounds, local)``: per destination partition, the contiguous
    ``uniq_dst`` slice (``compile_block`` groups uniq_dst by ``dst % P``)
    and the destinations' local row ids there. Static per run — scatter
    then ships ``reduceat_output[a:b]`` views with no per-superstep
    fancy-index gather."""
    s = csr.uniq_part_starts
    p = np.uint64(csr.n_parts)
    bounds = [(int(s[q]), int(s[q + 1])) for q in range(csr.n_parts)]
    local = [(csr.uniq_dst[a:b] // p).astype(np.int64) for a, b in bounds]
    return bounds, local


class _PartitionActor:
    """One hash partition: static CSR + dense state, alive for the run."""

    def __init__(self, csr_ref, program: VertexProgram):
        import ray

        self.csr = ray.get(csr_ref) if isinstance(csr_ref, ray.ObjectRef) else csr_ref
        self.program = program
        self.cache = program.prepare(self.csr)
        self.state = program.init(self.csr, self.cache)
        self.recv = None

    def scatter_meta(self):
        m = self.program.scatter_meta(self.csr, self.cache)
        m = tuple(m) if m is not None else tuple([None] * self.csr.n_parts)
        # num_returns=1 does NOT split a 1-tuple: at P=1 ship the single
        # meta bare, or every program would receive it wrapped
        return m[0] if self.csr.n_parts == 1 else m

    def set_recv_meta(self, *metas):
        self.recv = self.program.prepare_recv(self.csr, self.cache, list(metas))

    def scatter(self):
        out = tuple(self.program.scatter(self.csr, self.state, self.cache))
        # see scatter_meta: at P=1 the payload ships bare (no ray split)
        return out[0] if self.csr.n_parts == 1 else out

    def gather_apply(self, *payloads):
        return self.program.gather_apply(
            self.csr, self.state, list(payloads), self.cache, self.recv
        )

    def update_state(self, **kv):
        """Driver-pushed scalar state (e.g. a phase switch for programs
        whose superstep alternates communication patterns)."""
        self.state.update(kv)

    def state_table(self) -> pa.Table:
        csr = self.csr
        ids = np.arange(csr.part, csr.n_vertices, csr.n_parts, dtype=np.uint64)
        cols = {"id": pa.array(ids), "part": pa.array(np.full(csr.n_local, csr.part, np.int64))}
        for c in self.program.state_columns:
            cols[c] = pa.array(np.asarray(self.state[c]))
        return pa.table(cols)

    def write_state(self, data_dir: str) -> int:
        """Checkpoint this partition (its own lineage unit); returns rows."""
        import pyarrow.parquet as pq

        t = self.state_table()
        d = os.path.join(data_dir, f"part={self.csr.part}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(t.drop_columns(["part"]), os.path.join(d, "data.parquet"))
        return t.num_rows

    def load_state(self, data_dir: str) -> None:
        import pyarrow.parquet as pq

        f = os.path.join(data_dir, f"part={self.csr.part}", "data.parquet")
        t = pq.read_table(f)
        # rows are written in local-row order (state_table), so columns
        # load back positionally — verify with the id column
        ids = t["id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        expect = np.arange(self.csr.part, self.csr.n_vertices, self.csr.n_parts, dtype=np.uint64)
        if not np.array_equal(ids, expect):
            order = np.argsort(ids)
            t = t.take(order)
        for c in self.program.state_columns:
            # copy: arrow-backed numpy views are read-only, but programs
            # mutate their dense state vectors in place
            self.state[c] = np.array(
                t[c].combine_chunks().to_numpy(zero_copy_only=False), copy=True
            )


class BspEngine:
    """Driver-side orchestration of the partition-actor pool."""

    def __init__(self, gas, program: VertexProgram, *, actor_num_cpus: float | None = None):
        import ray

        self.p = gas.p
        self.n = gas.n
        # the CSR compile tasks need CPU slots; resolve them BEFORE the
        # actor pool reserves the cluster (otherwise actor __init__ blocks
        # on a ray.get whose producer task can never schedule — deadlock)
        refs = [gas.csr_refs[q] for q in range(self.p)]
        ray.wait(refs, num_returns=len(refs))
        # size the fixed-size pool to the cluster, keeping one CPU of
        # headroom so concurrent Dataset jobs (checkpoint manifests, user
        # pipelines) stay schedulable; with fewer CPUs than partitions the
        # fractional reservations oversubscribe — the scaling-run regime
        # (SURVEY §4)
        if actor_num_cpus is None:
            avail = int(ray.cluster_resources().get("CPU", self.p))
            actor_num_cpus = max(0.1, min(1.0, (avail - 1) / max(1, self.p)))
        actor_cls = ray.remote(num_cpus=actor_num_cpus)(_PartitionActor)
        self.actors = [actor_cls.remote(refs[q], program) for q in range(self.p)]
        # fail fast on actor init errors (and warm the pool)
        ray.get([a.__ray_ready__.remote() for a in self.actors])
        # one-time static-route exchange (see VertexProgram.scatter_meta)
        p = self.p
        metas = [a.scatter_meta.options(num_returns=p).remote() for a in self.actors]
        if p == 1:
            metas = [[m] for m in metas]
        ray.get(
            [
                self.actors[q].set_recv_meta.remote(*[metas[i][q] for i in range(p)])
                for q in range(p)
            ]
        )

    def superstep(self) -> list[dict]:
        """One BSP round; returns the P per-partition metric dicts."""
        import ray

        p = self.p
        outs = [a.scatter.options(num_returns=p).remote() for a in self.actors]
        if p == 1:
            outs = [[o] for o in outs]  # num_returns=1 returns a bare ref
        return ray.get(
            [
                self.actors[q].gather_apply.remote(*[outs[i][q] for i in range(p)])
                for q in range(p)
            ]
        )

    def broadcast_state(self, **kv) -> None:
        """Set scalar state keys on every partition actor (one RPC round;
        used at phase transitions of multi-mode programs, not per step)."""
        import ray

        ray.get([a.update_state.remote(**kv) for a in self.actors])

    def state_dataset(self):
        """Export the current state as a Dataset (one block per partition)."""
        import ray
        import ray.data as rd

        refs = [a.state_table.remote() for a in self.actors]
        ray.wait(refs, num_returns=len(refs))  # complete before any shutdown
        return rd.from_arrow_refs(refs)

    def save_checkpoint(self, ckpt, t: int, metrics: dict) -> None:
        """Actors write their partitions in parallel; manifest last."""
        import ray

        data_dir = os.path.join(ckpt.iter_dir(t), "state")
        ray.get([a.write_state.remote(data_dir) for a in self.actors])
        ckpt.write_manifest(t, metrics)

    def load_checkpoint(self, ckpt, t: int) -> None:
        import ray

        data_dir = os.path.join(ckpt.iter_dir(t), "state")
        ray.get([a.load_state.remote(data_dir) for a in self.actors])

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
