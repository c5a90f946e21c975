"""Distributed Louvain community detection (reference:
mercury/graph/ml/louvain.py:107-226, 450-576).

Same dataflow, re-expressed on Ray Data primitives:

- anonymized dense ids via the content-ordered vertex dictionary
  (replaces the reference's row_number window, louvain.py:126-138);
- per inner iteration, the parallel-reassignment plan
  (louvain.py:450-576): labeled degrees + labeled edges (bucketed
  hash-joins), community degree sums, intra/inter community weight sums,
  the ΔQ formula

      mdq = Σ_{i∈Cj} A_ix − Σ_{i∈Cx\\{x}} A_ix
            − k_x/(2m) · (Σ_{i∈Cj} k_i − Σ_{i∈Cx} k_i + k_x)

  per-id argmax and the symmetric-swap tiebreak (unordered (c, cj) pair
  rank), both vectorized inside id-bucket ``map_groups``;
- moves require ``mdq > 1e-4`` (louvain.py:566) and swap-rank 1; the
  reference's rank ties are Spark-nondeterministic — ours break ties by
  (mdq desc, cj asc / id asc), deterministic at any parallelism;
- per pass, graph coarsening ``groupby(cSrc, cDst).sum(weight)``
  (louvain.py:201-207) and the stopping rule modularity-gain >
  ``min_modularity_gain`` with resolution γ (louvain.py:398-448);
- duplicate (src, dst) edges are rejected (louvain.py:260-268).

``labels_`` matches the reference's two output shapes (louvain.py:213-224):
``all_partitions=True`` (the default) gives the per-pass column matrix
``(node_id, pass0, pass1, ..., passK)`` — pass0 is the anonymized dense
id (our content-ordered vid, 0-based, where the reference uses a 1-based
row_number), pass{k+1} the composed community of pass k; ``False`` gives
the final ``(node_id, cluster)``. Pass modularities are in
``pass_history_``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.stages.ids import VertexDict
from mercury_graph_ray.stages.join import hash_join
from mercury_graph_ray.stages.util import ensure_schema, rename_cols


def _sum_by(ds, key_cols, val_col, alias):
    """groupby(keys).sum(val) via stages/util.bucket_sum_by (per-batch
    pre-combine + int-bucket shuffle — the round-1 sort-aggregate cost
    finding). All Louvain keys are int64 (dense vids / community ids)
    and values float64."""
    from mercury_graph_ray.stages.util import bucket_sum_by

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    src = rename_cols(ds, {val_col: alias}) if val_col != alias else ds
    return bucket_sum_by(
        src.select_columns(keys + [alias]),
        keys,
        alias,
        {**{k: pa.int64() for k in keys}, alias: pa.float64()},
        n_buckets=32,
    )


# above this many BYTES a join side is too big to broadcast (a 20M-row
# x 3-col frame is ~0.5-1 GB on the driver — round-1 VERDICT #7 flagged
# the row-based threshold as far too generous)
_BROADCAST_BYTES = 64 << 20


def _join(left, right, on, *, how="inner"):
    """Adaptive join; see stages/join.py::auto_join (promoted from here).
    The right sides in Louvain are per-vertex/per-community scalar
    tables, which shrink with every coarsening pass."""
    from mercury_graph_ray.stages.join import auto_join

    return auto_join(left, right, on, how=how, broadcast_bytes=_BROADCAST_BYTES)


class LouvainCommunities(BaseClass):
    def __init__(self, min_modularity_gain=1e-03, max_pass=2, max_iter=10,
                 resolution=1, all_partitions=True, verbose=False,
                 small_graph_threshold: int = 100_000):
        """``small_graph_threshold``: below this many vertices the whole
        pass loop runs driver-side in pandas with the identical formulas
        (a 9-node fixture does not justify ~12 shuffle jobs per
        iteration); above it, every step is the distributed
        hash-join/groupby dataflow. Both paths share the ΔQ/tiebreak
        semantics and are cross-checked in tests."""
        if resolution < 0:
            raise ValueError(f"Resolution value is {resolution} and cannot be < 0.")
        self.min_modularity_gain = min_modularity_gain
        self.max_pass = max_pass
        self.max_iter = max_iter
        self.resolution = resolution
        self.all_partitions = all_partitions
        self.verbose = verbose
        self.small_graph_threshold = small_graph_threshold

    # ------------------------------------------------- pandas fast path
    @staticmethod
    def _degrees_pd(edges: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat(
            [
                edges[["src", "weight"]].rename(columns={"src": "id"}),
                edges[["dst", "weight"]].rename(columns={"dst": "id"}),
            ]
        )
        return both.groupby("id", as_index=False)["weight"].sum().rename(
            columns={"weight": "degree"}
        )

    def _modularity_pd(self, edges: pd.DataFrame, p: pd.DataFrame, m: float) -> float:
        le = edges.merge(p.rename(columns={"id": "src", "c": "cSrc"}), on="src")
        le = le.merge(p.rename(columns={"id": "dst", "c": "cDst"}), on="dst")
        k_in = float(le.loc[le.cSrc == le.cDst, "weight"].sum())
        ld = self._degrees_pd(edges).merge(p, on="id")
        kc = ld.groupby("c")["degree"].sum()
        k_out = self.resolution * float((kc**2).sum())
        norm = 1.0 / (2 * m)
        return (k_in / m) - (norm**2 * k_out)

    def _reassign_pd(self, edges: pd.DataFrame, p: pd.DataFrame, m: float) -> pd.DataFrame:
        ld = self._degrees_pd(edges).merge(p, on="id")
        ck = ld.groupby("c", as_index=False)["degree"].sum().rename(
            columns={"degree": "cx_sum_ki"}
        )
        ld = ld.merge(ck, on="c")
        le = edges.merge(p.rename(columns={"id": "src", "c": "cSrc"}), on="src")
        le = le.merge(p.rename(columns={"id": "dst", "c": "cDst"}), on="dst")

        intra = le[(le.src != le.dst) & (le.cSrc == le.cDst)]
        cx_aix = (
            pd.concat(
                [
                    intra[["src", "weight"]].rename(columns={"src": "id"}),
                    intra[["dst", "weight"]].rename(columns={"dst": "id"}),
                ]
            )
            .groupby("id", as_index=False)["weight"]
            .sum()
            .rename(columns={"weight": "cx_sum_aix"})
        )
        inter = le[le.cSrc != le.cDst]
        cj_aix = (
            pd.concat(
                [
                    inter[["src", "cDst", "weight"]].rename(
                        columns={"src": "id", "cDst": "cj"}
                    ),
                    inter[["dst", "cSrc", "weight"]].rename(
                        columns={"dst": "id", "cSrc": "cj"}
                    ),
                ]
            )
            .groupby(["id", "cj"], as_index=False)["weight"]
            .sum()
            .rename(columns={"weight": "cj_sum_aix"})
        )
        dq = ld.merge(cx_aix, on="id", how="left")
        dq = dq.merge(cj_aix, on="id", how="left")
        dq = dq.merge(
            ck.rename(columns={"c": "cj", "cx_sum_ki": "cj_sum_ki"}), on="cj", how="left"
        )
        mdq = (
            dq["cj_sum_aix"].fillna(0.0)
            - dq["cx_sum_aix"].fillna(0.0)
            - dq["degree"] / (2 * m)
            * (dq["cj_sum_ki"] - dq["cx_sum_ki"] + dq["degree"])
        )
        dq = dq.assign(mdq=mdq.fillna(-np.inf), cj=dq["cj"].fillna(dq["c"]).astype(np.int64))
        # per-id argmax: mdq desc, tie -> smaller cj
        dq = dq.sort_values(["id", "mdq", "cj"], ascending=[True, False, True])
        best = dq.drop_duplicates("id", keep="first").copy()
        # symmetric-swap break per unordered (c, cj) pair: mdq desc, id asc
        best["lo"] = np.minimum(best["c"], best["cj"])
        best["hi"] = np.maximum(best["c"], best["cj"])
        best = best.sort_values(["lo", "hi", "mdq", "id"],
                                ascending=[True, True, False, True])
        first = ~best.duplicated(["lo", "hi"], keep="first")
        move = (best["mdq"] > 1e-4) & first
        return pd.DataFrame(
            {
                "id": best["id"].astype(np.int64),
                "cx": best["c"].astype(np.int64),
                "cj": np.where(move, best["cj"], best["c"]).astype(np.int64),
            }
        ).sort_values("id").reset_index(drop=True)

    def _fit_small(self, edges_df: pd.DataFrame, m: float):
        """Whole pass loop in pandas; returns ``(final (id, c) over
        original vids, per-pass composed snapshots)`` — snapshots[k] is
        the (id, c) composition through the k-th coarsening (the
        reference's pass{k+1} column)."""
        modularity0 = -1.0
        ret = None
        snapshots: list[pd.DataFrame] = []
        edges = edges_df
        can_pass, _pass = True, 0
        while can_pass:
            ids = np.unique(np.concatenate([edges["src"], edges["dst"]]))
            p = pd.DataFrame({"id": ids.astype(np.int64), "c": ids.astype(np.int64)})
            for _it in range(self.max_iter):
                p2 = self._reassign_pd(edges, p, m)
                changed = int((p2["cx"] != p2["cj"]).sum())
                p = p2[["id", "cj"]].rename(columns={"cj": "c"})
                if self.verbose:
                    print(f"[small] pass {_pass} iter {_it}: {changed} moves")
                if changed == 0:
                    break
            modularity1 = self._modularity_pd(edges, p, m)
            can_pass = (modularity1 - modularity0 > self.min_modularity_gain) and (
                _pass < self.max_pass
            )
            modularity0 = modularity1
            self.modularity_ = modularity0
            self.pass_history_.append(modularity1)
            if can_pass:
                ret = p if ret is None else ret.merge(
                    p.rename(columns={"id": "c", "c": "c_next"}), on="c"
                )[["id", "c_next"]].rename(columns={"c_next": "c"})
                snapshots.append(ret.copy())
                le = edges.merge(p.rename(columns={"id": "src", "c": "cSrc"}), on="src")
                le = le.merge(p.rename(columns={"id": "dst", "c": "cDst"}), on="dst")
                edges = (
                    le.groupby(["cSrc", "cDst"], as_index=False)["weight"]
                    .sum()
                    .rename(columns={"cSrc": "src", "cDst": "dst"})
                )
            _pass += 1
        return (p if ret is None else ret), snapshots

    # ------------------------------------------------------------ helpers
    def _degrees(self, edges):
        """(id, degree): weighted degree from both endpoints."""

        def _both(t: pa.Table) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            w = t["weight"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {"id": pa.array(np.concatenate([s, d])),
                 "weight": pa.array(np.concatenate([w, w]))}
            )

        return _sum_by(
            edges.map_batches(_both, batch_format="pyarrow"), "id", "weight", "degree"
        )

    def _label_edges(self, edges, partition):
        """edges + cSrc + cDst (louvain.py:333-377)."""
        le = _join(
            edges, rename_cols(partition, {"id": "src", "c": "cSrc"}), on=("src",)
        )
        return _join(
            le, rename_cols(partition, {"id": "dst", "c": "cDst"}), on=("dst",)
        )

    def _modularity(self, edges, partition, m, degrees=None):
        le = self._label_edges(edges, partition).materialize()

        def _kin(t: pa.Table) -> pa.Table:
            cs = t["cSrc"].combine_chunks().to_numpy(zero_copy_only=False)
            cd = t["cDst"].combine_chunks().to_numpy(zero_copy_only=False)
            w = t["weight"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({"w": pa.array([float(w[cs == cd].sum())])})

        k_in = le.map_batches(_kin, batch_format="pyarrow").sum("w") or 0.0
        if degrees is None:
            degrees = self._degrees(edges)
        ld = _join(degrees, partition, on=("id",))
        # sum of squared community degrees, computed distributed — early
        # passes have ~|V| communities, never pull that table to the driver
        kc = _sum_by(ld, "c", "degree", "kC")

        def _sq(t: pa.Table) -> pa.Table:
            v = t["kC"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({"kC2": pa.array([float((v * v).sum())])})

        k_out = self.resolution * float(
            kc.map_batches(_sq, batch_format="pyarrow").sum("kC2") or 0.0
        )
        norm = 1.0 / (2 * m)
        return (k_in / m) - (norm**2 * k_out)

    def _reassign_all(self, edges, partition, m, n_buckets=16, degrees=None):
        """One synchronous reassignment pass -> (id, cx, cj).

        ``degrees`` lets the caller reuse the per-pass materialized degree
        table — edges are static within a pass, so recomputing the degree
        shuffle every iteration is pure waste."""
        if degrees is None:
            degrees = self._degrees(edges)
        ld = _join(degrees, partition, on=("id",))  # id, degree, c
        ck = _sum_by(ld, "c", "degree", "cx_sum_ki")
        ld = _join(ld, ck, on=("c",)).materialize()
        le = self._label_edges(edges, partition).materialize()

        def _intra(t: pa.Table) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            cs = t["cSrc"].combine_chunks().to_numpy(zero_copy_only=False)
            cd = t["cDst"].combine_chunks().to_numpy(zero_copy_only=False)
            w = t["weight"].combine_chunks().to_numpy(zero_copy_only=False)
            keep = (s != d) & (cs == cd)
            return pa.table(
                {"id": pa.array(np.concatenate([s[keep], d[keep]])),
                 "weight": pa.array(np.concatenate([w[keep], w[keep]]))}
            )

        cx_aix = _sum_by(le.map_batches(_intra, batch_format="pyarrow"),
                         "id", "weight", "cx_sum_aix")

        def _inter(t: pa.Table) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            cs = t["cSrc"].combine_chunks().to_numpy(zero_copy_only=False)
            cd = t["cDst"].combine_chunks().to_numpy(zero_copy_only=False)
            w = t["weight"].combine_chunks().to_numpy(zero_copy_only=False)
            keep = cs != cd
            return pa.table(
                {"id": pa.array(np.concatenate([s[keep], d[keep]])),
                 "cj": pa.array(np.concatenate([cd[keep], cs[keep]])),
                 "weight": pa.array(np.concatenate([w[keep], w[keep]]))}
            )

        cj_aix = _sum_by(le.map_batches(_inter, batch_format="pyarrow"),
                         ["id", "cj"], "weight", "cj_sum_aix")
        cj_ki = rename_cols(ck, {"c": "cj", "cx_sum_ki": "cj_sum_ki"})

        dq = _join(ld, ensure_schema(cx_aix, {"id": pa.int64(), "cx_sum_aix": pa.float64()}),
                   on=("id",), how="left")
        dq = _join(dq, ensure_schema(
            cj_aix, {"id": pa.int64(), "cj": pa.int64(), "cj_sum_aix": pa.float64()}),
            on=("id",), how="left")
        dq = _join(dq, ensure_schema(
            cj_ki, {"cj": pa.int64(), "cj_sum_ki": pa.float64()}),
            on=("cj",), how="left")

        two_m = 2.0 * m

        def _mdq(batch: pd.DataFrame) -> pd.DataFrame:
            cj_aix_v = batch["cj_sum_aix"].fillna(0.0)
            cx_aix_v = batch["cx_sum_aix"].fillna(0.0)
            mdq = cj_aix_v - cx_aix_v - (
                batch["degree"] / two_m
                * (batch["cj_sum_ki"] - batch["cx_sum_ki"] + batch["degree"])
            )
            out = pd.DataFrame(
                {
                    "id": batch["id"].astype(np.int64),
                    "c": batch["c"].astype(np.int64),
                    "cj": batch["cj"].fillna(batch["c"]).astype(np.int64),
                    "mdq": mdq.fillna(-np.inf),
                    "bucket": (batch["id"].astype(np.int64) % n_buckets),
                }
            )
            return out

        dq = dq.map_batches(_mdq, batch_format="pandas")

        # per-id argmax: mdq desc, tie -> smaller cj (deterministic)
        def _best(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values(["id", "mdq", "cj"], ascending=[True, False, True])
            g = g.drop_duplicates("id", keep="first")
            lo = np.minimum(g["c"], g["cj"])
            hi = np.maximum(g["c"], g["cj"])
            g = g.assign(
                pair_bucket=pd.util.hash_pandas_object(
                    pd.DataFrame({"lo": lo, "hi": hi}), index=False
                ).to_numpy(np.uint64) % np.uint64(n_buckets),
                lo=lo, hi=hi,
            )
            return g[["id", "c", "cj", "mdq", "pair_bucket", "lo", "hi"]]

        best = dq.groupby("bucket").map_groups(_best, batch_format="pandas")

        # symmetric-swap break: rank within unordered (c, cj) pair
        def _sym(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values(["lo", "hi", "mdq", "id"],
                                  ascending=[True, True, False, True])
            first = ~g.duplicated(["lo", "hi"], keep="first")
            move = (g["mdq"] > 1e-4) & first
            return pd.DataFrame(
                {"id": g["id"], "cx": g["c"],
                 "cj": np.where(move, g["cj"], g["c"])}
            )

        return best.groupby("pair_bucket").map_groups(_sym, batch_format="pandas")

    # ---------------------------------------------------------------- fit
    def fit(self, g) -> "LouvainCommunities":
        # duplicate-edge validation (louvain.py:260-268): per-batch count
        # pre-combine + int-bucket shuffle (same rationale as _sum_by —
        # the sort-based groupby on the raw string pair keys is the
        # slowest job of the whole fit otherwise)
        def _pair_counts(df: pd.DataFrame) -> pd.DataFrame:
            c = df.groupby(["src", "dst"], as_index=False).size()
            c["_bucket"] = (
                pd.util.hash_pandas_object(c[["src", "dst"]], index=False).to_numpy()
                % 32
            ).astype(np.int64)
            return c

        def _dups(df: pd.DataFrame) -> pd.DataFrame:
            n = df.groupby(["src", "dst"], as_index=False)["size"].sum()
            return n[n["size"] > 1][["src", "dst"]]

        dup = (
            g.edges.select_columns(["src", "dst"])
            .map_batches(_pair_counts, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(_dups, batch_format="pandas")
            .count()
        )
        if dup > 0:
            raise ValueError("Found duplicate edges in data.")

        vd = VertexDict.from_edges(g.edges)
        cols = ["src", "dst"] + (["weight"] if g.weighted else [])
        enc = vd.encode_edges(g.edges.select_columns(cols))

        def _norm(t: pa.Table) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            if "weight" in t.schema.names:
                w = t["weight"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
            else:
                w = np.ones(len(s), np.float64)
            return pa.table({"src": pa.array(s), "dst": pa.array(d), "weight": pa.array(w)})

        edges = enc.map_batches(_norm, batch_format="pyarrow").materialize()
        m = float(edges.sum("weight"))
        modularity0 = -1.0
        self.pass_history_ = []

        if vd.n <= self.small_graph_threshold:
            ret_df, snapshots = self._fit_small(edges.to_pandas(), m)
            import ray.data as rd

            if self.all_partitions:
                # reference matrix shape (louvain.py:213-217): id + one
                # composed column per productive pass; pass0 = dense vid
                all_ids = np.sort(ret_df["id"].to_numpy(np.int64))
                mat = pd.DataFrame({"node_id": all_ids, "pass0": all_ids})
                for k, snap in enumerate(snapshots):
                    mat = mat.merge(
                        snap.rename(columns={"id": "node_id", "c": f"pass{k + 1}"}),
                        on="node_id",
                    )
                if not snapshots:  # single unproductive pass: final p
                    mat = mat.merge(
                        ret_df.rename(columns={"id": "node_id", "c": "pass1"}),
                        on="node_id",
                    )
                cols = {c: pa.array(mat[c].to_numpy(np.int64)) for c in mat.columns}
                self.labels_ = vd.decode(rd.from_arrow(pa.table(cols)), col="node_id")
                return self
            ret_ds = rd.from_arrow(
                pa.table(
                    {
                        "node_id": pa.array(ret_df["id"].to_numpy(np.int64)),
                        "cluster": pa.array(ret_df["c"].to_numpy(np.int64)),
                    }
                )
            )
            self.labels_ = vd.decode(ret_ds, col="node_id")
            return self

        ret = None  # (id0, c): composition of all pass partitions
        snaps = []  # per-pass composed snapshots (all_partitions matrix)
        ids0 = None  # vertex ids of the original (pass-0) graph
        can_pass, _pass = True, 0
        while can_pass:
            # naive partition c = id over current (possibly coarsened) graph
            def _ids(t: pa.Table) -> pa.Table:
                s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
                d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
                u = np.unique(np.concatenate([s, d]))  # per-batch distinct
                return pa.table(
                    {"id": pa.array(u), "_bucket": pa.array(u % 32)}
                )

            def _distinct(df: pd.DataFrame) -> pd.DataFrame:
                u = df["id"].unique()
                return pd.DataFrame({"id": u, "c": u})

            # distinct via per-batch unique + int-bucket shuffle (the
            # sort-based groupby().Count() distinct costs ~240 µs/row on
            # this Ray version — same finding as _sum_by above)
            p = (
                edges.map_batches(_ids, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(_distinct, batch_format="pandas")
                .materialize()
            )
            p = ensure_schema(p, {"id": pa.int64(), "c": pa.int64()}).materialize()
            if _pass == 0:
                ids0 = p.select_columns(["id"]).materialize()

            # degrees are constant within a pass (edges only change at
            # coarsening): one shuffle per pass, reused every iteration
            degs = self._degrees(edges).materialize()

            for _iter in range(self.max_iter):
                p2 = ensure_schema(
                    self._reassign_all(edges, p, m, degrees=degs),
                    {"id": pa.int64(), "cx": pa.int64(), "cj": pa.int64()},
                ).materialize()
                changed = p2.map_batches(
                    lambda t: pa.table(
                        {"n": pa.array([int(
                            (t["cx"].combine_chunks().to_numpy(zero_copy_only=False)
                             != t["cj"].combine_chunks().to_numpy(zero_copy_only=False)).sum()
                        )])}
                    ),
                    batch_format="pyarrow",
                ).sum("n")
                p = ensure_schema(
                    rename_cols(p2, {"cj": "c"}),
                    {"id": pa.int64(), "c": pa.int64()},
                ).materialize()
                if self.verbose:
                    print(f"pass {_pass} iter {_iter}: {changed} moves")
                if changed == 0:
                    break

            modularity1 = self._modularity(edges, p, m, degrees=degs)
            can_pass = (modularity1 - modularity0 > self.min_modularity_gain) and (
                _pass < self.max_pass
            )
            modularity0 = modularity1
            self.modularity_ = modularity0
            self.pass_history_.append(modularity1)

            if can_pass:
                if ret is None:
                    ret = p
                else:
                    ret = ensure_schema(
                        rename_cols(
                            _join(
                                ret,
                                rename_cols(p, {"id": "c", "c": "c_next"}),
                                on=("c",),
                            ),
                            {"c_next": "c_final"},
                        ),
                        {"id": pa.int64(), "c_final": pa.int64()},
                    ).materialize()
                    ret = ensure_schema(
                        rename_cols(ret, {"c_final": "c"}),
                        {"id": pa.int64(), "c": pa.int64()},
                    ).materialize()
                snaps.append(ret)
                le = self._label_edges(edges, p)
                edges = ensure_schema(
                    rename_cols(
                        _sum_by(le, ["cSrc", "cDst"], "weight", "weight"),
                        {"cSrc": "src", "cDst": "dst"},
                    ),
                    {"src": pa.int64(), "dst": pa.int64(), "weight": pa.float64()},
                ).materialize()
            _pass += 1

        if ret is None:
            ret = p
        if self.all_partitions:
            # reference matrix shape: node_id + pass0..passK (composed)
            mat = rename_cols(
                ids0.map_batches(
                    lambda t: t.append_column("pass0", t["id"]),
                    batch_format="pyarrow", batch_size=None,
                ),
                {"id": "node_id"},
            )
            mat = ensure_schema(mat, {"node_id": pa.int64(), "pass0": pa.int64()})
            use_snaps = snaps if snaps else [ret]
            types = {"node_id": pa.int64(), "pass0": pa.int64()}
            for k, s in enumerate(use_snaps):
                col = f"pass{k + 1}"
                mat = _join(
                    mat, rename_cols(s, {"id": "node_id", "c": col}), on=("node_id",)
                )
                types[col] = pa.int64()
                mat = ensure_schema(mat, types).materialize()
            self.labels_ = vd.decode(mat, col="node_id")
            return self
        out = vd.decode(rename_cols(ret, {"id": "node_id", "c": "cluster"}), col="node_id")
        self.labels_ = out
        return self
