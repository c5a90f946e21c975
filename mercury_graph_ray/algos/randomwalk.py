"""Distributed random walks (reference:
mercury/graph/ml/spark_randomwalker.py:68-186).

Reference behavior reproduced: one walker per source node; per epoch a
walker at ``u`` moves along an out-edge with probability
``w(u,v)/Σw_out(u)`` (the per-src CDF the reference precomputes with
windows, spark_randomwalker.py:111-127 — our CSR rows replace the
windows); ``paths_`` rows carry the visited node array plus the
cumulative path-probability array (weights[0]=1.0, weights[k] =
weights[k-1]·p_k); dead-end walkers simply stop growing. Optional
``n_sampling_edges`` reproduces the reference's hub skew control
(spark_randomwalker.py:168-186): per epoch keep the top-k out-edges of a
node ranked by ``rand()·p`` and walk only among them (probabilities stay
normalized by the FULL out-weight, as in the reference).

Unlike the reference's unseeded ``f.rand()`` (a nondeterminism hazard,
SURVEY.md §4), every random draw is a counter-based hash uniform keyed
``(seed, epoch, walker)`` for the step draw and ``(seed, epoch, edge)``
for the hub-sampling scores — identical walks at any parallelism (the
draw depends only on the key, never on batch/group composition),
resumable mid-walk, and fully vectorizable (no per-walker Generator
objects; VERDICT round 1 #5 replaced the ``iterrows`` step loop).

The walker state is a Dataset partitioned by the walker's *current*
vertex (``part = curr % P``), so each step reads only its partition's
CSR block; the per-epoch shuffle moves walker rows, never edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import prepare
from mercury_graph_ray.stages.csr import CsrBlock

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)


def hash_u01(x: np.ndarray, *keys: int) -> np.ndarray:
    """Deterministic uniform(0,1) per element: splitmix64 over (x, keys).

    Counter-based randomness — the value depends only on (x, keys), so
    walks are identical under any partitioning/batching.
    """
    h = np.asarray(x, dtype=np.uint64).copy()
    for k in keys:
        h ^= _U64((int(k) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF) + (
            h << _U64(6)
        ) + (h >> _U64(2))
    z = h + _GOLDEN
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    z = z ^ (z >> _U64(31))
    return (z >> _U64(11)).astype(np.float64) / float(1 << 53)


def _segment_lengths_to_starts(lens: np.ndarray) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)


def stable_mask(keys, ratio: float, seed: int) -> np.ndarray:
    """Deterministic Bernoulli(ratio) per key, vectorized: stable
    string→u64 hashing (``hash_pandas_object``) mixed through the
    counter-based splitmix64 of ``hash_u01`` keyed on ``seed`` — order-
    and partitioning-independent, so it can run per batch."""
    h = pd.util.hash_pandas_object(
        pd.Series(list(keys)).astype(str), index=False
    ).to_numpy(np.uint64)
    return hash_u01(h, seed) < ratio


class RandomWalker(BaseClass):
    """``RandomWalker(num_epochs=10).fit(g, source_id)`` sets ``paths_``:
    Dataset of (random_walks: list, weights: list<float>)."""

    def __init__(self, num_epochs: int = 10, n_sampling_edges: int | None = None,
                 seed: int = 42, n_parts: int | None = None, workdir: str | None = None):
        self.num_epochs = num_epochs
        self.n_sampling_edges = n_sampling_edges
        self.seed = seed
        self.n_parts = n_parts
        self.workdir = workdir

    def fit(self, g, source_id: list | None = None, *,
            sample_ratio: float = 1.0, sample_seed: int = 0) -> "RandomWalker":
        """``source_id=None`` walks from EVERY vertex (optionally thinned by
        the deterministic ``stable_mask(keys, sample_ratio, sample_seed)``)
        with the init state built per mapping batch — no driver-side vertex
        list at any corpus size. Walker ids are the dense vids, so walks
        stay deterministic and partitioning-independent."""
        import ray
        import ray.data as rd

        vd, gas = prepare(g, symmetrize=False, n_parts=self.n_parts, workdir=self.workdir)
        p = gas.p
        seed = self.seed
        k_sample = self.n_sampling_edges
        csr_refs = gas.csr_refs

        import pyarrow as pa
        import pyarrow.compute as pc

        def _init_frame(vids: np.ndarray) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "walker": vids.astype(np.int64),
                    "curr": vids,
                    "part": (vids % np.uint64(p)).astype(np.int64),
                    "path": [[int(s)] for s in vids],
                    "wts": [[1.0] for _ in vids],
                }
            )

        if source_id is None:
            ratio = float(sample_ratio)

            def _init_all(t: pa.Table) -> pd.DataFrame:
                vids = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
                vids = np.asarray(vids, np.uint64)
                if ratio < 1.0 and len(vids):
                    keys = t["id"].to_pylist()
                    vids = vids[stable_mask(keys, ratio, sample_seed)]
                return _init_frame(np.sort(vids))

            state = vd.mapping.map_batches(_init_all, batch_format="pyarrow").materialize()
            if state.count() == 0:
                raise ValueError("sampling selected no source nodes")
        else:
            # explicit sources: filter the mapping Dataset down to the
            # requested keys before collecting (the bfs.py pattern —
            # VERDICT r2 next-round #2; the driver holds only the
            # caller's own list, never the full vertex dictionary)
            src_keys = sorted(set(map(str, source_id)))

            def _rows(t: pa.Table) -> pa.Table:
                ids = pc.cast(t["id"], pa.string())
                return t.filter(pc.is_in(ids, value_set=pa.array(src_keys)))

            m = vd.mapping.map_batches(_rows, batch_format="pyarrow").to_pandas()
            sources = (
                m["vid"].to_numpy(np.uint64)
                if "vid" in m.columns  # all-empty filter loses schema (Ray quirk)
                else np.array([], np.uint64)
            )
            if len(sources) == 0:
                raise ValueError("no source_id found in the graph")
            sources = np.sort(sources)  # deterministic walker order
            init = _init_frame(sources)
            # historic walker numbering for explicit lists: rank, not vid
            init["walker"] = np.arange(len(sources), dtype=np.int64)
            state = rd.from_pandas(init).materialize()

        def _step(group: pd.DataFrame, *, epoch: int) -> pd.DataFrame:
            part = int(group["part"].iloc[0])
            csr: CsrBlock = ray.get(csr_refs[part])
            n = len(group)
            walkers = group["walker"].to_numpy(np.int64)
            curr = group["curr"].to_numpy(np.uint64).astype(np.int64)
            local = curr // p
            s = csr.indptr[local]
            e = csr.indptr[local + 1]
            deg = (e - s).astype(np.int64)

            # one segment of candidate out-edges per walker (walkers
            # co-located at a vertex duplicate its row ranges; scores are
            # keyed on the absolute edge index so they agree)
            lens = deg.copy()
            starts = _segment_lengths_to_starts(lens)
            total = int(lens.sum())
            # absolute edge indices per segment, fully vectorized
            pos_in_seg = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            eidx = np.repeat(s, lens) + pos_in_seg
            seg_id = np.repeat(np.arange(n, dtype=np.int64), lens)
            probs = csr.w_norm[eidx]
            dsts = csr.dst[eidx].astype(np.int64)

            if k_sample:
                over = deg > k_sample
                if over.any():
                    # per-edge score rand*p, keep top-k per segment in
                    # original edge order (the reference's hub control,
                    # spark_randomwalker.py:168-186)
                    score = hash_u01(eidx, seed, epoch, 7) * probs
                    order = np.lexsort((pos_in_seg, -score, seg_id))
                    so = seg_id[order]
                    seg_starts_o = np.flatnonzero(
                        np.concatenate([[True], so[1:] != so[:-1]])
                    )
                    rank = np.arange(total, dtype=np.int64) - np.repeat(
                        seg_starts_o, np.diff(np.concatenate([seg_starts_o, [total]]))
                    )
                    keep_sorted = rank < k_sample
                    keep = np.zeros(total, bool)
                    keep[order] = keep_sorted | ~over[so]
                    eidx, seg_id, probs, dsts, pos_in_seg = (
                        eidx[keep], seg_id[keep], probs[keep], dsts[keep], pos_in_seg[keep],
                    )
                    total = len(eidx)
                    lens = np.bincount(seg_id, minlength=n).astype(np.int64)
                    starts = _segment_lengths_to_starts(lens)

            # inverse-CDF pick per walker: first edge with cum > r
            r = hash_u01(walkers, seed, epoch)
            if total:
                cs = np.cumsum(probs)
                # clamp: zero-length trailing segments have start == total;
                # their base is never consumed (np.repeat drops len-0 segs)
                sc = np.minimum(starts, total - 1)
                base = cs[sc] - probs[sc]
                within = cs - np.repeat(base, lens)
                mark = within > np.repeat(r, lens)
                big = total
                cand = np.where(mark, np.arange(total, dtype=np.int64), big)
                first = np.full(n, big, np.int64)
                nz = lens > 0
                if nz.any():
                    mins = np.minimum.reduceat(cand, starts[nz]) if nz.sum() else None
                    # reduceat needs indices over segments with rows only
                    first[nz] = mins
                moved = first < big
            else:
                moved = np.zeros(n, bool)
                first = np.zeros(n, np.int64)

            sel = first[moved]
            v = dsts[sel] if total else np.array([], np.int64)
            pr_sel = probs[sel] if total else np.array([], np.float64)

            new_curr = curr.copy()
            new_curr[moved] = v
            paths = list(group["path"])
            wts = list(group["wts"])
            out_paths, out_wts = [], []
            mi = 0
            vi = iter(zip(v.tolist(), pr_sel.tolist()))
            for i in range(n):
                if moved[i]:
                    nv, npp = next(vi)
                    out_paths.append(list(paths[i]) + [nv])
                    w = list(wts[i])
                    w.append(w[-1] * npp)
                    out_wts.append(w)
                else:
                    out_paths.append(paths[i])
                    out_wts.append(wts[i])
            return pd.DataFrame(
                {
                    "walker": walkers,
                    "curr": new_curr.astype(np.uint64),
                    "part": (new_curr % p).astype(np.int64),
                    "path": out_paths,
                    "wts": out_wts,
                }
            )

        import functools

        for epoch in range(self.num_epochs):
            state = (
                state.groupby("part")
                .map_groups(functools.partial(_step, epoch=epoch), batch_format="pandas")
                .materialize()
            )

        keys_ref = vd._broadcast_ref
        if keys_ref is not None:

            def _decode(batch: pd.DataFrame) -> pd.DataFrame:
                keys = ray.get(keys_ref)
                return pd.DataFrame(
                    {
                        "random_walks": [
                            [keys[int(v)] for v in path] for path in batch["path"]
                        ],
                        "weights": list(batch["wts"]),
                    }
                )

            self.paths_ = state.map_batches(_decode, batch_format="pandas")
            return self

        # dictionary above the broadcast byte cap: distributed decode —
        # explode (walker, pos, vid, wt), hash-join the mapping, regroup
        # by int-bucketed walker with an in-task lexsort rebuilding each
        # path in position order (the spread_activation decode pattern)
        from mercury_graph_ray.stages.join import hash_join
        from mercury_graph_ray.stages.util import rename_cols

        def _explode(df: pd.DataFrame) -> pd.DataFrame:
            paths = [np.asarray(x, np.int64) for x in df["path"]]
            lens = np.fromiter((len(a) for a in paths), np.int64, len(paths))
            total = int(lens.sum())
            flat_v = np.concatenate(paths) if total else np.empty(0, np.int64)
            wts = [np.asarray(x, np.float64) for x in df["wts"]]
            flat_w = np.concatenate(wts) if total else np.empty(0, np.float64)
            walker = np.repeat(df["walker"].to_numpy(np.int64), lens)
            starts = np.cumsum(lens) - lens
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            return pd.DataFrame(
                {
                    "walker": walker,
                    "pos": pos,
                    "vid": flat_v.astype(np.uint64),
                    "wt": flat_w,
                }
            )

        ex = state.map_batches(_explode, batch_format="pandas")
        m = rename_cols(vd.mapping, {"id": "key"})
        j = hash_join(ex, m, on=("vid",), num_buckets=64)

        def _bkt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__bkt"] = (df["walker"].to_numpy(np.int64) % 64).astype(np.int64)
            return df

        def _regroup(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0:
                return pd.DataFrame({"random_walks": [], "weights": []})
            g = g.sort_values(["walker", "pos"], kind="mergesort")
            w = g["walker"].to_numpy(np.int64)
            bounds = np.flatnonzero(np.concatenate([[True], w[1:] != w[:-1]]))
            keys = g["key"].to_numpy()
            wt = g["wt"].to_numpy(np.float64)
            cuts = bounds[1:]
            return pd.DataFrame(
                {
                    "random_walks": [list(a) for a in np.split(keys, cuts)],
                    "weights": [list(a) for a in np.split(wt, cuts)],
                }
            )

        self.paths_ = (
            j.map_batches(_bkt, batch_format="pandas")
            .groupby("__bkt")
            .map_groups(_regroup, batch_format="pandas")
        )
        return self
