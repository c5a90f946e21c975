"""Approximate / exact nearest-neighbor search over an embedding column.

- **brute-force cosine top-k** (the exactness baseline): the query matrix
  is broadcast once (``ray.put``); each batch computes a numpy matmul
  against it and emits its local top-k per query; a final per-query
  combine (tiny: queries × k × num_batches rows) yields the exact global
  top-k. No shuffle of the vector table, single streaming pass.
- **IVF (inverted-file) variant** (the scale path): k-means centroids are
  fit on a seeded sample driver-side, every vector is assigned to its
  nearest centroid in one ``map_batches`` pass (a partitioned index,
  written once), and a query probes only the ``nprobe`` closest lists —
  at 1e12 vectors the probe reads a few lists' parquet partitions instead
  of the full table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1)
    norm[norm == 0] = 1.0
    return mat / norm[:, None]


def brute_force_topk(
    ds, queries: np.ndarray, k: int = 5, *, vec_col="embedding", id_col="vec_id",
    exclude_self: bool = False, query_ids: np.ndarray | None = None
):
    """Exact cosine top-k. Returns DataFrame (query, vec_id, cosine, rank)."""
    import ray

    q_unit = _unit_rows(np.asarray(queries, np.float64))
    if query_ids is None:
        query_ids = np.arange(len(q_unit))
    q_ref = ray.put((q_unit, np.asarray(query_ids, np.int64)))

    def _partial(t: pa.Table) -> pa.Table:
        qm, qids = ray.get(q_ref)
        vecs = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        sims = _unit_rows(vecs) @ qm.T  # (batch, nq)
        if exclude_self:
            sims[ids[:, None] == qids[None, :]] = -np.inf
        kk = min(k, len(ids))
        # local top-k per query column
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            rows = part[:, qi]
            out_q.append(np.full(kk, qids[qi], np.int64))
            out_id.append(ids[rows])
            out_s.append(sims[rows, qi])
        return pa.table(
            {
                "query": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g

    out = partials.groupby("query", group_keys=False).apply(_final)
    out["cosine"] = out["cosine"].round(6)
    return out.reset_index(drop=True)


def exact_cosine_pairs(ds, threshold: float, *, vec_col="embedding", id_col="vec_id",
                       block_rows: int = 16384, index_dir: str | None = None):
    """Exact all-pairs cosine similarity ≥ ``threshold`` (pairs a < b).

    The exactness BASELINE for the LSH near-dup path
    (stages/dedup.embedding_dup_pairs). Two regimes, identical output:

    - **n ≤ block_rows** (bench/oracle scale): the full unit-row matrix is
      broadcast once (``ray.put``) and the table streams through one
      ``map_batches`` matmul pass — no shuffle, no disk.
    - **n > block_rows** (corpus scale): vectors are unit-normalized and
      written ONCE to parquet partitioned by a hashed block id
      (``B = ceil(n / block_rows)`` blocks); every block pair (bi ≤ bj)
      becomes one task that reads exactly two blocks' files and emits its
      thresholded submatrix — O(n²·d) compute spread over B(B+1)/2 tasks,
      per-task memory bounded by two blocks, and NO driver-side matrix at
      any n. The same partitioned-parquet discipline as the IVF index.
    """
    import ray

    # materialize once: count() would otherwise EXECUTE the upstream
    # pipeline a first time just to pick the regime, then the pass below
    # would execute it again (double inference cost for model-derived
    # embedding columns); on the materialized handle count is metadata
    ds = ds.materialize()
    n = ds.count()
    if n <= block_rows:
        mats, idss = [], []
        for t in ds.select_columns([id_col, vec_col]).iter_batches(batch_format="pyarrow"):
            mats.append(np.stack(t[vec_col].to_pylist()).astype(np.float64))
            idss.append(
                t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            )
        all_ids = np.concatenate(idss) if idss else np.empty(0, np.int64)
        ref = ray.put((_unit_rows(np.vstack(mats)) if mats else np.empty((0, 1)), all_ids))

        def _pairs(t: pa.Table) -> pa.Table:
            mat, aid = ray.get(ref)
            vecs = np.stack(t[vec_col].to_pylist()).astype(np.float64)
            ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            sims = _unit_rows(vecs) @ mat.T
            mask = (sims >= threshold) & (ids[:, None] < aid[None, :])
            r, c = np.nonzero(mask)
            return pa.table(
                {
                    "a": pa.array(ids[r]),
                    "b": pa.array(aid[c]),
                    "cosine": pa.array(sims[r, c]),
                }
            )

        return ds.map_batches(_pairs, batch_format="pyarrow")

    # ---- blocked path
    import glob
    import math
    import os
    import tempfile

    import pyarrow.parquet as pq
    import ray.data as rd

    from mercury_graph_ray.stages.util import ensure_schema

    B = math.ceil(n / block_rows)
    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="cosblk_", dir="/tmp")

    _M = np.uint64(0x9E3779B97F4A7C15)

    def _assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        unit = _unit_rows(np.stack(t[vec_col].to_pylist()).astype(np.float64))
        # splitmix-style id hash so clustered ids still balance blocks
        h = ids.astype(np.uint64) * _M
        h ^= h >> np.uint64(29)
        blk = (h % np.uint64(B)).astype(np.int64)
        d = unit.shape[1]
        return pa.table(
            {
                id_col: pa.array(ids),
                "unit": pa.FixedSizeListArray.from_arrays(
                    pa.array(unit.reshape(-1)), d
                ),
                "blk": pa.array(blk),
            }
        )

    ds.select_columns([id_col, vec_col]).map_batches(
        _assign, batch_format="pyarrow"
    ).write_parquet(index_dir, partition_cols=["blk"], mode="overwrite")

    # the driver lists each block's files ONCE and ships the manifests in
    # the descriptors: a worker that cannot see index_dir (e.g. a
    # node-local /tmp on a multi-node cluster — pass shared storage!)
    # fails LOUDLY with FileNotFoundError instead of silently gathering
    # an empty block and dropping pairs. Hash gaps (legitimately empty
    # blocks) are just empty manifests.
    block_files = {
        b: sorted(glob.glob(os.path.join(index_dir, f"blk={b}", "*.parquet")))
        for b in range(B)
    }
    if not any(block_files.values()):
        raise FileNotFoundError(
            f"exact_cosine_pairs: no block files written under {index_dir}"
        )

    desc = rd.from_items(
        [
            {"bi": i, "bj": j, "fi": block_files[i], "fj": block_files[j]}
            for i in range(B)
            for j in range(i, B)
        ]
    )

    def _load_block(files):
        if not len(files):
            return np.empty(0, np.int64), np.empty((0, 1))
        t = pa.concat_tables([pq.read_table(f, columns=[id_col, "unit"]) for f in files])
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = t["unit"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        return ids, flat.reshape(len(ids), -1)

    def _block_pair(batch: pd.DataFrame) -> pa.Table:
        outs_a, outs_b, outs_s = [], [], []
        for r in batch.itertuples():
            ida, ma = _load_block(list(r.fi))
            if r.bi == r.bj:
                idb, mb = ida, ma
            else:
                idb, mb = _load_block(list(r.fj))
            if len(ida) == 0 or len(idb) == 0:
                continue
            sims = ma @ mb.T
            # each unordered pair appears in exactly one block-pair task;
            # orient (a, b) = (min, max) — within-block the strict '<'
            # also drops self-pairs
            mask = (sims >= threshold) & (ida[:, None] != idb[None, :])
            rr, cc = np.nonzero(mask)
            if r.bi == r.bj:
                keep = ida[rr] < idb[cc]
                rr, cc = rr[keep], cc[keep]
            a, b = ida[rr], idb[cc]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            outs_a.append(lo)
            outs_b.append(hi)
            outs_s.append(sims[rr, cc])
        if not outs_a:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(outs_a)),
                "b": pa.array(np.concatenate(outs_b)),
                "cosine": pa.array(np.concatenate(outs_s)),
            }
        )

    out = desc.map_batches(_block_pair, batch_format="pandas", batch_size=1)
    return ensure_schema(
        out, {"a": pa.int64(), "b": pa.int64(), "cosine": pa.float64()}
    )


class IvfIndex:
    """Inverted-file index: seeded-kmeans centroids + per-vector list
    assignment (one pass), probed with nprobe lists at query time."""

    def __init__(self, centroids: np.ndarray, index_dir: str):
        self.centroids = centroids  # (nlist, dim) unit rows
        self.index_dir = index_dir  # parquet partitioned by list_id
        self.last_probe_paths_ = []  # partitions read by the last search

    @classmethod
    def build(cls, ds, *, nlist=16, sample=2048, iters=10, seed=42,
              vec_col="embedding", id_col="vec_id", index_dir: str | None = None):
        import ray

        samp = ds.random_sample(1.0, seed=seed).limit(sample).to_pandas()
        x = _unit_rows(np.stack(samp[vec_col].to_numpy()).astype(np.float64))
        rng = np.random.default_rng([seed, 7])
        cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
        for _ in range(iters):  # spherical k-means on the sample (driver-side)
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                m = x[assign == c]
                if len(m):
                    v = m.mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        cent[c] = v / n
        c_ref = ray.put(cent)

        def _assign(t: pa.Table) -> pa.Table:
            cm = ray.get(c_ref)
            vecs = _unit_rows(np.stack(t[vec_col].to_pylist()).astype(np.float64))
            lid = np.argmax(vecs @ cm.T, axis=1).astype(np.int64)
            return t.append_column("list_id", pa.array(lid))

        if index_dir is None:
            import tempfile

            index_dir = tempfile.mkdtemp(prefix="ivf_", dir="/tmp")
        # the partitioned index on disk IS the scale artifact: a probe
        # reads only its nprobe lists' partitions, never the full table
        ds.map_batches(_assign, batch_format="pyarrow", batch_size=None).write_parquet(
            index_dir, partition_cols=["list_id"], mode="overwrite"
        )
        return cls(cent, index_dir)

    def search(self, queries: np.ndarray, k=5, nprobe=4, *, vec_col="embedding",
               id_col="vec_id", query_ids=None):
        import os

        import ray.data as rd

        q_unit = _unit_rows(np.asarray(queries, np.float64))
        probe = np.argsort(-(q_unit @ self.centroids.T), axis=1)[:, :nprobe]
        lists = np.unique(probe)
        import glob

        dirs = [
            os.path.join(self.index_dir, f"list_id={int(l)}")
            for l in lists
            if os.path.isdir(os.path.join(self.index_dir, f"list_id={int(l)}"))
        ]
        # read_parquet accepts a list of FILES, not of directories
        paths = sorted(
            f for d in dirs for f in glob.glob(os.path.join(d, "*.parquet"))
        )
        self.last_probe_paths_ = paths
        if not paths:
            return pd.DataFrame(
                {"query": pd.Series([], dtype=np.int64),
                 id_col: pd.Series([], dtype=np.int64),
                 "cosine": pd.Series([], dtype=np.float64),
                 "rank": pd.Series([], dtype=np.int64)}
            )
        cand = rd.read_parquet(paths, columns=[id_col, vec_col])
        return brute_force_topk(
            cand, queries, k, vec_col=vec_col, id_col=id_col, query_ids=query_ids
        )
