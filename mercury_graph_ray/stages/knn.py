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


def exact_cosine_pairs(ds, threshold: float, *, vec_col="embedding", id_col="vec_id"):
    """Exact all-pairs cosine similarity ≥ ``threshold`` (pairs a < b).

    The exactness BASELINE for the LSH near-dup path
    (stages/dedup.embedding_dup_pairs): the full unit-row matrix is
    broadcast once (``ray.put``), the table streams through one
    ``map_batches`` pass computing a (batch × n) matmul — no shuffle.
    O(n²) similarity work and an O(n·d) broadcast: correct and fast up to
    ~10^6 vectors; at corpus scale use the hyperplane-LSH bucketed path
    and keep this as its recall oracle on samples.
    """
    import ray

    mats, idss = [], []
    for t in ds.select_columns([id_col, vec_col]).iter_batches(batch_format="pyarrow"):
        mats.append(np.stack(t[vec_col].to_pylist()).astype(np.float64))
        idss.append(
            t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        )
    all_ids = np.concatenate(idss)
    ref = ray.put((_unit_rows(np.vstack(mats)), all_ids))

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
