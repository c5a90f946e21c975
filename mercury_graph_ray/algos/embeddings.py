"""Embeddings + CSR random-walk graph embedding (reference:
mercury/graph/embeddings/embeddings.py and graphembeddings.py).

``Embeddings`` reproduces the reference's elliptic-rotation learning rule
exactly (embeddings.py:9-23): for each (u, v) index pair, row u is
rotated along the ellipse through u and v by ``learn_step`` degrees —
toward v for converge pairs, away (negative sine) for diverge pairs;
``bidirectional`` applies the mirrored update too. The only deliberate
divergences: initialization and walks are seeded (the reference uses
bare ``np.random``, a reproducibility hazard flagged in SURVEY.md §4),
and similarity search is scipy-free.

``GraphEmbedding`` rebuilds the reference's flattened CSR arrays
(``r_ini/r_len/r_sum/r_col/r_wgt``, graphembeddings.py:150-182) over
content-ordered node ids, then performs ``n_jumps`` weighted random
walks emitting (visited-edge) converge pairs and (random non-edge)
diverge pairs (graphembeddings.py:24-65), feeds them to
``Embeddings.fit`` and supports the same bz2+pickle persistence with
header/trailer validation (graphembeddings.py:246-309). It is a
driver-side small-graph op exactly like the reference's; the distributed
walk surface is algos/randomwalk.py.
"""

from __future__ import annotations

import bz2
import pickle

import numpy as np

from mercury_graph_ray.base import BaseClass

FILE_HEAD = "mercury_graph_ray.GraphEmbedding.1.0"
FILE_END = "end"


def _elliptic_rotate(em, iu, iv, cos_w, sin_w):
    for i in range(len(iu)):
        j = int(iu[i])
        u = em[j]
        v = em[int(iv[i])]
        sc = np.dot(u, v) / np.dot(u, u)
        pv = sc * u
        tv = v - pv
        em[j] = cos_w * pv / sc + sin_w * tv
    return em


class Embeddings(BaseClass):
    """Dense embedding matrix + elliptic-rotation learning steps."""

    def __init__(self, dimension, num_elements=0, mean=0, sd=1, learn_step=3,
                 bidirectional=False, seed: int = 42):
        self.dimension = dimension
        self.num_elements = num_elements
        self.mean = mean
        self.sd = sd
        self.learn_step = learn_step
        self.bidirectional = bidirectional
        self.seed = seed
        if self.num_elements > 0:
            rng = np.random.default_rng([seed, num_elements, dimension])
            self.embeddings_matrix_ = rng.normal(
                self.mean, self.sd, (self.num_elements, self.dimension)
            )

    def fit(self, converge=None, diverge=None) -> "Embeddings":
        w = self.learn_step * np.pi / 180
        cos_w, sin_w = np.cos(w), np.sin(w)
        if converge is not None:
            self.embeddings_matrix_ = _elliptic_rotate(
                self.embeddings_matrix_, converge[:, 0], converge[:, 1], cos_w, sin_w
            )
            if self.bidirectional:
                self.embeddings_matrix_ = _elliptic_rotate(
                    self.embeddings_matrix_, converge[:, 1], converge[:, 0], cos_w, sin_w
                )
        if diverge is not None:
            self.embeddings_matrix_ = _elliptic_rotate(
                self.embeddings_matrix_, diverge[:, 0], diverge[:, 1], cos_w, -sin_w
            )
            if self.bidirectional:
                self.embeddings_matrix_ = _elliptic_rotate(
                    self.embeddings_matrix_, diverge[:, 1], diverge[:, 0], cos_w, -sin_w
                )
        return self

    def as_numpy(self):
        return getattr(self, "embeddings_matrix_", None)

    def get_most_similar_embeddings(self, index, k=5, metric="cosine"):
        m = self.as_numpy()
        q = m[index]
        if metric == "cosine":
            nm = np.linalg.norm(m, axis=1) * np.linalg.norm(q)
            nm[nm == 0] = 1.0
            similarities = (m @ q) / nm
        elif metric == "euclidean":
            similarities = 1.0 / (1.0 + np.linalg.norm(m - q, axis=1))
        else:
            raise ValueError("Unknown Distance Metric: %s" % metric)
        ordered = np.argsort(-similarities, kind="stable")
        ordered = ordered[ordered != index][:k]
        return ordered, similarities[ordered]


class GraphEmbedding(BaseClass):
    """Random-walk embedding over the reference's flattened CSR layout."""

    def __init__(self, dimension=None, n_jumps=None, max_per_epoch=None,
                 learn_step=3, bidirectional=False, load_file=None, seed: int = 42):
        if load_file is None and (dimension is None or n_jumps is None):
            raise ValueError(
                "Parameters dimension and n_jumps are required when load_file is None"
            )
        self.dimension = dimension
        self.n_jumps = n_jumps
        self.max_per_epoch = max_per_epoch
        self.learn_step = learn_step
        self.bidirectional = bidirectional
        self.seed = seed
        if load_file is not None:
            self._load(load_file)

    def __getitem__(self, arg):
        return self.embeddings_.embeddings_matrix_[self.node_ids.index(arg)]

    # ------------------------------------------------------------- fitting
    def _build_csr(self, g):
        cols = ["src", "dst"] + (["weight"] if g.weighted else [])
        df = g.edges.select_columns(cols).to_pandas()
        if "weight" not in df.columns:
            df["weight"] = 1.0
        ids = sorted(set(df["src"]).union(df["dst"]))
        idx = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        si = df["src"].map(idx).to_numpy(np.int64)
        di = df["dst"].map(idx).to_numpy(np.int64)
        w = df["weight"].to_numpy(np.float64)
        order = np.lexsort((di, si))
        si, di, w = si[order], di[order], w[order]
        r_len = np.bincount(si, minlength=n).astype(np.int64)
        r_ini = np.concatenate([[0], np.cumsum(r_len)[:-1]]).astype(np.int64)
        r_sum = np.bincount(si, weights=w, minlength=n)
        self.node_ids = list(ids)
        self.r_ini, self.r_len, self.r_sum = r_ini, r_len, r_sum
        self.r_col, self.r_wgt = di, w
        self.TotW = float(w.sum())

    def _random_node_weighted(self, rng):
        r = self.TotW * rng.random() - 1e-8
        i = 0
        while r > self.r_sum[i]:
            r -= self.r_sum[i]
            i += 1
        return i

    def fit(self, g) -> "GraphEmbedding":
        self._build_csr(g)
        n = len(self.node_ids)
        rng = np.random.default_rng([self.seed, self.n_jumps])
        max_jpe = self.max_per_epoch if self.max_per_epoch is not None else 2**62

        convrge = np.zeros((self.n_jumps, 2), np.int64)
        diverge = np.zeros((self.n_jumps, 2), np.int64)
        ori = self._random_node_weighted(rng)
        njm = 0
        for t in range(self.n_jumps):
            while self.r_len[ori] == 0 or njm >= max_jpe:
                ori = self._random_node_weighted(rng)
                njm = 0
            njm += 1
            rnd = self.r_sum[ori] * rng.random()
            rst = self.r_ini[ori]
            nxt = int(self.r_col[rst])
            for ic in range(self.r_len[ori]):
                nxt = int(self.r_col[rst + ic])
                wei = self.r_wgt[rst + ic]
                if wei >= rnd:
                    break
                rnd -= wei
            convrge[t] = (ori, nxt)
            oth = int(n * rng.random())
            while oth == ori or oth == nxt:
                oth = int(n * rng.random())
            diverge[t] = (ori, oth)
            ori = nxt

        self.embeddings_ = Embeddings(
            dimension=self.dimension,
            num_elements=n,
            learn_step=self.learn_step,
            bidirectional=self.bidirectional,
            seed=self.seed,
        )
        self.embeddings_.fit(converge=convrge, diverge=diverge)
        return self

    def embedding(self):
        return getattr(self, "embeddings_", None)

    def get_most_similar_nodes(self, node_id, k=5, metric="cosine"):
        import pandas as pd

        idx, sims = self.embeddings_.get_most_similar_embeddings(
            self.node_ids.index(node_id), k, metric
        )
        return pd.DataFrame(
            {"word": [self.node_ids[i] for i in idx], "similarity": sims}
        )

    # --------------------------------------------------------- persistence
    def save(self, file_name, save_embedding=True):
        with bz2.BZ2File(file_name, "w") as f:
            pickle.dump(FILE_HEAD, f)
            pickle.dump(save_embedding, f)
            pickle.dump(self.dimension, f)
            pickle.dump(self.node_ids, f)
            pickle.dump(self.r_ini, f)
            pickle.dump(self.r_len, f)
            pickle.dump(self.r_sum, f)
            pickle.dump(self.r_col, f)
            pickle.dump(self.r_wgt, f)
            pickle.dump(self.TotW, f)
            if save_embedding:
                pickle.dump(self.embeddings_.embeddings_matrix_, f)
            pickle.dump(FILE_END, f)

    def _load(self, file_name):
        with bz2.BZ2File(file_name, "r") as f:
            head = pickle.load(f)
            if head != FILE_HEAD:
                raise ValueError("Unsupported file format!")
            save_embedding = pickle.load(f)
            self.dimension = pickle.load(f)
            self.node_ids = pickle.load(f)
            self.r_ini = pickle.load(f)
            self.r_len = pickle.load(f)
            self.r_sum = pickle.load(f)
            self.r_col = pickle.load(f)
            self.r_wgt = pickle.load(f)
            self.TotW = pickle.load(f)
            if save_embedding:
                self.embeddings_ = Embeddings(self.dimension, 0)
                self.embeddings_.embeddings_matrix_ = pickle.load(f)
                self.embeddings_.num_elements = len(self.node_ids)
            end = pickle.load(f)
            if end != FILE_END:
                raise ValueError("Unsupported file format!")
