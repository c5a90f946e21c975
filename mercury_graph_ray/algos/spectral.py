"""Spectral clustering (reference: mercury/graph/ml/spectral.py:18-183).

Semantics (the reference's networkx/local path, spectral.py:76-105):
normalized Laplacian of the undirected graph, eigendecomposition
(``numpy.linalg.eigh`` — scipy-free), first ``n_clusters`` eigenvectors,
seeded k-means on the embedded rows, labels + newman modularity.

Explicitly a small-graph driver-side op, exactly as in the reference
(its Spark path exists only as PowerIterationClustering — our
distributed analog of that family is the PageRank/GAS power iteration).
The reference's Spark id mapping uses ``monotonically_increasing_id``
(spectral.py:125-127, nondeterministic — SURVEY.md §2.6); we sort node
ids instead so results are reproducible.
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.base import BaseClass
import pandas as pd


def _kmeans(x: np.ndarray, k: int, seed: int, n_init: int = 10, iters: int = 100):
    """Seeded Lloyd k-means (numpy-only, deterministic)."""
    best_labels, best_inertia = None, np.inf
    rng = np.random.default_rng(seed if seed is not None else 0)
    for _ in range(n_init):
        cent = x[rng.choice(len(x), size=k, replace=False)]
        for _ in range(iters):
            d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            lab = d.argmin(axis=1)
            new = np.stack(
                [x[lab == c].mean(axis=0) if (lab == c).any() else cent[c] for c in range(k)]
            )
            if np.allclose(new, cent):
                cent = new
                break
            cent = new
        inertia = ((x - cent[lab]) ** 2).sum()
        if inertia < best_inertia - 1e-12:
            best_inertia, best_labels = inertia, lab
    return best_labels


class SpectralClustering(BaseClass):
    """``SpectralClustering(n_clusters).fit(g)`` sets ``labels_``
    (DataFrame node_id, cluster) and ``modularity_``."""

    def __init__(self, n_clusters: int = 2, random_state: int = 0, max_iterations: int = 10):
        self.n_clusters = n_clusters
        self.random_state = random_state
        self.max_iterations = max_iterations

    def fit(self, g) -> "SpectralClustering":
        cols = ["src", "dst"] + (["weight"] if g.weighted else [])
        df = g.edges.select_columns(cols).to_pandas()
        if "weight" not in df.columns:
            df["weight"] = 1.0
        ids = sorted(set(df["src"]).union(df["dst"]))
        idx = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        a = np.zeros((n, n), np.float64)
        si = df["src"].map(idx).to_numpy()
        di = df["dst"].map(idx).to_numpy()
        w = df["weight"].to_numpy(np.float64)
        # undirected adjacency (max weight per unordered pair, mirroring the
        # engine's undirected closure)
        np.maximum.at(a, (si, di), w)
        np.maximum.at(a, (di, si), w)
        deg = a.sum(axis=1)
        d_inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0)), 0.0)
        lap = np.eye(n) - (a * d_inv_sqrt[:, None]) * d_inv_sqrt[None, :]
        lap = (lap + lap.T) / 2.0
        _, v = np.linalg.eigh(lap)
        u = v[:, : self.n_clusters]
        labels = _kmeans(u, self.n_clusters, self.random_state)
        self.labels_ = pd.DataFrame({"node_id": ids, "cluster": labels})

        # newman modularity over the unweighted simple graph (reference's
        # _spark_modularity approximation, spectral.py:158-183)
        und = a > 0
        m_edges = int(np.triu(und).sum())
        q = 0.0
        deg_u = und.sum(axis=1)
        for c in range(self.n_clusters):
            members = np.flatnonzero(labels == c)
            l_c = int(np.triu(und[np.ix_(members, members)]).sum())
            k_c = int(deg_u[members].sum())
            q += (l_c / m_edges) - (k_c / (2 * m_edges)) ** 2
        self.modularity_ = q
        return self
