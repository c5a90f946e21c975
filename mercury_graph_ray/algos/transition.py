"""Markov transition matrices (reference: mercury/graph/ml/transition.py).

Semantics (transition.py:21-95, tested exactly by
unit_tests/test_ml_transition.py:88-127):
- ``fit(g)``: row-normalize the weighted adjacency into a row-stochastic
  transition matrix; dangling rows (no out-edges) become recurrent states
  (self-loop probability 1) — transition.py:50-63.
- ``to_pandas(num_iterations=k)``: dense ``T^k`` with node ids as
  index/columns, ascending order.

The normalization is the same per-source divide PageRank uses (CSR
``w_norm``); the dense matrix power is explicitly a small-graph
driver-side op (the reference holds the full dense matrix too). For the
distributed path use PageRank/GAS supersteps instead of matrix powers.
"""

from __future__ import annotations

import numpy as np

from mercury_graph_ray.base import BaseClass
import pandas as pd


class Transition(BaseClass):
    """``Transition().fit(g)`` sets ``fitted_graph_`` holding the
    row-stochastic matrix; ``to_pandas(k)`` returns T^k as a DataFrame."""

    def __init__(self):
        self.fitted_graph_ = None

    def fit(self, g) -> "Transition":
        from ray.data.aggregate import Sum

        edges = g.edges
        cols = ["src", "dst"] + (["weight"] if g.weighted else [])
        df = edges.select_columns(cols).to_pandas()
        if "weight" not in df.columns:
            df["weight"] = 1.0
        all_ids = set(df["src"]).union(df["dst"])
        if g._nodes is not None:  # isolated vertices become recurrent states
            all_ids |= set(g.nodes.select_columns(["id"]).to_pandas()["id"])
        ids = sorted(all_ids)
        idx = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        mat = np.zeros((n, n), np.float64)
        np.add.at(
            mat,
            (df["src"].map(idx).to_numpy(), df["dst"].map(idx).to_numpy()),
            df["weight"].to_numpy(np.float64),
        )
        row_sums = mat.sum(axis=1)
        dangling = row_sums == 0
        mat[dangling, :] = 0.0
        mat[np.flatnonzero(dangling), np.flatnonzero(dangling)] = 1.0
        row_sums[dangling] = 1.0
        self._matrix = mat / row_sums[:, None]
        self._ids = ids
        self.fitted_graph_ = g
        return self

    def to_pandas(self, num_iterations: int = 1) -> pd.DataFrame:
        if self.fitted_graph_ is None:
            raise RuntimeError("call fit() first")
        t = np.linalg.matrix_power(self._matrix, num_iterations)
        return pd.DataFrame(t, index=self._ids, columns=self._ids)
