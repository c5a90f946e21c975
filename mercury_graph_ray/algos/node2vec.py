"""Node2Vec-style distributed walk embedding (reference:
mercury/graph/embeddings/spark_node2vec.py:115-353).

Surface reproduced:
- ``sampling_ratio``: Bernoulli selection of source nodes — seeded
  hash-of-id mask instead of the reference's unseeded ``rand()``
  (spark_node2vec.py:263-268; determinism per SURVEY.md §2.6 W9);
- ``num_paths_per_node`` walkers per sampled source
  (metamorphic contract: 3x paths for 3x the parameter,
  unit_tests/test_ml_spark_node2vec.py:104-127);
- ``num_epochs`` steps of weighted inverse-CDF walking on the
  partitioned CSR (dead ends halt the walk, :95-102);
- **path cache**: walks are materialized to parquet under
  ``path_cache/block=<i>/`` and reloaded with ``use_cached_rw``
  (spark_node2vec.py:138-180 — the reference's only resume mechanism;
  generalized engine-wide by state/checkpoint.py);
- walk-length filter ``len > 1`` before training (:140-143);
- ``embedding()`` / ``get_most_similar_nodes`` on the trained vectors.

Training: the reference fits Spark Word2Vec (:182-192). This container
has no gensim/Spark, so training uses gensim when importable and
otherwise falls back to the in-repo elliptic-rotation trainer
(algos/embeddings.py) over (consecutive-pair converge, seeded-random
diverge) pairs from the same walks — a real, deterministic embedding
with the same API shape.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.embeddings import Embeddings
from mercury_graph_ray.algos.randomwalk import RandomWalker


def _stable_mask(keys, ratio: float, seed: int) -> np.ndarray:
    """Deterministic Bernoulli(ratio) per key via blake2b hashing."""
    import hashlib

    out = np.empty(len(keys), bool)
    for i, k in enumerate(keys):
        h = hashlib.blake2b(f"{seed}:{k}".encode(), digest_size=8).digest()
        out[i] = int.from_bytes(h, "little") / 2**64 < ratio
    return out


class Node2Vec(BaseClass):
    def __init__(
        self,
        dimension: int = 16,
        sampling_ratio: float = 1.0,
        num_epochs: int = 10,
        num_paths_per_node: int = 1,
        learn_step: float = 3,
        path_cache: str | None = None,
        use_cached_rw: bool = False,
        w2v_epochs: int = 5,
        seed: int = 42,
        n_parts: int | None = None,
    ):
        self.dimension = dimension
        self.sampling_ratio = sampling_ratio
        self.num_epochs = num_epochs
        self.num_paths_per_node = num_paths_per_node
        self.learn_step = learn_step
        self.path_cache = path_cache
        self.use_cached_rw = use_cached_rw
        self.w2v_epochs = w2v_epochs
        self.seed = seed
        self.n_parts = n_parts

    # ------------------------------------------------------------- walks
    def _generate_paths(self, g) -> pd.DataFrame:
        node_keys = sorted(g.nodes.select_columns(["id"]).to_pandas()["id"])
        if self.sampling_ratio < 1.0:
            mask = _stable_mask(node_keys, self.sampling_ratio, self.seed)
            node_keys = [k for k, m in zip(node_keys, mask) if m]
        if not node_keys:
            raise ValueError("sampling_ratio selected no source nodes")
        frames = []
        for copy in range(self.num_paths_per_node):
            rw = RandomWalker(
                num_epochs=self.num_epochs,
                seed=self.seed * 1000 + copy,
                n_parts=self.n_parts,
            ).fit(g, source_id=node_keys)
            frames.append(rw.paths_.to_pandas())
        return pd.concat(frames, ignore_index=True)

    def fit(self, g) -> "Node2Vec":
        import ray.data as rd

        if self.use_cached_rw:
            if not self.path_cache:
                raise ValueError("use_cached_rw requires path_cache")
            paths = rd.read_parquet(self.path_cache).to_pandas()
            paths["random_walks"] = paths["random_walks"].map(list)
            paths["weights"] = paths["weights"].map(list)
        else:
            paths = self._generate_paths(g)
            if self.path_cache:
                # reference layout: one block dir per walk batch
                # (spark_node2vec.py:145-180)
                os.makedirs(self.path_cache, exist_ok=True)
                per_block = max(1, len(paths) // max(1, self.num_paths_per_node))
                for i in range(0, len(paths), per_block):
                    rd.from_pandas(paths.iloc[i : i + per_block]).write_parquet(
                        os.path.join(self.path_cache, f"block={i // per_block}"),
                        mode="overwrite",
                    )
        paths = paths[paths["random_walks"].map(len) > 1].reset_index(drop=True)
        self.paths_ = paths

        # flatten the walk corpus once: vocab + skip-gram pairs are pure
        # numpy (unique/return_inverse + offset masks), no per-sentence loop
        lens = paths["random_walks"].map(len).to_numpy(np.int64)
        flat = np.concatenate(
            [np.asarray(s, dtype="U") for s in paths["random_walks"]]
        ) if lens.sum() else np.empty(0, "U1")
        vocab_arr, inv = np.unique(flat, return_inverse=True)
        vocab = vocab_arr.tolist()
        self.node_ids = vocab

        # consecutive (i, i+1) pairs that do not cross a sentence boundary
        mask = np.ones(max(len(flat), 1), bool)
        mask[np.cumsum(lens) - 1] = False
        mask = mask[: max(len(flat) - 1, 0)]
        i_pos = np.nonzero(mask)[0]
        a, b = inv[i_pos], inv[i_pos + 1]

        try:
            from gensim.models import Word2Vec  # noqa: F401

            sentences = [list(map(str, p)) for p in paths["random_walks"]]
            model = Word2Vec(
                sentences,
                vector_size=self.dimension,
                epochs=self.w2v_epochs,
                seed=self.seed,
                min_count=1,
            )
            self._vectors = np.stack([model.wv[w] for w in vocab])
            self.trainer_ = "gensim"
        except ImportError:
            em = Embeddings(
                dimension=self.dimension,
                num_elements=len(vocab),
                learn_step=self.learn_step,
                seed=self.seed,
            )
            conv = np.stack([a, b], 1)
            if len(vocab) >= 2:
                # negative samples: rejection-resample collisions in bulk
                rng = np.random.default_rng([self.seed, 17])
                other = rng.integers(0, len(vocab), len(a))
                bad = (other == a) | (other == b)
                while bad.any():
                    other[bad] = rng.integers(0, len(vocab), int(bad.sum()))
                    bad = (other == a) | (other == b)
                div = np.stack([a, other], 1)
            else:
                div = np.empty((0, 2), np.int64)
            for _ in range(self.w2v_epochs):
                em.fit(converge=conv, diverge=div)
            self._vectors = em.embeddings_matrix_
            self.trainer_ = "elliptic-fallback"
        return self

    # ----------------------------------------------------------- queries
    def embedding(self) -> pd.DataFrame:
        return pd.DataFrame({"node_id": self.node_ids, "vector": list(self._vectors)})

    def get_most_similar_nodes(self, node_id, k: int = 5) -> pd.DataFrame:
        i = self.node_ids.index(str(node_id))
        m = self._vectors
        sims = (m @ m[i]) / (
            np.linalg.norm(m, axis=1) * np.linalg.norm(m[i]) + 1e-12
        )
        order = np.argsort(-sims, kind="stable")
        order = order[order != i][:k]
        return pd.DataFrame(
            {"word": [self.node_ids[j] for j in order], "similarity": sims[order]}
        )

    def save(self, path: str):
        import pickle

        with open(path, "wb") as f:
            pickle.dump(
                {"node_ids": self.node_ids, "vectors": self._vectors,
                 "dimension": self.dimension}, f
            )

    @classmethod
    def load(cls, path: str) -> "Node2Vec":
        import pickle

        with open(path, "rb") as f:
            d = pickle.load(f)
        obj = cls(dimension=d["dimension"])
        obj.node_ids = d["node_ids"]
        obj._vectors = d["vectors"]
        return obj
