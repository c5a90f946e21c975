"""Node2Vec surface tests (reference unit_tests/test_ml_spark_node2vec.py):
dead-end safety, num_paths scaling 3->9 (:104-127), path-cache
persistence equivalence (:129-151), save/load."""

import numpy as np
import pandas as pd

from mercury_graph_ray.algos.node2vec import Node2Vec
from mercury_graph_ray.graph import Graph


def deadend4():
    # test fixture deadend4 (FIXTURES.md): A->B(2), B->C(1), C->B(4), C->D(3)
    return Graph(
        pd.DataFrame(
            {
                "src": ["A", "B", "C", "C"],
                "dst": ["B", "C", "B", "D"],
                "weight": [2.0, 1.0, 4.0, 3.0],
            }
        )
    )


def test_deadend_walks_dont_crash(ray_session):
    nv = Node2Vec(dimension=8, num_epochs=6, num_paths_per_node=1, seed=3, n_parts=2)
    nv.fit(deadend4())
    assert nv.paths_.count() >= 1  # paths_ is a streamed walks Dataset
    emb = nv.embedding()
    assert set(emb.node_id) <= {"A", "B", "C", "D"}
    assert len(emb.vector.iloc[0]) == 8


def test_num_paths_scaling(ray_session):
    g = deadend4()
    p3 = Node2Vec(dimension=4, num_epochs=4, num_paths_per_node=3, seed=3, n_parts=2)
    p3.fit(g)
    g2 = deadend4()
    p9 = Node2Vec(dimension=4, num_epochs=4, num_paths_per_node=9, seed=3, n_parts=2)
    p9.fit(g2)
    # 3x the parameter -> 3x the generated walks (before the len>1 filter,
    # every source has at least one out-edge except D, which is dropped)
    assert p9.paths_.count() == 3 * p3.paths_.count()


def test_path_cache_roundtrip(ray_session, tmp_path):
    cache = str(tmp_path / "rw")
    g = deadend4()
    a = Node2Vec(dimension=4, num_epochs=5, seed=9, path_cache=cache, n_parts=2)
    a.fit(g)
    b = Node2Vec(dimension=4, num_epochs=5, seed=9, path_cache=cache,
                 use_cached_rw=True, n_parts=2)
    b.fit(deadend4())
    pa_ = sorted(tuple(p) for p in a.paths_.to_pandas()["random_walks"])
    pb = sorted(tuple(p) for p in b.paths_.to_pandas()["random_walks"])
    assert pa_ == pb
    np.testing.assert_allclose(
        np.stack(a.embedding().vector.to_numpy()),
        np.stack(b.embedding().vector.to_numpy()),
    )


def test_sampling_ratio_and_similarity(ray_session, tmp_path):
    g = deadend4()
    nv = Node2Vec(dimension=8, num_epochs=5, sampling_ratio=0.75, seed=5, n_parts=2)
    nv.fit(g)
    sim = nv.get_most_similar_nodes(nv.node_ids[0], k=2)
    assert len(sim) == 2
    assert set(sim.columns) == {"word", "similarity"}

    path = str(tmp_path / "n2v.bin")
    nv.save(path)
    nv2 = Node2Vec.load(path)
    assert nv2.node_ids == nv.node_ids
    np.testing.assert_array_equal(nv2._vectors, nv._vectors)


def test_gensim_path_streams_with_prebuilt_vocab(ray_session, monkeypatch):
    """The gensim branch must (a) feed the DISTRIBUTED frequency table to
    build_vocab_from_freq — never let gensim scan the corpus itself —
    and (b) hand train() a RESTARTABLE iterable (gensim re-iterates per
    epoch). Verified with an injected fake gensim module."""
    import sys
    import types

    calls = {}

    class FakeWv:
        def __init__(self, dim):
            self.dim = dim
            self.words = []

        def __getitem__(self, w):
            # deterministic per-token vector
            rng = np.random.default_rng(abs(hash(w)) % (2**32))
            return rng.standard_normal(self.dim).astype(np.float32)

    class FakeWord2Vec:
        def __init__(self, vector_size, epochs, seed, min_count):
            calls["ctor"] = dict(vector_size=vector_size, epochs=epochs,
                                 seed=seed, min_count=min_count)
            self.wv = FakeWv(vector_size)

        def build_vocab_from_freq(self, freq):
            calls["freq"] = dict(freq)

        def train(self, sentences, total_examples, epochs):
            # two full passes must yield identical corpora (restartable)
            p1 = [tuple(s) for s in sentences]
            p2 = [tuple(s) for s in sentences]
            assert p1 == p2 and len(p1) == total_examples
            calls["sentences"] = p1
            calls["total_examples"] = total_examples
            calls["epochs"] = epochs

    gensim = types.ModuleType("gensim")
    models = types.ModuleType("gensim.models")
    models.Word2Vec = FakeWord2Vec
    gensim.models = models
    monkeypatch.setitem(sys.modules, "gensim", gensim)
    monkeypatch.setitem(sys.modules, "gensim.models", models)

    nv = Node2Vec(dimension=6, num_epochs=5, w2v_epochs=3, seed=7, n_parts=2)
    nv.fit(deadend4())
    assert nv.trainer_ == "gensim"
    assert calls["ctor"]["vector_size"] == 6 and calls["epochs"] == 3

    # the fed frequencies must equal an exact driver-side recount of the
    # streamed corpus — proof no separate vocab scan is needed
    from collections import Counter

    recount = Counter(t for s in calls["sentences"] for t in s)
    assert calls["freq"] == dict(recount)
    assert sorted(calls["freq"]) == nv.node_ids
    assert nv._vectors.shape == (len(nv.node_ids), 6)
