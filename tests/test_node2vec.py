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
