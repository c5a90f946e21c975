"""DagLongestPath: exact longest-path levels vs a networkx oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mercury_graph_ray.algos.dag import DagLongestPath
from mercury_graph_ray.graph import Graph


def _nx_levels(edges):
    import networkx as nx

    g = nx.DiGraph()
    g.add_edges_from(edges)
    lvl = {}
    for v in nx.topological_sort(g):
        lvl[v] = max((lvl[u] + 1 for u in g.predecessors(v)), default=0)
    return lvl


def _fit(edges, n_parts=4, **kw):
    df = pd.DataFrame(edges, columns=["src", "dst"])
    dlp = DagLongestPath(n_parts=n_parts, **kw).fit(Graph(rd.from_pandas(df)))
    got = dlp.levels_.to_pandas().sort_values("id")
    return dict(zip(got["id"], got["level"])), dlp


def test_chain_and_diamond_match_networkx(ray_session):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"),          # chain depth 3
        ("a", "d"),                                   # shortcut (ignored by max)
        ("a", "e"), ("e", "f"), ("d", "f"),           # diamond join
        ("g", "f"),                                   # extra source
    ]
    got, dlp = _fit(edges)
    want = _nx_levels(edges)
    assert got == want
    assert dlp.depth_ == max(want.values())


def test_parallelism_invariance_and_duplicate_edges(ray_session):
    rng = np.random.default_rng(5)
    src = rng.integers(0, 200, 1500)
    off = rng.integers(1, 40, 1500)
    edges = [(int(s), int(s + o)) for s, o in zip(src, off)]  # src<dst: acyclic
    edges += edges[:100]  # duplicates must count once (distinct=True)
    want = _nx_levels(edges)
    for p in (1, 4):
        got, dlp = _fit(edges, n_parts=p)
        assert got == want, f"n_parts={p}"
    assert dlp.n_iter_ >= dlp.depth_  # one superstep per level plus the quiet one


def test_cycle_raises(ray_session):
    with pytest.raises(RuntimeError, match="cycle"):
        _fit([("a", "b"), ("b", "c"), ("c", "a")])


def test_max_iter_raises(ray_session):
    with pytest.raises(RuntimeError, match="max_iter|cycle"):
        _fit([(i, i + 1) for i in range(30)], max_iter=5)


def test_undirected_rejected(ray_session):
    df = pd.DataFrame([("a", "b")], columns=["src", "dst"])
    g = Graph(rd.from_pandas(df), keys={"directed": False})
    with pytest.raises(ValueError, match="DIRECTED"):
        DagLongestPath().fit(g)
