"""Jones-Plassmann greedy coloring (algos/coloring.py): properness,
the exact JP fixpoint vs a driver-side replay, layout determinism, and
the vectorized mex kernel.
"""

import networkx as nx
import numpy as np
import pandas as pd

from mercury_graph_ray.algos.coloring import GreedyColoring, _mex_per_segment
from mercury_graph_ray.algos.mis import lcg_priority
from mercury_graph_ray.graph import Graph


def _gnm(n, m, seed):
    G = nx.gnm_random_graph(n, m, seed=seed)
    df = pd.DataFrame([(int(u), int(v)) for u, v in G.edges()], columns=["src", "dst"])
    return G, df


def _jp_replay(G):
    ids = sorted(G.nodes())
    prio = dict(zip(ids, lcg_priority(np.arange(len(ids)))))
    color = {}
    while len(color) < len(ids):
        for v in ids:
            if v in color:
                continue
            hi = [w for w in G[v] if prio[w] > prio[v]]
            if all(w in color for w in hi):
                used = {color[w] for w in hi}
                c = 0
                while c in used:
                    c += 1
                color[v] = c
    return color


def test_mex_per_segment():
    rows = np.array([5, 5, 5, 9, 9, 2, 5])
    cols = np.array([0, 1, 3, 1, 2, 0, 1])
    seg_rows, mex = _mex_per_segment(rows, cols)
    assert dict(zip(seg_rows, mex)) == {2: 1, 5: 2, 9: 0}


def test_coloring_proper_and_matches_replay(ray_session):
    G, df = _gnm(150, 450, seed=13)
    gc = GreedyColoring(n_parts=4).fit(Graph(df))
    got = {r["id"]: r["color"] for r in gc.colors_.take_all()}
    assert set(got) == set(G.nodes())
    assert all(got[u] != got[v] for u, v in G.edges())
    assert got == _jp_replay(G)
    assert gc.n_colors_ == max(got.values()) + 1


def test_coloring_deterministic_across_layout(ray_session):
    _, df = _gnm(120, 360, seed=21)
    import ray.data as rd

    a = GreedyColoring(n_parts=4).fit(Graph(df))
    b = GreedyColoring(n_parts=3).fit(
        Graph(rd.from_pandas(df.sample(frac=1, random_state=2)).repartition(7))
    )
    ga = sorted((r["id"], r["color"]) for r in a.colors_.take_all())
    gb = sorted((r["id"], r["color"]) for r in b.colors_.take_all())
    assert ga == gb


def test_coloring_star_and_isolated(ray_session):
    star = pd.DataFrame({"src": [0] * 6, "dst": [1, 2, 3, 4, 5, 6]})
    nodes = pd.DataFrame({"id": list(range(7)) + [42]})
    gc = GreedyColoring(n_parts=2).fit(Graph(star, nodes=nodes))
    got = {r["id"]: r["color"] for r in gc.colors_.take_all()}
    assert gc.n_colors_ == 2  # star is 2-colorable; isolated joins color 0
    assert got[42] == 0
    assert all(got[leaf] != got[0] for leaf in range(1, 7))
