"""Maximal independent set (deterministic-priority Luby, algos/mis.py).

No nx parity is possible (nx.maximal_independent_set is randomized), so
the suite checks the defining invariants — independence and domination —
plus determinism across partition counts / input layout, the
isolated-vertex rule, and a hand-replayed priority-round fixture that
pins the exact per-round semantics the SQL oracle mirrors.
"""

import networkx as nx
import numpy as np
import pandas as pd

from mercury_graph_ray.algos.mis import (
    MaximalIndependentSet,
    lcg_priority,
    PRIO_M,
)
from mercury_graph_ray.graph import Graph


def _gnm(n, m, seed):
    G = nx.gnm_random_graph(n, m, seed=seed)
    df = pd.DataFrame([(int(u), int(v)) for u, v in G.edges()], columns=["src", "dst"])
    return G, df


def _replay(G, prio):
    """Driver-side replay of the documented round semantics."""
    undec = set(G.nodes())
    mis, newly = set(), set()
    for _ in range(100):
        if not undec:
            break
        excl = {v for v in undec if any(w in newly for w in G[v])}
        undec -= excl
        newly = {
            v
            for v in undec
            if prio[v] < min((prio[w] for w in G[v] if w in undec | excl), default=1 << 62)
        }
        # note: min runs over the round-START undecided set = undec | excl
        mis |= newly
        undec -= newly
    assert not undec
    return mis


def test_mis_invariants_and_replay(ray_session):
    G, df = _gnm(150, 400, seed=3)
    g = Graph(df)
    mis = MaximalIndependentSet(n_parts=4).fit(g)
    got = sorted(r["id"] for r in mis.mis_.take_all())
    s = set(got)
    # independence
    assert not any(u in s and v in s for u, v in G.edges())
    # domination (maximality)
    assert all(v in s or any(w in s for w in G[v]) for v in G.nodes())
    # exact round replay: vid = rank of id in sorted order (stages/ids.py)
    ids = sorted(G.nodes())
    prio = dict(zip(ids, lcg_priority(np.arange(len(ids)))))
    assert s == _replay(G, prio)
    # status table: members are 1, everyone else 2 (dominated)
    st = {r["id"]: r["status"] for r in mis.status_.take_all()}
    assert set(st) == set(G.nodes())
    assert all((st[v] == 1) == (v in s) for v in G.nodes())


def test_mis_deterministic_across_layout(ray_session):
    _, df = _gnm(120, 300, seed=9)
    a = MaximalIndependentSet(n_parts=4).fit(Graph(df))
    import ray.data as rd

    shuffled = rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(7)
    b = MaximalIndependentSet(n_parts=3).fit(Graph(shuffled))
    assert sorted(r["id"] for r in a.mis_.take_all()) == sorted(
        r["id"] for r in b.mis_.take_all()
    )


def test_mis_isolated_and_duplicate_edges(ray_session):
    # isolated vertices (explicit nodes) always join; duplicate/reversed
    # edges collapse to the simple graph
    df = pd.DataFrame({"src": [1, 2, 1, 2], "dst": [2, 1, 2, 3]})
    nodes = pd.DataFrame({"id": [1, 2, 3, 99]})
    g = Graph(df, nodes=nodes)
    mis = MaximalIndependentSet(n_parts=2).fit(g)
    s = set(r["id"] for r in mis.mis_.take_all())
    assert 99 in s
    assert not ({1, 2} <= s) and not ({2, 3} <= s)
    # star graph: either the hub alone or all leaves
    star = pd.DataFrame({"src": [0] * 5, "dst": [1, 2, 3, 4, 5]})
    m2 = MaximalIndependentSet(n_parts=2).fit(Graph(star))
    s2 = set(r["id"] for r in m2.mis_.take_all())
    assert s2 == {0} or s2 == {1, 2, 3, 4, 5}


def test_lcg_priority_is_injective():
    v = np.arange(100_000)
    p = lcg_priority(v)
    assert len(np.unique(p)) == len(v)
    assert p.min() >= 0 and p.max() < PRIO_M
