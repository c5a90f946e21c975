"""Strongly connected components vs exact networkx oracles.

FW-BW min-color peeling on the BSP engine (algos/scc.py): label parity
(scc = min member id), size parity, bowtie structure, duplicate/self-loop
invariance, and the directed-only contract.
"""

import networkx as nx
import pandas as pd
import pytest

from mercury_graph_ray.algos.scc import StronglyConnectedComponents
from mercury_graph_ray.graph import Graph


def _nx_labels(G):
    want = {}
    for comp in nx.strongly_connected_components(G):
        m = min(comp)
        for v in comp:
            want[v] = m
    return want


def _check(G, n_parts=4):
    df = pd.DataFrame([(int(u), int(v)) for u, v in G.edges()], columns=["src", "dst"])
    s = StronglyConnectedComponents(n_parts=n_parts).fit(Graph(df))
    out = s.components_.to_pandas()
    got = dict(zip(out["id"], out["scc"]))
    want = _nx_labels(G)
    # nodes() may include isolated vertices nx keeps but an edge list drops
    assert got == {v: m for v, m in want.items() if v in got}
    assert set(got) == {v for v in want if G.degree(v) > 0 or v in got}
    sizes = dict(zip(out["id"], out["scc_size"]))
    from collections import Counter

    want_sizes = Counter(want.values())
    for v in got:
        assert sizes[v] == want_sizes[want[v]], v
    assert s.n_components_ == len({want[v] for v in got})
    return s


def test_scc_random_digraphs(ray_session):
    for seed, n, p in [(3, 150, 0.02), (9, 300, 0.008)]:
        _check(nx.gnp_random_graph(n, p, seed=seed, directed=True))


def test_scc_bowtie(ray_session):
    # the web-graph shape the north star targets: IN tendril -> core -> OUT
    G = nx.DiGraph()
    core = nx.cycle_graph(20, create_using=nx.DiGraph)
    G.add_edges_from((u + 100, v + 100) for u, v in core.edges())  # core ids 100..119
    G.add_edges_from([(1, 2), (2, 3), (3, 100)])  # IN chain
    G.add_edges_from([(110, 200), (200, 201)])  # OUT chain
    G.add_edge(50, 50)  # self-loop singleton
    s = _check(G)
    out = s.components_.to_pandas()
    core_rows = out[out["scc"] == 100]
    assert len(core_rows) == 20 and (core_rows["scc_size"] == 20).all()
    # everything else is a singleton
    assert (out[out["scc"] != 100]["scc_size"] == 1).all()


def test_scc_duplicate_and_mutual_edges(ray_session):
    # duplicated rows and explicit mutual pairs: dups are collapsed by the
    # CSR semantics (min/any over multi-edges is idempotent)
    df = pd.DataFrame(
        {"src": [1, 2, 1, 2, 3, 3, 4], "dst": [2, 1, 2, 1, 4, 4, 3]}
    )
    s = StronglyConnectedComponents(n_parts=2).fit(Graph(df))
    out = s.components_.to_pandas()
    got = dict(zip(out["id"], out["scc"]))
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}
    assert s.n_components_ == 2


def test_scc_directed_only(ray_session):
    df = pd.DataFrame({"src": [1], "dst": [2]})
    g = Graph(df, keys={"directed": False})
    with pytest.raises(ValueError, match="directed"):
        StronglyConnectedComponents().fit(g)


def test_scc_chain_phase_peeling(ray_session):
    # a pure DAG chain of singletons peels one condensation layer per
    # phase; the label of every singleton is itself
    n = 8
    G = nx.path_graph(n, create_using=nx.DiGraph)
    s = _check(G, n_parts=2)
    assert s.n_components_ == n
    assert s.n_phases_ >= 2


def test_scc_checkpoint_resume(ray_session, tmp_path):
    """A run killed by the superstep budget mid-phase resumes from the
    last phase-boundary checkpoint to identical labels."""
    # two 5-cycles bridged by a DAG edge: exactly 2 peel phases
    edges = [(i, (i + 1) % 5) for i in range(5)]
    edges += [(10 + i, 10 + (i + 1) % 5) for i in range(5)]
    edges += [(0, 10)]
    df = pd.DataFrame(edges, columns=["src", "dst"])

    full = StronglyConnectedComponents(
        n_parts=2, checkpoint_dir=str(tmp_path / "full"), checkpoint_every=1
    ).fit(Graph(df))
    want = full.components_.to_pandas().sort_values("id").reset_index(drop=True)
    assert full.n_phases_ == 2

    ck = str(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="did not finish"):
        # budget ends during phase 2, after phase 1's checkpoint landed
        StronglyConnectedComponents(
            n_parts=2, max_iter=full.n_iter_ - 2, checkpoint_dir=ck,
            checkpoint_every=1,
        ).fit(Graph(df))

    resumed = StronglyConnectedComponents(
        n_parts=2, checkpoint_dir=ck, resume=True, checkpoint_every=1
    ).fit(Graph(df))
    assert resumed.n_phases_ == 2  # continued from the phase-1 checkpoint
    got = resumed.components_.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_scc_parallelism_invariance(ray_session):
    # labels are a pure function of the graph, not of the partitioning
    G = nx.gnp_random_graph(120, 0.02, seed=21, directed=True)
    df = pd.DataFrame([(u, v) for u, v in G.edges()], columns=["src", "dst"])
    outs = []
    for p in (2, 7):
        s = StronglyConnectedComponents(n_parts=p).fit(Graph(df))
        outs.append(
            s.components_.to_pandas().sort_values("id").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
