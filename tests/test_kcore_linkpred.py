"""k-core / link-prediction / assortativity vs exact networkx oracles.

Beyond-ref subgraph algorithms (SURVEY.md §2.11) over the shared
``algos.common.simple_pairs`` kernel: nx.k_core / nx.jaccard_coefficient /
nx.adamic_adar_index / nx.degree_assortativity_coefficient parity, the
empty-core schema contract, and the hub-cap approximation knob.
"""

import math

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from mercury_graph_ray.algos.kcore import KCore
from mercury_graph_ray.algos.linkpred import (
    DegreeAssortativity,
    EdgeSupport,
    LinkPrediction,
)
from mercury_graph_ray.graph import Graph


def _gnm(n, m, seed):
    G = nx.gnm_random_graph(n, m, seed=seed)
    df = pd.DataFrame([(int(u), int(v)) for u, v in G.edges()], columns=["src", "dst"])
    return G, df


def test_kcore_nx_parity(ray_session):
    G, df = _gnm(200, 500, seed=7)
    g = Graph(df)
    for k in (2, 3, 4):
        kc = KCore(k, n_parts=4).fit(g)
        got = sorted(r["id"] for r in kc.core_.take_all())
        want = sorted(nx.k_core(G, k).nodes())
        assert got == want, f"k={k}"
        assert kc.n_iter_ >= 1


def test_kcore_empty_core_keeps_schema(ray_session):
    # k above the degeneracy: the core is empty but the Dataset schema
    # (id, typed like the original keys) must survive — Ray's all-empty
    # datasets otherwise report schema() None. (to_pandas on a 0-row
    # Dataset still drops columns — a Ray quirk outside our control —
    # so the contract here is the schema + count.)
    G, df = _gnm(300, 450, seed=11)
    assert len(nx.k_core(G, 5).nodes()) == 0
    kc = KCore(5, n_parts=4).fit(Graph(df))
    assert kc.core_.schema().names == ["id"]
    assert kc.core_.count() == 0
    assert kc.core_.take_all() == []


def test_kcore_dedupes_and_ignores_direction(ray_session):
    # duplicate and reversed edges must not inflate degrees: a triangle
    # listed with every edge duplicated + reversed is still only a 2-core
    df = pd.DataFrame(
        {"src": [1, 2, 3, 2, 3, 1, 1, 2, 3], "dst": [2, 3, 1, 1, 2, 3, 2, 3, 1]}
    )
    kc3 = KCore(3, n_parts=2).fit(Graph(df))
    assert kc3.core_.count() == 0
    kc2 = KCore(2, n_parts=2).fit(Graph(df))
    assert sorted(r["id"] for r in kc2.core_.take_all()) == [1, 2, 3]


def test_kcore_invalid_k(ray_session):
    with pytest.raises(ValueError):
        KCore(0)


def test_kcore_peel_cascade_rounds(ray_session):
    # a path peels one layer per round from both ends: rounds scale with
    # the cascade depth, and the 2-core of a path is empty
    n = 12
    df = pd.DataFrame({"src": range(n - 1), "dst": range(1, n)})
    kc = KCore(2, n_parts=2).fit(Graph(df))
    assert kc.core_.count() == 0
    assert kc.n_iter_ >= n // 2


def _simple_undirected(df):
    und = nx.Graph()
    und.add_edges_from((u, v) for u, v in zip(df["src"], df["dst"]) if u != v)
    return und


def test_linkpred_nx_parity(ray_session):
    G, df = _gnm(120, 360, seed=3)
    lp = LinkPrediction(n_parts=4).fit(Graph(df))
    got = lp.scores_.to_pandas().set_index(["a", "b"])
    und = _simple_undirected(df)

    nonedges = [(u, v) for u, v in nx.non_edges(und)]
    jac = {(min(u, v), max(u, v)): p for u, v, p in nx.jaccard_coefficient(und, nonedges)}
    aa = {(min(u, v), max(u, v)): p for u, v, p in nx.adamic_adar_index(und, nonedges)}
    cn = {
        k: len(list(nx.common_neighbors(und, *k))) for k in jac
    }
    want_pairs = {k for k, c in cn.items() if c >= 1}
    assert set(got.index) == want_pairs
    for k in want_pairs:
        assert got.loc[k, "cn"] == cn[k]
        assert abs(got.loc[k, "jaccard"] - jac[k]) < 1e-12
        assert abs(got.loc[k, "adamic_adar"] - aa[k]) < 1e-9
        assert got.loc[k, "deg_a"] == und.degree(k[0])
        assert got.loc[k, "deg_b"] == und.degree(k[1])


def test_linkpred_top_deterministic_and_invalid_metric(ray_session):
    _, df = _gnm(80, 200, seed=5)
    lp = LinkPrediction(n_parts=4).fit(Graph(df))
    t1 = lp.top(10, "jaccard")
    t2 = lp.top(10, "jaccard")
    pd.testing.assert_frame_equal(t1, t2)
    assert len(t1) == 10
    # ties broken by (a, b): the sort keys are monotone
    keys = list(zip(-t1["jaccard"], t1["a"], t1["b"]))
    assert keys == sorted(keys)
    with pytest.raises(ValueError):
        lp.top(5, "katz")


def test_linkpred_max_degree_cap_drops_hub_wedges(ray_session):
    # star K1,4: every candidate pair's only common neighbor is the
    # degree-4 center; capping at 3 removes all wedges
    df = pd.DataFrame({"src": [0, 0, 0, 0], "dst": [1, 2, 3, 4]})
    full = LinkPrediction(n_parts=2).fit(Graph(df))
    assert len(full.scores_.to_pandas()) == 6  # C(4,2) leaf pairs
    capped = LinkPrediction(n_parts=2, max_degree=3).fit(Graph(df))
    assert len(capped.scores_.to_pandas()) == 0


def test_assortativity_nx_parity(ray_session):
    for seed, n, m in [(3, 120, 360), (9, 200, 400)]:
        G, df = _gnm(n, m, seed=seed)
        da = DegreeAssortativity(n_parts=4).fit(Graph(df))
        want = nx.degree_assortativity_coefficient(G)
        assert math.isfinite(da.assortativity_)
        assert abs(da.assortativity_ - want) < 1e-9


def test_assortativity_degenerate_variance_is_nan(ray_session):
    # k-regular graph: zero degree variance -> nan, matching nx's warning
    G = nx.cycle_graph(10)
    df = pd.DataFrame([(u, v) for u, v in G.edges()], columns=["src", "dst"])
    da = DegreeAssortativity(n_parts=2).fit(Graph(df))
    assert math.isnan(da.assortativity_)


def test_kcore_checkpoint_resume(ray_session, tmp_path):
    """A peel killed mid-cascade resumes from the last checkpoint (the
    persisted `newly` column carries the pending death announcements) to
    the identical core."""
    # path of 14 (peels ~7 rounds from both ends) + a surviving triangle
    n = 14
    edges = [(i, i + 1) for i in range(n - 1)] + [(100, 101), (101, 102), (102, 100)]
    df = pd.DataFrame(edges, columns=["src", "dst"])

    full = KCore(2, n_parts=2).fit(Graph(df))
    want = sorted(r["id"] for r in full.core_.take_all())
    assert want == [100, 101, 102]
    assert full.n_iter_ > 4

    ck = str(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="did not finish"):
        KCore(2, n_parts=2, max_iter=3, checkpoint_dir=ck, checkpoint_every=1).fit(
            Graph(df)
        )
    resumed = KCore(2, n_parts=2, checkpoint_dir=ck, resume=True,
                    checkpoint_every=1).fit(Graph(df))
    assert resumed.n_iter_ == full.n_iter_  # continued the same cascade
    assert sorted(r["id"] for r in resumed.core_.take_all()) == want


def test_edge_support_nx_parity(ray_session):
    """support = |common neighbors of the endpoints| per simple edge;
    embeddedness = the endpoint-neighborhood Jaccard minus endpoints."""
    from mercury_graph_ray.algos.linkpred import EdgeSupport

    G, df = _gnm(120, 420, seed=13)
    es = EdgeSupport(n_parts=4).fit(Graph(df))
    got = es.support_.to_pandas().set_index(["a", "b"])
    assert len(got) == G.number_of_edges()
    for (a, b), row in got.iterrows():
        cn = len(list(nx.common_neighbors(G, a, b)))
        assert row["support"] == cn, (a, b)
        denom = G.degree(a) + G.degree(b) - 2 - cn
        want = cn / denom if denom > 0 else 0.0
        assert abs(row["embeddedness"] - want) < 1e-12, (a, b)


def test_edge_support_isolated_edge_zero(ray_session):
    # a lone edge: no common neighbors, empty neighborhood union -> 0.0
    from mercury_graph_ray.algos.linkpred import EdgeSupport

    df = pd.DataFrame({"src": [1], "dst": [2]})
    es = EdgeSupport(n_parts=2).fit(Graph(df))
    out = es.support_.to_pandas()
    assert len(out) == 1
    assert out["support"].iloc[0] == 0 and out["embeddedness"].iloc[0] == 0.0


def test_ktruss_nx_parity(ray_session):
    from mercury_graph_ray.algos.ktruss import KTruss

    G, df = _gnm(150, 600, seed=7)
    g = Graph(df)
    for k in (3, 4):
        kt = KTruss(k, n_parts=4).fit(g)
        got = (
            sorted(map(tuple, kt.edges_.to_pandas()[["a", "b"]].to_numpy()))
            if kt.edges_.count()
            else []
        )
        want = sorted(tuple(sorted(e)) for e in nx.k_truss(G, k).edges())
        assert got == want, f"k={k}"
        assert kt.n_iter_ >= 1


def test_ktruss_incremental_sweeps_match_nx(ray_session):
    """Force every post-seed sweep down the incremental path
    (recount_frac=1.0 disables the adaptive full-recount fallback): the
    W_mixed − W_RR decrement must reproduce nx.k_truss exactly, and only
    sweep 1 may be a full wedge count (VERDICT r3 #4's sweep-cost
    criterion — later sweeps touch only the removal's neighborhood)."""
    from mercury_graph_ray.algos.ktruss import KTruss

    for seed, k in ((13, 4), (29, 3)):
        G, df = _gnm(150, 600, seed=seed)
        kt = KTruss(k, n_parts=4, recount_frac=1.0, recount_min_edges=0).fit(
            Graph(df)
        )
        got = (
            sorted(map(tuple, kt.edges_.to_pandas()[["a", "b"]].to_numpy()))
            if kt.edges_.count()
            else []
        )
        want = sorted(tuple(sorted(e)) for e in nx.k_truss(G, k).edges())
        assert got == want, f"seed={seed} k={k}"
        assert kt.sweep_modes_[0] == "full"
        assert all(m == "incr" for m in kt.sweep_modes_[1:]), kt.sweep_modes_
        assert len(kt.sweep_modes_) == kt.n_iter_


def test_ktruss_adaptive_picks_incremental_on_small_removal(ray_session):
    """A K6 clique (every edge support 4, never peeled at k=4) plus one
    pendant triangle (support-1 edges): sweep 2 removes only the small
    triangle fringe — under the default recount_frac the sweep must take
    the incremental path (recount_min_edges floored to 0 so the tiny
    test graph exercises the scale path) and still match nx."""
    from mercury_graph_ray.algos.ktruss import KTruss

    K = nx.complete_graph(6)
    K.add_edges_from([(0, 10), (1, 10)])  # triangle (0, 1, 10): support 1
    df = pd.DataFrame(
        {"src": [u for u, v in K.edges], "dst": [v for u, v in K.edges]}
    )
    kt = KTruss(4, n_parts=2, recount_min_edges=0).fit(Graph(df))
    got = sorted(map(tuple, kt.edges_.to_pandas()[["a", "b"]].to_numpy()))
    want = sorted(tuple(sorted(e)) for e in nx.k_truss(K, 4).edges())
    assert got == want
    assert "incr" in kt.sweep_modes_[1:], kt.sweep_modes_


def test_ktruss_triangle_free_is_empty(ray_session):
    # a tree has no triangles: every edge has support 0, the 3-truss dies
    # in one sweep (+ the certifying one)
    from mercury_graph_ray.algos.ktruss import KTruss

    df = pd.DataFrame({"src": [0, 0, 1, 1, 2], "dst": [1, 2, 3, 4, 5]})
    kt = KTruss(3, n_parts=2).fit(Graph(df))
    assert kt.edges_.count() == 0
    assert kt.n_iter_ <= 2
    with pytest.raises(ValueError):
        KTruss(1)


def test_kcore_and_truss_parallelism_invariance(ray_session):
    from mercury_graph_ray.algos.ktruss import KTruss

    G, df = _gnm(150, 500, seed=29)
    cores, trusses = [], []
    for p in (2, 7):
        g = Graph(df)  # fresh facade: caches are per-instance
        cores.append(sorted(r["id"] for r in KCore(3, n_parts=p).fit(g).core_.take_all()))
        kt = KTruss(3, n_parts=p).fit(g)
        trusses.append(
            sorted(map(tuple, kt.edges_.to_pandas()[["a", "b"]].to_numpy()))
            if kt.edges_.count()
            else []
        )
    assert cores[0] == cores[1]
    assert trusses[0] == trusses[1]


def test_core_numbers_nx_parity(ray_session):
    """Iterated h-index fixpoint == nx.core_number, and consistency with
    the fixed-k KCore vertex sets."""
    from mercury_graph_ray.algos.kcore import CoreNumbers

    G, df = _gnm(200, 500, seed=7)
    g = Graph(df)
    cn = CoreNumbers(n_parts=4).fit(g)
    got = {r["id"]: r["core"] for r in cn.core_numbers_.take_all()}
    want = nx.core_number(G)
    assert got == {v: c for v, c in want.items() if v in got}
    assert cn.n_iter_ >= 2
    # k-core == {v : core(v) >= k}
    for k in (2, 3):
        core_set = set(r["id"] for r in KCore(k, n_parts=4).fit(g).core_.take_all())
        assert core_set == {v for v, c in got.items() if c >= k}


def test_core_numbers_parallelism_invariance_and_shapes(ray_session):
    from mercury_graph_ray.algos.kcore import CoreNumbers

    _, df = _gnm(150, 450, seed=5)
    outs = []
    for p in (2, 7):
        cn = CoreNumbers(n_parts=p).fit(Graph(df))
        outs.append(
            cn.core_numbers_.to_pandas().sort_values("id").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # a path graph is 1-degenerate: every core number is 1
    path = pd.DataFrame({"src": range(9), "dst": range(1, 10)})
    cn = CoreNumbers(n_parts=2).fit(Graph(path))
    assert set(r["core"] for r in cn.core_numbers_.take_all()) == {1}


def test_linkpred_small_vs_distributed_paths(ray_session):
    """Round 5 dual-path: the driver-side vectorized scoring and the
    distributed wedge pipeline return identical candidate tables
    (forced via small_max_edges), with and without the hub cap."""
    G, df = _gnm(80, 320, seed=21)
    for cap in (None, 6):
        small = LinkPrediction(n_parts=4, max_degree=cap).fit(Graph(df))
        dist = LinkPrediction(n_parts=4, max_degree=cap, small_max_edges=0).fit(
            Graph(df)
        )
        cols = ["a", "b", "cn", "adamic_adar", "deg_a", "deg_b", "jaccard"]
        s = small.scores_.to_pandas()
        d = dist.scores_.to_pandas()
        if len(s) == 0 and len(d) == 0:
            continue
        s = s[cols].sort_values(["a", "b"]).reset_index(drop=True)
        d = d[cols].sort_values(["a", "b"]).reset_index(drop=True)
        assert len(s) == len(d)
        for c in cols:
            if c in ("adamic_adar", "jaccard"):
                assert np.allclose(s[c].to_numpy(np.float64),
                                   d[c].to_numpy(np.float64), atol=1e-12), c
            else:
                assert (s[c].astype(str).values == d[c].astype(str).values).all(), c


def test_edge_support_small_vs_distributed_paths(ray_session):
    """Round 5 dual-path: EdgeSupport's vectorized driver path equals
    the distributed wedge-count join bit-for-bit on support and to
    1e-12 on embeddedness."""
    G, df = _gnm(80, 320, seed=22)
    small = EdgeSupport(n_parts=4).fit(Graph(df))
    dist = EdgeSupport(n_parts=4, small_max_edges=0).fit(Graph(df))
    cols = ["a", "b", "support", "embeddedness"]
    s = small.support_.to_pandas()[cols].sort_values(["a", "b"]).reset_index(drop=True)
    d = dist.support_.to_pandas()[cols].sort_values(["a", "b"]).reset_index(drop=True)
    assert len(s) == len(d) > 0
    assert (s["support"].values == d["support"].values).all()
    assert np.allclose(s["embeddedness"], d["embeddedness"], atol=1e-12)
    assert (s["a"].astype(str).values == d["a"].astype(str).values).all()
