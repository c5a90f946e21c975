"""Algorithm parity vs networkx / python oracles (BASELINE.json criteria:
PageRank allclose 1e-6; components and labels exact)."""

import numpy as np
import pandas as pd
import pytest

from mercury_graph_ray.algos.connected_components import ConnectedComponents
from mercury_graph_ray.algos.label_propagation import LabelPropagation
from mercury_graph_ray.algos.pagerank import PageRank
from mercury_graph_ray.algos.triangles import TriangleCount
from mercury_graph_ray.graph import Graph

from tests.oracles import (
    oracle_components,
    oracle_hits,
    oracle_lpa,
    oracle_pagerank,
    oracle_triangles,
)


def toy_edges():
    """Weighted digraph with a dangling node (f), a hub, and two components."""
    return pd.DataFrame(
        {
            "src": ["a", "a", "b", "c", "d", "d", "e", "b", "x", "y"],
            "dst": ["b", "c", "e", "a", "a", "c", "f", "a", "y", "z"],
            "weight": [5.0, 2.0, 8.0, 1.0, 8.0, 2.0, 3.0, 1.0, 2.0, 4.0],
        }
    )


def louvain9_edges():
    """The reference's Louvain fixture (unit_tests/test_ml_louvain.py:36-47):
    three 3-cliques-ish groups {0,1,2},{3,4,5},{6,7,8}."""
    e = [(1, 0), (2, 1), (3, 2), (4, 3), (5, 3), (5, 4), (7, 6), (8, 6)]
    return pd.DataFrame(
        {"src": [str(a) for a, _ in e], "dst": [str(b) for _, b in e], "weight": 1.0}
    )


@pytest.fixture(scope="module")
def pages_graph(ray_session):
    from mercury_graph_ray.pipelines.pages_to_edges import pages_to_edges
    from mercury_graph_ray.sources.pages import synth_pages

    edges = pages_to_edges(synth_pages(200, seed=42)).materialize()
    return Graph(edges), edges.to_pandas()


def test_pagerank_toy(ray_session):
    # default mode (float32 exchange payloads): nx parity at 1e-6 must
    # hold, sum-to-1 within the f32-accumulation drift bound
    df = toy_edges()
    pr = PageRank(n_parts=4).fit(Graph(df))
    got = pr.pagerank_.to_pandas().set_index("id")["rank"].to_dict()
    want = oracle_pagerank(df)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-7


def test_pagerank_toy_f64_payloads(ray_session):
    # float64 exchange: exact-arithmetic invariants (the mode the
    # 9-decimal DuckDB unroll oracle checks end-to-end)
    df = toy_edges()
    pr = PageRank(n_parts=4, payload_dtype="float64").fit(Graph(df))
    got = pr.pagerank_.to_pandas().set_index("id")["rank"].to_dict()
    want = oracle_pagerank(df)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_unweighted_and_parallelism_invariance(ray_session):
    df = toy_edges().drop(columns=["weight"])
    g1 = PageRank(n_parts=3).fit(Graph(df))
    g2 = PageRank(n_parts=7).fit(Graph(df))
    a = g1.pagerank_.to_pandas().set_index("id")["rank"]
    b = g2.pagerank_.to_pandas().set_index("id")["rank"]
    want = oracle_pagerank(df, weighted=False)
    for k, v in want.items():
        assert abs(a[k] - v) < 1e-6
        assert abs(b[k] - v) < 1e-6


def test_pagerank_pages(pages_graph):
    g, df = pages_graph
    pr = PageRank(n_parts=8).fit(g)
    got = pr.pagerank_.to_pandas().set_index("id")["rank"].to_dict()
    want = oracle_pagerank(df)
    assert set(got) == set(want)
    err = max(abs(got[k] - want[k]) for k in want)
    assert err < 1e-6, err


def test_connected_components_toy(ray_session):
    df = toy_edges()
    cc = ConnectedComponents(n_parts=4).fit(Graph(df))
    got = cc.components_.to_pandas()
    want = oracle_components(df)
    assert len(got) == len(want)
    for r in got.itertuples():
        cid, size = want[r.id]
        assert r.component == cid
        assert r.component_size == size
    assert cc.n_components_ == len({v[0] for v in want.values()})


def test_connected_components_pages(pages_graph):
    g, df = pages_graph
    cc = ConnectedComponents(n_parts=8).fit(g)
    got = cc.components_.to_pandas()
    want = oracle_components(df)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert (r.component, r.component_size) == want[r.id]


def test_lpa_louvain9_communities(ray_session):
    df = louvain9_edges()
    lp = LabelPropagation(n_parts=4).fit(Graph(df))
    got = lp.labels_.to_pandas().set_index("id")["label"].to_dict()
    want, _ = oracle_lpa(df)
    assert got == want


def test_lpa_exact_match_python_oracle(pages_graph):
    g, df = pages_graph
    lp = LabelPropagation(n_parts=8, max_iter=10).fit(g)
    got = lp.labels_.to_pandas().set_index("id")["label"].to_dict()
    want, _ = oracle_lpa(df, max_iter=10)
    assert got == want


def test_lpa_parallelism_invariance(ray_session):
    df = toy_edges()
    a = LabelPropagation(n_parts=2, max_iter=15).fit(Graph(df)).labels_.to_pandas()
    b = LabelPropagation(n_parts=9, max_iter=15).fit(Graph(df)).labels_.to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("id").reset_index(drop=True),
        b.sort_values("id").reset_index(drop=True),
    )


def test_seeded_lpa_brute_force_and_partition_invariance(ray_session):
    """Semi-supervised LPA: seeds keep their own frozen label; everyone
    else follows the frozen synchronous argmax rule. Brute-force python
    fixpoint oracle + identical output at two partition counts."""
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "src": [f"v{i}" for i in rng.integers(0, 24, 120)],
            "dst": [f"v{i}" for i in rng.integers(0, 24, 120)],
            "weight": rng.integers(1, 5, 120).astype(float),
        }
    )
    df = df[df.src != df.dst].reset_index(drop=True)
    seeds = ["v0", "v1", "v2"]

    # brute force on the symmetrized max-weight-collapsed graph (the
    # Graph.undirected_edges contract)
    und = {}
    for r in df.itertuples():
        und[(r.src, r.dst)] = max(und.get((r.src, r.dst), 0.0), r.weight)
        und[(r.dst, r.src)] = max(und.get((r.dst, r.src), 0.0), r.weight)
    nodes = sorted({v for e in und for v in e})
    lab = {v: v for v in nodes}
    for _ in range(15):
        inc = {v: {} for v in nodes}
        for (u, v), w in und.items():
            inc[v][lab[u]] = inc[v].get(lab[u], 0.0) + w
        new = {}
        for v in nodes:
            cands = dict(inc[v])
            cands[lab[v]] = max(cands.get(lab[v], 0.0), 0.0)
            best = sorted(cands.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = lab[v] if v in seeds else best
        if new == lab:
            break
        lab = new

    from mercury_graph_ray.algos.label_propagation import LabelPropagation

    got = (
        LabelPropagation(n_parts=3, max_iter=15)
        .fit(Graph(df), seed_ids=seeds)
        .labels_.to_pandas()
        .set_index("id")["label"]
        .to_dict()
    )
    assert got == lab
    for s in seeds:
        assert got[s] == s
    got2 = (
        LabelPropagation(n_parts=7, max_iter=15)
        .fit(Graph(df), seed_ids=seeds)
        .labels_.to_pandas()
        .set_index("id")["label"]
        .to_dict()
    )
    assert got2 == got


def test_triangles_toy(ray_session):
    # a-b, b-c, c-a triangle + pendant
    df = pd.DataFrame(
        {
            "src": ["a", "b", "c", "c", "a", "d"],
            "dst": ["b", "c", "a", "d", "b", "a"],
        }
    )
    tc = TriangleCount(n_parts=4).fit(Graph(df))
    got = tc.triangles_.to_pandas().set_index("id")["triangles"].to_dict()
    want = oracle_triangles(df.assign(weight=1.0))
    assert got == dict(want)
    assert tc.total_ == sum(want.values()) // 3


def test_triangles_pages(pages_graph):
    g, df = pages_graph
    tc = TriangleCount(n_parts=8).fit(g)
    got = tc.triangles_.to_pandas().set_index("id")["triangles"].to_dict()
    want = oracle_triangles(df)
    assert got == dict(want)


def test_triangles_join_orientation_path(ray_session, monkeypatch):
    """The > BROADCAST_MAX_VERTICES orientation path (two hash joins, no
    driver degree array) must match the broadcast path / nx oracle."""
    import mercury_graph_ray.algos.triangles as tri_mod

    df = pd.DataFrame(
        {
            "src": ["a", "b", "c", "c", "a", "d", "b", "e"],
            "dst": ["b", "c", "a", "d", "b", "a", "d", "a"],
        }
    )
    monkeypatch.setattr(tri_mod, "BROADCAST_MAX_VERTICES", 2)
    tc = TriangleCount(n_parts=4).fit(Graph(df))
    got = tc.triangles_.to_pandas().set_index("id")["triangles"].to_dict()
    want = oracle_triangles(df.assign(weight=1.0))
    assert got == dict(want)
    assert tc.total_ == sum(want.values()) // 3


def test_triangles_join_closure_path(ray_session, monkeypatch):
    """The > BROADCAST_MAX_EDGES closure path (bucketed wedge⋈edge hash
    join instead of the in-task broadcast searchsorted probe) must match
    the broadcast closure / nx oracle — forced-path parity, the knn.py
    discipline."""
    import mercury_graph_ray.algos.triangles as tri_mod

    df = pd.DataFrame(
        {
            "src": ["a", "b", "c", "c", "a", "d", "b", "e", "e"],
            "dst": ["b", "c", "a", "d", "b", "a", "d", "a", "b"],
        }
    )
    monkeypatch.setattr(tri_mod, "BROADCAST_MAX_EDGES", 0)
    tc = TriangleCount(n_parts=4).fit(Graph(df))
    got = tc.triangles_.to_pandas().set_index("id")["triangles"].to_dict()
    want = oracle_triangles(df.assign(weight=1.0))
    assert got == dict(want)
    assert tc.total_ == sum(want.values()) // 3


def test_oriented_triangles_forced_paths_agree(ray_session):
    """Both closure strategies, forced explicitly, return the identical
    triangle set on the same encoded graph."""
    from mercury_graph_ray.algos.common import simple_pairs
    from mercury_graph_ray.algos.triangles import oriented_triangles

    df = pd.DataFrame(
        {
            "src": ["a", "b", "c", "c", "a", "d", "b", "e", "e", "f"],
            "dst": ["b", "c", "a", "d", "b", "a", "d", "a", "b", "a"],
        }
    )
    g = Graph(df)
    vd, canon, degs = simple_pairs(g)

    def _tri_set(closure):
        t = oriented_triangles(canon, degs, vd.n, 4, closure=closure).to_pandas()
        return set(zip(t["a"], t["b"], t["center"]))

    bc, jn = _tri_set("broadcast"), _tri_set("join")
    assert bc == jn and len(bc) > 0


def test_isolated_nodes_full_node_set(ray_session):
    """ADVICE: explicit nodes tables with edge-free vertices — PageRank N
    includes them (reference runs nx over the full node set) and CC emits
    singleton components."""
    df = toy_edges()
    node_ids = sorted(set(df["src"]) | set(df["dst"]) | {"iso1", "iso2"})
    nodes = pd.DataFrame({"id": node_ids})

    g = Graph(df, nodes=nodes)
    pr = PageRank(n_parts=4).fit(g)
    got = pr.pagerank_.to_pandas().set_index("id")["rank"].to_dict()
    import networkx as nx
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    from tests.oracles import nx_digraph

    nxg = nx_digraph(df)
    nxg.add_nodes_from(["iso1", "iso2"])
    want = _pagerank_python(nxg)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6

    g2 = Graph(df, nodes=nodes)
    cc = ConnectedComponents(n_parts=4).fit(g2)
    comps = cc.components_.to_pandas().set_index("id")
    assert comps.loc["iso1", "component"] == "iso1"
    assert comps.loc["iso1", "component_size"] == 1
    assert comps.loc["iso2", "component_size"] == 1
    want_cc = oracle_components(df)
    for vid, (cid, size) in want_cc.items():
        assert comps.loc[vid, "component"] == cid
        assert comps.loc[vid, "component_size"] == size

    g3 = Graph(df, nodes=nodes)
    lp = LabelPropagation(n_parts=4, max_iter=10).fit(g3)
    labels = lp.labels_.to_pandas().set_index("id")["label"].to_dict()
    assert labels["iso1"] == "iso1" and labels["iso2"] == "iso2"

    g4 = Graph(df.drop(columns=["weight"]), nodes=nodes)
    tc = TriangleCount(n_parts=4).fit(g4)
    tri = tc.triangles_.to_pandas().set_index("id")["triangles"].to_dict()
    assert tri["iso1"] == 0 and tri["iso2"] == 0
    assert set(tri) == set(node_ids)


def test_bfs_distances_match_networkx(ray_session):
    """Multi-source BFS on the BSP engine: exact hop parity with
    nx.single_source_shortest_path_length, including isolated nodes
    (explicit nodes table) and an unreachable component (-1)."""
    import networkx as nx
    import pandas as pd

    from mercury_graph_ray.algos.bfs import BfsDistances
    from mercury_graph_ray.graph import Graph

    g = nx.erdos_renyi_graph(200, 0.02, seed=4)
    g.add_edge(300, 301)  # unreachable from the main component
    e = pd.DataFrame(
        {"src": [u for u, v in g.edges], "dst": [v for u, v in g.edges], "weight": 1.0}
    )
    nodes = pd.DataFrame({"id": list(g.nodes)})
    bd = BfsDistances(sources=["0", "5"], n_parts=4).fit(Graph(e, nodes=nodes))
    df = bd.distances_.to_pandas()
    df["id"] = df["id"].astype(int)
    for src in [0, 5]:
        want = nx.single_source_shortest_path_length(g, src)
        got = dict(zip(df["id"], df[f"hops_{src}"]))
        for n in g.nodes:
            assert got[n] == want.get(n, -1), (src, n)
    assert bd.n_iter_ <= 12


def test_bfs_unknown_source_raises(ray_session):
    import pandas as pd
    import pytest

    from mercury_graph_ray.algos.bfs import BfsDistances
    from mercury_graph_ray.graph import Graph

    e = pd.DataFrame({"src": ["a"], "dst": ["b"], "weight": [1.0]})
    with pytest.raises(ValueError, match="not in graph"):
        BfsDistances(sources=["zzz"]).fit(Graph(e))


def test_sssp_weighted_matches_networkx(ray_session):
    """weighted=True: non-negative-weight shortest-path costs match
    nx dijkstra exactly (float sums of identical weights)."""
    import networkx as nx
    import numpy as np
    import pandas as pd

    from mercury_graph_ray.algos.bfs import BfsDistances
    from mercury_graph_ray.graph import Graph

    rng = np.random.default_rng(8)
    g = nx.erdos_renyi_graph(120, 0.04, seed=8)
    for u, v in g.edges:
        g[u][v]["weight"] = float(rng.integers(1, 10))
    e = pd.DataFrame(
        {"src": [u for u, v in g.edges], "dst": [v for u, v in g.edges],
         "weight": [g[u][v]["weight"] for u, v in g.edges]}
    )
    bd = BfsDistances(sources=["3"], weighted=True, n_parts=4).fit(Graph(e))
    df = bd.distances_.to_pandas()
    df["id"] = df["id"].astype(int)
    got = dict(zip(df["id"], df["cost_3"]))
    want = nx.single_source_dijkstra_path_length(g, 3)
    for n in set(df["id"]):
        w = want.get(n, -1.0)
        assert abs(got[n] - w) < 1e-9, (n, got[n], w)


def test_bfs_closeness_attribute(ray_session):
    """closeness_ = n_reached / sum(dist over reached landmarks); 0.0 when
    nothing is at positive distance (ADVICE r2: the docstring promised the
    attribute but fit() never set it)."""
    from mercury_graph_ray.algos.bfs import BfsDistances

    df = toy_edges()
    b = BfsDistances(["a", "x"], undirected=True, n_parts=3).fit(Graph(df))
    d = b.distances_.to_pandas().set_index("id")
    c = b.closeness_.to_pandas().set_index("id")["closeness"]
    for v in d.index:
        hops = [d.loc[v, "hops_a"], d.loc[v, "hops_x"]]
        reached = [h for h in hops if h >= 0]
        want = len(reached) / sum(reached) if sum(reached) > 0 else 0.0
        assert abs(c[v] - want) < 1e-12, v


def test_bfs_harmonic_and_eccentricity_attributes(ray_session):
    """harmonic_ matches nx.harmonic_centrality(sources=landmarks) exactly
    on the reachable component; ecc_lb is the max landmark distance
    (-1 for vertices no landmark reaches)."""
    import networkx as nx

    from mercury_graph_ray.algos.bfs import BfsDistances

    g = nx.erdos_renyi_graph(150, 0.03, seed=6)
    g.add_edge(200, 201)  # component no landmark reaches
    e = pd.DataFrame({"src": [u for u, v in g.edges], "dst": [v for u, v in g.edges],
                      "weight": 1.0})
    b = BfsDistances(["0", "5", "9"], undirected=True, n_parts=4).fit(Graph(e))
    h = b.harmonic_.to_pandas().set_index("id")["harmonic"]
    ecc = b.ecc_.to_pandas().set_index("id")["ecc_lb"]
    want = nx.harmonic_centrality(g, sources=[0, 5, 9])
    d = {s: nx.single_source_shortest_path_length(g, s) for s in (0, 5, 9)}
    for v in g.nodes:
        assert abs(h[v] - want[v]) < 1e-12, v
        reach = [d[s][v] for s in d if v in d[s]]
        assert ecc[v] == (max(reach) if reach else -1), v
    assert ecc[200] == -1 and h[200] == 0.0


def _brandes_subset_oracle(G, sources):
    """Textbook Brandes (2001) dependency accumulation from a source
    subset — the exact float oracle for BetweennessLandmarks."""
    bc = {v: 0.0 for v in G}
    for s in sources:
        S, P = [], {v: [] for v in G}
        sigma = {v: 0.0 for v in G}
        D = {s: 0}
        sigma[s] = 1.0
        Q = [s]
        while Q:
            nxt = []
            for v in Q:
                S.append(v)
            for v in Q:
                for w in G[v]:
                    if w not in D:
                        D[w] = D[v] + 1
                        if w not in nxt:
                            nxt.append(w)
                    if D.get(w) == D[v] + 1:
                        sigma[w] += sigma[v]
                        P[w].append(v)
            Q = nxt
        delta = {v: 0.0 for v in G}
        for w in reversed(S):
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_landmarks_brandes_parity(ray_session):
    import networkx as nx

    from mercury_graph_ray.algos.betweenness import BetweennessLandmarks

    G = nx.erdos_renyi_graph(120, 0.05, seed=10)
    G.add_edge(300, 301)  # unreachable component: delta stays 0
    e = pd.DataFrame({"src": [u for u, v in G.edges], "dst": [v for u, v in G.edges]})
    srcs = [0, 3, 7]
    b = BetweennessLandmarks([str(s) for s in srcs], n_parts=4).fit(Graph(e))
    got = b.betweenness_.to_pandas().set_index("id")["betweenness"]
    want = _brandes_subset_oracle(G, srcs)
    for v in G.nodes:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert got[300] == 0.0 and got[301] == 0.0


def test_betweenness_all_sources_is_2x_networkx(ray_session):
    import networkx as nx

    from mercury_graph_ray.algos.betweenness import BetweennessLandmarks

    G = nx.erdos_renyi_graph(60, 0.08, seed=12)
    e = pd.DataFrame({"src": [u for u, v in G.edges], "dst": [v for u, v in G.edges]})
    # isolated vertices are not graph keys (edge-list ingest) and would
    # contribute zero dependency as sources anyway
    srcs = [str(v) for v in G.nodes if G.degree(v) > 0]
    b = BetweennessLandmarks(srcs, n_parts=4).fit(Graph(e))
    got = b.betweenness_.to_pandas().set_index("id")["betweenness"]
    want = nx.betweenness_centrality(G, normalized=False)
    for v in G.nodes:
        if G.degree(v) > 0:
            assert abs(got[v] - 2.0 * want[v]) < 1e-6, v


def test_betweenness_star_exact(ray_session):
    # star center lies on every leaf pair's unique shortest path:
    # from source leaf 1, delta(center) = number of other leaves
    from mercury_graph_ray.algos.betweenness import BetweennessLandmarks

    e = pd.DataFrame({"src": [0, 0, 0, 0], "dst": [1, 2, 3, 4]})
    b = BetweennessLandmarks(["1"], n_parts=2).fit(Graph(e))
    got = b.betweenness_.to_pandas().set_index("id")["betweenness"]
    assert got[0] == 3.0
    assert got[1] == 0.0 and got[2] == 0.0


def _path_edges(n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "src": [f"v{i:04d}" for i in range(n - 1)],
            "dst": [f"v{i + 1:04d}" for i in range(n - 1)],
            "weight": 1.0,
        }
    )


def test_cc_pointer_jumping_path_superstep_count(ray_session):
    """VERDICT r2 #10: min-hook + pointer jumping finishes a diameter-511
    path in O(log n) supersteps (pure propagation needs ~n), with output
    identical to the propagation fixed point."""
    import math

    n = 512
    df = pd.concat(
        [_path_edges(n), pd.DataFrame({"src": ["x1", "x2"], "dst": ["x2", "x3"], "weight": 1.0})],
        ignore_index=True,
    )
    cc = ConnectedComponents(n_parts=4, pointer_jumping=True).fit(Graph(df))
    # per round: 1 edge step + 2 supersteps per halving; ~log2(n) halvings
    assert cc.n_iter_ <= 2 * math.ceil(math.log2(n)) + 6, cc.n_iter_
    got = cc.components_.to_pandas().sort_values("id").reset_index(drop=True)
    assert cc.n_components_ == 2
    path_rows = got[got["id"].str.startswith("v")]
    assert (path_rows["component"] == "v0000").all()
    assert (path_rows["component_size"] == n).all()

    plain = ConnectedComponents(n_parts=4, pointer_jumping=False, max_iter=2000).fit(Graph(df))
    want = plain.components_.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert plain.n_iter_ >= n - 1  # the diameter cost the jump path removes


def test_cc_pointer_jumping_oracle(ray_session):
    """Jump path vs the python oracle on the toy graph (exact labels)."""
    df = toy_edges()
    cc = ConnectedComponents(n_parts=4, pointer_jumping=True).fit(Graph(df))
    got = cc.components_.to_pandas()
    want = oracle_components(df)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert (r.component, r.component_size) == want[r.id]


def test_cc_pointer_jumping_resume(ray_session, tmp_path):
    """Killed jump run resumes from the latest edge-step checkpoint to the
    same exact labels (superstep counts may differ across the kill)."""
    ck = str(tmp_path / "ck_jump")
    df = _path_edges(128)
    full = ConnectedComponents(n_parts=4, pointer_jumping=True).fit(Graph(df))
    want = full.components_.to_pandas().sort_values("id").reset_index(drop=True)

    try:
        ConnectedComponents(
            n_parts=4, max_iter=4, checkpoint_dir=ck, checkpoint_every=1,
            pointer_jumping=True,
        ).fit(Graph(df))
    except RuntimeError:
        pass  # kill point: not converged within 4 supersteps

    resumed = ConnectedComponents(
        n_parts=4, checkpoint_dir=ck, resume=True, checkpoint_every=1,
        pointer_jumping=True,
    ).fit(Graph(df))
    assert resumed.n_iter_ > 1  # really resumed from a mid-run checkpoint
    got = resumed.components_.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_hits_toy_f64(ray_session):
    # float64 payloads: the dense-numpy oracle must match ~exactly
    # (same IEEE ops modulo partition-partial summation order)
    from mercury_graph_ray.algos.hits import Hits

    df = toy_edges()
    h = Hits(max_iter=20, n_parts=4, payload_dtype="float64").fit(Graph(df))
    got = h.hits_.to_pandas().set_index("id")
    want = oracle_hits(df, max_iter=20)
    assert set(got.index) == set(want)
    for k, (a, hb) in want.items():
        assert abs(got.loc[k, "authority"] - a) < 1e-12
        assert abs(got.loc[k, "hub"] - hb) < 1e-12
    # L1 invariants: both columns normalized
    assert abs(got["authority"].sum() - 1.0) < 1e-9
    assert abs(got["hub"].sum() - 1.0) < 1e-9


def test_hits_parallelism_invariance(ray_session):
    from mercury_graph_ray.algos.hits import Hits

    df = toy_edges()
    a = Hits(max_iter=8, n_parts=2, payload_dtype="float64").fit(Graph(df))
    b = Hits(max_iter=8, n_parts=7, payload_dtype="float64").fit(Graph(df))
    pa = a.hits_.to_pandas().set_index("id").sort_index()
    pb = b.hits_.to_pandas().set_index("id").sort_index()
    assert np.allclose(pa["authority"], pb["authority"], atol=1e-12)
    assert np.allclose(pa["hub"], pb["hub"], atol=1e-12)


def test_hits_default_f32_close(ray_session):
    # default float32 exchange stays within f32 drift of the oracle
    from mercury_graph_ray.algos.hits import Hits

    df = toy_edges()
    h = Hits(max_iter=20, n_parts=3).fit(Graph(df))
    got = h.hits_.to_pandas().set_index("id")
    want = oracle_hits(df, max_iter=20)
    for k, (a, hb) in want.items():
        assert abs(got.loc[k, "authority"] - a) < 1e-5
        assert abs(got.loc[k, "hub"] - hb) < 1e-5


def test_personalized_pagerank_nx_parity(ray_session):
    # nx _pagerank_python with a uniform-over-seeds personalization dict
    # (teleport + dangling both follow p) — converged parity at 1e-6
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    from tests.oracles import nx_digraph

    df = toy_edges()
    seeds = ["a", "x"]
    pr = PageRank(n_parts=4, personalization=seeds, payload_dtype="float64").fit(Graph(df))
    got = pr.pagerank_.to_pandas().set_index("id")["rank"].to_dict()
    nxg = nx_digraph(df)
    want = _pagerank_python(nxg, personalization={s: 1.0 for s in seeds})
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6
    # mass concentrates on/near the seeds; unreachable-from-seed vertices
    # get 0 (z is 2 hops downstream of x so it keeps mass; f is reachable)
    assert got["a"] > 0.1 and got["x"] > 0.1


def test_personalized_pagerank_unknown_seed_raises(ray_session):
    with pytest.raises(ValueError):
        PageRank(personalization=["nope"]).fit(Graph(toy_edges()))


def test_clustering_coefficient_nx_parity(pages_graph):
    import networkx as nx

    from tests.oracles import nx_digraph

    g, df = pages_graph
    tc = TriangleCount(n_parts=8).fit(g)
    got = tc.clustering_.to_pandas().set_index("id")
    und = nx_digraph(df).to_undirected()
    und.remove_edges_from(nx.selfloop_edges(und))
    want = nx.clustering(und)
    assert set(got.index) == set(want)
    for k, v in want.items():
        assert abs(got.loc[k, "clustering"] - v) < 1e-12
        assert got.loc[k, "degree"] == und.degree(k)


def test_katz_centrality_nx_parity(ray_session):
    """Converged Katz (normalized) matches nx on directed AND undirected
    graphs; weighted=True uses edge weights in the incoming sum."""
    import networkx as nx

    from mercury_graph_ray.algos.katz import KatzCentrality

    G = nx.gnm_random_graph(150, 450, seed=4)
    e = pd.DataFrame({"src": [u for u, v in G.edges], "dst": [v for u, v in G.edges]})
    k = KatzCentrality(alpha=0.02, max_iter=2000, tol=1e-13, normalized=True,
                       n_parts=4).fit(Graph(e, keys={"directed": False}))
    got = k.katz_.to_pandas().set_index("id")["katz"]
    want = nx.katz_centrality(G, alpha=0.02, max_iter=2000, tol=1e-13)
    for v in G.nodes:
        assert abs(got[v] - want[v]) < 1e-8, v

    D = nx.gnp_random_graph(100, 0.05, seed=6, directed=True)
    de = pd.DataFrame({"src": [u for u, v in D.edges], "dst": [v for u, v in D.edges]})
    k2 = KatzCentrality(alpha=0.03, max_iter=2000, tol=1e-13, normalized=True,
                        n_parts=4).fit(Graph(de))
    got2 = k2.katz_.to_pandas().set_index("id")["katz"]
    want2 = nx.katz_centrality(D, alpha=0.03, max_iter=2000, tol=1e-13)
    for v in got2.index:
        assert abs(got2[v] - want2[v]) < 1e-8, v


def test_katz_fixed_iterations_and_weighted(ray_session):
    from mercury_graph_ray.algos.katz import KatzCentrality

    # star: after 2 binary iterations from 0, center = beta + alpha*L*beta
    e = pd.DataFrame({"src": [1, 2, 3], "dst": [0, 0, 0]})
    k = KatzCentrality(alpha=0.1, beta=1.0, max_iter=2, tol=0.0, n_parts=2).fit(Graph(e))
    got = k.katz_.to_pandas().set_index("id")["katz"]
    assert abs(got[0] - (1.0 + 0.1 * 3 * 1.0)) < 1e-15
    assert abs(got[1] - 1.0) < 1e-15
    assert k.n_iter_ == 2
    # weighted: doubled weight doubles the incoming term
    ew = pd.DataFrame({"src": [1], "dst": [0], "weight": [2.0]})
    kw = KatzCentrality(alpha=0.1, max_iter=2, tol=0.0, weighted=True, n_parts=2).fit(Graph(ew))
    gw = kw.katz_.to_pandas().set_index("id")["katz"]
    assert abs(gw[0] - (1.0 + 0.1 * 2.0)) < 1e-15


def test_katz_directed_duplicate_rows_collapse(ray_session):
    """Binary adjacency on a DIRECTED multigraph-ish table: duplicate
    (src, dst) rows count once (the documented distinct-edge semantics;
    ADVICE r3). weighted=True keeps the additive duplicate contribution."""
    from mercury_graph_ray.algos.katz import EigenvectorCentrality, KatzCentrality

    dup = pd.DataFrame({"src": [1, 1, 1, 2], "dst": [0, 0, 0, 0]})
    k = KatzCentrality(alpha=0.1, beta=1.0, max_iter=2, tol=0.0, n_parts=2).fit(Graph(dup))
    got = k.katz_.to_pandas().set_index("id")["katz"]
    # two DISTINCT in-edges, not four rows
    assert abs(got[0] - (1.0 + 0.1 * 2 * 1.0)) < 1e-15
    # weighted=True on the same table: duplicates sum (3x weight-1 + 1)
    kw = KatzCentrality(alpha=0.1, beta=1.0, max_iter=2, tol=0.0, weighted=True,
                        n_parts=2).fit(Graph(dup.assign(weight=1.0)))
    gw = kw.katz_.to_pandas().set_index("id")["katz"]
    assert abs(gw[0] - (1.0 + 0.1 * 4 * 1.0)) < 1e-15

    # eigenvector, directed, duplicates: one L1-scaled step on the
    # 2-cycle {0->1 (x3 rows), 1->0} must equal the distinct-edge run
    cyc = pd.DataFrame({"src": [0, 0, 0, 1], "dst": [1, 1, 1, 0]})
    ev = EigenvectorCentrality(max_iter=4, tol=0.0, n_parts=2).fit(Graph(cyc))
    got_dup = ev.eigenvector_.to_pandas().set_index("id")["eigenvector"]
    ev2 = EigenvectorCentrality(max_iter=4, tol=0.0, n_parts=2).fit(
        Graph(pd.DataFrame({"src": [0, 1], "dst": [1, 0]}))
    )
    got_dist = ev2.eigenvector_.to_pandas().set_index("id")["eigenvector"]
    for v in (0, 1):
        assert abs(got_dup[v] - got_dist[v]) < 1e-15


def test_eigenvector_centrality_nx_parity(ray_session):
    import networkx as nx

    from mercury_graph_ray.algos.katz import EigenvectorCentrality

    G = nx.gnm_random_graph(150, 500, seed=4)
    e = pd.DataFrame({"src": [u for u, v in G.edges], "dst": [v for u, v in G.edges]})
    ev = EigenvectorCentrality(max_iter=3000, tol=1e-12, normalized=True,
                               n_parts=4).fit(Graph(e, keys={"directed": False}))
    got = ev.eigenvector_.to_pandas().set_index("id")["eigenvector"]
    want = nx.eigenvector_centrality(G, max_iter=3000, tol=1e-12)
    for v in G.nodes:
        assert abs(got[v] - want[v]) < 1e-7, v
    assert ev.n_iter_ < 200  # the L1-residual stop rule actually fires

    D = nx.gnp_random_graph(120, 0.06, seed=10, directed=True)
    de = pd.DataFrame({"src": [u for u, v in D.edges], "dst": [v for u, v in D.edges]})
    ev2 = EigenvectorCentrality(max_iter=5000, tol=1e-12, normalized=True,
                                n_parts=4).fit(Graph(de))
    got2 = ev2.eigenvector_.to_pandas().set_index("id")["eigenvector"]
    want2 = nx.eigenvector_centrality(D, max_iter=5000, tol=1e-12)
    for v in got2.index:
        assert abs(got2[v] - want2[v]) < 1e-6, v
