"""Parity tests transcribed from the reference's unit tests:
transition (test_ml_transition.py:88-127), spectral clustering
(test_ml_spectral.py:41-98), spreading activation
(test_ml_spark_spreadactivation.py:53-176)."""

import numpy as np
import pandas as pd

from mercury_graph_ray.algos.spectral import SpectralClustering
from mercury_graph_ray.algos.spread_activation import SpreadingActivation
from mercury_graph_ray.algos.transition import Transition
from mercury_graph_ray.graph import Graph


def cities_graph():
    df_edges = pd.DataFrame(
        {
            "src": ["Madrid", "Madrid", "Bilbao", "Bilbao", "Barcelona", "Barcelona"],
            "dst": ["Bilbao", "Barcelona", "Santander", "Algorta", "Reus", "Andorra"],
            "value": [50, 50, 25, 75, 25, 75],
        }
    )
    df_nodes = pd.DataFrame(
        {"node_id": ["Madrid", "Barcelona", "Bilbao", "Santander", "Andorra", "Reus", "Algorta"]}
    )
    return Graph(
        df_edges,
        keys={"src": "src", "dst": "dst", "weight": "value", "id": "node_id"},
        nodes=df_nodes,
    )


def influence_graph():
    df_edges = pd.DataFrame(
        [("A", "B", 5.0), ("A", "C", 2.0), ("B", "E", 8.0), ("C", "A", 1.0),
         ("D", "A", 8.0), ("D", "C", 2.0), ("E", "F", 3.0)],
        columns=["src", "dst", "weight"],
    )
    return Graph(df_edges)


def test_transition_exact(ray_session):
    t = Transition().fit(cities_graph())
    tm0 = t.to_pandas(num_iterations=0)
    assert tm0.loc["Madrid", "Bilbao"] == 0 and tm0.loc["Andorra", "Andorra"] == 1
    tm1 = t.to_pandas(num_iterations=1)
    assert tm1["Madrid"].sum() == 0 and tm1["Barcelona"].sum() == 0.5
    assert tm1.loc["Madrid", "Algorta"] == 0
    assert tm1.loc["Bilbao", "Algorta"] == 0.75
    assert tm1.loc["Reus", "Reus"] == 1
    tm2 = t.to_pandas(num_iterations=2)
    assert tm2.loc["Madrid", "Algorta"] == 0.375 and tm2.loc["Madrid", "Reus"] == 0.125
    # stationary: dangling states absorb everything
    tmk = t.to_pandas(num_iterations=2000)
    assert tmk.loc["Madrid", "Algorta"] == 0.375 and tmk.loc["Madrid", "Reus"] == 0.125
    assert np.allclose(tmk.sum(axis=1), 1.0)


def test_spectral_memberships(ray_session):
    df_edges = pd.DataFrame(
        {
            "src": ["a", "a", "a", "a", "b", "c", "e", "d", "d", "d", "g", "h", "f", "j", "j", "i"],
            "dst": ["b", "c", "e", "z", "c", "e", "d", "g", "f", "h", "f", "f", "j", "i", "l", "l"],
            "value": [1] * 16,
        }
    )
    g = Graph(df_edges, keys={"src": "src", "dst": "dst", "weight": "value"})
    sc = SpectralClustering(3, random_state=0).fit(g)
    labs = sc.labels_.set_index("node_id")["cluster"]
    assert len(labs) == 12
    assert labs["a"] == labs["b"] == labs["c"] == labs["e"]
    assert sc.modularity_ > 0
    # determinism
    sc2 = SpectralClustering(3, random_state=0).fit(g)
    assert sc2.labels_.equals(sc.labels_)


def test_spread_activation_conservation_and_reach(ray_session):
    sa = SpreadingActivation(spreading_factor=0.2, spreading_steps=2, n_parts=3).fit(
        influence_graph(), seed_nodes=["C", "D"]
    )
    res = sa.influences_.to_pandas().set_index("id")["influence"]
    assert round(res.sum(), 3) == 2.0
    assert set(res[res == 0].index) == {"E", "F"}
    assert set(res[res > 0].index) == {"A", "B", "C", "D"}


def test_spread_activation_exact_one_step(ray_session):
    sa = SpreadingActivation(
        spreading_factor=0.2, transfer_function="weighted", spreading_steps=1, n_parts=3
    ).fit(influence_graph(), seed_nodes=["D"])
    res = sa.influences_.to_pandas().set_index("id")["influence"]
    assert round(res["D"], 3) == 0.8
    assert round(res["C"], 3) == 0.04
    assert round(res["A"], 3) == 0.16

    sa = SpreadingActivation(
        spreading_factor=0.2, transfer_function="unweighted", spreading_steps=1, n_parts=3
    ).fit(influence_graph(), seed_nodes=["D"])
    res = sa.influences_.to_pandas().set_index("id")["influence"]
    assert round(res["D"], 3) == 0.8
    assert round(res["C"], 3) == 0.1
    assert round(res["A"], 3) == 0.1

    sa = SpreadingActivation(
        spreading_factor=0.6, transfer_function="weighted", spreading_steps=1, n_parts=3
    ).fit(influence_graph(), seed_nodes=["D"])
    res = sa.influences_.to_pandas().set_index("id")["influence"]
    assert round(res["D"], 3) == 0.4


def test_spread_activation_influenced_by(ray_session):
    sa = SpreadingActivation(
        spreading_factor=0.2, spreading_steps=2, influenced_by=True, n_parts=3
    ).fit(influence_graph(), seed_nodes=["A", "D"])
    res = sa.influences_.to_pandas().set_index("id")["influenced_by"]
    assert set(res["A"]) == {"A", "D"}
    assert set(res["B"]) == {"A", "D"}
    assert set(res["C"]) == {"A", "D"}
    assert set(res["D"]) == {"D"}
    assert set(res["E"]) == {"A"}
    assert len(res["F"]) == 0


def test_spread_activation_influenced_by_random_graph(ray_session):
    """Vectorized (dst, seed) pair-dedup tracking vs a driver-side set
    simulation of the reference semantics on a 300-node random graph."""
    rng = np.random.default_rng(11)
    src = rng.integers(0, 300, 1200)
    dst = rng.integers(0, 300, 1200)
    m = src != dst
    edges = pd.DataFrame(
        {"src": [f"v{s}" for s in src[m]], "dst": [f"v{d}" for d in dst[m]]}
    ).drop_duplicates()
    seeds = ["v3", "v77", "v150"]
    sa = SpreadingActivation(
        spreading_factor=0.3, transfer_function="unweighted",
        spreading_steps=3, influenced_by=True, n_parts=4,
    ).fit(Graph(edges), seed_nodes=seeds)
    res = sa.influences_.to_pandas().set_index("id")["influenced_by"]

    # driver-side simulation: per step every node's seed set flows to its
    # out-neighbours AND stays with the node (retention/sink terms are
    # always nonzero fractions of the prior influence when positive).
    out_nbrs: dict[str, set] = {}
    for s, d in edges.itertuples(index=False):
        out_nbrs.setdefault(s, set()).add(d)
    nodes = set(edges["src"]) | set(edges["dst"])
    cur = {v: ({v} if v in seeds else set()) for v in nodes}
    for _ in range(3):
        nxt = {v: set(cur[v]) for v in nodes}
        for v in nodes:
            for d in out_nbrs.get(v, ()):
                nxt[d] |= cur[v]
        cur = nxt
    assert len(res) == len(nodes)
    for v in nodes:
        assert set(res[v]) == cur[v], v


def test_spread_activation_seed_nodes_as_frame(ray_session):
    """Reference surface (test_ml_spark_spreadactivation.py:68-87):
    seed_nodes as a one-column DataFrame behaves like the list form, and
    total influence equals the seed count."""
    import pandas as pd

    from mercury_graph_ray.algos.spread_activation import SpreadingActivation

    sa_list = SpreadingActivation(spreading_steps=2).fit(
        influence_graph(), seed_nodes=["C", "D"]
    )
    sa_df = SpreadingActivation(spreading_steps=2).fit(
        influence_graph(), seed_nodes=pd.DataFrame({"id": ["C", "D"]})
    )
    a = sa_list.influences_.to_pandas().sort_values("id").reset_index(drop=True)
    b = sa_df.influences_.to_pandas().sort_values("id").reset_index(drop=True)
    assert a["id"].tolist() == b["id"].tolist()
    assert (a["influence"] - b["influence"]).abs().max() < 1e-12
    assert round(float(a["influence"].sum()), 3) == 2.0


def test_str_grows_after_fit(ray_session):
    """Reference contract (test_ml_spark_randomwalker.py:20-25): str() of
    an estimator is longer after fit and names the fitted attribute."""
    import pandas as pd

    from mercury_graph_ray.algos.randomwalk import RandomWalker
    from mercury_graph_ray.graph import Graph

    e = pd.DataFrame({"src": ["a", "b", "c"], "dst": ["b", "c", "a"],
                      "weight": [1.0, 1.0, 1.0]})
    rw = RandomWalker(num_epochs=2, n_parts=2)
    before = len(str(rw))
    rw.fit(Graph(e), source_id="a")
    after = str(rw)
    assert len(after) > before
    assert "paths_" in after


def test_influenced_by_distributed_decode_matches_broadcast(ray_session, monkeypatch):
    """Force the beyond-broadcast dictionary: influenced_by must decode
    via the distributed explode/join/regroup path to the same sets."""
    from mercury_graph_ray.algos.spread_activation import SpreadingActivation

    def _run():
        sa = SpreadingActivation(spreading_steps=2, influenced_by=True).fit(
            influence_graph(), seed_nodes=["A", "D"]
        )
        df = sa.influences_.to_pandas()
        df["influenced_by"] = df["influenced_by"].map(
            lambda a: tuple(sorted(map(str, a)))
        )
        return df.sort_values("id").reset_index(drop=True)

    fast = _run()
    import mercury_graph_ray.stages.ids as ids_mod

    monkeypatch.setattr(ids_mod, "BROADCAST_MAX_BYTES", 2)
    slow = _run()
    assert fast["id"].tolist() == slow["id"].tolist()
    assert (fast["influence"] - slow["influence"]).abs().max() < 1e-12
    assert fast["influenced_by"].tolist() == slow["influenced_by"].tolist()


def test_supplier_edges_join_fallback_matches_broadcast(ray_session):
    """supplier_customer_edges with broadcast_bytes=0 must take the
    bucketed hash-join path (fact-sized orders at 100 TB) and produce the
    identical edge table (VERDICT r2 next-round #6)."""
    from mercury_graph_ray.pipelines.tpch import supplier_customer_edges

    sf = "/root/testdata/sf0.001"
    fast = (
        supplier_customer_edges(sf)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    slow = (
        supplier_customer_edges(sf, broadcast_bytes=0)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert fast["src"].tolist() == slow["src"].tolist()
    assert fast["dst"].tolist() == slow["dst"].tolist()
    assert (fast["weight"] - slow["weight"]).abs().max() == 0.0
