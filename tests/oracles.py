"""Driver-side oracles for the graph algorithms (networkx + pure python).

networkx is the same oracle the reference's own networkx backend uses
(mercury/graph/core/graph.py:681-720); nx.pagerank needs scipy (absent in
this sandbox) so we use networkx's pure-Python implementation, which is
the published reference semantics itself.
"""

from __future__ import annotations

import networkx as nx
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python


def nx_digraph(edge_df, weighted=True):
    g = nx.DiGraph()
    for r in edge_df.itertuples():
        w = float(r.weight) if weighted and hasattr(r, "weight") else 1.0
        if g.has_edge(r.src, r.dst):
            g[r.src][r.dst]["weight"] += w
        else:
            g.add_edge(r.src, r.dst, weight=w)
    return g


def oracle_pagerank(edge_df, weighted=True, **kw):
    return _pagerank_python(nx_digraph(edge_df, weighted), **kw)


def oracle_components(edge_df):
    """{node: (component_min_id, size)} over the undirected view."""
    g = nx_digraph(edge_df).to_undirected()
    out = {}
    for comp in nx.connected_components(g):
        cid = min(comp)
        for v in comp:
            out[v] = (cid, len(comp))
    return out


def oracle_triangles(edge_df):
    g = nx_digraph(edge_df).to_undirected()
    g.remove_edges_from(nx.selfloop_edges(g))
    return nx.triangles(g)


def oracle_lpa(edge_df, weighted=True, max_iter=30):
    """Synchronous LPA with our frozen tie rule, plain python."""
    g = nx_digraph(edge_df, weighted).to_undirected()
    # nx.to_undirected keeps one weight per pair; mirror engine semantics:
    # undirected closure takes MAX weight of the two directions
    und = {}
    for u, v, d in nx_digraph(edge_df, weighted).edges(data=True):
        k = (u, v) if u <= v else (v, u)
        und[k] = max(und.get(k, 0.0), d["weight"])
    nodes = sorted(g.nodes())
    labels = {v: v for v in nodes}
    for _ in range(max_iter):
        new = {}
        for v in nodes:
            scores = {}
            for (a, b), w in und.items():
                u = None
                if a == v and b != v:
                    u = b
                elif b == v and a != v:
                    u = a
                elif a == v and b == v:
                    u = v  # self-loop: neighbor is itself
                if u is not None:
                    lab = labels[u]
                    scores[lab] = scores.get(lab, 0.0) + w
            if not scores:
                new[v] = labels[v]
            else:
                # max weight; tie -> smaller label (engine's frozen rule)
                new[v] = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if new == labels:
            return new, True
        labels = new
    return labels, False


def oracle_hits(edge_df, max_iter=20):
    """Dense-numpy HITS with the frozen algos/hits.py semantics:
    hub0 = 1/N, authority = W^T hub then L1-normalize, hub = W authority
    then L1-normalize, exactly max_iter iterations."""
    import numpy as np

    nodes = sorted(set(edge_df["src"]) | set(edge_df["dst"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in zip(edge_df["src"], edge_df["dst"], edge_df["weight"]):
        W[idx[s], idx[d]] += w
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(max_iter):
        auth = W.T @ hub
        s = auth.sum()
        auth = auth / (s if s > 0 else 1.0)
        hub = W @ auth
        s = hub.sum()
        hub = hub / (s if s > 0 else 1.0)
    return {v: (auth[idx[v]], hub[idx[v]]) for v in nodes}
