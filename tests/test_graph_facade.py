"""Graph facade behavior matrix (reference unit_tests/test_core_graph.py):
toy_social fixture, keys remap, degrees, undirected closure, metrics."""

import json

import pandas as pd

from mercury_graph_ray.graph import Graph
from mercury_graph_ray.pipelines.viz import khop_subgraph, moebius_json


def toy_social():
    """test_core_graph.py:12-27: 7 people, 10 weighted directed edges,
    remapped columns."""
    edges = pd.DataFrame(
        {
            "Person_A": ["Alice", "Alice", "Alice", "Bob", "Bob", "Carol", "Dave",
                         "Eve", "Frank", "Grace"],
            "Person_B": ["Bob", "Carol", "Dave", "Carol", "Eve", "Dave", "Eve",
                         "Frank", "Grace", "Alice"],
            "Duration": [5.0, 2.0, 8.0, 1.0, 3.0, 2.0, 4.0, 1.0, 2.0, 6.0],
        }
    )
    nodes = pd.DataFrame(
        {
            "Name": ["Alice", "Bob", "Carol", "Dave", "Eve", "Frank", "Grace"],
            "Role": ["a", "b", "c", "d", "e", "f", "g"],
        }
    )
    return edges, nodes


def test_keys_remap_and_flags(ray_session):
    edges, nodes = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B",
                           "weight": "Duration", "id": "Name"}, nodes=nodes)
    assert g.directed and g.weighted
    assert set(g.edges.schema().names) == {"src", "dst", "weight"}
    assert g.number_of_nodes == 7
    assert g.number_of_edges == 10
    # node attrs carried through untouched
    ndf = g.nodes_as_pandas()
    assert set(ndf.columns) == {"id", "Role"}


def test_degrees_zero_fill(ray_session):
    edges, nodes = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B",
                           "weight": "Duration", "id": "Name"}, nodes=nodes)
    deg = g.degrees().to_pandas().set_index("id")
    # Alice: out 3 (Bob, Carol, Dave), in 1 (Grace)
    assert deg.loc["Alice", "out_degree"] == 3
    assert deg.loc["Alice", "in_degree"] == 1
    assert deg.loc["Alice", "degree"] == 4
    assert deg.loc["Grace", "out_degree"] == 1
    assert len(deg) == 7


def test_undirected_closure_doubles(ray_session):
    edges, _ = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B", "weight": "Duration"})
    und = g.undirected_edges().to_pandas()
    # every edge present in both directions (no reciprocal pairs in fixture)
    assert len(und) == 20
    s = set(zip(und.src, und.dst))
    assert ("Bob", "Alice") in s and ("Alice", "Bob") in s


def test_node_inference(ray_session):
    edges, _ = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B"})
    assert g.number_of_nodes == 7
    assert not g.weighted


def test_small_graph_centralities(ray_session):
    edges, _ = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B", "weight": "Duration"})
    cc = g.closeness_centrality()
    bc = g.betweenness_centrality()
    assert set(cc) == set(bc)
    assert all(v >= 0 for v in cc.values())


def test_moebius_json_contract(ray_session):
    edges, _ = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B", "weight": "Duration"})
    out = moebius_json(g)
    assert set(out) == {"nodes", "links"}
    assert len(out["nodes"]) == 7 and len(out["links"]) == 10
    ids = {n["_int_id"] for n in out["nodes"]}
    assert ids == set(range(7))
    json.dumps(out)  # must be serializable
    # deterministic edge int ids: src + N*(dst+1)
    n = len(out["nodes"])
    node_int = {d["id"]: d["_int_id"] for d in out["nodes"]}
    for l in out["links"]:
        assert l["_int_id"] == node_int[l["source"]] + n * (node_int[l["target"]] + 1)


def test_khop_subgraph(ray_session):
    edges, _ = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B", "weight": "Duration"})
    sub = khop_subgraph(g, "Alice", depth=1, limit=100)
    ids = {n["id"] for n in sub["nodes"]}
    assert ids == {"Alice", "Bob", "Carol", "Dave", "Grace"}
    sub2 = khop_subgraph(g, "Alice", depth=3, limit=3)
    assert len(sub2["nodes"]) <= 3 + 2  # budget respected (frontier granularity)


def test_representation_properties(ray_session):
    import networkx as nx
    import pandas as pd
    import pytest

    edges = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
    g = Graph(edges)
    G = g.networkx
    assert isinstance(G, nx.DiGraph) and set(G.nodes) == {"a", "b", "c"}
    assert g.networkx is G  # cached
    with pytest.raises(ImportError):
        g.graphframe
    with pytest.raises(ImportError):
        g.dgl  # dgl/torch absent in this container


def test_empty_graph_raises(ray_session):
    """test_core_graph.py:301-302: Graph() is a ValueError."""
    import pytest

    with pytest.raises(ValueError):
        Graph()


def test_graph_from_networkx(ray_session):
    """test_core_graph.py:330-350: build a Graph FROM an nx graph —
    same node/edge counts, directedness inherited, attrs preserved."""
    import networkx as nx

    edges, nodes = toy_social()
    g = Graph(edges, {"src": "Person_A", "dst": "Person_B",
                      "weight": "Duration", "id": "Name"}, nodes)
    nxg = g.networkx
    g2 = Graph(nxg)
    assert g2.number_of_nodes == 7
    assert g2.number_of_edges == 10
    assert g2.is_directed is True
    assert g2.is_weighted is True  # weight attr survives the round-trip

    und = Graph(nx.Graph([(1, 2), (2, 3)]))
    assert und.is_directed is False
    assert und.number_of_edges == 2


def test_str_and_repr_convention(ray_session):
    """test_core_graph.py:318-326 shape: counts + flags in str, data/keys/
    nodes summary in repr."""
    edges, nodes = toy_social()
    keys = {"src": "Person_A", "dst": "Person_B", "weight": "Duration", "id": "Name"}
    g = Graph(edges, keys, nodes)
    s = str(g).replace(" ", "").replace("\n", "")
    assert "7nodesand10edges" in s
    assert "s_directed:True" in s and "is_weighted:True" in s
    r = repr(g).replace(" ", "")
    assert "keys={'src'" in r
    assert "nodes=idRole" in r

    g2 = Graph(edges, keys)  # no nodes table
    assert "nodes=None" in repr(g2).replace(" ", "")


def test_moebius_html_standalone(ray_session, tmp_path):
    """moebius_html embeds the exact moebius_json payload in one
    self-contained page (no external scripts/network)."""
    from mercury_graph_ray.pipelines.viz import moebius_html

    edges, _ = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B", "weight": "Duration"})
    out_path = str(tmp_path / "g.html")
    html = moebius_html(g, path=out_path)
    assert open(out_path).read() == html
    # the embedded payload round-trips to the moebius_json contract
    start = html.index('type="application/json">') + len('type="application/json">')
    end = html.index("</script>", start)
    payload = json.loads(html[start:end].replace("<\\/", "</"))
    want = moebius_json(g)
    assert payload == json.loads(json.dumps(want))
    # self-contained: no external resource loads
    assert "http://" not in html and "https://" not in html
    assert "src=" not in html.split("<script")[0]


def test_moebius_html_js_headless(ray_session, tmp_path):
    """Run the embedded force-layout JS under node with a DOM stub: all
    node positions finite and in-bounds after the frame loop, draw calls
    issued, hover handler callable. Skipped when node is absent."""
    import re
    import shutil
    import subprocess

    import pytest as _pytest

    node = shutil.which("node")
    if node is None:
        _pytest.skip("node not available")
    from mercury_graph_ray.pipelines.viz import _MOEBIUS_HTML, moebius_json

    edges, _ = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B", "weight": "Duration"})
    payload = json.dumps(moebius_json(g))
    js = re.findall(r"<script>(.*?)</script>", _MOEBIUS_HTML, re.S)[0]
    harness = (
        "const calls = [];\n"
        "const ctxStub = new Proxy({}, { get: (t, k) => (k === 'canvas' ? null"
        " : (...a) => { calls.push(String(k)); }), set: () => true });\n"
        "const elements = {\n"
        f"  'graph-data': {{ textContent: {json.dumps(payload)} }},\n"
        "  'cv': { getContext: () => ctxStub, width: 0, height: 0,\n"
        "          addEventListener: (ev, fn) => { elements._mouse = fn; } },\n"
        "  'tip': { style: {}, textContent: '' },\n"
        "};\n"
        "global.document = { getElementById: (id) => elements[id] };\n"
        "global.window = { innerWidth: 800, innerHeight: 600 };\n"
        "let frames = 0;\n"
        "global.requestAnimationFrame = (fn) => { if (++frames < 350) fn(); };\n"
        + js
        + "\nfor (let i = 0; i < N; i++) {\n"
        "  if (!isFinite(px[i]) || !isFinite(py[i])) throw new Error('non-finite');\n"
        "  if (px[i] < 0 || px[i] > 800 || py[i] < 0 || py[i] > 600) throw new Error('oob');\n"
        "}\n"
        "if (!calls.includes('arc') || !calls.includes('stroke')) throw new Error('no draws');\n"
        "elements._mouse({ clientX: px[0], clientY: py[0] });\n"
        "console.log('OK ' + frames);\n"
    )
    f = tmp_path / "moebius_headless.js"
    f.write_text(harness)
    r = subprocess.run([node, str(f)], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1500:]
    assert r.stdout.startswith("OK")


def test_moebius_widget_esm_headless(ray_session, tmp_path):
    """The anywidget ES module renders headlessly under node with DOM +
    model stubs: render({model, el}) mounts a canvas, runs the shared
    force-layout core to completion (finite, in-bounds positions), and
    re-renders on a data-traitlet change. Skipped when node is absent."""
    import shutil
    import subprocess

    import pytest as _pytest

    node = shutil.which("node")
    if node is None:
        _pytest.skip("node not available")
    from mercury_graph_ray.pipelines.viz import _MOEBIUS_ESM, moebius_json

    edges, _ = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B", "weight": "Duration"})
    payload = json.dumps(moebius_json(g))
    esm_path = tmp_path / "moebius_widget.mjs"
    esm_path.write_text(_MOEBIUS_ESM)
    harness = (
        "const calls = [];\n"
        "const ctxStub = new Proxy({}, { get: (t, k) => (k === 'canvas' ? null"
        " : (...a) => { calls.push(String(k)); }), set: () => true });\n"
        "function mkEl(tag) { return { tag, style: {}, children: [],\n"
        "  getContext: () => ctxStub, textContent: '',\n"
        "  addEventListener: (ev, fn) => { globalThis._mouse = fn; },\n"
        "  appendChild(c) { this.children.push(c); } }; }\n"
        "globalThis.document = { createElement: mkEl };\n"
        "let frames = 0;\n"
        "globalThis.requestAnimationFrame = (fn) => { if (++frames < 700) fn(); };\n"
        f"const data = {payload};\n"
        "const listeners = {};\n"
        "const model = { attrs: { data, width: 800, height: 600 },\n"
        "  get(k) { return this.attrs[k]; },\n"
        "  on(ev, fn) { listeners[ev] = fn; } };\n"
        "const el = mkEl('div'); el.clientWidth = 800;\n"
        f"const mod = await import({json.dumps(str(esm_path))});\n"
        "mod.default.render({ model, el });\n"
        "if (el.children.length !== 2) throw new Error('no mount');\n"
        "if (!calls.includes('arc') || !calls.includes('stroke')) throw new Error('no draws');\n"
        "if (!listeners['change:data']) throw new Error('no data listener');\n"
        "globalThis._mouse({ clientX: 400, clientY: 300 });\n"
        "model.attrs.data = data; listeners['change:data']();\n"
        "console.log('OK ' + frames);\n"
    )
    f = tmp_path / "moebius_widget_headless.mjs"
    f.write_text(harness)
    r = subprocess.run([node, str(f)], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1500:]
    assert r.stdout.startswith("OK")


def test_moebius_widget_gate_and_shared_core(ray_session):
    """Moebius.show() is anywidget-gated (this container has no
    anywidget: ImportError must name the standalone fallback) and both
    frontends embed the ONE shared layout core (no drift)."""
    import pytest

    from mercury_graph_ray.pipelines import viz

    edges, _ = toy_social()
    g = Graph(edges, keys={"src": "Person_A", "dst": "Person_B", "weight": "Duration"})
    w = viz.Moebius(g, limit=50)
    assert w.json() == viz.moebius_json(g, limit=50)
    assert viz._MOEBIUS_JS_CORE in viz._MOEBIUS_HTML
    assert viz._MOEBIUS_JS_CORE in viz._MOEBIUS_ESM
    assert "export default" in viz._MOEBIUS_ESM
    try:
        import anywidget  # noqa: F401

        has_anywidget = True
    except ImportError:
        has_anywidget = False
    if not has_anywidget:
        with pytest.raises(ImportError, match="moebius_html"):
            w.show()


def test_driver_entry_smoke(ray_session):
    """The driver contract's entry() runs and yields converged PageRank
    rows with a stable schema on sf0.001 (what the driver smoke-checks)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ray_entry_smoke", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.entry()
    df = out if hasattr(out, "columns") else out.to_pandas()
    assert len(df) > 0
    assert {"id", "rank"} <= set(df.columns)
    assert abs(df["rank"].sum() - 1.0) < 1e-6


def test_reciprocity_nx_parity(ray_session):
    """Graph.reciprocity == nx.overall_reciprocity on the distinct edge
    set: mutual pairs count both directions, a self-loop is its own
    reverse, duplicate input rows collapse."""
    import networkx as nx

    G = nx.gnp_random_graph(80, 0.05, seed=2, directed=True)
    G.add_edge(5, 5)
    rows = [(u, v) for u, v in G.edges()]
    df = pd.DataFrame(rows + rows[:37], columns=["src", "dst"])  # dups
    r = Graph(df).reciprocity()
    assert abs(r - nx.overall_reciprocity(G)) < 1e-12


def test_reciprocity_extremes(ray_session):
    """0.0 on a one-way graph, 1.0 when every edge is mutual."""
    one_way = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 4]})
    assert Graph(one_way).reciprocity() == 0.0
    mutual = pd.DataFrame({"src": [1, 2, 2, 3], "dst": [2, 1, 3, 2]})
    assert Graph(mutual).reciprocity() == 1.0


def test_facade_subgraph_algorithm_methods(ray_session):
    """The one-call facade wrappers dispatch to the fitted attributes."""
    import networkx as nx

    G = nx.gnm_random_graph(60, 180, seed=3)
    df = pd.DataFrame([(u, v) for u, v in G.edges()], columns=["src", "dst"])
    g = Graph(df)
    core = sorted(r["id"] for r in g.k_core(3, n_parts=2).take_all())
    assert core == sorted(nx.k_core(G, 3).nodes())
    truss = g.k_truss(3, n_parts=2)
    assert truss.count() == nx.k_truss(G, 3).number_of_edges()
    lp = g.link_prediction(n_parts=2)
    assert len(lp.top(5)) == 5
    assert abs(
        g.degree_assortativity(n_parts=2)
        - nx.degree_assortativity_coefficient(G)
    ) < 1e-9

    D = nx.gnp_random_graph(40, 0.08, seed=5, directed=True)
    ddf = pd.DataFrame([(u, v) for u, v in D.edges()], columns=["src", "dst"])
    scc = Graph(ddf).strongly_connected_components(n_parts=2).to_pandas()
    want = {}
    for comp in nx.strongly_connected_components(D):
        m = min(comp)
        for v in comp:
            want[v] = m
    assert dict(zip(scc["id"], scc["scc"])) == {
        v: m for v, m in want.items() if v in set(scc["id"])
    }


def test_rich_club_nx_parity(ray_session):
    """phi(k) matches nx.rich_club_coefficient(normalized=False) on the
    exact key set (k = 0..max_deg-1 with N_k >= 2)."""
    import networkx as nx

    G = nx.gnm_random_graph(150, 500, seed=8)
    df = pd.DataFrame([(u, v) for u, v in G.edges()], columns=["src", "dst"])
    rc = Graph(df).rich_club(n_parts=4).set_index("k")
    want = nx.rich_club_coefficient(G, normalized=False)
    assert set(rc.index) == set(want)
    for k, phi in want.items():
        assert abs(rc.loc[k, "rich_club"] - phi) < 1e-12, k
        assert rc.loc[k, "n_nodes"] == sum(1 for _, d in G.degree() if d > k)


def test_transitivity_nx_parity(ray_session):
    import networkx as nx

    for seed, n, m in [(8, 150, 500), (3, 60, 90)]:
        G = nx.gnm_random_graph(n, m, seed=seed)
        df = pd.DataFrame([(u, v) for u, v in G.edges()], columns=["src", "dst"])
        got = Graph(df).transitivity(n_parts=4)
        assert abs(got - nx.transitivity(G)) < 1e-12
    # wedge-free graph (perfect matching): 0.0 like nx
    df = pd.DataFrame({"src": [0, 2, 4], "dst": [1, 3, 5]})
    assert Graph(df).transitivity(n_parts=2) == 0.0


def test_facade_centrality_wrappers(ray_session):
    import networkx as nx

    G = nx.gnm_random_graph(60, 180, seed=9)
    df = pd.DataFrame([(u, v) for u, v in G.edges()], columns=["src", "dst"])
    g = Graph(df, keys={"directed": False})
    kz = g.katz_centrality(alpha=0.02, max_iter=2000, tol=1e-13, normalized=True,
                           n_parts=2).to_pandas().set_index("id")["katz"]
    want = nx.katz_centrality(G, alpha=0.02, max_iter=2000, tol=1e-13)
    assert all(abs(kz[v] - want[v]) < 1e-8 for v in G.nodes)
    ev = g.eigenvector_centrality(max_iter=3000, tol=1e-12, normalized=True,
                                  n_parts=2).to_pandas().set_index("id")["eigenvector"]
    wev = nx.eigenvector_centrality(G, max_iter=3000, tol=1e-12)
    assert all(abs(ev[v] - wev[v]) < 1e-7 for v in G.nodes)
