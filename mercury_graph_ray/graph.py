"""Graph facade over two ray.data.Datasets (edges, nodes).

Semantics mirror the reference's ``Graph`` class
(mercury/graph/core/graph.py:108-205): canonical edge columns
``src, dst`` (+ optional ``weight`` + arbitrary attrs), canonical node
column ``id`` (+ attrs), a ``keys`` remapping dict applied at ingest
(graph.py:143-157,477-530), node inference as distinct(src) ∪
distinct(dst) when no nodes table is given (graph.py:532-537), and the
undirected closure built by unioning reversed edges and de-duplicating
(graph.py:541-548). Unlike the reference the facade is lazy: nothing is
counted or collected at construction (the reference triggers two Spark
count() jobs, graph.py:569-570 — a cost we deliberately avoid).

Everything stays a Dataset; ``*_as_pandas`` conveniences exist for test
parity with the reference's export surface (graph.py:410-470).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


def _to_dataset(data):
    import pandas as pd
    import ray.data as rd

    if isinstance(data, rd.Dataset):
        return data
    if isinstance(data, pd.DataFrame):
        # Arrow blocks from the start: the engine is Arrow-native throughout
        # (pandas blocks break zero-copy and some projection ops).
        return rd.from_arrow(pa.Table.from_pandas(data, preserve_index=False))
    if isinstance(data, pa.Table):
        return rd.from_arrow(data)
    if isinstance(data, str):
        return rd.read_parquet(data)
    raise TypeError(f"cannot build a Dataset from {type(data)!r}")


class Graph:
    """Immutable facade: a property graph as two Datasets.

    Parameters mirror the reference (mercury/graph/core/graph.py:143-157):
    ``keys`` may remap input column names to the canonical ones, e.g.
    ``{"src": "Person_A", "dst": "Person_B", "weight": "Duration",
    "id": "Name", "directed": False}``.
    """

    def __init__(self, data=None, keys: dict | None = None, nodes=None):
        if data is None:
            # reference contract (core/graph.py:176-183 via
            # unit_tests/test_core_graph.py:301-302): an empty Graph is an
            # error, not an empty container
            raise ValueError("a Graph cannot be created without data")
        self._init_keys = dict(keys) if keys else None
        keys = dict(keys or {})
        directed_default = True

        # networkx ingestion (reference core/graph.py accepts nx graphs):
        # edge attrs become edge columns, node attrs a nodes table
        try:
            import networkx as nx

            is_nx = isinstance(data, nx.Graph)
        except ImportError:  # pragma: no cover - nx is installed here
            is_nx = False
        if is_nx:
            import networkx as nx
            import pandas as pd

            directed_default = data.is_directed()
            edf = nx.to_pandas_edgelist(data)
            edf = edf.rename(columns={"source": "src", "target": "dst"})
            ndata = [(n, dict(a)) for n, a in data.nodes(data=True)]
            if nodes is None and any(a for _, a in ndata):
                nodes = pd.DataFrame(
                    [{"id": n, **a} for n, a in ndata]
                )
            data = edf

        self.directed: bool = bool(keys.pop("directed", directed_default))
        src_in = keys.get("src", "src")
        dst_in = keys.get("dst", "dst")
        weight_in = keys.get("weight", None)
        id_in = keys.get("id", "id")

        edges = _to_dataset(data)
        rename = {}
        if src_in != "src":
            rename[src_in] = "src"
        if dst_in != "dst":
            rename[dst_in] = "dst"
        if weight_in and weight_in != "weight":
            rename[weight_in] = "weight"
        if rename:
            from mercury_graph_ray.stages.util import rename_cols

            edges = rename_cols(edges, rename)
        self._edges = edges
        self.weighted: bool = "weight" in edges.schema().names

        if nodes is not None:
            nds = _to_dataset(nodes)
            if id_in != "id":
                from mercury_graph_ray.stages.util import rename_cols

                nds = rename_cols(nds, {id_in: "id"})
            self._nodes = nds
            self._nodes_inferred = False
        else:
            self._nodes = None
            self._nodes_inferred = True

        self._cache: dict[str, Any] = {}

    # ---------------------------------------------------------------- core
    @property
    def edges(self):
        """Canonical edges Dataset (src, dst[, weight, attrs...])."""
        return self._edges

    @property
    def nodes(self):
        """Nodes Dataset (id[, attrs...]); inferred from edge endpoints when
        absent (mirror of graph.py:532-537). Inferred result is cached."""
        if self._nodes is None:
            from mercury_graph_ray.stages.ids import distinct_vertices

            self._nodes = distinct_vertices(self._edges).materialize()
        return self._nodes

    @property
    def number_of_nodes(self) -> int:
        if "n_nodes" not in self._cache:
            self._cache["n_nodes"] = self.nodes.count()
        return self._cache["n_nodes"]

    @property
    def number_of_edges(self) -> int:
        if "n_edges" not in self._cache:
            self._cache["n_edges"] = self._edges.count()
        return self._cache["n_edges"]

    def undirected_edges(self):
        """Symmetric closure: union reversed edges then exact-dedup on
        (src, dst) keeping the max weight, mirroring the reference's
        ``union(reversed).distinct()`` (graph.py:541-546). For a directed
        graph with both (u,v,w1) and (v,u,w2) present the reference's
        distinct() keeps both rows; after relabeling they collapse — we
        resolve deterministically by summing weights of identical (src,dst)
        pairs only when they are exact duplicates, else keeping rows as-is.
        """
        if self.directed is False and "undirected" in self._cache:
            return self._cache["undirected"]
        e = self._edges
        cols = [c for c in e.schema().names if c in ("src", "dst", "weight")]
        e = e.select_columns(cols)
        # rename one branch of a shared upstream: Dataset.rename_columns'
        # Project op mis-fuses here (see stages/util.rename_cols docstring)
        from mercury_graph_ray.stages.util import rename_cols

        rev = rename_cols(e, {"src": "dst", "dst": "src"}).select_columns(cols)
        both = e.union(rev)
        from mercury_graph_ray.stages.util import arrow_types, bucket_sum_by

        types = arrow_types(self._edges)

        if "weight" in cols:
            out = bucket_sum_by(
                both,
                ["src", "dst"],
                "weight",
                {"src": types["src"], "dst": types["dst"], "weight": pa.float64()},
                agg="max",
            )
        else:
            # distinct via per-batch dedup + bucket shuffle (same
            # rationale: the sort-based Count() distinct is ~240 µs/row)
            import numpy as np
            import pandas as pd

            def _pre(df: pd.DataFrame) -> pd.DataFrame:
                g = df.drop_duplicates(["src", "dst"])
                g = g.assign(
                    _bucket=(
                        pd.util.hash_pandas_object(
                            g[["src", "dst"]], index=False
                        ).to_numpy()
                        % 64
                    ).astype(np.int64)
                )
                return g

            from mercury_graph_ray.stages.util import ensure_schema

            out = ensure_schema(
                both.map_batches(_pre, batch_format="pandas")
                .groupby("_bucket")
                .map_groups(
                    lambda d: d.drop_duplicates(["src", "dst"])[["src", "dst"]],
                    batch_format="pandas",
                ),
                {"src": types["src"], "dst": types["dst"]},
            )
        self._cache["undirected"] = out
        return out

    # ------------------------------------------------------------- metrics
    def degrees(self):
        """Dataset (id, degree, in_degree, out_degree) with zero-fill,
        mirroring graph.py:621-654. Per-batch pre-aggregation (combiner)
        collapses the 2E endpoint rows to unique-ids-per-batch partials
        before the single groupby shuffle; node zero-fill rides the same
        union."""
        import numpy as np

        def _partials(t: pa.Table) -> pa.Table:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            su, sc = np.unique(src, return_counts=True)
            du, dc = np.unique(dst, return_counts=True)
            ids = np.concatenate([su, du])
            outp = np.concatenate([sc, np.zeros(len(du), np.int64)])
            inp = np.concatenate([np.zeros(len(su), np.int64), dc])
            return pa.table(
                {"id": pa.array(ids), "out_degree": pa.array(outp),
                 "in_degree": pa.array(inp)}
            )

        def _zeros(t: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(t.num_rows, np.int64))
            return pa.table({"id": t["id"], "out_degree": z, "in_degree": z})

        from mercury_graph_ray.stages.util import bucket_sum_by

        partials = self._edges.map_batches(_partials, batch_format="pyarrow")
        if self._nodes_inferred:
            # inferred nodes are exactly the endpoint ids — the zero-fill
            # union adds nothing but a second full edge scan
            both = partials
        else:
            zeros = self.nodes.select_columns(["id"]).map_batches(
                _zeros, batch_format="pyarrow"
            )
            both = partials.union(zeros)
        from mercury_graph_ray.stages.util import arrow_types

        id_type = arrow_types(self._edges)["src"]
        agg = bucket_sum_by(
            both,
            "id",
            ["out_degree", "in_degree"],
            {"id": id_type, "out_degree": pa.int64(), "in_degree": pa.int64()},
        )

        def _final(t: pa.Table) -> pa.Table:
            deg = pc.add(t["out_degree"], t["in_degree"])
            return pa.table(
                {
                    "id": t["id"],
                    "degree": deg,
                    "in_degree": t["in_degree"],
                    "out_degree": t["out_degree"],
                }
            )

        return agg.map_batches(_final, batch_format="pyarrow")

    def weighted_degrees(self, direction: str = "out"):
        """groupby(endpoint).sum(weight) — SURVEY.md §2.5 A2. Bucketed
        pre-combine shuffle (stages/util.bucket_sum_by)."""
        key = "src" if direction == "out" else "dst"
        e = self._edges
        if not self.weighted:
            e = e.map_batches(
                lambda t: t.append_column("weight", pa.array([1.0] * t.num_rows, pa.float64())),
                batch_format="pyarrow",
            )
        from mercury_graph_ray.stages.util import bucket_sum_by, rename_cols

        alias = f"w_{direction}"
        from mercury_graph_ray.stages.util import arrow_types

        id_type = arrow_types(self._edges)[key]
        return bucket_sum_by(
            rename_cols(
                rename_cols(e.select_columns([key, "weight"]), {key: "id"}),
                {"weight": alias},
            ),
            "id",
            alias,
            {"id": id_type, alias: pa.float64()},
        )

    def reciprocity(self, n_buckets: int = 64) -> float:
        """Edge reciprocity of the DISTINCT directed edge set — the
        fraction of directed edges that belong to a mutual (u⇄v) pair
        (nx.overall_reciprocity semantics: self-loops count in the
        denominator but are NOT reciprocal; duplicate input edges are
        collapsed first). A classic web-link-graph statistic
        (beyond-ref, SURVEY.md §2.11).

        One shuffle: every edge is keyed by its UNORDERED vid pair, so
        both directions of a mutual pair land in the same bucket and the
        per-bucket kernel dedupes + counts mutuality vectorized; only
        (n_edges, n_recip) int partials reach the driver. nan on an
        empty edge set, like networkx's error case."""
        import numpy as np

        from mercury_graph_ray.algos.common import explicit_nodes
        from mercury_graph_ray.stages.ids import VertexDict

        if "vertex_dict" not in self._cache:
            self._cache["vertex_dict"] = VertexDict.from_edges(
                self._edges, nodes=explicit_nodes(self)
            )
        vd = self._cache["vertex_dict"]
        enc = vd.encode_edges(self._edges.select_columns(["src", "dst"]))
        nb = int(n_buckets)

        def _key(t: pa.Table) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            a = np.minimum(s, d)
            b = np.maximum(s, d)
            return pa.table(
                {
                    "a": pa.array(a),
                    "b": pa.array(b),
                    "f": pa.array((s <= d).astype(np.int8)),
                    "__bkt": pa.array((a * 1000003 + b) % nb),
                }
            )

        def _partial(group: dict) -> dict:
            trip = np.stack(
                [
                    np.asarray(group["a"], np.int64),
                    np.asarray(group["b"], np.int64),
                    np.asarray(group["f"], np.int64),
                ],
                axis=1,
            )
            uniq = np.unique(trip, axis=0)  # distinct directed edges
            a2, b2 = uniq[:, 0], uniq[:, 1]
            # lexsorted, ≤2 rows per (a, b): an adjacent duplicate pair
            # key means both directions exist
            both = (a2[1:] == a2[:-1]) & (b2[1:] == b2[:-1])
            n_mutual = int(both.sum())
            return {
                "n_edges": np.array([len(uniq)], np.int64),
                "n_recip": np.array([2 * n_mutual], np.int64),
            }

        parts = (
            enc.map_batches(_key, batch_format="pyarrow")
            .groupby("__bkt")
            .map_groups(_partial, batch_format="numpy")
            .to_pandas()
        )
        n_edges = int(parts["n_edges"].sum())
        n_recip = int(parts["n_recip"].sum())
        if n_edges == 0:
            return float("nan")
        return float(n_recip) / float(n_edges)

    def rich_club(self, n_parts: int | None = None) -> "pd.DataFrame":
        """Rich-club coefficient of the simple undirected graph —
        ``phi(k) = 2·E_k / (N_k·(N_k−1))`` where N_k = vertices with
        degree > k and E_k = edges with both endpoint degrees > k
        (nx.rich_club_coefficient(normalized=False) semantics; rows for
        k = 0..max_degree−1 with N_k ≥ 2). Beyond-ref, SURVEY.md §2.11 —
        the classic "do hubs link to hubs" web-graph statistic.

        Scale shape: both inputs are ADDITIVE histograms — a per-batch
        degree bincount and a per-batch bincount of min(deg_a, deg_b)
        over the edge table after two degree joins — so only
        max_degree-length int arrays reach the driver; N_k and E_k are
        suffix sums of those."""
        import numpy as np
        import pandas as pd

        from mercury_graph_ray.algos.common import DEFAULT_N_PARTS, simple_pairs
        from mercury_graph_ray.stages.join import hash_join
        from mercury_graph_ray.stages.util import ensure_schema, rename_cols

        p = n_parts or DEFAULT_N_PARTS
        nb = max(2, p)
        _, canon, degs = simple_pairs(self)

        def _deg_hist(t: pa.Table) -> pa.Table:
            d = t["deg"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            h = np.bincount(d)
            return pa.table({"k": pa.array(np.arange(len(h), dtype=np.int64)),
                             "n": pa.array(h)})

        deg_hist = (
            degs.map_batches(_deg_hist, batch_format="pyarrow")
            .groupby("k")
            .sum("n")
            .to_pandas()
        )
        da = ensure_schema(
            rename_cols(degs, {"id": "a", "deg": "deg_a"}),
            {"a": pa.int64(), "deg_a": pa.int64()},
        )
        db = ensure_schema(
            rename_cols(degs, {"id": "b", "deg": "deg_b"}),
            {"b": pa.int64(), "deg_b": pa.int64()},
        )
        j = hash_join(hash_join(canon, da, on=("a",), num_buckets=nb), db,
                      on=("b",), num_buckets=nb)

        def _edge_hist(t: pa.Table) -> pa.Table:
            x = t["deg_a"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            y = t["deg_b"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            h = np.bincount(np.minimum(x, y))
            return pa.table({"k": pa.array(np.arange(len(h), dtype=np.int64)),
                             "n": pa.array(h)})

        edge_hist = (
            j.map_batches(_edge_hist, batch_format="pyarrow")
            .groupby("k")
            .sum("n")
            .to_pandas()
        )
        max_deg = int(deg_hist["k"].max()) if len(deg_hist) else 0
        dn = np.zeros(max_deg + 1, np.int64)
        dn[deg_hist["k"].to_numpy()] = deg_hist["sum(n)"].to_numpy()
        en = np.zeros(max_deg + 1, np.int64)
        if len(edge_hist):
            en[edge_hist["k"].to_numpy()] = edge_hist["sum(n)"].to_numpy()
        # N_k = #deg > k, E_k = #edges min_deg > k: reversed-cumsum suffixes
        n_gt = np.concatenate([np.cumsum(dn[::-1])[::-1][1:], [0]])
        e_gt = np.concatenate([np.cumsum(en[::-1])[::-1][1:], [0]])
        ks = np.arange(max_deg, dtype=np.int64)
        nk, ek = n_gt[ks], e_gt[ks]
        keep = nk >= 2
        phi = 2.0 * ek[keep] / (nk[keep] * (nk[keep] - 1.0))
        return pd.DataFrame(
            {"k": ks[keep], "n_nodes": nk[keep], "n_edges": ek[keep],
             "rich_club": phi}
        )

    def transitivity(self, n_parts: int | None = None) -> float:
        """Global clustering coefficient of the simple undirected graph:
        ``3·triangles / wedges`` with wedges = Σ deg·(deg−1)/2
        (nx.transitivity semantics; 0.0 on a wedge-free graph).
        Triangle total from TriangleCount (shared cached simple_pairs),
        wedge count as a per-batch int64 partial sum — exact ints, one
        double division."""
        import numpy as np

        from mercury_graph_ray.algos.common import DEFAULT_N_PARTS, simple_pairs
        from mercury_graph_ray.algos.triangles import TriangleCount

        p = n_parts or DEFAULT_N_PARTS
        _, _, degs = simple_pairs(self)

        def _wedge_partial(t: pa.Table) -> pa.Table:
            d = t["deg"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64())})

        wedges = int(
            degs.map_batches(_wedge_partial, batch_format="pyarrow").sum("w") or 0
        )
        if wedges == 0:
            return 0.0
        tc = TriangleCount(n_parts=p).fit(self)
        return 3.0 * float(int(tc.total_)) / float(wedges)

    # ---------------------------------------------------------- algorithms
    def pagerank(self, **kw):
        from mercury_graph_ray.algos.pagerank import PageRank

        return PageRank(**kw).fit(self).pagerank_

    def connected_components(self, **kw):
        from mercury_graph_ray.algos.connected_components import ConnectedComponents

        return ConnectedComponents(**kw).fit(self).components_

    def strongly_connected_components(self, **kw):
        """(id, scc, scc_size) — directed graphs only (algos/scc.py)."""
        from mercury_graph_ray.algos.scc import StronglyConnectedComponents

        return StronglyConnectedComponents(**kw).fit(self).components_

    def k_core(self, k: int, **kw):
        """Vertex Dataset of the k-core (algos/kcore.py, BSP peeling)."""
        from mercury_graph_ray.algos.kcore import KCore

        return KCore(k, **kw).fit(self).core_

    def katz_centrality(self, **kw):
        """(id, katz) — algos/katz.py (fixed-iteration or tol-stopped)."""
        from mercury_graph_ray.algos.katz import KatzCentrality

        return KatzCentrality(**kw).fit(self).katz_

    def eigenvector_centrality(self, **kw):
        """(id, eigenvector) — algos/katz.py (L1-scaled power iteration)."""
        from mercury_graph_ray.algos.katz import EigenvectorCentrality

        return EigenvectorCentrality(**kw).fit(self).eigenvector_

    def core_numbers(self, **kw):
        """(id, core) — every vertex's core number (algos/kcore.py,
        iterated h-index)."""
        from mercury_graph_ray.algos.kcore import CoreNumbers

        return CoreNumbers(**kw).fit(self).core_numbers_

    def k_truss(self, k: int, **kw):
        """Canonical edge Dataset of the k-truss (algos/ktruss.py)."""
        from mercury_graph_ray.algos.ktruss import KTruss

        return KTruss(k, **kw).fit(self).edges_

    def link_prediction(self, **kw):
        """Non-adjacent pair scores (cn / jaccard / adamic_adar) —
        the fitted LinkPrediction object, for ``.top(k, metric)``."""
        from mercury_graph_ray.algos.linkpred import LinkPrediction

        return LinkPrediction(**kw).fit(self)

    def degree_assortativity(self, **kw) -> float:
        from mercury_graph_ray.algos.linkpred import DegreeAssortativity

        return DegreeAssortativity(**kw).fit(self).assortativity_

    def to_networkx(self):
        """Collect to a networkx graph — explicitly a small-graph path,
        mirroring the reference's networkx representation (graph.py:242-254).
        The reference itself computes closeness/betweenness only here
        (graph.py:656-679: 'too computationally expensive' distributed)."""
        import networkx as nx

        G = nx.DiGraph() if self.directed else nx.Graph()
        for r in self.edges.to_pandas().itertuples():
            w = float(getattr(r, "weight", 1.0))
            G.add_edge(r.src, r.dst, weight=w)
        for r in self.nodes.to_pandas().itertuples():
            if r.id not in G:
                G.add_node(r.id)
        return G

    @property
    def networkx(self):
        """Cached networkx representation (reference graph.py:240-253).
        Small-graph path — collects the edge table to the driver."""
        if "networkx" not in self._cache:
            self._cache["networkx"] = self.to_networkx()
        return self._cache["networkx"]

    @property
    def graphframe(self):
        """GraphFrames representation (reference graph.py:255-268). Spark /
        graphframes are not part of this engine's environment; the property
        exists for surface parity and raises with the conversion recipe."""
        raise ImportError(
            "graphframes requires a Spark runtime, which this Ray-native "
            "engine does not depend on. Export with nodes_as_pandas()/"
            "edges_as_pandas() (or .nodes/.edges write_parquet) and build "
            "the GraphFrame in a Spark session."
        )

    @property
    def dgl(self):
        """DGL representation (reference graph.py:270-283) — built when the
        optional ``dgl``+``torch`` stack is importable, else raises with the
        export recipe."""
        if "dgl" not in self._cache:
            try:
                import dgl  # noqa: F401
                import torch
            except ImportError as e:
                raise ImportError(
                    "dgl/torch are not installed in this environment. Export "
                    "edges with edges_as_pandas() and feed dgl.graph() "
                    "directly, or install dgl+torch."
                ) from e
            import numpy as np

            from mercury_graph_ray.stages.ids import VertexDict

            vd = VertexDict.from_edges(self._edges)
            enc = vd.encode_edges(self._edges.select_columns(["src", "dst"])).to_pandas()
            self._cache["dgl"] = dgl.graph(
                (torch.tensor(enc["src"].to_numpy(np.int64)),
                 torch.tensor(enc["dst"].to_numpy(np.int64)))
            )
        return self._cache["dgl"]

    def closeness_centrality(self) -> dict:
        """Small-graph op (reference graph.py:656-671)."""
        import networkx as nx

        return nx.closeness_centrality(self.to_networkx())

    def betweenness_centrality(self) -> dict:
        """Small-graph op; the reference always uses networkx for this
        (graph.py:673-679)."""
        import networkx as nx

        return nx.betweenness_centrality(self.to_networkx())

    def label_propagation(self, **kw):
        from mercury_graph_ray.algos.label_propagation import LabelPropagation

        return LabelPropagation(**kw).fit(self).labels_

    def triangle_count(self, **kw):
        from mercury_graph_ray.algos.triangles import TriangleCount

        return TriangleCount(**kw).fit(self).triangles_

    # ----------------------------------------------------------- iterators
    def node_iterator(self):
        """Stream node rows as dicts (reference NodeIterator,
        graph.py:9-55 — minus its per-row filter().first() anti-pattern:
        this is a single streaming pass)."""
        yield from self.nodes.iter_rows()

    def edge_iterator(self):
        """Stream edge rows as dicts (reference EdgeIterator, graph.py:58-105)."""
        yield from self.edges.iter_rows()

    # ------------------------------------------------------------- exports
    def nodes_as_pandas(self):
        return self.nodes.to_pandas()

    def edges_as_pandas(self):
        return self._edges.to_pandas()

    # reference-surface aliases (core/graph.py exposes is_directed /
    # is_weighted; unit_tests/test_core_graph.py:421 calls g.is_directed)
    @property
    def is_directed(self) -> bool:
        return self.directed

    @property
    def is_weighted(self) -> bool:
        return self.weighted

    def __str__(self):
        """Reference convention (test_core_graph.py:318-321): counts plus
        capability flags. Triggers the two count jobs — same as the
        reference, which also counts on str()."""
        return (
            f"Graph with {self.number_of_nodes} nodes and "
            f"{self.number_of_edges} edges\n"
            f"  is_directed: {self.directed}  is_weighted: {self.weighted}  "
            f"has_networkx: {'networkx' in self._cache}  "
            f"has_graphframe: False  has_dgl: False"
        )

    def __repr__(self):
        """Schema-level summary (the reference dumps the full input frames,
        test_core_graph.py:323-326 — at engine scale we show column names
        and the keys mapping instead)."""
        nodes = (
            " ".join(self._nodes.schema().names)
            if (self._nodes is not None and not self._nodes_inferred)
            else None
        )
        return (
            f"Graph(data={' '.join(self._edges.schema().names)}, "
            f"keys={self._init_keys!r}, nodes={nodes})"
        )
