"""Shared preparation for the iterative algorithms.

Encodes the graph once (vertex dictionary + CSR blocks) and caches the
result on the Graph facade so PageRank / CC / LPA / triangles over the
same Graph reuse the same physical layout — mirroring how the reference
caches per-representation conversions (mercury/graph/core/graph.py:286-347)
but for the partitioned CSR instead of networkx objects.
"""

from __future__ import annotations

import os
import tempfile

from mercury_graph_ray.stages.gas import GasGraph
from mercury_graph_ray.stages.ids import VertexDict

DEFAULT_N_PARTS = int(os.environ.get("MGR_N_PARTS", "16"))


def explicit_nodes(g):
    """The user-supplied nodes table, or None when nodes were inferred.

    Isolated (edge-free) vertices only exist when the caller passed an
    explicit nodes table; including them gives them PageRank mass and
    singleton components, matching the reference's full-node-set
    semantics (mercury/graph/core/graph.py:681-720)."""
    if getattr(g, "_nodes", None) is not None and not getattr(g, "_nodes_inferred", True):
        return g._nodes
    return None


def prepare(g, *, symmetrize: bool = False, n_parts: int | None = None,
            workdir: str | None = None, distinct: bool = False):
    """Graph -> (VertexDict, GasGraph); cached per (symmetrize, n_parts,
    distinct).

    ``distinct=True`` collapses duplicate (src, dst) rows of a DIRECTED
    edge table to one edge before the CSR build (dropping weights —
    callers use it for binary-adjacency semantics, e.g. unweighted Katz
    / eigenvector, where each distinct edge must count exactly once).
    The undirected path already dedups via ``undirected_edges``."""
    n_parts = n_parts or DEFAULT_N_PARTS
    key = ("gas", bool(symmetrize), n_parts, bool(distinct))
    if key in g._cache:
        return g._cache[key]
    vd_key = "vertex_dict"
    if vd_key not in g._cache:
        g._cache[vd_key] = VertexDict.from_edges(g.edges, nodes=explicit_nodes(g))
    vd: VertexDict = g._cache[vd_key]
    if symmetrize or not g.directed:
        edges = g.undirected_edges()
    else:
        edges = g.edges
        if distinct:
            from ray.data.aggregate import Count

            edges = (
                edges.select_columns(["src", "dst"])
                .groupby(["src", "dst"])
                .aggregate(Count(alias_name="_n"))
                .select_columns(["src", "dst"])
            )
    enc = vd.encode_edges(edges)
    if workdir is None:
        workdir = tempfile.mkdtemp(
            prefix=f"gas_{'u' if symmetrize else 'd'}{n_parts}_", dir="/tmp"
        )
    gas = GasGraph.build(enc, vd.n, n_parts, workdir)
    g._cache[key] = (vd, gas)
    return vd, gas


def endpoint_degrees(pairs):
    """(id, deg) over a canonical (a, b) pair Dataset — each endpoint
    counted once per pair (the simple-graph degree). Int-bucket
    pre-combine shuffle instead of Ray's sort aggregate (stages/util
    docstring: ~240 µs/row on this release)."""
    import numpy as np
    import pyarrow as pa

    from mercury_graph_ray.stages.util import bucket_sum_by

    def _endpoints(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = np.concatenate([a, b])
        return pa.table(
            {"id": pa.array(ids), "deg": pa.array(np.ones(len(ids), np.int64))}
        )

    return bucket_sum_by(
        pairs.map_batches(_endpoints, batch_format="pyarrow"),
        ["id"], "deg",
        {"id": pa.int64(), "deg": pa.int64()},
    )


def simple_pairs(g, *, cache: bool = True):
    """(VertexDict, canonical simple-pair Dataset, degree Dataset).

    The encoded graph as a canonical (a < b) undirected simple edge
    table — self-loops dropped, duplicate/reverse edges collapsed — plus
    per-vertex simple degrees (id, deg; vertices absent from any pair
    are absent, zero-fill is the caller's choice). The pair table is
    materialized (every consumer re-joins it) and cached on the Graph
    facade so TriangleCount / LinkPrediction / DegreeAssortativity /
    KCore over the same Graph share one dedup shuffle.
    """
    import numpy as np
    import pyarrow as pa

    from mercury_graph_ray.stages.util import bucket_sum_by

    if cache and "simple_pairs" in g._cache:
        return g._cache["simple_pairs"]
    if "vertex_dict" not in g._cache:
        g._cache["vertex_dict"] = VertexDict.from_edges(g.edges, nodes=explicit_nodes(g))
    vd: VertexDict = g._cache["vertex_dict"]
    from mercury_graph_ray.algos.triangles import _canonical_pairs

    enc = vd.encode_edges(g.edges.select_columns(["src", "dst"]))

    def _ones(t: pa.Table) -> pa.Table:
        return t.append_column("_n", pa.array(np.ones(len(t), np.int64)))

    # dedup via int-bucket pre-combine (NOT Ray's two-int64-key sort
    # aggregate — ~240 µs/row, it dominated the triangle headline query)
    canon = (
        bucket_sum_by(
            enc.map_batches(_canonical_pairs, batch_format="pyarrow")
            .map_batches(_ones, batch_format="pyarrow"),
            ["a", "b"], "_n",
            {"a": pa.int64(), "b": pa.int64(), "_n": pa.int64()},
            agg="max",
        )
        .select_columns(["a", "b"])
        .materialize()
    )

    degs = endpoint_degrees(canon).materialize()
    out = (vd, canon, degs)
    if cache:
        g._cache["simple_pairs"] = out
    return out


def keys_to_vids(vd, keys):
    """Original vertex keys -> internal dense vids via a distributed
    is_in filter on the dictionary mapping (never collects the mapping:
    the filter result is |keys|-sized). Raises on unknown keys."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    skeys = [str(k) for k in keys]

    def _rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["id"], pa.string())
        return t.filter(pc.is_in(ids, value_set=pa.array(sorted(set(skeys)))))

    m = vd.mapping.map_batches(_rows, batch_format="pyarrow").to_pandas()
    # an all-empty filter result loses its schema in this Ray release
    key2vid = (
        dict(zip(m["id"].astype(str), m["vid"].astype(np.int64)))
        if "id" in m.columns
        else {}
    )
    missing = [s for s in skeys if s not in key2vid]
    if missing:
        raise ValueError(f"ids not in graph: {missing}")
    return np.array([key2vid[s] for s in skeys], np.int64)
