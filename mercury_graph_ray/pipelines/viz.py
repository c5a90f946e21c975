"""Moebius-style visualization JSON export (reference:
mercury/graph/viz/moebius.py:296-308,445-469).

The reference's Moebius widget renders nodes/links JSON in D3; the data
contract is what matters for parity: ``{"nodes": [{"id", "count",
"_int_id"}], "links": [{"source", "target", "value", "_int_id"}]}`` with
deterministic integer ids (the reference broadcasts an id map and derives
the edge id as ``src + N*(dst+1)``, moebius.py:333-371). The interactive
k-hop expansion loop (moebius.py:263-294) is reproduced as
``khop_subgraph``: repeated 1-hop edge filters under a node budget.
"""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc


def moebius_json(g, limit: int = 1000) -> dict:
    """Export (at most ``limit`` nodes of) the graph as D3 nodes/links."""
    deg = g.degrees().to_pandas().sort_values("id").reset_index(drop=True)
    if len(deg) > limit:
        deg = deg.nlargest(limit, "degree").sort_values("id").reset_index(drop=True)
    keep = set(deg["id"])
    int_id = {v: i for i, v in enumerate(deg["id"])}
    n = len(int_id)

    edges = g.edges.to_pandas()
    edges = edges[edges["src"].isin(keep) & edges["dst"].isin(keep)]
    nodes = [
        {"id": r.id, "count": int(r.degree), "_int_id": int_id[r.id]}
        for r in deg.itertuples()
    ]
    links = [
        {
            "source": r.src,
            "target": r.dst,
            "value": float(getattr(r, "weight", 1.0)),
            "_int_id": int_id[r.src] + n * (int_id[r.dst] + 1),
        }
        for r in edges.itertuples()
    ]
    return {"nodes": nodes, "links": links}


def khop_subgraph(g, start_id, depth: int = 2, limit: int = 100) -> dict:
    """BFS expansion with a node budget (moebius.py:263-294): repeated
    1-hop edge filters (``src == id or dst == id``, moebius.py:331)."""
    frontier = {start_id}
    seen = set(frontier)
    rows = []
    for _ in range(depth):
        if not frontier or len(seen) >= limit:
            break
        fl = sorted(frontier)
        import pyarrow as pa

        batch_edges = g.edges.map_batches(
            lambda t, fl=fl: t.filter(
                pc.or_(
                    pc.is_in(t["src"], value_set=pa.array(fl)),
                    pc.is_in(t["dst"], value_set=pa.array(fl)),
                )
            ),
            batch_format="pyarrow",
        ).to_pandas()
        nxt = set()
        for r in batch_edges.itertuples():
            if len(seen) >= limit and (r.src not in seen or r.dst not in seen):
                continue
            rows.append((r.src, r.dst, float(getattr(r, "weight", 1.0))))
            for v in (r.src, r.dst):
                if v not in seen:
                    if len(seen) < limit:
                        seen.add(v)
                        nxt.add(v)
        frontier = nxt
    nodes = sorted(seen)
    int_id = {v: i for i, v in enumerate(nodes)}
    uniq = sorted(set(rows))
    return {
        "nodes": [{"id": v, "_int_id": int_id[v]} for v in nodes],
        "links": [
            {"source": s, "target": d, "value": w}
            for s, d, w in uniq
            if s in int_id and d in int_id
        ],
    }
