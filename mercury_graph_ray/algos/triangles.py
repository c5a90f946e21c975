"""Per-vertex triangle counting (degree-ordered orientation).

Not present in the reference (SURVEY.md scope note #1); semantics are the
GraphFrames ``triangleCount`` analog: the graph is made undirected and
simple (canonical (min,max) pairs, self-loops dropped, duplicates and
weights ignored), and each vertex gets the number of distinct triangles
it participates in (nx.triangles is the test oracle).

Dataflow (SURVEY.md §7 step 6):
1. canonical edge table: one groupby(['a','b']) dedup shuffle;
2. degrees: one groupby count;
3. orientation: each canonical edge directed from the (degree, id)-smaller
   endpoint to the larger — bounds every out-neighborhood by O(sqrt(E)),
   which caps the wedge explosion on power-law hubs (the mandatory skew
   control, SURVEY.md §7 "hard parts");
4. wedges: per source-partition ``map_groups`` enumerates ordered
   out-neighbor pairs with vectorized grouped-arange (no per-vertex
   Python loop);
5. triangle closure: below ``BROADCAST_MAX_EDGES`` the sorted canonical
   edge set is packed into one uint64 key array (a << 32 | b, vids are
   dense < 2^32 there), ``ray.put`` ONCE, and wedges are confirmed
   in-task by ``searchsorted`` membership inside the same ``map_groups``
   that enumerated them — only confirmed triangles (≈ triangle count,
   orders of magnitude fewer rows than wedges) ever leave the task.
   Beyond the cap the closure is the original bucketed hash
   ``Dataset.join`` of wedges against the canonical edge set on (a, b);
6. per-vertex counts: each confirmed triangle credits center, a and b —
   one final groupby(id) count, zero-filled over all vertices.

The degree lookup for orientation is broadcast (``ray.put`` once) below
``BROADCAST_MAX_VERTICES`` — one uint32 per dense vid — and falls back to
a distributed join relabel beyond that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import DEFAULT_N_PARTS

# Broadcast the per-vid uint32 degree array below this many vertices
# (4 bytes/vid fixed width, so a row cap IS a byte cap here: 20M -> 80 MB);
# beyond it, orientation degrees attach via a distributed join relabel.
BROADCAST_MAX_VERTICES = 20_000_000

# Broadcast the sorted packed-uint64 canonical edge set (8 bytes/edge,
# 20M -> 160 MB in the object store, shared zero-copy by every wedge
# task) for the in-task triangle-closure probe below this many edges;
# beyond it, or when vids no longer fit the 32-bit halves of the packed
# key, the closure falls back to the bucketed hash join.
BROADCAST_MAX_EDGES = 20_000_000


def _canonical_pairs(t: pa.Table) -> pa.Table:
    a = t["src"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["dst"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    keep = a != b  # drop self-loops
    a, b = a[keep], b[keep]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    return pa.table({"a": pa.array(lo), "b": pa.array(hi)})


def _wedges_in_group(group: dict) -> dict:
    """All ordered out-neighbor pairs per source, vectorized.

    Input rows: (u, v) oriented edges of one source partition. Output:
    (a, b, center) with a < b (neighbors sorted by vid within u)."""
    u = np.asarray(group["u"], np.int64)
    v = np.asarray(group["v"], np.int64)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
    sizes = np.diff(np.concatenate([starts, [len(u)]]))
    # element-local position within its group
    pos = np.arange(len(u)) - np.repeat(starts, sizes)
    left_counts = np.repeat(sizes, sizes) - 1 - pos  # partners after me
    total = int(left_counts.sum())
    if total == 0:
        e = np.array([], np.int64)
        return {"a": e, "b": e, "center": e}
    left = np.repeat(v, left_counts)
    run_starts = np.cumsum(left_counts) - left_counts
    offset_within = np.arange(total) - np.repeat(run_starts, left_counts)
    right_idx = np.repeat(np.arange(len(v)) + 1, left_counts) + offset_within
    right = v[right_idx]
    center = np.repeat(u, left_counts)
    return {"a": left, "b": right, "center": center}


def oriented_triangles(canon, degs, n: int, p: int, closure: str = "auto"):
    """Confirmed triangles of the simple graph as a Dataset of
    (a, b, center) — each triangle exactly ONCE, found from its unique
    (deg, id)-smallest apex, so hub work is bounded by the oriented
    out-degree (O(sqrt E)) instead of deg². Shared by TriangleCount
    (per-vertex credits) and KTruss (per-EDGE support: each confirmed
    triangle supports its three edges).

    ``closure`` picks how wedges are confirmed against the edge set:
    ``"broadcast"`` probes a ``ray.put`` sorted packed-key array inside
    the wedge task (zero shuffle — wedges never leave the task that
    enumerated them); ``"join"`` ships every wedge through a bucketed
    hash join (the beyond-cap scale path: the edge set no longer fits a
    broadcast, but the join only moves O(Σ oriented-deg²) rows, still
    bounded by the orientation). ``"auto"`` broadcasts below
    ``BROADCAST_MAX_EDGES`` edges / 2^32 vids.

    Correctness needs only a strict total order on vertices (every
    triangle has exactly one apex under any such order); (deg, id) is
    the skew-control choice. Callers may therefore pass STALE degrees
    (e.g. the original graph's while peeling a subgraph) — still exact,
    merely less balanced."""
    import ray

    from mercury_graph_ray.stages.join import hash_join
    from mercury_graph_ray.stages.util import ensure_schema

    if n > BROADCAST_MAX_VERTICES:
        oriented = TriangleCount._orient_by_join(canon, degs, p)
    else:
        # broadcast path: one uint32 per dense vid (<=80 MB at the cap)
        deg_arr = np.zeros(n, np.uint32)
        for b in degs.iter_batches(batch_format="numpy", batch_size=1 << 20):
            deg_arr[b["id"].astype(np.int64)] = b["deg"]
        deg_ref = ray.put(deg_arr)

        def _orient(t: pa.Table) -> pa.Table:
            d = ray.get(deg_ref)
            a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
            b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
            ai, bi = a.astype(np.int64), b.astype(np.int64)
            # direct from (deg, id)-smaller to larger
            a_first = (d[ai] < d[bi]) | ((d[ai] == d[bi]) & (a < b))
            u = np.where(a_first, ai, bi)
            v = np.where(a_first, bi, ai)
            return pa.table({"u": pa.array(u), "v": pa.array(v), "part": pa.array(u % p)})

        oriented = canon.map_batches(_orient, batch_format="pyarrow")

    out_schema = {"a": pa.int64(), "b": pa.int64(), "center": pa.int64()}
    if closure == "auto":
        # canon is materialized by every caller (simple_pairs / the
        # KTruss peel), so count() is metadata, not a re-execution
        n_edges = canon.count()
        closure = (
            "broadcast"
            if n_edges <= BROADCAST_MAX_EDGES and n < (1 << 32)
            else "join"
        )
    if closure == "broadcast":
        # pack each canonical edge into one uint64 (a << 32 | b), sort,
        # share via the object store: every wedge task confirms its own
        # wedges with a binary-search membership probe and ships only
        # the confirmed triangles (VERDICT r4 #2)
        chunks = []
        for bt in canon.iter_batches(batch_format="numpy", batch_size=1 << 20):
            chunks.append(
                (bt["a"].astype(np.uint64) << np.uint64(32))
                | bt["b"].astype(np.uint64)
            )
        keys = (
            np.sort(np.concatenate(chunks))
            if chunks
            else np.array([], np.uint64)
        )
        keys_ref = ray.put(keys)

        def _wedges_confirmed(group: dict) -> dict:
            w = _wedges_in_group(group)
            a, b = w["a"], w["b"]
            if len(a) == 0:
                return w
            ks = ray.get(keys_ref)  # zero-copy view from the object store
            k = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
            if len(ks) == 0:
                m = np.zeros(len(k), bool)
            else:
                idx = np.minimum(np.searchsorted(ks, k), len(ks) - 1)
                m = ks[idx] == k
            return {"a": a[m], "b": b[m], "center": w["center"][m]}

        return ensure_schema(
            oriented.groupby("part").map_groups(
                _wedges_confirmed, batch_format="numpy"
            ),
            out_schema,
        )
    wedges = ensure_schema(
        oriented.groupby("part").map_groups(_wedges_in_group, batch_format="numpy"),
        out_schema,
    )
    canon_clean = ensure_schema(canon, {"a": pa.int64(), "b": pa.int64()})
    return hash_join(wedges, canon_clean, on=("a", "b"), num_buckets=max(2, p))


class TriangleCount(BaseClass):
    """``TriangleCount().fit(g)`` sets ``triangles_`` (Dataset of id,
    triangles), ``total_`` (global triangle count) and ``clustering_``
    (Dataset of id, triangles, degree, clustering — the nx.clustering
    local coefficient over the simple undirected graph)."""

    def __init__(self, n_parts: int | None = None):
        self.n_parts = n_parts or DEFAULT_N_PARTS

    @staticmethod
    def _orient_by_join(canon, degs, p: int):
        """Scale path: attach degrees to both endpoints via two
        distributed hash joins (no driver-side degree array), then orient
        from the (deg, id)-smaller endpoint. Same output as the broadcast
        path; used beyond BROADCAST_MAX_VERTICES."""
        import pyarrow as pa

        from mercury_graph_ray.stages.join import hash_join
        from mercury_graph_ray.stages.util import ensure_schema, rename_cols

        da = ensure_schema(
            rename_cols(degs, {"id": "a", "deg": "deg_a"}),
            {"a": pa.int64(), "deg_a": pa.int64()},
        )
        db = ensure_schema(
            rename_cols(degs, {"id": "b", "deg": "deg_b"}),
            {"b": pa.int64(), "deg_b": pa.int64()},
        )
        nb = max(2, p)
        j = hash_join(canon, da, on=("a",), num_buckets=nb)
        j = hash_join(j, db, on=("b",), num_buckets=nb)

        def _orient_j(t: pa.Table) -> pa.Table:
            import numpy as np

            a = t["a"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            b = t["b"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            dga = t["deg_a"].combine_chunks().to_numpy(zero_copy_only=False)
            dgb = t["deg_b"].combine_chunks().to_numpy(zero_copy_only=False)
            a_first = (dga < dgb) | ((dga == dgb) & (a < b))
            u = np.where(a_first, a, b)
            v = np.where(a_first, b, a)
            return pa.table({"u": pa.array(u), "v": pa.array(v), "part": pa.array(u % p)})

        return j.map_batches(_orient_j, batch_format="pyarrow")

    def fit(self, g) -> "TriangleCount":
        from mercury_graph_ray.algos.common import simple_pairs

        p = self.n_parts
        vd, canon, degs = simple_pairs(g)
        n = vd.n
        from mercury_graph_ray.stages.join import hash_join
        from mercury_graph_ray.stages.util import (
            bucket_sum_by,
            ensure_schema,
            rename_cols,
        )

        tri = oriented_triangles(canon, degs, n, p)

        def _credit(t: pa.Table) -> pa.Table:
            ids = np.concatenate(
                [
                    t["a"].combine_chunks().to_numpy(zero_copy_only=False),
                    t["b"].combine_chunks().to_numpy(zero_copy_only=False),
                    t["center"].combine_chunks().to_numpy(zero_copy_only=False),
                ]
            )
            return pa.table({"id": pa.array(ids), "t": pa.array(np.ones(len(ids), np.int64))})

        credits = tri.map_batches(_credit, batch_format="pyarrow")
        def _zero_rows(t: pa.Table) -> pa.Table:
            ids = t["vid"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"id": pa.array(ids), "t": pa.array(np.zeros(len(ids), np.int64))})

        zeros = vd.mapping.select_columns(["vid"]).map_batches(_zero_rows, batch_format="pyarrow")
        # materialize once: total_, triangles_ and clustering_ all consume
        # this O(V)-row table — without the barrier each consumer re-runs
        # the wedge enumeration. Int-bucket pre-combine shuffle, not
        # Ray's sort aggregate (stages/util docstring).
        counts = rename_cols(
            bucket_sum_by(
                credits.union(zeros),
                ["id"], "t",
                {"id": pa.int64(), "t": pa.int64()},
            ),
            {"t": "triangles"},
        ).materialize()
        self.total_ = counts.sum("triangles") // 3
        self.triangles_ = vd.decode(counts, col="id")

        # local clustering coefficient (nx.clustering on the simple
        # undirected graph): c(v) = 2·tri / (deg·(deg-1)), 0 when deg < 2.
        # One join of the two zero-filled O(V) tables.
        def _zero_deg(t: pa.Table) -> pa.Table:
            ids = t["vid"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"id": pa.array(ids), "deg": pa.array(np.zeros(len(ids), np.int64))})

        zeros_deg = vd.mapping.select_columns(["vid"]).map_batches(
            _zero_deg, batch_format="pyarrow"
        )
        deg_full = rename_cols(
            bucket_sum_by(
                ensure_schema(degs, {"id": pa.int64(), "deg": pa.int64()}).union(
                    zeros_deg
                ),
                ["id"], "deg",
                {"id": pa.int64(), "deg": pa.int64()},
            ),
            {"deg": "degree"},
        )
        j = hash_join(counts, deg_full, on=("id",), num_buckets=max(2, p))

        def _coef(t: pa.Table) -> pa.Table:
            tri_v = t["triangles"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
            d = t["degree"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                c = np.where(d >= 2, 2.0 * tri_v / (d * (d - 1.0)), 0.0)
            return pa.table(
                {
                    "id": t["id"],
                    "triangles": t["triangles"],
                    "degree": t["degree"],
                    "clustering": pa.array(c, pa.float64()),
                }
            )

        self.clustering_ = vd.decode(j.map_batches(_coef, batch_format="pyarrow"), col="id")
        return self
