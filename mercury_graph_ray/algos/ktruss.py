"""k-truss decomposition (fixed k) — incremental support peeling.

Not in the reference (beyond-ref, SURVEY.md §2.11). The k-truss is the
maximal subgraph of the simple undirected graph in which every edge is
supported by >= k-2 triangles WITHIN the subgraph (nx.k_truss oracle) —
the edge-analog of the k-core and the standard cohesive-subgraph
refinement of triangle counting.

Sweep-synchronous peel over a maintained per-edge support table:

- sweep 1 pays the one full support count — ORIENTED triangle
  enumeration (``algos.triangles.oriented_triangles``: each triangle
  found once from its (deg, id)-smallest apex, hub wedge work bounded
  by the oriented out-degree) crediting each triangle's three edges;
- every later sweep is INCREMENTAL (VERDICT r3 #4): only triangles
  incident to the edges REMOVED last sweep are touched. For a surviving
  edge e, the support decrement is ``W_mixed(e) − W_RR(e)`` where
  W_mixed counts wedges centered on a removed-edge endpoint with one
  removed side and one old-graph side (enumerated as a bucketed
  hash_join of the symmetrized removed set against the old adjacency
  PRE-FILTERED to removed-edge endpoints — work proportional to the
  removal's neighborhood, not to E), and W_RR (wedge counts of the
  removed set alone) corrects the double count of triangles that lost
  two edges at once. This is inclusion-exclusion over how many of the
  triangle's other two edges died: 1 → counted once in W_mixed; 2 →
  twice in W_mixed, once in W_RR; net decrement 1 either way.
- adaptivity: when a sweep removes a large fraction of the surviving
  edges (> ``recount_frac``), the "incremental" update would touch most
  of the graph anyway, so the sweep falls back to a full recount (same
  result — removal sets per sweep are identical either way; exposed in
  ``sweep_modes_`` for tests). The endpoint filter broadcasts the
  removed-endpoint id set via ``ray.put`` — valid exactly because the
  incremental path only runs when the removal (hence its endpoint set)
  is small.

The sweep-synchronous semantics (drop ALL sub-threshold edges, then
recompute, repeat) are unchanged from the recount implementation, so
removal sets, ``n_iter_`` and the fixpoint are identical — only the
per-sweep cost drops from O(Σ deg²) to O(removed neighborhood).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import DEFAULT_N_PARTS, simple_pairs
from mercury_graph_ray.algos.linkpred import _wedge_counts


def _split_by_support(sup, thr: int):
    """Materialized support table -> (keep, drop) pair Datasets."""
    import pyarrow.compute as pc

    from mercury_graph_ray.stages.util import ensure_schema

    def _part(t: pa.Table, keep: bool) -> pa.Table:
        cn = t["cn"].combine_chunks()
        m = pc.greater_equal(cn, thr) if keep else pc.less(cn, thr)
        return t.filter(m)

    schema = {"a": pa.int64(), "b": pa.int64(), "cn": pa.int64()}
    keep = ensure_schema(
        sup.map_batches(lambda t: _part(t, True), batch_format="pyarrow"), schema
    )
    drop = ensure_schema(
        sup.map_batches(lambda t: _part(t, False), batch_format="pyarrow"), schema
    )
    return keep, drop


def _initial_support(pairs, degs, n: int, p: int, nb: int):
    """Full support count -> materialized (a, b, cn) support table.

    Uses the ORIENTED triangle enumeration (``algos.triangles
    .oriented_triangles`` — each triangle found once from its
    (deg, id)-smallest apex, hub wedge work bounded by the oriented
    out-degree instead of deg²) and credits each confirmed triangle to
    its three edges. This is the skew control that makes the seeding
    sweep survive power-law graphs; the unoriented ``_wedge_counts``
    kernel it replaces enumerates all O(Σ deg²) wedges (a 20k-degree hub
    alone is 4·10^8)."""
    import pyarrow.compute as pc

    from mercury_graph_ray.algos.triangles import oriented_triangles
    from mercury_graph_ray.stages.join import hash_join
    from mercury_graph_ray.stages.util import bucket_sum_by, ensure_schema, rename_cols

    tri = oriented_triangles(pairs, degs, n, p)

    def _edges3(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["center"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        # the triangle supports (a,b), (c,a), (c,b); c is the apex so
        # c < a and c < b in orientation order but NOT necessarily by id
        ea = np.concatenate([a, np.minimum(c, a), np.minimum(c, b)])
        eb = np.concatenate([b, np.maximum(c, a), np.maximum(c, b)])
        return pa.table(
            {"a": pa.array(ea), "b": pa.array(eb),
             "s": pa.array(np.ones(len(ea), np.int64))}
        )

    # int-bucket pre-combine shuffle, NOT Ray's two-int64-key sort
    # aggregate (~240 µs/row — it alone timed out the 4M-edge smoke)
    sup = rename_cols(
        bucket_sum_by(
            tri.map_batches(_edges3, batch_format="pyarrow"),
            ["a", "b"], "s",
            {"a": pa.int64(), "b": pa.int64(), "s": pa.int64()},
        ),
        {"s": "cn"},
    )

    def _fill(t: pa.Table) -> pa.Table:
        cn = pc.fill_null(t["cn"].combine_chunks().cast(pa.int64()), 0)
        return pa.table({"a": t["a"], "b": t["b"], "cn": cn})

    j = hash_join(pairs, ensure_schema(sup, {"a": pa.int64(), "b": pa.int64(),
                                             "cn": pa.int64()}),
                  on=("a", "b"), how="left", num_buckets=nb)
    return ensure_schema(
        j.map_batches(_fill, batch_format="pyarrow"),
        {"a": pa.int64(), "b": pa.int64(), "cn": pa.int64()},
    ).materialize()


def _decrement_support(sup_keep, removed, p: int, nb: int):
    """Incremental sweep: new materialized support table for the kept
    edges, decremented by the triangles lost to ``removed``.

    sup_keep / removed are (a, b, cn) / (a, b[, cn]) pair tables;
    ``sup_keep ∪ removed`` is the old graph."""
    import ray
    import pyarrow.compute as pc

    from mercury_graph_ray.stages.join import hash_join
    from mercury_graph_ray.stages.util import bucket_sum_by, ensure_schema

    def _sym(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"c": pa.array(np.concatenate([a, b])),
             "x": pa.array(np.concatenate([b, a]))}
        )

    # endpoints of the removed edges — small by the adaptive precondition
    r_pd = removed.select_columns(["a", "b"]).to_pandas()
    ends = np.unique(np.concatenate([r_pd["a"].to_numpy(np.int64),
                                     r_pd["b"].to_numpy(np.int64)]))
    ends_ref = ray.put(ends)

    r_sym = ensure_schema(
        removed.map_batches(_sym, batch_format="pyarrow"),
        {"c": pa.int64(), "x": pa.int64()},
    )

    def _sym_filtered(t: pa.Table) -> pa.Table:
        e = ray.get(ends_ref)
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.concatenate([a, b])
        y = np.concatenate([b, a])
        # old graph = kept ∪ removed; keep only centers that touch a
        # removed edge — every mixed wedge has such a center
        m = np.searchsorted(e, c)
        np.clip(m, 0, len(e) - 1, out=m)
        keep = e[m] == c if len(e) else np.zeros(len(c), bool)
        return pa.table({"c": pa.array(c[keep]), "y": pa.array(y[keep])})

    old_sym = ensure_schema(
        sup_keep.select_columns(["a", "b"])
        .union(removed.select_columns(["a", "b"]))
        .map_batches(_sym_filtered, batch_format="pyarrow"),
        {"c": pa.int64(), "y": pa.int64()},
    )

    # W_mixed: ordered (removed-side x, old-side y) wedges per center
    mixed = hash_join(r_sym, old_sym, on=("c",), num_buckets=nb)

    def _canon_count(t: pa.Table) -> pa.Table:
        x = t["x"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["y"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        m = x != y
        x, y = x[m], y[m]
        a = np.minimum(x, y)
        b = np.maximum(x, y)
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b),
             "d": pa.array(np.ones(len(a), np.int64))}
        )

    wm = ensure_schema(
        mixed.map_batches(_canon_count, batch_format="pyarrow"),
        {"a": pa.int64(), "b": pa.int64(), "d": pa.int64()},
    )

    # W_RR: triangles that lost BOTH other edges are double-counted in
    # W_mixed — add their wedge count back once
    wrr = _wedge_counts(removed.select_columns(["a", "b"]), None, p, nb, None,
                        need_weights=False).select_columns(["a", "b", "cn"])

    def _neg(t: pa.Table) -> pa.Table:
        cn = t["cn"].combine_chunks().cast(pa.int64())
        return pa.table(
            {"a": t["a"], "b": t["b"], "d": pc.negate(cn)}
        )

    # one int-bucket pre-combine shuffle sums W_mixed − W_RR per edge
    # (Ray's two-key sort aggregate is ~240 µs/row; see bucket_sum_by)
    dec = bucket_sum_by(
        wm.union(wrr.map_batches(_neg, batch_format="pyarrow")),
        ["a", "b"], "d",
        {"a": pa.int64(), "b": pa.int64(), "d": pa.int64()},
    )

    j = hash_join(sup_keep, ensure_schema(dec, {"a": pa.int64(), "b": pa.int64(),
                                                "d": pa.int64()}),
                  on=("a", "b"), how="left", num_buckets=nb)

    def _apply(t: pa.Table) -> pa.Table:
        cn = t["cn"].combine_chunks().cast(pa.int64())
        d = pc.fill_null(t["d"].combine_chunks().cast(pa.int64()), 0)
        return pa.table({"a": t["a"], "b": t["b"], "cn": pc.subtract(cn, d)})

    return ensure_schema(
        j.map_batches(_apply, batch_format="pyarrow"),
        {"a": pa.int64(), "b": pa.int64(), "cn": pa.int64()},
    ).materialize()


_WEDGE_CHUNK = 16_000_000  # wedge rows per driver-side enumeration slice


def _support_vectorized(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-edge triangle support of canonical (a < b) pairs, pure numpy.

    Degree-ordered orientation (the `algos/triangles.py` apex rule) +
    packed-uint64 sorted-key closure probe, chunked over source groups
    so no slice materializes more than ``_WEDGE_CHUNK`` wedge rows —
    O(Σ oriented-deg²) work, bounded memory, zero Python per edge."""
    m = len(a)
    if m == 0:
        return np.zeros(0, np.int64)
    n = int(max(a.max(), b.max())) + 1
    deg = np.bincount(np.concatenate([a, b]), minlength=n)
    a_first = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (a < b))
    u = np.where(a_first, a, b)
    v = np.where(a_first, b, a)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
    sizes = np.diff(np.concatenate([starts, [m]]))
    keys = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
    sort_keys = np.sort(keys)
    sup_sorted = np.zeros(m, np.int64)
    wedge_per_group = sizes * (sizes - 1) // 2
    cum = np.cumsum(wedge_per_group)
    total_w = int(cum[-1])
    cuts = (
        np.searchsorted(cum, np.arange(_WEDGE_CHUNK, total_w, _WEDGE_CHUNK)) + 1
        if total_w > _WEDGE_CHUNK
        else np.array([], np.int64)
    )
    bounds = np.unique(np.concatenate([cuts, [len(sizes)]])).astype(np.int64)
    g0 = 0
    for g1 in bounds:
        g1 = int(g1)
        if g1 <= g0:
            continue
        st, sz = starts[g0:g1], sizes[g0:g1]
        total_edges = int(sz.sum())
        if total_edges == 0:
            g0 = g1
            continue
        # flatten this slice's (u, v) runs and enumerate ordered pairs
        # with the grouped-arange kernel
        cum0 = np.cumsum(sz) - sz
        local_pos = np.arange(total_edges) - np.repeat(cum0, sz)
        pos = np.repeat(st, sz) + local_pos
        vv = v[pos]
        left_counts = np.repeat(sz, sz) - 1 - local_pos
        tw = int(left_counts.sum())
        if tw:
            left = np.repeat(vv, left_counts)
            run_starts = np.cumsum(left_counts) - left_counts
            off = np.arange(tw) - np.repeat(run_starts, left_counts)
            right = vv[np.repeat(np.arange(total_edges) + 1, left_counts) + off]
            center = np.repeat(u[pos], left_counts)
            wa = np.minimum(left, right)
            wb = np.maximum(left, right)
            wk = (wa.astype(np.uint64) << np.uint64(32)) | wb.astype(np.uint64)
            ix = np.minimum(np.searchsorted(sort_keys, wk), m - 1)
            hit = sort_keys[ix] == wk
            if hit.any():
                # each confirmed triangle supports (wa,wb), (c,wa), (c,wb)
                c, wa, wb, ix = center[hit], wa[hit], wb[hit], ix[hit]
                k2 = (np.minimum(c, wa).astype(np.uint64) << np.uint64(32)) | \
                    np.maximum(c, wa).astype(np.uint64)
                k3 = (np.minimum(c, wb).astype(np.uint64) << np.uint64(32)) | \
                    np.maximum(c, wb).astype(np.uint64)
                allix = np.concatenate(
                    [ix, np.searchsorted(sort_keys, k2),
                     np.searchsorted(sort_keys, k3)]
                )
                sup_sorted += np.bincount(allix, minlength=m)
        g0 = g1
    # map sorted-key-order support back onto the input edge order
    return sup_sorted[np.searchsorted(sort_keys, keys)]


def _peel_small(df, thr: int, max_iter: int):
    """Driver-side sweep-synchronous peel.

    IDENTICAL removal semantics to the distributed loop (drop ALL
    sub-threshold edges, recompute, repeat), so n_iter and the fixpoint
    match; the vectorized oriented-wedge support kernel replaces five
    Dataset stages whose per-sweep launch+shuffle latency dominates up
    to millions of edges (measured round 5: 300k edges × tens of sweeps
    blew a 580 s budget distributed, while one vectorized recount is
    tens of ms — the same dual-path discipline as Louvain's pandas
    small-graph path). Returns (surviving (a, b) DataFrame, n_iter)."""
    import pandas as pd

    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    it = 1
    while it <= max_iter:
        sup = _support_vectorized(a, b)
        keep = sup >= thr
        if keep.all():
            return pd.DataFrame({"a": a, "b": b}), it
        it += 1
        a, b = a[keep], b[keep]
        if len(a) == 0:
            return pd.DataFrame({"a": a, "b": b}), it
    raise RuntimeError(f"k-truss peel did not finish in {max_iter} sweeps")


class KTruss(BaseClass):
    """``KTruss(k).fit(g)`` sets ``edges_`` (Dataset of the truss's
    canonical edges in original key space, columns (a, b)), ``n_iter_``
    (peel sweeps; the last sweep is the no-shrink one certifying the
    fixpoint) and ``sweep_modes_`` (per-sweep ``"full"``/``"incr"``, or
    ``["driver"]`` when the whole graph fit the small-graph path —
    sweep 1 is always a seeding full count; later sweeps are incremental
    unless the removal exceeded ``recount_frac`` of the surviving
    edges)."""

    def __init__(self, k: int, n_parts: int | None = None, max_iter: int = 100,
                 recount_frac: float = 0.25, recount_min_edges: int = 5_000_000):
        if k < 2:
            raise ValueError("k must be >= 2 (the 2-truss is the whole simple graph)")
        self.k = k
        self.n_parts = n_parts or DEFAULT_N_PARTS
        self.max_iter = max_iter
        self.recount_frac = recount_frac
        # below this edge count the graph takes the DRIVER-SIDE peel
        # (vectorized oriented-wedge recounts; one process, zero
        # shuffles). Round-5 measurements moved the cutoff from 100k to
        # 5M: the peel is a LONG chain of cheap sweeps, and per-sweep
        # pipeline launch+shuffle latency dominates far beyond 100k
        # edges (300k edges × tens of sweeps blew a 580 s budget
        # distributed; one vectorized recount at that size is ~50 ms —
        # see BASELINE.md round 5). Above the cutoff sweeps are
        # distributed: incremental decrements normally, full recount
        # when the removal fraction exceeds recount_frac.
        self.recount_min_edges = recount_min_edges

    def fit(self, g) -> "KTruss":
        import ray.data as rd

        from mercury_graph_ray.stages.util import ensure_schema

        p = self.n_parts
        nb = max(2, p)
        thr = self.k - 2
        vd, canon, degs = simple_pairs(g)
        if canon.count() < self.recount_min_edges:
            small, it = _peel_small(canon.to_pandas(), thr, self.max_iter)
            self.sweep_modes_ = ["driver"]
            self.n_iter_ = it
            pairs = ensure_schema(
                rd.from_pandas(small), {"a": pa.int64(), "b": pa.int64()}
            )
            out = vd.decode(pairs, col="a")
            self.edges_ = vd.decode(out, col="b").materialize()
            return self
        import time as _time

        t0 = _time.time()
        sup = _initial_support(canon, degs, vd.n, p, nb)
        self.sweep_modes_ = ["full"]
        self.sweep_secs_ = [round(_time.time() - t0, 2)]
        self.sweep_edges_ = [int(canon.count())]
        it = 1
        converged = False
        while it <= self.max_iter:
            t0 = _time.time()
            keep, drop = _split_by_support(sup, thr)
            n_drop = drop.count()
            if n_drop == 0:
                converged = True
                break
            it += 1
            keep = keep.materialize()
            n_keep = keep.count()
            if n_keep == 0:
                # everything died at once: the truss is empty, no
                # supports left to maintain
                sup = keep
                self.sweep_modes_.append("incr")
                converged = True
                break
            if (
                n_keep + n_drop < self.recount_min_edges
                or n_drop > self.recount_frac * (n_keep + n_drop)
            ):
                # removal touches most of the graph: a full recount over
                # the (now much smaller) survivor set is cheaper than
                # enumerating the removal's neighborhood
                # stale (original-graph) degrees: any total order is
                # correct for the apex rule; reusing them skips a
                # degree recompute per recount sweep
                sup = _initial_support(keep.select_columns(["a", "b"]),
                                       degs, vd.n, p, nb)
                self.sweep_modes_.append("full")
            else:
                sup = _decrement_support(keep, drop.materialize(), p, nb)
                self.sweep_modes_.append("incr")
            self.sweep_secs_.append(round(_time.time() - t0, 2))
            self.sweep_edges_.append(int(n_keep))
        if not converged:
            raise RuntimeError(f"k-truss peel did not finish in {self.max_iter} sweeps")
        self.n_iter_ = it
        pairs = sup.select_columns(["a", "b"])
        out = vd.decode(pairs, col="a")
        self.edges_ = vd.decode(out, col="b").materialize()
        return self
