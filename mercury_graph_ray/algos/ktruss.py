"""k-truss decomposition (fixed k) — iterative support peeling.

Not in the reference (beyond-ref, SURVEY.md §2.11). The k-truss is the
maximal subgraph of the simple undirected graph in which every edge is
supported by >= k-2 triangles WITHIN the subgraph (nx.k_truss oracle) —
the edge-analog of the k-core and the standard cohesive-subgraph
refinement of triangle counting.

Peel loop over the canonical pair Dataset: each round recomputes per-edge
support with the shared wedge kernel (``algos.linkpred._wedge_counts`` —
one grouped-arange enumeration + one (a, b) groupby) and drops edges
below threshold via a bucketed left join; the loop stops when the edge
set stops shrinking. Unlike k-core (where per-round work is trivial and
the BSP engine's low superstep latency dominates), each truss round is a
genuine O(Σ deg²) wedge recount over the SHRINKING edge set, so the
Dataset-join shape is the right engine: compute dominates launch
overhead, later rounds get cheaper, and rounds are few (support can only
drop when a neighbor edge dies — cascades flatten in 2-4 sweeps on real
graphs). A production refinement would decrement supports incrementally
instead of recounting; documented as the known optimization.
"""

from __future__ import annotations

import pyarrow as pa

from mercury_graph_ray.base import BaseClass
from mercury_graph_ray.algos.common import DEFAULT_N_PARTS, simple_pairs
from mercury_graph_ray.algos.linkpred import _wedge_counts


class KTruss(BaseClass):
    """``KTruss(k).fit(g)`` sets ``edges_`` (Dataset of the truss's
    canonical edges in original key space, columns (a, b)) and
    ``n_iter_`` (peel sweeps; the last sweep is the no-shrink one that
    certifies the fixpoint)."""

    def __init__(self, k: int, n_parts: int | None = None, max_iter: int = 100):
        if k < 2:
            raise ValueError("k must be >= 2 (the 2-truss is the whole simple graph)")
        self.k = k
        self.n_parts = n_parts or DEFAULT_N_PARTS
        self.max_iter = max_iter

    def fit(self, g) -> "KTruss":
        import pyarrow.compute as pc

        from mercury_graph_ray.stages.join import hash_join
        from mercury_graph_ray.stages.util import ensure_schema

        p = self.n_parts
        nb = max(2, p)
        thr = self.k - 2
        vd, canon, _ = simple_pairs(g)
        pairs = canon  # materialized by simple_pairs
        it = 0
        converged = False
        while it < self.max_iter:
            it += 1
            wed = _wedge_counts(pairs, None, p, nb, None, need_weights=False)
            j = hash_join(pairs, wed, on=("a", "b"), how="left", num_buckets=nb)

            def _keep(t: pa.Table) -> pa.Table:
                cn = pc.fill_null(t["cn"].combine_chunks().cast(pa.int64()), 0)
                return t.select(["a", "b"]).filter(pc.greater_equal(cn, thr))

            nxt = ensure_schema(
                j.map_batches(_keep, batch_format="pyarrow"),
                {"a": pa.int64(), "b": pa.int64()},
            ).materialize()
            c0, c1 = pairs.count(), nxt.count()
            pairs = nxt
            if c1 == c0:
                converged = True
                break
        if not converged:
            raise RuntimeError(f"k-truss peel did not finish in {self.max_iter} sweeps")
        self.n_iter_ = it
        out = vd.decode(pairs, col="a")
        self.edges_ = vd.decode(out, col="b").materialize()
        return self
