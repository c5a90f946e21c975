"""Explicit partitioned hash-join (bucketed merge).

``Dataset.join`` in this Ray release fails with acero schema errors
whenever a hash partition receives no blocks (it synthesizes schema-less
empties), which any low-cardinality key triggers. This is the portable
pattern instead: add ``bucket = hash(key) % B`` to both sides, align
schemas with typed null padding, union, and merge matching buckets
pairwise inside ``groupby(bucket).map_groups`` with pandas — one shuffle
of both sides, vectorized merges, deterministic output. B bounds
per-task memory; salt hot keys upstream if a single key dominates a
bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mercury_graph_ray.stages.util import arrow_types


def broadcast_join(left, right_df: pd.DataFrame, on: list[str] | tuple, *,
                   how: str = "inner"):
    """Join a Dataset against a SMALL pandas table broadcast via ``ray.put``
    — no shuffle, one streaming pass over the left side (the guide's
    small-side pattern). Output blocks are typed Arrow (nullable ints
    preserved on outer joins)."""
    import ray

    on = list(on)
    lschema = left.schema()
    lcols = list(lschema.names)
    ltypes = arrow_types(left)
    rcols = list(right_df.columns)
    rtypes = {
        c: pa.Schema.from_pandas(right_df[[c]]).field(c).type for c in rcols
    }
    extra_r = [c for c in rcols if c not in lcols]
    out_cols = lcols + extra_r
    all_types = {**rtypes, **ltypes}
    ref = ray.put(right_df)

    def _bj(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({c: pa.nulls(0, type=all_types[c]) for c in out_cols})
        rdf = ray.get(ref)
        merged = t.to_pandas().merge(rdf, on=on, how=how)
        return pa.table(
            {c: pa.Array.from_pandas(merged[c], type=all_types[c]) for c in out_cols}
        )

    from mercury_graph_ray.stages.util import ensure_schema

    return ensure_schema(
        left.map_batches(_bj, batch_format="pyarrow"),
        {c: all_types[c] for c in out_cols},
    )


def cogroup_buckets(left, right, key_cols: list[str], merge_fn, *,
                    out_cols: list[str], all_types: dict,
                    num_buckets: int = 32,
                    lcols: list[str] | None = None,
                    rcols: list[str] | None = None):
    """Generic bucketed co-group: shuffle BOTH sides once on
    ``hash(key_cols) % num_buckets`` and run ``merge_fn(lpart, rpart)``
    (pandas frames carrying each side's original columns) per bucket,
    returning a frame with ``out_cols``. This is the single exchange every
    two-sided keyed operator here (equi-join, as-of join, range join)
    shares; per-bucket data must fit one task — salt hot keys upstream if
    a single key dominates."""
    # callers that renamed a side pass its columns explicitly — an
    # all-empty renamed Dataset reports schema() None in this Ray release
    lcols = lcols if lcols is not None else list(left.schema().names)
    rcols = rcols if rcols is not None else list(right.schema().names)

    def _prep(side: int, my_cols):
        def _fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                cols = {
                    "__bucket": pa.array([], pa.int64()),
                    "__side": pa.array([], pa.int8()),
                }
                for c in out_cols:
                    cols[c] = pa.nulls(0, type=all_types[c])
                return pa.table(cols)
            keys = t.select(key_cols).to_pandas()
            h = pd.util.hash_pandas_object(keys, index=False).to_numpy(np.uint64)
            cols = {
                "__bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
                "__side": pa.array(np.full(t.num_rows, side, np.int8)),
            }
            for c in out_cols:
                if c in my_cols:
                    arr = t[c]
                    if arr.type != all_types[c]:
                        arr = arr.cast(all_types[c])
                    cols[c] = arr
                else:
                    cols[c] = pa.nulls(t.num_rows, type=all_types[c])
            return pa.table(cols)

        return _fn

    l2 = left.map_batches(_prep(0, set(lcols)), batch_format="pyarrow")
    r2 = right.map_batches(_prep(1, set(rcols)), batch_format="pyarrow")
    u = l2.union(r2)

    def _merge(group: pd.DataFrame) -> pa.Table:
        lpart = group.loc[group["__side"] == 0, lcols]
        rpart = group.loc[group["__side"] == 1, rcols]
        merged = merge_fn(lpart, rpart)
        if len(merged) == 0:
            # typed empty — a reindexed empty frame has object/float dtypes
            # that can't cast to e.g. timestamp
            return pa.table({c: pa.nulls(0, type=all_types[c]) for c in out_cols})
        # emit Arrow with the declared types so every block (including
        # empty buckets) has an identical schema: pandas turns nullable
        # ints into float64+NaN on outer joins; from_pandas converts back
        # losslessly with nulls.
        cols = {}
        for c in out_cols:
            cols[c] = pa.Array.from_pandas(merged[c], type=all_types[c])
        return pa.table(cols)

    out = u.groupby("__bucket").map_groups(_merge, batch_format="pandas")
    # map_groups synthesizes schema-less empty blocks for empty reduce
    # partitions; normalize them (and guarantee schema() is non-None even
    # for an all-empty result)
    from mercury_graph_ray.stages.util import ensure_schema

    return ensure_schema(out, {c: all_types[c] for c in out_cols})


def hash_join(left, right, on: list[str] | tuple, *, how: str = "inner",
              num_buckets: int = 32):
    """Join two Datasets on equality of ``on`` columns.

    Output columns: left columns then right-only columns (pandas-merge
    semantics; ``on`` columns appear once)."""
    on = list(on)
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    ltypes = arrow_types(left)
    rtypes = arrow_types(right)
    extra_r = [c for c in rcols if c not in lcols]
    out_cols = lcols + extra_r
    all_types = {**rtypes, **ltypes}  # left wins for shared names

    return cogroup_buckets(
        left, right, on,
        lambda lp, rp: lp.merge(rp, on=on, how=how),
        out_cols=out_cols, all_types=all_types, num_buckets=num_buckets,
    )


# above this many BYTES a right side is too big to broadcast (a 20M-row
# x 3-col frame is ~0.5-1 GB on the driver — round-1 VERDICT #7 flagged
# row-based thresholds as far too generous)
AUTO_BROADCAST_BYTES = 64 << 20


def auto_join(left, right, on, *, how: str = "inner",
              broadcast_bytes: int = AUTO_BROADCAST_BYTES):
    """Adaptive join (the Louvain round-1 pattern, promoted here):
    materialize the right side and broadcast it when under
    ``broadcast_bytes`` — one streaming pass, no shuffle and none of the
    per-bucket task storm a bucketed join pays on small inputs — else
    fall back to the bucketed :func:`hash_join`. The size probe reads the
    materialized Dataset's block metadata (no extra count() job)."""
    mat = right.materialize()
    size = mat.size_bytes() or 0
    if size <= broadcast_bytes:
        rdf = mat.to_pandas()
        if rdf.shape[1] == 0:  # all-empty Dataset.to_pandas drops the schema
            sch = mat.schema()
            rdf = pa.schema(list(zip(sch.names, sch.types))).empty_table().to_pandas()
        return broadcast_join(left, rdf, on, how=how)
    return hash_join(left, mat, on, how=how)
