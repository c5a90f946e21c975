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
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    extra_r = [c for c in rcols if c not in lcols]
    out_cols = lcols + extra_r
    all_types = {**rtypes, **ltypes}  # left wins for shared names

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
            keys = t.select(on).to_pandas()
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

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        lpart = group.loc[group["__side"] == 0, lcols]
        rpart = group.loc[group["__side"] == 1, rcols]
        return lpart.merge(rpart, on=on, how=how)[out_cols]

    return u.groupby("__bucket").map_groups(_merge, batch_format="pandas")
