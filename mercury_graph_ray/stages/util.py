"""Small Dataset utilities."""

from __future__ import annotations

import pyarrow as pa


def rename_cols(ds, mapping: dict[str, str]):
    """Explicit map_batches column rename.

    ``Dataset.rename_columns`` creates a Project operator that this Ray
    release sometimes mis-fuses with a downstream ``map_batches`` from a
    *different* branch of a shared upstream (observed as KeyErrors on
    columns that only exist pre-rename). A plain map_batches rename
    avoids the Project fusion path entirely.
    """

    def _r(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return t
        return t.rename_columns([mapping.get(n, n) for n in t.schema.names])

    return ds.map_batches(_r, batch_format="pyarrow")


def arrow_types(ds) -> dict[str, pa.DataType]:
    """Column name -> pyarrow DataType for any Dataset.

    ``Dataset.schema().types`` returns pyarrow types for Arrow-blocked
    datasets but raw numpy dtypes / Python classes (``object``) for
    pandas-blocked ones (``rd.from_pandas``); normalize so schema-driven
    code (ensure_schema targets, type dispatch) works on both."""
    sch = ds.schema()
    out: dict[str, pa.DataType] = {}
    for n, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            out[n] = t
        else:
            try:
                out[n] = pa.from_numpy_dtype(t)
            except (pa.ArrowNotImplementedError, TypeError):
                out[n] = pa.string()  # object dtype: string keys
    return out


def ensure_schema(ds, schema: dict[str, pa.DataType]):
    """Normalize every block to exactly ``schema`` (column order + types).

    Ray groupby/map_groups stages emit schema-less EMPTY blocks whenever
    the reduce-partition count exceeds the group count; pyarrow's acero
    join then fails with "No match or multiple matches for key field".
    This streaming map rebuilds typed empty blocks and casts/reorders
    non-empty ones, so joins always see a uniform schema.
    """
    names = list(schema.keys())
    target = pa.schema([(n, schema[n]) for n in names])

    def _fix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return target.empty_table()
        cols = [t[n].cast(schema[n]) if t.schema.field(n).type != schema[n] else t[n] for n in names]
        return pa.table(dict(zip(names, cols)))

    import ray.data as rd

    # union one typed empty block: a dataset whose every block is empty
    # otherwise reports schema() None, which breaks downstream joins
    anchor = rd.from_arrow(target.empty_table())
    return ds.map_batches(_fix, batch_format="pyarrow").union(anchor)


def bucket_sum_by(ds, key_cols, val_cols, schema: dict[str, pa.DataType],
                  *, n_buckets: int = 64, agg: str = "sum"):
    """``groupby(keys).agg(vals)`` as per-batch pre-combine + int-bucket
    shuffle.

    Ray 2.49's sort-based ``groupby().aggregate(Sum)`` costs ~240 µs/row
    (string keys worst, int keys not much better); pre-combining inside
    each batch and shuffling at most one row per (batch, key) on
    ``hash(key) % n_buckets`` is an order of magnitude faster, hub-safe
    (a hot key contributes one partial per batch) and identical in
    output. ``agg`` must be an associative combine whose partial equals
    its final ("sum", "max", "min"). ``schema`` pins the result types
    because empty bucket groups come out schema-less on this Ray version
    (see ensure_schema)."""
    import numpy as np
    import pandas as pd

    assert agg in ("sum", "max", "min"), agg
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    vals = [val_cols] if isinstance(val_cols, str) else list(val_cols)

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False)[vals].agg(agg)
        g["_bucket"] = (
            pd.util.hash_pandas_object(g[keys], index=False).to_numpy() % n_buckets
        ).astype(np.int64)
        return g

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False)[vals].agg(agg)

    out = (
        ds.map_batches(_pre, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(_final, batch_format="pandas")
    )
    return ensure_schema(out, schema)
