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
