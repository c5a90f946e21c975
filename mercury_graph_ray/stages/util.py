"""Small Dataset utilities."""

from __future__ import annotations

import pyarrow as pa


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

    return ds.map_batches(_fix, batch_format="pyarrow")
