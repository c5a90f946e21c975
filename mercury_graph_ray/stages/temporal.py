"""Temporal join + window operators Ray Data lacks natively.

Three operators a large-scale event/training-data pipeline needs that the
Dataset API has no verb for, each expressed as a composition the streaming
executor can schedule (per the engine's custom-operator policy:
composition first, actor state only when unavoidable):

- :func:`asof_join` — for every left row, the single most recent right row
  of the same key at-or-before (``direction="backward"``) its timestamp.
  One bucketed co-group shuffle on the key (shared with
  ``stages/join.hash_join``), then a vectorized ``pandas.merge_asof`` per
  bucket. Partitioning assumption: one bucket (all rows of
  ``num_buckets``-th of the key space, both sides) fits in a task — the
  same contract as the equi hash-join; salt hot keys upstream.
- :func:`range_join` — every (left, right) pair of the same key with
  ``right_ts`` inside ``[left_ts + lower, left_ts + upper]``. Equi-key
  co-group + vectorized in-bucket merge-and-filter. Output size is the
  true pair count; per-key cross products bound the in-task working set
  (document/salt hot keys).
- :func:`sliding_window` — fixed-size hopping windows (window ``w``, hop
  ``h``): each row belongs to ``ceil(w/h)`` windows; rows are expanded to
  (window_start, key) inside ``map_batches`` with a per-batch partial
  aggregate (numpy), so the global groupby shuffles pre-combined partials,
  not raw rows — the same combiner discipline as ``events_hourly``.

All three are streaming: no driver materialization, one all-to-all
exchange each.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mercury_graph_ray.stages.join import cogroup_buckets
from mercury_graph_ray.stages.util import arrow_types, rename_cols


def asof_join(left, right, by: list[str] | tuple, left_on: str,
              right_on: str, *, direction: str = "backward",
              tolerance=None, suffix: str = "_r", num_buckets: int = 32):
    """As-of join: attach to each left row the nearest right row of the
    same ``by`` key per ``direction`` (backward = latest right_on <=
    left_on). Unmatched left rows keep typed nulls (left-outer semantics,
    like ``pandas.merge_asof``).

    Right-side columns that collide with left names (other than ``by``)
    are suffixed with ``suffix``. Ties on ``right_on`` within a key follow
    merge_asof's last-position rule; to make that deterministic under
    Ray's nondeterministic block arrival order, the right side is sorted
    by a TOTAL order — (right_on, by, every remaining right column) — so
    equal-timestamp rows resolve identically across runs. Rows identical
    in ALL right columns are interchangeable, so the result is stable.
    (Object-dtype tiebreak columns compare by ``repr`` — a total order
    even with nulls or mixed types.)
    """
    by = list(by)
    lschema = left.schema()
    lcols = list(lschema.names)
    ltypes = arrow_types(left)

    # disambiguate right columns (keep `by` shared — it is the co-group key)
    rschema = right.schema()
    ren = {
        c: (c + suffix if (c in lcols and c not in by) else c)
        for c in rschema.names
    }
    rtypes = {ren[n]: t for n, t in arrow_types(right).items()}
    rcols = list(rtypes)
    right = rename_cols(right, ren)
    right_on = ren.get(right_on, right_on)

    extra_r = [c for c in rcols if c not in lcols]
    out_cols = lcols + extra_r
    all_types = {**rtypes, **ltypes}

    def _merge(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        if lp.empty:
            return lp.reindex(columns=out_cols)
        ls = lp.sort_values([left_on] + by, kind="mergesort")
        # total-order right sort: break right_on ties on EVERY remaining
        # column so the winner doesn't depend on block arrival order.
        # Object columns sort by repr (a total order even with nulls or
        # mixed types — sampling the first row to decide sortability
        # would make the tiebreak itself nondeterministic per group).
        keys = [right_on] + by
        sort_df = pd.DataFrame(index=rp.index)
        for c in keys:
            sort_df[c] = rp[c]
        for c in sorted(rp.columns):
            if c in keys:
                continue
            col = rp[c]
            sort_df[c] = col.map(repr) if col.dtype == object else col
        order = sort_df.sort_values(list(sort_df.columns), kind="mergesort").index
        rs = rp.loc[order]
        m = pd.merge_asof(
            ls, rs, left_on=left_on, right_on=right_on, by=by,
            direction=direction, tolerance=tolerance,
        )
        return m.reindex(columns=out_cols)

    return cogroup_buckets(
        left, right, by, _merge,
        out_cols=out_cols, all_types=all_types, num_buckets=num_buckets,
        lcols=lcols, rcols=rcols,
    )


def range_join(left, right, by: list[str] | tuple, left_on: str,
               right_on: str, *, lower, upper, suffix: str = "_r",
               num_buckets: int = 32):
    """Interval join: all (left, right) pairs with equal ``by`` keys and
    ``left_on + lower <= right_on <= left_on + upper`` (bounds inclusive;
    ``lower``/``upper`` are ``pd.Timedelta``-compatible offsets, negative
    lower looks back). Inner semantics — lefts with no partner emit no
    row; wrap with a left aggregate + zero-fill for outer counts."""
    by = list(by)
    lschema = left.schema()
    lcols = list(lschema.names)
    ltypes = arrow_types(left)

    rschema = right.schema()
    ren = {
        c: (c + suffix if (c in lcols and c not in by) else c)
        for c in rschema.names
    }
    rtypes = {ren[n]: t for n, t in arrow_types(right).items()}
    rcols = list(rtypes)
    right = rename_cols(right, ren)
    right_on = ren.get(right_on, right_on)

    extra_r = [c for c in rcols if c not in lcols]
    out_cols = lcols + extra_r
    all_types = {**rtypes, **ltypes}
    lo, up = pd.Timedelta(lower), pd.Timedelta(upper)

    def _merge(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        if lp.empty or rp.empty:
            return lp.iloc[:0].reindex(columns=out_cols)
        m = lp.merge(rp, on=by, how="inner")
        if m.empty:
            return m.reindex(columns=out_cols)
        dt = m[right_on] - m[left_on]
        return m.loc[(dt >= lo) & (dt <= up)].reindex(columns=out_cols)

    return cogroup_buckets(
        left, right, by, _merge,
        out_cols=out_cols, all_types=all_types, num_buckets=num_buckets,
        lcols=lcols, rcols=rcols,
    )


def sliding_window(ds, ts_col: str, *, window, hop,
                   keys: list[str] | None = None, value_col: str | None = None,
                   origin: str | np.datetime64 = "1970-01-01"):
    """Hopping-window aggregate: count (and sum of ``value_col``) per
    (window_start[, keys]) for fixed windows of length ``window`` starting
    every ``hop``. A row at time t belongs to every window start s with
    s <= t < s + window and s ≡ origin (mod hop).

    Expansion factor is ``ceil(window/hop)`` (tumbling = 1); the per-batch
    partial aggregate collapses each batch to at most
    (#windows x #keys)-in-batch rows before the single groupby shuffle.
    """
    win = pd.Timedelta(window).to_timedelta64().astype("timedelta64[us]")
    hp = pd.Timedelta(hop).to_timedelta64().astype("timedelta64[us]")
    org = np.datetime64(origin, "us")
    n_copies = int(-(-win.astype(np.int64) // hp.astype(np.int64)))
    keys = list(keys or [])

    def _partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            cols = {"window_start": pa.array([], pa.timestamp("us"))}
            for k in keys:
                cols[k] = t[k] if k in t.schema.names else pa.array([], pa.string())
            cols["n"] = pa.array([], pa.int64())
            cols["sum_value"] = pa.array([], pa.float64())
            return pa.table(cols)
        ts = t[ts_col].combine_chunks().to_numpy(zero_copy_only=False).astype("datetime64[us]")
        # newest window containing t starts at floor((t - origin)/hop)*hop
        base = ((ts - org) // hp) * hp + org
        parts = {"window_start": np.concatenate(
            [base - i * hp for i in range(n_copies)]
        )}
        rep_idx = np.tile(np.arange(n), n_copies)
        # drop copies where the row fell out of the (shorter) window tail
        ts_rep = ts[rep_idx]
        keep = (ts_rep - parts["window_start"]) < win
        df = pd.DataFrame({"window_start": parts["window_start"][keep]})
        for k in keys:
            kv = t[k].combine_chunks().to_numpy(zero_copy_only=False)
            df[k] = kv[rep_idx][keep]
        if value_col is not None:
            vv = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
            df["__v"] = vv[rep_idx][keep].astype(np.float64)
        else:
            df["__v"] = 0.0
        g = df.groupby(["window_start"] + keys, as_index=False).agg(
            n=("__v", "size"), sum_value=("__v", "sum")
        )
        return pa.Table.from_pandas(
            g.astype({"n": np.int64}), preserve_index=False
        ).cast(pa.schema(
            [("window_start", pa.timestamp("us"))]
            + [(k, t.schema.field(k).type) for k in keys]
            + [("n", pa.int64()), ("sum_value", pa.float64())]
        ))

    from ray.data.aggregate import Sum

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return (
        partials.groupby(["window_start"] + keys)
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
    )
