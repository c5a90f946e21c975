"""Exact distributed quantiles over a (typically integer) column.

Beyond-ref training-data operator (SURVEY.md §2.11): corpus curation
decisions ("drop docs under the p25 length", "cap at p99") need exact
percentiles, not sketches. Shape: per-batch ``np.unique`` value-count
pre-combine (map-only — the partial-aggregation discipline), one SMALL
``groupby(value).sum`` shuffle over the distinct values (bounded by the
value domain, not the row count), a distributed sort of the histogram,
then a single cumulative scan that stops at the largest requested rank.
The driver never sees row-level data — only (value, count) rows, and
only up to the target rank.

Rank rule (pinned for the SQL oracle): the q-quantile is the smallest
value whose cumulative count reaches ``ceil(q * N)`` — in SQL,
``min(v) WHERE cum >= ceil(q * N)`` over the running-total histogram.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def exact_quantiles(ds, col: str, qs: tuple) -> pd.DataFrame:
    """(q, value) DataFrame, one row per requested quantile 0 < q <= 1."""
    from ray.data.aggregate import Sum

    def _counts(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals), "cnt": pa.array(cnt.astype(np.int64))})

    hist = (
        ds.select_columns([col])
        .map_batches(_counts, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort("v")
    )
    total = 0
    rows = []  # (cum_before, value, count) streamed in value order
    targets = sorted(set(qs))
    out_vals: dict[float, object] = {}
    # first pass obtains N from the histogram partials (sum of counts);
    # to avoid a second job, stream once collecting (v, cnt) until all
    # ranks resolve — N must be known first, so take the cheap count()
    n = ds.count()
    ranks = {q: max(1, math.ceil(q * n)) for q in targets}
    need = sorted(ranks.items(), key=lambda kv: kv[1])
    i = 0
    for b in hist.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        v = b["v"].combine_chunks().to_numpy(zero_copy_only=False)
        c = b["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        cum = total + np.cumsum(c)
        while i < len(need) and need[i][1] <= cum[-1]:
            q, r = need[i]
            out_vals[q] = v[np.searchsorted(cum, r)]
            i += 1
        total = int(cum[-1])
        if i == len(need):
            break
    if i < len(need):  # pragma: no cover - only on an empty dataset
        raise ValueError(f"dataset has {n} rows; cannot resolve quantiles")
    return pd.DataFrame(
        {"q": list(targets), "value": [out_vals[q] for q in targets]}
    )
