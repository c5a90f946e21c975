"""Deterministic sampling operators for training-data curation.

Beyond-ref (SURVEY.md §2.11). Corpus pipelines downsample over-represented
strata (language, source, domain) with a REPRODUCIBLE rule — re-running
the pipeline, at any parallelism, on any partitioning, must keep the same
rows. The selector is the keyed two-round LCG permutation of algos/mis.py:

    keep(id) iff lcg_priority(id) < floor(rate * M)        (M = 2^31-1)

— injective on [0, M), so the kept fraction is exact to 1/M, deterministic,
and SQL-expressible verbatim (the driver oracle recomputes the predicate in
DuckDB). Map-only: a filter inside ``map_batches``, no shuffle, no driver
state, nothing broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mercury_graph_ray.algos.mis import PRIO_M, lcg_priority


def keep_mask(ids: np.ndarray, rates: np.ndarray) -> np.ndarray:
    """Vectorized deterministic Bernoulli(rate) keyed on integer ids."""
    prio = lcg_priority(ids)
    return prio < np.floor(np.asarray(rates, np.float64) * PRIO_M).astype(np.int64)


def stratified_sample(ds, id_col: str, strata_col: str, rates: dict,
                      default_rate: float = 1.0):
    """Filter ``ds`` keeping each stratum at its configured rate.

    ``rates``: {stratum value -> keep fraction in [0, 1]}; strata not
    listed keep ``default_rate``. Rows keep or drop by the LCG predicate
    on ``id_col`` alone, so the decision for a given row never depends on
    batch boundaries or execution order.
    """
    items = sorted(rates.items())
    keys = [k for k, _ in items]
    vals = np.array([v for _, v in items], np.float64)

    def _filter(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        strata = t[strata_col].combine_chunks().to_pandas().astype(str)
        if keys:
            idx = pd.Index(keys).get_indexer(strata)
            rate = np.where(idx >= 0, vals[np.clip(idx, 0, None)], default_rate)
        else:
            rate = np.full(len(ids), default_rate)
        return t.filter(pa.array(keep_mask(ids, rate)))

    return ds.map_batches(_filter, batch_format="pyarrow")
