"""Pages -> weighted edge table (graft entry point 0, SURVEY.md §3).

``read_parquet(pages)`` -> stateless ``map_batches`` extractor (html ->
normalized hrefs) -> explode to (src, dst) rows -> one
``groupby(['src','dst']).count()`` shuffle that de-duplicates and weights
in a single pass (SURVEY.md §2.7 graft row).

Scale notes:
- the read prunes to ``url, html`` (column pruning at the parquet reader);
- extraction is a stateless task stage (elastic, retryable) — the parser
  is pure Python per document, parallelized across batches;
- the only shuffle is keyed on (src, dst); repeated links collapse into a
  ``weight`` count, so downstream stages never see the raw link multiset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mercury_graph_ray.functions.extract import extract_links, normalize_url

_N_BUCKETS = 32


def _explode_links(batch: pa.Table, *, drop_self_loops: bool = False) -> pa.Table:
    """Extract hrefs AND pre-combine (the per-batch combiner): emit one
    (src, dst, weight, bucket) row per distinct pair in the batch. The
    downstream shuffle then groups by a small int bucket key — orders of
    magnitude cheaper than a sort-based groupby on string pairs."""
    srcs: list[str] = []
    dsts: list[str] = []
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    for url, html in zip(urls, htmls):
        src = normalize_url(url)
        if src is None:
            continue
        for dst in extract_links(html, url):
            if drop_self_loops and dst == src:
                continue
            srcs.append(src)
            dsts.append(dst)
    df = pd.DataFrame({"src": srcs, "dst": dsts})
    combined = df.groupby(["src", "dst"], sort=False).size().reset_index(name="weight")
    h = pd.util.hash_pandas_object(combined[["src", "dst"]], index=False).to_numpy(np.uint64)
    return pa.table(
        {
            "src": pa.array(combined["src"], pa.string()),
            "dst": pa.array(combined["dst"], pa.string()),
            "weight": pa.array(combined["weight"].to_numpy(np.float64)),
            "bucket": pa.array((h % np.uint64(_N_BUCKETS)).astype(np.int64)),
        }
    )


def _merge_bucket(group: pd.DataFrame) -> pa.Table:
    out = group.groupby(["src", "dst"], as_index=False, sort=False)["weight"].sum()
    return pa.table(
        {
            "src": pa.array(out["src"], pa.string()),
            "dst": pa.array(out["dst"], pa.string()),
            "weight": pa.array(out["weight"].to_numpy(np.float64)),
        }
    )


def pages_to_edges(pages, *, drop_self_loops: bool = False):
    """pages Dataset/path -> edges Dataset (src, dst, weight: float64).

    ``pages`` is a ``ray.data.Dataset`` with at least (url, html) columns,
    or a parquet path readable by ``ray.data.read_parquet``.
    """
    import ray.data as rd

    from mercury_graph_ray.stages.util import ensure_schema

    if isinstance(pages, str):
        pages = rd.read_parquet(pages, columns=["url", "html"])
    else:
        pages = pages.select_columns(["url", "html"])

    links = pages.map_batches(
        _explode_links,
        batch_format="pyarrow",
        batch_size=2048,
        fn_kwargs={"drop_self_loops": drop_self_loops},
    )
    edges = links.groupby("bucket").map_groups(_merge_bucket, batch_format="pandas")
    return ensure_schema(
        edges,
        {"src": pa.string(), "dst": pa.string(), "weight": pa.float64()},
    )
