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

import pyarrow as pa

from mercury_graph_ray.functions.extract import extract_links, normalize_url


def _explode_links(batch: pa.Table) -> pa.Table:
    srcs: list[str] = []
    dsts: list[str] = []
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    for url, html in zip(urls, htmls):
        src = normalize_url(url)
        if src is None:
            continue
        for dst in extract_links(html, url):
            srcs.append(src)
            dsts.append(dst)
    return pa.table({"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())})


def pages_to_edges(pages, *, drop_self_loops: bool = False):
    """pages Dataset/path -> edges Dataset (src, dst, weight: float64).

    ``pages`` is a ``ray.data.Dataset`` with at least (url, html) columns,
    or a parquet path readable by ``ray.data.read_parquet``.
    """
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count

    if isinstance(pages, str):
        pages = rd.read_parquet(pages, columns=["url", "html"])
    else:
        pages = pages.select_columns(["url", "html"])

    links = pages.map_batches(_explode_links, batch_format="pyarrow", batch_size=512)
    if drop_self_loops:
        links = links.map_batches(
            lambda t: t.filter(pc.invert(pc.equal(t["src"], t["dst"]))),
            batch_format="pyarrow",
        )
    edges = links.groupby(["src", "dst"]).aggregate(Count(alias_name="weight"))
    return edges.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("weight"),
            "weight",
            pc.cast(t["weight"], pa.float64()),
        ),
        batch_format="pyarrow",
    )
