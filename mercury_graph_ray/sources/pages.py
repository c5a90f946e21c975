"""Deterministic synthetic Common-Crawl-style pages source.

Generates the graft input table (BASELINE.json -> input_hint):
``url: string, warc_ts: timestamp[us, UTC], html: binary, text: string,
lang: string`` — rendered from a seeded power-law link graph so the
downstream pages->edges pipeline sees realistic hub skew. Everything is a
pure function of (row index, seed): generation is reproducible across
runs, batch sizes and parallelism levels (per-page RNG seeded with
``[seed, page_index]``).

The ``text`` column is filled by the frozen in-repo extractor
(functions/extract.py), which *defines* the byte-identical-text invariant
(FIXTURES.md §1).

Sizes used by tests/bench (FIXTURES.md): pages_tiny=64, pages_small≈5k,
pages_bench≈200k.
"""

from __future__ import annotations

import datetime
import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa

from mercury_graph_ray.functions.extract import extract_text

# Fixed vocabulary for deterministic lorem text.
_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu amber basalt cedar dune ember fjord glacier "
    "harbor isle juniper karst lagoon mesa nadir oasis prairie quartz reef "
    "summit tundra umbra vale wharf xenon yonder zephyr"
).split()

_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def page_url(i: int, n_sites: int) -> str:
    return f"https://site{i % n_sites}.example/p/{i}"


def _page_html(i: int, n_pages: int, n_sites: int, seed: int, body_scale: int = 1) -> bytes:
    """``body_scale`` multiplies the paragraph count — bench-sized pages
    (real Common-Crawl pages are tens of KB; the default tiny pages keep
    the frozen unit-test goldens byte-stable)."""
    rng = np.random.default_rng([seed, i])
    site = i % n_sites
    title = f"Page {i} {' '.join(_WORDS[j % len(_WORDS)] for j in range(i, i + 3))}"
    parts = [
        "<!DOCTYPE html><html><head>",
        f"<title>{title}</title>",
        '<meta charset="utf-8"><style>body { color: #111; }</style>',
        "</head><body>",
        f"<h1>{title}</h1>",
    ]
    # paragraphs of seeded lorem text (with an HTML entity to pin decoding)
    for _ in range(int(rng.integers(1, 4)) * body_scale):
        words = rng.integers(0, len(_WORDS), size=int(rng.integers(8, 25)))
        parts.append("<p>" + " ".join(_WORDS[w] for w in words) + " &amp; more</p>")
    # script noise that must NOT appear in extracted text
    if i % 5 == 0:
        parts.append(f"<script>var q = {i}; track(q);</script>")
    # outgoing links: power-law target skew (low page indices are hubs)
    n_links = min(1 + int(rng.pareto(1.3)), 40)
    for k in range(n_links):
        tgt = int(n_pages * rng.random() ** 3.0)
        tgt = min(tgt, n_pages - 1)
        tgt_site = tgt % n_sites
        anchor = f"link {tgt}"
        style = int(rng.integers(0, 4))
        if style == 0 or tgt_site != site:
            href = f"https://site{tgt_site}.example/p/{tgt}"
        elif style == 1:
            href = f"/p/{tgt}"  # site-relative
        elif style == 2:
            href = f"/p/{tgt}#section-{k}"  # fragment (dropped by extractor)
        else:
            href = f"HTTPS://Site{tgt_site}.EXAMPLE:443/p/{tgt}"  # needs normalization
        parts.append(f'<a href="{href}">{anchor}</a>')
        if style == 2:  # duplicate link -> exercises weight counting
            parts.append(f'<a href="{href}">{anchor} again</a>')
    if i % 7 == 0:
        parts.append('<a href="mailto:x@example.com">mail</a>')
        parts.append('<a href="javascript:void(0)">js</a>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def _gen_batch(batch: dict, *, n_pages: int, n_sites: int, seed: int,
               body_scale: int = 1) -> pa.Table:
    ids = batch["id"]
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in map(int, ids):
        url = page_url(i, n_sites)
        html = _page_html(i, n_pages, n_sites, seed, body_scale)
        urls.append(url)
        tss.append(_EPOCH + datetime.timedelta(seconds=i))
        htmls.append(html)
        texts.append(extract_text(html, url))
        langs.append("es" if i % 37 == 0 else "en")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def synth_pages(n_pages: int, *, n_sites: int | None = None, seed: int = 42,
                body_scale: int = 1):
    """Return a ``ray.data.Dataset`` of n_pages synthetic web pages."""
    import ray.data as rd

    if n_sites is None:
        n_sites = max(1, n_pages // 16)
    ds = rd.range(n_pages)
    return ds.map_batches(
        _gen_batch,
        batch_format="numpy",
        fn_kwargs={"n_pages": n_pages, "n_sites": n_sites, "seed": seed,
                   "body_scale": body_scale},
        batch_size=2048,
    )


def pages_parquet(
    n_pages: int,
    *,
    n_sites: int | None = None,
    seed: int = 42,
    body_scale: int = 1,
    root: str = "/tmp/mgr_pages",
) -> str:
    """Materialize the synthetic pages table to parquet once; cached by key.

    Layout: ``{root}/n{n_pages}_s{seed}/`` with a ``_MANIFEST.json`` written
    last (atomicity marker — a dir without a manifest is re-generated).
    """
    if n_sites is None:
        n_sites = max(1, n_pages // 16)
    suffix = f"_b{body_scale}" if body_scale != 1 else ""
    out = Path(root) / f"n{n_pages}_s{seed}{suffix}"
    manifest = out / "_MANIFEST.json"
    if manifest.exists():
        return str(out)
    tmp = Path(str(out) + ".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    synth_pages(n_pages, n_sites=n_sites, seed=seed, body_scale=body_scale).write_parquet(str(tmp))
    os.replace(tmp, out)
    manifest.write_text(
        json.dumps({"n_pages": n_pages, "n_sites": n_sites, "seed": seed,
                    "body_scale": body_scale})
    )
    return str(out)
