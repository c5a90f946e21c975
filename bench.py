"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N}

Headline = the north-rule pipeline: synthetic Common-Crawl-style pages ->
frozen extractor -> weighted edge table -> converged PageRank (nx
semantics), plus a slice of the relational/dedup operator surface over
the TPC-H-ish tables. ``queries`` also reports PageRank
edges/sec/superstep and iterations-to-convergence (BASELINE.json metric).

``--scaling``: runs the same bench twice in FRESH processes at
RAY_GRAFT_CPUS=8 and =32 on the same (pre-warmed) input — this sandbox
has 32 real cores, so the two levels are genuine parallelism levels —
and reports both times + scaling efficiency per stage (the N -> 4N
cluster-size evidence; BASELINE.json criterion ≥ 0.8).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# pages count for the link-graph bench, scaled off the sf dir name
PAGES_BY_SF = {"sf0.001": 2_000, "sf0.01": 8_000, "sf0.1": 30_000}
# "N_PAGESxBODY_SCALE" override — the --scaling runs use heavier realistic
# pages so the measurement is compute-bound, not scheduler-bound
PAGES_OVERRIDE = os.environ.get("GRAFT_BENCH_PAGES", "")
# partition count for the GAS supersteps: fixed (not CPU-derived) so the
# two scaling levels run the identical plan; 8 is the measured sweet spot
# for the test-scale graphs (see BASELINE.md)
N_PARTS = int(os.environ.get("GRAFT_N_PARTS", "8"))


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data as rd

    from mercury_graph_ray.algos.pagerank import PageRank
    from mercury_graph_ray.graph import Graph
    from mercury_graph_ray.pipelines import tpch
    from mercury_graph_ray.pipelines.pages_to_edges import pages_to_edges
    from mercury_graph_ray.sources.pages import pages_parquet

    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    if PAGES_OVERRIDE:
        n_pages, body_scale = (int(x) for x in PAGES_OVERRIDE.split("x"))
    else:
        n_pages, body_scale = PAGES_BY_SF.get(sf_name, 8_000), 1
    queries: dict[str, float] = {}
    t_all = time.time()

    # -- pages -> edges (extractor + the (src,dst) weight shuffle)
    pdir = pages_parquet(n_pages, seed=42, body_scale=body_scale)  # cached (warmed input)
    t0 = time.time()
    edges_path = f"/tmp/mgr_bench_edges_{sf_name}_{NUM_CPUS}"
    pages_to_edges(pdir).write_parquet(edges_path, mode="overwrite")
    queries["pages_to_edges"] = round(time.time() - t0, 3)

    # -- PageRank on the link graph (the north-rule metric)
    t0 = time.time()
    edges = rd.read_parquet(edges_path)
    n_edges = edges.count()
    g = Graph(edges)
    pr = PageRank(n_parts=N_PARTS).fit(g)
    pr_sec = time.time() - t0
    queries["pagerank_pages"] = round(pr_sec, 3)
    queries["pagerank_n_iter"] = pr.n_iter_
    queries["pagerank_edges_per_sec_per_superstep"] = round(
        n_edges * pr.n_iter_ / pr_sec, 1
    )

    # -- relational + dedup slice over the sf tables
    for name, fn in [
        ("q1_pricing_summary", tpch.q1_pricing_summary),
        ("supplier_customer_edges", lambda sf: tpch.supplier_customer_edges(sf).count()),
        ("graph_degrees", tpch.graph_degrees),
        ("docs_exact_dedup", tpch.docs_exact_dedup),
    ]:
        t0 = time.time()
        fn(SF_DIR)
        queries[name] = round(time.time() - t0, 3)

    total = round(time.time() - t_all, 3)
    ray.shutdown()
    return {
        "metric": "headline: pages->edges->pagerank + operator slice (sec)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_name,
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    import subprocess

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_PAGES=os.environ.get("GRAFT_BENCH_PAGES", "60000x24"))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 8, 32
    hi = run(hi_cpus)  # warm the page cache at high parallelism first
    lo = run(lo_cpus)
    ratio = hi_cpus / lo_cpus

    def eff(key):
        return round((lo["queries"][key] / hi["queries"][key]) / ratio, 3)

    return {
        "metric": "scaling: same job, same input, num_cpus=8 vs 32 (fresh processes)",
        "pages_to_edges_sec_8": lo["queries"]["pages_to_edges"],
        "pages_to_edges_sec_32": hi["queries"]["pages_to_edges"],
        "pages_to_edges_efficiency": eff("pages_to_edges"),
        "pagerank_sec_8": lo["queries"]["pagerank_pages"],
        "pagerank_sec_32": hi["queries"]["pagerank_pages"],
        "pagerank_efficiency": eff("pagerank_pages"),
        "pagerank_edges_per_sec_per_superstep_32": hi["queries"][
            "pagerank_edges_per_sec_per_superstep"
        ],
        "total_sec_8": lo["value"],
        "total_sec_32": hi["value"],
        "total_efficiency": round((lo["value"] / hi["value"]) / ratio, 3),
        "note": "pages->edges is the compute-bound stage (extraction); at "
        "this data scale the pagerank supersteps are scheduler-latency-"
        "bound, so their wall time is flat across levels by design "
        "(per-superstep work is partition-parallel; see BASELINE.md)",
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
