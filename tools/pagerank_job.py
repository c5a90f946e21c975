"""PageRank as a submittable Ray job — the north-rule `ray job submit`
entry point, resumable mid-algorithm from per-superstep checkpoints.

Run locally:
    python tools/pagerank_job.py --edges /path/to/edges_parquet \
        --checkpoint-dir /tmp/ck --output /tmp/ranks --checkpoint-every 2

Or against a cluster (the job driver inherits RAY_ADDRESS from the
submission environment, so ray.init() below connects to it):
    ray job submit --working-dir . -- python tools/pagerank_job.py \
        --pages /data/pages --checkpoint-dir /ckpt/pr --output /out/ranks

A killed run restarted with the SAME --checkpoint-dir resumes from the
latest complete per-superstep checkpoint (`--resume auto`, the default:
resume iff a manifest exists; `never` forces a cold start). The rank
trajectory continues deterministically — a resumed run converges to the
same per-vertex scores as an uninterrupted one (tested by SIGKILLing
this script mid-run in tests/test_pagerank_job.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--edges", help="parquet dir of (src, dst, weight) edges")
    src.add_argument("--pages", help="parquet dir of CC-style pages (url, html, ...)")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--output", required=True, help="output parquet dir (id, rank)")
    ap.add_argument("--resume", choices=["auto", "never"], default="auto")
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--n-parts", type=int, default=8)
    ap.add_argument("--checkpoint-every", type=int, default=5)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU cap (ignored under a real cluster)")
    args = ap.parse_args(argv)

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; the
        # standalone path starts a local instance
        address = os.environ.get("RAY_ADDRESS", "local")
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus and address == "local":
            # num_cpus is only legal when STARTING an instance —
            # ray.init(address=<cluster>, num_cpus=...) raises; under a
            # real cluster the flag is ignored as documented
            kw["num_cpus"] = args.num_cpus
        ray.init(address=address, **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from mercury_graph_ray.algos.pagerank import PageRank
    from mercury_graph_ray.graph import Graph

    if args.edges:
        edges = rd.read_parquet(args.edges)
    else:
        from mercury_graph_ray.pipelines.pages_to_edges import pages_to_edges

        edges = pages_to_edges(args.pages).materialize()

    # CSR workdir keyed under the checkpoint dir: a resumed run rebuilds
    # the same partition layout (the checkpoint holds only rank state)
    workdir = os.path.join(args.checkpoint_dir, "csr")
    pr = PageRank(
        alpha=args.alpha,
        tol=args.tol,
        max_iter=args.max_iter,
        n_parts=args.n_parts,
        workdir=workdir,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        resume=(args.resume == "auto"),
        strict=False,  # report converged_ instead of raising at max_iter
    ).fit(Graph(edges))

    pr.pagerank_.write_parquet(args.output, mode="overwrite")
    summary = {
        "n_iter": int(pr.n_iter_),
        "err": float(pr.err_),
        "converged": bool(pr.converged_),
        "output": args.output,
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
