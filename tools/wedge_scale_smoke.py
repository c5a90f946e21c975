"""4M-edge scale smoke for the wedge-kernel family (VERDICT r3 #9).

Runs BetweennessLandmarks (4 landmarks), KTruss(4) and LinkPrediction
(hub-capped) on the same deterministic 4M-edge / 500k-vertex power-law
graph the SCC/KCore/CoreNumbers smokes used (BASELINE.md), printing one
JSON line per algorithm plus a summary. Numbers + any discovered cliffs
go to BASELINE.md.

Usage: python tools/wedge_scale_smoke.py [betweenness|ktruss|linkpred ...]
Env:   GRAFT_SMOKE_EDGES / GRAFT_SMOKE_VERTICES / GRAFT_SMOKE_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

E = int(os.environ.get("GRAFT_SMOKE_EDGES", "4000000"))
V = int(os.environ.get("GRAFT_SMOKE_VERTICES", "500000"))
CPUS = int(os.environ.get("GRAFT_SMOKE_CPUS", "32"))
P = 8


def main():
    which = set(sys.argv[1:]) or {"betweenness", "ktruss", "linkpred"}

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from mercury_graph_ray.graph import Graph
    from mercury_graph_ray.sources.synth_graph import powerlaw_edges_parquet

    path = powerlaw_edges_parquet(E, V, seed=7)
    results = {}

    if "betweenness" in which:
        from mercury_graph_ray.algos.betweenness import BetweennessLandmarks

        g = Graph(rd.read_parquet(path))
        t0 = time.time()
        b = BetweennessLandmarks(sources=[0, 1, 2, 3], n_parts=P).fit(g)
        n = b.betweenness_.count()
        results["betweenness_4lm"] = {
            "sec": round(time.time() - t0, 1), "rows": n,
            "depth": b.depth_, "supersteps": b.n_iter_,
        }
        print(json.dumps({"betweenness_4lm": results["betweenness_4lm"]}),
              flush=True)

    if "ktruss" in which:
        from mercury_graph_ray.algos.ktruss import KTruss

        g = Graph(rd.read_parquet(path))
        t0 = time.time()
        kt = KTruss(4, n_parts=P).fit(g)
        n = kt.edges_.count()
        results["ktruss4"] = {
            "sec": round(time.time() - t0, 1), "truss_edges": n,
            "sweeps": kt.n_iter_, "modes": kt.sweep_modes_,
        }
        print(json.dumps({"ktruss4": results["ktruss4"]}), flush=True)

    if "triangles" in which:
        from mercury_graph_ray.algos.triangles import TriangleCount

        g = Graph(rd.read_parquet(path))
        t0 = time.time()
        tc = TriangleCount(n_parts=P).fit(g)
        results["triangles"] = {
            "sec": round(time.time() - t0, 1), "total": int(tc.total_),
        }
        print(json.dumps({"triangles": results["triangles"]}), flush=True)

    if "linkpred" in which:
        from mercury_graph_ray.algos.linkpred import LinkPrediction

        g = Graph(rd.read_parquet(path))
        t0 = time.time()
        lp = LinkPrediction(n_parts=P, max_degree=64).fit(g)
        n = lp.scores_.count()
        results["linkpred_cap64"] = {
            "sec": round(time.time() - t0, 1), "candidate_pairs": n,
        }
        print(json.dumps({"linkpred_cap64": results["linkpred_cap64"]}),
              flush=True)

    print(json.dumps({"smoke": results, "n_edges": E, "n_vertices": V,
                      "num_cpus": CPUS, "n_parts": P}))
    ray.shutdown()


if __name__ == "__main__":
    main()
