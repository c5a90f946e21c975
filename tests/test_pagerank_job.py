"""The north-rule resume criterion, tested literally: the submittable
PageRank job (tools/pagerank_job.py) is SIGKILLed mid-algorithm and
restarted with the same checkpoint dir; the resumed run must finish from
the latest complete per-superstep checkpoint and produce the same
per-vertex ranks as an uninterrupted run."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "tools", "pagerank_job.py")


def _edges_dir(tmp_path) -> str:
    rng = np.random.default_rng(11)
    n, m = 2000, 20000
    df = pd.DataFrame(
        {
            "src": [f"u{i}" for i in rng.integers(0, n, m)],
            "dst": [f"u{i}" for i in rng.integers(0, n, m)],
            "weight": rng.uniform(0.5, 2.0, m),
        }
    )
    d = str(tmp_path / "edges")
    os.makedirs(d, exist_ok=True)
    df.to_parquet(os.path.join(d, "part0.parquet"))
    return d


def _run_job(edges, ck, out, extra=()):
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)  # fresh local instance per job process
    return subprocess.run(
        [sys.executable, JOB, "--edges", edges, "--checkpoint-dir", ck,
         "--output", out, "--num-cpus", "4", "--n-parts", "4",
         "--tol", "0", "--max-iter", "40", "--checkpoint-every", "1",
         *extra],
        env=env, capture_output=True, text=True, timeout=420,
    )


def test_job_kill_resume_exact(tmp_path):
    edges = _edges_dir(tmp_path)

    # uninterrupted baseline
    outA = str(tmp_path / "outA")
    r = _run_job(edges, str(tmp_path / "ckA"), outA)
    assert r.returncode == 0, r.stderr[-2000:]
    summary_a = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary_a["n_iter"] == 40

    # killed run: SIGKILL once the first per-superstep manifest lands
    ckB = str(tmp_path / "ckB")
    outB = str(tmp_path / "outB")
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [sys.executable, JOB, "--edges", edges, "--checkpoint-dir", ckB,
         "--output", outB, "--num-cpus", "4", "--n-parts", "4",
         "--tol", "0", "--max-iter", "40", "--checkpoint-every", "1"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    algo_dir = os.path.join(ckB, "pagerank")
    killed_mid_run = False
    deadline = time.time() + 300
    while time.time() < deadline and proc.poll() is None:
        manifests = []
        if os.path.isdir(algo_dir):
            manifests = [
                d for d in os.listdir(algo_dir)
                if os.path.exists(os.path.join(algo_dir, d, "MANIFEST.json"))
            ]
        if len(manifests) >= 2:  # at least one complete mid-run checkpoint
            proc.send_signal(signal.SIGKILL)
            killed_mid_run = True
            break
        time.sleep(0.05)
    proc.wait(timeout=60)
    assert killed_mid_run, "job finished before any mid-run checkpoint landed"

    # resume with the same checkpoint dir
    r2 = _run_job(edges, ckB, outB)
    assert r2.returncode == 0, r2.stderr[-2000:]
    summary_b = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary_b["n_iter"] == 40

    a = pd.read_parquet(outA).sort_values("id").reset_index(drop=True)
    b = pd.read_parquet(outB).sort_values("id").reset_index(drop=True)
    assert (a["id"] == b["id"]).all()
    np.testing.assert_allclose(
        a["rank"].to_numpy(), b["rank"].to_numpy(), rtol=0, atol=1e-12
    )
