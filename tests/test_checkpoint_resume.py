"""Kill-and-resume: an interrupted superstep loop restarted from the latest
complete checkpoint must produce the same converged output (north_rule
"resumable from checkpoint with per-partition lineage + metrics")."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from mercury_graph_ray.algos.connected_components import ConnectedComponents
from mercury_graph_ray.algos.pagerank import PageRank
from mercury_graph_ray.graph import Graph


@pytest.fixture()
def chain_edges():
    # long path graph -> CC needs many supersteps, so a 3-iter kill is mid-run
    n = 40
    return pd.DataFrame(
        {
            "src": [f"n{i:03d}" for i in range(n - 1)],
            "dst": [f"n{i + 1:03d}" for i in range(n - 1)],
            "weight": 1.0,
        }
    )


def test_pagerank_resume_identical(ray_session, tmp_path, chain_edges):
    ck = str(tmp_path / "ck")
    # uninterrupted run
    full = PageRank(n_parts=4, checkpoint_dir=str(tmp_path / "full"), checkpoint_every=3).fit(
        Graph(chain_edges)
    )
    want = full.pagerank_.to_pandas().set_index("id")["rank"]

    # interrupted run: cap at 4 supersteps (simulated kill after ckpt at t=3)
    try:
        PageRank(n_parts=4, max_iter=4, checkpoint_dir=ck, checkpoint_every=3).fit(
            Graph(chain_edges)
        )
    except Exception:
        pass
    iters = sorted(os.listdir(os.path.join(ck, "pagerank")))
    assert any("iter_000003" in i for i in iters)
    # a *later, incomplete* checkpoint (no manifest) must be ignored
    bogus = os.path.join(ck, "pagerank", "iter_000099", "state")
    os.makedirs(bogus)

    resumed = PageRank(
        n_parts=4, checkpoint_dir=ck, checkpoint_every=3, resume=True
    ).fit(Graph(chain_edges))
    got = resumed.pagerank_.to_pandas().set_index("id")["rank"]
    assert resumed.n_iter_ == full.n_iter_
    for k in want.index:
        assert abs(got[k] - want[k]) < 1e-12

    # manifest contract: lineage + metrics present
    with open(os.path.join(ck, "pagerank", f"iter_{resumed.n_iter_:06d}", "MANIFEST.json")) as f:
        mf = json.load(f)
    assert mf["metrics"]["converged"] is True
    assert len(mf["partitions"]) == 4
    assert mf["fingerprint"]["n"] == 40


def test_resume_converged_with_smaller_max_iter(ray_session, tmp_path, chain_edges):
    """ADVICE: resuming a CONVERGED run with start_iter >= max_iter must
    honor the manifest's converged flag instead of raising."""
    ck = str(tmp_path / "ck")
    full = PageRank(n_parts=4, checkpoint_dir=ck, checkpoint_every=3).fit(Graph(chain_edges))
    want = full.pagerank_.to_pandas().set_index("id")["rank"]
    assert full.n_iter_ > 2

    again = PageRank(n_parts=4, checkpoint_dir=ck, max_iter=2, resume=True).fit(
        Graph(chain_edges)
    )
    got = again.pagerank_.to_pandas().set_index("id")["rank"]
    assert again.n_iter_ == full.n_iter_
    for k in want.index:
        assert abs(got[k] - want[k]) < 1e-12


def test_cc_resume_exact(ray_session, tmp_path, chain_edges):
    # pointer_jumping=False: the n_iter_ equality below relies on the
    # monotone propagation loop replaying identically from a checkpoint;
    # the jump path's superstep count legitimately differs after resume
    # (same labels, different phase boundaries) — jump-path resume is
    # covered by test_algos.test_cc_pointer_jumping_resume.
    ck = str(tmp_path / "ck")
    full = ConnectedComponents(n_parts=4, pointer_jumping=False).fit(Graph(chain_edges))
    want = full.components_.to_pandas().sort_values("id").reset_index(drop=True)

    try:
        ConnectedComponents(
            n_parts=4, max_iter=5, checkpoint_dir=ck, checkpoint_every=2,
            pointer_jumping=False,
        ).fit(Graph(chain_edges))
    except RuntimeError:
        pass  # expected: did not converge in 5 iters (kill point)

    resumed = ConnectedComponents(
        n_parts=4, checkpoint_dir=ck, checkpoint_every=2, resume=True,
        pointer_jumping=False,
    ).fit(Graph(chain_edges))
    got = resumed.components_.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert resumed.n_iter_ == full.n_iter_
