"""Deterministic sampling (stages/sample) and exact quantiles
(stages/quantile): rate accuracy, layout independence, and the pinned
rank rule vs a driver-side numpy oracle.
"""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mercury_graph_ray.stages.quantile import exact_quantiles
from mercury_graph_ray.stages.sample import keep_mask, stratified_sample


def test_keep_mask_rate_and_determinism():
    ids = np.arange(200_000)
    for rate in (0.0, 0.1, 0.5, 0.9, 1.0):
        m = keep_mask(ids, np.full(len(ids), rate))
        assert abs(m.mean() - rate) < 0.01
    a = keep_mask(ids, np.full(len(ids), 0.3))
    b = keep_mask(ids[::-1], np.full(len(ids), 0.3))[::-1]
    assert np.array_equal(a, b)  # row order cannot matter


def test_stratified_sample_rates_and_layout(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "id": np.arange(20_000),
            "grp": rng.choice(["a", "b", "c"], 20_000),
        }
    )
    rates = {"a": 0.2, "b": 0.8}
    out = stratified_sample(
        rd.from_pandas(df), "id", "grp", rates, default_rate=1.0
    ).to_pandas()
    got = out.groupby("grp").size()
    n = df.groupby("grp").size()
    assert abs(got["a"] / n["a"] - 0.2) < 0.02
    assert abs(got["b"] / n["b"] - 0.8) < 0.02
    assert got["c"] == n["c"]
    # identical kept set under a different partitioning
    out2 = stratified_sample(
        rd.from_pandas(df.sample(frac=1, random_state=7)).repartition(9),
        "id", "grp", rates, default_rate=1.0,
    ).to_pandas()
    assert sorted(out2["id"]) == sorted(out["id"])


@pytest.mark.parametrize("seed", [1, 2])
def test_exact_quantiles_match_numpy_rank_rule(ray_session, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1000, 5000)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(6)
    qs = (0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    out = exact_quantiles(ds, "x", qs)
    s = np.sort(vals)
    for q, v in zip(out["q"], out["value"]):
        want = s[max(1, math.ceil(q * len(s))) - 1]
        assert v == want, (q, v, want)


def test_exact_quantiles_duplicate_heavy(ray_session):
    # ties across batch boundaries: every value identical except one
    vals = np.array([7] * 999 + [100])
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(5)
    out = exact_quantiles(ds, "x", (0.5, 0.999, 1.0))
    assert out.set_index("q")["value"].to_dict() == {0.5: 7, 0.999: 7, 1.0: 100}
