"""stages/sketch: HyperLogLog + CountMin — accuracy vs exact, overcount
guarantee, and partitioning invariance (no-shuffle combine must be
order-free)."""
import numpy as np
import pandas as pd
import ray.data as rd

from mercury_graph_ray.stages.sketch import (
    CountMinSketch,
    cms_build,
    hll_count_distinct,
)


def test_hll_accuracy_and_partition_invariance(ray_session):
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"x": rng.integers(0, 50_000, 200_000)})
    exact = df["x"].nunique()
    est = hll_count_distinct(rd.from_pandas(df), "x")
    assert abs(est - exact) / exact < 0.03
    # register max is associative/commutative/idempotent -> exact
    # invariance under any block layout
    est7 = hll_count_distinct(rd.from_pandas(df).repartition(7), "x")
    assert est == est7


def test_hll_small_range_linear_counting(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"x": rng.integers(0, 120, 5_000)})
    exact = df["x"].nunique()
    est = hll_count_distinct(rd.from_pandas(df), "x")
    assert abs(est - exact) / exact < 0.03


def test_hll_string_column(ray_session):
    df = pd.DataFrame({"s": [f"user-{i % 777}" for i in range(30_000)]})
    est = hll_count_distinct(rd.from_pandas(df), "s")
    assert abs(est - 777) / 777 < 0.03


def test_cms_never_undercounts_and_heavy_hitters_exactish(ray_session):
    rng = np.random.default_rng(3)
    vals = pd.Series(np.minimum(rng.zipf(1.5, 100_000), 10_000).astype(str))
    sk = cms_build(rd.from_pandas(vals.to_frame("t")), "t", w=1 << 12)
    true = vals.value_counts()
    q = sk.query(pd.Series(true.index))
    assert (q >= true.values).all()  # CMS overestimates only
    top = true.head(10)
    qt = sk.query(pd.Series(top.index))
    assert (np.abs(qt - top.values) / top.values < 0.02).all()


def test_cms_merge_equals_single_build(ray_session):
    rng = np.random.default_rng(4)
    a = pd.Series(rng.integers(0, 100, 5_000).astype(str))
    b = pd.Series(rng.integers(50, 150, 5_000).astype(str))
    s1 = CountMinSketch(w=1 << 10)
    s1.add_batch(a)
    s1.add_batch(b)
    s2 = CountMinSketch(w=1 << 10)
    s2.add_batch(a)
    s3 = CountMinSketch(w=1 << 10)
    s3.add_batch(b)
    s2.merge(s3)
    assert (s1.table == s2.table).all()
