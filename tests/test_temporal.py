"""stages/temporal: as-of join, range join, hopping windows — each checked
against a driver-side pandas oracle on randomized inputs, plus
block-layout invariance (repartition must not change results)."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mercury_graph_ray.stages.temporal import asof_join, range_join, sliding_window


def _events(n, n_users, seed, t0="2024-01-01"):
    rng = np.random.default_rng(seed)
    ts = np.datetime64(t0, "us") + rng.integers(0, 30 * 86400 * 10**6, n).astype(
        "timedelta64[us]"
    )
    return pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "uid": rng.integers(0, n_users, n).astype(np.int64),
            "ts": ts,
            "val": np.round(rng.random(n), 4),
        }
    )


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("n_parts", [1, 7])
def test_asof_join_matches_pandas(ray_session, n_parts):
    left = _events(400, 12, seed=1)
    right = _events(150, 12, seed=2).rename(
        columns={"ts": "rts", "eid": "rid", "val": "rval"}
    )
    got = asof_join(
        rd.from_pandas(left).repartition(n_parts),
        rd.from_pandas(right).repartition(n_parts),
        by=["uid"], left_on="ts", right_on="rts",
    ).to_pandas()

    want = pd.merge_asof(
        left.sort_values(["ts", "uid"], kind="mergesort"),
        right.sort_values(["rts", "uid"], kind="mergesort"),
        left_on="ts", right_on="rts", by="uid", direction="backward",
    )
    g, w = _sorted(got, ["eid"]), _sorted(want, ["eid"])
    assert list(g["eid"]) == list(w["eid"])
    # matched right ids identical (NaN-safe compare)
    assert g["rid"].fillna(-1).astype(np.int64).tolist() == w["rid"].fillna(
        -1
    ).astype(np.int64).tolist()
    assert np.allclose(g["rval"].fillna(-1), w["rval"].fillna(-1))


def test_asof_join_name_collision_suffix(ray_session):
    left = _events(50, 5, seed=3)
    right = _events(20, 5, seed=4)  # same column names
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by=["uid"], left_on="ts", right_on="ts",
    )
    names = set(out.schema().names)
    assert {"eid", "uid", "ts", "val", "eid_r", "ts_r", "val_r"} == names


@pytest.mark.parametrize("n_parts", [1, 5])
def test_range_join_matches_bruteforce(ray_session, n_parts):
    left = _events(200, 8, seed=5)
    right = _events(300, 8, seed=6).rename(
        columns={"ts": "rts", "eid": "rid", "val": "rval"}
    )
    lo, up = pd.Timedelta("-2d"), pd.Timedelta("12h")
    got = range_join(
        rd.from_pandas(left).repartition(n_parts),
        rd.from_pandas(right).repartition(n_parts),
        by=["uid"], left_on="ts", right_on="rts", lower=lo, upper=up,
    ).to_pandas()

    m = left.merge(right, on="uid")
    dt = m["rts"] - m["ts"]
    want = m.loc[(dt >= lo) & (dt <= up)]
    key = ["eid", "rid"]
    assert _sorted(got[key], key).values.tolist() == _sorted(want[key], key).values.tolist()
    assert len(got) == len(want)


def test_range_join_empty_side(ray_session):
    left = _events(30, 4, seed=7)
    right = _events(30, 4, seed=8).rename(columns={"ts": "rts"})
    out = range_join(
        rd.from_pandas(left),
        rd.from_pandas(right.iloc[:0]),
        by=["uid"], left_on="ts", right_on="rts",
        lower="-1h", upper="1h",
    )
    assert out.count() == 0
    assert out.schema() is not None  # typed empty, not schema-less


@pytest.mark.parametrize("window,hop", [("2h", "1h"), ("3h", "1h"), ("1h", "1h")])
def test_sliding_window_matches_manual(ray_session, window, hop):
    df = _events(500, 6, seed=9)
    df["kind"] = np.where(df["eid"] % 3 == 0, "a", "b")
    got = (
        sliding_window(
            rd.from_pandas(df), "ts", window=window, hop=hop,
            keys=["kind"], value_col="val",
        )
        .to_pandas()
        .pipe(_sorted, ["window_start", "kind"])
    )

    w, h = pd.Timedelta(window), pd.Timedelta(hop)
    copies = int(-(-w // h))
    rows = []
    for i in range(copies):
        d = df.copy()
        d["window_start"] = df["ts"].dt.floor(h) - i * h
        d = d[(d["ts"] - d["window_start"]) < w]
        rows.append(d)
    exp = (
        pd.concat(rows)
        .groupby(["window_start", "kind"], as_index=False)
        .agg(n=("val", "size"), sum_value=("val", "sum"))
        .pipe(_sorted, ["window_start", "kind"])
    )
    assert got["window_start"].tolist() == exp["window_start"].tolist()
    assert got["n"].astype(int).tolist() == exp["n"].tolist()
    assert np.allclose(got["sum_value"], exp["sum_value"])
