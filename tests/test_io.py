"""S1 reader surface: read_csv/parquet/json/text + the read(format)
dispatcher round-trip small files exactly (reference contract:
spark_interface.py:120-128)."""

import json
import os

import pandas as pd
import pytest

from mercury_graph_ray.sources import io as mio


@pytest.fixture()
def frame():
    return pd.DataFrame(
        {"id": [1, 2, 3], "name": ["ann", "bob", "cy"], "x": [0.5, -1.25, 3.0]}
    )


def test_read_csv_and_dispatch(ray_session, tmp_path, frame):
    p = str(tmp_path / "t.csv")
    frame.to_csv(p, index=False)
    got = mio.read_csv(p).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, frame)
    got2 = mio.read("csv", p).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, frame)


def test_read_parquet_column_pruning(ray_session, tmp_path, frame):
    p = str(tmp_path / "t.parquet")
    frame.to_parquet(p)
    got = mio.read_parquet(p, columns=["id", "x"]).to_pandas()
    assert list(got.columns) == ["id", "x"]
    pd.testing.assert_frame_equal(
        got.sort_values("id").reset_index(drop=True), frame[["id", "x"]]
    )


def test_read_json_lines(ray_session, tmp_path, frame):
    p = str(tmp_path / "t.json")
    with open(p, "w") as f:
        for rec in frame.to_dict("records"):
            f.write(json.dumps(rec) + "\n")
    got = (
        mio.read("json", p)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)[list(frame.columns)]
    )
    pd.testing.assert_frame_equal(got, frame)


def test_read_text(ray_session, tmp_path):
    p = str(tmp_path / "t.txt")
    lines = ["alpha", "beta gamma", "delta"]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    got = mio.read_text(p).to_pandas()
    assert sorted(got[got.columns[0]].tolist()) == sorted(lines)


def test_read_unknown_format(ray_session):
    with pytest.raises(ValueError, match="unsupported format"):
        mio.read("orc", "/nowhere")
