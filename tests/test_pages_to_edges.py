"""Pages -> edges pipeline determinism + vertex dictionary tests."""

import numpy as np
import pandas as pd

from mercury_graph_ray.pipelines.pages_to_edges import pages_to_edges
from mercury_graph_ray.sources.pages import synth_pages
from mercury_graph_ray.stages.ids import VertexDict


def _edge_df(n=64, seed=42):
    return (
        pages_to_edges(synth_pages(n, seed=seed))
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )


def test_edges_deterministic_across_runs(ray_session):
    a = _edge_df()
    b = _edge_df()
    pd.testing.assert_frame_equal(a, b)
    assert (a.weight >= 1).all()
    assert a.duplicated(["src", "dst"]).sum() == 0


def test_edges_oracle_python(ray_session):
    """Independent driver-side oracle: extract links with the frozen
    extractor directly and compare the (src,dst,weight) multiset."""
    from collections import Counter

    from mercury_graph_ray.functions.extract import extract_links, normalize_url

    rows = synth_pages(64, seed=42).take_all()
    c = Counter()
    for r in rows:
        src = normalize_url(r["url"])
        for dst in extract_links(r["html"], r["url"]):
            c[(src, dst)] += 1
    got = _edge_df()
    want = pd.DataFrame(
        [(s, d, float(w)) for (s, d), w in sorted(c.items())],
        columns=["src", "dst", "weight"],
    )
    pd.testing.assert_frame_equal(got, want)


def test_vertex_dict_roundtrip(ray_session):
    edges = pages_to_edges(synth_pages(64, seed=42))
    vd = VertexDict.from_edges(edges)
    enc = vd.encode_edges(edges).to_pandas()
    assert enc.src.dtype == np.uint64 and enc.dst.dtype == np.uint64
    assert enc.src.max() < vd.n and enc.dst.max() < vd.n
    # content-ordered: vid order == lexicographic order of keys
    mp = vd.mapping.to_pandas().sort_values("vid")
    assert list(mp.id) == sorted(mp.id)
    assert list(mp.vid) == list(range(vd.n))
    # round-trip decode
    import ray.data as rd

    back = vd.decode(rd.from_pandas(mp[["vid"]].rename(columns={"vid": "id"}))).to_pandas()
    assert list(back.id) == list(mp.id)


def test_vertex_dict_stable_under_parallelism(ray_session):
    edges = pages_to_edges(synth_pages(64, seed=42))
    m1 = VertexDict.from_edges(edges).mapping.to_pandas().sort_values("id").reset_index(drop=True)
    m2 = (
        VertexDict.from_edges(edges.repartition(7))
        .mapping.to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(m1, m2)


def test_write_parquet_resumable(ray_session, tmp_path):
    """A rerun deletes unfinished partition dirs, skips finished ones, and
    the final table equals a clean one-shot write."""
    import os
    import shutil

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from mercury_graph_ray.sources.io import write_parquet_resumable

    df = pd.DataFrame({"k": [0, 0, 1, 1, 2, 2], "v": list("abcdef")})
    out = str(tmp_path / "resume")
    first = write_parquet_resumable(rd.from_pandas(df), out, "k")
    assert first == ["0", "1", "2"]

    # simulate a failed run: one partition finished-but-remarked-undone
    # (partial) and one fully intact
    shutil.rmtree(os.path.join(out, "k=1"))          # lost entirely
    os.remove(os.path.join(out, "k=2", "_DONE"))     # partial (no marker)

    second = write_parquet_resumable(rd.from_pandas(df), out, "k")
    assert second == ["1", "2"]                      # k=0 skipped

    got = pq.read_table(out).to_pandas()
    got["k"] = got["k"].astype(int)
    got = got.sort_values(["k", "v"]).reset_index(drop=True)[["k", "v"]]
    assert got.values.tolist() == df.values.tolist()


def test_vertex_dict_distributed_path_matches_broadcast(ray_session, monkeypatch):
    """Force the beyond-broadcast dictionary build (int-bucket distinct +
    sorted zip-with-index) and check it assigns the exact same (id, vid)
    mapping as the broadcast fast path."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    import mercury_graph_ray.stages.ids as ids_mod
    from mercury_graph_ray.stages.ids import VertexDict

    rng = np.random.default_rng(5)
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 300, 2000),
            "dst": rng.integers(0, 300, 2000),
        }
    )
    ds = rd.from_pandas(edges).repartition(5)

    fast = VertexDict.from_edges(ds).mapping.to_pandas()
    monkeypatch.setattr(ids_mod, "BROADCAST_MAX_BYTES", 7)
    slow = VertexDict.from_edges(ds).mapping.to_pandas()

    f = fast.sort_values("id").reset_index(drop=True)
    s = slow.sort_values("id").reset_index(drop=True)
    assert f["id"].tolist() == s["id"].tolist()
    assert f["vid"].tolist() == s["vid"].tolist()


def test_vertex_dict_byte_cap_forces_distributed_for_wide_keys(ray_session, monkeypatch):
    """The broadcast gate is in BYTES: few rows of very wide string keys
    must route through the distributed dictionary (VERDICT r2 #6), and the
    mapping must be identical to the broadcast path's."""
    import pandas as pd
    import ray.data as rd

    import mercury_graph_ray.stages.ids as ids_mod
    from mercury_graph_ray.stages.ids import VertexDict

    wide = [f"https://example.com/{'p' * 2000}/{i}" for i in range(40)]
    edges = pd.DataFrame({"src": wide, "dst": wide[1:] + wide[:1]})
    ds = rd.from_pandas(edges).repartition(3)

    fast = VertexDict.from_edges(ds)
    assert fast._broadcast_ref is not None
    # 40 keys x ~2 KB ≈ 80 KB of key bytes: a 64 KB byte cap must refuse
    # the broadcast even though the ROW count is tiny
    monkeypatch.setattr(ids_mod, "BROADCAST_MAX_BYTES", 64 << 10)
    slow = VertexDict.from_edges(ds)
    assert slow._broadcast_ref is None

    f = fast.mapping.to_pandas().sort_values("id").reset_index(drop=True)
    s = slow.mapping.to_pandas().sort_values("id").reset_index(drop=True)
    assert f["id"].tolist() == s["id"].tolist()
    assert f["vid"].tolist() == s["vid"].tolist()


def test_write_parquet_resumable_encoded_partition_values(ray_session, tmp_path):
    """Partition values pyarrow hive-encodes (spaces, '=') must still be
    skipped on resume — the round-2 skip compared raw directory names to
    the string cast and silently re-wrote such partitions (ADVICE r2)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from mercury_graph_ray.sources.io import write_parquet_resumable

    out = str(tmp_path / "enc")
    df = pd.DataFrame({"k": ["a b", "a b", "x=y", "plain"], "v": [1, 2, 3, 4]})
    first = write_parquet_resumable(rd.from_pandas(df), out, "k")
    assert sorted(first) == ["a b", "plain", "x=y"]
    # full rerun: every partition is already done -> nothing written, and
    # crucially no duplicate rows land in the encoded partitions
    second = write_parquet_resumable(rd.from_pandas(df), out, "k")
    assert second == []
    got = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*/*.parquet')"
    ).fetchone()[0]
    assert got == 4


def test_write_parquet_resumable_rejects_float_partition(ray_session, tmp_path):
    import pandas as pd
    import pytest
    import ray.data as rd

    from mercury_graph_ray.sources.io import write_parquet_resumable

    df = pd.DataFrame({"k": [1.0, 2.0], "v": [1, 2]})
    with pytest.raises(ValueError, match="integer- or string-typed"):
        write_parquet_resumable(rd.from_pandas(df), str(tmp_path / "f"), "k")
