"""Hypothesis property tests for the operators with the trickiest edge
cases: as-of join (vs pandas oracle on arbitrary keyed time series),
sliding windows (count conservation), and shingle hashing (set-semantics
parity with the blake2b reference under arbitrary unicode)."""
import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings, strategies as st

from mercury_graph_ray.stages.dedup import _shingle_hashes_blake2b, shingle_hashes
from mercury_graph_ray.stages.temporal import asof_join, sliding_window

_SETTINGS = dict(max_examples=12, deadline=None)


@st.composite
def keyed_events(draw, max_rows=40):
    n = draw(st.integers(1, max_rows))
    keys = draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
    # distinct timestamps (ties are pinned by sort order, tested separately)
    offs = draw(
        st.lists(st.integers(0, 10**7), min_size=n, max_size=n, unique=True)
    )
    ts = np.datetime64("2024-01-01", "us") + np.array(offs, "timedelta64[us]")
    return pd.DataFrame(
        {"eid": np.arange(n, dtype=np.int64), "uid": np.array(keys, np.int64), "ts": ts}
    )


@given(left=keyed_events(), right=keyed_events())
@settings(**_SETTINGS)
def test_asof_join_property(left, right):
    right = right.rename(columns={"ts": "rts", "eid": "rid"})
    got = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by=["uid"], left_on="ts", right_on="rts",
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values(["ts", "uid"], kind="mergesort"),
        right.sort_values(["rts", "uid"], kind="mergesort"),
        left_on="ts", right_on="rts", by="uid", direction="backward",
    ).sort_values("eid").reset_index(drop=True)
    assert got["rid"].fillna(-1).astype(np.int64).tolist() == want["rid"].fillna(
        -1
    ).astype(np.int64).tolist()


@given(df=keyed_events(), copies=st.integers(1, 4))
@settings(**_SETTINGS)
def test_sliding_window_conserves_counts(df, copies):
    """Every row lands in exactly ceil(window/hop) windows when
    window = copies x hop, so total n is conserved exactly."""
    out = sliding_window(
        rd.from_pandas(df.assign(v=1.0)), "ts",
        window=pd.Timedelta(hours=copies), hop="1h", value_col="v",
    ).to_pandas()
    assert int(out["n"].sum()) == copies * len(df)
    assert abs(float(out["sum_value"].sum()) - copies * len(df)) < 1e-9


@given(text=st.text(max_size=300), k=st.integers(2, 8))
@settings(max_examples=40, deadline=None)
def test_shingle_hash_set_parity(text, k):
    """The vectorized polynomial hash and the blake2b reference must agree
    on set SIZE for any unicode input (same unique-shingle semantics)."""
    a = shingle_hashes(text, k)
    b = _shingle_hashes_blake2b(text, k)
    assert len(a) == len(b)
    assert (np.sort(a) == a).all()  # sorted-unique contract


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=60,
    ),
    seed=st.integers(0, 3),
)
@settings(max_examples=6, deadline=None)
def test_cc_pointer_jumping_random_graphs(edges, seed):
    """Pointer-jumping CC == union-find oracle (exact min-id labels and
    sizes) on arbitrary small multigraphs, any partition count."""
    import pandas as pd

    from mercury_graph_ray.algos.connected_components import ConnectedComponents
    from mercury_graph_ray.graph import Graph

    df = pd.DataFrame(
        {
            "src": [f"v{a:02d}" for a, _ in edges],
            "dst": [f"v{b:02d}" for _, b in edges],
            "weight": 1.0,
        }
    )
    cc = ConnectedComponents(n_parts=2 + seed).fit(Graph(rd.from_pandas(df)))
    got = cc.components_.to_pandas()

    # union-find oracle
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(f"v{a:02d}"), find(f"v{b:02d}")
        if ra != rb:
            parent[ra] = rb
    roots = {v: find(v) for v in parent}
    comps: dict = {}
    for v, r in roots.items():
        comps.setdefault(r, set()).add(v)
    want = {}
    for members in comps.values():
        m = min(members)
        for v in members:
            want[v] = (m, len(members))
    assert len(got) == len(want)
    for r in got.itertuples():
        assert (r.component, r.component_size) == want[r.id], r.id
