"""stages/tfidf vs a pure-Python recompute."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd

from mercury_graph_ray.stages.tfidf import tfidf_top_terms

DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "apple banana apple cherry",
            "banana banana cherry",
            "cherry cherry cherry date",
            "unique solo terms",
            "",
            "apple date date",
        ],
    }
)


def _py_tfidf(k):
    tf = {}
    for _, r in DOCS.iterrows():
        c = Counter(re.findall(r"[a-z]+", r.text.lower()))
        for t, n in c.items():
            tf[(r.doc_id, t)] = n
    df = Counter(t for _, t in tf)
    n = len(DOCS)
    rows = [
        (d, t, c, df[t], c * math.log(n / df[t])) for (d, t), c in tf.items()
    ]
    out = []
    for d in sorted({r[0] for r in rows}):
        mine = sorted((r for r in rows if r[0] == d),
                      key=lambda r: (-r[4], r[1]))[:k]
        out.extend(mine)
    f = pd.DataFrame(out, columns=["doc_id", "token", "tf", "df", "score"])
    f["score"] = np.floor(np.abs(f.score) * 1e6 + 0.5) / 1e6 * np.sign(f.score)
    return f.sort_values(["doc_id", "token"]).reset_index(drop=True)


def test_tfidf_top1_exact(ray_session):
    got = tfidf_top_terms(rd.from_pandas(DOCS), "doc_id", "text", k=1)
    want = _py_tfidf(1)
    pd.testing.assert_frame_equal(got.astype({"tf": np.int64, "df": np.int64}),
                                  want.astype({"tf": np.int64, "df": np.int64}))
    # doc 4 is empty -> absent; every other doc has exactly one row
    assert got.doc_id.tolist() == [0, 1, 2, 3, 5]


def test_tfidf_topk_and_partition_invariance(ray_session):
    a = tfidf_top_terms(rd.from_pandas(DOCS), "doc_id", "text", k=2)
    b = tfidf_top_terms(rd.from_pandas(DOCS).repartition(5), "doc_id", "text",
                        k=2, n_buckets=3)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(
        a.astype({"tf": np.int64, "df": np.int64}),
        _py_tfidf(2).astype({"tf": np.int64, "df": np.int64}))
