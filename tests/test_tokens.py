"""stages/tokens: exact heavy hitters + per-doc lexical stats."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd

from mercury_graph_ray.stages.tokens import lexical_stats, top_tokens

DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [
            "The cat sat on the mat. The CAT!",
            "dog dog dog dog",
            "",
            "1234 5678 --- !!!",
            "unique words only here friend",
            "aa bb aa bb cc",
            "The dog chased the cat over the mat",
            "zz",
        ],
    }
)


def _pytoks(t):
    return re.findall(r"[a-z]+", t.lower())


def test_top_tokens_exact_and_partition_invariant(ray_session):
    full = Counter(t for txt in DOCS.text for t in _pytoks(txt))
    want = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    for parts in (1, 5):
        got = top_tokens(rd.from_pandas(DOCS).repartition(parts), "text", 5)
        assert list(map(tuple, got.itertuples(index=False))) == want


def test_top_tokens_k_larger_than_vocab(ray_session):
    got = top_tokens(rd.from_pandas(DOCS), "text", 1000)
    full = Counter(t for txt in DOCS.text for t in _pytoks(txt))
    assert len(got) == len(full)
    assert dict(zip(got.token, got.cnt)) == dict(full)
    # deterministic order: cnt desc, token asc
    key = list(zip(-got.cnt.to_numpy(), got.token))
    assert key == sorted(key)


def test_lexical_stats_exact():
    out = lexical_stats(DOCS, "doc_id", "text").set_index("doc_id")
    for _, row in DOCS.iterrows():
        toks = _pytoks(row.text)
        c = Counter(toks)
        r = out.loc[row.doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_types == len(c)
        assert r.n_hapax == sum(1 for v in c.values() if v == 1)
        want_ttr = np.floor(
            (len(c) / len(toks) if toks else 0.0) * 1e6 + 0.5) / 1e6
        assert r.ttr == want_ttr


def test_lexical_stats_batch_boundary_free(ray_session):
    a = (
        rd.from_pandas(DOCS)
        .repartition(7)
        .map_batches(lambda b: lexical_stats(b, "doc_id", "text"),
                     batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = lexical_stats(DOCS, "doc_id", "text")
    pd.testing.assert_frame_equal(a, b)
