"""Round-4 corpus-QC operators: decontamination, repetition, unigram LM.

Each kernel is cross-checked against an independent brute-force (raw
string sets / Counters), the same oracle style the dedup family uses.
"""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from mercury_graph_ray.stages.decontam import benchmark_shingles, contamination_scan
from mercury_graph_ray.stages.repetition import repetition_signals
from mercury_graph_ray.stages.unigram_lm import fit_unigram, score_nll

DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "the quick brown fox jumps over the lazy dog in the yard today",
            "a totally unrelated document about ray data pipelines and arrow",
            "the quick brown fox jumps over the lazy dog",  # full canary hit
            "spark spark spark spark spark spark spark spark spark spark",
            "short but long enough for shingles to exist here",
            "over the lazy dog in the yard today we walked the lazy dog",
        ],
    }
)


def _norm(t):
    return " ".join(t.split()).lower()


def _shingle_set(t, k):
    t = _norm(t)
    if len(t) < k:
        t = t.ljust(k)
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def _pytoks(t):
    return re.findall(r"[a-z]+", t.lower())


def test_contamination_scan_matches_string_sets(ray_session):
    bench_texts = ["the quick brown fox jumps over the lazy dog"]
    k = 12
    bench = benchmark_shingles(bench_texts, k=k)
    got = (
        contamination_scan(rd.from_pandas(DOCS).repartition(3), bench, k=k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bset = set().union(*(_shingle_set(t, k) for t in bench_texts))
    want = []
    for _, r in DOCS.iterrows():
        n = len(_shingle_set(r.text, k) & bset)
        if n:
            want.append((r.doc_id, n))
    assert list(map(tuple, got.itertuples(index=False))) == want
    # doc 0 shares a prefix, doc 2 is the full canary, doc 5 reuses
    # "over the lazy dog" — genuine partial contamination
    assert got.doc_id.tolist() == [0, 2, 5]


def test_contamination_scan_empty_bench(ray_session):
    got = contamination_scan(
        rd.from_pandas(DOCS), np.array([], np.uint64)
    ).to_pandas()
    assert len(got) == 0


def test_repetition_signals_brute_force(ray_session):
    k = 10
    got = repetition_signals(DOCS, k=k).set_index("doc_id")
    for _, r in DOCS.iterrows():
        t = _norm(r.text)
        n = max(len(t) - k + 1, 0)
        cnt = Counter(t[i : i + k] for i in range(n))
        n_dup = sum(c for c in cnt.values() if c > 1)
        row = got.loc[r.doc_id]
        assert row.n_pos == n
        assert row.n_dup_pos == n_dup
        assert row.dup_frac == pytest.approx(n_dup / n if n else 0.0, abs=1e-6)
        toks = _pytoks(r.text)
        tf = Counter(toks)
        top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert row.top_token == top[0]
        assert row.top_frac == pytest.approx(top[1] / len(toks), abs=1e-6)
    # the spam doc must read as highly repetitive
    assert got.loc[3].dup_frac > 0.9 and got.loc[3].top_frac == 1.0


def test_unigram_nll_brute_force(ray_session):
    ds = rd.from_pandas(DOCS).repartition(2)
    vocab = fit_unigram(ds, "text")
    flat = Counter(t for txt in DOCS.text for t in _pytoks(txt))
    assert dict(zip(vocab.token, vocab.cnt)) == dict(flat)
    total = sum(flat.values())
    got = score_nll(ds, vocab).to_pandas().set_index("doc_id")
    for _, r in DOCS.iterrows():
        toks = _pytoks(r.text)
        want = sum(-math.log(flat[t] / total) for t in toks) / len(toks)
        row = got.loc[r.doc_id]
        assert row.n_tokens == len(toks)
        assert row.nll == pytest.approx(want, abs=1e-6)
    # the all-one-token spam doc has the lowest (most predictable) nll
    assert got.nll.idxmin() == 3


def test_unigram_vocab_cap_oov_floor(ray_session):
    ds = rd.from_pandas(DOCS)
    vocab = fit_unigram(ds, "text", vocab_cap=3)
    assert len(vocab) == 3
    got = score_nll(ds, vocab).to_pandas()
    assert (got.nll > 0).all()  # OOV tokens hit the floor, never NaN/inf
    assert np.isfinite(got.nll).all()


def test_shingle_hash_positions_parity_with_shingle_hashes():
    """The flattened batch helper (one pass, no per-doc loop) must agree
    with the pinned per-document shingle_hashes on (a) the per-doc unique
    hash SET (pad=True, the decontam contract) and (b) per-doc positional
    multiset counts (pad=False, the repetition contract)."""
    from mercury_graph_ray.stages.dedup import shingle_hash_positions, shingle_hashes

    rng = np.random.default_rng(11)
    texts = [
        "",
        "ab",
        "   spaced    OUT   text   ",
        "the quick brown fox " * 3,
        "".join(rng.choice(list("abcdef  "), size=200)),
        "unicode ü§ß chars with ümläuts",
    ]
    for k in (5, 10, 20):
        h, owner, n_pos = shingle_hash_positions(texts, k, pad=True)
        assert int(n_pos.sum()) == len(h) and len(owner) == len(h)
        for i, t in enumerate(texts):
            got = np.unique(h[owner == i])
            want = shingle_hashes(t, k)
            assert np.array_equal(got, want), (i, k)
        # pad=False: short docs contribute zero positions; long docs'
        # positional hash multisets equal the direct per-doc computation
        h2, owner2, n_pos2 = shingle_hash_positions(texts, k, pad=False)
        for i, t in enumerate(texts):
            norm = " ".join(t.split()).lower()
            if len(norm) < k:
                assert n_pos2[i] == 0
            else:
                assert n_pos2[i] == len(norm) - k + 1
                vals, cnts = np.unique(h2[owner2 == i], return_counts=True)
                assert np.array_equal(vals, shingle_hashes(t, k))
