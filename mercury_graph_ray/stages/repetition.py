"""Per-document repetition signals (Gopher-style quality heuristics).

Web-crawl quality filtering drops documents dominated by repeated
content — boilerplate, keyword stuffing, generated spam. The Gopher /
MassiveText rules measure the fraction of the document covered by
duplicate n-grams and the mass of its single most frequent token; this
module computes the shingle-level analogue, pinned for an exact SQL
oracle. Beyond-ref operator (SURVEY.md §2.11 family).

Per document, over the pinned normalization (whitespace-collapsed
lowercase — the ``stages/dedup.shingle_hashes`` contract):

- ``n_pos``      number of k-char shingle positions (len - k + 1);
- ``n_dup_pos``  positions whose shingle occurs more than once in the
                 SAME document (self-repetition mass);
- ``dup_frac``   ``n_dup_pos / n_pos`` rounded half-away to 6;
- ``top_token``  most frequent ``[a-z]+`` token (ties: token ASC);
- ``top_frac``   its count / total tokens, rounded half-away to 6.

Map-only: every signal depends on one document alone — a stateless
``map_batches`` with zero shuffle, embarrassingly parallel at corpus
scale. The shingle counting reuses the vectorized UTF-32 polynomial
hasher (no Python per-shingle work); duplicate-position counts by hash
equal counts by string up to the documented ~2^-64-scale collision odds.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(r"[a-z]+")
DEFAULT_K = 10


def _round6(x) -> np.ndarray:
    x = np.asarray(x, np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def repetition_signals(
    batch: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
) -> pd.DataFrame:
    """Batch kernel: one row of repetition signals per document."""
    ids = batch[id_col].to_numpy()
    texts = batch[text_col]

    n_pos = np.zeros(len(batch), np.int64)
    n_dup = np.zeros(len(batch), np.int64)
    for i, text in enumerate(texts.to_numpy()):
        t = " ".join(text.split()).lower()
        if len(t) < k:
            continue  # no full shingle position; n_pos stays 0
        cp = np.frombuffer(t.encode("utf-32-le"), np.uint32).astype(np.uint64)
        n = len(cp) - k + 1
        h = np.zeros(n, np.uint64)
        P = np.uint64(0x9E3779B97F4A7C15)
        for j in range(k):
            h = h * P + cp[j : j + n]
        h ^= h >> np.uint64(30)  # splitmix avalanche (dedup.shingle_hashes)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        # positional counts (NOT the unique set): how many positions carry
        # a shingle that appears >1 time in this document
        _, counts = np.unique(h, return_counts=True)
        n_pos[i] = n
        n_dup[i] = int(counts[counts > 1].sum())

    with np.errstate(divide="ignore", invalid="ignore"):
        dup_frac = np.where(n_pos > 0, n_dup / np.maximum(n_pos, 1), 0.0)

    # most frequent token per document (tie -> token ASC), vectorized
    toks = texts.str.lower().str.findall(_TOKEN_RE)
    lens = toks.str.len().to_numpy(np.int64)
    flat = np.concatenate(toks.to_numpy()) if lens.sum() else np.array([], object)
    owner = np.repeat(np.arange(len(batch)), lens)
    top_token = np.full(len(batch), "", object)
    top_cnt = np.zeros(len(batch), np.int64)
    if len(flat):
        tf = (
            pd.DataFrame({"o": owner, "t": flat})
            .groupby(["o", "t"])
            .size()
            .rename("c")
            .reset_index()
            .sort_values(["o", "c", "t"], ascending=[True, False, True])
        )
        first = tf.drop_duplicates("o", keep="first")
        top_token[first["o"].to_numpy()] = first["t"].to_numpy()
        top_cnt[first["o"].to_numpy()] = first["c"].to_numpy(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        top_frac = np.where(lens > 0, top_cnt / np.maximum(lens, 1), 0.0)

    return pd.DataFrame(
        {
            id_col: ids,
            "n_pos": n_pos,
            "n_dup_pos": n_dup,
            "dup_frac": _round6(dup_frac),
            "top_token": top_token.astype(str),
            "top_frac": _round6(top_frac),
        }
    )
