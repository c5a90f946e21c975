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

    # one flattened pass over the whole batch (VERDICT r4 #5: no
    # per-document loop): hash every shingle position across all
    # documents, then per-(doc, shingle) run lengths from one lexsort;
    # pad=False keeps the "short doc -> zero positions" contract
    from mercury_graph_ray.stages.dedup import shingle_hash_positions

    h, owner, n_pos = shingle_hash_positions(texts, k, pad=False)
    n_dup = np.zeros(len(batch), np.int64)
    if len(h):
        o = np.lexsort((h, owner))
        ho, oo = h[o], owner[o]
        starts = np.flatnonzero(
            np.concatenate([[True], (ho[1:] != ho[:-1]) | (oo[1:] != oo[:-1])])
        )
        counts = np.diff(np.concatenate([starts, [len(ho)]]))
        # positional mass (NOT the unique set): positions whose shingle
        # appears >1 time in the SAME document
        dup = counts > 1
        n_dup = np.bincount(
            oo[starts][dup], weights=counts[dup], minlength=len(batch)
        ).astype(np.int64)

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
