"""Unigram language-model perplexity scoring over a document corpus.

Quality filtering by LM score (CCNet, RedPajama, FineWeb all rank web
documents by a language-model negative log-likelihood; the unigram LM is
the zero-dependency baseline of that family). Beyond-ref operator
(SURVEY.md §2.11).

Two passes, both Ray-Data-shaped for the 100-TB reading:

1. **Fit** — corpus token frequencies: per-batch ``value_counts``
   pre-combine (map-only partials), ONE small ``groupby`` over int
   buckets of the bounded vocabulary (``stages/tokens.top_tokens``'s
   shape — the shuffle moves vocabulary rows, never corpus rows). The
   resulting (token, count) table is the model; at web scale the
   vocabulary is capped to the top-V tokens with an OOV floor
   (``vocab_cap``), keeping the broadcast side small by construction.
2. **Score** — broadcast the log-prob table once via ``ray.put``; a
   stateless ``map_batches`` maps each document's tokens through the
   vocabulary (vectorized ``pd.Series.map`` + per-doc ``reduceat``) and
   emits ``nll = -mean log p(token)`` — no shuffle, no driver loop.

Pinned semantics for the exact SQL oracle: tokens are lowercase
``[a-z]+`` runs (the ``stages/tokens`` contract); ``p(tok) = count(tok)
/ total_tokens`` with NO smoothing (every scored token is in-vocabulary
when ``vocab_cap`` is None because the model is fit on the same corpus);
``nll`` is rounded half-away-from-zero to 6 decimals; token-free
documents score 0.0.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(r"[a-z]+")
N_BUCKETS = 16


def fit_unigram(ds, text_col: str = "text", vocab_cap: int | None = None) -> pd.DataFrame:
    """(token, cnt) model table. ``vocab_cap`` keeps the top-``cap``
    tokens by (cnt DESC, token ASC) — the scale path for unbounded
    vocabularies; None keeps everything (the exact-oracle mode)."""

    def _partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.lower().str.findall(_TOKEN_RE)
        flat = pd.Series(
            np.concatenate(toks.to_numpy()) if len(toks) else [], dtype=object
        )
        if not len(flat):
            return pd.DataFrame({"token": pd.Series([], dtype=str),
                                 "cnt": pd.Series([], dtype=np.int64),
                                 "__bkt": pd.Series([], dtype=np.int64)})
        vc = flat.value_counts()
        s = vc.index.to_series().reset_index(drop=True).astype(str)
        h = pd.util.hash_pandas_object(s, index=False).to_numpy(np.uint64)
        return pd.DataFrame({"token": s, "cnt": vc.to_numpy(np.int64),
                             "__bkt": (h % np.uint64(N_BUCKETS)).astype(np.int64)})

    def _sum_bucket(gr: pd.DataFrame) -> pd.DataFrame:
        return gr.groupby("token", as_index=False)["cnt"].sum()

    vocab = (
        ds.map_batches(_partials, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(_sum_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "token" not in vocab.columns:
        vocab = pd.DataFrame({"token": pd.Series([], dtype=str),
                              "cnt": pd.Series([], dtype=np.int64)})
    if vocab_cap is not None and len(vocab) > vocab_cap:
        vocab = vocab.sort_values(["cnt", "token"],
                                  ascending=[False, True]).head(vocab_cap)
    return vocab.reset_index(drop=True)


def score_nll(
    ds,
    vocab: pd.DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Dataset of ``(id_col, n_tokens, nll)``: per-document mean negative
    log-likelihood under the unigram model (OOV tokens — possible only
    with ``vocab_cap`` — fall back to the floor probability 1/total)."""
    import ray

    total = float(vocab["cnt"].sum()) if len(vocab) else 1.0
    logp = dict(
        zip(vocab["token"], np.log(vocab["cnt"].to_numpy(np.float64) / total))
    )
    floor = float(np.log(1.0 / total))
    model_ref = ray.put((logp, floor))

    class _Score:
        def __init__(self):
            self.logp, self.floor = ray.get(model_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch[text_col].str.lower().str.findall(_TOKEN_RE)
            lens = toks.str.len().to_numpy(np.int64)
            flat = pd.Series(
                np.concatenate(toks.to_numpy()) if lens.sum() else [],
                dtype=object,
            )
            lp = flat.map(self.logp).fillna(self.floor).to_numpy(np.float64)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            sums = np.zeros(len(batch), np.float64)
            nz = lens > 0
            if lp.size:
                seg = np.add.reduceat(lp, starts[nz])
                sums[nz] = seg
            with np.errstate(divide="ignore", invalid="ignore"):
                nll = np.where(nz, -sums / np.maximum(lens, 1), 0.0)
            nll = np.sign(nll) * np.floor(np.abs(nll) * 1e6 + 0.5) / 1e6
            return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                                 "n_tokens": lens, "nll": nll})

    return ds.map_batches(_Score, concurrency=(1, 8), batch_format="pandas")
