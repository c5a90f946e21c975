"""Corpus token statistics: heavy hitters and per-document lexical stats.

Beyond-ref training-data operators (SURVEY.md §2.11). Webtext curation
needs corpus-level vocabulary views ("what are the 50 most frequent
words", boilerplate detection) and per-document lexical-diversity
signals (type/token ratio, hapax fraction — low diversity flags
auto-generated or repeated text).

Tokenization is pinned for the SQL oracle: lowercase ASCII-letter runs,
``[a-z]+`` over ``lower(text)`` — in DuckDB exactly
``unnest(regexp_extract_all(lower(text), '[a-z]+'))``.

Scale shape:

- ``top_tokens``: per-batch token value-count partials (map-only
  pre-combine), ONE small ``groupby`` over int buckets of the bounded
  vocabulary (never the corpus), per-bucket partial top-k inside the
  group task, then a driver merge of ``n_buckets * k`` candidate rows —
  a token lives wholly in one bucket, so the merge is exact.
- ``lexical_stats``: map-only — each document's stats depend on that
  document alone; one pandas groupby per batch, no shuffle at all.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_PATTERN = r"[a-z]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)
N_BUCKETS = 16


def top_tokens(ds, text_col: str, k: int) -> pd.DataFrame:
    """Exact corpus-wide top-``k`` tokens by count.

    Returns a (token, cnt) DataFrame ordered by (cnt DESC, token ASC) —
    the deterministic tiebreak the SQL oracle replays.
    """

    def _partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.lower().str.findall(_TOKEN_RE)
        flat = pd.Series(np.concatenate(toks.to_numpy()) if len(toks) else [],
                         dtype=object)
        if not len(flat):
            return pd.DataFrame({"token": pd.Series([], dtype=str),
                                 "cnt": pd.Series([], dtype=np.int64),
                                 "__bkt": pd.Series([], dtype=np.int64)})
        vc = flat.value_counts()
        s = vc.index.to_series().reset_index(drop=True).astype(str)
        h = pd.util.hash_pandas_object(s, index=False).to_numpy(np.uint64)
        return pd.DataFrame({"token": s,
                             "cnt": vc.to_numpy(np.int64),
                             "__bkt": (h % np.uint64(N_BUCKETS)).astype(np.int64)})

    def _bucket_topk(gr: pd.DataFrame) -> pd.DataFrame:
        full = gr.groupby("token", as_index=False)["cnt"].sum()
        return full.sort_values(["cnt", "token"],
                                ascending=[False, True]).head(k)[["token", "cnt"]]

    cand = (
        ds.map_batches(_partials, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(_bucket_topk, batch_format="pandas")
        .to_pandas()  # at most N_BUCKETS * k candidate rows
    )
    if "token" not in cand.columns or not len(cand):
        return pd.DataFrame({"token": pd.Series([], dtype=str),
                             "cnt": pd.Series([], dtype=np.int64)})
    return (
        cand.sort_values(["cnt", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def lexical_stats(batch: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    """Per-document lexical diversity: token/type/hapax counts and TTR.

    Map-only batch kernel: ``(id, n_tokens, n_types, n_hapax, ttr)``,
    ttr = n_types / n_tokens (0.0 for token-free documents), rounded
    half-away to 6 decimals for SQL-hash parity.
    """
    toks = batch[text_col].str.lower().str.findall(_TOKEN_RE)
    lens = toks.str.len().to_numpy(np.int64)
    ids = batch[id_col].to_numpy()
    flat = np.concatenate(toks.to_numpy()) if lens.sum() else np.array([], object)
    owner = np.repeat(np.arange(len(batch)), lens)
    df = pd.DataFrame({"o": owner, "t": flat})
    per = df.groupby(["o", "t"]).size().rename("c").reset_index()
    agg = per.groupby("o")["c"].agg(n_types="count",
                                    n_hapax=lambda c: int((c == 1).sum()))
    n_types = np.zeros(len(batch), np.int64)
    n_hapax = np.zeros(len(batch), np.int64)
    n_types[agg.index.to_numpy()] = agg["n_types"].to_numpy(np.int64)
    n_hapax[agg.index.to_numpy()] = agg["n_hapax"].to_numpy(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ttr = np.where(lens > 0, n_types / np.maximum(lens, 1), 0.0)
    ttr = np.floor(ttr * 1e6 + 0.5) / 1e6  # half-away (duckdb round())
    return pd.DataFrame({id_col: ids, "n_tokens": lens, "n_types": n_types,
                         "n_hapax": n_hapax, "ttr": ttr})
