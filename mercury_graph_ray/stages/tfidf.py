"""TF-IDF scoring over a document corpus.

Beyond-ref training-data operator (SURVEY.md §2.11). The classic
relevance signal for corpus curation / keyword extraction: per document,
score each term by ``tf * ln(N / df)`` and keep the top-k terms.

Pinned semantics (replayed exactly by the DuckDB oracle):

- tokens: lowercase ``[a-z]+`` runs (stages/tokens.TOKEN_PATTERN);
- tf = occurrences of the token in the document;
- df = number of documents containing the token; idf = ln(N / df)
  (natural log, no smoothing — every scored token has df >= 1);
- ranking per document by (score DESC, token ASC) — exact ties (equal
  (tf, df) pairs give bit-equal scores) break on the token.

Scale shape:

- tf: map-only — one document is one row, so per-batch explode +
  groupby(doc, token) is exact with no shuffle;
- df: per-batch (token, partial doc-count) pre-combine from the tf
  partials, then ONE small groupby over the bounded vocabulary;
- tf x df: adaptive join (broadcast under the byte threshold, bucketed
  hash join above — stages/join.auto_join);
- per-doc top-k: int-bucket groupby (``doc_id % n_buckets``) with
  in-task sort + head, never one Python call per document.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mercury_graph_ray.stages.tokens import _TOKEN_RE


def _tf_batch(batch: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    toks = batch[text_col].str.lower().str.findall(_TOKEN_RE)
    lens = toks.str.len().to_numpy(np.int64)
    flat = np.concatenate(toks.to_numpy()) if lens.sum() else np.array([], object)
    owner = np.repeat(batch[id_col].to_numpy(), lens)
    tf = (
        pd.DataFrame({id_col: owner, "token": flat})
        .groupby([id_col, "token"], as_index=False)
        .size()
        .rename(columns={"size": "tf"})
    )
    tf["tf"] = tf["tf"].astype(np.int64)
    return tf


def tfidf_top_terms(ds, id_col: str, text_col: str, k: int = 1,
                    n_buckets: int = 64) -> pd.DataFrame:
    """Top-``k`` TF-IDF terms per document:
    (id, token, tf, df, score) with score rounded half-away to 6.
    Documents with no tokens produce no rows (SQL-join semantics)."""
    import pyarrow as pa

    from mercury_graph_ray.stages.join import auto_join
    from mercury_graph_ray.stages.util import bucket_sum_by

    n_docs = ds.count()
    tf = ds.map_batches(
        lambda b: _tf_batch(b, id_col, text_col), batch_format="pandas"
    ).materialize()

    def _df_partial(b: pd.DataFrame) -> pd.DataFrame:
        # one (doc, token) row each => count rows per token
        out = b.groupby("token", as_index=False).size()
        return pd.DataFrame({"token": out["token"],
                             "df": out["size"].astype(np.int64)})

    # merge the per-batch vocab partials with the bucketed pre-combine
    # kernel, NOT Ray's string-key sort aggregate (~240 µs/row: at 1M
    # docs the partials are n_blocks x vocab ≈ 10^7 rows — the sort
    # aggregate alone was the corpus-smoke cliff; see BASELINE.md r5)
    df = bucket_sum_by(
        tf.map_batches(_df_partial, batch_format="pandas"),
        ["token"], "df",
        {"token": pa.string(), "df": pa.int64()},
    )
    joined = auto_join(tf, df, on=("token",))

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["score"] = b["tf"].to_numpy(np.float64) * np.log(
            n_docs / b["df"].to_numpy(np.float64)
        )
        b["__bkt"] = (b[id_col] % n_buckets).astype(np.int64)
        return b

    def _topk(gr: pd.DataFrame) -> pd.DataFrame:
        gr = gr.sort_values(["score", "token"], ascending=[False, True],
                            kind="stable")
        return gr.groupby(id_col, as_index=False, sort=False).head(k).drop(
            columns="__bkt"
        )

    out = (
        joined.map_batches(_score, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(_topk, batch_format="pandas")
        .to_pandas()
    )
    m = 1e6
    out["score"] = np.sign(out["score"]) * np.floor(
        np.abs(out["score"].to_numpy(np.float64)) * m + 0.5) / m
    return out.sort_values([id_col, "token"]).reset_index(drop=True)
