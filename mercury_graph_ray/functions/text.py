"""Text-analysis kernels for large-scale training-data pipelines.

Vectorized per-batch functions over a ``text`` column: token counting,
quality scoring, n-gram language ID, and rolling-hash fingerprinting.
All deterministic, stdlib/numpy/pandas only, designed to run inside
``map_batches`` (regexes compiled once per actor via the callable-class
wrappers below).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish word/punct splitter: letters+digits runs, or single punct
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_WORD_RE = re.compile(r"[A-Za-z']+")

_STOPWORDS_EN = frozenset(
    "the of and to a in is it you that he was for on are as with his they at".split()
)
_STOPWORDS_ES = frozenset(
    "de la que el en y a los se del las un por con no una su para es al lo".split()
)

# top character trigrams per language (tiny deterministic n-gram model)
_LANG_TRIGRAMS = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "),
    "es": (" de", "de ", " la", "la ", "os ", " qu", "que", "ue ", "ón ", " co"),
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace tokens = regex matches of ``\\S+`` (SQL-parity:
    duckdb ``len(regexp_extract_all(text, '\\S+'))``)."""
    return texts.str.count(_TOKEN_RE).fillna(0).to_numpy(np.int64)


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    return texts.str.count(_BPE_RE).fillna(0).to_numpy(np.int64)


def quality_features(texts: pd.Series) -> dict[str, np.ndarray]:
    """Heuristic quality signals: lengths, punct/stopword/alpha ratios."""
    n_chars = texts.str.len().fillna(0).to_numpy(np.int64)
    n_tokens = token_count(texts)
    n_alpha = texts.str.count(r"[A-Za-z]").fillna(0).to_numpy(np.int64)
    n_punct = texts.str.count(r"[^\w\s]").fillna(0).to_numpy(np.int64)
    words = texts.str.lower().str.findall(_WORD_RE)
    n_stop = words.map(
        lambda ws: sum(w in _STOPWORDS_EN or w in _STOPWORDS_ES for w in ws)
    ).to_numpy(np.int64)
    n_words = words.map(len).to_numpy(np.int64)
    safe_c = np.maximum(n_chars, 1)
    safe_w = np.maximum(n_words, 1)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": n_alpha / safe_c,
        "punct_ratio": n_punct / safe_c,
        "stopword_ratio": n_stop / safe_w,
        "mean_token_len": np.where(n_tokens > 0, n_chars / np.maximum(n_tokens, 1), 0.0),
    }


def lang_id(text: str) -> str:
    """Tiny trigram-vote language ID (en/es/unknown) — deterministic."""
    t = " " + " ".join(text.lower().split()) + " "
    best, best_score = "unknown", 0
    for lang, grams in _LANG_TRIGRAMS.items():
        score = sum(t.count(g) for g in grams)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0 else "unknown"


def fingerprint64(texts: pd.Series) -> np.ndarray:
    """64-bit FNV-1a rolling document fingerprint (content hash).

    FNV is serial per document, so the vectorization runs byte-POSITION-
    major: one numpy step per byte offset updates every document's hash at
    once (masked past each document's length). Cost is max_len vector ops
    over the batch instead of total_bytes Python-interpreter steps —
    identical output values. Row-chunked so the padded byte matrix stays
    under ~64 MB regardless of batch size."""
    n = len(texts)
    out = np.empty(n, np.uint64)
    if n == 0:
        return out
    prime = np.uint64(0x100000001B3)
    basis = np.uint64(0xCBF29CE484222325)
    arrs = [np.frombuffer(t.encode("utf-8"), np.uint8) for t in texts.fillna("")]
    lens = np.array([len(a) for a in arrs], np.int64)
    max_len = int(lens.max()) if n else 0
    rows_per_chunk = max(1, (64 << 20) // max(1, max_len))
    old = np.seterr(over="ignore")  # uint64 multiply wraps by design (FNV)
    try:
        for lo in range(0, n, rows_per_chunk):
            hi = min(n, lo + rows_per_chunk)
            cl = lens[lo:hi]
            m = int(cl.max())
            mat = np.zeros((hi - lo, m), np.uint8)
            for i, a in enumerate(arrs[lo:hi]):
                mat[i, : len(a)] = a
            h = np.full(hi - lo, basis, np.uint64)
            for j in range(m):
                live = j < cl
                h[live] = (h[live] ^ mat[live, j]) * prime
            out[lo:hi] = h
    finally:
        np.seterr(**old)
    return out


class TextStats:
    """Actor-pool stage: documents batch -> batch + token/quality columns.

    Use as ``ds.map_batches(TextStats, batch_format="pandas",
    concurrency=N)`` — regex state compiled once per actor."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = quality_features(batch["text"])
        for k, v in feats.items():
            batch[k] = v
        batch["lang_pred"] = batch["text"].map(lang_id)
        batch["fingerprint"] = fingerprint64(batch["text"])
        return batch
