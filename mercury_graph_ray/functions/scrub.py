"""PII scrubbing for webtext corpora: email / phone redaction.

Beyond-ref training-data operator (SURVEY.md §2.11). Webtext pipelines
redact contact PII before training; the operator must be deterministic
and batch-boundary-free (a pure per-row rewrite), and here it is also
SQL-replayable so the driver oracle can hash-check full scrubbed text.

Patterns are pinned to a subset that Python ``re`` and DuckDB's RE2
interpret identically (no backrefs, no lookaround, greedy quantifiers
over disjoint character classes):

- email: ``[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}``
- phone: ``\\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3,6}`` (explicit +CC forms)

Application order is pinned: emails are counted+replaced first, then
phones are counted+replaced on the email-scrubbed text — in SQL, nested
``regexp_replace(..., 'g')`` with counts from ``regexp_extract_all``.

Scale shape: map-only ``map_batches`` with vectorized pandas str kernels;
regexes are module-level compiled (one compile per worker process).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3,6}"
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"

_EMAIL_RE = re.compile(EMAIL_PATTERN)
_PHONE_RE = re.compile(PHONE_PATTERN)


def scrub_pii(texts: pd.Series) -> tuple[pd.Series, np.ndarray]:
    """(scrubbed text, per-row redaction count) — emails then phones."""
    n_email = texts.str.count(_EMAIL_RE).fillna(0).to_numpy(np.int64)
    after_email = texts.str.replace(_EMAIL_RE, EMAIL_TOKEN, regex=True)
    n_phone = after_email.str.count(_PHONE_RE).fillna(0).to_numpy(np.int64)
    scrubbed = after_email.str.replace(_PHONE_RE, PHONE_TOKEN, regex=True)
    return scrubbed, n_email + n_phone


def scrub_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """map_batches kernel: replace ``text_col`` with the scrubbed text
    and append an ``n_redactions`` column."""
    scrubbed, n = scrub_pii(batch[text_col])
    out = batch.copy()
    out[text_col] = scrubbed
    out["n_redactions"] = n
    return out
