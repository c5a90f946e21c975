"""functions/scrub: email/phone PII redaction semantics."""

import duckdb
import pandas as pd

from mercury_graph_ray.functions.scrub import (
    EMAIL_PATTERN,
    PHONE_PATTERN,
    scrub_batch,
    scrub_pii,
)

CASES = pd.Series(
    [
        "mail me at jane.doe+tags@sub.example.co.uk now",
        "two: a@b.io and c_d%e@f-g.org!",
        "call +44 123 4567 or +1-800-555123",
        "mixed x@y.com then +1 555 0000 done",
        "no pii here at all",
        "",
        "not-an-email @ nowhere, + 12 345",
    ]
)


def test_scrub_semantics():
    scrubbed, n = scrub_pii(CASES)
    assert scrubbed[0] == "mail me at <EMAIL> now" and n[0] == 1
    assert scrubbed[1] == "two: <EMAIL> and <EMAIL>!" and n[1] == 2
    assert scrubbed[2] == "call <PHONE> or <PHONE>" and n[2] == 2
    assert scrubbed[3] == "mixed <EMAIL> then <PHONE> done" and n[3] == 2
    assert scrubbed[4] == CASES[4] and n[4] == 0
    assert scrubbed[5] == "" and n[5] == 0
    assert scrubbed[6] == CASES[6] and n[6] == 0  # near-miss forms untouched


def test_scrub_matches_duckdb_re2():
    """The pinned patterns must mean the same thing to Python re and
    DuckDB RE2 — the whole point of the SQL-replayable design."""
    con = duckdb.connect()
    df = pd.DataFrame({"i": range(len(CASES)), "t": CASES})
    con.register("c", df)
    sql = con.execute(
        f"""SELECT regexp_replace(regexp_replace(t, '{EMAIL_PATTERN}',
                   '<EMAIL>', 'g'), '{PHONE_PATTERN}', '<PHONE>', 'g') AS s
            FROM c ORDER BY i"""
    ).df()["s"]
    scrubbed, _ = scrub_pii(CASES)
    assert list(sql) == list(scrubbed)


def test_scrub_batch_shape():
    b = pd.DataFrame({"doc_id": [1, 2], "text": ["a@b.cc", "clean"]})
    out = scrub_batch(b)
    assert list(out.columns) == ["doc_id", "text", "n_redactions"]
    assert out.text.tolist() == ["<EMAIL>", "clean"]
    assert out.n_redactions.tolist() == [1, 0]
