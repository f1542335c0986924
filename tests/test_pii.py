"""PII detection/redaction: counts and masked text must match a Python
`re` twin exactly (the patterns are restricted to the Java∩RE2∩Python
regex subset precisely so three engines can agree match-for-match), and
redaction must be order-safe (an SSN never half-eaten by the phone
pattern). Driver entries `pii_counts` / `pii_redact` hash-check vs
DuckDB RE2."""

from __future__ import annotations

import re

import pytest

from searchengine_spark.ops.pii import PII_PATTERNS, pii_counts, redact_pii

DOCS = [
    (1, "contact alice.smith+spam@example.co.uk or bob@test.io today"),
    (2, "server at 192.168.1.254 and 10.0.0.1 port 8080"),
    (3, "ssn 123-45-6789 phone +1-555-867-5309 and 5551234567"),
    (4, "no personal data here"),
    (5, "eve@corp.example, 172.16.254.3, call 020-7946-0958"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_counts_match_python_re(spark):
    got = {r["doc_id"]: r.asDict() for r in pii_counts(_df(spark)).collect()}
    for doc_id, text in DOCS:
        total = 0
        for name, pat, _ in PII_PATTERNS:
            n = len(re.findall(pat, text))
            assert got[doc_id][f"n_{name}"] == n, (doc_id, name)
            total += n
        assert got[doc_id]["n_pii"] == total
    assert got[1]["n_email"] == 2 and got[2]["n_ipv4"] == 2
    assert got[3]["n_ssn"] == 1 and got[3]["n_phone"] >= 2
    assert got[4]["n_pii"] == 0


def test_redaction_matches_python_re_and_is_order_safe(spark):
    got = {r["doc_id"]: r["text"] for r in redact_pii(_df(spark)).collect()}
    for doc_id, text in DOCS:
        want = text
        for _, pat, repl in PII_PATTERNS:
            want = re.sub(pat, repl, want)
        assert got[doc_id] == want, doc_id
    # typed placeholders; nothing sensitive survives
    assert "<EMAIL>" in got[1] and "@" not in got[1]
    assert "<SSN>" in got[3] and "123-45-6789" not in got[3]
    assert "<IP>" in got[2] and "192.168.1.254" not in got[2]
    assert "<PHONE>" in got[3]
    assert got[4] == DOCS[3][1]  # untouched
    # order safety: the SSN became <SSN>, not a half-eaten <PHONE>
    assert "<PHONE>-" not in got[3].replace("<PHONE> ", "")


def test_redact_out_col_preserves_original(spark):
    out = redact_pii(_df(spark), out_col="clean").collect()
    row = {r["doc_id"]: r for r in out}[3]
    assert "123-45-6789" in row["text"] and "<SSN>" in row["clean"]
