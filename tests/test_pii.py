"""PII scrub: hand-computed regex-kernel cases + fixture-injection
structure.  The engine-vs-DuckDB cross-check runs through
tools/check_oracle.py / the driver; these tests pin the SEMANTICS so a
regex edit that both engines happen to agree on still gets caught."""

import re

import numpy as np
import pandas as pd

from deduplicator_ray.pipelines import queries as q


CASES = [
    ("plain word salad no pii here", 0, 0, 0),
    ("mail a@b.io then x.y+z@sub.domain.org", 2, 0, 0),
    ("host 10.2.3.4 and 255.255.255.255", 0, 2, 0),
    ("dial +1 555-123-4567 or +44 201-555-0199", 0, 0, 2),
    ("user5@example.com at 10.0.0.1 call +1 555-000-1111", 1, 1, 1),
    ("not-an-email @ nothing, version 1.2.3 trailing", 0, 0, 0),
    ("", 0, 0, 0),
]


def test_pii_patterns_hand_cases():
    for text, ne, ni, nph in CASES:
        assert len(re.findall(q.PII_EMAIL_RE, text)) == ne, text
        assert len(re.findall(q.PII_IPV4_RE, text)) == ni, text
        assert len(re.findall(q.PII_PHONE_RE, text)) == nph, text


def test_pii_redact_placeholders():
    text = "user5@example.com at 10.0.0.1 call +1 555-000-1111"
    red = re.sub(q.PII_EMAIL_RE, "<EMAIL>", text)
    red = re.sub(q.PII_IPV4_RE, "<IPV4>", red)
    red = re.sub(q.PII_PHONE_RE, "<PHONE>", red)
    assert red == "<EMAIL> at <IPV4> call <PHONE>"
    # placeholders are fixed points: a second pass changes nothing
    red2 = re.sub(q.PII_EMAIL_RE, "<EMAIL>", red)
    red2 = re.sub(q.PII_IPV4_RE, "<IPV4>", red2)
    red2 = re.sub(q.PII_PHONE_RE, "<PHONE>", red2)
    assert red2 == red


def test_pii_stats_and_redact_reconcile(sf_small):
    stats = q.docs_pii_stats(sf_small)
    red = q.docs_pii_redact(sf_small)
    assert (stats["doc_id"].to_numpy() == red["doc_id"].to_numpy()).all()
    # redaction count == detection count per doc
    assert (stats["n_pii"].to_numpy() == red["n_redacted"].to_numpy()).all()
    # injection structure: every doc_id % 5 == 0 carries >= 1 email
    ids = stats["doc_id"].to_numpy()
    assert (stats["n_email"].to_numpy()[ids % 5 == 0] >= 1).all()
    assert (stats["n_ipv4"].to_numpy()[ids % 7 == 0] >= 1).all()
    assert (stats["n_phone"].to_numpy()[ids % 11 == 0] >= 1).all()
    # uninjected docs are PII-free (the base corpus is word salad)
    base = (ids % 5 != 0) & (ids % 7 != 0) & (ids % 11 != 0)
    assert (stats["n_pii"].to_numpy()[base] == 0).all()
    # redacted corpus is PII-free end to end
    joined = " ".join(red["text_redacted"].tolist())
    for pat in (q.PII_EMAIL_RE, q.PII_IPV4_RE, q.PII_PHONE_RE):
        assert not re.search(pat, joined)
