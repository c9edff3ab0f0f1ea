"""X2 canonicalizer: the vectorized pandas implementation must agree
with the golden's per-string normalization on the full href taxonomy
(reference crawler.go:382-391 + NOTES.md:1-48)."""

import pandas as pd

from webcrawlergo_spark.functions.urlnorm import _canon_one, _normalize_pd
from webcrawlergo_spark.golden import normalize_href

BASE = "https://host0.test"

TAXONOMY = [
    "/p1",
    "p2",
    "/p3/",
    "p4/",
    f"{BASE}/p5",
    f"{BASE}/p6/",
    "https://other.test/x",
    "mailto:a@b.c",
    "tel:+123",
    "javascript:void(0)",
    "#frag",
    "data:text/plain;x",
    "file:///etc/passwd",
    "",
    "   ",
    "  /spaced/path  ",
    "/p7//",
    "/files/doc.pdf",
    "/private/p8",
    "/P9",
    "HTTPS://HOST0.TEST/p10",  # case-variant host (case-sensitive dedup)
]


def test_vectorized_normalize_matches_golden():
    out = _normalize_pd(pd.Series(TAXONOMY), BASE)
    for raw, got in zip(TAXONOMY, out["href"]):
        want = normalize_href(raw, BASE)
        got = None if pd.isna(got) else got
        assert got == want, f"{raw!r}: engine {got!r} != golden {want!r}"


def test_normalize_parse_fields():
    out = _normalize_pd(pd.Series(["/p1", "mailto:a@b.c", "https://other.test:8080/a/b?q=1"]), BASE)
    assert out.loc[0, "href"] == f"{BASE}/p1"
    assert out.loc[0, "scheme"] == "https"
    assert out.loc[0, "host"] == "host0.test"
    assert out.loc[0, "path"] == "/p1"
    assert out.loc[1, "scheme"] == "mailto"
    assert out.loc[2, "host"] == "other.test"
    assert out.loc[2, "path"] == "/a/b"


def test_full_canonicalizer_rfc3986():
    assert _canon_one("HTTPS://Host.Test/a%7Eb?b=2&a=1") == "https://host.test/a~b?a=1&b=2"
    # idempotent
    c = _canon_one("https://h.test/x%20y?z=1&y=2")
    assert _canon_one(c) == c
