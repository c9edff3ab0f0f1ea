"""URL canonicalizer — the X2 vectorized UDF surface.

Reproduces the reference's href handling exactly (F1+F2+F3,
reference crawler.go:382-391,419-437 + internal/utils.go:26-34):
trim space, trim ONE trailing slash, drop empty, resolve relative
(unless prefix-blacklisted) against the base URL, split into
scheme/host/path.

Everything is pandas vectorized string ops over Arrow batches — no
per-row Python in the hot path. The one irreducibly per-element step
(percent-decoding for the north rule's full RFC 3986 canonical form)
runs on *unique* values only (`canonicalize_full`), the standard
dedup-then-map vectorization trick.
"""

from __future__ import annotations

from urllib.parse import quote, unquote, urlsplit

import pandas as pd
from pyspark.sql import functions as F, types as T

INVALID_PREFIXES = ("file:", "mailto:", "tel:", "javascript:", "#", "data:")
VALID_SCHEMES = ("http", "https")

# scheme "://" non-empty authority — Go's IsAbsoluteURL (scheme and host
# both non-empty after url.Parse), internal/utils.go:26-29
_ABS_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]"
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"

NORM_SCHEMA = T.StructType(
    [
        T.StructField("href", T.StringType()),    # resolved, trimmed; null ⇒ dropped (empty)
        T.StructField("scheme", T.StringType()),  # '' when unparseable/relative-blacklisted
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
    ]
)


def _normalize_pd(raw: pd.Series, base_url: str) -> pd.DataFrame:
    s = raw.fillna("").str.strip()
    s = s.str.replace(r"/$", "", regex=True)  # TrimSuffix: at most one match at $
    empty = s == ""
    is_abs = s.str.match(_ABS_RE)
    blacklisted = s.str.startswith(INVALID_PREFIXES)
    needs_resolve = ~is_abs & ~blacklisted & ~empty
    no_slash = needs_resolve & ~s.str.startswith("/")
    s = s.where(~no_slash, "/" + s)
    s = s.where(~needs_resolve, base_url + s)
    scheme = s.str.extract(_SCHEME_RE, expand=False).str.lower()
    # relative-style leftovers (mailto:, #frag …): Go url.Parse scheme
    scheme_generic = s.str.extract(r"^([A-Za-z][A-Za-z0-9+.\-]*):", expand=False).str.lower()
    scheme = scheme.fillna(scheme_generic).fillna("")
    host = s.str.extract(_HOST_RE, expand=False).fillna("")
    path = s.str.extract(_PATH_RE, expand=False).fillna("")
    out = pd.DataFrame({"href": s, "scheme": scheme, "host": host, "path": path})
    out.loc[empty, "href"] = None
    return out


def make_normalize_udf(base_url: str):
    """Pandas UDF (Arrow-batched) binding the base URL."""

    @F.pandas_udf(NORM_SCHEMA)
    def normalize(raw: pd.Series) -> pd.DataFrame:
        return _normalize_pd(raw, base_url)

    return normalize


def host_expr(s):
    """Host of an already-normalized href — the very expression the
    ``host`` field of ``normalize_expr`` is built from. Lets consumers
    re-derive the host from a deduplicated href set instead of
    shuffling the host string alongside every candidate row (guide
    §2.3). NOTE (r6 negative result, kept for the record): a
    locate/substr/translate re-spelling of the whole canonicalizer
    measured ~3x SLOWER than these short anchored regexes at 10M rows
    — the Java regex engine beats a deep when/substr tree, whose size
    defeats codegen common-subexpression elimination. The regex
    spelling stays."""
    return F.regexp_extract(s, _HOST_RE, 1)


def normalize_expr(base_url: str, raw):
    """JVM-codegen twin of the pandas canonicalizer: identical
    semantics, zero Python in the stage (tests assert equality with
    ``_normalize_pd`` over the full href taxonomy).

    This is the engine's default hot path — whole-stage-codegen regex
    beats Arrow round-trips; the pandas UDF remains the extension
    surface for transforms that genuinely need Python.
    """
    s = F.trim(raw)
    s = F.regexp_replace(s, r"/$", "")  # TrimSuffix: one trailing slash
    is_empty = s == ""
    is_abs = s.rlike(_ABS_RE)
    blacklisted = F.lit(False)
    for p in INVALID_PREFIXES:
        blacklisted = blacklisted | s.startswith(p)
    needs_resolve = ~is_abs & ~blacklisted & ~is_empty
    resolved = F.concat(
        F.lit(base_url), F.when(s.startswith("/"), F.lit("")).otherwise(F.lit("/")), s
    )
    s = F.when(needs_resolve, resolved).otherwise(s)
    scheme = F.lower(F.regexp_extract(s, _SCHEME_RE, 1))
    scheme_generic = F.lower(F.regexp_extract(s, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    scheme = F.when(scheme == "", scheme_generic).otherwise(scheme)
    host = host_expr(s)
    path = F.regexp_extract(s, _PATH_RE, 1)
    return F.struct(
        F.when(~is_empty, s).alias("href"),
        scheme.alias("scheme"),
        host.alias("host"),
        path.alias("path"),
    )


def _canon_one(href: str) -> str:
    """Full RFC 3986 canonical form (north-rule extension, not used on
    the reference-parity path): lowercase scheme+host, decode unreserved
    percent-escapes, re-encode, sort query params."""
    p = urlsplit(href)
    path = quote(unquote(p.path), safe="/:@!$&'()*+,;=~-._")
    query = "&".join(sorted(q for q in p.query.split("&") if q))
    out = f"{p.scheme.lower()}://{p.netloc.lower()}{path or ''}"
    if query:
        out += f"?{query}"
    return out


def canonicalize_full_udf():
    """Vectorized-by-uniques full canonicalizer."""

    @F.pandas_udf(T.StringType())
    def canon(raw: pd.Series) -> pd.Series:
        uniq = raw.dropna().unique()
        table = {u: _canon_one(u) for u in uniq}
        return raw.map(table)

    return canon
