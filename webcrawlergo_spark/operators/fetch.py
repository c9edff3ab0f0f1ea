"""S1 — the REAL HTTP fetch operator (production seam of fetch-sim).

Reference semantics (crawler.go:456-466, crawler.go:476-508,
cmd/settings): GET with a configured ``User-Agent`` header and a 5 s
client timeout; a transport-level error (connection refused/reset,
timeout) is a retryable failure distinct from any HTTP status; 404
dead-marks; robots.txt follows Google's policy — 429 or ≥500 is a
hard fail (no crawl), 4xx means "no rules".

Spark shape — the same one a 1000-executor deploy would run:

- ``mapInPandas`` over the frontier batch, Arrow-batched; per-row
  Python is inherent to socket I/O (this is the ONE operator family
  where the work is network-bound, not CPU-bound, so Python overhead
  is immaterial).
- the batch is ``repartition(host)`` first: each task owns whole
  hosts, so keep-alive connections are reused across a host's URLs
  (the per-partition connection pool) and per-host politeness delay
  can be enforced locally with zero coordination. Partition skew is
  pre-bounded by the politeness cap (salted top-K upstream caps any
  host's rows per wave).
- results are PASSED THROUGH inline (input columns + fetch columns)
  — no join back, no extra shuffle, and the fetch runs exactly once
  per row in the single downstream checkpoint action.

The operator is engine-pluggable: ``CrawlEngine(..., fetcher=...)``
swaps the fetch-sim join for this operator; everything downstream
(ranking, retry, dead-mark, link extraction, save) is identical, and
the localhost parity test asserts the two crawls match bit-for-bit.
"""

from __future__ import annotations

import http.client
import socket
import time
from collections.abc import Callable, Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..schemas import SPAN

USER_AGENT = "webcrawlergo-spark/1.0"  # reference default: crawler.go UserAgent config
FETCH_TIMEOUT_S = 5.0                  # reference: 5 * time.Second (crawler.go:487)

_FETCH_FIELDS = [
    T.StructField("doc_id", T.StringType(), True),
    T.StructField("http_status", T.IntegerType(), False),
    T.StructField("transport_fail", T.BooleanType(), False),
    T.StructField("spans", T.ArrayType(SPAN), True),
]


def _get_once(
    conns: dict,
    scheme: str,
    host: str,
    port: int | None,
    addr: tuple[str, int] | None,
    path: str,
    attempt: int,
    timeout: float,
    user_agent: str,
) -> tuple[int, bytes]:
    """One GET over a pooled keep-alive connection. Raises OSError /
    http.client.HTTPException on transport problems."""
    key = (host, port)
    conn = conns.get(key)
    if conn is None:
        if addr is not None:
            # PLAINTEXT by construction (ADVICE r5): the resolve seam
            # is the localhost parity rig — it pins every URL (any
            # scheme) to a local HTTP socket so real-fetch output can
            # be compared bit-for-bit with fetch-sim. It is NOT a
            # production DNS-pinning path: deploys needing pinned
            # addresses with TLS must wrap_socket(server_hostname=
            # host) here instead of using this seam (documented on
            # make_http_fetcher).
            conn = http.client.HTTPConnection(addr[0], addr[1], timeout=timeout)
        elif scheme == "https":
            conn = http.client.HTTPSConnection(host, port or 443, timeout=timeout)
        else:
            conn = http.client.HTTPConnection(host, port or 80, timeout=timeout)
        conns[key] = conn
    # RFC 9112: the Host header must carry the port when it isn't the
    # scheme default — the explicit header suppresses http.client's
    # automatic one, and a bare name would break name-based virtual
    # hosts / reverse proxies on non-default ports in production mode
    default_port = 443 if scheme == "https" else 80
    host_hdr = host if port in (None, default_port) else f"{host}:{port}"
    try:
        conn.request(
            "GET",
            path or "/",
            headers={
                "Host": host_hdr,
                "User-Agent": user_agent,
                "X-Attempt": str(attempt),
            },
        )
        resp = conn.getresponse()
        body = resp.read()
        return resp.status, body
    except Exception:
        # poison the pooled connection — whatever happened, it's dead
        try:
            conn.close()
        finally:
            conns.pop(key, None)
        raise


def make_http_fetcher(
    resolve: Callable[[str], tuple[str, int]] | None = None,
    parse_body: Callable[[str], tuple[str, list[dict]]] | None = None,
    timeout: float = FETCH_TIMEOUT_S,
    user_agent: str = USER_AGENT,
    request_delay_ms: int = 0,
) -> Callable[[DataFrame], DataFrame]:
    """Build the pluggable fetch operator.

    ``resolve(host) -> (addr, port)`` pins every host to a local
    PLAINTEXT socket — it is the localhost parity rig (every logical
    host → the in-process HTTP server, any URL scheme), NOT a
    production DNS-pinning path: a pinned https fetch here would
    silently drop TLS (ADVICE r5), so production deploys must leave
    it None (system DNS + real HTTPSConnection) or add a
    wrap_socket(server_hostname=host) pinned path.
    ``parse_body(html) -> (doc_id, spans)`` inverts the content
    serialization (default: sources.httpweb.parse_html_doc).
    ``request_delay_ms`` enforces a per-host floor between consecutive
    requests inside a task — with host-partitioned batches this IS
    the distributed politeness clock, no coordination needed.

    Transport semantics: one automatic same-attempt retry on a fresh
    connection distinguishes a stale keep-alive socket from a genuine
    transport failure; a failure on the fresh connection reports
    ``transport_fail=True`` (retryable upstream, T3), any HTTP
    response reports its status (404 → dead-mark, other non-200 →
    skip — wave-loop policy, not fetcher policy).
    """
    if parse_body is None:
        from ..sources.httpweb import parse_html_doc

        parse_body = parse_html_doc

    def fetcher(batch: DataFrame) -> DataFrame:
        out_schema = T.StructType(list(batch.schema.fields) + _FETCH_FIELDS)
        in_cols = [f.name for f in batch.schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            conns: dict = {}
            last_req: dict[str, float] = {}
            for pdf in batches:
                doc_ids, statuses, tfails, spans_col = [], [], [], []
                def pace(host: str) -> None:
                    """Per-host politeness floor, applied before EVERY
                    wire request — including the fresh-connection
                    retry, which would otherwise hit the host fastest
                    exactly when it is failing."""
                    if not request_delay_ms:
                        return
                    wait = last_req.get(host, 0.0) + request_delay_ms / 1e3 - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last_req[host] = time.monotonic()

                for url, attempt in zip(pdf["url"], pdf["retry_count"]):
                    parts = urlsplit(url)
                    host = parts.hostname or ""
                    addr = resolve(host) if resolve is not None else None
                    path = parts.path + (f"?{parts.query}" if parts.query else "")
                    status, body, tfail = 0, b"", False
                    for fresh in (False, True):
                        pace(host)
                        try:
                            status, body = _get_once(
                                conns, parts.scheme, host, parts.port, addr,
                                path, int(attempt), timeout, user_agent,
                            )
                            break
                        except (OSError, http.client.HTTPException, socket.timeout):
                            if fresh:
                                tfail = True
                    if tfail:
                        doc_ids.append(None); statuses.append(0)
                        tfails.append(True); spans_col.append(None)
                    elif status == 200:
                        doc_id, spans = parse_body(body.decode("utf-8", "replace"))
                        doc_ids.append(doc_id); statuses.append(200)
                        tfails.append(False); spans_col.append(spans)
                    else:
                        doc_ids.append(None); statuses.append(int(status))
                        tfails.append(False); spans_col.append(None)
                out = pdf[in_cols].copy()
                out["doc_id"] = doc_ids
                out["http_status"] = statuses
                out["transport_fail"] = tfails
                out["spans"] = spans_col
                yield out

        return batch.repartition("host").mapInPandas(run, out_schema)

    return fetcher


def http_fetch_robots(
    hosts: list[str],
    scheme: str = "https",
    resolve: Callable[[str], tuple[str, int]] | None = None,
    timeout: float = FETCH_TIMEOUT_S,
    user_agent: str = USER_AGENT,
) -> list[tuple[str, str, int]]:
    """S2 — fetch ``robots.txt`` per host, Google status policy
    (reference crawler.go:476-508): 200 → parse body; 429 or ≥500 →
    HARD FAIL (raise — the crawl must not start, reference treats it
    as fatal); other status → no rules (empty body, crawl allowed);
    transport error → hard fail like the reference's error return.

    Driver-side by design at the test scale (hosts are few and the
    result feeds ``parse_robots_rules``); the web-scale variant is the
    same loop inside ``mapInPandas`` over a distinct-hosts frame —
    bounded per-host work, same policy.
    """
    out: list[tuple[str, str, int]] = []
    conns: dict = {}
    for host in hosts:
        addr = resolve(host) if resolve is not None else None
        try:
            status, body = _get_once(
                conns, scheme, host, None, addr, "/robots.txt", 0, timeout, user_agent
            )
        except (OSError, http.client.HTTPException) as e:
            raise RuntimeError(f"could not get robots.txt for {host}: {e}") from e
        if status == 429 or status >= 500:
            raise RuntimeError(
                f"could not get robots.txt for {host}: HTTP {status} (Google hard-fail policy)"
            )
        out.append((host, body.decode("utf-8", "replace") if status == 200 else "", status))
    return out
