"""In-process HTTP twin of the synthetic web — the integration rig
for the REAL fetch path (operators/fetch.py).

The sandbox has no external network, so the production fetch operator
is exercised against a localhost ``ThreadingHTTPServer`` that serves
the same ``SynthWeb`` universe the fetch-sim join uses. Nothing about
the server leaks into the engine: the fetcher resolves every logical
host (``host0.test``) to the server's ``127.0.0.1:port`` exactly the
way a production deploy would pin DNS, sends the original ``Host``
header, and parses real HTTP responses off the wire.

Document serialization: each page renders to deterministic HTML —
text spans as ``<p data-off>``, media spans as ``<img data-off>``,
``doc_id`` in a meta tag — and ``parse_html_doc`` inverts it exactly
(html-escape round-trip), so a crawl through real GETs reproduces the
fetch-sim crawl bit-for-bit (the parity gate).

Transport failures are REAL transport failures: for a URL whose
``fail_times`` exceeds the request's attempt number (the ``X-Attempt``
header carries the frontier row's retry_count — deterministic under
any request ordering/parallelism), the server closes the connection
without writing a response, so the client surfaces a socket-level
error, not an HTTP status — the same failure class Go's
``client.Do`` returns an ``error`` for (reference crawler.go:457-466).
"""

from __future__ import annotations

import html
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .synthweb import SynthWeb

_SPAN_RE = re.compile(
    r'<p data-off="(\d+)">(.*?)</p>|<img data-off="(\d+)" src="(.*?)">',
    re.DOTALL,
)
_DOCID_RE = re.compile(r'<meta name="doc-id" content="(.*?)">')


def render_html(doc_id: str, spans: list[dict]) -> str:
    """Deterministic HTML for a span document. Text content is
    html-escaped (it embeds raw ``<a href=...>`` link markup), so the
    parser's unescape recovers it byte-exactly."""
    parts = [
        "<!doctype html><html><head>",
        f'<meta name="doc-id" content="{html.escape(doc_id, quote=True)}">',
        "</head><body>",
    ]
    for s in spans:  # generator order == document order (offset asc)
        if s["kind"] == "text":
            parts.append(f'<p data-off="{s["offset"]}">{html.escape(s["text"])}</p>')
        else:
            parts.append(
                f'<img data-off="{s["offset"]}" src="{html.escape(s["media_ref"], quote=True)}">'
            )
    parts.append("</body></html>")
    return "".join(parts)


def parse_html_doc(body: str) -> tuple[str, list[dict]]:
    """Invert ``render_html``: (doc_id, spans) with exact span order
    ``(kind, text, media_ref, offset)`` — the per-row invariant the
    north rule checks (span-sequence equality)."""
    m = _DOCID_RE.search(body)
    doc_id = html.unescape(m.group(1)) if m else ""
    spans: list[dict] = []
    for tm in _SPAN_RE.finditer(body):
        if tm.group(1) is not None:
            spans.append(
                {
                    "kind": "text",
                    "text": html.unescape(tm.group(2)),
                    "media_ref": "",
                    "offset": int(tm.group(1)),
                }
            )
        else:
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": html.unescape(tm.group(4)),
                    "offset": int(tm.group(3)),
                }
            )
    spans.sort(key=lambda s: s["offset"])
    return doc_id, spans


class SynthWebServer:
    """Serve a SynthWeb over localhost. Pages are addressed by their
    LOGICAL url — scheme https is dropped on the wire (TLS is a
    transport concern, not a semantics one): the handler reconstructs
    ``https://<Host header><path>`` and looks it up in the universe.

    ``/robots.txt`` serves the universe's robots body; a configurable
    ``robots_status`` lets tests exercise the 429/≥500 hard-fail
    (reference crawler.go:489-499, Google robots policy).
    """

    def __init__(self, web: SynthWeb, robots_status: int = 200):
        self.web = web
        self.robots_status = robots_status
        # (path, monotonic-arrival) per GET — lets tests assert the
        # fetcher's per-host politeness spacing from the SERVER side
        self.request_log: list[tuple[str, float]] = []
        # raw Host header per GET — pins the RFC 9112 port-carrying rule
        self.host_log: list[str] = []
        self._log_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                with outer._log_lock:
                    outer.request_log.append((self.path, time.monotonic()))
                    outer.host_log.append(self.headers.get("Host") or "")
                host = (self.headers.get("Host") or "").split(":")[0]
                if self.path == "/robots.txt":
                    body = (
                        outer.web.robots_txt.encode()
                        if outer.robots_status == 200
                        else b""
                    )
                    self._respond(outer.robots_status, body)
                    return
                url = f"https://{host}{self.path}"
                page = outer.web.pages.get(url)
                if page is None and self.path == "/":
                    # the canonical root URL is the bare base URL; on
                    # the wire its path is "/"
                    page = outer.web.pages.get(f"https://{host}")
                if page is None:
                    self._respond(404, b"not found")
                    return
                attempt = int(self.headers.get("X-Attempt") or 0)
                if attempt < page["fail_times"]:
                    # REAL transport failure: close without a response
                    # (client sees RemoteDisconnected / BadStatusLine)
                    self.close_connection = True
                    self.connection.close()
                    return
                if page["status"] != 200:
                    self._respond(page["status"], b"")
                    return
                body = render_html(page["doc_id"], page["spans"]).encode()
                self._respond(200, body, "text/html")

            def _respond(self, status: int, body: bytes, ctype: str = "text/plain"):
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    @property
    def port(self) -> int:
        return self._srv.server_address[1]

    def __enter__(self) -> "SynthWebServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()
