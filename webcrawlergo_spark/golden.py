"""Pure-Python golden oracle: the reference's n=1 crawl semantics.

An exact, independent simulation of webcrawlerGo's single-worker
crawl loop (reference crawler.go:163-332) over a SynthWeb universe —
FIFO UniqueQueue + seen-map (reference queue/queue.go), href
extraction in document order (crawler.go:376-401), validation rules
(crawler.go:403-446), bounded retry via InsertForce
(crawler.go:197-203), 404 dead-marking (crawler.go:215-231), and the
resume-load classification (cmd/webcrawlerGo/init.go:21-106).

This module is the parity target for the Spark wave-loop engine
(plans/wave.py): tests assert equal crawl order, URL-seen set, and
per-document span sequences. It deliberately shares no code with the
engine beyond the SynthWeb input.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit

from .sources.synthweb import SynthWeb

INVALID_PREFIXES = ("file:", "mailto:", "tel:", "javascript:", "#", "data:")
VALID_SCHEMES = ("http", "https")


def extract_hrefs(spans: list[dict]) -> list[str]:
    """Anchor walk in document order (crawler.go:376-401): hrefs from
    text spans by ascending offset, trimmed (space + ONE trailing /),
    empties dropped, relative non-blacklisted resolved against base."""
    out = []
    for span in sorted(spans, key=lambda s: s["offset"]):
        if span["kind"] != "text":
            continue
        i = 0
        text = span["text"]
        while True:
            i = text.find('<a href="', i)
            if i < 0:
                break
            j = text.index('"', i + 9)
            out.append(text[i + 9 : j])
            i = j
    return out


def is_absolute(href: str) -> bool:
    """internal/utils.go:26-29: scheme and host both present."""
    try:
        p = urlsplit(href)
        return bool(p.scheme) and bool(p.netloc)
    except ValueError:
        return False


def normalize_href(href: str, base_url: str) -> str | None:
    """crawler.go:382-391: trim, drop empty, resolve relative."""
    href = href.strip()
    if href.endswith("/"):
        href = href[:-1]  # TrimSuffix: exactly one
    if href == "":
        return None
    if not is_absolute(href) and not href.startswith(INVALID_PREFIXES):
        if not href.startswith("/"):
            href = "/" + href
        href = base_url + href
    return href


class RobotsMatcher:
    """Google-style robots.txt matcher standing in for grobotstxt at
    crawler.go:441-446: named user-agent groups (most-specific agent
    wins, ``*`` fallback), ``*``/``$`` wildcards in rule patterns,
    longest-pattern wins, Allow wins ties, default allow."""

    def __init__(self, robots_txt: str, user_agent: str = "webcrawlerGo"):
        import re

        # group parse: consecutive User-agent lines share one group
        groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
        agents: list[str] = []
        rules: list[tuple[bool, str]] = []
        in_agents = False
        for line in robots_txt.splitlines():
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                if not in_agents:
                    if agents:
                        groups.append((agents, rules))
                    agents, rules = [], []
                    in_agents = True
                agents.append(val.lower())
            elif key in ("allow", "disallow"):
                in_agents = False
                if val:
                    rules.append((key == "allow", val))
        if agents:
            groups.append((agents, rules))
        # group selection: longest agent that prefixes our product token
        ua = user_agent.split("/", 1)[0].strip().lower()
        best: tuple[int, list[tuple[bool, str]]] | None = None
        star: list[tuple[bool, str]] | None = None
        for ag, ru in groups:
            for a in ag:
                if a == "*":
                    if star is None:
                        star = ru
                elif ua.startswith(a) and (best is None or len(a) > best[0]):
                    best = (len(a), ru)
        selected = best[1] if best is not None else (star or [])
        # compile: (is_allow, pattern_len, match_fn)
        self.rules: list[tuple[bool, int, object]] = []
        for is_allow, pat in selected:
            if "*" in pat or pat.endswith("$"):
                body, anchor = (pat[:-1], "$") if pat.endswith("$") else (pat, "")
                rx = re.compile("^" + ".*".join(re.escape(p) for p in body.split("*")) + anchor)
                self.rules.append((is_allow, len(pat), rx.search))
            else:
                self.rules.append((is_allow, len(pat), lambda s, _p=pat: s.startswith(_p)))

    def allowed(self, url: str) -> bool:
        path = urlsplit(url).path or "/"
        best: tuple[int, bool] | None = None
        for is_allow, plen, match in self.rules:
            if match(path):
                key = (plen, is_allow)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]


def is_valid_url(href: str, base_host: str, ignore_patterns: list[str], robots: RobotsMatcher) -> bool:
    """crawler.go:403-446 rule set, in order."""
    if href == "":
        return False
    try:
        p = urlsplit(href)
    except ValueError:
        return False
    if p.scheme and p.netloc and p.hostname != base_host:
        return False
    if p.scheme not in VALID_SCHEMES:
        return False
    if any(pat in p.path for pat in ignore_patterns if pat):  # ContainsAny skips ''
        return False
    return robots.allowed(href)


@dataclass
class GoldenResult:
    crawl_order: list[str] = field(default_factory=list)      # successful-fetch order
    event_order: list[str] = field(default_factory=list)      # every dequeue (incl. failures)
    seen: dict[str, bool] = field(default_factory=dict)       # the queue map (seen-set + fetch flags)
    urls_rows: dict[str, dict] = field(default_factory=dict)  # urls table: url → flags
    saved_pages: list[tuple[str, str]] = field(default_factory=list)  # (url, doc_id) in save order
    invalid: set[str] = field(default_factory=set)


def crawl_golden(
    web: SynthWeb,
    retry_times: int = 2,
    resume_urls: list[dict] | None = None,
    update_days: int = 1,
    now_ts: float = 1_700_000_000.0,
    update_hrefs: bool = False,
    min_content_chars: int = 0,
    user_agent: str = "webcrawlerGo",
) -> GoldenResult:
    """Single-worker reference crawl over the synthetic web.

    ``resume_urls`` rows mirror the urls-table shape (url,
    is_monitored, is_alive, last_saved as epoch seconds or None) and
    replay init.go's loadUrlsToQueue classification (ORDER BY
    is_monitored ASC assumed pre-applied by the caller — the engine
    sorts identically).
    """
    base_url = web.base_url
    base_host = urlsplit(base_url).hostname
    robots = RobotsMatcher(web.robots_txt, user_agent)
    res = GoldenResult()
    queue: list[str] = []
    seen = res.seen
    failed: dict[str, int] = {}

    def urls_insert(url: str, monitored: bool) -> None:
        if url not in res.urls_rows:
            res.urls_rows[url] = {"is_monitored": monitored, "is_alive": True, "saved": 0}

    def is_marked(url: str) -> bool:
        return any(m in url for m in web.marked_paths if m)  # ContainsAny skips ''

    # --- seed (cmd/webcrawlerGo/crawl.go:27-30) ---
    if base_url not in seen:
        seen[base_url] = False
        queue.append(base_url)
    urls_insert(base_url, False)

    # --- resume load (init.go:21-106), rows sorted is_monitored ASC ---
    # resume rows ARE the pre-existing DB state: the seed insert above
    # was a silent no-op on conflict (crawl.go:29-30), so DB flags win
    for row in sorted(resume_urls or [], key=lambda r: r["is_monitored"]):
        url = row["url"]
        res.urls_rows[url] = {
            "is_monitored": row["is_monitored"],
            "is_alive": row["is_alive"],
            "saved": res.urls_rows.get(url, {}).get("saved", 0),
        }
        if not row["is_alive"]:
            seen[url] = False
            continue
        if any(pat in url for pat in web.ignore_patterns):
            continue
        if urlsplit(url).hostname != base_host:
            continue
        last_saved = row.get("last_saved") or 0.0
        expiry = last_saved + update_days * 86400
        if row["is_monitored"] and now_ts >= expiry:
            fetch = True
        elif not row["is_monitored"] and is_marked(url):
            fetch = True
            res.urls_rows[url]["is_monitored"] = True
        else:
            fetch = False
        if fetch:
            seen[url] = False  # InsertForce resets map value...
            queue.append(url)
            seen[url] = True   # ...then SetMapValue(true) (init.go:93-94)
        elif update_hrefs:
            seen[url] = False
            queue.append(url)
        else:
            seen[url] = False

    # --- crawl loop (crawler.go:163-332), n=1 ⇒ strict FIFO ---
    while queue:
        urlpath = queue.pop(0)
        res.event_order.append(urlpath)
        status, page = web.fetch(urlpath)
        fails = web.pages.get(urlpath, {}).get("fail_times", 0)
        attempt = failed.get(urlpath, 0)
        if attempt < fails:  # transport error
            if retry_times > 0 and failed.get(urlpath, 0) < retry_times:
                seen[urlpath] = False  # InsertForce (queue/queue.go:124)
                queue.append(urlpath)
                failed[urlpath] = failed.get(urlpath, 0) + 1
            continue
        if status != 200:
            if status == 404 and urlpath in res.urls_rows:
                res.urls_rows[urlpath]["is_alive"] = False
            continue
        res.crawl_order.append(urlpath)
        for raw in extract_hrefs(page["spans"]):
            href = normalize_href(raw, base_url)
            if href is None:
                continue
            if href in res.invalid:  # known-invalid cache (crawler.go:395)
                continue
            if is_valid_url(href, base_host, web.ignore_patterns, robots):
                if href not in seen:  # Queue.Insert first-encounter
                    seen[href] = False
                    queue.append(href)
                    marked = is_marked(href)
                    urls_insert(href, marked)
                    if marked:
                        seen[href] = True
            else:
                res.invalid.add(href)
        # save / touch current url (crawler.go:300-319); min-content
        # guard per savePageContent (crawler.go:346-348)
        save = seen.get(urlpath, False)
        if is_marked(urlpath) or save:
            clen = sum(
                len(s.get("text") or "") + len(s.get("media_ref") or "")
                for s in page["spans"]
            )
            if clen >= min_content_chars:
                res.saved_pages.append((urlpath, page["doc_id"]))
                res.urls_rows[urlpath]["saved"] += 1
            seen[urlpath] = False
    return res
