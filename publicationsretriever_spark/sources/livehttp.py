"""Live-HTTP fetch resolver — the production swap-in for the synthetic
web's ``resolver_factory`` seam (plans/rounds.py).

Implements the reference's connection ladder (N2/N4/N11/N12,
util/http/HttpConnUtils.openHttpConnection :310-519 and
ConnSupportUtils :111-135, 742-777) on the stdlib ``urllib`` stack:

- HEAD-first policy with a per-domain "HEAD unsupported" memory:
  405/501 on a HEAD marks the domain and falls back to GET
  (HttpConnUtils.java:433-450).
- 406 retries once without the Accept-Language header and remembers
  the domain (HttpConnUtils.java:415-432,
  domainsWithUnsupportedAcceptLanguageParameter).
- Browser-shaped request headers (ConnSupportUtils.setHttpHeaders
  :111-135); Accept-Encoding limited to codecs we can decode.
- Response decompression: gzip/deflate always; brotli/zstd when their
  python codecs are importable (ConnSupportUtils.java:742-777).
- Redirects are NOT followed: the engine's fetch UDF owns the redirect
  loop (hop caps, P11 learning), so ``location`` is surfaced raw.
- Error mapping matches the engine's status contract:
  timeout -> status -1 (conn_timeout: retryable, A2-counted);
  DNS failure / SSL failure -> status 0 (falls into the engine's
  unknown_code branch = immediate domain block, exactly the
  reference's UnknownHostException / SSLException blacklisting,
  HttpConnUtils.java:477-502).
- HTTP/2->1.1 fallback is N/A: urllib speaks HTTP/1.1 only (the
  reference needs the fallback because java.net.http defaults to 2).

The factory is picklable (plain attributes); each Spark task builds
its own resolver with task-local domain-memory sets — consistent with
the engine's design of host-partitioned fetch tasks (a domain's
requests land in one task, so its HEAD/language memory is complete).
"""

from __future__ import annotations

import gzip
import http.cookiejar
import socket
import ssl
import urllib.error
import urllib.parse
import urllib.request
import zlib

#: ConnSupportUtils.setHttpHeaders :119-133 (Accept-Encoding reduced to
#: what this resolver can actually decode)
BASE_HEADERS = {
    "User-Agent": (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:109.0) "
        "Gecko/20100101 Firefox/119.0"
    ),
    "Accept": (
        "text/html,application/xhtml+xml,application/xml;q=0.9,"
        "image/avif,image/webp,*/*;q=0.8"
    ),
    "DNT": "1",
    "Sec-Fetch-Dest": "document",
    "Sec-Fetch-Mode": "navigate",
    "Sec-Fetch-Site": "cross-site",
    "Upgrade-Insecure-Requests": "1",
    "Pragma": "no-cache",
    "Cache-Control": "no-cache",
}
ACCEPT_LANGUAGE = "en-US,en;q=0.5"

try:  # optional codecs (not in every image)
    import brotli as _brotli  # type: ignore
except Exception:  # noqa: BLE001
    _brotli = None
try:
    import zstandard as _zstd  # type: ignore
except Exception:  # noqa: BLE001
    _zstd = None


def _accept_encoding() -> str:
    encs = ["gzip", "deflate"]
    if _brotli is not None:
        encs.append("br")
    if _zstd is not None:
        encs.append("zstd")
    return ", ".join(encs)


class DecompressOverflow(Exception):
    """Decompressed size exceeded the caller's ``max_out`` cap — the
    compressed bytes fit the size guard but the inflated stream would
    not (gzip/deflate/brotli bombs). Callers treat this like the N10
    oversize case: headers kept, body dropped."""


def _zlib_stream(body: bytes, wbits: int, max_out: int | None) -> bytes:
    """Streaming inflate with an OUTPUT cap: decompressobj + max_length
    loop, so a bomb never materializes more than max_out+1 bytes.

    Multi-member gzip streams (RFC 1952 §2.2 allows back-to-back
    members; some origin servers re-compress chunked bodies that way)
    are decoded member-by-member with the same cumulative output cap —
    matching the old ``gzip.decompress`` behavior this replaced
    (ADVICE r4: the first cut decoded only the first member)."""
    out = bytearray()
    data = body
    while True:
        d = zlib.decompressobj(wbits)
        while data:
            if max_out is None:
                chunk = d.decompress(data)
            else:
                chunk = d.decompress(data, max_out - len(out) + 1)
            out += chunk
            if max_out is not None and len(out) > max_out:
                raise DecompressOverflow(len(out))
            tail = d.unconsumed_tail
            if not chunk and tail == data:
                break  # no progress possible
            data = tail
            if d.eof:
                break
        out += d.flush()
        if max_out is not None and len(out) > max_out:
            raise DecompressOverflow(len(out))
        # next gzip member? (only the gzip container concatenates;
        # trailing non-member bytes are ignored, like browsers do)
        data = d.unused_data if d.eof else b""
        if wbits < 16 or not data.startswith(b"\x1f\x8b"):
            return bytes(out)


#: fallback feed size for brotli bindings without an output limit: a
#: single process() call can then only expand this much compressed
#: input before the cap check runs (brotli's window caps expansion per
#: input byte far below gzip's 1032x, so 4 KiB keeps worst-case
#: overshoot in the low MBs instead of 'the whole stream')
_BR_FEED_CHUNK = 4096


def _brotli_decompress(body: bytes, max_out: int | None) -> bytes:
    """Brotli inflate with a REAL output cap (ADVICE r4 medium: the old
    64 KiB-feed loop let one process() call materialize an unbounded
    chunk before the cap check). brotli>=1.1 exposes
    ``process(data, output_buffer_limit=n)`` + ``can_accept_more_data()``
    — the binding buffers un-emitted output natively, so we drain in
    budget-sized slices and overflow deterministically at max_out+1.
    Older bindings (no kwarg -> TypeError on the first call, before any
    decoding) fall back to tiny 4 KiB feed chunks."""
    d = _brotli.Decompressor()
    step = getattr(d, "process", None) or getattr(d, "decompress")
    if max_out is None:
        out = bytearray()
        for i in range(0, len(body), 1 << 16):
            out += step(body[i : i + (1 << 16)])
        return bytes(out)
    try:
        out = bytearray(step(body, output_buffer_limit=max_out + 1))
        more = getattr(d, "can_accept_more_data", lambda: True)
        while len(out) <= max_out and not more():
            # output_buffer_limit hit: decoded bytes are pending inside
            # the native state — drain with the remaining budget
            chunk = step(b"", output_buffer_limit=max_out + 1 - len(out))
            if not chunk:
                break
            out += chunk
        if len(out) > max_out:
            raise DecompressOverflow(len(out))
        return bytes(out)
    except TypeError:  # binding predates output_buffer_limit
        pass
    d = _brotli.Decompressor()
    step = getattr(d, "process", None) or getattr(d, "decompress")
    out = bytearray()
    for i in range(0, len(body), _BR_FEED_CHUNK):
        out += step(body[i : i + _BR_FEED_CHUNK])
        if len(out) > max_out:
            raise DecompressOverflow(len(out))
    return bytes(out)


def decompress(
    body: bytes, encoding: str | None, max_out: int | None = None
) -> bytes | None:
    """ConnSupportUtils.getCompressedInputStream (:742-777): decode the
    Content-Encoding; None for an unsupported/broken encoding (the
    reference drops those responses). ``max_out`` caps the DECOMPRESSED
    size (raises DecompressOverflow) — the transport-level size guard
    only sees compressed bytes, so without this an 8 MB gzip bomb could
    inflate to GBs in executor memory."""
    if not encoding:
        return body
    enc = encoding.strip().lower()
    try:
        if enc in ("identity", ""):
            return body
        if enc == "gzip":
            return _zlib_stream(body, 16 + zlib.MAX_WBITS, max_out)
        if enc == "deflate":
            try:
                return _zlib_stream(body, zlib.MAX_WBITS, max_out)
            except zlib.error:  # raw-deflate servers
                return _zlib_stream(body, -zlib.MAX_WBITS, max_out)
        if enc == "br" and _brotli is not None:
            return _brotli_decompress(body, max_out)
        if enc == "zstd" and _zstd is not None:
            # streaming reader with an explicit output budget: overflow
            # is decided by OUR byte count, never by sniffing ZstdError
            # messages (ADVICE r4: 'error determining content size from
            # frame header' used to be misread as an overflow) — any
            # ZstdError falls to the corrupt-drop path below.
            import io

            reader = _zstd.ZstdDecompressor().stream_reader(
                io.BytesIO(body)
            )
            cap = (1 << 30) if max_out is None else max_out
            out = bytearray()
            while True:
                chunk = reader.read(1 << 16)
                if not chunk:
                    return bytes(out)
                out += chunk
                if len(out) > cap:
                    if max_out is None:  # uncapped call: hostile-drop
                        return None
                    raise DecompressOverflow(len(out))
    except DecompressOverflow:
        raise
    except Exception:  # noqa: BLE001 — corrupt stream: drop like the ref
        return None
    return None  # unsupported encoding


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    """Surface 3XX to the caller — the engine's fetch loop owns hops."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):  # noqa: D102
        return None


class _NoHttpError(urllib.request.HTTPErrorProcessor):
    """4XX/5XX are data, not exceptions."""

    def http_response(self, request, response):  # noqa: D102
        return response

    https_response = http_response


#: hostile/buggy Retry-After values must not stall a host's politeness
#: clock for days; one hour is far beyond any sane throttle window
MAX_RETRY_AFTER_MS = 3600 * 1000


def _retry_after_ms(value: str | None) -> int | None:
    """Parse a Retry-After header (RFC 9110 §10.2.3: delta-seconds or
    HTTP-date) into milliseconds, capped at MAX_RETRY_AFTER_MS. The
    reference only logs the header (TODO at ConnSupportUtils.java:
    675-680); honoring it in the politeness schedule is a deliberate
    beyond-reference improvement. Returns None when absent/unparsable."""
    if not value:
        return None
    value = value.strip()
    if value.isdigit():
        ms = int(value) * 1000
    else:
        try:
            from email.utils import parsedate_to_datetime

            dt = parsedate_to_datetime(value)
            import datetime as _dt

            delta = dt - _dt.datetime.now(_dt.timezone.utc)
            ms = int(delta.total_seconds() * 1000)
        except (TypeError, ValueError):
            return None
    if ms <= 0:
        return None
    return min(ms, MAX_RETRY_AFTER_MS)


def _domain_of(url: str) -> str:
    try:
        return (urllib.parse.urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


class LiveHttpResolver:
    """One per Spark task (built by the factory's ``__call__``)."""

    def __init__(
        self,
        head_first: bool = True,
        head_timeout_s: float = 10.0,
        get_timeout_s: float = 30.0,
        max_body_bytes: int = 8 * 1024 * 1024,
    ):
        self.head_first = head_first
        self.head_timeout_s = head_timeout_s
        self.get_timeout_s = get_timeout_s
        self.max_body_bytes = max_body_bytes
        #: HttpConnUtils.domainsWithUnsupportedHeadMethod (task-local)
        self.head_unsupported: set[str] = set()
        #: HttpConnUtils.domainsWithUnsupportedAcceptLanguageParameter
        self.no_accept_language: set[str] = set()
        #: C3 — the reference keeps one CookieManager with policy
        #: ACCEPT_ORIGINAL_SERVER and clears it after every input batch
        #: (HttpClientUtils.java:13-23, LoaderAndChecker.java:471-474).
        #: Here the jar is task-local: a resolver lives for one Spark
        #: task of one round, so each round starts cookie-clean — the
        #: per-batch reset, by construction. ``clear_cookies`` exists
        #: for long-lived resolvers (streaming ingest).
        self.cookies = http.cookiejar.CookieJar(
            http.cookiejar.DefaultCookiePolicy()  # origin-server only
        )
        self._opener = urllib.request.build_opener(
            _NoRedirect,
            _NoHttpError,
            urllib.request.HTTPCookieProcessor(self.cookies),
        )
        # C6 cancel surface: the watchdog (plans/rounds.py) abandons the
        # daemon thread on budget overrun, but the socket read inside it
        # would keep running and keep the host's connection busy past
        # the politeness slot. Each worker thread registers its live
        # response here so cancel_inflight() can close the socket from
        # the outside — the blocked read errors out and the thread dies.
        import threading as _th

        self._inflight: dict[int, object] = {}
        self._inflight_lock = _th.Lock()

    def clear_cookies(self) -> None:
        """Per-batch cookie reset (LoaderAndChecker.java:471-474)."""
        self.cookies.clear()

    def cancel_inflight(self, ident: int | None = None) -> None:
        """Close the registered response socket(s) — for the C6 watchdog
        after a budget overrun (``ident`` = the abandoned thread's id),
        or all of them on task teardown."""
        with self._inflight_lock:
            items = (
                list(self._inflight.items()) if ident is None
                else [(ident, self._inflight.get(ident))]
            )
        for key, resp in items:
            if resp is None:
                continue
            try:
                resp.close()
            except Exception:  # noqa: BLE001
                pass
            with self._inflight_lock:
                self._inflight.pop(key, None)

    # -- one request, no ladder -------------------------------------------

    def _request(self, url: str, method: str, domain: str,
                 extra_headers: dict | None = None):
        headers = dict(BASE_HEADERS)
        headers["Accept-Encoding"] = _accept_encoding()
        if domain not in self.no_accept_language:
            headers["Accept-Language"] = ACCEPT_LANGUAGE
        if extra_headers:
            headers.update(extra_headers)
        req = urllib.request.Request(url, headers=headers, method=method)
        timeout = (
            self.head_timeout_s if method == "HEAD" else self.get_timeout_s
        )
        import threading as _th

        resp = self._opener.open(req, timeout=timeout)
        with self._inflight_lock:
            self._inflight[_th.get_ident()] = resp
        return resp

    # -- the ladder ---------------------------------------------------------

    def resolve(self, url: str) -> dict:
        import threading as _th

        try:
            return self._resolve(url)
        finally:
            # normal completion: drop this thread's cancel handle (the
            # response is already closed by the `with resp:` below)
            with self._inflight_lock:
                self._inflight.pop(_th.get_ident(), None)

    def resolve_conditional(
        self,
        url: str,
        etag: str | None = None,
        last_modified: str | None = None,
    ) -> dict:
        """Conditional revalidation GET (RFC 9110 §13.1): send the
        STORED validators as If-None-Match / If-Modified-Since; a 304
        answer means the stored payload is still fresh and NO body
        crossed the wire — the recrawl job keeps its copy and only
        refreshes the fetch timestamp. HEAD-first is skipped: for
        revalidation a conditional GET strictly dominates HEAD+GET
        (one round trip, body only when actually changed). The
        response's own 'etag'/'last_modified' keys carry the NEW
        validators to store. Beyond-reference: the reference fetches
        each URL once per run and has no revisit path."""
        import threading as _th

        extra: dict[str, str] = {}
        if etag:
            extra["If-None-Match"] = etag
        if last_modified:
            extra["If-Modified-Since"] = last_modified
        try:
            return self._resolve(url, extra_headers=extra or None,
                                 force_get=True)
        finally:
            with self._inflight_lock:
                self._inflight.pop(_th.get_ident(), None)

    def _resolve(self, url: str, extra_headers: dict | None = None,
                 force_get: bool = False) -> dict:
        domain = _domain_of(url)
        method = (
            "GET"
            if (force_get or not self.head_first
                or domain in self.head_unsupported)
            else "HEAD"
        )
        try:
            resp = self._request(url, method, domain, extra_headers)
            status = resp.status
            # 405/501 on HEAD: domain can't HEAD — remember + GET
            # (HttpConnUtils.java:433-450)
            if status in (405, 501) and method == "HEAD":
                self.head_unsupported.add(domain)
                resp.close()
                method = "GET"
                resp = self._request(url, method, domain, extra_headers)
                status = resp.status
            # 406: retry once without Accept-Language and remember
            # (HttpConnUtils.java:415-432)
            if status == 406 and domain not in self.no_accept_language:
                self.no_accept_language.add(domain)
                resp.close()
                resp = self._request(url, method, domain, extra_headers)
                status = resp.status
        except (TimeoutError, socket.timeout):
            return self._status_only(-1)  # conn_timeout (retryable)
        except urllib.error.URLError as e:
            reason = getattr(e, "reason", None)
            if isinstance(reason, (TimeoutError, socket.timeout)):
                return self._status_only(-1)
            if isinstance(reason, (socket.gaierror, ssl.SSLError)):
                # unknown host / SSL failure -> engine unknown_code ->
                # immediate domain block (HttpConnUtils.java:477-502)
                return self._status_only(0)
            return self._status_only(-1)  # conn refused etc: retryable
        except (ssl.SSLError, socket.gaierror):
            return self._status_only(0)
        except (ConnectionError, OSError):
            return self._status_only(-1)

        try:
            # HEAD told us it's an HTML page (or gave no type at all):
            # the page stage needs the BODY for link extraction, so
            # reconnect with GET — the reference's "downloadable
            # content" re-request (HttpConnUtils.java:371-395 connects
            # again with conn.setRequestMethod("GET") when the mime
            # needs the stream). Doc-like mimes (pdf etc.) stay
            # HEAD-only: their handling needs headers, not bytes.
            if method == "HEAD" and 200 <= status < 300:
                head_mime = (
                    (resp.headers.get("Content-Type") or "")
                    .split(";")[0].strip().lower()
                )
                if head_mime in ("text/html", "application/xhtml+xml", ""):
                    resp.close()
                    method = "GET"
                    resp = self._request(url, method, domain, extra_headers)
                    status = resp.status
        except (TimeoutError, socket.timeout):
            return self._status_only(-1)
        except urllib.error.URLError as e:
            reason = getattr(e, "reason", None)
            if isinstance(reason, (TimeoutError, socket.timeout)):
                return self._status_only(-1)
            if isinstance(reason, (socket.gaierror, ssl.SSLError)):
                return self._status_only(0)
            return self._status_only(-1)
        except (ssl.SSLError, socket.gaierror):
            return self._status_only(0)
        except (ConnectionError, OSError):
            return self._status_only(-1)

        oversize = False
        try:
            with resp:
                h = resp.headers
                location = h.get("Location")
                if location:
                    location = urllib.parse.urljoin(url, location)
                content_type = h.get("Content-Type")
                content_disposition = h.get("Content-Disposition")
                clen = h.get("Content-Length")
                content_length = int(clen) if clen and clen.isdigit() else 0
                body = b""
                if method == "GET" and 200 <= status < 300:
                    if content_length > self.max_body_bytes:
                        # N10 size guard BEFORE the read, like the
                        # reference's getContentSize "unacceptable
                        # size" abort — headers are kept, body dropped
                        oversize = True
                    else:
                        body = resp.read(self.max_body_bytes + 1)
                        if len(body) > self.max_body_bytes:
                            # no/wrong Content-Length: overflow found
                            # only by reading — do NOT hand a silently
                            # truncated body to the page stage
                            oversize, body = True, b""
                        else:
                            try:
                                decoded = decompress(
                                    body, h.get("Content-Encoding"),
                                    max_out=self.max_body_bytes,
                                )
                            except DecompressOverflow:
                                # compressed bytes fit but the inflated
                                # stream would not: same contract as the
                                # pre-read N10 guard
                                oversize, decoded = True, None
                            body = b"" if decoded is None else decoded
        except (TimeoutError, socket.timeout):
            # mid-body stall: the row must classify conn_timeout, not
            # crash the task (C6 contract)
            return self._status_only(-1)
        except Exception:  # noqa: BLE001
            # connection errors, IncompleteRead, and the ValueError/
            # AttributeError races of a response whose socket was closed
            # by cancel_inflight (C6 watchdog) mid-read — all map to the
            # retryable class; a body read must never crash the task
            return self._status_only(-1)
        mime = (content_type or "").split(";")[0].strip().lower()
        is_html = mime in ("text/html", "application/xhtml+xml") or (
            not mime
            and body.lstrip()[:15].lower().startswith((b"<html", b"<!doct"))
        )
        html_body = None
        body_kind = "other"
        if is_html:
            body_kind = "html"
            if body:
                html_body = body.decode("utf-8", errors="replace")
        elif mime.startswith("image/"):
            body_kind = "image"
        elif status >= 400 or status <= 0:
            body_kind = "error"
        if not content_length and body:
            content_length = len(body)
        if oversize and content_length <= self.max_body_bytes:
            # no usable Content-Length: surface the overflow so the
            # engine's oversize guard (N10) can still fire
            content_length = self.max_body_bytes + 1
        return {
            "status": status,
            "location": location,
            "content_type": content_type,
            "content_disposition": content_disposition,
            "content_length": content_length,
            "body_kind": body_kind,
            "image_id": None,  # live payloads carry no synthetic id
            "html_links": [],  # extraction happens in the page stage
            "html_body": html_body,
            "retry_after_ms": _retry_after_ms(h.get("Retry-After")),
            # cache validators for conditional revalidation on recrawl
            "etag": h.get("ETag"),
            "last_modified": h.get("Last-Modified"),
        }

    @staticmethod
    def _status_only(status: int) -> dict:
        return {
            "status": status, "location": None, "content_type": None,
            "content_disposition": None, "content_length": 0,
            "body_kind": "error", "image_id": None, "html_links": [],
            "html_body": None, "etag": None, "last_modified": None,
        }


class LiveHttpResolverFactory:
    """Picklable ``resolver_factory`` for CrawlEngine: attach to a web/
    config object as ``resolver_factory = lambda: LiveHttpResolverFactory(...)``
    — each task then builds one LiveHttpResolver and calls ``.resolve``."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __call__(self):
        return LiveHttpResolver(**self.kwargs).resolve
