"""Live-HTTP resolver ladder (N2/N4/N11/N12) against a local test
server: HEAD policy + 405 fallback + per-domain memory, 406
Accept-Language retry, gzip/deflate decompression, raw 3XX surfacing,
timeout/DNS error mapping. The engine stays on the synthetic resolver;
this proves the production swap-in (HttpConnUtils.java:310-519)."""

from __future__ import annotations

import gzip
import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from publicationsretriever_spark.sources.livehttp import (
    LiveHttpResolver,
    LiveHttpResolverFactory,
    decompress,
)

REQUESTS: list[tuple[str, str, dict]] = []  # (method, path, headers)


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def _record(self, method):
        REQUESTS.append((method, self.path, dict(self.headers)))

    def _send(self, status, headers=None, body=b""):
        self.send_response(status)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def do_HEAD(self):
        self._record("HEAD")
        if self.path.startswith("/pdf-no-head"):
            self._send(405)
        elif self.path.startswith("/pdf"):
            self._send(200, {"Content-Type": "application/pdf"})
        elif self.path.startswith("/lang406"):
            if "Accept-Language" in self.headers:
                self._send(406)
            else:
                self._send(200, {"Content-Type": "application/pdf"})
        elif self.path.startswith("/redir"):
            self._send(302, {"Location": "/pdf"})
        elif self.path.startswith("/throttle-huge"):
            self._send(429, {"Retry-After": "99999999"})
        elif self.path.startswith("/throttle-date"):
            from email.utils import formatdate
            import time as _t
            self._send(429, {"Retry-After": formatdate(_t.time() + 60, usegmt=True)})
        elif self.path.startswith("/throttle"):
            self._send(429, {"Retry-After": "2"})
        else:
            self._send(200, {"Content-Type": "text/html"})

    def do_GET(self):
        self._record("GET")
        if self.path.startswith("/html-gzip"):
            body = gzip.compress(b"<html><body>hello gz</body></html>")
            self._send(200, {"Content-Type": "text/html; charset=utf-8",
                             "Content-Encoding": "gzip"}, body)
        elif self.path.startswith("/html-deflate"):
            body = zlib.compress(b"<html><body>hello df</body></html>")
            self._send(200, {"Content-Type": "text/html",
                             "Content-Encoding": "deflate"}, body)
        elif self.path.startswith("/pdf-no-head"):
            self._send(200, {"Content-Type": "application/pdf",
                             "Content-Disposition": 'attachment; filename="x.pdf"'},
                       b"%PDF-fake")
        elif self.path.startswith("/setcookie"):
            self._send(
                200,
                {"Content-Type": "text/html", "Set-Cookie": "sid=abc123"},
                b"<html>cookie set</html>",
            )
        elif self.path.startswith("/slow"):
            import time
            time.sleep(3)
            self._send(200, {"Content-Type": "text/html"}, b"<html></html>")
        elif self.path.startswith("/bomb"):
            # ~64 MB of zeros gzips to ~64 KB: passes the compressed-size
            # guard, must be stopped by the decompressed-output cap
            body = gzip.compress(b"\0" * (64 * 1024 * 1024))
            self._send(200, {"Content-Type": "text/html",
                             "Content-Encoding": "gzip"}, body)
        elif self.path.startswith("/hang-body"):
            # headers sent, body never arrives: resp.read() blocks until
            # the socket is closed from the outside
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", "100")
            self.end_headers()
            import time
            time.sleep(30)
        elif self.path.startswith("/etag"):
            # conditional revalidation endpoint: version v2 is current
            if self.headers.get("If-None-Match") == '"v2"':
                self._send(304, {"ETag": '"v2"'})
            else:
                self._send(
                    200,
                    {"Content-Type": "text/html", "ETag": '"v2"',
                     "Last-Modified": "Wed, 19 Aug 2026 00:00:00 GMT"},
                    b"<html><body>fresh v2</body></html>",
                )
        else:
            self._send(200, {"Content-Type": "text/html"},
                       b"<html><body>plain</body></html>")


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    yield base
    srv.shutdown()


def test_head_first_then_get_only_when_needed(server):
    r = LiveHttpResolver()
    REQUESTS.clear()
    out = r.resolve(f"{server}/pdf")
    assert out["status"] == 200
    assert out["content_type"].startswith("application/pdf")
    assert [m for m, _p, _h in REQUESTS] == ["HEAD"]  # no body needed


def test_head_html_escalates_to_get_for_body(server):
    # an HTML page needs its BODY for link extraction: HEAD classifies,
    # then the resolver reconnects with GET (HttpConnUtils.java:371-395)
    r = LiveHttpResolver()
    REQUESTS.clear()
    out = r.resolve(f"{server}/plain")
    assert out["status"] == 200
    assert out["body_kind"] == "html"
    assert "plain" in (out["html_body"] or "")
    assert [m for m, _p, _h in REQUESTS] == ["HEAD", "GET"]


def test_oversize_body_is_dropped_not_truncated(server):
    r = LiveHttpResolver(head_first=False, max_body_bytes=10)
    out = r.resolve(f"{server}/plain")
    assert out["status"] == 200
    assert out["html_body"] is None  # never a silently cut document
    assert out["content_length"] > 10  # N10 guard can fire


def test_405_head_fallback_marks_domain(server):
    r = LiveHttpResolver()
    REQUESTS.clear()
    out = r.resolve(f"{server}/pdf-no-head")
    assert out["status"] == 200
    assert out["content_disposition"] is not None
    assert [m for m, _p, _h in REQUESTS] == ["HEAD", "GET"]
    # the domain is remembered: second call goes straight to GET
    REQUESTS.clear()
    out2 = r.resolve(f"{server}/pdf-no-head/2")
    assert out2["status"] == 200
    assert [m for m, _p, _h in REQUESTS] == ["GET"]


def test_406_retries_without_accept_language(server):
    r = LiveHttpResolver()
    REQUESTS.clear()
    out = r.resolve(f"{server}/lang406")
    assert out["status"] == 200
    methods = [(m, "Accept-Language" in h) for m, _p, h in REQUESTS]
    assert methods == [("HEAD", True), ("HEAD", False)]
    # remembered for the whole domain afterwards
    REQUESTS.clear()
    r.resolve(f"{server}/lang406")
    assert [(m, "Accept-Language" in h) for m, _p, h in REQUESTS] == [
        ("HEAD", False)
    ]


def test_gzip_and_deflate_bodies_are_decoded(server):
    r = LiveHttpResolver(head_first=False)
    out = r.resolve(f"{server}/html-gzip")
    assert out["body_kind"] == "html"
    assert "hello gz" in out["html_body"]
    out = r.resolve(f"{server}/html-deflate")
    assert "hello df" in out["html_body"]


def test_redirects_are_surfaced_not_followed(server):
    r = LiveHttpResolver()
    out = r.resolve(f"{server}/redir")
    assert out["status"] == 302
    assert out["location"].endswith("/pdf")  # absolutized


def test_timeout_maps_to_minus_one(server):
    r = LiveHttpResolver(head_first=False, get_timeout_s=0.5)
    out = r.resolve(f"{server}/slow")
    assert out["status"] == -1
    assert out["body_kind"] == "error"


def test_unknown_host_maps_to_unknown_code_block(server):
    r = LiveHttpResolver()
    out = r.resolve("http://no-such-host-xyz.invalid/x")
    assert out["status"] == 0  # engine: unknown_code -> domain block


def test_cookies_held_within_batch_and_cleared_on_reset(server):
    # C3: cookies accepted from the origin server, sent back on later
    # requests, and dropped by the per-batch reset
    # (LoaderAndChecker.java:471-474)
    r = LiveHttpResolver(head_first=False)
    r.resolve(f"{server}/setcookie")
    assert len(list(r.cookies)) == 1
    REQUESTS.clear()
    r.resolve(f"{server}/plain")
    assert any("sid=abc123" in h.get("Cookie", "") for _m, _p, h in REQUESTS)
    r.clear_cookies()
    assert len(list(r.cookies)) == 0
    REQUESTS.clear()
    r.resolve(f"{server}/plain")
    assert all("Cookie" not in h for _m, _p, h in REQUESTS)


def test_factory_is_picklable():
    import pickle

    f = LiveHttpResolverFactory(head_first=False, get_timeout_s=5)
    f2 = pickle.loads(pickle.dumps(f))
    assert callable(f2())


def test_decompress_edge_cases():
    assert decompress(b"abc", None) == b"abc"
    assert decompress(gzip.compress(b"x"), "gzip") == b"x"
    raw = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    body = raw.compress(b"y") + raw.flush()
    assert decompress(body, "deflate") == b"y"  # raw-deflate server
    assert decompress(b"garbage", "gzip") is None
    assert decompress(b"abc", "unsupported-enc") is None


def test_decompress_output_cap_stops_bombs():
    # ADVICE r3 (medium): the max_body_bytes cap used to apply to the
    # COMPRESSED bytes only — an 8 MB gzip bomb could inflate to GBs.
    # The output cap must stop the inflate without materializing the
    # whole stream.
    from publicationsretriever_spark.sources.livehttp import (
        DecompressOverflow,
    )

    bomb = gzip.compress(b"\0" * (32 * 1024 * 1024))  # ~32 KB compressed
    assert len(bomb) < 64 * 1024
    with pytest.raises(DecompressOverflow):
        decompress(bomb, "gzip", max_out=1024 * 1024)
    # same stream fits a big-enough cap
    assert len(decompress(bomb, "gzip", max_out=64 * 1024 * 1024)) == (
        32 * 1024 * 1024
    )
    # deflate path honors the cap too (both zlib- and raw-deflate)
    dbomb = zlib.compress(b"\0" * (8 * 1024 * 1024))
    with pytest.raises(DecompressOverflow):
        decompress(dbomb, "deflate", max_out=1024)
    # within-cap behavior unchanged
    assert decompress(gzip.compress(b"x"), "gzip", max_out=10) == b"x"


def test_gzip_bomb_is_classified_oversize(server):
    # resolver-level contract: bomb body -> headers kept, body dropped,
    # content_length surfaced above the cap so the N10 guard fires
    r = LiveHttpResolver(head_first=False, max_body_bytes=1024 * 1024)
    out = r.resolve(f"{server}/bomb")
    assert out["status"] == 200
    assert out["html_body"] is None
    assert out["content_length"] > 1024 * 1024


def test_cancel_inflight_unblocks_hung_read(server):
    # C6 (ADVICE r3 low): the watchdog abandons the daemon thread, but
    # the socket read kept running; cancel_inflight closes the socket so
    # the abandoned thread dies instead of holding the connection.
    import time

    r = LiveHttpResolver(head_first=False, get_timeout_s=60)
    box = {}

    def _call():
        box["out"] = r.resolve(f"{server}/hang-body")

    th = threading.Thread(target=_call, daemon=True)
    th.start()
    th.join(1.0)
    assert th.is_alive()  # genuinely hung mid-body
    r.cancel_inflight(th.ident)
    t0 = time.monotonic()
    th.join(5.0)
    assert not th.is_alive(), "socket close must unblock the hung read"
    assert time.monotonic() - t0 < 5.0
    # the interrupted read classifies as a retryable error, not a crash
    assert box["out"]["status"] in (-1, 200)


def test_retry_after_is_surfaced_and_capped(server):
    """Retry-After (delta-seconds and HTTP-date forms) is parsed into
    retry_after_ms on the response record, capped at one hour; absent
    header -> None. Beyond-reference: the reference only logs it
    (TODO at ConnSupportUtils.java:675-680)."""
    from publicationsretriever_spark.sources.livehttp import (
        MAX_RETRY_AFTER_MS,
        _retry_after_ms,
    )

    r = LiveHttpResolver(head_timeout_s=5.0, get_timeout_s=5.0)
    rec = r.resolve(f"{server}/throttle")
    assert rec["status"] == 429
    assert rec["retry_after_ms"] == 2000
    rec = r.resolve(f"{server}/throttle-huge")
    assert rec["retry_after_ms"] == MAX_RETRY_AFTER_MS
    rec = r.resolve(f"{server}/throttle-date")
    assert rec["retry_after_ms"] is not None
    assert 30_000 <= rec["retry_after_ms"] <= 61_000
    rec = r.resolve(f"{server}/pdf")
    assert rec["retry_after_ms"] is None
    # parser edge cases
    assert _retry_after_ms(None) is None
    assert _retry_after_ms("garbage") is None
    assert _retry_after_ms("0") is None  # non-positive -> ignore
    assert _retry_after_ms("Mon, 01 Jan 2001 00:00:00 GMT") is None  # past


def test_gzip_multi_member_decodes_all_members():
    # ADVICE r4 (low): RFC 1952 allows concatenated gzip members in one
    # body; gzip.decompress handled them, the first _zlib_stream cut
    # decoded only member 1. All members must decode, under one
    # cumulative cap.
    body = gzip.compress(b"alpha-") + gzip.compress(b"beta-") + gzip.compress(b"gamma")
    assert decompress(body, "gzip") == b"alpha-beta-gamma"
    # cumulative output cap spans members
    from publicationsretriever_spark.sources.livehttp import DecompressOverflow

    bomb2 = gzip.compress(b"\0" * 600_000) + gzip.compress(b"\0" * 600_000)
    with pytest.raises(DecompressOverflow):
        decompress(bomb2, "gzip", max_out=1_000_000)
    assert len(decompress(bomb2, "gzip", max_out=2_000_000)) == 1_200_000
    # trailing non-member garbage is ignored (browser behavior), and
    # single-member + deflate behavior is unchanged
    assert decompress(gzip.compress(b"x") + b"\0\0\0\0", "gzip") == b"x"
    assert decompress(zlib.compress(b"pq"), "deflate") == b"pq"


class _FakeRLEBrotliOld:
    """brotli<1.1-shaped binding: Decompressor().process(data) with NO
    output limit. 'Compressed' format: each input byte b expands to
    bytes([b]) * 1000 — a 1000x bomb. Records the largest single chunk
    it ever materialized so the test can bound the overshoot."""

    max_chunk = 0

    class Decompressor:
        def process(self, data):
            out = b"".join(bytes([b]) * 1000 for b in data)
            _FakeRLEBrotliOld.max_chunk = max(_FakeRLEBrotliOld.max_chunk, len(out))
            return out


class _FakeRLEBrotliNew:
    """brotli>=1.1-shaped binding: process(data, output_buffer_limit=n)
    + can_accept_more_data(); un-emitted output stays buffered."""

    class Decompressor:
        def __init__(self):
            self._buf = bytearray()

        def process(self, data, output_buffer_limit=None):
            self._buf += b"".join(bytes([b]) * 1000 for b in data)
            if output_buffer_limit is None:
                out, self._buf = bytes(self._buf), bytearray()
                return out
            out = bytes(self._buf[:output_buffer_limit])
            del self._buf[:output_buffer_limit]
            return out

        def can_accept_more_data(self):
            return not self._buf


def test_brotli_output_cap_old_binding(monkeypatch):
    # ADVICE r4 (medium): a binding without an output limit must be fed
    # tiny chunks so one process() call can't materialize the stream.
    from publicationsretriever_spark.sources import livehttp

    monkeypatch.setattr(livehttp, "_brotli", _FakeRLEBrotliOld)
    _FakeRLEBrotliOld.max_chunk = 0
    bomb = b"\x41" * 100_000  # 100 KB 'compressed' -> 100 MB inflated
    with pytest.raises(livehttp.DecompressOverflow):
        livehttp.decompress(bomb, "br", max_out=1_000_000)
    # overshoot bounded by ONE feed chunk's expansion, not the stream
    assert _FakeRLEBrotliOld.max_chunk <= livehttp._BR_FEED_CHUNK * 1000
    # within-cap round trip still works
    assert livehttp.decompress(b"\x42", "br", max_out=10_000) == b"\x42" * 1000


def test_brotli_output_cap_new_binding(monkeypatch):
    from publicationsretriever_spark.sources import livehttp

    monkeypatch.setattr(livehttp, "_brotli", _FakeRLEBrotliNew)
    bomb = b"\x41" * 100_000
    with pytest.raises(livehttp.DecompressOverflow):
        livehttp.decompress(bomb, "br", max_out=1_000_000)
    got = livehttp.decompress(b"\x42\x43", "br", max_out=10_000)
    assert got == b"\x42" * 1000 + b"\x43" * 1000
    # exact-cap boundary: 2000 bytes out, cap 2000 -> fits
    assert len(livehttp.decompress(b"\x42\x43", "br", max_out=2000)) == 2000
    with pytest.raises(livehttp.DecompressOverflow):
        livehttp.decompress(b"\x42\x43", "br", max_out=1999)


class _FakeZstd:
    """zstandard-shaped binding: stream_reader with RLE x1000 decode;
    bodies starting with b'CORRUPT' raise ZstdError mid-stream with the
    frame-header message ADVICE r4 showed being misclassified."""

    class ZstdError(Exception):
        pass

    class ZstdDecompressor:
        def stream_reader(self, fobj):
            return _FakeZstd._Reader(fobj.read())

    class _Reader:
        def __init__(self, body):
            self._corrupt = body.startswith(b"CORRUPT")
            self._buf = b"" if self._corrupt else b"".join(
                bytes([b]) * 1000 for b in body
            )
            self._pos = 0

        def read(self, n):
            if self._corrupt:
                raise _FakeZstd.ZstdError(
                    "zstd decompress error: error determining content size "
                    "from frame header"
                )
            out = self._buf[self._pos : self._pos + n]
            self._pos += len(out)
            return out


def test_zstd_corrupt_vs_overflow(monkeypatch):
    # ADVICE r4 (low): overflow is decided by byte count, corrupt
    # frames (any ZstdError) take the drop path -> None, never
    # DecompressOverflow.
    from publicationsretriever_spark.sources import livehttp

    monkeypatch.setattr(livehttp, "_zstd", _FakeZstd)
    assert livehttp.decompress(b"CORRUPT-frame", "zstd", max_out=1000) is None
    with pytest.raises(livehttp.DecompressOverflow):
        livehttp.decompress(b"\x41" * 10_000, "zstd", max_out=1_000_000)
    assert livehttp.decompress(b"\x41", "zstd", max_out=2000) == b"\x41" * 1000


def test_conditional_revalidation_304_and_validator_capture(server):
    """resolve_conditional sends If-None-Match/If-Modified-Since and
    surfaces 304 without a body; a plain resolve captures the
    response's ETag/Last-Modified so the catalog can store them.
    Beyond-reference: the reference has no revisit path."""
    r = LiveHttpResolver(head_timeout_s=5.0, get_timeout_s=5.0)
    REQUESTS.clear()
    # first contact: normal resolve captures validators
    rec = r.resolve(f"{server}/etag")
    assert rec["status"] == 200
    assert rec["etag"] == '"v2"'
    assert rec["last_modified"] == "Wed, 19 Aug 2026 00:00:00 GMT"
    assert rec["html_body"] and "fresh v2" in rec["html_body"]
    # revalidation with the stored validator: 304, no body read
    REQUESTS.clear()
    rec2 = r.resolve_conditional(
        f"{server}/etag", etag=rec["etag"],
        last_modified=rec["last_modified"],
    )
    assert rec2["status"] == 304
    assert rec2["html_body"] is None
    assert rec2["etag"] == '"v2"'
    # one conditional GET, never a HEAD, validators on the wire
    assert [m for m, _, _ in REQUESTS] == ["GET"]
    hdrs = REQUESTS[0][2]
    assert hdrs.get("If-None-Match") == '"v2"'
    assert hdrs.get("If-Modified-Since") == "Wed, 19 Aug 2026 00:00:00 GMT"
    # stale validator: full 200 body comes back
    rec3 = r.resolve_conditional(f"{server}/etag", etag='"v1"')
    assert rec3["status"] == 200
    assert rec3["html_body"] and "fresh v2" in rec3["html_body"]
