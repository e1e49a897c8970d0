"""Deterministic synthetic web — the hermetic replacement for live HTTP.

The reference's fetch surface (HttpConnUtils.connectAndCheckMimeType,
util/http/HttpConnUtils.java:114-270) is replaced by a generated,
seed-deterministic host graph:

- hosts with zipfian URL counts (a few hot hosts + long tail) to
  exercise politeness serialization and salting/skew handling,
- landing pages with internal links (doc links, trap links, footer
  noise, javascript: links, dynamic '{{' links),
- redirect chains (incl. >7 hops to hit the page-redirect cap,
  HttpConnUtils.java:68),
- error injections (403/404/429/5XX/timeout),
- image payloads (image+caption rows per BASELINE.json input_hint).

Everything derives from (seed, url) hashes — no RNG state threading, so
any row can be recomputed anywhere (executors, oracle, tests).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from .imagecodec import make_payload_row


def _h(s: str, seed: int = 42) -> int:
    return int.from_bytes(
        hashlib.sha256(f"{seed}:{s}".encode()).digest()[:8], "big"
    )


@dataclass
class SyntheticWeb:
    """A generated host graph. ``resolve(url)`` is the fetch oracle."""

    seed: int = 42
    n_hosts: int = 20
    pages_per_host_max: int = 30  # zipf-ish: host i gets max/(i+1) pages
    responses: dict[str, dict] = field(default_factory=dict)
    payloads: dict[str, dict] = field(default_factory=dict)
    seeds: list[tuple[str, str]] = field(default_factory=list)
    robots: dict[str, list[str]] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self._build()

    # -- construction ------------------------------------------------------

    def _host(self, i: int) -> str:
        return f"host{i}.example{i % 3}.org"

    def _build(self) -> None:
        for hi in range(self.n_hosts):
            host = self._host(hi)
            # deterministic robots.txt: EVERY host disallows /private/;
            # hosts with hi % 7 == 3 also disallow their own LAST
            # article — a real existing page, so the pre-fetch robots
            # gate provably blocks live content (north rule; the
            # reference has NO robots handling, SURVEY.md §2.6 note).
            # The first cut hardcoded '/article/9', which no hi%7==3
            # host ever had under default sizes — a dead rule.
            n_pages = max(1, self.pages_per_host_max // (hi + 1))
            rules = ["/private/"]
            if hi % 7 == 3:
                rules.append(f"/article/{n_pages - 1}")
            self.robots[host] = rules
            for pi in range(n_pages):
                self._build_page(host, hi, pi, n_pages)
        # a redirect chain that exceeds the 7-hop cap (HttpConnUtils.java:68)
        deep = [f"https://host0.example0.org/chain/{i}" for i in range(9)]
        for i, u in enumerate(deep[:-1]):
            self.responses[u] = {
                "status": 301, "location": deep[i + 1], "content_type": None,
                "content_disposition": None, "content_length": 0,
                "body_kind": "redirect", "image_id": None, "html_links": [],
            }
        self.responses[deep[-1]] = self._image_response("chain-end")
        self.seeds.append(("chain::0001", deep[0]))
        # an HTTP-300 multiple-choices page with NO Location header: the
        # proposed link sits in the html body and the hop loop must
        # extract the first acceptable internal link and continue
        # (ConnSupportUtils.getInternalLinkFromHTTP300Page,
        # util/http/ConnSupportUtils.java:608-627)
        mc_url = "https://host0.example0.org/choices/1"
        mc_doc = "https://host0.example0.org/files/choices1/fulltext.pdf"
        mc_body = (
            "<html><body><ul>"
            f'<li><a href="/files/choices1/fulltext.pdf">variant a</a></li>'
            f'<li><a href="/files/choices1/fulltext.de.pdf">variant b</a></li>'
            "</ul></body></html>"
        )
        self.responses[mc_url] = {
            "status": 300, "location": None, "content_type": "text/html",
            "content_disposition": None, "content_length": len(mc_body),
            "body_kind": "html", "image_id": None,
            "html_links": [mc_doc], "html_body": mc_body,
        }
        self.responses[mc_doc] = self._image_response("choices-1")
        self.seeds.append(("choices::0001", mc_url))
        # handle.net 500-where-404-is-meant, placement check (VERDICT
        # r4 item 8; ConnSupportUtils.onErrorStatusCode :642-645 runs
        # per CONNECTION): (a) a normal-host seed 301s INTO
        # hdl.handle.net which 500s -> the remap applies (erroring
        # connection's domain contains handle.net); (b) a chain that
        # passes THROUGH handle.net (301) and dies 500 on a normal
        # host -> no remap (the erroring connection is the normal
        # host; handle.net only ever 3XXed, which never reaches
        # onErrorStatusCode).
        _rd = {
            "status": 301, "content_type": None,
            "content_disposition": None, "content_length": 0,
            "body_kind": "redirect", "image_id": None, "html_links": [],
        }
        hdl_in_seed = "https://host0.example0.org/hdl-in/1"
        hdl_in_hop = "https://hdl.handle.net/10655/10123"
        self.responses[hdl_in_seed] = {**_rd, "location": hdl_in_hop}
        self.responses[hdl_in_hop] = {
            "status": 500, "location": None, "content_type": None,
            "content_disposition": None, "content_length": 0,
            "body_kind": "error", "image_id": None, "html_links": [],
        }
        self.seeds.append(("hdlin::0001", hdl_in_seed))
        hdl_out_seed = "https://host0.example0.org/hdl-out/1"
        hdl_out_hop = "https://hdl.handle.net/20/500x"
        hdl_out_end = "https://host1.example1.org/broken/1"
        self.responses[hdl_out_seed] = {**_rd, "location": hdl_out_hop}
        self.responses[hdl_out_hop] = {**_rd, "location": hdl_out_end}
        self.responses[hdl_out_end] = {
            "status": 500, "location": None, "content_type": None,
            "content_disposition": None, "content_length": 0,
            "body_kind": "error", "image_id": None, "html_links": [],
        }
        self.seeds.append(("hdlout::0001", hdl_out_seed))

    def _image_response(self, image_id: str) -> dict:
        if image_id not in self.payloads:
            self.payloads[image_id] = make_payload_row(image_id)
        data = self.payloads[image_id]
        return {
            "status": 200, "location": None, "content_type": "image/png",
            "content_disposition": None, "content_length": len(data["bytes"]),
            "body_kind": "image", "image_id": image_id, "html_links": [],
        }

    def _build_page(self, host: str, hi: int, pi: int,
                    n_pages: int) -> None:
        page_url = f"https://{host}/article/{pi}"
        rv = _h(page_url, self.seed)
        image_id = f"img-{hi}-{pi}"
        doc_url = f"https://{host}/files/{pi}/fulltext.pdf"  # F1 match
        kind = rv % 10

        if kind < 5:
            # healthy page -> real HTML with one doc link + noise traps;
            # kind 0 additionally carries a meta citation_pdf_url (G5).
            meta = (
                f'<meta name="citation_pdf_url" content="{doc_url}"/>'
                if kind == 0
                else ""
            )
            # wraparound sibling: the last page links back to article 0
            # (the old '(pi + 1) % (pi + 2)' was a no-op that sent the
            # last page to a nonexistent article)
            sibling = f"https://{host}/article/{(pi + 1) % n_pages}"
            body = f"""<html><head>{meta}</head><body>
<div class="content">
  <a href="/files/{pi}/fulltext.pdf">view item {pi}</a>
  <a href="{sibling}">related item</a>
  <a href="/article/{pi}/citation?format=ris">export citation</a>
  <a href="mailto:editor@{host}">mail</a>
</div>
<div class="breadcrumb"><a href="/home-page">home</a></div>
<footer><a href="/about">about</a></footer>
</body></html>"""
            links = [
                doc_url,
                f"https://{host}/about",                       # F3 reject
                f"https://{host}/article/{pi}/citation?format=ris",  # F10 reject
                f"mailto:editor@{host}",                       # F12 reject
                sibling,                                       # sibling page
            ]
            self.responses[page_url] = {
                "status": 200, "location": None,
                "content_type": "text/html; charset=utf-8",
                "content_disposition": None, "content_length": len(body),
                "body_kind": "html", "image_id": None, "html_links": links,
                "html_body": body,
            }
            self.responses[doc_url] = self._image_response(image_id)
        elif kind == 5:
            # redirect to doc
            self.responses[page_url] = {
                "status": 302, "location": doc_url, "content_type": None,
                "content_disposition": None, "content_length": 0,
                "body_kind": "redirect", "image_id": None, "html_links": [],
            }
            self.responses[doc_url] = self._image_response(image_id)
        elif kind == 6:
            self.responses[page_url] = {
                "status": 404, "location": None, "content_type": None,
                "content_disposition": None, "content_length": 0,
                "body_kind": "error", "image_id": None, "html_links": [],
            }
        elif kind == 7:
            self.responses[page_url] = {
                "status": 503, "location": None, "content_type": None,
                "content_disposition": None, "content_length": 0,
                "body_kind": "error", "image_id": None, "html_links": [],
            }
        elif kind == 8:
            # direct image with octet-stream + disposition (N9 possible-path)
            resp = self._image_response(image_id)
            resp["content_type"] = "application/octet-stream"
            resp["content_disposition"] = f'attachment; filename="{image_id}.png"'
            self.responses[page_url] = resp
        elif kind == 9 and pi % 3 == 0:
            # header-less html page (N8 body-sniff path,
            # ConnSupportUtils.detectContentTypeFromResponseBody :1171-1229)
            body = f"""<html><body><div>
<a href="/files/{pi}/fulltext.pdf">view item {pi}</a>
</div></body></html>"""
            self.responses[page_url] = {
                "status": 200, "location": None, "content_type": None,
                "content_disposition": None, "content_length": len(body),
                "body_kind": "html", "image_id": None,
                "html_links": [doc_url], "html_body": body,
            }
            self.responses[doc_url] = self._image_response(image_id)
        elif kind == 9 and pi % 3 == 1:
            # oversize html (N10 guard, HttpConnUtils.java:74)
            self.responses[page_url] = {
                "status": 200, "location": None, "content_type": "text/html",
                "content_disposition": None, "content_length": 6 * 1024 * 1024,
                "body_kind": "html", "image_id": None,
                "html_links": [], "html_body": "<html><body>huge</body></html>",
            }
        else:
            # page with only trap links -> no doc found
            body = f"""<html><body>
<a href="https://{host}/login">login</a>
<a href="https://www.facebook.com/{host}">share</a>
<a href="javascript:void(0)">open</a>
</body></html>"""
            self.responses[page_url] = {
                "status": 200, "location": None, "content_type": "text/html",
                "content_disposition": None, "content_length": len(body),
                "body_kind": "html", "image_id": None,
                "html_links": [
                    f"https://{host}/login",
                    f"https://www.facebook.com/{host}",
                    "javascript:void(0)",
                ],
                "html_body": body,
            }
        self.seeds.append((f"{host}::{pi:04d}", page_url))

    # -- oracle interface ---------------------------------------------------

    def resolve(self, url: str) -> dict:
        """Fetch oracle: response record or a synthetic 404."""
        return self.responses.get(
            url,
            {
                "status": 404, "location": None, "content_type": None,
                "content_disposition": None, "content_length": 0,
                "body_kind": "error", "image_id": None, "html_links": [],
            },
        )

    # -- DataFrame exports ----------------------------------------------------

    def seeds_df(self, spark):
        rows = [(sid, n, u) for n, (sid, u) in enumerate(self.seeds)]
        return spark.createDataFrame(rows, ["id", "order_in_id", "url"])

    def responses_df(self, spark):
        rows = [
            (u, r["status"], r["location"], r["content_type"],
             r["content_disposition"], r["content_length"], r["body_kind"],
             r["image_id"], r["html_links"])
            for u, r in sorted(self.responses.items())
        ]
        return spark.createDataFrame(
            rows,
            "url string, status int, location string, content_type string, "
            "content_disposition string, content_length long, body_kind string, "
            "image_id string, html_links array<string>",
        )

    def robots_df(self, spark):
        rows = [(h, rules) for h, rules in sorted(self.robots.items())]
        return spark.createDataFrame(rows, "domain string, disallow array<string>")

    def payloads_df(self, spark):
        rows = [
            (p["image_id"], bytearray(p["bytes"]), p["w"], p["h"], p["fmt"],
             p["caption"], p["phash"])
            for p in sorted(self.payloads.values(), key=lambda p: p["image_id"])
        ]
        return spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )
