"""Web-scale FUNCTIONAL synthetic web for benchmark runs.

`sources/synthetic_web.SyntheticWeb` materializes every response in a
driver-side dict (broadcast to executors) — perfect for hermetic
conformance tests, but it caps bench scale at the broadcast size. This
variant recomputes each response FROM THE URL executor-side (everything
derives from crc32(seed, url)), so a crawl over millions of pages ships
nothing but a tiny picklable factory — the same `resolver_factory()`
hook a production deployment uses to plug in a live HTTP client
(plans/rounds.CrawlEngine).

Same response-kind mix as SyntheticWeb (healthy HTML with doc + trap
links, meta citation_pdf_url, redirects, 404/503, direct images with
content-disposition, header-less pages, trap-only pages), hermetic and
deterministic. Image payloads come from a small deterministic pool so
the per-row payload invariant (decode + phash) stays verifiable at any
crawl size.
"""

from __future__ import annotations

import sys
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from publicationsretriever_spark.sources.imagecodec import make_payload_row  # noqa: E402


def _kind(seed: int, url: str) -> int:
    return zlib.crc32(f"{seed}:{url}".encode()) % 10


class FunctionalResolver:
    """Picklable url->response function factory. Ships only scalar
    params + the payload pool's byte-lengths (not the bytes)."""

    def __init__(self, n_hosts: int, pages_per_host: int, pool_lens: list[int], seed: int):
        self.n_hosts = n_hosts
        self.pages_per_host = pages_per_host
        self.pool_lens = pool_lens
        self.seed = seed

    def __call__(self):
        import re

        page_re = re.compile(r"^https://host(\d+)\.example(\d)\.org/article/(\d+)$")
        doc_re = re.compile(r"^https://host(\d+)\.example(\d)\.org/files/(\d+)/fulltext\.pdf$")
        n_hosts, pages, pool_lens, seed = (
            self.n_hosts, self.pages_per_host, self.pool_lens, self.seed
        )
        npool = len(pool_lens)

        not_found = {
            "status": 404, "location": None, "content_type": None,
            "content_disposition": None, "content_length": 0,
            "body_kind": "error", "image_id": None, "html_links": [],
        }

        def image_resp(hi: int, pi: int) -> dict:
            j = (hi * 131 + pi) % npool
            return {
                "status": 200, "location": None, "content_type": "image/png",
                "content_disposition": None, "content_length": pool_lens[j],
                "body_kind": "image", "image_id": f"img-{j}", "html_links": [],
            }

        def resolve(url: str) -> dict:
            m = doc_re.match(url)
            if m:
                hi, dom, pi = int(m.group(1)), int(m.group(2)), int(m.group(3))
                if hi >= n_hosts or dom != hi % 3:
                    return not_found
                return image_resp(hi, pi)
            m = page_re.match(url)
            if not m:
                return not_found
            hi, dom, pi = int(m.group(1)), int(m.group(2)), int(m.group(3))
            if hi >= n_hosts or dom != hi % 3 or pi >= pages:
                return not_found
            host = f"host{hi}.example{dom}.org"
            kind = _kind(seed, url)
            doc_url = f"https://{host}/files/{pi}/fulltext.pdf"
            if kind < 5:
                meta = (
                    f'<meta name="citation_pdf_url" content="{doc_url}"/>'
                    if kind == 0 else ""
                )
                sibling = f"https://{host}/article/{(pi + 1) % pages}"
                body = (
                    f"<html><head>{meta}</head><body>\n"
                    f'<div class="content">\n'
                    f'  <a href="/files/{pi}/fulltext.pdf">view item {pi}</a>\n'
                    f'  <a href="{sibling}">related item</a>\n'
                    f'  <a href="/article/{pi}/citation?format=ris">export citation</a>\n'
                    f'  <a href="mailto:editor@{host}">mail</a>\n'
                    f"</div>\n"
                    f'<div class="breadcrumb"><a href="/home-page">home</a></div>\n'
                    f'<footer><a href="/about">about</a></footer>\n'
                    f"</body></html>"
                )
                # kind 4: header-less page -> engine must body-sniff (N8)
                ctype = None if kind == 4 else "text/html; charset=utf-8"
                return {
                    "status": 200, "location": None, "content_type": ctype,
                    "content_disposition": None, "content_length": len(body),
                    "body_kind": "html", "image_id": None, "html_links": [],
                    "html_body": body,
                }
            if kind == 5:
                return {
                    "status": 302, "location": doc_url, "content_type": None,
                    "content_disposition": None, "content_length": 0,
                    "body_kind": "redirect", "image_id": None, "html_links": [],
                }
            if kind == 6:
                return not_found
            if kind == 7:
                return {
                    "status": 503, "location": None, "content_type": None,
                    "content_disposition": None, "content_length": 0,
                    "body_kind": "error", "image_id": None, "html_links": [],
                }
            if kind == 8:
                r = image_resp(hi, pi)
                r["content_type"] = "application/octet-stream"
                r["content_disposition"] = f'attachment; filename="{r["image_id"]}.png"'
                return r
            body = (
                f"<html><body>\n"
                f'<a href="https://{host}/login">login</a>\n'
                f'<a href="https://www.facebook.com/{host}">share</a>\n'
                f'<a href="javascript:void(0)">open</a>\n'
                f"</body></html>"
            )
            return {
                "status": 200, "location": None, "content_type": "text/html",
                "content_disposition": None, "content_length": len(body),
                "body_kind": "html", "image_id": None, "html_links": [],
                "html_body": body,
            }

        return resolve


class BigWeb:
    """Millions-of-pages hermetic web with a functional fetch surface."""

    def __init__(self, n_hosts: int, pages_per_host: int, payload_pool: int = 1000, seed: int = 42):
        self.n_hosts = n_hosts
        self.pages_per_host = pages_per_host
        self.seed = seed
        self.pool = [make_payload_row(f"img-{j}") for j in range(payload_pool)]

    def resolver_factory(self) -> FunctionalResolver:
        return FunctionalResolver(
            self.n_hosts, self.pages_per_host,
            [len(p["bytes"]) for p in self.pool], self.seed,
        )

    def seeds_df(self, spark):
        """JVM-side seed generation — no driver-side URL list at any scale."""
        from pyspark.sql import functions as F

        n = self.n_hosts * self.pages_per_host
        df = spark.range(0, n, 1, None)
        hi = (F.col("id") / self.pages_per_host).cast("long")
        pi = F.pmod(F.col("id"), F.lit(self.pages_per_host))
        host = F.concat(
            F.lit("host"), hi, F.lit(".example"), F.pmod(hi, F.lit(3)), F.lit(".org")
        )
        return df.select(
            F.concat(host, F.lit("::"), pi).alias("id"),
            F.col("id").alias("order_in_id"),
            F.concat(F.lit("https://"), host, F.lit("/article/"), pi).alias("url"),
        )

    def robots_df(self, spark):
        rows = []
        for hi in range(self.n_hosts):
            rules = ["/private/"]
            if hi % 7 == 3:
                rules.append("/article/9")
            rows.append((f"host{hi}.example{hi % 3}.org", rules))
        return spark.createDataFrame(rows, "domain string, disallow array<string>")

    def payloads_df(self, spark):
        rows = [
            (p["image_id"], bytearray(p["bytes"]), p["w"], p["h"], p["fmt"],
             p["caption"], p["phash"])
            for p in self.pool
        ]
        return spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )
