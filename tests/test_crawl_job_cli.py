"""Job-level CLI coverage: --input-url feeds the crawl from a remote
JSON-lines seed list (reference -inputDataUrl,
util/args/ArgsUtils.java:103-107) while the synthetic web remains the
fetch surface."""

from __future__ import annotations

import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb


def test_crawl_job_input_url(spark, tmp_path, monkeypatch, capsys):
    # serve two REAL synthetic-web page urls as the remote seed list
    web = SyntheticWeb(seed=42, n_hosts=3, pages_per_host_max=6)
    chosen = [(sid, url) for sid, url in web.seeds[:2]]
    payload = "".join(
        json.dumps({"id": sid, "url": url}) + "\n" for sid, url in chosen
    ).encode()

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        import jobs.crawl_job as job

        monkeypatch.setattr(
            sys,
            "argv",
            [
                "crawl_job.py",
                "--catalog", str(tmp_path / "cat"),
                "--rounds", "1",
                "--hosts", "3",
                "--pages-max", "6",
                "--input-url",
                f"http://127.0.0.1:{srv.server_port}/seeds.json",
            ],
        )
        assert job.main() == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # only the two remote seeds were crawled, not the 10+ web seeds
        assert summary["rounds_run"] == 1
        assert 0 < summary["results_total"] <= 2
    finally:
        srv.shutdown()
