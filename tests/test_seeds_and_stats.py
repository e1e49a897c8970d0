"""Tests for S1/S2 seed readers and A5-A7 stats/report operators."""

from __future__ import annotations

from publicationsretriever_spark.plans.stats import (
    crawl_report,
    domains_by_hits,
    reject_reason_report,
    should_check_remaining_links,
)
from publicationsretriever_spark.sources.seeds import (
    read_id_url_pairs,
    read_plain_urls,
)


def test_read_id_url_pairs(spark, tmp_path):
    p = tmp_path / "seeds.json"
    p.write_text(
        '{"id":"a","url":"https://x.org/1"}\n'
        '{"id":"a","url":"https://x.org/2"}\n'
        '{"id":"a","url":"https://x.org/1"}\n'  # duplicate pair
        '{"id":"b","url":"https://y.org/1"}\n'
    )
    rows = read_id_url_pairs(spark, str(p)).orderBy("order_in_id").collect()
    assert [r["url"] for r in rows] == [
        "https://x.org/1", "https://x.org/2", "https://x.org/1", "https://y.org/1",
    ]
    assert [r["is_duplicate_pair"] for r in rows] == [False, False, True, False]


def test_read_id_url_pairs_from_url(spark):
    # S3: serve the same JSON-lines over local HTTP (gzip-encoded) and
    # check mime gate + parse parity with S1
    import gzip
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from publicationsretriever_spark.sources.seeds import (
        read_id_url_pairs_from_url,
    )

    payload = (
        b'{"id":"a","url":"https://x.org/1"}\n'
        b'{"id":"a","url":"https://x.org/1"}\n'
        b"not json at all\n"
        b'{"id":"b","url":"https://y.org/1"}\n'
    )

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/seeds.json":
                body = gzip.compress(payload)
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:  # wrong mime
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", "0")
                self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        rows = (
            read_id_url_pairs_from_url(spark, f"{base}/seeds.json")
            .orderBy("order_in_id")
            .collect()
        )
        assert [r["url"] for r in rows] == [
            "https://x.org/1", "https://x.org/1", "https://y.org/1",
        ]  # bad JSON line skipped, duplicates kept
        assert [r["is_duplicate_pair"] for r in rows] == [False, True, False]
        import pytest as _pytest

        with _pytest.raises(ValueError, match="non-json"):
            read_id_url_pairs_from_url(spark, f"{base}/not-json")
    finally:
        srv.shutdown()


def test_read_from_url_caps_decompressed_size(spark):
    # ADVICE r3: a gzip'd inputDataUrl must not inflate past max_bytes
    # on the driver — the cap applies to the DECOMPRESSED bytes too
    import gzip
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pytest

    from publicationsretriever_spark.sources.seeds import (
        read_id_url_pairs_from_url,
    )

    bomb = gzip.compress(
        b'{"id":"a","url":"https://x.org/1"}\n' * 200_000
    )  # ~7 MB decompressed, ~ tens of KB compressed

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(bomb)))
            self.end_headers()
            self.wfile.write(bomb)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        with pytest.raises(ValueError, match="decompressed body exceeds"):
            read_id_url_pairs_from_url(
                spark,
                f"http://127.0.0.1:{srv.server_port}/seeds.json",
                max_bytes=1024 * 1024,
            )
    finally:
        srv.shutdown()


def test_seed_order_multi_partition_no_single_partition_exchange(
    spark, tmp_path
):
    """The order_in_id assignment must (a) match the old global-window
    semantics exactly on a multi-partition read and (b) contain NO
    single-partition exchange in the plan (the 10^10-seed scale-killer
    from VERDICT r3)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = tmp_path / "seeds"
    d.mkdir()
    n_files, rows_per_file = 4, 50
    for f in range(n_files):
        (d / f"part-{f}.json").write_text(
            "".join(
                f'{{"id":"id{f}_{i}","url":"https://h{f}.org/p{i}"}}\n'
                for i in range(rows_per_file)
            )
        )
    from publicationsretriever_spark.sources.seeds import ID_URL_SCHEMA

    # force a genuinely multi-partition scan (tiny files normally get
    # bin-packed into one task)
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        scan = spark.read.schema(ID_URL_SCHEMA).json(str(d))
        assert scan.rdd.getNumPartitions() > 1
        df = read_id_url_pairs(spark, str(d))
        # (a) equivalence with the old global window on the same scan
        old = scan.withColumn(
            "order_in_id",
            F.row_number().over(
                Window.orderBy(F.monotonically_increasing_id())
            )
            - 1,
        )
        got = {r["id"]: r["order_in_id"] for r in df.collect()}
        want = {r["id"]: r["order_in_id"] for r in old.collect()}
        assert got == want
        assert sorted(got.values()) == list(range(n_files * rows_per_file))
        # (b) no single-partition exchange anywhere in the physical plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def test_read_plain_urls(spark, tmp_path):
    p = tmp_path / "urls.csv"
    p.write_text('url\n"https://x.org/1"\nhttps://y.org/2\n\n')
    rows = read_plain_urls(spark, str(p), skip_first_row=True).orderBy(
        "order_in_id"
    ).collect()
    assert [r["url"] for r in rows] == ["https://x.org/1", "https://y.org/2"]
    assert all(r["id"] is None for r in rows)


def _results_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "id string, sourceUrl string, pageUrl string, docOrDatasetUrl string, "
        "couldRetry string, error string",
    )


def test_crawl_report_and_reasons(spark):
    rows = [
        ("a", "https://x.org/1", "https://x.org/1", "https://x.org/d.pdf", "true", None),
        ("b", "https://x.org/2", "null", "duplicate", "true", "duplicate url"),
        ("c", "https://y.org/3", "null", "unreachable", "false", "Discarded: plain_domain"),
        ("d", "https://y.org/4", "null", "unreachable", "false", "Discarded: plain_domain"),
    ]
    df = _results_df(spark, rows)
    rep = {r["metric"]: r["value"] for r in crawl_report(df).collect()}
    assert rep["total_records"] == 4
    assert rep["doc_or_dataset_urls_found"] == 1
    assert rep["doc_url_rate_pct"] == 25.0
    reasons = {r["error"]: r["n"] for r in reject_reason_report(df).collect()}
    assert reasons["Discarded: plain_domain"] == 2
    doms = domains_by_hits(df).collect()
    assert doms[0]["times"] == 2


def test_remaining_links_kill_switch(spark):
    # fewer than MIN_EVALUATIONS internal fetches -> stay enabled
    few = _results_df(
        spark,
        [("a", "https://x.org/p", "https://x.org/other", "unreachable", "false", "x")] * 5,
    )
    assert should_check_remaining_links(few) is True
    # many internal fetches, zero hits -> disable
    many = _results_df(
        spark,
        [("a", "https://x.org/p", "https://x.org/other", "unreachable", "false", "x")] * 30,
    )
    assert should_check_remaining_links(many) is False
    # healthy hit-rate -> keep
    mixed_rows = (
        [("a", "https://x.org/p", "https://x.org/q", "https://x.org/d.pdf", "true", None)] * 5
        + [("a", "https://x.org/p", "https://x.org/q", "unreachable", "false", "x")] * 25
    )
    assert should_check_remaining_links(_results_df(spark, mixed_rows)) is True


def test_mla_gate_state_machine():
    """A8 (MachineLearning.shouldRunPrediction, MachineLearning.java:187-240):
    learn -> run -> sleep on low success-rate -> restart after the wait,
    with the reference's constants; state round-trips through lineage."""
    from publicationsretriever_spark.plans.stats import MlaGate

    g = MlaGate()
    # learning period: gate closed until >5000 urls gathered
    assert not g.should_run_prediction()
    g.observe_round(gathered=4000, pages_reached=0, checked=0, found=0)
    assert not g.should_run_prediction()
    g.observe_round(gathered=1001, pages_reached=0, checked=0, found=0)
    assert g.should_run_prediction()

    # below the next accuracy breakpoint it always runs
    g.observe_round(0, pages_reached=5999, checked=100, found=10)
    assert g.should_run_prediction()

    # breakpoint reached with 40% (<51%) success -> sleep-mode
    g.observe_round(0, pages_reached=200, checked=900, found=390)
    assert not g.should_run_prediction()
    assert g.sleeping
    assert g.rates and g.rates[-1] == 40.0

    # still sleeping until 30k more MLA-stage pages pass
    g.observe_round(0, pages_reached=10_000, checked=0, found=0)
    assert not g.should_run_prediction()
    g.observe_round(0, pages_reached=25_000, checked=0, found=0)
    assert g.should_run_prediction()
    assert not g.sleeping

    # high success-rate at the next breakpoint keeps it running
    g.observe_round(0, pages_reached=40_000, checked=1000, found=800)
    assert g.should_run_prediction()
    assert g.rates[-1] == 80.0

    # deterministic resume: lineage round-trip preserves behavior
    g2 = MlaGate.from_lineage(g.to_lineage())
    assert g2.__dict__ == g.__dict__
