"""S1/S2/S3 seed readers (SURVEY.md §2.1).

S1: line-delimited JSON ``{"id": ..., "url": ...}``
    (FileUtils.getNextIdUrlPairBatchFromJson, util/file/FileUtils.java:249-289;
    sample: example/sample_input/sample_input.json). The reference batches
    3000 lines at a time; Spark reads the whole file as a DataFrame and
    the ROUND loop provides the batching.
S2: one plain URL per line, optional header row, surrounding quotes
    stripped (FileUtils.getNextUrlBatchTest, util/file/FileUtils.java:805-840).
S3: the same JSON-lines input downloaded from an ``inputDataUrl``
    (ConnSupportUtils.getInputStreamFromInputDataUrl :1451-1501).

Both attach ``order_in_id`` (input line order) because the reference's
best-url-per-id pick depends on insertion order (J4) — making the
frontier deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ID_URL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)


def _with_input_order(raw: DataFrame) -> DataFrame:
    """Attach ``order_in_id`` = global input-line order WITHOUT a
    single-partition sort (the zipWithIndex pattern).

    The naive ``row_number().over(Window.orderBy(monotonically_increasing_id()))``
    moves the ENTIRE input into one task to rank it — fine at the
    reference's 3000-line batches (util/file/FileUtils.java:50), a
    single-task bottleneck at a 10^10-seed frontier. Instead:

    1. tag each row with its partition id and its partition-LOCAL
       position (``monotonically_increasing_id`` is consecutive within
       a partition, so ``mid - min(mid per partition)`` is the local
       row number — no shuffle);
    2. one tiny job collects per-partition (count, min-mid) — one row
       per partition, like RDD.zipWithIndex's count job;
    3. cumulative offsets are computed on the driver and broadcast-
       joined back: ``order_in_id = offset[pid] + local_row``.

    The ordering is byte-identical to the old global window (both rank
    by mid = partition-major input order); the plan contains NO
    SinglePartition exchange and the big side never shuffles.

    PRECONDITION (ADVICE r4): ``raw`` must be a DETERMINISTIC SCAN —
    a file/driver-local source whose partitioning and row order
    reproduce exactly across evaluations. The helper runs the plan
    twice (the offsets job, then the broadcast join), and
    ``monotonically_increasing_id``/``spark_partition_id`` are only
    stable when both runs see identical partitions. Every caller in
    this module feeds it a fresh ``spark.read``/``createDataFrame``
    frame, which qualifies. Do NOT pass a post-shuffle, sampled, or
    otherwise nondeterministic frame; localCheckpoint it first."""
    spark = raw.sparkSession
    df = raw.withColumn("_mid", F.monotonically_increasing_id()).withColumn(
        "_pid", F.spark_partition_id()
    )
    sizes = (
        df.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"), F.min("_mid").alias("_base"))
        .collect()
    )
    acc = 0
    off_rows = []
    for r in sorted(sizes, key=lambda r: r["_pid"]):
        off_rows.append((r["_pid"], int(acc), int(r["_base"])))
        acc += r["_cnt"]
    off_df = spark.createDataFrame(
        off_rows, "_pid int, _off long, _base long"
    )
    return (
        df.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "order_in_id", F.col("_off") + (F.col("_mid") - F.col("_base"))
        )
        .drop("_mid", "_pid", "_off", "_base")
    )


def _attach_order_and_dups(raw: DataFrame) -> DataFrame:
    """Shared S1/S3 tail: input order + duplicate-pair flag. In-batch
    duplicate (id,url) pairs are KEPT (flagged ``is_duplicate_pair``) —
    the reference logs them as 'duplicate' output rows
    (FileUtils.java:282-285); the round engine does the same."""
    raw = _with_input_order(raw)
    w = Window.partitionBy("id", "url").orderBy("order_in_id")
    return raw.withColumn(
        "is_duplicate_pair", F.row_number().over(w) > 1
    )


def read_id_url_pairs(spark: SparkSession, path: str) -> DataFrame:
    """S1: JSON-lines {id,url} -> (id, order_in_id, url,
    is_duplicate_pair)."""
    return _attach_order_and_dups(spark.read.schema(ID_URL_SCHEMA).json(path))


def read_id_url_pairs_from_url(
    spark: SparkSession,
    input_url: str,
    max_bytes: int = 256 * 1024 * 1024,
    timeout_s: float = 60.0,
) -> DataFrame:
    """S3: download the JSON-lines input from ``inputDataUrl`` and feed
    it through the S1 parse path
    (ConnSupportUtils.getInputStreamFromInputDataUrl :1451-1501).

    Reference-faithful gates: the Content-Type must contain "json"
    (exit-56 analog -> ValueError), the HTTP-reported or actual size
    must fit ``max_bytes`` (the "unacceptable size" code), and the body
    is decompressed per Content-Encoding (checkEncodingAndGetInputStream).

    The download is DRIVER-side by design — the reference also reads
    one stream on the main thread; an input list is tiny next to the
    crawl (10^8 seed lines ~ a few GB), and the parallelize below
    distributes parsing. Rows that fail JSON parsing are dropped like
    the reference's per-line jsonError skip (FileUtils.java:268-280)."""
    import json as _json
    import urllib.request as _rq

    from .livehttp import BASE_HEADERS, DecompressOverflow, decompress

    req = _rq.Request(input_url, headers=dict(BASE_HEADERS), method="GET")
    with _rq.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
        mime = (resp.headers.get("Content-Type") or "").lower()
        if "json" not in mime:
            raise ValueError(
                f"inputDataUrl mimeType is null or non-json: {mime!r}"
            )
        clen = resp.headers.get("Content-Length")
        if clen and clen.isdigit() and int(clen) > max_bytes:
            raise ValueError(f"inputDataUrl size {clen} exceeds {max_bytes}")
        body = resp.read(max_bytes + 1)
        if len(body) > max_bytes:
            raise ValueError(f"inputDataUrl body exceeds {max_bytes} bytes")
        try:
            # the cap applies to the DECOMPRESSED bytes too — a gzip'd
            # inputDataUrl must not inflate past max_bytes on the driver
            decoded = decompress(
                body, resp.headers.get("Content-Encoding"),
                max_out=max_bytes,
            )
        except DecompressOverflow as e:
            raise ValueError(
                f"inputDataUrl decompressed body exceeds {max_bytes} bytes"
            ) from e
        if decoded is None:
            raise ValueError("could not decode the inputDataUrl body")
    rows = []
    for line in decoded.decode("utf-8", errors="replace").splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            obj = _json.loads(line)
        except ValueError:
            continue  # reference: log jsonError, skip the line
        if isinstance(obj, dict):
            rows.append((
                str(obj["id"]) if obj.get("id") is not None else None,
                str(obj["url"]) if obj.get("url") is not None else None,
            ))
    raw = spark.createDataFrame(rows, ID_URL_SCHEMA)
    return _attach_order_and_dups(raw)


def read_plain_urls(
    spark: SparkSession, path: str, skip_first_row: bool = False
) -> DataFrame:
    """S2: one url per line -> (id=NULL, order_in_id, url); quotes
    stripped, optional header skipped, blank lines dropped."""
    raw = _with_input_order(spark.read.text(path))
    if skip_first_row:
        raw = raw.filter(F.col("order_in_id") > 0)
    url = F.regexp_replace(F.trim(F.col("value")), '^"|"$', "")
    return (
        raw.select(
            F.lit(None).cast("string").alias("id"),
            "order_in_id",
            url.alias("url"),
        )
        .filter(F.col("url") != "")
    )
