"""WebDataset tar shard sink/source: plan-vs-bytes parity, round-trip,
reproducibility, capacity contract."""

from __future__ import annotations

import hashlib
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from publicationsretriever_spark.sources.imagecodec import make_payload_row
from publicationsretriever_spark.sources.webdataset import (
    read_webdataset,
    wds_shard_plan,
    write_webdataset,
)

pytestmark = pytest.mark.usefixtures("spark")


def _corpus(spark, n=30):
    rows = [
        make_payload_row(str(i), w=4 + (i % 5), h=4 + (i % 3))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows)
    # numeric id for the id-ordered layout
    return df.withColumn("image_id", F.col("image_id").cast("long"))


def test_plan_matches_written_tar_offsets(spark, tmp_path):
    """The plan IS a seekable index: for every sample, the written
    shard's payload-member header offset (tarfile's own parser) must
    equal the plan's offset_in_tar, and shard membership must agree."""
    df = _corpus(spark)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(df, out, shard_max_bytes=16 * 1024)
    plan = {
        r["image_id"]: (r["shard"], r["offset_in_tar"], r["sample_bytes"])
        for r in wds_shard_plan(
            df.select(
                "image_id",
                F.length("bytes").alias("payload_len"),
                F.length(F.col("caption").cast("binary")).alias(
                    "caption_len"
                ),
            ),
            shard_max_bytes=16 * 1024,
        ).collect()
    }
    assert len(manifest) >= 2  # capacity small enough to split
    seen = set()
    for m in manifest:
        with tarfile.open(m["path"]) as tf:
            members = tf.getmembers()
        assert [mm.name for mm in members] == sorted(
            [mm.name for mm in members],
            key=lambda n: (int(n.split(".")[0]), n.endswith(".txt")),
        )
        by_key = {}
        for mm in members:
            key, ext = mm.name.rsplit(".", 1)
            if ext != "txt":
                by_key[int(key)] = mm.offset
        for key, off in by_key.items():
            shard, plan_off, _ = plan[key]
            assert shard == m["shard"]
            assert off == plan_off, (key, off, plan_off)
            seen.add(key)
    assert len(seen) == df.count()


def test_roundtrip_payload_and_caption_equality(spark, tmp_path):
    df = _corpus(spark, n=12)
    out = str(tmp_path / "wds")
    write_webdataset(df, out, shard_max_bytes=8 * 1024)
    back = {
        int(r["image_id"]): (bytes(r["bytes"]), r["caption"], r["fmt"])
        for r in read_webdataset(spark, out).collect()
    }
    src = {
        r["image_id"]: (bytes(r["bytes"]), r["caption"], r["fmt"])
        for r in df.collect()
    }
    assert back == src


def test_write_is_byte_reproducible(spark, tmp_path):
    df = _corpus(spark, n=10)
    hashes = []
    for sub in ("a", "b"):
        out = str(tmp_path / sub)
        write_webdataset(df, out, shard_max_bytes=8 * 1024)
        h = {}
        for fn in sorted(os.listdir(out)):
            with open(os.path.join(out, fn), "rb") as fh:
                h[fn] = hashlib.sha256(fh.read()).hexdigest()
        hashes.append(h)
    assert hashes[0] == hashes[1] and hashes[0]


def test_shard_capacity_overflows_by_at_most_one_sample(spark, tmp_path):
    """packing contract: shard = floor(start/capacity), samples never
    split — a shard's data bytes < capacity + its largest sample."""
    df = _corpus(spark, n=40)
    cap = 12 * 1024
    out = str(tmp_path / "wds")
    manifest = write_webdataset(df, out, shard_max_bytes=cap)
    plan = wds_shard_plan(
        df.select(
            "image_id",
            F.length("bytes").alias("payload_len"),
            F.length(F.col("caption").cast("binary")).alias("caption_len"),
        ),
        shard_max_bytes=cap,
    )
    max_sample = plan.agg(F.max("sample_bytes")).collect()[0][0]
    for m in manifest:
        assert m["data_bytes"] < cap + max_sample
    # shards are contiguous 0..k
    assert [m["shard"] for m in manifest] == list(range(len(manifest)))


def test_plan_big_side_windows_are_block_partitioned(spark):
    """Scale contract: no corpus-wide window — every window over the
    big frame is partitioned by the id-block bucket (_b); the only
    unpartitioned window runs over the tiny per-bucket totals frame."""
    df = _corpus(spark, n=10).select(
        "image_id",
        F.length("bytes").alias("payload_len"),
        F.lit(10).alias("caption_len"),
    )
    plan_str = (
        wds_shard_plan(df, shard_max_bytes=1 << 20, bucket_size=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    big_windows = [
        m.group(0)
        for m in re.finditer(r"Window \[sum\(_sz[^\n]*", plan_str)
    ]
    assert big_windows, plan_str
    for w in big_windows:
        assert "_b" in w, w


def test_hash_layout_string_ids_plan_matches_tar(spark, tmp_path):
    """layout='hash': string image_ids (the crawl's 'img-h-p' form)
    lay out in (xxhash64(id), id) order; the written tars must still
    match the plan's offsets member for member, and round-trip."""
    rows = [make_payload_row(f"img-{i}-{i % 3}") for i in range(20)]
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        df, out, shard_max_bytes=8 * 1024, layout="hash"
    )
    plan = {
        r["image_id"]: (r["shard"], r["offset_in_tar"])
        for r in wds_shard_plan(
            df.select(
                "image_id",
                F.length("bytes").alias("payload_len"),
                F.length(F.col("caption").cast("binary")).alias(
                    "caption_len"
                ),
            ),
            shard_max_bytes=8 * 1024,
            layout="hash",
        ).collect()
    }
    assert len(manifest) >= 2
    seen = 0
    for m in manifest:
        with tarfile.open(m["path"]) as tf:
            for mm in tf.getmembers():
                key, ext = mm.name.rsplit(".", 1)
                if ext != "txt":
                    shard, off = plan[key]
                    assert (shard, off) == (m["shard"], mm.offset), key
                    seen += 1
    assert seen == len(rows)
    back = {
        r["image_id"]: (bytes(r["bytes"]), r["caption"])
        for r in read_webdataset(spark, out).collect()
    }
    src = {
        r["image_id"]: (bytes(r["bytes"]), r["caption"])
        for r in df.collect()
    }
    assert back == src


def test_null_caption_roundtrips_as_empty_and_empty_df_is_noop(
    spark, tmp_path
):
    rows = [make_payload_row("7")]
    rows[0]["caption"] = None
    df = spark.createDataFrame(
        [tuple(r[c] for c in
               ("image_id", "bytes", "w", "h", "fmt", "caption", "phash"))
         for r in rows],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    out = str(tmp_path / "wds")
    manifest = write_webdataset(df, out, shard_max_bytes=8 * 1024)
    assert manifest[0]["n_samples"] == 1
    back = read_webdataset(spark, out).collect()
    assert back[0]["caption"] == ""  # NULL stored as empty alt-text

    empty = df.filter("image_id = 'nope'")
    out2 = str(tmp_path / "wds2")
    assert write_webdataset(empty, out2, shard_max_bytes=8 * 1024) == []
    assert os.listdir(out2) == []


def test_layout_id_with_noncastable_string_ids_fails_loudly(
    spark, tmp_path
):
    """A crawl-style string id ('img-3-5') under layout='id' casts to
    NULL in the bucket key and used to return an EMPTY plan/write —
    silent total data loss. It must raise instead; digit strings
    keep working (the cast succeeds)."""
    import pytest as _pytest

    rows = [make_payload_row("img-3-5")]
    df = spark.createDataFrame(
        [tuple(r[c] for c in
               ("image_id", "bytes", "w", "h", "fmt", "caption", "phash"))
         for r in rows],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    with _pytest.raises(Exception, match="layout='hash'"):
        write_webdataset(df, str(tmp_path / "wds"),
                         shard_max_bytes=8 * 1024)
    # the hash layout handles the same frame fine
    manifest = write_webdataset(
        df, str(tmp_path / "wds_h"), shard_max_bytes=8 * 1024,
        layout="hash",
    )
    assert manifest[0]["n_samples"] == 1
