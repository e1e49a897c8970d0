"""WebDataset-style tar shard sink/source for image+caption training
corpora.

WebDataset (tar shards whose members group by a common key prefix:
``<key>.<ext>`` payload + ``<key>.txt`` caption) is the de-facto
storage layout for large-scale image+caption training — loaders
stream whole shards sequentially, so shard assembly is the LAST step
of the pipeline after gates/dedup/canonicalization. The reference has
no equivalent (its sink is one file per document,
util/file/FileUtils.java storeDocFile); a 100 TB image corpus needs
the packed form.

Three pieces, each independently tested:

- :func:`wds_shard_plan` — the DETERMINISTIC layout plan: every
  sample's shard index and byte offset inside its shard's tar,
  derived from nothing but (id, payload_len, caption_len) and two
  constants. Pure tar arithmetic (one 512-byte header per member,
  content padded to 512) over a two-pass distributed prefix sum
  (operators/packing.prefix_sum_start) — no global sort, no
  single-task window. Because the plan is a pure function of the
  table, it doubles as the random-access INDEX: a loader can seek
  straight to (shard, offset) without reading tar headers.
- :func:`write_webdataset` — materializes the plan: one tar per
  shard, members in plan order with canonical headers (mtime=0,
  uid=gid=0, ustar), so the bytes are reproducible across runs and
  the tar layout matches the plan EXACTLY (asserted in tests via
  tarfile's member offsets).
- :func:`read_webdataset` — the inverse source: binaryFile scan of
  the shard tars + mapInPandas untar back to rows.

Scale shape: planning shuffles the corpus once (the prefix-sum
bucket co-location); writing shuffles once on shard (each task
serializes its own shard sequentially — a task needs ~shard_max_bytes
of memory, the standard WebDataset shard sizing of 0.1-1 GB). The
read side is an embarrassingly-parallel scan, one task per shard.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import prefix_sum_start

#: tar constants: fixed header block per member; content padded to 512
_BLK = 512


def _member_bytes(content_len):
    """Column expr: tar bytes a member of ``content_len`` occupies —
    one header block + content rounded up to whole blocks. Member
    names must stay <= 100 chars (ustar short-name field); the writer
    asserts this, keys derived from numeric ids always qualify."""
    return F.lit(_BLK) + F.ceil(content_len / F.lit(_BLK)).cast(
        "long"
    ) * F.lit(_BLK)


def wds_shard_plan(
    df: DataFrame,
    shard_max_bytes: int,
    id_col: str = "image_id",
    payload_len_col: str = "payload_len",
    caption_len_col: str = "caption_len",
    bucket_size: int = 1 << 20,
    layout: str = "id",
) -> DataFrame:
    """Assign every sample its (shard, offset_in_tar) under the
    id-ordered WebDataset layout.

    A sample is two consecutive tar members — ``<key>.<fmt>`` payload
    then ``<key>.txt`` caption — so its tar footprint is
    header+pad(payload) + header+pad(caption). Samples are laid out
    in ``id_col`` order; shard = floor(byte_start / shard_max_bytes)
    (a sample is never split: shards overflow by at most one sample,
    the packing.py contract); offset_in_tar = byte_start - the
    shard's first sample's byte_start.

    Returns (id, sample_bytes, shard, offset_in_tar). The shard-start
    subtraction joins a broadcast n_shards-row frame — bounded by
    corpus_bytes/shard_max_bytes, e.g. 100 TB / 512 MB = 2*10^5 rows.

    ``layout``: "id" (default) lays samples out in numeric-id order;
    "hash" lays them out in (xxhash64(id), id) order — the path for
    STRING ids (crawl image_ids like "img-3-5"): deterministic,
    uniformly bucket-balanced, and the writer sorts each shard by the
    same key so plan and bytes still agree member for member.
    """
    sz = (
        _member_bytes(F.col(payload_len_col).cast("long"))
        + _member_bytes(F.col(caption_len_col).cast("long"))
    ).alias("_sample_sz")
    if layout == "hash":
        base = df.select(
            F.col(id_col),
            F.xxhash64(F.col(id_col).cast("string")).alias("_wds_key"),
            sz,
        )
        started = prefix_sum_start(
            base,
            "_sample_sz",
            id_col,
            bucket_size=1 << 50,
            key_col="_wds_key",
        )
    else:
        # numeric-id precondition ENFORCED at runtime: a non-numeric
        # string id casts to NULL in prefix_sum_start's bucket key,
        # every join matches nothing, and the plan (and writer) would
        # silently return zero rows — total data loss with no error.
        # Digit strings ('7') are fine (cast succeeds), so the check
        # is per-VALUE, not per-type: assert_true fails the job
        # loudly on the first uncastable id.
        base = df.select(F.col(id_col), sz)
        if dict(df.dtypes)[id_col] == "string":
            base = base.filter(
                F.assert_true(
                    F.col(id_col).try_cast("long").isNotNull(),
                    F.concat(
                        F.lit(
                            "wds layout='id' needs numeric ids; got "
                        ),
                        F.col(id_col),
                        F.lit(" — use layout='hash' for string ids"),
                    ),
                ).isNull()
            )
        started = prefix_sum_start(
            base, "_sample_sz", id_col, bucket_size=bucket_size
        )
    started = started.withColumn(
        "shard",
        (F.col("_start") / F.lit(int(shard_max_bytes))).cast("long"),
    )
    # shard start via a window min over the shard partition: ONE
    # evaluation of the prefix-sum subtree (a groupBy + join-back
    # would re-run its shuffles for the aggregate side — measured 11
    # exchanges vs 5), and a shard's partition is bounded by
    # shard_max_bytes / min_sample_bytes rows
    from pyspark.sql import Window

    w_sh = Window.partitionBy("shard")
    return started.select(
        F.col(id_col),
        F.col("_sz").alias("sample_bytes"),
        F.col("shard"),
        (F.col("_start") - F.min("_start").over(w_sh)).alias(
            "offset_in_tar"
        ),
    )


def _canon_member(name: str, content: bytes) -> tarfile.TarInfo:
    if len(name) > 100:
        raise ValueError(f"member name exceeds ustar short name: {name!r}")
    ti = tarfile.TarInfo(name=name)
    ti.size = len(content)
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    shard_max_bytes: int = 1 << 28,
    id_col: str = "image_id",
    payload_col: str = "bytes",
    fmt_col: str = "fmt",
    caption_col: str = "caption",
    bucket_size: int = 1 << 20,
    layout: str = "id",
) -> list[dict]:
    """Write ``df`` (input_hint-shaped: numeric/castable id, binary
    payload, fmt, caption) as WebDataset tar shards
    ``<out_dir>/shard-NNNNNN.tar``; returns the manifest (one dict
    per shard: shard, path, n_samples, data_bytes) — bounded driver
    state, one row per shard.

    Bytes are REPRODUCIBLE: members in id order with canonical
    headers (ustar, mtime=0, uid/gid=0), captions utf-8. The layout
    matches :func:`wds_shard_plan` on (id, len(payload),
    len(utf-8 caption)) member for member — tests assert the parity
    with tarfile's own parsed offsets, so the plan IS a seekable
    index over the written shards.

    Preconditions: ids must be UNIQUE (the plan joins back by id);
    ``out_dir`` must be a filesystem every executor can write
    (local mode / NFS — swap the plain open() for the Hadoop
    FileSystem API when targeting object storage). ``df`` is
    evaluated twice (plan, then write) — both evaluations are pure
    functions of row VALUES (sizes, hashes of ids), never of
    partitioning or row order, so any deterministic-content source
    qualifies, including post-shuffle frames."""
    # a NULL caption is stored as the empty string (empty alt-text is
    # a normal corpus state); a NULL payload fails the write loudly —
    # there is no honest empty image
    cap = F.coalesce(F.col(caption_col), F.lit(""))
    plan = wds_shard_plan(
        df.select(
            F.col(id_col),
            F.length(F.col(payload_col)).alias("_plen"),
            F.length(cap.cast("binary")).alias("_clen"),
        ),
        shard_max_bytes,
        id_col=id_col,
        payload_len_col="_plen",
        caption_len_col="_clen",
        bucket_size=bucket_size,
        layout=layout,
    ).select(id_col, "shard")
    rows = df.select(
        F.col(id_col),
        F.xxhash64(F.col(id_col).cast("string")).alias("_wds_key"),
        F.col(payload_col).alias("wds_payload"),
        F.col(fmt_col).alias("wds_fmt"),
        cap.alias("wds_caption"),
    ).join(plan, id_col)
    sort_cols = ["_wds_key", id_col] if layout == "hash" else [id_col]

    os.makedirs(out_dir, exist_ok=True)

    # applyInPandas (not mapInPandas): Arrow batching may split one
    # partition into several chunks, and a shard written chunk-by-chunk
    # with "wb" would truncate itself — groupBy guarantees each call
    # sees its WHOLE shard exactly once.
    def _write_shard(grp: pd.DataFrame) -> pd.DataFrame:
        shard = int(grp["shard"].iloc[0])
        grp = grp.sort_values(sort_cols)
        path = os.path.join(out_dir, f"shard-{shard:06d}.tar")
        data_bytes = 0
        with open(path, "wb") as fh, tarfile.open(
            fileobj=fh, mode="w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for r in grp.itertuples(index=False):
                rid = getattr(r, id_col)
                payload = bytes(r.wds_payload)
                cap = str(r.wds_caption).encode("utf-8")
                tf.addfile(
                    _canon_member(f"{rid}.{r.wds_fmt}", payload),
                    io.BytesIO(payload),
                )
                tf.addfile(_canon_member(f"{rid}.txt", cap), io.BytesIO(cap))
                data_bytes += (
                    2 * _BLK
                    + -(-len(payload) // _BLK) * _BLK
                    + -(-len(cap) // _BLK) * _BLK
                )
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [path],
                "n_samples": [len(grp)],
                "data_bytes": [data_bytes],
            }
        )

    manifest = (
        rows.groupBy("shard")
        .applyInPandas(
            _write_shard,
            schema="shard long, path string, n_samples long, data_bytes long",
        )
        .collect()
    )
    return sorted((r.asDict() for r in manifest), key=lambda d: d["shard"])


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Inverse source: scan ``<path>/*.tar`` (binaryFile — one task
    per shard, no Python on the scan side) and untar back to
    (image_id string, fmt string, bytes binary, caption string,
    shard long, offset_in_tar long). Offsets come from tarfile's own
    parser, so round-trip tests can pin them against the plan."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    )

    def _untar(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                shard = int(
                    os.path.basename(r.path).split("-")[1].split(".")[0]
                )
                out: dict[str, list] = {
                    "image_id": [],
                    "fmt": [],
                    "bytes": [],
                    "caption": [],
                    "shard": [],
                    "offset_in_tar": [],
                }
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(r.content))
                ) as tf:
                    pending: dict[str, dict] = {}
                    for m in tf.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        s = pending.setdefault(key, {})
                        data = tf.extractfile(m).read()
                        if ext == "txt":
                            s["caption"] = data.decode("utf-8")
                        else:
                            s["fmt"] = ext
                            s["bytes"] = data
                            # the payload member leads the sample
                            s["offset"] = m.offset
                    # lexicographic key order — stable for both numeric
                    # and string ids; consumers re-sort as needed
                    for key in sorted(pending):
                        s = pending[key]
                        out["image_id"].append(key)
                        out["fmt"].append(s["fmt"])
                        out["bytes"].append(s["bytes"])
                        out["caption"].append(s["caption"])
                        out["shard"].append(shard)
                        out["offset_in_tar"].append(s["offset"])
                yield pd.DataFrame(out)

    return files.mapInPandas(
        _untar,
        schema=(
            "image_id string, fmt string, bytes binary, caption string, "
            "shard long, offset_in_tar long"
        ),
    )
