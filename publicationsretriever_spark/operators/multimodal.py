"""Multimodal (image/audio/video) column operators.

Binary payloads are opaque ``binary`` columns with typed metadata
(input_hint schema: image_id, bytes, w, h, fmt, caption, phash). The
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested for all three
modalities; only the codec step is substituted (this container has no
image/audio/video libraries): JPEG decode raises NotImplementedError,
audio uses a clearly-marked deterministic PCM16 fake, video uses a
clearly-marked length-prefixed-PNG fake container — each pluggable
for the real codec in production.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.imagecodec import decode_png, dct_phash64, phash64, psnr

DECODE_SCHEMA = (
    "image_id string, w int, h int, fmt string, decode_ok boolean, "
    "mean_r double, mean_g double, mean_b double, phash_check long, "
    "psnr_vs_ref double"
)


def decode_image_metrics(
    df: DataFrame,
    ref_pixels: dict[str, bytes] | None = None,
    phash_kind: str = "ahash",
) -> DataFrame:
    """mapInPandas over the payload table: decode -> per-channel means,
    recomputed phash, and (optionally) PSNR vs reference pixels.
    Arrow-batched; one Python pass per partition, no per-row UDF.

    ``phash_kind``: "ahash" (block-mean, matches the synthetic ingest
    phash column) or "dct" (standard DCT pHash — brightness/contrast
    invariant, the production choice for re-encoded crawl payloads;
    see sources/imagecodec.dct_phash64)."""
    hash_fn = phash64 if phash_kind == "ahash" else dct_phash64

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rec = {
                    "image_id": r.image_id, "w": r.w, "h": r.h, "fmt": r.fmt,
                    "decode_ok": False, "mean_r": None, "mean_g": None,
                    "mean_b": None, "phash_check": None, "psnr_vs_ref": None,
                }
                try:
                    px = decode_png(bytes(r.bytes))
                    rec.update(
                        decode_ok=True,
                        mean_r=float(px[..., 0].mean()),
                        mean_g=float(px[..., 1].mean()),
                        mean_b=float(px[..., 2].mean()),
                        phash_check=hash_fn(px),
                    )
                    if ref_pixels and r.image_id in ref_pixels:
                        ref = np.frombuffer(
                            ref_pixels[r.image_id], dtype=np.uint8
                        ).reshape(px.shape)
                        rec["psnr_vs_ref"] = float(min(psnr(px, ref), 1e9))
                except Exception:
                    # stubbed codec (NotImplementedError: JPEG), corrupt
                    # or truncated bytes, wrong magic, bad zlib stream —
                    # an AUDIT pass classifies bad payloads as
                    # decode_ok=False; it must never kill the stage
                    # (at crawl scale corrupt fetches are a certainty,
                    # and one poison row would fail the whole job).
                    rec["decode_ok"] = False
                rows.append(rec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "image_id string, out_w int, out_h int, bytes binary"


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (pure numpy) — the feature-extraction
    plumbing pattern: binary in, binary out, Arrow-batched."""
    from ..sources.imagecodec import encode_png

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_png(bytes(r.bytes))
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                out = px[yi][:, xi]
                rows.append({
                    "image_id": r.image_id, "out_w": out_w, "out_h": out_h,
                    "bytes": encode_png(out),
                })
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes").mapInPandas(op, schema=RESIZE_SCHEMA)


AUDIO_FRAME_SCHEMA = (
    "media_id string, frame_idx int, rms double, zero_cross int"
)


def _pcm16_decode(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE CODEC (clearly marked): interprets the binary
    payload as 16-bit little-endian mono PCM. Stands in for a real
    audio codec (pyav/soundfile — not in this container) so the
    mapInPandas plumbing is testable end-to-end; swap via the
    ``decoder`` argument in production."""
    usable = len(payload) - (len(payload) % 2)
    return np.frombuffer(payload[:usable], dtype="<i2")


def audio_frame_sample(
    df: DataFrame,
    frame_ms: int = 20,
    sample_rate: int = 16_000,
    id_col: str = "media_id",
    decoder=None,
) -> DataFrame:
    """Frame-sample an audio binary column into per-frame features
    (RMS energy + zero-crossing count). The Spark-side plumbing is
    real — Arrow-batched mapInPandas, one Python pass per partition,
    rows explode to one-per-frame so downstream aggs stay columnar.
    Only the codec is a deterministic fake (``_pcm16_decode``);
    pass ``decoder=`` to swap in a real one."""
    frame_len = max(1, sample_rate * frame_ms // 1000)
    dec = decoder or _pcm16_decode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pcm = dec(bytes(r.bytes))
                n = len(pcm) // frame_len
                for i in range(n):
                    fr = pcm[i * frame_len:(i + 1) * frame_len].astype(
                        np.float64
                    ) / 32768.0
                    rows.append({
                        "media_id": r.media_id,
                        "frame_idx": i,
                        "rms": float(np.sqrt((fr * fr).mean())),
                        "zero_cross": int(((fr[:-1] * fr[1:]) < 0).sum()),
                    })
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "rms", "zero_cross"]
            )

    return df.select(
        F.col(id_col).alias("media_id"), "bytes"
    ).mapInPandas(op, schema=AUDIO_FRAME_SCHEMA)


VIDEO_FRAME_SCHEMA = (
    "media_id string, frame_idx int, w int, h int, mean_luma double, "
    "phash long"
)


def pack_video(frames: list[bytes]) -> bytes:
    """Container format for the deterministic fake video codec: each
    frame is a length-prefixed (u32 LE) PNG. Real videos would arrive
    as H.264/VP9 and be split by pyav — same downstream shape."""
    out = bytearray()
    for f in frames:
        out += len(f).to_bytes(4, "little") + f
    return bytes(out)


def _split_video(payload: bytes) -> list[bytes]:
    """DETERMINISTIC FAKE CODEC (clearly marked): splits the
    length-prefixed PNG container written by ``pack_video``. Stands in
    for pyav demux+decode, which is not in this container."""
    frames, off = [], 0
    while off + 4 <= len(payload):
        n = int.from_bytes(payload[off:off + 4], "little")
        off += 4
        if off + n > len(payload):
            break
        frames.append(payload[off:off + n])
        off += n
    return frames


def video_frame_sample(
    df: DataFrame,
    every_k: int = 2,
    id_col: str = "media_id",
    splitter=None,
) -> DataFrame:
    """Sample every k-th frame of a video binary column and emit
    per-frame stats (mean luminance + perceptual hash) — the
    training-pipeline frame-extraction shape: binary in, one row per
    sampled frame out, Arrow-batched mapInPandas, no per-row UDF.
    Only the demux step is the deterministic fake (``_split_video``);
    pass ``splitter=`` for a real container format."""
    split = splitter or _split_video

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for i, frame in enumerate(split(bytes(r.bytes))):
                    if i % every_k:
                        continue
                    rec = {
                        "media_id": r.media_id, "frame_idx": i,
                        "w": None, "h": None, "mean_luma": None,
                        "phash": None,
                    }
                    try:
                        px = decode_png(frame)
                        luma = (
                            0.299 * px[..., 0] + 0.587 * px[..., 1]
                            + 0.114 * px[..., 2]
                        )
                        rec.update(
                            w=px.shape[1], h=px.shape[0],
                            mean_luma=float(luma.mean()),
                            phash=phash64(px),
                        )
                    except NotImplementedError:
                        pass  # non-PNG frame codec: stubbed
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "w", "h", "mean_luma", "phash"
                ],
            )

    return df.select(
        F.col(id_col).alias("media_id"), "bytes"
    ).mapInPandas(op, schema=VIDEO_FRAME_SCHEMA)


def image_dedup_assign(
    df: DataFrame, max_hamming: int = 2, bands: int | None = None
) -> DataFrame:
    """End-to-end image near-dup assignment over the input_hint table
    (image_id, bytes, w, h, fmt, caption, phash): banded Hamming pairs
    over the int64 perceptual hash (dedup.hamming_neardup_pairs — the
    phash column is computed at ingest; decode_image_metrics'
    phash_check re-derives it from bytes to audit ingest), then
    connected components so chains of re-encodes A~B~C collapse to one
    cluster, then a left join back so singletons keep their own id.
    The reference dedups payloads by exact md5 only
    (util/http/ConnSupportUtils.java:414-455); near-identical
    re-encodes of the same image need the distance path.

    Returns (image_id, phash, cluster_id, is_canonical); a 100 TB
    pipeline keeps ``is_canonical`` rows and drops the rest.
    """
    from .dedup import connected_components, hamming_neardup_pairs

    base = df.select("image_id", "phash")
    pairs = hamming_neardup_pairs(
        base, "image_id", "phash", max_hamming=max_hamming, bands=bands
    )
    labels = connected_components(pairs, "id_a", "id_b")
    return (
        base.join(labels, base["image_id"] == labels["node"], "left")
        .select(
            F.col("image_id"),
            F.col("phash"),
            F.coalesce(F.col("cluster_id"), F.col("image_id")).alias(
                "cluster_id"
            ),
        )
        .withColumn("is_canonical", F.col("image_id") == F.col("cluster_id"))
    )


def image_caption_canonicalize(
    df: DataFrame,
    max_hamming: int = 2,
    bands: int | None = None,
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Caption conflict resolution over the input_hint table: cluster
    near-dup images (``image_dedup_assign``: banded phash-Hamming pairs
    -> connected components), then resolve each cluster's caption by
    majority vote (``dedup.canonicalize_clusters``). Re-encodes of one
    image crawled from different pages carry different captions; a
    contrastive-training pipeline must keep ONE (image, caption) pair
    per cluster and knows which clusters carried conflicting text
    (``caption_conflict`` — those are the rows a labeling-QA pass
    samples). The reference has no analogue (exact-md5 payload drop,
    util/http/ConnSupportUtils.java:414-455, keeps the first caption
    it happened to fetch — nondeterministic under its thread pool;
    this operator's majority-with-deterministic-ties vote is
    reproducible run-to-run by construction).

    Returns one row per cluster: (cluster_id, cluster_size,
    canonical_image_id, canonical_caption, n_caption,
    caption_conflict).
    """
    from .dedup import canonicalize_clusters

    attr_cols = attr_cols or ["caption"]
    assign = image_dedup_assign(df, max_hamming=max_hamming, bands=bands)
    joined = df.select("image_id", *attr_cols).join(
        assign.select("image_id", "cluster_id"), "image_id"
    )
    return canonicalize_clusters(joined, "cluster_id", "image_id", attr_cols)


#: fixed gate order for image_quality_gates' reject_reason — first
#: failing gate wins, mirroring the reference's page-filter battery
#: (LoaderAndChecker runs its regex gates in declaration order and
#: reports the first rejecting rule; util/url/LoaderAndChecker.java).
IMAGE_GATE_ORDER = (
    "fmt", "min_dim", "aspect", "bytes", "caption",
)


def image_quality_gates(
    df: DataFrame,
    id_col: str = "image_id",
    min_dim: int = 64,
    max_aspect: float = 3.0,
    bpp_min: float = 0.05,
    bpp_max: float = 4.0,
    caption_min_tokens: int = 2,
    caption_max_tokens: int = 128,
    allowed_fmts: tuple[str, ...] = ("png", "jpeg"),
) -> DataFrame:
    """Metadata-level quality gates for image+caption pairs — the
    LAION/DataComp-style pre-filter that runs BEFORE any pixel decode
    (decode costs Python/Arrow; these gates are pure column
    expressions over (w, h, fmt, byte_len, caption), so Catalyst
    evaluates them inside the scan's codegen stage and at 100 TB the
    rejected rows never reach the decode UDF):

    - ``fmt``     format in the allowlist (decoder coverage),
    - ``min_dim`` least(w, h) >= min_dim (thumbnails/trackers out),
    - ``aspect``  max(w/h, h/w) <= max_aspect (banners/sliver crops),
    - ``bytes``   byte_len / (w*h) in [bpp_min, bpp_max] — implausibly
      small = truncated/decoy payload, implausibly large = not really
      a compressed image (the reference's content-size guard,
      ConnSupportUtils.java:516-543, applied per-pixel),
    - ``caption`` whitespace token count in [min, max] (empty alt-text
      and keyword-stuffed captions out).

    Returns the input plus one boolean per gate (``gate_<name>``),
    ``keep`` (all pass) and ``reject_reason`` (first failing gate in
    IMAGE_GATE_ORDER, NULL when kept) — reason-carrying rejects feed
    the same audit-tables pattern as the crawl's reject_stats.
    Expects a ``byte_len`` column (length(bytes) upstream — metadata
    tables usually carry it instead of the blob)."""
    w, h = F.col("w").cast("double"), F.col("h").cast("double")
    px = w * h
    bpp = F.col("byte_len").cast("double") / px
    cap_toks = F.size(F.split(F.trim(F.col("caption")), r"\s+"))
    gates = {
        "fmt": F.col("fmt").isin(*allowed_fmts),
        "min_dim": F.least(F.col("w"), F.col("h")) >= min_dim,
        "aspect": F.greatest(w / h, h / w) <= max_aspect,
        "bytes": (bpp >= bpp_min) & (bpp <= bpp_max),
        "caption": (cap_toks >= caption_min_tokens)
        & (cap_toks <= caption_max_tokens),
    }
    out = df
    for name in IMAGE_GATE_ORDER:
        # NULL metadata (NULL bytes -> NULL bpp, NULL w/h -> NULL
        # aspect) must FAIL its gate, not evaluate to SQL NULL: a
        # NULL keep passes neither filter(keep) nor filter(~keep),
        # so the row would vanish from pairs AND audit_rejects —
        # breaking the every-drop-is-audited contract
        out = out.withColumn(
            f"gate_{name}", F.coalesce(gates[name], F.lit(False))
        )
    keep = F.lit(True)
    for name in IMAGE_GATE_ORDER:
        keep = keep & F.col(f"gate_{name}")
    reason = F.lit(None).cast("string")
    for name in reversed(IMAGE_GATE_ORDER):
        reason = F.when(
            ~F.col(f"gate_{name}"), F.lit(name)
        ).otherwise(reason)
    return out.withColumn("keep", keep).withColumn(
        "reject_reason", reason
    )


# ------------------------------------------------------- aspect bucketing


def aspect_bucket_ladder(
    pixel_budget: int = 1024 * 1024,
    stride: int = 64,
    min_side: int = 256,
    max_aspect: float = 4.0,
) -> list[tuple[int, int]]:
    """The deterministic SDXL-style resolution ladder: every (bw, bh)
    with both sides a multiple of ``stride``, bh the LARGEST such
    multiple with bw*bh <= pixel_budget (so each width uses the full
    pixel budget), sides >= min_side and aspect within
    [1/max_aspect, max_aspect]. Pure arithmetic on four scalars —
    both engines (and the training job that consumes the buckets)
    rebuild the identical ladder from the same constants.

    Aspect bucketing is how image-generation training avoids
    square-cropping: each batch is drawn from ONE bucket so every
    sample in it shares a target resolution (NovelAI/SDXL practice;
    SDXL report arXiv:2307.01952 §2.3)."""
    out = []
    bw = stride
    while True:
        bh = (pixel_budget // bw) // stride * stride
        if bh < min_side:
            break
        if bw >= min_side and bw <= max_aspect * bh and bh <= max_aspect * bw:
            if not out or out[-1][1] != bh:
                out.append((bw, bh))
        bw += stride
    return out


def aspect_bucket_assign(
    df: DataFrame,
    ladder: list[tuple[int, int]] | None = None,
    id_col: str = "image_id",
) -> DataFrame:
    """Assign each image (w, h) to the ladder bucket with the nearest
    log-aspect (ties -> lowest bucket index). Adds ``bucket_idx``,
    ``bucket_w``, ``bucket_h``.

    The distance is the aspect RATIO max(w*bh, h*bw)/min(w*bh, h*bw)
    — exp(|log(w/h) - log(bw/bh)|), strictly monotone in the
    log-aspect distance so the argmin is identical — because it is
    engine-portable: the integer products are exact (int64) and the
    one IEEE division is correctly rounded everywhere, so no
    cross-engine log-ulp difference can flip a near-tie.

    Scale shape: the ladder is ~tens of rows, so it is compiled INTO
    the projection — an array of (dist, idx, bw, bh) structs reduced
    by ``array_min`` (Spark's struct ordering is field-lexicographic,
    so min = smallest dist, then smallest idx). Zero joins, zero
    shuffle: at 100 TB this evaluates inside the scan's codegen stage
    like any other column expression."""
    ladder = ladder if ladder is not None else aspect_bucket_ladder()
    w, h = F.col("w").cast("long"), F.col("h").cast("long")
    cands = F.array(
        *[
            F.struct(
                (
                    F.greatest(w * F.lit(bh), h * F.lit(bw)).cast("double")
                    / F.least(w * F.lit(bh), h * F.lit(bw)).cast("double")
                ).alias("d"),
                F.lit(i).alias("idx"),
                F.lit(bw).alias("bw"),
                F.lit(bh).alias("bh"),
            )
            for i, (bw, bh) in enumerate(ladder)
        ]
    )
    best = F.array_min(cands)
    return df.withColumns(
        {
            "bucket_idx": best["idx"],
            "bucket_w": best["bw"],
            "bucket_h": best["bh"],
        }
    )


def aspect_batch_assign(
    df: DataFrame,
    batch_size: int,
    ladder: list[tuple[int, int]] | None = None,
    id_col: str = "image_id",
    block_size: int = 1 << 20,
    layout: str = "id",
) -> DataFrame:
    """Aspect buckets -> fixed-size training batches: within each
    bucket, images in ``id_col`` order are cut into batches of
    ``batch_size`` (``batch_idx`` = floor(rank_in_bucket/batch_size);
    the last batch per bucket may be short — the loader drops or pads
    it). Returns (id, w, h, bucket_idx, bucket_w, bucket_h,
    rank_in_bucket, batch_idx).

    Scale shape: there are only ~tens of buckets, so the naive
    ``row_number() over (partition by bucket)`` would sort 1/|ladder|
    of the corpus in ONE task. Instead the rank is a two-pass
    distributed prefix count (the operators/packing.py pattern, keyed
    by (bucket, id-block)): per-(bucket, block) counts -> running
    offsets over that TINY frame -> broadcast back, rank = offset +
    row_number within (bucket, block). Every window partition is
    bounded by block_size rows; the corpus shuffles once, on
    (bucket, block).

    ``layout``: "id" (default) ranks by the numeric id (the block
    split is trunc(id/block_size), so ``id_col`` must be numeric);
    "hash" ranks by (xxhash64(id), id) — the path for string crawl
    ids, and a deterministic within-bucket SHUFFLE: batches mix
    arbitrary corpus regions instead of ingest neighbors, which is
    what a training loader wants anyway (``block_size`` is ignored;
    blocks come from the top hash bits, ~16k of them)."""
    from pyspark.sql import Window

    ladder = ladder if ladder is not None else aspect_bucket_ladder()
    assigned = aspect_bucket_assign(df, ladder, id_col)
    if layout == "hash":
        key = F.xxhash64(F.col(id_col).cast("string"))
        base = assigned.withColumn("_ak", key).withColumn(
            "_blk",
            (F.col("_ak").cast("double") / F.lit(float(1 << 50))).cast(
                "long"
            ),
        )
        order_cols = ["_ak", id_col]
    else:
        base = assigned.withColumn(
            "_blk",
            (F.col(id_col).cast("long") / F.lit(int(block_size))).cast(
                "long"
            ),
        )
        order_cols = [id_col]
    counts = base.groupBy("bucket_idx", "_blk").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_off = (
        Window.partitionBy("bucket_idx")
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "bucket_idx",
        "_blk",
        (F.sum("_c").over(w_off) - F.col("_c")).alias("_off"),
    )
    w_in = Window.partitionBy("bucket_idx", "_blk").orderBy(*order_cols)
    return (
        base.join(F.broadcast(offsets), ["bucket_idx", "_blk"])
        .withColumn(
            "rank_in_bucket",
            F.col("_off") + F.row_number().over(w_in) - F.lit(1),
        )
        .withColumn(
            "batch_idx",
            (F.col("rank_in_bucket") / F.lit(int(batch_size))).cast("long"),
        )
        .drop("_blk", "_off", *( ["_ak"] if layout == "hash" else []))
    )


def strip_exif_bytes(b: bytes | None) -> tuple[bytes | None, int]:
    """Byte-level JPEG EXIF excision — drop every APP1/'Exif\\0\\0'
    segment from the marker stream, leave all other bytes verbatim.
    Works WITHOUT a codec (JPEG segments are self-delimiting: marker
    FFxx + 2-byte big-endian length through SOS, entropy data after),
    so it is real even in this container where JPEG DECODE is a
    declared stub. Training-data privacy hygiene: EXIF routinely
    carries GPS positions, serial numbers and timestamps that must
    not ship in a corpus even though no pixel changes. Non-JPEG bytes
    (PNG payloads), truncated or corrupt streams pass through
    UNTOUCHED (never crash the batch, never re-encode)."""
    if not b or b[:2] != b"\xff\xd8":
        return b, 0
    out = bytearray(b[:2])
    i, n, removed = 2, len(b), 0
    while i + 4 <= n:
        if b[i] != 0xFF:
            break  # desynced/corrupt: keep the remainder verbatim
        if b[i + 1] == 0xFF:
            # ISO 10918-1 B.1.1.2: any number of 0xFF fill bytes may
            # pad before a marker — copy and keep scanning, else the
            # parser desyncs and an EXIF segment behind the padding
            # ships verbatim with exif_removed=0
            out += b"\xff"
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xDA, 0xD9):  # SOS/EOI: entropy data follows
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
            out += b[i : i + 2]
            i += 2
            continue
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        if seglen < 2 or i + 2 + seglen > n:
            break  # bad length: keep the remainder verbatim
        seg = b[i : i + 2 + seglen]
        if marker == 0xE1 and seg[4:10] == b"Exif\x00\x00":
            removed += 1  # dropped
        else:
            out += seg
        i += 2 + seglen
    out += b[i:]
    return bytes(out), removed


def strip_exif(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """EXIF scrubbing over the payload table: Arrow-batched
    mapInPandas (binary surgery is genuinely non-expressible as
    built-ins), same schema plus an ``exif_removed`` count column.
    Pure projection — no shuffle; at 100 TB this rides the same scan
    as the decode audit."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("exif_removed", T.IntegerType())]
    )
    names = [f.name for f in df.schema.fields]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cleaned, counts = [], []
            for v in pdf[bytes_col]:
                nb, k = strip_exif_bytes(
                    bytes(v) if v is not None else None
                )
                cleaned.append(nb)
                counts.append(k)
            pdf = pdf.copy()
            pdf[bytes_col] = cleaned
            pdf["exif_removed"] = pd.array(counts, dtype="int32")
            yield pdf[names + ["exif_removed"]]

    return df.mapInPandas(op, schema=out_schema)
