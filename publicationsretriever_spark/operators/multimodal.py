"""Multimodal (image/audio/video) column operators.

Binary payloads are opaque ``binary`` columns with typed metadata
(input_hint schema: image_id, bytes, w, h, fmt, caption, phash). The
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested; the actual codec work
beyond our pure-Python PNG path is STUBBED (this container has no
image/audio libraries): JPEG/audio/video decode raise
NotImplementedError behind a clearly-marked flag.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.imagecodec import decode_png, phash64, psnr

DECODE_SCHEMA = (
    "image_id string, w int, h int, fmt string, decode_ok boolean, "
    "mean_r double, mean_g double, mean_b double, phash_check long, "
    "psnr_vs_ref double"
)


def decode_image_metrics(df: DataFrame, ref_pixels: dict[str, bytes] | None = None) -> DataFrame:
    """mapInPandas over the payload table: decode -> per-channel means,
    recomputed phash, and (optionally) PSNR vs reference pixels.
    Arrow-batched; one Python pass per partition, no per-row UDF."""

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
                        phash_check=phash64(px),
                    )
                    if ref_pixels and r.image_id in ref_pixels:
                        ref = np.frombuffer(
                            ref_pixels[r.image_id], dtype=np.uint8
                        ).reshape(px.shape)
                        rec["psnr_vs_ref"] = float(min(psnr(px, ref), 1e9))
                except NotImplementedError:
                    rec["decode_ok"] = False  # stubbed codec (e.g. JPEG)
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


def audio_frame_sample(df: DataFrame, frame_ms: int = 20) -> DataFrame:
    """STUB: audio decode is unavailable in this sandbox. The operator
    shape (binary column -> array of frame features) is the contract;
    calling it raises until a codec is provided."""
    raise NotImplementedError(
        "audio codecs are not available in this container; "
        "wire pyav/soundfile into a mapInPandas op with schema "
        "'media_id string, frame_idx int, features array<float>'"
    )
