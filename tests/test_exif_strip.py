"""Byte-level JPEG EXIF excision: hand-built marker streams (no codec
needed — segments are self-delimiting), pass-through guarantees for
non-JPEG/corrupt bytes, and the Spark mapInPandas plumbing."""

from __future__ import annotations

from publicationsretriever_spark.operators.multimodal import (
    strip_exif,
    strip_exif_bytes,
)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def _jpeg(*segs: bytes, entropy: bytes = b"\x12\x34") -> bytes:
    sos = _seg(0xDA, b"\x01\x00")
    return b"\xff\xd8" + b"".join(segs) + sos + entropy + b"\xff\xd9"


APP0 = _seg(0xE0, b"JFIF\x00\x01\x02")
EXIF = _seg(0xE1, b"Exif\x00\x00" + b"GPS:51.5,-0.1;SERIAL=XYZ")
XMP = _seg(0xE1, b"http://ns.adobe.com/xap/1.0/\x00<xmp/>")
DQT = _seg(0xDB, bytes(16))


def test_exif_segment_dropped_everything_else_verbatim():
    dirty = _jpeg(APP0, EXIF, DQT)
    clean, removed = strip_exif_bytes(dirty)
    assert removed == 1
    assert clean == _jpeg(APP0, DQT)
    assert b"GPS" not in clean and b"Exif" not in clean
    # idempotent
    again, r2 = strip_exif_bytes(clean)
    assert (again, r2) == (clean, 0)


def test_non_exif_app1_and_other_segments_kept():
    # XMP also rides APP1 but is NOT an Exif segment: kept
    dirty = _jpeg(APP0, XMP, EXIF, DQT)
    clean, removed = strip_exif_bytes(dirty)
    assert removed == 1
    assert clean == _jpeg(APP0, XMP, DQT)


def test_multiple_exif_segments_all_dropped():
    dirty = _jpeg(EXIF, APP0, EXIF)
    clean, removed = strip_exif_bytes(dirty)
    assert removed == 2
    assert clean == _jpeg(APP0)


def test_non_jpeg_and_corrupt_pass_through():
    png = b"\x89PNG\r\n\x1a\nrest-of-png"
    assert strip_exif_bytes(png) == (png, 0)
    assert strip_exif_bytes(b"") == (b"", 0)
    assert strip_exif_bytes(None) == (None, 0)
    # bad segment length: remainder kept verbatim, nothing lost
    broken = b"\xff\xd8" + b"\xff\xe1\xff\xff" + b"tail"
    out, removed = strip_exif_bytes(broken)
    assert out == broken and removed == 0
    # desynced marker stream
    weird = b"\xff\xd8" + b"\x00\x01\x02"
    assert strip_exif_bytes(weird) == (weird, 0)


def test_entropy_data_with_ff_bytes_untouched():
    # fake FF bytes inside entropy data must never be parsed: we stop
    # at SOS and copy the remainder verbatim
    dirty = _jpeg(APP0, EXIF, entropy=b"\xff\x00\xff\xd8\xab")
    clean, removed = strip_exif_bytes(dirty)
    assert removed == 1
    assert clean == _jpeg(APP0, entropy=b"\xff\x00\xff\xd8\xab")


def test_strip_exif_dataframe_plumbing(spark):
    rows = [
        ("a", _jpeg(APP0, EXIF, DQT), "cap a"),
        ("b", _jpeg(APP0, DQT), "cap b"),
        ("c", b"\x89PNG\r\n\x1a\npng-bytes", "cap c"),
        ("d", None, "cap d"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, caption string"
    )
    out = {r["image_id"]: r for r in strip_exif(df).collect()}
    assert out["a"]["exif_removed"] == 1
    assert bytes(out["a"]["bytes"]) == _jpeg(APP0, DQT)
    assert out["b"]["exif_removed"] == 0
    assert bytes(out["b"]["bytes"]) == _jpeg(APP0, DQT)
    assert bytes(out["c"]["bytes"]) == rows[2][1]
    assert out["d"]["bytes"] is None and out["d"]["exif_removed"] == 0
    assert out["a"]["caption"] == "cap a"  # other columns ride along


def test_dataset_job_strip_exif_stage(spark, tmp_path, monkeypatch,
                                      capsys):
    """--strip-exif commits pairs with the exif_removed column; the
    synthetic PNG payloads pass through byte-identical (proving the
    stage is a safe default on non-JPEG corpora)."""
    import json
    import sys

    import jobs.dataset_job as dataset_job

    out_dir = str(tmp_path / "dataset_exif")
    monkeypatch.setattr(sys, "argv", [
        "dataset_job.py", "--out", out_dir,
        "--hosts", "3", "--pages-max", "6", "--strip-exif",
    ])
    assert dataset_job.main() == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from publicationsretriever_spark.sources.catalog import SnapshotCatalog

    _, tables = SnapshotCatalog(out_dir).load(spark)
    pairs = tables["pairs"].collect()
    assert pairs
    for r in pairs:
        assert r["exif_removed"] == 0  # PNG corpus: nothing to strip
        assert bytes(r["bytes"])[:4] == b"\x89PNG"


def test_fill_bytes_before_marker_do_not_desync():
    """ISO 10918-1 B.1.1.2 fill bytes: 0xFF padding before a marker
    must not desync the parser — the EXIF segment behind the padding
    is still found and dropped, and the padding itself is kept."""
    dirty = (b"\xff\xd8" + b"\xff\xff" + EXIF + b"\xff\xff\xff" + APP0
             + b"\xff\xda\x00\x04\x01\x00" + b"\x12\x34" + b"\xff\xd9")
    clean, removed = strip_exif_bytes(dirty)
    assert removed == 1
    assert b"Exif" not in clean and b"GPS" not in clean
    assert clean == (b"\xff\xd8" + b"\xff\xff" + b"\xff\xff\xff" + APP0
                     + b"\xff\xda\x00\x04\x01\x00" + b"\x12\x34"
                     + b"\xff\xd9")
