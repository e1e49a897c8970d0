"""Z-order clustering: key parity vs a pure-Python Morton reference,
frozen-bounds append stability, and the quantitative data-skipping
claim — a second-dimension box predicate prunes most z-ordered files
while a lexicographic layout reads everything."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from publicationsretriever_spark.operators.packing import (
    prune_manifest,
    zorder_key,
    zorder_layout,
    zorder_manifest,
)


def _ref_z(vals: dict[str, float], cols: list[str],
           bounds: dict[str, tuple[float, float]], bits: int) -> int:
    top = float((1 << bits) - 1)
    z = 0
    for d, c in enumerate(cols):
        mn, mx = bounds[c]
        denom = (mx - mn) if mx > mn else 1.0
        s = math.floor(min(max((vals[c] - mn) / denom * top, 0.0), top))
        s = int(s)
        for b in range(bits):
            z += ((s >> b) & 1) << (b * len(cols) + d)
    return z


def _grid(spark, n=400, seed_mod=997):
    # deterministic pseudo-scatter: (i*17 % mod, i*29 % mod)
    rows = [(i, float(i * 17 % seed_mod), float(i * 29 % seed_mod))
            for i in range(n)]
    return spark.createDataFrame(rows, "id long, x double, y double")


def test_zorder_key_matches_python_reference(spark):
    df = _grid(spark, 200)
    bits = 8
    out = zorder_key(df, ["x", "y"], bits=bits).collect()
    bounds = {"x": (0.0, float(199 * 17 % 997)), "y": (0.0, 0.0)}
    # recompute true bounds from the data, same as the operator does
    xs = [r["x"] for r in out]
    ys = [r["y"] for r in out]
    bounds = {"x": (min(xs), max(xs)), "y": (min(ys), max(ys))}
    for r in out:
        assert r["_z"] == _ref_z(
            {"x": r["x"], "y": r["y"]}, ["x", "y"], bounds, bits
        ), (r["id"], r["x"], r["y"])


def test_zorder_key_frozen_bounds_and_clamp(spark):
    bounds = {"x": (0.0, 100.0), "y": (0.0, 100.0)}
    a = spark.createDataFrame(
        [(0, 10.0, 20.0), (1, 50.0, 50.0)], "id long, x double, y double"
    )
    # second batch: same values reappear plus out-of-bounds outliers
    b = spark.createDataFrame(
        [(2, 10.0, 20.0), (3, -5.0, 250.0)], "id long, x double, y double"
    )
    za = {r["id"]: r["_z"] for r in
          zorder_key(a, ["x", "y"], bits=8, bounds=bounds).collect()}
    zb = {r["id"]: r["_z"] for r in
          zorder_key(b, ["x", "y"], bits=8, bounds=bounds).collect()}
    assert zb[2] == za[0]  # same point, same key across batches
    # clamped outlier == the edge point's key
    edge = spark.createDataFrame(
        [(9, 0.0, 100.0)], "id long, x double, y double"
    )
    ze = zorder_key(edge, ["x", "y"], bits=8, bounds=bounds).collect()
    assert zb[3] == ze[0]["_z"]


def test_zorder_key_constant_column_degenerates_to_zero_bits(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 7.0), (1, 2.0, 7.0)], "id long, x double, y double"
    )
    out = zorder_key(df, ["x", "y"], bits=8).collect()
    for r in out:
        # y contributes 0 to every key when min==max
        assert r["_z"] == _ref_z(
            {"x": r["x"], "y": r["y"]}, ["x", "y"],
            {"x": (1.0, 2.0), "y": (7.0, 7.0)}, 8
        )


def test_zorder_key_validation(spark):
    df = _grid(spark, 4)
    with pytest.raises(ValueError):
        zorder_key(df, ["x"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)


def test_zorder_prunes_second_dim_where_linear_cannot(spark):
    """The reason the operator exists: per-file min/max stats stay
    tight on BOTH dims under z-order, so a y-only box predicate reads
    a small fraction of files; a layout sorted by x alone has every
    file spanning all of y and reads 100%."""
    df = _grid(spark, 4096, seed_mod=991)
    cols = ["x", "y"]
    file_bits = 6  # 64 files
    laid = zorder_layout(df, cols, bits=10, file_bits=file_bits)
    man_z = zorder_manifest(laid, cols)
    # lexicographic competitor: equal-count files in x order
    n_files = 1 << file_bits
    lex = df.withColumn(
        "_file", F.ntile(n_files).over(Window.orderBy("x", "id"))
    )
    man_x = zorder_manifest(lex, cols)
    lo, hi = 100.0, 130.0  # ~3% of y's range
    z_read = prune_manifest(man_z, {"y": (lo, hi)}).count()
    x_read = prune_manifest(man_x, {"y": (lo, hi)}).count()
    z_total = man_z.count()
    x_total = man_x.count()
    assert x_read == x_total  # linear layout cannot skip on y
    assert z_read / z_total <= 0.4, (z_read, z_total)
    # soundness: every matching row lives in a kept file
    kept = {r["file"] for r in
            prune_manifest(man_z, {"y": (lo, hi)}).collect()}
    hits = laid.filter((F.col("y") >= lo) & (F.col("y") <= hi))
    bad = hits.filter(~F.col("_file").isin(list(kept))).count()
    assert bad == 0


def test_zorder_key_is_shuffle_free_projection(spark):
    df = _grid(spark, 64)
    plan = zorder_key(
        df, ["x", "y"], bits=8, bounds={"x": (0.0, 997.0), "y": (0.0, 997.0)}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pruned_scan_equals_full_scan_filter(spark):
    """Completeness + soundness in one assertion: scanning only the
    manifest-kept files then row-filtering returns EXACTLY the rows
    a full-scan filter returns."""
    from publicationsretriever_spark.operators.packing import pruned_scan

    df = _grid(spark, 2048, seed_mod=983)
    cols = ["x", "y"]
    laid = zorder_layout(df, cols, bits=10, file_bits=5)
    man = zorder_manifest(laid, cols)
    preds = {"x": (200.0, 420.0), "y": (50.0, 300.0)}
    got = {r["id"] for r in pruned_scan(laid, man, preds).collect()}
    want = {
        r["id"] for r in df.filter(
            (F.col("x") >= 200.0) & (F.col("x") <= 420.0)
            & (F.col("y") >= 50.0) & (F.col("y") <= 300.0)
        ).collect()
    }
    assert got == want and len(want) > 0
