"""Incremental append on the resident ANN indexes
(operators/similarity.IvfIndex.append / IvfPqIndex.append).

Covers: append == rebuild-over-union with the SAME frozen quantizer
(IvfIndex), batch-split invariance (one append vs two), list-size
accounting, retrieval of appended rows, residual-form append, and the
no-encode-params guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from publicationsretriever_spark.operators.similarity import (
    IvfIndex,
    IvfPqIndex,
    build_ivf_index,
    build_ivfpq_index,
    ivf_assign,
    l2_norm,
)


def _corpus(spark, n=48, dim=8):
    rows = []
    for vid in range(n):
        c = vid % 3
        rows.append(
            (
                vid,
                [
                    float([6, -5, 1][c] + ((vid * 13 + i * 7) % 9 - 4) * 0.2)
                    for i in range(dim)
                ],
            )
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["vec_id"]) for r in df.collect()
    )


def test_ivf_append_equals_rebuild_with_frozen_quantizer(spark):
    full = _corpus(spark)
    base = full.filter(F.col("vec_id") % 4 != 0)
    batch = full.filter(F.col("vec_id") % 4 == 0)
    q = full.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = build_ivf_index(base, n_cells=4)
    idx.append(batch)
    got = _rows(idx.topk(q, k=5, nprobe=4))

    rebuilt = IvfIndex(
        idx.centroids,
        ivf_assign(full, idx.centroids, "embedding", "vec_id").withColumn(
            "_n", l2_norm(F.col("embedding"))
        ),
        "embedding",
        "vec_id",
    )
    assert got == _rows(rebuilt.topk(q, k=5, nprobe=4))
    assert idx.inverted.count() == 48
    idx.unpersist()


def test_ivf_append_batch_split_invariant(spark):
    full = _corpus(spark)
    base = full.filter(F.col("vec_id") < 32)
    b1 = full.filter((F.col("vec_id") >= 32) & (F.col("vec_id") < 40))
    b2 = full.filter(F.col("vec_id") >= 40)
    q = full.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    one = build_ivf_index(base, n_cells=4)
    one.append(b1.union(b2))
    two = build_ivf_index(base, n_cells=4)
    two.append(b1).append(b2)
    assert _rows(one.topk(q, k=6)) == _rows(two.topk(q, k=6))
    one.unpersist()
    two.unpersist()


def test_ivf_appended_row_is_retrievable(spark):
    full = _corpus(spark)
    base = full.filter(F.col("vec_id") != 47)
    batch = full.filter(F.col("vec_id") == 47)
    idx = build_ivf_index(base, n_cells=4)
    idx.append(batch)
    q = batch.select(F.col("vec_id").alias("query_id"), "embedding")
    # the corpus pattern repeats with period 9 in vid, so 47 has
    # exact-parallel duplicates (2, 11, ...) that tie at cosine 1.0
    # and win the id tie-break — assert 47 IS retrieved at sim 1.0,
    # not that it outranks its own duplicates
    top = idx.topk(q, k=8, nprobe=4).collect()
    hit = [r for r in top if r["vec_id"] == 47]
    assert hit and hit[0]["cos_sim"] == 1.0
    idx.unpersist()


@pytest.mark.parametrize("residual", [False, True])
def test_ivfpq_append_batch_split_invariant(spark, residual):
    full = _corpus(spark)
    base = full.filter(F.col("vec_id") < 32)
    b1 = full.filter((F.col("vec_id") >= 32) & (F.col("vec_id") < 40))
    b2 = full.filter(F.col("vec_id") >= 40)
    q = full.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    one = build_ivfpq_index(
        base, n_cells=4, m=4, n_codes=8, residual=residual
    )
    one.append(b1.union(b2))
    two = build_ivfpq_index(
        base, n_cells=4, m=4, n_codes=8, residual=residual
    )
    two.append(b1).append(b2)
    assert one.inverted.count() == 48
    assert _rows(one.topk(q, k=6)) == _rows(two.topk(q, k=6))
    one.unpersist()
    two.unpersist()


def test_ivfpq_handbuilt_index_refuses_append(spark):
    full = _corpus(spark)
    idx = build_ivfpq_index(full, n_cells=4, m=4, n_codes=8)
    bare = IvfPqIndex(idx.centroids, idx.inverted, "vec_id")
    with pytest.raises(ValueError, match="encode parameters"):
        bare.append(full.limit(1))
    idx.unpersist()
