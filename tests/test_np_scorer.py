"""The NumPy mapInPandas scorer must be BIT-identical to the unrolled
JVM expression fold — same IEEE op sequence (0.0 seed, per-dimension
product adds in index order, norms folded the same way, division
associated dot / (cn * qn)). These tests pin raw doubles, not rounded
values, so a reassociation (BLAS dot, pairwise summation, FMA) fails
loudly."""

import struct

import pytest
from pyspark.sql import functions as F

from publicationsretriever_spark.operators.similarity import (
    _collect_query_rows,
    _np_cross_scores,
    brute_force_topk,
    dot,
    l2_norm,
    partial_topk,
)

@pytest.fixture(scope="module")
def vecs(spark):
    # includes an exact duplicate pair (ids 0 and 5) so rank ties and
    # score collisions are exercised
    rows = []
    for i in range(40):
        base = [((i * 7 + j * 13) % 19 - 9) / 7.0 for j in range(8)]
        rows.append((i, [float(x) for x in base]))
    rows[5] = (5, rows[0][1])
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _bits(x: float) -> bytes:
    return struct.pack("d", x)


def test_np_scorer_bit_identical_to_expression_fold(spark, vecs):
    dim = 8
    queries = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    q_rows = _collect_query_rows(queries, "query_id", "embedding")
    np_scores = {
        (r["query_id"], r["vec_id"]): r["_s"]
        for r in _np_cross_scores(
            vecs, q_rows, "vec_id", "embedding", "query_id", "_s", dim
        ).collect()
    }
    q = queries.select(
        F.col("query_id"), F.col("embedding").alias("_qv")
    ).withColumn("_qn", l2_norm(F.col("_qv"), dim))
    jvm = (
        vecs.withColumn("_n", l2_norm(F.col("embedding"), dim))
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            (
                dot(F.col("embedding"), F.col("_qv"), dim)
                / (F.col("_n") * F.col("_qn"))
            ).alias("_s"),
        )
    )
    jvm_scores = {
        (r["query_id"], r["vec_id"]): r["_s"] for r in jvm.collect()
    }
    assert set(np_scores) == set(jvm_scores)
    for k in jvm_scores:
        assert _bits(np_scores[k]) == _bits(jvm_scores[k]), k


def test_np_scorer_extra_per_query_column(spark, vecs):
    queries = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    q_rows = _collect_query_rows(queries, "query_id", "embedding")
    extra = {0: 0.25, 1: -1.5}
    out = _np_cross_scores(
        vecs, q_rows, "vec_id", "embedding", "query_id", "_s", 8,
        extra_per_query=extra, extra_name="_ts",
    ).collect()
    assert len(out) == 2 * 40
    for r in out:
        assert r["_ts"] == extra[r["query_id"]]


def test_brute_force_topk_matches_expression_formulation(spark, vecs):
    dim = 8
    queries = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    got = sorted(
        tuple(r)
        for r in brute_force_topk(vecs, queries, k=5).collect()
    )
    q = queries.select(
        F.col("query_id"), F.col("embedding").alias("_qv")
    ).withColumn("_qn", l2_norm(F.col("_qv"), dim))
    scored = (
        vecs.withColumn("_n", l2_norm(F.col("embedding"), dim))
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot(F.col("embedding"), F.col("_qv"), dim)
                / (F.col("_n") * F.col("_qn")),
                6,
            ).alias("cos_sim"),
        )
    )
    want = sorted(
        tuple(r)
        for r in partial_topk(
            scored,
            "query_id",
            [F.col("cos_sim").desc(), F.col("vec_id").asc()],
            5,
        )
        .select("query_id", "rank", "vec_id", "cos_sim")
        .collect()
    )
    assert got == want


def test_ivf_scan_path_matches_distributed_index_path(spark, vecs):
    """The one-shot NumPy probe scan must produce row-identical output
    to the distributed build/probe pipeline (same rounded argmax
    assignment incl. ties, same probe cells, same scores). The
    fixture contains exact duplicate vectors, so the margin<=1e-6
    exact-decimal path is exercised."""
    from pyspark.sql import functions as F

    from publicationsretriever_spark.operators.similarity import (
        build_ivf_index,
        build_ivfpq_index,
        ivf_topk,
        ivfpq_topk,
    )

    queries = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    got = sorted(
        tuple(r)
        for r in ivf_topk(
            vecs, queries, k=4, n_cells=4, nprobe=2, sample_n=16
        ).collect()
    )
    ix = build_ivf_index(vecs, n_cells=4, refine_iters=1, sample_n=16)
    want = sorted(
        tuple(r)
        for r in ix.topk(queries, k=4, nprobe=2).collect()
    )
    ix.inverted.unpersist()
    assert got == want

    for residual in (False, True):
        got = sorted(
            tuple(r)
            for r in ivfpq_topk(
                vecs, queries, k=4, n_cells=4, nprobe=2, m=2,
                n_codes=4, sample_n=16, residual=residual,
            ).collect()
        )
        ix = build_ivfpq_index(
            vecs, n_cells=4, m=2, n_codes=4, sample_n=16,
            residual=residual, nprobe_refine_iters=1,
        )
        want = sorted(
            tuple(r)
            for r in ix.topk(queries, k=4, nprobe=2).collect()
        )
        ix.inverted.unpersist()
        assert got == want, f"residual={residual}"


def test_np_assign_scan_matches_distributed_assign(spark, vecs):
    """The NumPy inverted-list build must be row-identical (including
    the _n norm BITS) to ivf_assign + l2_norm."""
    import struct as st

    from pyspark.sql import functions as F

    from publicationsretriever_spark.operators.similarity import (
        _np_ivf_assign_scan,
        ivf_centroids,
        ivf_assign,
        l2_norm,
    )

    cent = ivf_centroids(vecs, refine_iters=1, n_cells=4, sample_n=16)
    got = {
        r["vec_id"]: (r["cell_id"], st.pack("d", r["_n"]))
        for r in _np_ivf_assign_scan(
            vecs, cent._cent_rows, "vec_id", "embedding", 8
        ).collect()
    }
    want = {
        r["vec_id"]: (r["cell_id"], st.pack("d", r["_n"]))
        for r in ivf_assign(vecs, cent, "embedding", "vec_id", 8)
        .withColumn("_n", l2_norm(F.col("embedding"), 8))
        .collect()
    }
    assert got == want
