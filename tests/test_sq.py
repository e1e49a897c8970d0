"""Int8 scalar-quantization ANN (operators/similarity.sq_*).

Covers: per-dimension stats exactness, code range and the constant-
dimension guard, the round-trip error bound (<= span/510 per dim),
encode/dequantize vs the fused sq_topk path, and cluster-level recall
vs brute force on well-separated clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from publicationsretriever_spark.operators.similarity import (
    brute_force_topk,
    sq_dequantize,
    sq_encode,
    sq_stats,
    sq_topk,
)


def _corpus(spark):
    """16 vectors, dim 4: dim 0 spreads widely, dim 1 narrowly, dim 2
    is CONSTANT (span-0 guard), dim 3 is the id ramp."""
    rows = [
        (vid, [float(vid * 10 - 80), float(vid) * 0.01, 7.5, float(vid)])
        for vid in range(16)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sq_stats_exact(spark):
    mins, maxs = sq_stats(_corpus(spark))
    assert mins == [-80.0, 0.0, 7.5, 0.0]
    assert maxs == [70.0, 0.15000000596046448, 7.5, 15.0]


def test_sq_codes_range_and_constant_dim(spark):
    vecs = _corpus(spark)
    mins, maxs = sq_stats(vecs)
    codes = {r["vec_id"]: r["codes"] for r in sq_encode(vecs, mins, maxs).collect()}
    for vid, cs in codes.items():
        assert all(0 <= c <= 255 for c in cs), (vid, cs)
        assert cs[2] == 0  # constant dim codes to 0
    # extremes hit the endpoints of the code range
    assert codes[0][0] == 0 and codes[15][0] == 255
    assert codes[0][3] == 0 and codes[15][3] == 255


def test_sq_roundtrip_error_bound(spark):
    """|dequant - x| <= span/510 + eps per dimension (half a code
    step); the constant dim reconstructs exactly."""
    vecs = _corpus(spark)
    mins, maxs = sq_stats(vecs)
    deq = {
        r["vec_id"]: r["dv"]
        for r in sq_dequantize(sq_encode(vecs, mins, maxs), mins, maxs).collect()
    }
    orig = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    for vid, dv in deq.items():
        for i, (a, b) in enumerate(zip(dv, orig[vid])):
            bound = (maxs[i] - mins[i]) / 510.0 + 1e-9
            assert abs(a - b) <= bound, (vid, i, a, b, bound)
        assert dv[2] == 7.5


def test_sq_topk_matches_brute_force_on_clusters(spark):
    """Quantization error (<= span/510) is far below the cluster
    separation, so SQ top-k must agree with brute force exactly on a
    clustered corpus — coarse structure is what SQ preserves."""
    rows = []
    for vid in range(16):
        c, j = vid % 4, vid // 4
        v = [0.0] * 8
        v[c] = 100.0
        v[4] = float(j + 1)  # within-cluster spread, shared dimension
        rows.append((vid, v))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = vecs.filter(F.col("vec_id").isin(0, 5)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in brute_force_topk(vecs, queries, k=4).collect()
    )
    approx = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in sq_topk(vecs, queries, k=4).collect()
    )
    assert approx == exact


def test_sq_contract_query_runs(spark):
    import __spark_entry__ as entry

    df = entry.queries()["ann_sq_topk"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert df.columns == ["query_id", "rank", "vec_id", "sq_sim"]
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert -1.0001 <= r["sq_sim"] <= 1.0001
    for qid, ranks in per_q.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5], qid
