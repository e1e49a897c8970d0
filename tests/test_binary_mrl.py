"""Binary sign-bit Hamming ANN and Matryoshka truncate-then-rerank
(operators/similarity.binarize/binary_topk/mrl_rerank_topk).

Covers: bit packing vs a plain-Python reference, Hamming distance vs
a plain-Python popcount, >63-dim multi-word packing, cluster-level
recall of binary_topk, and mrl_rerank_topk's exactness guarantees
(d_prime == dim reduces to brute force; candidates >= n is exact for
any prefix)."""

from __future__ import annotations

from pyspark.sql import functions as F

from publicationsretriever_spark.operators.similarity import (
    binarize,
    binary_topk,
    brute_force_topk,
    mrl_rerank_topk,
    sq_stats,
)


def _py_pack(vec, thresholds):
    words = []
    dim = len(thresholds)
    for w in range((dim + 62) // 63):
        acc = 0
        for j in range(63):
            i = w * 63 + j
            if i >= dim:
                break
            if vec[i] > thresholds[i]:
                acc |= 1 << j
        words.append(acc)
    return words


def test_binarize_matches_python_pack_multiword(spark):
    # 70 dims -> 2 words; values straddle the per-dim thresholds
    rows = [
        (vid, [float((vid * 7 + i * 3) % 11 - 5) for i in range(70)])
        for vid in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mins, maxs = sq_stats(df)
    mids = [(a + b) / 2.0 for a, b in zip(mins, maxs)]
    got = {r["vec_id"]: r["codes"] for r in binarize(df, mids).collect()}
    for vid, vec in rows:
        assert got[vid] == _py_pack(vec, mids), vid
        assert len(got[vid]) == 2


def test_binary_topk_hamming_matches_python(spark):
    rows = [
        (vid, [float((vid * 13 + i * 5) % 17 - 8) for i in range(70)])
        for vid in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mins, maxs = sq_stats(df)
    mids = [(a + b) / 2.0 for a, b in zip(mins, maxs)]
    packs = {vid: _py_pack(vec, mids) for vid, vec in rows}

    q = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = binary_topk(df, q, k=12).collect()
    assert len(out) == 24
    for r in out:
        expect = sum(
            bin(a ^ b).count("1")
            for a, b in zip(packs[r["query_id"]], packs[r["vec_id"]])
        )
        assert r["hamming"] == expect
    # rank 1 is the query itself at distance 0
    for r in out:
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"] and r["hamming"] == 0


def test_binary_topk_recovers_clusters(spark):
    # two well-separated clusters in 64-dim: binary codes differ in
    # every dimension across clusters, within-cluster in a few
    rows = []
    for vid in range(16):
        base = 10.0 if vid < 8 else -10.0
        rows.append(
            (
                vid,
                [
                    base + ((vid * 31 + i * 7) % 5 - 2) * 0.1
                    for i in range(64)
                ],
            )
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id").isin(0, 8)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = binary_topk(df, q, k=8).collect()
    for r in out:
        same_cluster = (r["vec_id"] < 8) == (r["query_id"] < 8)
        assert same_cluster, (r["query_id"], r["vec_id"])


def _clustered(spark, n=24, dim=32):
    rows = []
    for vid in range(n):
        c = vid % 3
        rows.append(
            (
                vid,
                [
                    float([5, -4, 1][c] + ((vid * 11 + i * 3) % 7 - 3) * 0.3)
                    for i in range(dim)
                ],
            )
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mrl_full_prefix_equals_brute_force(spark):
    df = _clustered(spark)
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(df, q, k=5).collect()
    got = mrl_rerank_topk(df, q, d_prime=32, candidates=24, k=5).collect()
    e = {(r["query_id"], r["rank"]): (r["vec_id"], r["cos_sim"]) for r in exact}
    g = {(r["query_id"], r["rank"]): (r["vec_id"], r["cos_sim"]) for r in got}
    assert e == g


def test_mrl_all_candidates_exact_for_any_prefix(spark):
    # with candidates >= n the coarse stage cannot lose the true
    # top-k, whatever the prefix quality
    df = _clustered(spark)
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in brute_force_topk(df, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in mrl_rerank_topk(
            df, q, d_prime=4, candidates=24, k=5
        ).collect()
    }
    assert exact == got


def test_mrl_prunes_to_candidate_budget(spark):
    df = _clustered(spark)
    q = df.filter(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = mrl_rerank_topk(df, q, d_prime=8, candidates=6, k=6).collect()
    # k == candidates: every returned row came through the coarse gate
    assert len(out) == 6
    # clustered data: prefix dims carry the cluster signal, so the
    # rerank's top hits stay in the query's cluster
    for r in out:
        assert r["vec_id"] % 3 == 0, r
