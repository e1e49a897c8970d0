"""SemDeDup (operators/similarity.semdedup): cluster-then-prune
semantic dedup — winner rule, determinism, index reuse, and the
documented cross-cell recall trade."""
from __future__ import annotations

import pyspark.sql.functions as F

from publicationsretriever_spark.operators.similarity import (
    build_ivf_index,
    semdedup,
)


def _corpus(spark):
    """Two tight bundles + two orthogonal singletons, 4-dim.

    ids 0..2: bundle A around e1 (pairwise cosine ~0.999)
    ids 3..4: bundle B around e2 (pairwise cosine ~0.999)
    ids 5..6: singletons on e3 / e4 (cosine 0 to everything else)
    """
    rows = [
        (0, [1.0, 0.01, 0.0, 0.0]),
        (1, [1.0, 0.02, 0.0, 0.0]),
        (2, [1.0, 0.00, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.01, 0.0]),
        (4, [0.01, 1.0, 0.0, 0.0]),
        (5, [0.0, 0.0, 1.0, 0.0]),
        (6, [0.0, 0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_semdedup_winner_rule(spark):
    emb = _corpus(spark)
    out = {
        r["vec_id"]: r
        for r in semdedup(
            emb, n_cells=4, threshold=0.9, refine_iters=1, sample_n=7
        ).collect()
    }
    assert len(out) == 7  # one verdict per input row
    # lowest id of each bundle survives; later bundle members point at it
    assert out[0]["kept"] and out[0]["dup_of"] is None
    assert not out[1]["kept"] and out[1]["dup_of"] == 0
    assert not out[2]["kept"] and out[2]["dup_of"] == 0
    assert out[3]["kept"] and out[3]["dup_of"] is None
    assert not out[4]["kept"] and out[4]["dup_of"] == 3
    # orthogonal singletons untouched
    assert out[5]["kept"] and out[6]["kept"]


def test_semdedup_threshold_gates_the_pair(spark):
    emb = _corpus(spark)
    # at threshold above every pairwise cosine nothing is dropped
    kept = (
        semdedup(emb, n_cells=4, threshold=0.9999999, refine_iters=1,
                 sample_n=7)
        .filter(F.col("kept"))
        .count()
    )
    assert kept == 7


def test_semdedup_deterministic_and_index_reuse(spark):
    emb = _corpus(spark)
    one = sorted(
        map(tuple, semdedup(emb, n_cells=4, threshold=0.9,
                            refine_iters=1, sample_n=7).collect())
    )
    two = sorted(
        map(tuple, semdedup(emb, n_cells=4, threshold=0.9,
                            refine_iters=1, sample_n=7).collect())
    )
    assert one == two
    # a prebuilt (shared) index gives the identical verdicts
    idx = build_ivf_index(
        emb, n_cells=4, refine_iters=1, sample_n=7, materialize=True
    )
    three = sorted(
        map(tuple, semdedup(emb, threshold=0.9, index=idx).collect())
    )
    idx.unpersist()
    assert one == three


def test_semdedup_cross_cell_duplicates_survive(spark):
    """The documented recall trade: near-identical vectors split across
    a cell boundary are NOT caught. refine_iters=0 pins centroids to
    the lowest-id vectors, so ids 0 and 1 (centroids of their own
    cells) each assign to themselves even though their cosine > 0.99.
    """
    rows = [
        (0, [1.0, 0.10, 0.0, 0.0]),
        (1, [1.0, -0.10, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = semdedup(emb, n_cells=2, threshold=0.9, refine_iters=0)
    got = {r["vec_id"]: r for r in out.collect()}
    assert got[0]["kept"] and got[1]["kept"]
    assert got[0]["cell_id"] != got[1]["cell_id"]


def test_semdedup_vector_contraction_matches_pairwise(spark):
    """The identical-vector contraction must reproduce the pairwise
    formulation exactly on a duplicate-heavy corpus (exact duplicate
    vectors, near-threshold neighbors, singletons)."""
    from pyspark.sql import functions as F

    from publicationsretriever_spark.operators.similarity import (
        build_ivf_index,
        dot,
        semdedup,
    )

    rows = []
    for i in range(60):
        base = [((i % 7) * 13 + j * 3) % 17 - 8.0 for j in range(8)]
        rows.append((i, [float(x) for x in base]))
    # i % 7 buckets create exact duplicate families of ~9 members
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    got = sorted(
        tuple(r)
        for r in semdedup(
            vecs, n_cells=4, threshold=0.9, sample_n=16
        ).collect()
    )
    # reference: the uncontracted pairwise formulation
    ix = build_ivf_index(vecs, n_cells=4, refine_iters=1, sample_n=16)
    inv = ix.inverted
    a = inv.select(
        F.col("vec_id").alias("_ida"), F.col("embedding").alias("_va"),
        "cell_id", F.col("_n").alias("_na"),
    )
    b = inv.select(
        F.col("vec_id").alias("_idb"), F.col("embedding").alias("_vb"),
        "cell_id", F.col("_n").alias("_nb"),
    )
    dup = (
        a.join(b, "cell_id")
        .filter(F.col("_idb") < F.col("_ida"))
        .withColumn(
            "_sim",
            F.round(
                dot(F.col("_va"), F.col("_vb"), 8)
                / (F.col("_na") * F.col("_nb")),
                6,
            ),
        )
        .filter(F.col("_sim") >= 0.9)
        .groupBy(F.col("_ida").alias("vec_id"))
        .agg(F.min("_idb").alias("dup_of"))
    )
    want = sorted(
        tuple(r)
        for r in inv.select("vec_id", "cell_id")
        .join(dup, "vec_id", "left")
        .select(
            "vec_id", "cell_id", "dup_of",
            F.col("dup_of").isNull().alias("kept"),
        )
        .collect()
    )
    ix.inverted.unpersist()
    assert got == want
