

def test_mark_seen_sharded_equivalence(spark):
    """Sharded-bloom mark (bounded per-task sketch bytes, 10^10-scale
    path) must produce exactly the exact-join marking."""
    from pyspark.sql import functions as F

    from publicationsretriever_spark.operators.seen import (
        mark_seen,
        mark_seen_sharded,
    )

    frontier = spark.range(0, 5000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        F.col("id").alias("rid"),
    )
    seen = spark.range(0, 2500).select(
        F.xxhash64(F.concat(F.lit("u"), (F.col("id") * 2))).alias("url_hash")
    )
    exact = {
        (r["rid"], r["_seen"])
        for r in mark_seen(frontier, seen, "url_hash", seen_count=0).collect()
    }
    sharded = {
        (r["rid"], r["_seen"])
        for r in mark_seen_sharded(
            frontier, seen, "url_hash", n_shards=8
        ).collect()
    }
    assert sharded == exact
    assert sum(1 for _r, s in exact if s) > 0  # overlap actually exists
