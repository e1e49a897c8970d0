

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


def test_incremental_sketch_merge_equivalence(spark):
    """A sketch maintained as (old delta partials) OR (new delta
    partials) must mark exactly like a fresh full build AND like the
    exact join — the engine's per-round O(delta) maintenance path."""
    from pyspark.sql import functions as F

    from publicationsretriever_spark.operators.seen import (
        build_bloom_shards,
        mark_seen,
        mark_seen_sharded,
        merge_shard_sketches,
        shard_sketch_params,
    )

    def hashes(lo, hi, step=1):
        return spark.range(lo, hi, step).select(
            F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
        )

    old_seen, delta = hashes(0, 3000, 2), hashes(1, 3000, 2)
    seen = old_seen.unionByName(delta)
    frontier = spark.range(0, 6000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        F.col("id").alias("rid"),
    )
    capacity, n_shards = 12000, 8
    m_bits, k = shard_sketch_params(capacity, n_shards)
    kw = dict(capacity=capacity, n_shards=n_shards, m_bits=m_bits, k=k)
    merged = merge_shard_sketches(
        build_bloom_shards(old_seen, "url_hash", **kw),
        build_bloom_shards(delta, "url_hash", **kw),
        m_bits, k,
    )
    inc = {
        (r["rid"], r["_seen"])
        for r in mark_seen_sharded(
            frontier, seen, "url_hash", n_shards=n_shards,
            sketches=merged, m_bits=m_bits, k=k,
        ).collect()
    }
    exact = {
        (r["rid"], r["_seen"])
        for r in mark_seen(frontier, seen, "url_hash", seen_count=0).collect()
    }
    assert inc == exact
    assert sum(1 for _r, s in exact if s) == 3000
