"""SparkSession factory with scale-aware defaults.

Local mode is the test harness; the configs are chosen so the same
code runs unmodified on a multi-executor cluster (AQE, skew-join
handling, Arrow UDF transfer, UTC timestamps for oracle comparison).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "publicationsretriever_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` -> ``local[$SPARK_GRAFT_CPUS or *]``. On a real
    cluster the master is taken from the environment (spark-submit),
    so we only set ``master`` when none is configured.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-driven coalescing: tiny dimension aggregates (domain
        # counters, blocking rules) collapse to few tasks instead of
        # paying full shuffle-partition scheduling overhead per stage
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # tiny advisory size: only KB-scale shuffles (dimension
        # aggregates) coalesce; data-bearing shuffles keep full width.
        # The crawl's rows are python-CPU-heavy, not byte-heavy — the
        # default 64MB advisory would merge the whole fetch stage into
        # one task and serialize the Python work
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # HotSpot never JIT-compiles a method above ~8000 bytecode
        # bytes (-XX:DontCompileHugeMethods), so a whole-stage-codegen
        # method past that limit runs INTERPRETED — measured 22.7s vs
        # 3.8s on the unrolled vector-scoring stages (64-dim dot
        # products fused with a broadcast join). 8000 makes Spark's
        # existing compiled-size check fall back to per-operator
        # codegen (small, JIT-able methods) exactly for such stages;
        # every normal stage stays whole-stage. This is the
        # documented purpose of the knob (SPARK-21871).
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # deliberate join-strategy choice (guide §3.1): allow shuffled
        # hash join when its size conditions are met instead of
        # defaulting to sort-merge — the dedup/similarity self-joins
        # build small per-partition sides (cell/bucket-keyed), where
        # SHJ skips both sorts (semdedup -25% measured at sf1.0). The
        # planner still falls back to SMJ when the build side is too
        # big for a partition-local hash table.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    if not os.environ.get("SPARK_MASTER") and "SPARK_ENV_LOADED" not in os.environ:
        builder = builder.master(master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
