"""S1/S2 seed readers (SURVEY.md §2.1).

S1: line-delimited JSON ``{"id": ..., "url": ...}``
    (FileUtils.getNextIdUrlPairBatchFromJson, util/file/FileUtils.java:249-289;
    sample: example/sample_input/sample_input.json). The reference batches
    3000 lines at a time; Spark reads the whole file as a DataFrame and
    the ROUND loop provides the batching.
S2: one plain URL per line, optional header row, surrounding quotes
    stripped (FileUtils.getNextUrlBatchTest, util/file/FileUtils.java:805-840).

Both attach ``order_in_id`` (input line order) because the reference's
best-url-per-id pick depends on insertion order (J4) — making the
frontier deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ID_URL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)


def read_id_url_pairs(spark: SparkSession, path: str) -> DataFrame:
    """S1: JSON-lines {id,url} -> (id, order_in_id, url). In-batch
    duplicate (id,url) pairs are KEPT (flagged ``is_duplicate_pair``) —
    the reference logs them as 'duplicate' output rows
    (FileUtils.java:282-285); the round engine does the same."""
    raw = spark.read.schema(ID_URL_SCHEMA).json(path)
    raw = raw.withColumn(
        "order_in_id",
        F.row_number().over(Window.orderBy(F.monotonically_increasing_id())) - 1,
    )
    w = Window.partitionBy("id", "url").orderBy("order_in_id")
    return raw.withColumn(
        "is_duplicate_pair", F.row_number().over(w) > 1
    )


def read_plain_urls(
    spark: SparkSession, path: str, skip_first_row: bool = False
) -> DataFrame:
    """S2: one url per line -> (id=NULL, order_in_id, url); quotes
    stripped, optional header skipped, blank lines dropped."""
    raw = spark.read.text(path).withColumn(
        "order_in_id",
        F.row_number().over(Window.orderBy(F.monotonically_increasing_id())) - 1,
    )
    if skip_first_row:
        raw = raw.filter(F.col("order_in_id") > 0)
    url = F.regexp_replace(F.trim(F.col("value")), '^"|"$', "")
    return (
        raw.select(
            F.lit(None).cast("string").alias("id"),
            "order_in_id",
            url.alias("url"),
        )
        .filter(F.col("url") != "")
    )
