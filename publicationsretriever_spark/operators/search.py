"""Keyword retrieval over text/caption columns — BM25 top-k.

Dataset-curation tooling: find the documents/captions matching an
audit query ("crawl every page mentioning X", "pull the captions that
talk about watermark text") without an external search system.

Scale shape: the corpus is tokenized ONCE into a projected array
column (an inline split() referenced inside per-term expressions
would re-tokenize per reference — the O(tokens^2) lambda trap fixed
round 5), the query vocabulary is broadcast and the exploded token
stream is semi-joined against it BEFORE any shuffle — the only
exchange carries (doc, matched-term) pairs, never the full token
stream. Corpus-level constants (N, avgdl) come from one bounded
single-row collect; avgdl's numerator is an INTEGER sum, so the
constant is exact and engine-independent (a float mean would depend
on summation order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(col):
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != F.lit("")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k per query, idf = ln(1 + (N-df+0.5)/(df+0.5)).

    Query terms are DISTINCT per query (classic BM25 without the qtf
    factor — audit queries are short, repeats carry no signal). df is
    computed from the matched postings only: a term's document
    frequency counts the docs that contain it, which the semi-joined
    posting list preserves exactly — idf never needs the full
    vocabulary. Scores round @6dp before the rank window; ties break
    by doc id, so the result is deterministic and oracle-checkable.

    At 100 TB: tokenize+explode is map-side; the broadcast semi-join
    prunes to query vocabulary in the scan stage; one shuffle on
    (doc, term) for tf, one tiny shuffle on term for df, one on
    (query, doc) for the score sum — each carries only matched rows.
    """
    # NULL-text docs are dropped up front: they can never match a
    # term, but size(NULL array) is -1 under Spark's default
    # sizeOfNull, so leaving them in SUBTRACTS from sumdl (skewing
    # every doc's length normalization) and inflates N in the idf
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
    )
    row = toks.agg(
        F.count("*").alias("n"),
        F.sum(F.size("_toks")).alias("sumdl"),
    ).head()
    n_docs = int(row["n"])
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = int(row["sumdl"]) / n_docs

    qterms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.array_distinct(_tokens(F.col(query_col)))
        ).alias("term"),
    )
    vocab = qterms.select("term").distinct()

    posting = toks.select(
        F.col(id_col),
        F.size("_toks").alias("_dl"),
        F.explode("_toks").alias("term"),
    ).join(F.broadcast(vocab), on="term")

    # tf feeds BOTH the df aggregate and the score join; without a cut
    # each reference re-runs the tokenize+explode+vocab-join+aggregate
    # subtree (Spark does not dedupe common subplans). The tf table is
    # vocabulary-pruned (matched terms only) so the eager
    # materialization is small at any corpus scale.
    tf = posting.groupBy(id_col, "term").agg(
        F.count("*").alias("_tf"), F.first("_dl").alias("_dl")
    ).localCheckpoint(eager=True)
    df_ = tf.groupBy("term").agg(F.count("*").alias("_df"))

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("_df") + F.lit(0.5))
        / (F.col("_df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("_tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("_tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("_dl") / F.lit(avgdl)
            )
        )
    )
    scores = (
        tf.join(F.broadcast(df_), on="term")
        .join(F.broadcast(qterms), on="term")
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "bm25")
    )
