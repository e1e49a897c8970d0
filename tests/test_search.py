"""BM25 keyword retrieval (operators/search.bm25_topk).

Covers: score parity with a plain-Python BM25 reference, idf ordering
(rarer term outranks common term), df correctness under the
semi-joined posting list, multi-query isolation, and the k cut."""

from __future__ import annotations

import math

from publicationsretriever_spark.operators.search import bm25_topk


def _py_bm25(texts, query, k1=1.2, b=0.75):
    import re

    docs = {
        did: [t for t in re.split("[^a-z0-9]+", txt.lower()) if t]
        for did, txt in texts.items()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    qts = []
    for t in re.split("[^a-z0-9]+", query.lower()):
        if t and t not in qts:
            qts.append(t)
    out = {}
    for did, toks in docs.items():
        dl = len(toks)
        s = 0.0
        for t in qts:
            tf = toks.count(t)
            if tf == 0:
                continue
            df = sum(1 for d in docs.values() if t in d)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        if s > 0:
            out[did] = round(s, 6)
    return out


TEXTS = {
    0: "spark join hash join shuffle broadcast join",
    1: "window agg scan spark table row",
    2: "hash table row scan filter filter",
    3: "spark spark spark window hash",
    4: "customer order lineitem join key",
    5: "the quick brown fox jumps over the lazy dog",
}


def _docs(spark):
    rows = [(did, txt) for did, txt in TEXTS.items()]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, qs):
    rows = list(enumerate(qs))
    return spark.createDataFrame(rows, "query_id long, query string")


def test_bm25_matches_python_reference(spark):
    qs = ["hash join", "spark window", "fox"]
    out = bm25_topk(_docs(spark), _queries(spark, qs), k=10).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], {})[r["doc_id"]] = r["bm25"]
    for qid, q in enumerate(qs):
        assert got[qid] == _py_bm25(TEXTS, q), q


def test_bm25_rare_term_outranks_common(spark):
    # 'fox' appears in one doc, 'spark' in three: for the combined
    # query the fox doc's single rare term beats a one-hit spark doc
    out = bm25_topk(_docs(spark), _queries(spark, ["spark fox"]), k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[5]["bm25"] > rows[1]["bm25"]


def test_bm25_rank_window_and_k(spark):
    out = bm25_topk(_docs(spark), _queries(spark, ["join scan"]), k=2)
    rows = out.collect()
    assert len(rows) == 2
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        1,
        2,
    ]
    # doc 0 has 3 'join' hits — must take rank 1
    assert sorted(rows, key=lambda r: r["rank"])[0]["doc_id"] == 0


def test_bm25_queries_are_isolated(spark):
    out = bm25_topk(
        _docs(spark), _queries(spark, ["customer", "fox"]), k=10
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q == {0: {4}, 1: {5}}


def test_bm25_null_text_docs_do_not_skew_constants(spark):
    """size(NULL) = -1 under default sizeOfNull: NULL-text docs used
    to SUBTRACT from sumdl and inflate N. Scores must be identical
    with and without NULL-text rows in the corpus."""
    from publicationsretriever_spark.operators.search import bm25_topk

    clean = spark.createDataFrame(
        [(1, "spark engine fast"), (2, "engine room"),
         (3, "fast data engine")],
        "doc_id long, text string",
    )
    noisy = clean.unionByName(spark.createDataFrame(
        [(10, None), (11, None)], "doc_id long, text string"
    ))
    q = spark.createDataFrame([(0, "engine fast")],
                              "query_id long, query string")
    a = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_topk(clean, q, k=3).collect()
    )
    b = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_topk(noisy, q, k=3).collect()
    )
    assert a == b and len(a) == 3
