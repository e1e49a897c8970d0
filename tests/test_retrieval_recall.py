"""retrieval_recall_at_k: hand-computed ranks on a crafted corpus,
naive-Python parity on a pseudo-random set, missing-truth drop, and
the no-sort / broadcast-only plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from publicationsretriever_spark.operators.similarity import (
    retrieval_recall_at_k,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "pair_id long, embedding array<float>"
    )


def test_recall_hand_computed(spark):
    # corpus: 3 axis-ish vectors; queries aimed so ranks are known
    corpus = _mk(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.7, 0.7]),
    ])
    queries = _mk(spark, [
        (0, [1.0, 0.1]),   # closest to corpus 0 -> rank 1
        (1, [0.9, 0.5]),   # cosine: c2 > c0 > c1 -> true rank 3
        (2, [0.6, 0.8]),   # c2 vs c1 vs c0: true (c2) rank? compute
    ])
    out = {r["k"]: r for r in
           retrieval_recall_at_k(queries, corpus, [1, 2, 3]).collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.hypot(*a) * math.hypot(*b)), 6)

    cvecs = {0: [1.0, 0.0], 1: [0.0, 1.0], 2: [0.7, 0.7]}
    qvecs = {0: [1.0, 0.1], 1: [0.9, 0.5], 2: [0.6, 0.8]}
    ranks = {}
    for qid, qv in qvecs.items():
        ts = cos(cvecs[qid], qv)
        beat = sum(
            1 for cid, cv in cvecs.items()
            if cos(cv, qv) > ts or (cos(cv, qv) == ts and cid < qid)
        )
        ranks[qid] = beat + 1
    n = len(ranks)
    for k in (1, 2, 3):
        hits = sum(1 for r in ranks.values() if r <= k)
        assert out[k]["n_queries"] == n
        assert out[k]["hits"] == hits
        assert abs(out[k]["recall"] - round(hits / n, 6)) < 1e-9


def test_recall_naive_parity_pseudorandom(spark):
    import random

    rng = random.Random(7)
    dim = 8
    cvecs = {i: [rng.uniform(-1, 1) for _ in range(dim)]
             for i in range(40)}
    # queries = noisy copies of their true match
    qvecs = {i: [v + rng.uniform(-0.3, 0.3) for v in cvecs[i]]
             for i in range(0, 40, 3)}
    corpus = _mk(spark, [(i, v) for i, v in cvecs.items()])
    queries = _mk(spark, [(i, v) for i, v in qvecs.items()])
    out = {r["k"]: r for r in
           retrieval_recall_at_k(queries, corpus, [1, 5]).collect()}

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return round(d / (na * nb), 6)

    # float32 storage: python side must read back the collected vecs
    cv32 = {r["pair_id"]: r["embedding"] for r in corpus.collect()}
    qv32 = {r["pair_id"]: r["embedding"] for r in queries.collect()}
    ranks = {}
    for qid, qv in qv32.items():
        ts = cos(cv32[qid], qv)
        beat = sum(
            1 for cid, cv in cv32.items()
            if cos(cv, qv) > ts or (cos(cv, qv) == ts and cid < qid)
        )
        ranks[qid] = beat + 1
    for k in (1, 5):
        hits = sum(1 for r in ranks.values() if r <= k)
        assert out[k]["hits"] == hits, (k, ranks)
        assert out[k]["n_queries"] == len(ranks)


def test_recall_drops_queries_without_truth(spark):
    corpus = _mk(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    queries = _mk(spark, [(0, [1.0, 0.0]), (9, [0.5, 0.5])])  # 9 absent
    out = retrieval_recall_at_k(queries, corpus, [1]).collect()
    assert out[0]["n_queries"] == 1
    assert out[0]["hits"] == 1


def test_recall_plan_has_no_sort_merge_join(spark):
    corpus = _mk(spark, [(i, [float(i), 1.0]) for i in range(8)])
    queries = _mk(spark, [(i, [float(i), 1.0]) for i in range(4)])
    plan = (
        retrieval_recall_at_k(queries, corpus, [1, 5])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan


def test_hard_negatives_excludes_true_pair_and_ranks(spark):
    from publicationsretriever_spark.operators.similarity import (
        hard_negatives,
    )

    corpus = _mk(spark, [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [0.5, 0.5]),
    ])
    queries = _mk(spark, [(0, [1.0, 0.05]), (2, [0.1, 1.0])])
    out = hard_negatives(queries, corpus, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert all(r["neg_id"] != qid for r in rows)  # never the pair
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] \
            == list(range(1, len(rows) + 1))
        assert len(rows) == 2
    # q0 points at corpus0: hardest negative must be corpus1
    assert sorted(by_q[0], key=lambda r: r["rank"])[0]["neg_id"] == 1


def test_hard_negatives_python_parity(spark):
    import random

    from publicationsretriever_spark.operators.similarity import (
        hard_negatives,
    )

    rng = random.Random(11)
    cvecs = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(30)}
    qvecs = {i: [v + rng.uniform(-0.4, 0.4) for v in cvecs[i]]
             for i in range(0, 30, 4)}
    corpus = _mk(spark, list(cvecs.items()))
    queries = _mk(spark, list(qvecs.items()))
    out = hard_negatives(queries, corpus, k=3).collect()
    cv32 = {r["pair_id"]: r["embedding"] for r in corpus.collect()}
    qv32 = {r["pair_id"]: r["embedding"] for r in queries.collect()}

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return round(d / (na * nb), 6)

    for qid, qv in qv32.items():
        want = sorted(
            ((cos(cv, qv), cid) for cid, cv in cv32.items() if cid != qid),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        got = sorted(
            [r for r in out if r["query_id"] == qid],
            key=lambda r: r["rank"],
        )
        assert [(r["cos_sim"], r["neg_id"]) for r in got] == want, qid
