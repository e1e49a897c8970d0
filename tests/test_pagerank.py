"""Fixed-iteration PageRank (operators/graph.pagerank).

Covers: parity with a plain-Python reference (incl. multi-edges and a
dangling node), authority ordering on a hub graph, rank-mass sanity,
and iteration-count monotonic convergence toward the closed-form
stationary ranks of a symmetric cycle."""

from __future__ import annotations

from publicationsretriever_spark.operators.graph import pagerank


def _py_pagerank(edges, iters=3, d=0.85, iter_round=12):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    pr = {v: round(1.0 / n, iter_round) for v in nodes}
    for _ in range(iters):
        s = {v: 0.0 for v in nodes}
        for u, v in edges:
            s[v] += pr[u] / out[u]
        pr = {
            v: round((1 - d) / n + d * s[v], iter_round) for v in nodes
        }
    return {v: round(p, 6) for v, p in pr.items()}


EDGES = [
    (0, 1),
    (0, 1),  # multi-edge: parallel link counts twice in out_deg
    (0, 2),
    (1, 2),
    (2, 0),
    (3, 2),  # 3 has out-edges but nothing points at it
    (2, 4),  # 4 is dangling (no out-edges): its rank leaks
]


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_pagerank_matches_python_reference(spark):
    got = {
        r["node"]: r["pr"] for r in pagerank(_df(spark, EDGES)).collect()
    }
    assert got == _py_pagerank(EDGES)


def test_hub_gets_highest_rank(spark):
    # star: everyone links to 9
    edges = [(i, 9) for i in range(9)]
    got = {r["node"]: r["pr"] for r in pagerank(_df(spark, edges)).collect()}
    assert got[9] == max(got.values())
    assert all(got[9] > got[i] for i in range(9))


def test_cycle_converges_to_uniform(spark):
    # directed cycle: stationary distribution is uniform 1/N at every
    # iteration count — no drift as iters grows
    edges = [(i, (i + 1) % 5) for i in range(5)]
    for iters in (1, 4):
        got = {
            r["node"]: r["pr"]
            for r in pagerank(_df(spark, edges), iters=iters).collect()
        }
        assert set(got.values()) == {0.2}, (iters, got)


def test_rank_mass_bounded(spark):
    # with the dangling leak, total mass is <= 1 and > (1-d)
    got = [r["pr"] for r in pagerank(_df(spark, EDGES)).collect()]
    assert 0.15 < sum(got) <= 1.0 + 1e-9
