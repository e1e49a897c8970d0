"""SnapshotCatalog.diff_table: incremental consumption between
snapshots — synthetic-table semantics plus a real crawl-catalog diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from publicationsretriever_spark.plans.rounds import CrawlEngine
from publicationsretriever_spark.sources.catalog import SnapshotCatalog
from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb

pytestmark = pytest.mark.usefixtures("spark")


def _commit(cat, spark, rows, round_no):
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    return cat.commit({"t": df}, round_no=round_no, lineage={})


def test_diff_semantics_added_removed_changed(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    s1 = _commit(cat, spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)], 0)
    s2 = _commit(
        cat,
        spark,
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)],  # 2 changed, 3 gone, 4 new
        1,
    )
    out = {
        r["k"]: (r["change"], r["v"], r["w"])
        for r in cat.diff_table(spark, "t", ["k"], s1, s2).collect()
    }
    assert out == {
        2: ("changed", "B", 20),  # new side's values
        3: ("removed", "c", 30),  # old side's values
        4: ("added", "d", 40),
    }
    # unchanged key 1 not emitted
    assert 1 not in out


def test_diff_from_none_is_all_added(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    s1 = _commit(cat, spark, [(1, "a", 10), (2, "b", 20)], 0)
    out = cat.diff_table(spark, "t", ["k"], None, s1)
    assert {r["change"] for r in out.collect()} == {"added"}
    assert out.count() == 2


def test_diff_null_keys_and_values(spark, tmp_path):
    """eqNullSafe key join: a NULL key matches itself across
    snapshots; value hash treats NULL consistently."""
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    s1 = _commit(cat, spark, [(None, "a", 10), (1, None, 20)], 0)
    s2 = _commit(cat, spark, [(None, "a", 10), (1, None, 21)], 1)
    out = {
        r["k"]: r["change"]
        for r in cat.diff_table(spark, "t", ["k"], s1, s2).collect()
    }
    assert out == {1: "changed"}  # NULL-key row unchanged -> absent


def test_diff_crawl_rounds_results_grow_monotonically(spark, tmp_path):
    """On a real crawl catalog, consecutive-round diffs of the results
    table are append-only: no 'removed', no 'changed', and the added
    rows are exactly the round delta."""
    web = SyntheticWeb(seed=7, n_hosts=3, pages_per_host_max=6)
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    CrawlEngine(spark, web, num_buckets=4, host_quota=8).crawl(
        web.seeds_df(spark), max_rounds=2, catalog=cat
    )
    snaps = [s["snapshot_id"] for s in cat.snapshots()]
    assert len(snaps) >= 2
    key = ["id", "sourceUrl", "docOrDatasetUrl"]
    d = cat.diff_table(spark, "results", key, snaps[0], snaps[1])
    changes = {r["change"] for r in d.select("change").distinct().collect()}
    assert changes <= {"added"}
    _, t0 = cat.load(spark, snaps[0])
    _, t1 = cat.load(spark, snaps[1])
    assert d.count() == t1["results"].count() - t0["results"].count()


def test_diff_compares_hashes_not_rows_in_plan(spark, tmp_path):
    """Scale contract: the full-outer join's inputs project to
    (keys, xxhash64) — the wide value columns must not cross the
    join. Assert the join operators' output carries _vh, not v/w."""
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    s1 = _commit(cat, spark, [(1, "a", 10)], 0)
    s2 = _commit(cat, spark, [(1, "b", 10)], 1)
    plan = (
        cat.diff_table(spark, "t", ["k"], s1, s2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    m = re.search(r"Join FullOuter[^\n]*\n((?:.|\n)*)", plan)
    assert m is not None
    # the full-outer join subtree must reference the hash column
    assert "_vh" in plan


def test_diff_identical_snapshots_is_empty(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    s1 = _commit(cat, spark, [(1, "a", 10)], 0)
    s2 = _commit(cat, spark, [(1, "a", 10)], 1)
    assert cat.diff_table(spark, "t", ["k"], s1, s2).count() == 0


def test_diff_detects_null_position_shift_and_null_keys(spark, tmp_path):
    """Two NULL traps: (a) xxhash64 skips NULLs, so ('x', NULL) ->
    (NULL, 'x') hashed identically and the change was missed; (b) the
    join-back used plain equality, so NULL-keyed deltas vanished."""
    from publicationsretriever_spark.sources.catalog import (
        SnapshotCatalog,
    )

    cat = SnapshotCatalog(str(tmp_path / "cat"))
    schema = "k string, a string, b string"
    t1 = spark.createDataFrame(
        [("r1", "x", None), (None, "old-a", "old-b")], schema
    )
    sid1, meta, _ = cat.write_tables(spark, {"t": t1})
    cat.finish_commit(sid1, meta, round_no=0, lineage={})
    t2 = spark.createDataFrame(
        [("r1", None, "x"), (None, "new-a", "old-b")], schema
    )
    sid2, meta2, _ = cat.write_tables(spark, {"t": t2})
    cat.finish_commit(sid2, meta2, round_no=1, lineage={})

    out = {
        r["k"]: r
        for r in cat.diff_table(spark, "t", ["k"], sid1, sid2).collect()
    }
    # (a) the NULL-position swap is a real change
    assert "r1" in out and out["r1"]["change"] == "changed"
    assert out["r1"]["a"] is None and out["r1"]["b"] == "x"
    # (b) the NULL-keyed changed row survives the join-back
    assert None in out and out[None]["change"] == "changed"
    assert out[None]["a"] == "new-a"
