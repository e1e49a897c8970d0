"""Delta-state compaction: the union of per-round delta parts is
periodically rewritten as ONE part (the Iceberg MERGE-compaction
analogue), both in-memory (localCheckpoint parts) and in the snapshot
catalog — without changing any result, and with exact resume across a
compaction boundary."""

from __future__ import annotations

from publicationsretriever_spark.plans.rounds import CrawlEngine
from publicationsretriever_spark.sources.catalog import SnapshotCatalog
from test_blocking_conformance import SpillWeb


def _key(df):
    return sorted((r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
                  for r in df.collect())


def test_compaction_and_catalog_resume_across_boundary(spark, tmp_path):
    """One reference crawl (no compaction), then a catalog crawl with
    compact_every=2 interrupted after round 2 and resumed: the delta
    path lists stay bounded, and both the compacted in-memory state and
    the resumed-across-compaction state match the reference exactly."""
    web = SpillWeb()
    reference = CrawlEngine(spark, web, num_buckets=4, host_quota=8,
                            compact_every=99).crawl(
        web.seeds_df(spark), max_rounds=5
    )

    cat = SnapshotCatalog(str(tmp_path / "cat"))
    CrawlEngine(spark, web, num_buckets=4, host_quota=8,
                compact_every=2).crawl(
        web.seeds_df(spark), max_rounds=3, catalog=cat
    )
    # the manifest's delta path list is bounded by compact_every
    for snap in cat.snapshots():
        n_paths = len(snap["tables"]["results"]["paths"])
        assert n_paths <= 2, f"{snap['snapshot_id']}: {n_paths} parts"
    resumed = CrawlEngine(spark, web, num_buckets=4, host_quota=8,
                          compact_every=2).crawl(
        None, max_rounds=5, catalog=cat, resume=True
    )
    assert _key(resumed.results) == _key(reference.results)
    assert set(r[0] for r in resumed.seen.collect()) == set(
        r[0] for r in reference.seen.collect()
    )
