"""Catalog mode with the OPTIONAL delta tables (order_log via
record_order=True, pages_html via store_html=True) across a compaction
boundary — regression test for the round-2 advice: the catalog-branch
CrawlState used to drop these handles, so compaction hit
prior[name]=None and crashed, and the tables silently stopped
accumulating."""

from __future__ import annotations

from publicationsretriever_spark.plans.rounds import CrawlEngine
from publicationsretriever_spark.sources.catalog import SnapshotCatalog
from publicationsretriever_spark.sources.synthetic_web import SyntheticWeb


def _key(df):
    return sorted((r["id"], r["sourceUrl"], r["docOrDatasetUrl"], r["round"])
                  for r in df.collect())


def test_catalog_optional_deltas_survive_compaction(spark, tmp_path):
    # SyntheticWeb (not SpillWeb): the html sink needs actual pages
    web = SyntheticWeb(seed=21, n_hosts=4, pages_per_host_max=8)
    kw = dict(num_buckets=4, host_quota=8, record_order=True, store_html=True)
    reference = CrawlEngine(spark, web, compact_every=99, **kw).crawl(
        web.seeds_df(spark), max_rounds=4
    )

    cat = SnapshotCatalog(str(tmp_path / "cat"))
    # compact_every=2 forces a compaction within 4 rounds — this used
    # to AttributeError on prior["order_log"].unionByName
    state = CrawlEngine(spark, web, compact_every=2, **kw).crawl(
        web.seeds_df(spark), max_rounds=4, catalog=cat
    )

    ref_order = sorted(map(tuple, reference.order_log.collect()))
    ref_html = sorted(map(tuple, reference.pages_html.collect()))
    assert state.order_log is not None and state.pages_html is not None
    assert sorted(map(tuple, state.order_log.collect())) == ref_order
    assert sorted(map(tuple, state.pages_html.collect())) == ref_html
    assert _key(state.results) == _key(reference.results)
    assert ref_order, "order_log empty — test web produced no fetches?"
    assert ref_html, "pages_html empty — test web produced no pages?"

    # resume from the catalog: the optional tables flow back into state
    resumed = CrawlEngine(spark, web, compact_every=2, **kw).crawl(
        None, max_rounds=4, catalog=cat, resume=True
    )
    assert sorted(map(tuple, resumed.order_log.collect())) == ref_order
    assert sorted(map(tuple, resumed.pages_html.collect())) == ref_html
