"""Crawl-conformance tooling: the sequential oracle the distributed
engine is validated against."""
