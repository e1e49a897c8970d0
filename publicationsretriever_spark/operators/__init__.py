"""Relational operators of the crawl engine and the training-data
pipeline: best-url selection, seen-set sketches, dedup families,
similarity search, text analysis, multimodal plumbing."""
