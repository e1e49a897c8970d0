"""Structured Streaming surfaces: continuous seed ingestion into the
frontier, with watermarked dedup and per-host rate aggregation."""
