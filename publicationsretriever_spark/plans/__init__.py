"""Round orchestration: the frontier scheduler, fetch stage, and
snapshot/checkpoint lineage."""
