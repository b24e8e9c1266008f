"""Spark layer: batching, partitioning, lineage, resume (no conversion logic)."""
