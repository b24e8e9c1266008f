"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — the ops a 100 TB web-text pipeline needs beyond
per-document extraction."""
