"""Query-surface operators: pathways (ComPath), graph (BEL), namespace,
dedup, similarity search, text analysis, multimodal plumbing."""
