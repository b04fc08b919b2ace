"""Sinks: triples TSV, edge lists, JSON interchange (SURVEY §2.1 S13-S17)."""
