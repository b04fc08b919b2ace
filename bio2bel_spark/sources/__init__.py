"""Per-source DataFrame pipelines: intact, biogrid, tfregulons, hmdd, go,
rhea, pid. Each module exposes a pure ``process(...) -> DataFrame`` transform
from the raw feed shape (FIXTURES.md §4-7) to the kg_edges/kg_nodes schema,
plus a rejects side-output (SURVEY §2.5 A8)."""
