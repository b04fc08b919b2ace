"""ComPath-style pathway↔protein query surface as single Catalyst plans.

Re-expresses every query in the reference's ComPath manager
(``/root/reference/src/bio2bel/compath/manager.py``) over three DataFrames —
``pathway(pathway_id, prefix, identifier, name)``,
``protein(protein_id, entrez_id, hgnc_id, hgnc_symbol)``,
``membership(pathway_id, protein_id)`` (the M2M link table declared at
``sources/pid.py:217-256``) — with the reference's self-acknowledged N+1
patterns ("FIXME… better query" ``compath/manager.py:177``, "terribly
inefficient" ``:196``) collapsed into one distributed plan each.

Scale notes
-----------
* Query gene-sets are tiny vs. the protein table → every seed lookup is a
  **broadcast** semi/inner join (no shuffle of the big side).
* ``membership`` is the big fact table at 100 TB scale; all aggregations over
  it are partial-aggregated map-side by Catalyst before the shuffle.
* ``pathway`` is a dimension → broadcast joined onto aggregated results, so
  the only full shuffle in the enrichment query is the groupBy on
  ``pathway_id``.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PathwayStore:
    """Query surface over pathway / protein / membership DataFrames.

    Column names are configurable so the same operators bind to the
    bio-shaped tables (FIXTURES.md §3) or to any M2M trio (e.g. the driver's
    orders↔part via lineitem for the oracle checks).
    """

    def __init__(
        self,
        pathway: DataFrame,
        protein: DataFrame,
        membership: DataFrame,
        pathway_key: str = "pathway_id",
        protein_key: str = "protein_id",
        symbol_col: str = "hgnc_symbol",
        pathway_name_col: str = "name",
    ):
        self.pathway = pathway
        self.protein = protein
        self.membership = membership
        self.pk = pathway_key
        self.rk = protein_key
        self.symbol = symbol_col
        self.pname = pathway_name_col

    # ----------------------------------------------------------- counts (A1/A2)
    def count_pathways(self) -> int:
        """``count_pathways`` (``compath/manager.py:79-83``)."""
        return self.pathway.count()

    def count_proteins(self) -> int:
        """``count_proteins`` (``compath/manager.py:91-96``)."""
        return self.protein.count()

    def summarize(self) -> dict[str, int]:
        """``summarize`` (``compath/manager.py:98-103``)."""
        return {"pathways": self.count_pathways(), "proteins": self.count_proteins()}

    # ----------------------------------------------------- point lookups (P10/O3)
    def get_pathway_by_id(self, identifier: str) -> Optional[dict]:
        """``get_pathway_by_id`` one-or-none (``compath/manager.py:238-245``)."""
        rows = self.pathway.filter(F.col("identifier") == identifier).limit(2).collect()
        if len(rows) > 1:
            raise ValueError(f"multiple pathways for identifier {identifier!r}")
        return rows[0].asDict() if rows else None

    def get_proteins_by_symbols(self, symbols: Iterable[str]) -> DataFrame:
        """IN-set lookup (``compath/manager.py:122-137``). Small literal sets
        stay as ``isin`` (pushed to the scan); the general path broadcasts."""
        symbols = list(symbols)
        return self.protein.filter(F.col(self.symbol).isin(symbols))

    # ------------------------------------------------------------- search (P11)
    def search_pathways(self, query: str, limit: Optional[int] = None) -> DataFrame:
        """Case-insensitive substring search with OR + limit
        (``search_pathways``, ``compath/manager.py:155-169``)."""
        q = query.lower()
        df = self.pathway.filter(
            F.lower(F.col(self.pname)).contains(q)
            | F.lower(F.col("identifier")).contains(q)
        )
        return df.limit(limit) if limit else df

    def search_genes(self, query: str, limit: Optional[int] = None) -> DataFrame:
        """``search_genes`` (``compath/manager.py:139-153``)."""
        q = query.lower()
        df = self.protein.filter(F.lower(F.col(self.symbol)).contains(q))
        return df.limit(limit) if limit else df

    # -------------------------------------------------------- relational (J1/J2)
    def pathway_gene_pairs(self) -> DataFrame:
        """Explicit join + 2-col projection + not-null filter
        (``get_pathway_id_to_symbols`` base query, ``compath/manager.py:294-301``)."""
        return (
            self.membership.join(self.protein, self.rk)
            .filter(F.col(self.symbol).isNotNull())
            .select(self.pk, self.symbol)
        )

    def pathway_to_symbols(self) -> DataFrame:
        """Grouped multidict: pathway → set of gene symbols
        (``_help_get_pathway_to_protein``, ``compath/manager.py:289-292``)."""
        return self.pathway_gene_pairs().groupBy(self.pk).agg(
            F.sort_array(F.collect_set(self.symbol)).alias("symbols")
        )

    # ----------------------------------------------------- distributions (A4/A5)
    def pathway_size_distribution(self, min_size: int = 0) -> DataFrame:
        """Pathway-size distribution with HAVING count>0
        (``compath/manager.py:303-315``)."""
        return (
            self.membership.groupBy(self.pk)
            .agg(F.countDistinct(self.rk).alias("pathway_size"))
            .filter(F.col("pathway_size") > min_size)
        )

    def gene_pathway_count_distribution(self) -> DataFrame:
        """Gene → number of pathways it appears in
        (``compath/manager.py:317-333``)."""
        return (
            self.pathway_gene_pairs()
            .groupBy(self.symbol)
            .agg(F.countDistinct(self.pk).alias("n_pathways"))
            .filter(F.col("n_pathways") > 0)
        )

    # ------------------------------------------------------- enrichment (§3.2)
    def query_symbols(self, symbols: Iterable[str]) -> DataFrame:
        """The enrichment query ``query_hgnc_symbols``
        (``compath/manager.py:203-236``) as ONE plan — no N+1.

        Returns one row per pathway hit by the gene set:
        ``(pathway_id, pathway_name, mapped_proteins, pathway_size,
        gene_set)``.

        Physical shape: broadcast the seed symbols; membership pairs are
        deduplicated FIRST (one shuffle with map-side partial dedup), so the
        per-pathway aggregate needs only plain counts — two distinct
        aggregates in one groupBy would force Catalyst's Expand (3× row
        inflation) through both exchanges. Pathway sizes come from the same
        pass via a conditional count instead of a second scan + join.
        """
        seeds = list(symbols)
        # no null-symbol filter here: pathway_size counts ALL members (the
        # reference's len(pathway.proteins)); a null symbol never matches isin
        pairs = (
            self.membership.select(self.pk, self.rk)
            .distinct()
            .join(self.protein, self.rk)
        )
        hit = F.col(self.symbol).isin(seeds)
        per_pathway = (
            pairs.groupBy(self.pk)
            .agg(
                F.count(F.when(hit, F.col(self.rk))).alias("mapped_proteins"),
                F.count(F.lit(1)).alias("pathway_size"),
                F.sort_array(
                    F.collect_set(F.when(hit, F.col(self.symbol)))
                ).alias("gene_set"),
            )
            .filter(F.col("mapped_proteins") > 0)
        )
        return per_pathway.join(
            F.broadcast(self.pathway.select(self.pk, F.col(self.pname).alias("pathway_name"))),
            self.pk,
        ).select(
            self.pk, "pathway_name", "mapped_proteins", "pathway_size", "gene_set"
        )

    # -------------------------------------------------------- enrichment (J3/J7)
    def pathways_for_proteins(self, protein_keys: DataFrame) -> DataFrame:
        """Key-set lookup join (``get_pathways_by_hgnc_ids`` shape,
        ``compath/manager.py:194-201``): semi-join proteins by the key set,
        expand to distinct pathways. Fixes the reference's N+1."""
        return (
            self.membership.join(F.broadcast(protein_keys), self.rk, "left_semi")
            .select(self.pk)
            .distinct()
            .join(self.pathway, self.pk)
        )

    def pathway_multiplicity(self, protein_keys: DataFrame) -> DataFrame:
        """Counter-over-flattened-join (``compath/manager.py:210-216``):
        pathway → how many of the given proteins it contains."""
        return (
            self.membership.join(F.broadcast(protein_keys), self.rk, "left_semi")
            .groupBy(self.pk)
            .agg(F.countDistinct(self.rk).alias("n_proteins"))
        )
