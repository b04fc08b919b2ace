"""Dataset wrappers wiring each source's pure transform pipeline into the
populate/provenance contract.

The reference binds each source to an ``AbstractManager`` subclass discovered
through setuptools entry points (``/root/reference/src/bio2bel/utils.py:146-167``);
here every source is a :class:`~bio2bel_spark.dataset.Dataset` subclass in the
module registry. Raw inputs arrive as DataFrames (tests / notebooks) or as
file paths (CLI) — the download step itself is environment-specific and lives
in :mod:`bio2bel_spark.ingest`.

Input resolution order per logical input name:
1. ``input_dfs[name]`` — a DataFrame handed in directly;
2. ``input_paths[name]`` — a TSV/CSV/parquet path read with the source's
   declared schema;
3. env var ``BIO2BEL_SPARK_INPUT_{MODULE}_{NAME}`` (upper-cased) — same as 2.

Required inputs missing at populate time raise ``Bio2BELMissingInputError``.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame

from bio2bel_spark.dataset import Dataset
from bio2bel_spark.exc import Bio2BELMissingInputError


class SourceDataset(Dataset, abstract=True):
    """Base for source-backed datasets: declared inputs + pure transform."""

    #: logical input name -> (required, schema DDL or None for inference)
    inputs: dict[str, tuple[bool, Optional[str]]] = {}

    def __init__(
        self,
        spark,
        warehouse: Optional[str] = None,
        input_dfs: Optional[dict[str, DataFrame]] = None,
        input_paths: Optional[dict[str, str]] = None,
    ):
        super().__init__(spark, warehouse)
        self.input_dfs = dict(input_dfs or {})
        self.input_paths = dict(input_paths or {})

    def _input(self, name: str) -> Optional[DataFrame]:
        if name in self.input_dfs:
            return self.input_dfs[name]
        required, schema = self.inputs[name]
        path = self.input_paths.get(name) or os.environ.get(
            f"BIO2BEL_SPARK_INPUT_{self.module_name.upper()}_{name.upper()}"
        )
        if path is None:
            if required:
                raise Bio2BELMissingInputError(
                    f"{self.module_name}: required input {name!r} not provided "
                    f"(pass input_dfs/input_paths or set "
                    f"BIO2BEL_SPARK_INPUT_{self.module_name.upper()}_{name.upper()})"
                )
            return None
        if path.endswith(".parquet") or os.path.isdir(path):
            return self.spark.read.parquet(path)
        reader = self.spark.read.option("header", True).option("sep", "\t")
        if schema:
            reader = reader.schema(schema)
        return reader.csv(path)


class TFRegulonsDataset(SourceDataset):
    """TF→target regulation edges (reference ``sources/tfregulons.py``)."""

    module_name = "tfregulons"
    tables = {"edges": None}
    inputs = {
        "raw": (
            True,
            "tf_hgnc_symbol STRING, target_hgnc_symbol STRING, effect INT, "
            "score STRING, pmids STRING",
        ),
        "hgnc_map": (True, "hgnc_symbol STRING, hgnc_id STRING"),
    }

    def _populate_tables(self, **kwargs):
        from bio2bel_spark.sources import tfregulons

        prepared = tfregulons.prepare(self._input("raw"), self._input("hgnc_map"))
        return {"edges": tfregulons.to_edges(prepared)}


class BioGRIDDataset(SourceDataset):
    """Protein-interaction edges + rejects (reference ``sources/biogrid.py``)."""

    module_name = "biogrid"
    tables = {"edges": None, "rejects": None}
    inputs = {
        "raw": (True, None),
        "biogrid_map": (False, "biogrid_id STRING, ncbigene_id STRING"),
        "uniprot_map": (False, "uniprot_id STRING, ncbigene_id STRING"),
    }

    def _populate_tables(self, **kwargs):
        from bio2bel_spark.sources import biogrid

        edges, rejects = biogrid.process(
            self.spark,
            self._input("raw"),
            self._input("biogrid_map"),
            self._input("uniprot_map"),
        )
        return {"edges": edges, "rejects": rejects}


class IntactDataset(SourceDataset):
    """Qualified interaction edges + rejects (reference ``sources/intact.py``)."""

    module_name = "intact"
    tables = {"edges": None, "rejects": None}
    inputs = {
        "raw": (True, None),
        "uniprot_ncbigene": (False, "uniprot_id STRING, ncbigene_id STRING"),
        "ncbigene_names": (False, "ncbigene_id STRING, name STRING"),
        "uniprot_mnemonics": (False, "uniprot_id STRING, mnemonic STRING"),
        "chebi_names": (False, "chebi_id STRING, name STRING"),
        "complexportal": (False, "intact_id STRING, complexportal_id STRING"),
        "reactome": (False, "intact_id STRING, reactome_id STRING"),
    }

    def _populate_tables(self, **kwargs):
        from bio2bel_spark.sources import intact

        edges, rejects = intact.process(
            self.spark,
            self._input("raw"),
            uniprot_ncbigene=self._input("uniprot_ncbigene"),
            ncbigene_names=self._input("ncbigene_names"),
            uniprot_mnemonics=self._input("uniprot_mnemonics"),
            chebi_names=self._input("chebi_names"),
            complexportal=self._input("complexportal"),
            reactome=self._input("reactome"),
        )
        return {"edges": edges, "rejects": rejects}


class HMDDDataset(SourceDataset):
    """miRNA→disease regulation edges (reference ``sources/hmdd.py``)."""

    module_name = "hmdd"
    tables = {"edges": None, "rejects": None}
    inputs = {
        "raw": (
            True,
            "category STRING, mir STRING, disease STRING, pmid STRING, "
            "description STRING",
        ),
        "mirna_grounding": (True, None),
        "disease_grounding": (True, None),
    }

    def _populate_tables(self, **kwargs):
        from bio2bel_spark.sources import hmdd

        edges, rejects = hmdd.process(
            self._input("raw"),
            self._input("mirna_grounding"),
            self._input("disease_grounding"),
        )
        return {"edges": edges, "rejects": rejects}


class GODataset(SourceDataset):
    """Gene↔GO-process association edges (reference ``sources/go.py``)."""

    module_name = "go"
    tables = {"edges": None}
    inputs = {
        "raw": (
            True,
            "source_id STRING, source_name STRING, taxonomy_id STRING, "
            "target_id STRING, target_label STRING, negated BOOLEAN",
        ),
        "uniprot_hgnc": (True, "uniprot_id STRING, hgnc_id STRING"),
        "hgnc_ncbigene": (True, "hgnc_id STRING, ncbigene_id STRING"),
    }

    def _populate_tables(self, **kwargs):
        from bio2bel_spark.sources import go

        processed = go.process_associations(
            self._input("raw"), self._input("uniprot_hgnc"), self._input("hgnc_ncbigene")
        )
        return {"edges": go.to_edges(processed)}


class RheaDataset(SourceDataset):
    """Reaction nodes with nested participants (reference ``sources/rhea.py``);
    input is an N-triples-shaped ``(s, p, o)`` table."""

    module_name = "rhea"
    tables = {"reactions": None}
    inputs = {"triples": (True, "s STRING, p STRING, o STRING")}

    def _populate_tables(self, **kwargs):
        from bio2bel_spark.sources import rhea

        return {"reactions": rhea.to_reaction_nodes(self._input("triples"))}


class CircRNADiseaseDataset(SourceDataset):
    """circRNA–disease association rows (reference
    ``sources/circrnadisease.py``)."""

    module_name = "circrnadisease"
    tables = {"associations": None}
    inputs = {"raw": (True, None)}

    def _populate_tables(self, **kwargs):
        from bio2bel_spark.sources import circrnadisease

        prepared = circrnadisease.prepare(self._input("raw"))
        return {"associations": circrnadisease.associations(prepared)}


class PIDDataset(SourceDataset):
    """Pathway membership edges from CX aspects (reference ``sources/pid.py``)."""

    module_name = "pid"
    tables = {"edges": None}
    inputs = {
        "nodes": (True, None),
        "node_attrs": (True, None),
        "edges": (True, None),
        "edge_attrs": (False, None),
        "hgnc_map": (True, "hgnc_symbol STRING, hgnc_id STRING"),
    }

    def _populate_tables(self, **kwargs):
        from bio2bel_spark.sources import pid

        resolved = pid.resolve_nodes(
            self._input("nodes"),
            self._input("node_attrs"),
            self._input("hgnc_map"),
        )
        return {
            "edges": pid.to_edges(
                self._input("edges"), resolved, self._input("edge_attrs")
            )
        }


ALL_DATASETS = [
    TFRegulonsDataset,
    BioGRIDDataset,
    IntactDataset,
    HMDDDataset,
    GODataset,
    RheaDataset,
    PIDDataset,
    CircRNADiseaseDataset,
]
