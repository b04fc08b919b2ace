"""Rhea reaction pipeline: SPARQL-over-RDF re-expressed as triple-table joins.

Parity with ``/root/reference/src/bio2bel/sources/rhea.py``:

* the reaction SELECT (``:38-47``) — ``?reaction rh:equation ?eq ;
  rh:bidirectionalReaction ?bdr ; rh:id ?id`` — becomes self-joins on a
  ``triples(s, p, o)`` DataFrame (produced by
  :func:`bio2bel_spark.ingest.read_ntriples`);
* the per-side participant SELECT with OPTIONALs (``:75-89``) becomes left
  joins (OPTIONAL ≡ left outer join in SPARQL algebra);
* compounds whose reactive-part resolution yields ≠1 node are skipped
  (``:119-131``), implemented with a group-count filter;
* output: Reaction nodes with ``reactants``/``products`` as
  ``ARRAY<STRUCT<namespace,identifier,name>>`` (nested type exercise —
  SURVEY §7.4 hard part 6).

Every join key is an entity URI: at 100 TB the triples table shuffles on s/o
once per pattern; Catalyst reorders and AQE handles skew (popular predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODULE_NAME = "rhea"
RH = "http://rdf.rhea-db.org/"
CHEBI_NS = "http://purl.obolibrary.org/obo/CHEBI_"


def _pred(triples: DataFrame, predicate: str, s: str, o: str) -> DataFrame:
    return triples.filter(F.col("p") == RH + predicate).select(
        F.col("s").alias(s), F.col("o").alias(o)
    )


def reactions(triples: DataFrame) -> DataFrame:
    """Bidirectional reactions with id + equation (the first SPARQL SELECT)."""
    eq = _pred(triples, "equation", "reaction", "equation")
    bdr = _pred(triples, "bidirectionalReaction", "reaction", "bdr")
    rid = _pred(triples, "id", "reaction", "rhea_id")
    return eq.join(bdr, "reaction").join(rid, "reaction").drop("bdr")


def participants(triples: DataFrame) -> DataFrame:
    """Per reaction-side compound resolution (the second SPARQL SELECT).

    Output: ``(side_uri, compound, chebi_id, name)`` — one row per compound
    that resolved to exactly one CHEBI node.
    """
    contains = _pred(triples, "contains", "side", "participant")
    compound_of = _pred(triples, "compound", "participant", "compound")
    names = _pred(triples, "name", "compound", "compound_name")
    # OPTIONAL { ?compound rh:reactivePart ?part . ?part rh:chebi ?chebi .
    #            ?part rh:name ?part_name }
    part = _pred(triples, "reactivePart", "compound", "part")
    part_chebi = _pred(triples, "chebi", "part", "part_chebi")
    part_name = _pred(triples, "name", "part", "part_name")
    via_part = (
        part.join(part_chebi, "part").join(part_name, "part", "left").drop("part")
    )
    # OPTIONAL { ?compound rh:chebi ?chebi } / { ?compound rh:underlyingChebi ?chebi }
    direct = _pred(triples, "chebi", "compound", "direct_chebi")
    underlying = _pred(triples, "underlyingChebi", "compound", "underlying_chebi")

    base = (
        contains.join(compound_of, "participant")
        .join(names, "compound", "left")
        .join(via_part, "compound", "left")
        .join(direct, "compound", "left")
        .join(underlying, "compound", "left")
    )
    resolved = base.withColumn(
        "chebi_uri", F.coalesce("part_chebi", "direct_chebi", "underlying_chebi")
    ).filter(F.col("chebi_uri").isNotNull())
    resolved = resolved.select(
        "side",
        "compound",
        F.replace(F.col("chebi_uri"), F.lit(CHEBI_NS), F.lit("")).alias("chebi_id"),
        F.coalesce("part_name", "compound_name").alias("name"),
    ).distinct()
    # skip compounds with multiple reactive parts (reference :119-131)
    counts = resolved.groupBy("side", "compound").agg(F.count("*").alias("n"))
    return (
        resolved.join(counts, ["side", "compound"])
        .filter(F.col("n") == 1)
        .drop("n")
    )


def to_reaction_nodes(triples: DataFrame) -> DataFrame:
    """Reaction nodes with nested reactants/products arrays."""
    rxn = reactions(triples)
    parts = participants(triples)
    sides = parts.withColumn(
        "reaction", F.expr("substring(side, 1, length(side) - 2)")
    ).withColumn("which", F.expr("right(side, 2)"))
    agg = (
        sides.groupBy("reaction")
        .agg(
            F.collect_list(
                F.when(
                    F.col("which") == "_L",
                    F.struct(
                        F.lit("chebi").alias("namespace"),
                        F.col("chebi_id").alias("identifier"),
                        F.col("name").alias("name"),
                    ),
                )
            ).alias("reactants"),
            F.collect_list(
                F.when(
                    F.col("which") == "_R",
                    F.struct(
                        F.lit("chebi").alias("namespace"),
                        F.col("chebi_id").alias("identifier"),
                        F.col("name").alias("name"),
                    ),
                )
            ).alias("products"),
        )
    )
    return rxn.join(agg, "reaction", "left").select(
        F.lit("Reaction").alias("dsl_type"),
        F.lit("rhea").alias("namespace"),
        F.col("rhea_id").alias("identifier"),
        F.col("equation").alias("name"),
        F.coalesce("reactants", F.array()).alias("reactants"),
        F.coalesce("products", F.array()).alias("products"),
    )
