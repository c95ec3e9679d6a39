"""Drop-in module-level terminology API.

Mirrors the reference's python entry points
(`python/bunsen/stu3/codes/__init__.py`: create_*/get_* factories and
the LOINC/SNOMED import helpers of `codes/loinc.py` / `codes/snomed.py`)
so reference users can switch imports without code changes. All real
behavior lives in :mod:`.operators`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .operators.concept_maps import ConceptMaps
from .operators.hierarchies import (
    LOINC_HIERARCHY_URI,
    SNOMED_HIERARCHY_URI,
    Hierarchies,
    loinc_hierarchy_edges,
    snomed_relationship_edges,
)
from .operators.value_sets import ValueSets


def create_concept_maps(spark: SparkSession) -> ConceptMaps:
    return ConceptMaps.empty(spark)


def create_value_sets(spark: SparkSession) -> ValueSets:
    return ValueSets.empty(spark)


def create_hierarchies(spark: SparkSession) -> Hierarchies:
    return Hierarchies.empty(spark)


def get_concept_maps(spark: SparkSession, database: str = "ontologies") -> ConceptMaps:
    return ConceptMaps.get_from_database(spark, database)


def get_value_sets(spark: SparkSession, database: str = "ontologies") -> ValueSets:
    return ValueSets.get_from_database(spark, database)


def get_hierarchies(spark: SparkSession, database: str = "ontologies") -> Hierarchies:
    return Hierarchies.get_from_database(spark, database)


def with_loinc_hierarchy(
    spark: SparkSession,
    hierarchies: Hierarchies,
    loinc_hierarchy_path: str,
    loinc_version: str,
) -> Hierarchies:
    """LOINC multiaxial hierarchy CSV → expanded ancestors
    (`python/bunsen/codes/loinc.py:with_loinc_hierarchy`)."""
    edges = loinc_hierarchy_edges(spark, loinc_hierarchy_path)
    return hierarchies.with_hierarchy(
        Hierarchies.from_edges(spark, edges, LOINC_HIERARCHY_URI, loinc_version)
    )


def with_relationships(
    spark: SparkSession,
    hierarchies: Hierarchies,
    snomed_relationship_path: str,
    snomed_version: str,
) -> Hierarchies:
    """SNOMED relationship TSV → expanded ancestors
    (`python/bunsen/codes/snomed.py:with_relationships`)."""
    edges = snomed_relationship_edges(spark, snomed_relationship_path)
    return hierarchies.with_hierarchy(
        Hierarchies.from_edges(spark, edges, SNOMED_HIERARCHY_URI, snomed_version)
    )
