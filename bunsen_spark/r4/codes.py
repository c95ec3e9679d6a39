"""R4 terminology factories (`python/bunsen/r4/codes/__init__.py:7-102`):
the same create_*/get_* entry points as :mod:`bunsen_spark.codes`, with
ConceptMap/ValueSet collections compiled from the R4 registry. The
reference builds these on a parallel Java class tree
(`com.cerner.bunsen.r4.codes.*`); here the collections are
schema-driven, so the R4 variants are the same classes addressed as
``r4:ConceptMap`` / ``r4:ValueSet``. Hierarchies carry no FHIR payload
(flat ancestor tables), so — exactly like the reference, whose R4
module reuses `com.cerner.bunsen.codes.Hierarchies` — the STU3-shared
class is used as-is."""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..codes import (  # noqa: F401 — re-exported: generation-free
    create_hierarchies,
    get_hierarchies,
    with_loinc_hierarchy,
    with_relationships,
)
from ..operators.concept_maps import ConceptMaps
from ..operators.value_sets import ValueSets

R4_CONCEPT_MAP = "r4:ConceptMap"
R4_VALUE_SET = "r4:ValueSet"


def create_concept_maps(spark: SparkSession) -> ConceptMaps:
    return ConceptMaps.empty(spark, R4_CONCEPT_MAP)


def create_value_sets(spark: SparkSession) -> ValueSets:
    return ValueSets.empty(spark, R4_VALUE_SET)


def get_concept_maps(spark: SparkSession, database: str = "ontologies") -> ConceptMaps:
    return ConceptMaps.get_from_database(spark, database, R4_CONCEPT_MAP)


def get_value_sets(spark: SparkSession, database: str = "ontologies") -> ValueSets:
    return ValueSets.get_from_database(spark, database, R4_VALUE_SET)
