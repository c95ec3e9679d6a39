"""Directory scans for standalone FHIR resource files (one resource per
file), used for ConceptMap / ValueSet imports
(`AbstractConceptMaps.java:124-194`, `AbstractValueSets.java:389-465`).
JSON files only (XML is a tracked gap, SURVEY S3/S6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import converter_for, json_schema_for


def read_resources_from_directory(
    spark: SparkSession, path: str, resource_type: str
) -> DataFrame:
    """Each matching file (by resourceType) → one row with the
    spec-derived nested schema."""
    raw = spark.read.text(path, wholetext=True).select(F.col("value").alias("resource_json"))
    return resources_from_json_strings(raw, "resource_json", resource_type)


def resources_from_json_strings(
    df: DataFrame, column: str, resource_type: str
) -> DataFrame:
    """Resource JSON strings in a column → spec-schema rows (shared by
    directory scans and programmatic resource construction)."""
    from ..schema.resources import base_resource_type

    parse_schema = json_schema_for(resource_type)
    return (
        df.where(
            F.get_json_object(column, "$.resourceType")
            == base_resource_type(resource_type)
        )
        .select(F.from_json(column, parse_schema).alias("r"))
        .select(converter_for(resource_type, F.col("r")).alias("res"))
        .select("res.*")
    )
