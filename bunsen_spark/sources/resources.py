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
    parse_schema = json_schema_for(resource_type)
    return (
        raw.where(F.get_json_object("resource_json", "$.resourceType") == resource_type)
        .select(F.from_json("resource_json", parse_schema).alias("r"))
        .select(converter_for(resource_type, F.col("r")).alias("res"))
        .select("res.*")
    )
