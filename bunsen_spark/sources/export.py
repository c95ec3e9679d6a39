"""Export: resource DataFrames → FHIR JSON strings / bundles.

Re-expresses the reference's export surface (SURVEY S12/S13,
`stu3/python/Functions.java:32-112`, `python/bunsen/stu3/bundles.py:103-121`)
without per-row HAPI objects: ``to_json`` over the inverse schema walk
(:func:`bunsen_spark.schema.export_struct_for`) re-flattens choice
structs to their FHIR sibling spelling, drops synthetic reference id
columns, and prunes absent elements via JSON null suppression — all
inside Catalyst.

``to_bundle`` collects to the driver exactly like the reference does
(`Functions.java:45-77` calls ``collectAsList``); it is an exporting
convenience for SMALL result sets, not a data path. The distributed
path is :func:`to_resource_json` + ``df.write`` (json/parquet).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import export_struct_for


def to_resource_json(df: DataFrame, resource_type: str) -> DataFrame:
    """One FHIR JSON string per resource row, column ``json``."""
    return df.select(
        F.to_json(
            export_struct_for(resource_type, F.struct(*df.columns)),
            {"ignoreNullFields": "true"},
        ).alias("json")
    )


def to_bundle(df: DataFrame, resource_type: str, bundle_type: str = "collection") -> dict:
    """Collect a (small) resource DataFrame into one FHIR Bundle dict."""
    rows = to_resource_json(df, resource_type).collect()
    return {
        "resourceType": "Bundle",
        "type": bundle_type,
        "entry": [{"resource": json.loads(r["json"])} for r in rows],
    }


def to_json_bundle(df: DataFrame, resource_type: str) -> str:
    """Bundle as a single JSON string (`Functions.toJsonBundle`)."""
    return json.dumps(to_bundle(df, resource_type), separators=(",", ":"))
