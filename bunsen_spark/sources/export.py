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


def avro_available(spark) -> bool:
    """True when the spark-avro module is on the session's classpath."""
    try:
        # run the same data-source lookup the writer does (classes can
        # be half-present: core avro jars ship without the data-source
        # module, and a bare Class.forName false-positives there)
        spark.read.format("avro").schema("__probe int").load(
            "/nonexistent-avro-availability-probe"
        ).schema
        return True
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source" not in str(e)


def write_avro(df: DataFrame, path: str, mode: str = "error") -> None:
    """Avro sink (S11). The reference hand-builds Avro records through a
    722-line visitor (`bunsen-avro/.../AvroConverter.java:100-206`);
    Spark's avro writer serializes the DataFrame's StructType directly,
    so the whole operator is this wrapper. Requires the external
    ``spark-avro`` package (`--packages org.apache.spark:spark-avro_*`);
    raises a clear error when it is absent (as in this container)."""
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "spark-avro is not on the classpath; launch with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    df.write.format("avro").mode(mode).save(path)


def read_avro(spark, path: str) -> DataFrame:
    """Avro source twin of :func:`write_avro`."""
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on the classpath; launch with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    return spark.read.format("avro").load(path)


def to_resource_xml(df: DataFrame, resource_type: str) -> DataFrame:
    """One FHIR XML string per resource row, column ``xml`` (S3 export
    side; reference parity `stu3/python/Functions.java:120-127`
    resourceToXml). The row → JSON step is pure Catalyst; only the
    JSON → XML spelling shim is per-row Python (Arrow-batched in
    ``mapInPandas``), mirroring the ingest-side XML shim's cost."""
    from collections.abc import Iterator

    import pandas as pd

    from .xml import fhir_json_to_xml

    jsons = to_resource_json(df, resource_type)

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({"xml": [fhir_json_to_xml(x) for x in pdf["json"]]})

    return jsons.mapInPandas(convert, "xml string")


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
