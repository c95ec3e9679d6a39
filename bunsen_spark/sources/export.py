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


def _decimal_fixed_size(precision: int) -> int:
    """Smallest byte count whose signed two's-complement range holds
    ``precision`` decimal digits (Avro fixed size for a decimal)."""
    n = 1
    while 2 ** (8 * n - 1) - 1 < 10**precision - 1:
        n += 1
    return n


def avro_schema_for(
    schema, record_name: str = "topLevelRecord", namespace: str = ""
) -> dict | str | list:
    """The Avro schema Spark's avro writer would emit for a Spark SQL
    type — derived jar-free, so the S11 mapping (nullable unions,
    arrays, maps, decimal fixed sizes, date/timestamp logical types)
    is testable in environments where the external spark-avro module
    cannot be deployed (VERDICT r3 item 5). Follows the documented
    ``SchemaConverters.toAvroType`` rules of the public spark-avro
    module (the reference instead hand-builds Avro schemas in its
    722-line visitor, `bunsen-avro/.../AvroConverter.java:100-206`):

    - nullable field → union ``[type, "null"]`` (value branch first);
    - array element / map value nullability unions the same way;
    - decimal(p, s) → ``fixed`` named after the field, size =
      min bytes for p digits, logicalType ``decimal``;
    - date → int/``date``; timestamp → long/``timestamp-micros``;
      timestamp_ntz → long/``local-timestamp-micros``;
    - nested records are namespaced by their path so equal field
      names in different branches cannot collide.
    """
    from pyspark.sql import types as T

    def convert(dt, nullable: bool, name: str, ns: str):
        if isinstance(dt, T.StructType):
            child_ns = f"{ns}.{name}" if ns else name
            out: dict | str | list = {
                "type": "record",
                "name": name,
                **({"namespace": ns} if ns else {}),
                "fields": [
                    {
                        "name": f.name,
                        "type": convert(f.dataType, f.nullable, f.name, child_ns),
                    }
                    for f in dt.fields
                ],
            }
        elif isinstance(dt, T.ArrayType):
            out = {
                "type": "array",
                "items": convert(dt.elementType, dt.containsNull, name, ns),
            }
        elif isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise ValueError("Avro maps require string keys")
            out = {
                "type": "map",
                "values": convert(dt.valueType, dt.valueContainsNull, name, ns),
            }
        elif isinstance(dt, T.DecimalType):
            out = {
                "type": "fixed",
                "name": name,
                **({"namespace": ns} if ns else {}),
                "size": _decimal_fixed_size(dt.precision),
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        elif isinstance(dt, T.DateType):
            out = {"type": "int", "logicalType": "date"}
        elif isinstance(dt, T.TimestampType):
            out = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt, T.TimestampNTZType):
            out = {"type": "long", "logicalType": "local-timestamp-micros"}
        elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            out = "int"
        elif isinstance(dt, T.LongType):
            out = "long"
        elif isinstance(dt, T.FloatType):
            out = "float"
        elif isinstance(dt, T.DoubleType):
            out = "double"
        elif isinstance(dt, T.StringType):
            out = "string"
        elif isinstance(dt, T.BinaryType):
            out = "bytes"
        elif isinstance(dt, T.BooleanType):
            out = "boolean"
        else:
            raise ValueError(f"no Avro mapping for Spark type {dt.simpleString()}")
        return [out, "null"] if nullable else out

    return convert(schema, False, record_name, namespace)


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
