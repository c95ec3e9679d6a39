"""bunsen_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cerner/bunsen, rebuilt Spark-first.

The reference (read-only at /root/reference) is a Java/HAPI ETL +
terminology engine; this package re-expresses every capability as
DataFrame / Spark SQL plans so Catalyst owns optimization end-to-end:

- ``bunsen_spark.schema``     — FHIR StructType generation (SURVEY §1)
- ``bunsen_spark.sources``    — bundle / terminology / hierarchy scans (§2.1)
- ``bunsen_spark.functions``  — in_valueset & friends as native expressions (§2.8)
- ``bunsen_spark.operators``  — domain operators: closure, concept maps,
  value sets, dedup, similarity, text analysis (§2.7 + scale extensions)
- ``bunsen_spark.streaming``  — Structured Streaming ingest (extension)
- ``bunsen_spark.queries``    — headline query definitions used by the
  correctness oracle (__spark_entry__) and bench.py
"""

__version__ = "0.1.0"
