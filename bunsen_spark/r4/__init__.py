"""R4-generation drop-in API package.

Mirrors the reference's parallel R4 python surface
(`python/bunsen/r4/{codes,valuesets,bundles}.py`) the same way
:mod:`bunsen_spark.codes` mirrors its STU3 one: same function names and
shapes, with the FHIR generation selected by routing every resource
address through the isolated R4 StructureDefinition registry (the
``r4:`` prefix — see :mod:`bunsen_spark.schema.structdef`). All query
plans are shared with the STU3 path; only the compiled schemas differ.

Load the public R4 spec artifact first (one of):
- drop ``profiles-resources.json`` (hl7.org/fhir/R4) at
  ``fixtures/spec-r4/`` or ``$BUNSEN_SPARK_FHIR_R4_SPEC_DIR``;
- call :func:`bunsen_spark.schema.structdef.load_r4_structure_definitions`.
"""
