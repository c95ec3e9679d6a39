"""R4 valueset push/membership API (`python/bunsen/r4/valuesets.py`).

The reference duplicates its STU3 module with R4 class wiring; here the
broadcast valueset machinery is generation-free — it operates on flat
(system, code) sets resolved from collections/hierarchies, and the
``in_valueset`` expression reads ``coding.system/code`` paths that are
identical in both generations' CodeableConcept — so these are the same
functions, re-exported under the reference's R4 import path. Pass
collections created by :mod:`bunsen_spark.r4.codes` for R4-shaped
stores."""

from ..functions.valuesets import (  # noqa: F401
    HierarchyDescendants,
    ValueSetReference,
    build_valuesets,
    current_valuesets,
    get_current_valuesets,
    in_valueset,
    in_valueset_join,
    isa_loinc,
    isa_snomed,
    pop_valuesets,
    push_valuesets,
    valueset,
)
