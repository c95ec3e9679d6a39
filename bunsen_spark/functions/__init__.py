from .valuesets import (  # noqa: F401
    get_current_valuesets,
    in_valueset,
    isa_loinc,
    isa_snomed,
    pop_valuesets,
    push_valuesets,
    valueset,
)
