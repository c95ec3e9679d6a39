from .resources import (  # noqa: F401
    converter_for,
    definition_for,
    export_struct_for,
    json_schema_for,
    resource_names,
    spark_schema_for,
)
