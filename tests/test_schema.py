"""Schema-engine unit tests (SURVEY §1.3 structural rules).

Golden expectations follow the reference's printed Observation schema
(`how_bunsen_works.rst:15-52`) and `SparkRowConverterTest.java`.
No Spark session needed — pure driver code.
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from bunsen_spark.schema import json_schema_for, resource_names, spark_schema_for
from bunsen_spark.schema.core import Choice, Complex, Field, spark_schema


def test_observation_golden_shape():
    s = spark_schema_for("Observation")
    # decimal(12,4) for Quantity.value (DefinitionToSparkVisitor.java:72)
    vq = s["value"].dataType["quantity"].dataType
    assert vq["value"].dataType == T.DecimalType(12, 4)
    # choice struct has one field per branch, lowercased type names
    branches = [f.name for f in s["value"].dataType.fields]
    assert "quantity" in branches and "codeableConcept" in branches and "dateTime" in branches
    # effective choice: dateTime + period
    assert [f.name for f in s["effective"].dataType.fields] == ["dateTime", "period"]
    # dates stay strings (lossless ISO-8601)
    assert s["effective"].dataType["dateTime"].dataType == T.StringType()
    assert s["issued"].dataType == T.StringType()


def test_reference_synthetic_ids():
    s = spark_schema_for("Observation")
    subj = [f.name for f in s["subject"].dataType.fields]
    assert subj == ["reference", "display", "patientId", "groupId", "deviceId", "locationId"]
    # 'Resource' target contributes no synthetic column
    cond = spark_schema_for("Condition")
    detail = cond["evidence"].dataType.elementType["detail"].dataType.elementType
    assert [f.name for f in detail.fields] == ["reference", "display"]


def test_repeated_elements_are_arrays():
    s = spark_schema_for("Patient")
    assert isinstance(s["name"].dataType, T.ArrayType)
    assert isinstance(s["name"].dataType.elementType["given"].dataType, T.ArrayType)


def test_recursion_cut_depth_one():
    # a type recursing into itself (by name) is cut and the field dropped,
    # like Reference.identifier.assigner in the reference (maxDepth=1)
    inner = Complex("Tree", (Field("v", "string"),))
    tree = Complex("Tree", (Field("v", "string"), Field("kid", inner)))
    st = spark_schema(tree)
    assert [f.name for f in st.fields] == ["v"]  # 'kid' cut

    # one level of a *different* type nesting the recursive one survives
    wrapper = Complex("Wrapper", (Field("t", tree),))
    ws = spark_schema(wrapper)
    assert [f.name for f in ws["t"].dataType.fields] == ["v"]


def test_json_schema_flattens_choices():
    j = json_schema_for("Patient")
    names = [f.name for f in j.fields]
    assert "deceasedBoolean" in names and "deceasedDateTime" in names
    assert "deceased" not in names
    assert "multipleBirthBoolean" in names and "multipleBirthInteger" in names


def test_all_resources_build():
    for name in resource_names():
        s = spark_schema_for(name)
        j = json_schema_for(name)
        assert len(s.fields) > 3, name
        assert j.fields[0].name == "resourceType", name


def test_unknown_resource_raises():
    with pytest.raises(ValueError, match="unsupported resource type"):
        spark_schema_for("NotAResource")


def test_contentref_reuse_observation_component():
    s = spark_schema_for("Observation")
    comp = s["component"].dataType.elementType
    rr = comp["referenceRange"].dataType.elementType
    top_rr = s["referenceRange"].dataType.elementType
    assert rr == top_rr  # contentReference resolves to the same structure


def test_valueset_compose_shape():
    s = spark_schema_for("ValueSet")
    inc = s["compose"].dataType["include"].dataType.elementType
    assert "system" in [f.name for f in inc.fields]
    assert [f.name for f in inc["concept"].dataType.elementType.fields] == [
        "id", "code", "display",
    ]
