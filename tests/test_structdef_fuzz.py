"""Property-based fuzz of the StructureDefinition compiler: randomly
generated (but spec-shape-valid) snapshots must compile, expand to both
schema forms, and keep the structural invariants — regardless of
nesting depth, cardinality mix, dropped elements, or backbone order."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from bunsen_spark.schema import core
from bunsen_spark.schema.structdef import StructureDefinitionRegistry

PRIMS = ["string", "code", "boolean", "integer", "decimal", "dateTime", "uri"]
DATATYPES = ["CodeableConcept", "Identifier", "Period", "Quantity", "Coding"]

_names = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
)
_max = st.sampled_from(["1", "*", "0", "2"])


@st.composite
def _elements(draw, path: str, depth: int, used: set[str]) -> list[dict]:
    out: list[dict] = []
    n_children = draw(st.integers(min_value=1, max_value=4))
    for _ in range(n_children):
        name = draw(_names.filter(lambda n: f"{path}.{n}" not in used))
        used.add(f"{path}.{name}")
        cpath = f"{path}.{name}"
        kind = draw(
            st.sampled_from(
                ["prim", "datatype", "reference", "backbone"]
                if depth < 3
                else ["prim", "datatype", "reference"]
            )
        )
        mx = draw(_max)
        if kind == "prim":
            out.append(
                {"path": cpath, "min": 0, "max": mx, "type": [{"code": draw(st.sampled_from(PRIMS))}]}
            )
        elif kind == "datatype":
            out.append(
                {"path": cpath, "min": 0, "max": mx, "type": [{"code": draw(st.sampled_from(DATATYPES))}]}
            )
        elif kind == "reference":
            out.append(
                {
                    "path": cpath,
                    "min": 0,
                    "max": mx,
                    "type": [
                        {
                            "code": "Reference",
                            "targetProfile": "http://hl7.org/fhir/StructureDefinition/Patient",
                        }
                    ],
                }
            )
        else:
            out.append(
                {"path": cpath, "min": 0, "max": mx, "type": [{"code": "BackboneElement"}]}
            )
            out.extend(draw(_elements(cpath, depth + 1, used)))
    return out


@st.composite
def snapshots(draw) -> dict:
    used: set[str] = set()
    elements = [
        {"path": "Basic", "min": 0, "max": "*"},
        {"path": "Basic.id", "min": 0, "max": "1", "type": [{"code": "id"}]},
        *draw(_elements("Basic", 1, used)),
    ]
    return {
        "resourceType": "StructureDefinition",
        "id": "fuzzed",
        "url": "http://example.org/StructureDefinition/fuzzed",
        "name": "Fuzzed",
        "type": "Basic",
        "kind": "resource",
        "snapshot": {"element": elements},
    }


@settings(max_examples=60, deadline=None)
@given(sd=snapshots())
def test_compiler_invariants(sd):
    reg = StructureDefinitionRegistry()
    reg.add(sd)
    compiled = reg.get("fuzzed")
    assert isinstance(compiled, core.Complex)
    spark_t = core.spark_schema(compiled)
    json_t = core.json_schema(compiled)
    assert spark_t.fields  # at least id survives

    by_path = {e["path"]: e for e in sd["snapshot"]["element"]}
    analytic = {f.name: f for f in spark_t.fields}
    for path, el in by_path.items():
        if path.count(".") != 1:
            continue
        name = path.split(".", 1)[1]
        mx = str(el.get("max", "1"))
        if mx == "0":
            # max=0 elements never surface
            assert name not in analytic, name
            continue
        # a backbone that lost all children to max=0 may vanish; every
        # other top-level element must surface exactly once
        codes = [t["code"] for t in el.get("type", [])]
        if name in analytic:
            is_many = mx == "*" or (mx.isdigit() and int(mx) > 1)
            assert (analytic[name].dataType.typeName() == "array") == is_many, name
            if "Reference" in codes:
                inner = (
                    analytic[name].dataType.elementType
                    if is_many
                    else analytic[name].dataType
                )
                assert "patientId" in {f.name for f in inner.fields}
        else:
            assert codes == ["BackboneElement"], f"{name} vanished but is {codes}"

    # parse schema spells the same top-level names (no choice/ext here)
    json_names = {f.name for f in json_t.fields}
    assert {n for n in analytic} <= json_names | {"resourceType"}
