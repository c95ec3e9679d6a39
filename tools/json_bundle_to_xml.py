"""Generate FHIR XML twins of the JSON bundle fixtures (test data
only — the engine's XML READER lives in bunsen_spark/sources/xml.py).

FHIR XML spelling: primitives become ``value=`` attributes, repeats
become repeated elements, nested resources sit inside a container
element whose single child is the capitalized resource type.

Usage: python tools/json_bundle_to_xml.py fixtures/bundles/json fixtures/bundles/xml
"""

from __future__ import annotations

import json
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

FHIR_NS = "http://hl7.org/fhir"

#: keys whose dict value is a nested RESOURCE, not a datatype
RESOURCE_CONTAINERS = {"resource"}


def _add_value(parent: ET.Element, name: str, value) -> None:
    if isinstance(value, dict):
        child = ET.SubElement(parent, name)
        if name in RESOURCE_CONTAINERS and "resourceType" in value:
            _resource_element(child, value)
        else:
            _fill(child, value)
    elif isinstance(value, list):
        for item in value:
            _add_value(parent, name, item)
    elif isinstance(value, bool):
        ET.SubElement(parent, name, {"value": "true" if value else "false"})
    else:
        ET.SubElement(parent, name, {"value": str(value)})


def _fill(elem: ET.Element, obj: dict) -> None:
    for k, v in obj.items():
        if k == "resourceType":
            continue
        if k == "div" and isinstance(v, str):
            elem.append(ET.fromstring(v))
            continue
        _add_value(elem, k, v)


def _resource_element(parent: ET.Element, obj: dict) -> None:
    res = ET.SubElement(parent, obj["resourceType"])
    _fill(res, obj)


def bundle_json_to_xml(text: str) -> str:
    obj = json.loads(text)
    root = ET.Element(obj["resourceType"], {"xmlns": FHIR_NS})
    _fill(root, obj)
    return ET.tostring(root, encoding="unicode")


def main() -> None:
    src, dst = Path(sys.argv[1]), Path(sys.argv[2])
    dst.mkdir(parents=True, exist_ok=True)
    for f in sorted(src.glob("*.json")):
        out = dst / (f.name.rsplit(".json", 1)[0] + ".xml")
        out.write_text(bundle_json_to_xml(f.read_text()))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
