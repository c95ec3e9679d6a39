"""Distill FHIR StructureDefinition JSON files into a compact registry.

FHIR publishes StructureDefinitions (hl7.org/fhir/STU3, and the US-Core
implementation guide at hl7.org/fhir/us/core) as large JSON artifacts
whose bulk is human-oriented narrative (``text.div``), mappings, and
bindings. The schema compiler (``bunsen_spark.schema.structdef``) needs
only the structural skeleton: element paths, cardinalities, slice
names, type codes and profile/target URLs, and content references.

This tool reads a directory of ``StructureDefinition-*.json`` files and
writes ONE combined registry JSON keyed by canonical URL, keeping only
those structural fields (~10x smaller). Run it against any unpacked
FHIR package to produce a registry the engine can load:

    python tools/minimize_structdefs.py <definitions_dir> <out.json>

The bundled ``bunsen_spark/schema/definitions/us_core_stu3.min.json``
was produced this way from the public HL7 US-Core STU3 package.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_SD_KEYS = ("resourceType", "id", "url", "name", "type", "kind", "baseDefinition", "derivation")
_EL_KEYS = ("path", "min", "max", "sliceName", "contentReference")
_TYPE_KEYS = ("code", "profile", "targetProfile")


def minimize_sd(sd: dict) -> dict:
    out = {k: sd[k] for k in _SD_KEYS if k in sd}
    elements = []
    for el in sd.get("snapshot", {}).get("element", []):
        m = {k: el[k] for k in _EL_KEYS if k in el}
        types = []
        for t in el.get("type", []):
            mt = {k: t[k] for k in _TYPE_KEYS if k in t}
            if mt not in types:  # snapshot repeats identical entries per profile
                types.append(mt)
        if types:
            m["type"] = types
        elements.append(m)
    out["element"] = elements
    return out


def _iter_sds(doc: dict):
    """A source JSON is either one StructureDefinition or a Bundle of
    them (the spec's own profiles-resources.json / profiles-types.json
    publish format)."""
    if doc.get("resourceType") == "StructureDefinition":
        yield doc
    elif doc.get("resourceType") == "Bundle":
        for entry in doc.get("entry", []):
            res = entry.get("resource", {})
            if res.get("resourceType") == "StructureDefinition":
                yield res


def main() -> int:
    src = Path(sys.argv[1])
    dst = Path(sys.argv[2])
    registry: dict[str, dict] = {}
    paths = sorted(src.glob("*.json")) if src.is_dir() else [src]
    for p in paths:
        try:
            doc = json.loads(p.read_text())
        except ValueError:
            continue
        for sd in _iter_sds(doc):
            if "snapshot" not in sd:
                continue
            registry[sd["url"]] = minimize_sd(sd)
    dst.parent.mkdir(parents=True, exist_ok=True)
    dst.write_text(json.dumps(registry, indent=None, separators=(",", ":"), sort_keys=True))
    print(f"{len(registry)} StructureDefinitions -> {dst} ({dst.stat().st_size} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
