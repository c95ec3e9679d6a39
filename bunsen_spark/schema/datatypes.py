"""STU3 complex datatype definitions for the schema engine.

Field lists follow the public HL7 FHIR STU3 datatype definitions
(hl7.org/fhir/STU3/datatypes.html), trimmed of elements the reference
also drops (recursive children beyond depth 1, ``max=0`` elements).
Mirrors the structures exercised by `SparkRowConverterTest.java` and
`how_bunsen_works.rst:15-52`.
"""

from __future__ import annotations

from .core import Choice, Complex, Field, Reference

CODING = Complex(
    "Coding",
    (
        Field("id", "string"),
        Field("system", "uri"),
        Field("version", "string"),
        Field("code", "code"),
        Field("display", "string"),
        Field("userSelected", "boolean"),
    ),
)

CODEABLE_CONCEPT = Complex(
    "CodeableConcept",
    (
        Field("id", "string"),
        Field("coding", CODING, many=True),
        Field("text", "string"),
    ),
)

QUANTITY = Complex(
    "Quantity",
    (
        Field("id", "string"),
        Field("value", "decimal"),
        Field("comparator", "code"),
        Field("unit", "string"),
        Field("system", "uri"),
        Field("code", "code"),
    ),
)

PERIOD = Complex(
    "Period",
    (
        Field("id", "string"),
        Field("start", "dateTime"),
        Field("end", "dateTime"),
    ),
)

RANGE = Complex(
    "Range",
    (
        Field("id", "string"),
        Field("low", QUANTITY),
        Field("high", QUANTITY),
    ),
)

RATIO = Complex(
    "Ratio",
    (
        Field("id", "string"),
        Field("numerator", QUANTITY),
        Field("denominator", QUANTITY),
    ),
)

SAMPLED_DATA = Complex(
    "SampledData",
    (
        Field("id", "string"),
        Field("origin", QUANTITY),
        Field("period", "decimal"),
        Field("factor", "decimal"),
        Field("lowerLimit", "decimal"),
        Field("upperLimit", "decimal"),
        Field("dimensions", "positiveInt"),
        Field("data", "string"),
    ),
)

IDENTIFIER = Complex(
    "Identifier",
    (
        Field("id", "string"),
        Field("use", "code"),
        Field("type", CODEABLE_CONCEPT),
        Field("system", "uri"),
        Field("value", "string"),
        Field("period", PERIOD),
        Field("assigner", Reference(("Organization",))),
    ),
)

HUMAN_NAME = Complex(
    "HumanName",
    (
        Field("id", "string"),
        Field("use", "code"),
        Field("text", "string"),
        Field("family", "string"),
        Field("given", "string", many=True),
        Field("prefix", "string", many=True),
        Field("suffix", "string", many=True),
        Field("period", PERIOD),
    ),
)

ADDRESS = Complex(
    "Address",
    (
        Field("id", "string"),
        Field("use", "code"),
        Field("type", "code"),
        Field("text", "string"),
        Field("line", "string", many=True),
        Field("city", "string"),
        Field("district", "string"),
        Field("state", "string"),
        Field("postalCode", "string"),
        Field("country", "string"),
        Field("period", PERIOD),
    ),
)

CONTACT_POINT = Complex(
    "ContactPoint",
    (
        Field("id", "string"),
        Field("system", "code"),
        Field("value", "string"),
        Field("use", "code"),
        Field("rank", "positiveInt"),
        Field("period", PERIOD),
    ),
)

ANNOTATION = Complex(
    "Annotation",
    (
        Field("id", "string"),
        Field(
            "author",
            Choice(
                (
                    ("reference", Reference(("Practitioner", "Patient", "RelatedPerson"))),
                    ("string", "string"),
                )
            ),
        ),
        Field("time", "dateTime"),
        Field("text", "string"),
    ),
)

ATTACHMENT = Complex(
    "Attachment",
    (
        Field("id", "string"),
        Field("contentType", "code"),
        Field("language", "code"),
        Field("data", "base64Binary"),
        Field("url", "uri"),
        Field("size", "unsignedInt"),
        Field("hash", "base64Binary"),
        Field("title", "string"),
        Field("creation", "dateTime"),
    ),
)

META = Complex(
    "Meta",
    (
        Field("id", "string"),
        Field("versionId", "id"),
        Field("lastUpdated", "instant"),
        Field("profile", "uri", many=True),
        Field("security", CODING, many=True),
        Field("tag", CODING, many=True),
    ),
)

NARRATIVE = Complex(
    "Narrative",
    (
        Field("id", "string"),
        Field("status", "code"),
        Field("div", "xhtml"),
    ),
)

TIMING_REPEAT = Complex(
    "TimingRepeat",
    (
        Field("id", "string"),
        Field(
            "bounds",
            Choice((("quantity", QUANTITY), ("range", RANGE), ("period", PERIOD))),
        ),
        Field("count", "integer"),
        Field("countMax", "integer"),
        Field("duration", "decimal"),
        Field("durationMax", "decimal"),
        Field("durationUnit", "code"),
        Field("frequency", "integer"),
        Field("frequencyMax", "integer"),
        Field("period", "decimal"),
        Field("periodMax", "decimal"),
        Field("periodUnit", "code"),
        Field("dayOfWeek", "code", many=True),
        Field("timeOfDay", "time", many=True),
        Field("when", "code", many=True),
        Field("offset", "unsignedInt"),
    ),
)

TIMING = Complex(
    "Timing",
    (
        Field("id", "string"),
        Field("event", "dateTime", many=True),
        Field("repeat", TIMING_REPEAT),
        Field("code", CODEABLE_CONCEPT),
    ),
)

DOSAGE = Complex(
    "Dosage",
    (
        Field("id", "string"),
        Field("sequence", "integer"),
        Field("text", "string"),
        Field("additionalInstruction", CODEABLE_CONCEPT, many=True),
        Field("patientInstruction", "string"),
        Field("timing", TIMING),
        Field(
            "asNeeded",
            Choice((("boolean", "boolean"), ("codeableConcept", CODEABLE_CONCEPT))),
        ),
        Field("site", CODEABLE_CONCEPT),
        Field("route", CODEABLE_CONCEPT),
        Field("method", CODEABLE_CONCEPT),
        Field(
            "dose",
            Choice((("range", RANGE), ("quantity", QUANTITY))),
        ),
        Field("maxDosePerPeriod", RATIO),
        Field("maxDosePerAdministration", QUANTITY),
        Field("maxDosePerLifetime", QUANTITY),
        Field(
            "rate",
            Choice((("ratio", RATIO), ("range", RANGE), ("quantity", QUANTITY))),
        ),
    ),
)

# the common value[x] choice used by Observation.value / component.value
VALUE_CHOICE = Choice(
    (
        ("quantity", QUANTITY),
        ("codeableConcept", CODEABLE_CONCEPT),
        ("string", "string"),
        ("boolean", "boolean"),
        ("range", RANGE),
        ("ratio", RATIO),
        ("sampledData", SAMPLED_DATA),
        ("attachment", ATTACHMENT),
        ("time", "time"),
        ("dateTime", "dateTime"),
        ("period", PERIOD),
    )
)
