"""FHIR schema engine: declarative type definitions → Spark schemas +
Catalyst conversion expressions.

Re-implements the reference's schema visitor (SURVEY §1.3;
`DefinitionToSparkVisitor.java:400-641`, `Stu3StructureDefinitions.java`)
as a pure-Python expansion over a small DSL, producing three artifacts
per resource type:

1. ``spark_schema``  — the nested analytic StructType (choice elements
   become one struct with a field per branch; references gain synthetic
   ``<target>Id`` columns; repeated elements are arrays);
2. ``json_schema``   — the *parse* StructType matching FHIR JSON
   spelling (choice branches are flattened sibling keys, e.g.
   ``valueQuantity``); and
3. ``converter``     — a Catalyst Column expression mapping a parsed
   JSON struct into the analytic schema (code ``"?"`` → null per
   `EnumConverter.java:13-28`, relative-reference id extraction per
   `RelativeValueConverter:342-378`).

All conversion executes JVM-side inside whole-stage codegen — there is
no per-row Python anywhere on the ingest path.

Type mappings follow `DefinitionToSparkVisitor.java:400-419`:
dates/instants stay ISO-8601 strings, ``decimal`` is DECIMAL(12,4),
``base64Binary`` stays a string (documented reference flaw kept for
parity).

Recursive types are cut after one repetition of the same definition on
the expansion stack (`Stu3StructureDefinitions.java:88-114` with
maxDepth=1).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# DSL
# ---------------------------------------------------------------------------

PRIMITIVES = {
    "id": T.StringType(),
    "string": T.StringType(),
    "markdown": T.StringType(),
    "time": T.StringType(),
    "xhtml": T.StringType(),
    "uri": T.StringType(),
    "oid": T.StringType(),
    "code": T.StringType(),
    "date": T.StringType(),
    "dateTime": T.StringType(),
    "instant": T.StringType(),
    "base64Binary": T.StringType(),
    # R4-generation primitives (absent from STU3): all string-encoded,
    # matching the reference's R4 mapping of UrlType / CanonicalType to
    # StringType (bunsen-r4/src/main/scala/com/cerner/bunsen/r4/
    # R4DataTypeMappings.scala:31-49). ``uuid`` exists in both specs.
    "canonical": T.StringType(),
    "url": T.StringType(),
    "uuid": T.StringType(),
    "boolean": T.BooleanType(),
    "integer": T.IntegerType(),
    "unsignedInt": T.IntegerType(),
    "positiveInt": T.IntegerType(),
    "decimal": T.DecimalType(12, 4),
}


@dataclass(frozen=True)
class Complex:
    """A named complex datatype or backbone element."""

    name: str
    fields: tuple["Field", ...]


@dataclass(frozen=True)
class Choice:
    """A FHIR ``foo[x]`` choice element: one struct field per branch.

    ``branches`` is a tuple of (branchName, type) where branchName is
    the lowercased-first-letter type name ('quantity', 'dateTime', ...).
    """

    branches: tuple[tuple[str, Union[str, Complex]], ...]


@dataclass(frozen=True)
class Reference:
    """A FHIR Reference element; ``targets`` are permissible resource
    type names, each contributing a synthetic ``<target>Id`` column
    ('Resource' means any → no synthetic columns)."""

    targets: tuple[str, ...] = ()


@dataclass(frozen=True)
class Extension:
    """A profiled FHIR extension slice surfaced as a first-class named
    column (SURVEY §1.3 extensions; `LeafExtensionConverter.java:17-115`,
    `DefinitionToSparkVisitor.java:522-562`).

    ``vtype`` is the value type for a LEAF extension (primitive or
    datatype Complex); a PARENT extension instead sets ``children`` to
    the sub-extension Fields (each itself Extension-typed), and its
    column is a struct of those children. ``modifier=True`` slices
    parse from / export to the ``modifierExtension`` array instead of
    ``extension`` (same structural rules)."""

    url: str
    vtype: Union[str, Complex, None] = None
    children: tuple["Field", ...] = ()
    modifier: bool = False

    @property
    def is_parent(self) -> bool:
        return bool(self.children)


FType = Union[str, Complex, Choice, Reference, Extension]


@dataclass(frozen=True)
class Field:
    name: str
    ftype: FType
    many: bool = False


def backbone(name: str, *fields: Field) -> Complex:
    return Complex(name=name, fields=tuple(fields))


def _lower_first(s: str) -> str:
    return s[0].lower() + s[1:]


def _upper_first(s: str) -> str:
    return s[0].upper() + s[1:]


# ---------------------------------------------------------------------------
# Expansion: analytic (nested) Spark schema
# ---------------------------------------------------------------------------

def _spark_type(ftype: FType, stack: tuple[str, ...]) -> T.DataType | None:
    if isinstance(ftype, str):
        return PRIMITIVES[ftype]
    if isinstance(ftype, Extension):
        if ftype.is_parent:
            fields = []
            for f in ftype.children:
                st = _spark_type(f.ftype, stack)
                if st is None:
                    continue
                if f.many:
                    st = T.ArrayType(st, True)
                fields.append(T.StructField(f.name, st, True))
            return T.StructType(fields) if fields else None
        return _spark_type(ftype.vtype, stack)
    if isinstance(ftype, Reference):
        fields = [
            T.StructField("reference", T.StringType(), True),
            T.StructField("display", T.StringType(), True),
        ]
        for t in ftype.targets:
            if t != "Resource":
                fields.append(T.StructField(_lower_first(t) + "Id", T.StringType(), True))
        return T.StructType(fields)
    if isinstance(ftype, Choice):
        fields = []
        for branch, btype in ftype.branches:
            bt = _spark_type(btype, stack)
            if bt is not None:
                fields.append(T.StructField(branch, bt, True))
        return T.StructType(fields) if fields else None
    if isinstance(ftype, Complex):
        if ftype.name in stack:
            return None  # recursion cut (depth 1)
        sub = stack + (ftype.name,)
        fields = []
        for f in ftype.fields:
            st = _spark_type(f.ftype, sub)
            if st is None:
                continue
            if f.many:
                st = T.ArrayType(st, True)
            fields.append(T.StructField(f.name, st, True))
        return T.StructType(fields) if fields else None
    raise TypeError(f"unknown ftype {ftype!r}")


def spark_schema(root: Complex) -> T.StructType:
    st = _spark_type(root, ())
    assert isinstance(st, T.StructType)
    return st


# ---------------------------------------------------------------------------
# Expansion: JSON parse schema (FHIR JSON spelling)
# ---------------------------------------------------------------------------

def _value_spelling(vtype: Union[str, Complex]) -> str:
    """FHIR JSON key for an extension value: value + UpperFirst(type)
    (valueCode, valueCoding, valueCodeableConcept, ...)."""
    name = vtype if isinstance(vtype, str) else vtype.name
    return "value" + _upper_first(name)


def _ext_entry_struct(ext_fields: list[Field], stack: tuple[str, ...]) -> T.StructType:
    """Parse struct for one entry of an ``extension`` array: id + url +
    the union of leaf value spellings, plus a nested ``extension``
    array covering parent sub-extensions (one level, per the DSL)."""
    value_fields: dict[str, T.StructField] = {}
    sub_fields: list[Field] = []
    for f in ext_fields:
        ext = f.ftype
        if ext.is_parent:
            sub_fields.extend(ext.children)
        else:
            sp = _value_spelling(ext.vtype)
            jt = _json_type(ext.vtype, stack)
            if jt is not None:
                value_fields.setdefault(sp, T.StructField(sp, jt, True))
    entry = [
        T.StructField("id", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        *value_fields.values(),
    ]
    if sub_fields:
        entry.append(
            T.StructField(
                "extension",
                T.ArrayType(_ext_entry_struct(sub_fields, stack), True),
                True,
            )
        )
    return T.StructType(entry)


def _json_fields(fields: tuple[Field, ...], stack: tuple[str, ...]) -> list[T.StructField]:
    out: list[T.StructField] = []
    for arr_name, is_mod in (("extension", False), ("modifierExtension", True)):
        group = [
            f
            for f in fields
            if isinstance(f.ftype, Extension) and f.ftype.modifier == is_mod
        ]
        if group:
            out.append(
                T.StructField(
                    arr_name,
                    T.ArrayType(_ext_entry_struct(group, stack), True),
                    True,
                )
            )
    for f in fields:
        if isinstance(f.ftype, Extension):
            continue  # parsed via the shared "extension" array above
        if isinstance(f.ftype, Choice):
            # flattened sibling keys: value[x] → valueQuantity, valueString, ...
            for branch, btype in f.ftype.branches:
                jt = _json_type(btype, stack)
                if jt is None:
                    continue
                out.append(T.StructField(f.name + _upper_first(branch), jt, True))
        else:
            jt = _json_type(f.ftype, stack)
            if jt is None:
                continue
            if f.many:
                jt = T.ArrayType(jt, True)
            out.append(T.StructField(f.name, jt, True))
    return out


def _json_type(ftype: FType, stack: tuple[str, ...]) -> T.DataType | None:
    if isinstance(ftype, str):
        return PRIMITIVES[ftype]
    if isinstance(ftype, Reference):
        return T.StructType(
            [
                T.StructField("reference", T.StringType(), True),
                T.StructField("display", T.StringType(), True),
            ]
        )
    if isinstance(ftype, Choice):
        raise AssertionError("choice handled at field level")
    if isinstance(ftype, Complex):
        if ftype.name in stack:
            return None
        fields = _json_fields(ftype.fields, stack + (ftype.name,))
        return T.StructType(fields) if fields else None
    raise TypeError(f"unknown ftype {ftype!r}")


def json_schema(root: Complex) -> T.StructType:
    fields = _json_fields(root.fields, (root.name,))
    # keep resourceType so a parsed column is self-describing
    return T.StructType([T.StructField("resourceType", T.StringType(), True), *fields])


# ---------------------------------------------------------------------------
# Conversion: parsed JSON struct → analytic struct (pure Column exprs)
# ---------------------------------------------------------------------------

def _relative_id(ref: Column, target: str) -> Column:
    """'Patient/123' or '.../Patient/123' → '123' when the second-to-last
    path segment names the target type (RelativeValueConverter:342-378)."""
    parts = F.split(ref, "/")
    n = F.size(parts)
    return F.when(
        ref.isNotNull() & (n >= 2) & (F.element_at(parts, -2) == F.lit(target)),
        F.element_at(parts, -1),
    )


def _convert(src: Column, ftype: FType, stack: tuple[str, ...]) -> Column | None:
    if isinstance(ftype, str):
        if ftype == "code":
            # HAPI null-flavor "?" → SQL null (EnumConverter.java:13-28)
            return F.when(src == "?", F.lit(None).cast("string")).otherwise(src)
        return src
    if isinstance(ftype, Reference):
        cols = [src["reference"].alias("reference"), src["display"].alias("display")]
        for t in ftype.targets:
            if t != "Resource":
                cols.append(_relative_id(src["reference"], t).alias(_lower_first(t) + "Id"))
        return F.when(src.isNotNull(), F.struct(*cols))
    if isinstance(ftype, Complex):
        if ftype.name in stack:
            return None
        sub = stack + (ftype.name,)
        named = _convert_fields(src, ftype.fields, sub)
        if not named:
            return None
        return F.when(src.isNotNull(), F.struct(*[c.alias(n) for n, c in named]))
    raise TypeError(f"unknown ftype {ftype!r}")


def _convert_extension(parent: Column, f: Field, stack: tuple[str, ...]) -> Column | None:
    """Named column from the shared extension array: entries matching
    the slice url, value extracted by spelling (leaf) or recursed into
    sub-extensions (parent)."""
    ext = f.ftype
    arr = "modifierExtension" if ext.modifier else "extension"
    entries = F.filter(parent[arr], lambda e: e["url"] == F.lit(ext.url))
    if ext.is_parent:
        first = F.element_at(entries, 1)

        def sub_value(c: Field) -> Column | None:
            sub = F.filter(
                first["extension"], lambda e: e["url"] == F.lit(c.ftype.url)
            )
            spelling = _value_spelling(c.ftype.vtype)
            if c.many:
                return F.when(
                    F.size(sub) > 0,
                    F.transform(sub, lambda e: _convert(e[spelling], c.ftype.vtype, stack)),
                )
            return _convert(F.element_at(sub, 1)[spelling], c.ftype.vtype, stack)

        named = [(c.name, sub_value(c)) for c in ext.children]
        named = [(n, c) for n, c in named if c is not None]
        if not named:
            return None
        return F.when(
            F.size(entries) > 0, F.struct(*[c.alias(n) for n, c in named])
        )
    spelling = _value_spelling(ext.vtype)
    if f.many:
        return F.when(
            F.size(entries) > 0,
            F.transform(entries, lambda e: _convert(e[spelling], ext.vtype, stack)),
        )
    return _convert(F.element_at(entries, 1)[spelling], ext.vtype, stack)


def _convert_field(parent: Column, f: Field, stack: tuple[str, ...]) -> Column | None:
    if isinstance(f.ftype, Extension):
        return _convert_extension(parent, f, stack)
    if isinstance(f.ftype, Choice):
        branch_cols = []
        any_branch = []
        for branch, btype in f.ftype.branches:
            jkey = f.name + _upper_first(branch)
            conv = _convert(parent[jkey], btype, stack)
            if conv is None:
                continue
            branch_cols.append(conv.alias(branch))
            any_branch.append(parent[jkey].isNotNull())
        if not branch_cols:
            return None
        present = any_branch[0]
        for c in any_branch[1:]:
            present = present | c
        return F.when(present, F.struct(*branch_cols))
    src = parent[f.name]
    if f.many:
        elem_t = f.ftype

        def conv_elem(x: Column) -> Column:
            c = _convert(x, elem_t, stack)
            return c if c is not None else x

        if _spark_type(elem_t, stack) is None:
            return None
        return F.when(src.isNotNull(), F.transform(src, conv_elem))
    return _convert(src, f.ftype, stack)


def _convert_fields(
    parent: Column, fields: tuple[Field, ...], stack: tuple[str, ...]
) -> list[tuple[str, Column]]:
    out: list[tuple[str, Column]] = []
    for f in fields:
        c = _convert_field(parent, f, stack)
        if c is not None:
            out.append((f.name, c))
    return out


def converter(root: Complex, parsed: Column) -> Column:
    """Column expression: parsed-JSON struct → analytic struct."""
    named = _convert_fields(parsed, root.fields, (root.name,))
    return F.struct(*[c.alias(n) for n, c in named])


# ---------------------------------------------------------------------------
# Export: analytic struct → FHIR-JSON-spelling struct (inverse of converter)
# ---------------------------------------------------------------------------
#
# Mirrors the reference's decode path (`HapiCompositeConverter.java:244-359`,
# SURVEY D3) as pure Column expressions: choice structs re-flatten to
# sibling ``valueQuantity``-style keys, synthetic reference ``<target>Id``
# columns are dropped, and null pruning is left to ``to_json``'s
# ignoreNullFields so absent elements vanish from the JSON.

def _export(src: Column, ftype: FType, stack: tuple[str, ...]) -> Column | None:
    if isinstance(ftype, str):
        return src
    if isinstance(ftype, Reference):
        return F.when(
            src.isNotNull(),
            F.struct(
                src["reference"].alias("reference"), src["display"].alias("display")
            ),
        )
    if isinstance(ftype, Complex):
        if ftype.name in stack:
            return None
        named = _export_fields(src, ftype.fields, stack + (ftype.name,))
        if not named:
            return None
        return F.when(src.isNotNull(), F.struct(*[c.alias(n) for n, c in named]))
    raise TypeError(f"unknown ftype {ftype!r}")


def _export_ext_entries(
    parent: Column, ext_fields: list[Field], stack: tuple[str, ...]
) -> Column:
    """Named extension columns → one FHIR ``extension`` array (inverse
    of :func:`_convert_extension`): each slice contributes entries with
    the shared union-spelling entry struct (absent value spellings stay
    null and vanish under ``to_json`` ignoreNullFields)."""
    entry_t = _ext_entry_struct(ext_fields, stack)
    names = [fl.name for fl in entry_t.fields]
    types = {fl.name: fl.dataType for fl in entry_t.fields}

    def mk_entry(url: str, spelling: str | None = None, value: Column | None = None,
                 sub: Column | None = None) -> Column:
        cols = []
        for n in names:
            if n == "url":
                cols.append(F.lit(url).alias("url"))
            elif n == "extension" and sub is not None:
                cols.append(sub.alias("extension"))
            elif n == spelling:
                cols.append(value.alias(n))
            else:
                cols.append(F.lit(None).cast(types[n]).alias(n))
        return F.struct(*cols)

    empty = F.lit(None).cast(T.ArrayType(entry_t, True))
    arrays: list[Column] = []
    for f in ext_fields:
        ext = f.ftype
        src = parent[f.name]
        if ext.is_parent:
            sub = _export_ext_entries(src, list(ext.children), stack)
            arr = F.when(src.isNotNull(), F.array(mk_entry(ext.url, sub=sub)))
        else:
            spelling = _value_spelling(ext.vtype)

            def conv(v: Column, vt=ext.vtype) -> Column:
                c = _export(v, vt, stack)
                return c if c is not None else v

            if f.many:
                arr = F.when(
                    src.isNotNull(),
                    F.transform(src, lambda v: mk_entry(ext.url, spelling, conv(v))),
                )
            else:
                arr = F.when(
                    src.isNotNull(), F.array(mk_entry(ext.url, spelling, conv(src)))
                )
        arrays.append(arr.cast(T.ArrayType(entry_t, True)))
    combined = arrays[0]
    for a in arrays[1:]:
        # null-tolerant concat: missing slices contribute nothing
        combined = F.when(
            combined.isNotNull() & a.isNotNull(), F.concat(combined, a)
        ).otherwise(F.coalesce(combined, a))
    return F.when(F.size(combined) > 0, combined).otherwise(empty)


def _export_fields(
    parent: Column, fields: tuple[Field, ...], stack: tuple[str, ...]
) -> list[tuple[str, Column]]:
    out: list[tuple[str, Column]] = []
    for arr_name, is_mod in (("extension", False), ("modifierExtension", True)):
        group = [
            f
            for f in fields
            if isinstance(f.ftype, Extension) and f.ftype.modifier == is_mod
        ]
        if group:
            # shared arrays first, matching the parse-side layout
            out.append((arr_name, _export_ext_entries(parent, group, stack)))
    for f in fields:
        if isinstance(f.ftype, Extension):
            continue  # exported through the shared "extension" array above
        if isinstance(f.ftype, Choice):
            for branch, btype in f.ftype.branches:
                if _spark_type(btype, stack) is None:
                    continue
                c = _export(parent[f.name][branch], btype, stack)
                if c is not None:
                    out.append((f.name + _upper_first(branch), c))
            continue
        src = parent[f.name]
        if f.many:
            elem_t = f.ftype
            if _spark_type(elem_t, stack) is None:
                continue

            def conv_elem(x: Column) -> Column:
                c = _export(x, elem_t, stack)
                return c if c is not None else x

            out.append((f.name, F.when(src.isNotNull(), F.transform(src, conv_elem))))
            continue
        c = _export(src, f.ftype, stack)
        if c is not None:
            out.append((f.name, c))
    return out


def export_struct(root: Complex, analytic: Column) -> Column:
    """Column expression: analytic struct → FHIR-JSON-spelling struct
    (leading ``resourceType`` discriminator included)."""
    named = _export_fields(analytic, root.fields, (root.name,))
    return F.struct(
        F.lit(root.name).alias("resourceType"),
        *[c.alias(n) for n, c in named],
    )
