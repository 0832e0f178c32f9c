"""XML document reader: GML feature collections and KML placemarks →
DataFrames.

Replaces the reference's BaseX/eXist-db scan + XQuery flattening pipeline
(SURVEY.md §2.1 S1/S2/S5/S6; reference: extension/xml_extension.ts:495-548
row-path extraction, 236-273 first-row type sniffing, 78-101 namespace
auto-detect) with a two-phase Spark read:

1. files → one row per file (``spark.read.text(wholetext)``), parsed
   per-partition with ``xml.etree`` into JSON-encoded rows;
2. ``spark.read.json`` over those rows → schema inference over ALL rows
   (not the reference's first-row sample — SURVEY.md §1.2's bug class),
   nested elements becoming StructType, repeated elements ArrayType.

Flattening convention vs the reference (SURVEY.md §1.3):
- ``parent__child``          ≡ ``col("parent.child")`` (nested struct)
- ``_attribute__attr``       ≡ ``col("_attr")`` (row-element attribute)
- ``_attribute__elem__attr`` ≡ ``col("elem._attr")``
- element text when the element also has attributes → ``elem._VALUE``
- ``@_is_collection`` nested collections ≡ ArrayType + ``explode``
- geometry (gml:* / kml:Point...) → WKT string column ``geometry``

Scale: each input file parses independently inside a partition (no
driver-side XML), so ingest parallelism = file count; schema inference is
one extra distributed pass, and an explicit schema skips it.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from ..functions import geometry as G

GML_NS = "http://www.opengis.net/gml"
KML_ROW_TAGS = ("Placemark",)
GML_ROW_TAGS = ("featureMember", "member")

_GEOM_TAGS = {
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiCurve",
    "MultiPolygon",
    "MultiSurface",
    "MultiGeometry",
    "GeometryCollection",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _gml_geometry_to_wkt(el: ET.Element, swap: bool = False) -> str | None:
    """Convert a GML/KML geometry element to WKT — one code path with the
    ST_GeomFromGML/KML UDFs (functions.geometry.geom_from_xml_element),
    so multi-part geometries (MultiPolygon, MultiGeometry, ...) convert
    whole, matching the reference's full-fragment PostGIS conversion
    (reference src/index.ts:44-63 via xml_extension.ts:283-308).

    GML ``pos``/``posList`` axis order is (lat lon) per EPSG:4326 in many
    datasets; the reference treats coordinates as-is and so does the
    default here, but ``swap`` (reader option ``axis_order="latlon"``)
    normalizes latitude-first input to lon-lat WKT."""
    g = G.geom_from_xml_element(el)
    if swap:
        g = G.swap_axes(g)
    return G.to_wkt(g) if g is not None else None


def _collection_names(root: ET.Element) -> set[str]:
    """Element names that appear more than once under any single parent
    anywhere in the document — the engine's version of the reference's
    per-element ``@_is_collection="true"`` marker
    (xml_extension.ts:822-836). Forcing these to lists in EVERY row keeps
    the JSON schema consistent (a name that is sometimes scalar and
    sometimes repeated would otherwise degrade to string on inference)."""
    names: set[str] = set()
    for parent in root.iter():
        seen: set[str] = set()
        for child in parent:
            name = _local(child.tag)
            if name in seen:
                names.add(name)
            seen.add(name)
    return names


def _element_to_value(el: ET.Element, collections: set[str], swap: bool = False):
    """Recursive XML element → JSON-able value, spark-xml conventions:
    attributes prefixed ``_``, text alongside attributes as ``_VALUE``,
    collection-shaped child names → list (the reference's
    ``@_is_collection``)."""
    children = list(el)
    attrs = {f"_{k.rsplit('}', 1)[-1]}": v for k, v in el.attrib.items()}
    if not children:
        text = (el.text or "").strip() or None
        if attrs:
            if text is not None:
                attrs["_VALUE"] = text
            return attrs
        return text
    out: dict = dict(attrs)
    by_name: dict[str, list] = {}
    for child in children:
        by_name.setdefault(_local(child.tag), []).append(child)
    for name, elems in by_name.items():
        if name in _GEOM_TAGS:
            wkt = _gml_geometry_to_wkt(elems[0], swap=swap)
            out["geometry"] = wkt
            continue
        vals = [_element_to_value(c, collections, swap) for c in elems]
        out[name] = vals if (len(vals) > 1 or name in collections) else vals[0]
    return out


def _rows_from_xml(content: str, row_tag: str | None, swap: bool = False) -> list[dict]:
    """Extract row dicts from one XML document.

    Row path auto-detection mirrors the reference's namespace probe
    (S6, xml_extension.ts:78-101): gml featureMember children, else kml
    Placemark elements, else children of the root."""
    root = ET.fromstring(content)
    collections = _collection_names(root)
    rows: list[ET.Element] = []
    if row_tag:
        rows = [el for el in root.iter() if _local(el.tag) == row_tag]
        # GML convention: the featureMember element WRAPS the feature
        if rows and row_tag in GML_ROW_TAGS:
            rows = [child for el in rows for child in el]
    else:
        members = [el for el in root.iter() if _local(el.tag) in GML_ROW_TAGS]
        if members:
            rows = [child for el in members for child in el]
        else:
            placemarks = [el for el in root.iter() if _local(el.tag) in KML_ROW_TAGS]
            rows = placemarks if placemarks else list(root)
    out = []
    for el in rows:
        val = _element_to_value(el, collections, swap)
        if isinstance(val, dict):
            val["_feature_type"] = _local(el.tag)
            out.append(val)
    return out


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str | None = None,
    mode: str = "failfast",
    axis_order: str = "asis",
) -> DataFrame:
    """Read GML/KML documents into a DataFrame (S1/S2 replacement).

    ``row_tag`` mirrors spark-xml's option; when None the row path is
    auto-detected per document. ``mode`` mirrors Spark's reader modes:
    ``failfast`` (default) raises on an unparseable document;
    ``permissive`` skips it and keeps the job alive — at 100 TB one
    corrupt file must not kill the ingest (DROPMALFORMED semantics;
    emit a metrics row from the same hook if auditing is needed).
    ``axis_order``: ``"asis"`` (default — coordinates taken in document
    order, matching the reference) or ``"latlon"`` (the document stores
    latitude-first pairs, as GML 3 + EPSG:4326 prescribes; every
    geometry is swapped to lon-lat WKT at parse time, VERDICT r3 #8)."""
    if mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be failfast|permissive, got {mode!r}")
    if axis_order not in ("asis", "latlon"):
        raise ValueError(f"axis_order must be asis|latlon, got {axis_order!r}")
    swap = axis_order == "latlon"
    files = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for content in pdf["value"]:
                try:
                    rows = _rows_from_xml(content, row_tag, swap)
                except ET.ParseError:
                    if mode == "failfast":
                        raise
                    continue
                for row in rows:
                    lines.append(json.dumps(row))
            yield pd.DataFrame({"json": lines})

    json_rows = files.mapInPandas(parse, StructType([StructField("json", StringType())]))
    # schema inference over all rows (vs the reference's 1-row sample)
    return spark.read.json(json_rows.rdd.map(lambda r: r.json))
