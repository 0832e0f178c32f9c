"""ST_LineMerge / ST_Reverse — linework utilities (F12).

PostGIS users reach both through the forwarding surface (reference
src/index.ts:44-63). Semantics:

- ``ST_LineMerge(g)``: sew the lineal parts of ``g`` together at nodes
  where EXACTLY two line ends meet (degree-2 chaining — a T-junction's
  three lines stay separate, PostGIS behavior). Non-lineal input
  returns ``GEOMETRYCOLLECTION EMPTY``, as PostGIS. The chaining
  kernel is overlay._merge_contiguous_lines — the same walk that sews
  touching-polygon boundary contact into maximal linework, so the two
  surfaces cannot drift apart. NOTE: like PostGIS, merging assumes
  noded input; overlapping (not merely touching) lines are not
  dissolved here.
- ``ST_Reverse(g)``: vertex order reversed in every line and ring
  (points unchanged).

Scale shape: both are map-only per-row pandas UDFs — linemerge cost is
O(parts) per row with a dict-based end index, reverse is O(vertices).
New module so overlay.py's surface stays a pure overlay concern.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ._register_once import once_per_session
from . import geometry as G
from .geometry import Geometry
from .overlay import _merge_contiguous_lines
from .union_ops import _flatten

_EMPTY_RE = re.compile(
    r"^(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON|"
    r"GEOMETRYCOLLECTION)\s+EMPTY$"
)


def linemerge_wkt(wkt) -> str | None:
    if wkt is None:
        return None
    s = str(wkt).strip()
    if _EMPTY_RE.match(s.upper()):
        return "GEOMETRYCOLLECTION EMPTY"
    g = G.parse_wkt(s)
    if g is None:
        return None
    lineal = [p for p in _flatten(g) if p.kind == "LineString"]
    if not lineal:
        return "GEOMETRYCOLLECTION EMPTY"
    # Duplicate parts are deliberately KEPT (ADVICE r8 #2 proposed
    # dropping them, declined after checking JTS: LineMergeGraph adds
    # parallel edges with no duplicate suppression, so GEOS LineMerger
    # really does return the out-and-back LINESTRING (A, B, A) for a
    # doubled segment, and a node carrying a duplicate pair plus one
    # more segment has degree 3 and never merges through). Matching
    # that is the parity target.
    merged = _merge_contiguous_lines(lineal)
    if len(merged) == 1:
        return G.to_wkt(merged[0])
    return G.to_wkt(Geometry("MultiLineString", [m.coords for m in merged]))


def _rev(g: Geometry) -> Geometry:
    if g.kind == "Point":
        return g
    if g.kind == "MultiPoint":
        return g  # component points have no vertex order of their own
    if g.kind == "LineString":
        return Geometry(g.kind, g.coords[::-1])
    if g.kind in ("Polygon", "MultiLineString"):
        return Geometry(g.kind, [seq[::-1] for seq in g.coords])
    if g.kind == "MultiPolygon":
        return Geometry(g.kind, [[r[::-1] for r in poly] for poly in g.coords])
    return Geometry("GeometryCollection", [_rev(s) for s in g.coords])


def reverse_wkt(wkt) -> str | None:
    if wkt is None:
        return None
    s = str(wkt).strip()
    m = _EMPTY_RE.match(s.upper())
    if m:
        return f"{m.group(1)} EMPTY"
    g = G.parse_wkt(s)
    if g is None:
        return None
    return G.to_wkt(_rev(g))


@pandas_udf(StringType())
def st_linemerge(w: pd.Series) -> pd.Series:
    return pd.Series([linemerge_wkt(x) for x in w], dtype="object")


@pandas_udf(StringType())
def st_reverse(w: pd.Series) -> pd.Series:
    return pd.Series([reverse_wkt(x) for x in w], dtype="object")


ALL_LINEWORK_FUNCTIONS = {
    "st_linemerge": st_linemerge,
    "st_reverse": st_reverse,
}


@once_per_session
def register_linework_functions(spark: SparkSession) -> None:
    for name, fn in ALL_LINEWORK_FUNCTIONS.items():
        spark.udf.register(name, fn)
