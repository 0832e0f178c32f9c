"""Result sinks (SURVEY.md §2.1 S9/S10).

S9 (SQL rowset) is any DataFrame action/writer. S10 is the GeoJSON
FeatureCollection output the reference builds driver-side when a query
projects ST_AsGeoJSON (reference: src/index.ts:323-347, 360-363
``convertRestoGeoJSON``). Here the per-feature JSON is built JVM-side
(``to_json(struct(...))`` + concat — no Python in the row loop); only
the final envelope assembly, which is inherently single-document, runs
on the driver. The scalable variant writes newline-delimited Features
(GeoJSONSeq) straight from executors.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_lines(df: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """One GeoJSON Feature string per row, built entirely JVM-side —
    write with ``df.write.text(...)`` for GeoJSONSeq output at any scale."""
    from ..functions.spatial import st_asgeojson

    props = [c for c in df.columns if c != geometry_col]
    return df.select(
        F.concat(
            F.lit('{"type":"Feature","geometry":'),
            F.coalesce(st_asgeojson(F.col(geometry_col)), F.lit("null")),
            F.lit(',"properties":'),
            F.to_json(F.struct(*[F.col(c) for c in props])),
            F.lit("}"),
        ).alias("feature")
    )


def to_feature_collection(df: DataFrame, geometry_col: str = "geometry", limit: int | None = None) -> dict:
    """Collect a (small/limited) result as a FeatureCollection dict — the
    reference's HTTP-response shape. Driver-side by nature; use
    ``feature_lines`` + ``write.text`` for bulk export."""
    feats = feature_lines(df if limit is None else df.limit(limit), geometry_col)
    return {
        "type": "FeatureCollection",
        "features": [json.loads(r.feature) for r in feats.collect()],
    }
