"""GeoJSON reader: Feature collections / NDJSON features → DataFrames.

Replaces the reference's MongoDB/CouchDB GeoJSON collection scans
(SURVEY.md §2.1 S3/S4; reference: extension/mongodb/mongo_extension.ts:
84-101 ``find().toArray()``, couchdb_extension.ts:66-102 paginated
``_find``) with native JSON reads: properties flatten to columns, the
geometry object becomes a WKT ``geometry`` column, and Catalyst prunes /
pushes down instead of the reference's hand-built selector documents.

Scale: NDJSON (one Feature per line) is the splittable format — a 100 TB
corpus reads with full parallelism; ``multiLine`` FeatureCollections are
per-file units (fine for many small files, the document-DB shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _flatten_features(features: DataFrame) -> DataFrame:
    """features: rows with (type, properties struct, geometry struct) →
    properties.* + WKT geometry (via the st_geomfromgeojson UDF, the same
    path the reference routes through ST_GeomFromGeoJSON —
    json_extension.ts:131-158)."""
    from ..functions.spatial import st_geomfromgeojson

    cols = [F.col(f"properties.{f.name}").alias(f.name) for f in features.schema["properties"].dataType.fields]
    return features.select(
        *cols,
        st_geomfromgeojson(F.to_json("geometry")).alias("geometry"),
    )


def read_geojson(spark: SparkSession, path: str, lines: bool = False) -> DataFrame:
    """Read GeoJSON into a flat DataFrame.

    lines=True: NDJSON, one Feature per line (splittable, the scale path).
    lines=False: FeatureCollection document(s), one JSON per file."""
    if lines:
        feats = spark.read.json(path)
    else:
        coll = spark.read.option("multiLine", "true").json(path)
        feats = coll.select(F.explode("features").alias("f")).select("f.*")
    return _flatten_features(feats)
