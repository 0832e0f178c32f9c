"""Engine facade: the reference's ``processQuery`` surface, Spark-first.

Reference lifecycle (SURVEY.md §3.1): parse → normalize → pushdown split
→ per-DBMS native queries → fetch → VALUES-inline rebuild → PostgreSQL →
optional GeoJSON conversion (src/index.ts:349-371). Here the entire
lifecycle is ``spark.sql`` + Catalyst; this class supplies the same
*user surface*: register document tables (parquet / GeoJSON / XML), run
SQL with spatial functions, get rowsets or GeoJSON FeatureCollections,
with per-query timing like the reference's demo UI stats
(demo/routes.ts:144-171).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .functions.accessors import register_accessor_functions
from .functions.affine import register_affine_functions
from .functions.constructors import register_constructor_functions
from .functions.editors import register_editor_functions
from .functions.linearref import register_linearref_functions
from .functions.linework import register_linework_functions
from .functions.bounding import register_bounding_functions
from .functions.bpe import register_bpe_functions
from .functions.collection_fns import register_collection_functions
from .functions.measures import register_measure_functions
from .functions.overlay import register_overlay_functions
from .functions.projection import register_projection_functions
from .functions.relate import register_relate_functions
from .functions.relations import register_relation_functions
from .functions.simplify import register_simplify_functions
from .functions.validity import register_validity_functions
from .functions.spatial import register_spatial_functions
from .functions.subdivide import register_subdivide_functions
from .functions.noding import register_noding_functions
from .functions.tessellate import register_tessellate_functions
from .functions.split import register_split_functions
from .functions.cluster_geo import register_cluster_geo_functions
from .functions.grids import register_grid_functions
from .functions.union_ops import register_union_functions
from .functions.cells import register_cell_functions
from .functions.curves import register_curve_functions
from .functions.geo_export import register_export_functions
from .functions.geohash import register_geohash_functions
from .functions.inscribed import register_inscribed_functions
from .functions.spheroid import register_spheroid_functions
from .functions.textnorm import register_textnorm_functions
from .functions.measure_m import register_measure_m_functions
from .functions.mvt import register_mvt_functions
from .functions.mvt_tile import register_mvt_tile_functions
from .functions.offsetcurve import register_offset_functions
from .functions.wkb import register_wkb_functions
from .functions.zcoord import register_zcoord_functions
from .functions.surface3d import register_surface3d_functions
from .functions.editors_x import register_editors_x_functions
from .functions.agg_forms import register_agg_form_functions
from .functions.cluster_window import register_cluster_window_functions
from .functions.misc_fns import register_misc_functions
from .functions.crossing import register_crossing_functions
from .functions.polygon_hull import register_polygon_hull_functions
from .functions.voronoi_lines import register_voronoi_line_functions
from .functions.effective_area import register_effective_area_functions
from .functions.ewkt import register_ewkt_functions
from .functions.misc_fns2 import register_misc2_functions
from .functions.polyline import register_polyline_functions
from .functions.twkb import register_twkb_functions
from .functions.extrude import register_extrude_functions
from .functions.strsim import register_strsim_functions
from .functions.svg_export import register_svg_functions
from .functions.minkowski import register_minkowski_functions
from .sources import sinks
from .sources.geojson import read_geojson
from .sources.gpx import read_gpx
from .sources.shapefile import read_shapefile
from .sources.tables import TABLES, load_tables
from .sources.xml import read_xml


@dataclass
class QueryStats:
    """Per-query timing — the engine analog of the reference's
    executionTime / dbms_executionTime / pg_executionTime split."""

    sql: str
    plan_seconds: float
    fetch_seconds: float
    rows: int


@dataclass
class SpatialSQLEngine:
    spark: SparkSession
    stats: list[QueryStats] = field(default_factory=list)

    def __post_init__(self) -> None:
        # Session-wide table-read confs, set ONCE at engine construction
        # (ADVICE r6): previously only sources/tables.py set these inside
        # the per-table events loader, so in a caller-supplied vanilla
        # session the timestamp rendering of unrelated queries depended
        # on whether events had been loaded first (order-dependent global
        # state). The loader keeps the same calls as a safety net for
        # registry callables that never construct an engine.
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        self.spark.conf.set("spark.sql.session.timeZone", "UTC")
        register_spatial_functions(self.spark)
        register_relation_functions(self.spark)
        register_relate_functions(self.spark)
        register_measure_functions(self.spark)
        register_bounding_functions(self.spark)
        register_collection_functions(self.spark)
        register_validity_functions(self.spark)
        register_subdivide_functions(self.spark)
        register_noding_functions(self.spark)
        register_tessellate_functions(self.spark)
        register_split_functions(self.spark)
        register_grid_functions(self.spark)
        register_cluster_geo_functions(self.spark)
        register_union_functions(self.spark)
        register_simplify_functions(self.spark)
        register_projection_functions(self.spark)
        register_overlay_functions(self.spark)
        register_affine_functions(self.spark)
        register_linework_functions(self.spark)
        register_accessor_functions(self.spark)
        register_linearref_functions(self.spark)
        register_editor_functions(self.spark)
        register_constructor_functions(self.spark)
        register_geohash_functions(self.spark)
        register_offset_functions(self.spark)
        register_cell_functions(self.spark)
        register_measure_m_functions(self.spark)
        register_inscribed_functions(self.spark)
        register_export_functions(self.spark)
        register_spheroid_functions(self.spark)
        register_textnorm_functions(self.spark)
        register_curve_functions(self.spark)
        register_mvt_functions(self.spark)
        register_mvt_tile_functions(self.spark)
        # Registration deliberately REPLACES Spark 4.1's flag-gated
        # geospatial builtins of the same names (st_asbinary,
        # st_geomfromwkb, st_srid): builtin resolution otherwise wins
        # and throws UNSUPPORTED_FEATURE.GEOSPATIAL_DISABLED on a
        # vanilla session (the replacement warning in the logs is this).
        register_wkb_functions(self.spark)
        register_zcoord_functions(self.spark)
        # AFTER accessors: surface3d's st_isclosed is the surface-aware
        # overload (lineal input delegates to the accessor kernel)
        register_surface3d_functions(self.spark)
        register_editors_x_functions(self.spark)
        register_agg_form_functions(self.spark)
        register_cluster_window_functions(self.spark)
        register_misc_functions(self.spark)
        register_crossing_functions(self.spark)
        register_polygon_hull_functions(self.spark)
        register_voronoi_line_functions(self.spark)
        register_effective_area_functions(self.spark)
        register_ewkt_functions(self.spark)
        register_misc2_functions(self.spark)
        register_polyline_functions(self.spark)
        register_twkb_functions(self.spark)
        register_extrude_functions(self.spark)
        register_strsim_functions(self.spark)
        register_svg_functions(self.spark)
        register_minkowski_functions(self.spark)
        register_bpe_functions(self.spark)

    # -- table registration (S1-S4 replacement) ---------------------------
    def register_parquet_dir(self, sf_dir: str) -> None:
        for name, df in load_tables(self.spark, sf_dir).items():
            df.createOrReplaceTempView(name)

    def register_geojson(self, name: str, path: str, lines: bool = False) -> None:
        read_geojson(self.spark, path, lines=lines).createOrReplaceTempView(name)

    def register_xml(self, name: str, path: str, row_tag: str | None = None) -> None:
        read_xml(self.spark, path, row_tag=row_tag).createOrReplaceTempView(name)

    def register_shapefile(self, name: str, path: str) -> None:
        read_shapefile(self.spark, path).createOrReplaceTempView(name)

    def register_gpx(self, name: str, path: str) -> None:
        read_gpx(self.spark, path).createOrReplaceTempView(name)

    def tables(self) -> list[str]:
        """S8: catalog listing (reference: db:list / listCollections)."""
        return [t.name for t in self.spark.catalog.listTables()]

    # -- query execution --------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        t0 = time.perf_counter()
        df = self.spark.sql(query)
        self.stats.append(
            QueryStats(sql=query, plan_seconds=round(time.perf_counter() - t0, 4), fetch_seconds=0.0, rows=-1)
        )
        return df

    def sql_rows(self, query: str) -> list:
        """S9: rowset result with timing."""
        df = self.sql(query)
        t0 = time.perf_counter()
        rows = df.collect()
        self.stats[-1].fetch_seconds = round(time.perf_counter() - t0, 4)
        self.stats[-1].rows = len(rows)
        return rows

    def process_query(self, query: str, limit: int | None = 10000) -> dict:
        """The reference's full ``processQuery`` behavior (src/index.ts:
        349-371 + demo/routes.ts:144-171): run the SQL, return rows +
        field names + timing stats, and — exactly like the reference —
        when the projection contains ``st_asgeojson`` also return the
        rows wrapped as a GeoJSON FeatureCollection (convertRestoGeoJSON,
        src/index.ts:360-363)."""
        df = self.sql(query)
        t0 = time.perf_counter()
        rows = df.limit(limit).collect() if limit is not None else df.collect()
        self.stats[-1].fetch_seconds = round(time.perf_counter() - t0, 4)
        self.stats[-1].rows = len(rows)
        result = {
            "rows": [r.asDict() for r in rows],
            "fields": df.columns,
            "executionTime": self.stats[-1].plan_seconds + self.stats[-1].fetch_seconds,
            "totalData": len(rows),
        }
        geojson_cols = [
            c for c in df.columns if "st_asgeojson" in c.lower() or c.lower() == "geojson"
        ]
        if geojson_cols:
            import json as _json

            gcol = geojson_cols[0]
            features = []
            for r in rows:
                d = r.asDict()
                geom = d.pop(gcol, None)
                features.append(
                    {
                        "type": "Feature",
                        "properties": d,
                        "geometry": _json.loads(geom) if isinstance(geom, str) else None,
                    }
                )
            result["geojson"] = {"type": "FeatureCollection", "features": features}
        return result

    def process_query_safe(self, query: str, limit: int | None = 10000) -> dict:
        """``process_query`` with the reference's error contract
        (demo/routes.ts:173-186): a failing query returns a payload with
        ``error`` set and the input echoed, instead of raising — the
        shape a UI or API layer renders directly. Analysis errors
        (unknown table/function, syntax) surface the Spark message."""
        try:
            result = self.process_query(query, limit=limit)
            result["error"] = None
            result["input"] = query
            return result
        except Exception as e:  # noqa: BLE001 — the surface IS the catch-all
            return {
                "rows": [],
                "fields": [],
                "executionTime": 0.0,
                "totalData": 0,
                "error": str(e),
                "input": query,
            }

    def explain(self, query: str, mode: str = "formatted") -> str:
        """The debug surface the reference got by printing its rewritten
        XQuery/Mongo/SQL (src/index.ts logs each native query): here the
        single source of truth is Catalyst, so return the physical plan
        (``mode`` ∈ simple/extended/formatted/cost/codegen) — pushdown
        and pruning are directly visible as PushedFilters/ReadSchema."""
        df = self.spark.sql(query)
        return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)

    def sql_geojson(self, query: str, geometry_col: str = "geometry", limit: int | None = 10000) -> dict:
        """S10: FeatureCollection result (reference: convertRestoGeoJSON,
        src/index.ts:360-363 — triggered there by an st_asgeojson
        projection; here an explicit method)."""
        df = self.sql(query)
        t0 = time.perf_counter()
        fc = sinks.to_feature_collection(df, geometry_col=geometry_col, limit=limit)
        self.stats[-1].fetch_seconds = round(time.perf_counter() - t0, 4)
        self.stats[-1].rows = len(fc["features"])
        return fc


def create_engine(spark: SparkSession, sf_dir: str | None = None) -> SpatialSQLEngine:
    eng = SpatialSQLEngine(spark)
    if sf_dir:
        eng.register_parquet_dir(sf_dir)
    return eng


__all__ = ["SpatialSQLEngine", "create_engine", "QueryStats", "TABLES"]
