"""Driver-checkable infrastructure queries: file readers (GML / KML /
GeoJSON), sinks, the engine facade, the flattened-naming compat layer,
and the bucketed storage layout — each exercised end-to-end with a
DuckDB oracle.

The rest of the registry reads the parquet fixtures directly, so these
surfaces — the S1/S2/S5/S6 file-reader path (row-path detection,
attribute mapping, schema inference, geometry conversion — reference
xml_extension.ts:495-548), the S3/S4 GeoJSON path, the S9/S10 rowset +
FeatureCollection facade (processQuery, src/index.ts:349-371), §1.3
flattening compat, and the bucketed-join layout — previously had only
pytest coverage. Every query here derives its input deterministically
from fixture rows, so the oracle is plain SQL over the same fixture.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from xml.sax.saxutils import escape

from pyspark.sql import functions as F

from ..engine import SpatialSQLEngine
from ..sources.tables import TABLES, load_table
from ..sources.xml import read_xml
from .registry import query


def _scratch_dir(name: str, sf_dir: str) -> str:
    """Fixed per-(query, sf) scratch path under one temp root, removed
    and recreated on each call — repeated driver/bench runs overwrite in
    place instead of accumulating orphaned ``mkdtemp`` directories
    (ADVICE r3). The sf tag keeps a concurrent bench run at another
    scale factor from clobbering the driver's files; re-generating the
    same (query, sf) pair rewrites byte-identical content, so a rerun
    racing a still-lazy reader is harmless."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(tempfile.gettempdir(), "spark_graft_ingest", f"{name}_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path


def _nation_gml(rows) -> str:
    """Deterministic GML FeatureCollection for a list of nation Rows:
    per feature an ``iso`` ATTRIBUTE on the row element, scalar child
    elements, a nested ``meta`` element (struct flattening), and a
    ``gml:Point`` at integer coords (regionkey, nationkey) so the WKT
    the reader emits is exactly reproducible in SQL."""
    feats = []
    for r in rows:
        feats.append(
            f'<gml:featureMember><Nation iso="N{r.n_nationkey}">'
            f"<n_nationkey>{r.n_nationkey}</n_nationkey>"
            f"<n_name>{escape(r.n_name)}</n_name>"
            f"<n_regionkey>{r.n_regionkey}</n_regionkey>"
            f"<meta><origin>tpch</origin><seq>{2 * r.n_nationkey}</seq></meta>"
            f"<gml:Point><gml:pos>{r.n_regionkey} {r.n_nationkey}</gml:pos></gml:Point>"
            f"</Nation></gml:featureMember>"
        )
    return (
        '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">'
        + "".join(feats)
        + "</gml:FeatureCollection>"
    )


@query(
    "q99_xml_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           'N' || CAST(n_nationkey AS VARCHAR) AS iso,
           CAST(2 * n_nationkey AS BIGINT) AS seq,
           'POINT (' || CAST(n_regionkey AS VARCHAR) || ' '
                     || CAST(n_nationkey AS VARCHAR) || ')' AS wkt
    FROM nation
    """,
)
def q99_xml_roundtrip(spark, sf_dir):
    """S1/S2/S5/S6 end-to-end: build a GML document from the nation
    fixture, write it to files, read it back through ``read_xml`` (GML
    row-path auto-detection, ``_attribute__`` mapping, nested-struct
    flattening, gml:Point → WKT), and project the flattened columns.

    The 25-row collect is the document GENERATOR, not the query path —
    the read itself is distributed (one task per file; rows split across
    two files so multi-file ingest + cross-file schema inference is
    exercised, reference xml_extension.ts:236-273 first-row sniffing
    being the bug class this avoids)."""
    rows = sorted(
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect(),
        key=lambda r: r.n_nationkey,
    )
    out_dir = _scratch_dir("q99_gml", sf_dir)
    for tag, part in (("even", rows[0::2]), ("odd", rows[1::2])):
        with open(os.path.join(out_dir, f"nation_{tag}.gml"), "w") as f:
            f.write(_nation_gml(part))
    df = read_xml(spark, out_dir)
    return df.select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        F.col("n_name").alias("n_name"),
        F.col("n_regionkey").cast("bigint").alias("n_regionkey"),
        F.col("_iso").alias("iso"),
        F.col("meta.seq").cast("bigint").alias("seq"),
        F.col("geometry").alias("wkt"),
    )


@query(
    "q101_geojson_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           'POINT (' || CAST(n_regionkey AS VARCHAR) || ' '
                     || CAST(n_nationkey AS VARCHAR) || ')' AS wkt
    FROM nation
    """,
)
def q101_geojson_roundtrip(spark, sf_dir):
    """S3/S4 end-to-end: nation rows → NDJSON GeoJSON Features (the
    splittable scale format, one Feature per line) across two files →
    ``read_geojson(lines=True)`` (property flattening + geometry →
    WKT via st_geomfromgeojson, reference mongo_extension.ts:84-101 /
    json_extension.ts:131-158). Generator collect is 25 rows; the read
    is distributed."""
    import json

    from ..sources.geojson import read_geojson

    rows = sorted(
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect(),
        key=lambda r: r.n_nationkey,
    )
    out_dir = _scratch_dir("q101_geojson", sf_dir)
    for tag, part in (("even", rows[0::2]), ("odd", rows[1::2])):
        with open(os.path.join(out_dir, f"nation_{tag}.ndjson"), "w") as f:
            for r in part:
                f.write(
                    json.dumps(
                        {
                            "type": "Feature",
                            "properties": {
                                "n_nationkey": r.n_nationkey,
                                "n_name": r.n_name,
                                "n_regionkey": r.n_regionkey,
                            },
                            "geometry": {
                                "type": "Point",
                                "coordinates": [r.n_regionkey, r.n_nationkey],
                            },
                        }
                    )
                    + "\n"
                )
    df = read_geojson(spark, out_dir, lines=True)
    return df.select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        F.col("n_name").alias("n_name"),
        F.col("n_regionkey").cast("bigint").alias("n_regionkey"),
        F.col("geometry").alias("wkt"),
    )


@query(
    "q102_geojson_sink_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name,
           'POINT (' || CAST(n_regionkey AS VARCHAR) || ' '
                     || CAST(n_nationkey AS VARCHAR) || ')' AS wkt
    FROM nation
    """,
)
def q102_geojson_sink_roundtrip(spark, sf_dir):
    """S10 end-to-end: a result with a geometry column exits through the
    GeoJSONSeq sink (``sinks.feature_lines`` → executor-side
    ``write.text``, the scalable variant of the reference's driver-built
    FeatureCollection, src/index.ts:323-347) and is read back by the
    S3/S4 reader — sink and reader must agree on the Feature schema for
    the round trip to hash-match the SQL oracle."""
    from ..sources.geojson import read_geojson
    from ..sources.sinks import feature_lines

    wkt = F.concat(
        F.lit("POINT ("),
        F.col("n_regionkey").cast("string"),
        F.lit(" "),
        F.col("n_nationkey").cast("string"),
        F.lit(")"),
    )
    src = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", wkt.alias("geometry"))
    )
    out_dir = os.path.join(_scratch_dir("q102_geojson", sf_dir), "out")
    feature_lines(src).write.text(out_dir)
    df = read_geojson(spark, out_dir, lines=True)
    return df.select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        F.col("n_name").alias("n_name"),
        F.col("geometry").alias("wkt"),
    )


@query(
    "q100_engine_rowset",
    oracle="""
    SELECT n_regionkey,
           CAST(count(*) AS BIGINT) AS n_nations,
           round(max(CAST(n_nationkey AS DOUBLE)), 6) AS max_dist
    FROM nation GROUP BY n_regionkey
    """,
)
def q100_engine_rowset(spark, sf_dir):
    """S9 facade: the query text enters through ``SpatialSQLEngine.sql``
    (register tables → spark.sql with spatial UDFs → timed rowset —
    the reference's processQuery lifecycle, src/index.ts:349-371) rather
    than the DataFrame API. st_distance(st_point(k, 0), origin) = k, so
    the oracle needs no spatial engine."""
    eng = SpatialSQLEngine(spark)
    eng.register_parquet_dir(sf_dir)
    return eng.sql(
        """
        SELECT n_regionkey,
               count(*) AS n_nations,
               round(max(st_distance(
                   st_point(CAST(n_nationkey AS DOUBLE), 0.0D),
                   st_point(0.0D, 0.0D))), 6) AS max_dist
        FROM nation GROUP BY n_regionkey
        """
    )


def _nation_kml(rows) -> str:
    """Deterministic KML Document: one Placemark per nation row, KML
    comma-separated ``coordinates`` syntax (lon,lat) — the OTHER row-path
    family (Placemark auto-detect rather than GML featureMember)."""
    marks = []
    for r in rows:
        marks.append(
            "<Placemark>"
            f"<name>{escape(r.n_name)}</name>"
            f"<n_nationkey>{r.n_nationkey}</n_nationkey>"
            f"<Point><coordinates>{r.n_regionkey},{r.n_nationkey}</coordinates></Point>"
            "</Placemark>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
        + "".join(marks)
        + "</Document></kml>"
    )


@query(
    "q108_kml_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name AS name,
           'POINT (' || CAST(n_regionkey AS VARCHAR) || ' '
                     || CAST(n_nationkey AS VARCHAR) || ')' AS wkt
    FROM nation
    """,
)
def q108_kml_roundtrip(spark, sf_dir):
    """S1/S2/S5 via the KML branch: Placemark row-path auto-detection and
    comma-separated ``coordinates`` parsing (reference served KML from
    eXist-db collections the same way it served GML —
    xml_extension.ts:495-548). Same two-file distributed-read shape as
    q99."""
    rows = sorted(
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect(),
        key=lambda r: r.n_nationkey,
    )
    out_dir = _scratch_dir("q108_kml", sf_dir)
    for tag, part in (("even", rows[0::2]), ("odd", rows[1::2])):
        with open(os.path.join(out_dir, f"nation_{tag}.kml"), "w") as f:
            f.write(_nation_kml(part))
    df = read_xml(spark, out_dir)
    return df.select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        F.col("name").alias("name"),
        F.col("geometry").alias("wkt"),
    )


@query(
    "q114_compat_flattened",
    oracle="""
    SELECT n_nationkey,
           n_name AS n_name_flat,
           'N' || CAST(n_nationkey AS VARCHAR) AS attr_iso,
           CAST(2 * n_nationkey AS BIGINT) AS meta_seq,
           'tpch' AS undef_origin,
           CAST(2 * n_nationkey AS BIGINT) AS undef_seq
    FROM nation
    """,
)
def q114_compat_flattened(spark, sf_dir):
    """§1.3 end-to-end: the q99 GML document read back and projected
    through the REFERENCE's flattened naming — ``meta__seq``
    (`parent__child`, xml_extension.ts:1831-2044), ``_attribute__iso``
    (row-element attribute, preprocessing.ts:90-106) via
    ``flattened_view``, plus ``_undef__``-style location-unknown columns
    via ``undef_column`` (coalesce over element/attribute/nested
    locations, xml_extension.ts:1711-1737). Pure projection over the
    reader output, so Catalyst pruning still reaches the parse."""
    from ..sources.compat import flattened_view, undef_column

    rows = sorted(
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect(),
        key=lambda r: r.n_nationkey,
    )
    out_dir = _scratch_dir("q114_gml", sf_dir)
    for tag, part in (("even", rows[0::2]), ("odd", rows[1::2])):
        with open(os.path.join(out_dir, f"nation_{tag}.gml"), "w") as f:
            f.write(_nation_gml(part))
    df = read_xml(spark, out_dir)
    flat = flattened_view(df).select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        F.col("n_name").alias("n_name_flat"),
        F.col("_attribute__iso").alias("attr_iso"),
        F.col("meta__seq").cast("bigint").alias("meta_seq"),
    )
    undef = df.select(
        F.col("n_nationkey").cast("bigint").alias("k"),
        undef_column(df, "origin").alias("undef_origin"),
        undef_column(df, "seq").cast("bigint").alias("undef_seq"),
    )
    return flat.join(undef, flat.n_nationkey == undef.k).drop("k")


@query(
    "q121_catalog_tables",
    oracle="""
    SELECT * FROM (VALUES ('customer'), ('documents'), ('embeddings'),
                          ('events'), ('lineitem'), ('nation'), ('orders'),
                          ('part'), ('region'), ('supplier')) AS t(table_name)
    """,
)
def q121_catalog_tables(spark, sf_dir):
    """S8 catalog listing end-to-end (reference: BaseX ``db:list`` /
    Mongo ``listCollections``, basex_extension.ts:358-377): register the
    fixture directory through the engine facade, list the catalog back
    through ``SpatialSQLEngine.tables()``, and return the fixture-table
    rows. Catalog metadata is inherently driver-side (the reference's
    listing was a server round-trip the same way), so the 10-name list →
    DataFrame is the surface under test, not a data collect. Filtered to
    the fixture set because a shared session may carry other temp views
    (e.g. q118's bucketed tables)."""
    eng = SpatialSQLEngine(spark)
    eng.register_parquet_dir(sf_dir)
    names = sorted(n for n in set(eng.tables()) if n in TABLES)
    return spark.createDataFrame([(n,) for n in names], ["table_name"])


@query(
    "q118_bucketed_join",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def q118_bucketed_join(spark, sf_dir):
    """Storage-layout surface end-to-end: both join sides written as
    bucketed+sorted managed tables on the join key, then joined through
    ``bucketed_join`` — the plan has ZERO Exchange nodes on either side
    (asserted in tests/test_layout.py), which at 100 TB amortizes the
    fact-join shuffle into a one-time write. The write happens inside
    the query so the driver exercises write + bucketed read + join;
    results are layout-independent, so the oracle is the plain join."""
    from concurrent.futures import ThreadPoolExecutor

    from ..sources.layout import bucketed_join, write_bucketed

    # The two bucketed writes are independent jobs — submit them from a
    # small thread pool so the second one back-fills executors the
    # first one's tail leaves idle (guide §2.6 "overlap independent
    # jobs"; actions are only sequential because driver code calls
    # them sequentially). Each write targets its own table, so there
    # is no shared state beyond the session. ASSUMPTION (ADVICE r17):
    # concurrent same-session catalog mutations (DROP TABLE + rmtree +
    # saveAsTable per write) are safe here because this deployment uses
    # Spark's in-memory catalog; on a Hive/Derby metastore, serialize
    # the two DROP/rmtree DDL steps and parallelize only the write jobs.
    def _write(args):
        name, table = args
        write_bucketed(
            load_table(spark, sf_dir, name).withColumnRenamed(
                "o_custkey" if name == "orders" else "c_custkey", "custkey"
            ),
            table,
            "custkey",
            buckets=8,
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(_write, [("orders", "q118_orders_b"),
                               ("customer", "q118_customer_b")]))
    j = bucketed_join(spark, "q118_orders_b", "q118_customer_b", ["custkey"])
    return j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )
