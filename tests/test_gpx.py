"""GPX source (sources/gpx.py)."""

from __future__ import annotations

import os

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.sources import (
    gpx as GP,
)

_DOC = b"""<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1" creator="t">
  <wpt lat="47.5" lon="8.25"><ele>410.5</ele><name>Summit</name>
    <time>2020-01-01T10:00:00Z</time></wpt>
  <wpt lat="-3.5" lon="151"><name>Flat</name></wpt>
  <rte><name>R1</name>
    <rtept lat="0" lon="0"/><rtept lat="1" lon="1"/><rtept lat="2" lon="1"/>
  </rte>
  <trk><name>T1</name>
    <trkseg>
      <trkpt lat="10" lon="20"><ele>100</ele>
        <time>2020-01-01T11:00:00Z</time></trkpt>
      <trkpt lat="10.5" lon="20.5"><ele>110</ele></trkpt>
    </trkseg>
    <trkseg>
      <trkpt lat="11" lon="21"/>
    </trkseg>
  </trk>
</gpx>"""


def test_features_and_dimensionality():
    rows = GP.gpx_rows(_DOC, "a.gpx")
    by = {(r["kind"], r["seg"], r["name"]): r for r in rows}
    # ele on a waypoint lifts it to Z; (x, y) = (lon, lat)
    assert by[("wpt", None, "Summit")]["geometry"] == (
        "POINT Z (8.25 47.5 410.5)"
    )
    assert by[("wpt", None, "Summit")]["time"] == "2020-01-01T10:00:00Z"
    assert by[("wpt", None, "Flat")]["geometry"] == "POINT (151 -3.5)"
    # routes are 2-D when any member lacks ele
    assert by[("rte", None, "R1")]["geometry"] == "LINESTRING (0 0, 1 1, 1 2)"
    # one row PER trkseg; all-ele segments type as Z; the first
    # member's time rides along; lone-point segments degrade to POINT
    assert by[("trk", 0, "T1")]["geometry"] == (
        "LINESTRING Z (20 10 100, 20.5 10.5 110)"
    )
    assert by[("trk", 0, "T1")]["time"] == "2020-01-01T11:00:00Z"
    assert by[("trk", 1, "T1")]["geometry"] == "POINT (21 11)"


def test_namespace_less_documents_parse_too():
    doc = b'<gpx version="1.0"><wpt lat="1" lon="2"/></gpx>'
    rows = GP.gpx_rows(doc, "x.gpx")
    assert rows[0]["geometry"] == "POINT (2 1)"


def test_failfast():
    with pytest.raises(Exception):
        GP.gpx_rows(b"<notgpx/>", "x.gpx")
    with pytest.raises(Exception):
        GP.gpx_rows(b"<gpx><wpt lon='1'/></gpx>", "x.gpx")  # no lat
    with pytest.raises(Exception):
        GP.gpx_rows(b"<gpx><wpt lat='a' lon='1'/></gpx>", "x.gpx")
    with pytest.raises(Exception):
        GP.gpx_rows(
            b"<gpx><wpt lat='1' lon='2'><ele>x</ele></wpt></gpx>", "x.gpx"
        )
    with pytest.raises(Exception):
        GP.gpx_rows(b"not xml at all", "x.gpx")


def test_spark_read_distributed(spark, tmp_path):
    p1 = os.path.join(str(tmp_path), "a.gpx")
    p2 = os.path.join(str(tmp_path), "b.gpx")
    open(p1, "wb").write(_DOC)
    open(p2, "wb").write(
        b'<gpx version="1.1"><wpt lat="5" lon="6"><name>B</name></wpt></gpx>'
    )
    df = GP.read_gpx(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6  # 5 from _DOC + 1 from b.gpx
    b = [r for r in rows if r["file"] == "b.gpx"][0]
    assert b["geometry"] == "POINT (6 5)" and b["name"] == "B"
    kinds = {r["kind"] for r in rows}
    assert kinds == {"wpt", "rte", "trk"}
