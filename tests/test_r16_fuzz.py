"""r16 property fuzz: '+proj=' parameter paths, arc recognition,
authalic areas, spheroid predicate, GC-Z force laws, curved WKB."""

from __future__ import annotations

import math
import random
import struct

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    curves as C,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    measure_m as M,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    projection as P,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    spheroid as S,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    wkb as W,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    zcoord as Z,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
    Geometry,
)


def _pt(x, y):
    return Geometry("Point", (x, y))


class TestProjParamFuzz:
    DOMAINS = {
        # text, matching table SRID (None = no table twin), lon/lat box
        ("+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
         "+y_0=10000000 +ellps=GRS80"): (None, (166, 179, -47, -34)),
        ("+proj=aea +lat_1=34 +lat_2=40.5 +lat_0=0 +lon_0=-120 "
         "+x_0=0 +y_0=-4000000 +ellps=GRS80"): (None, (-125, -114, 32, 42)),
        ("+proj=stere +lat_0=90 +k=0.994 +x_0=2000000 +y_0=2000000 "
         "+ellps=WGS84"): (None, (-180, 180, 60, 89)),
        ("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
         "+x_0=700000 +y_0=6600000 +ellps=GRS80"): (2154, (-5, 10, 41, 51)),
        ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
         "+ellps=GRS80"): (3035, (-10, 30, 35, 70)),
    }

    def test_roundtrip_and_table_equality(self):
        rng = random.Random(160)
        for text, (srid, (w, e, s, n)) in self.DOMAINS.items():
            for _ in range(60):
                lon, lat = rng.uniform(w, e), rng.uniform(s, n)
                fwd = P.transform_any(_pt(lon, lat), 4326, text).coords
                back = P.transform_any(_pt(*fwd), text, 4326).coords
                assert abs(back[0] - lon) < 1e-7, (text, lon, lat)
                assert abs(back[1] - lat) < 1e-7, (text, lon, lat)
                if srid is not None:
                    tbl = P.transform(_pt(lon, lat), 4326, srid).coords
                    assert fwd == tbl, (text, srid, lon, lat)

    def test_utm_zone_strings_match_epsg_everywhere(self):
        rng = random.Random(161)
        for _ in range(80):
            zone = rng.randint(1, 60)
            south = rng.random() < 0.5
            lon = (zone * 6 - 183) + rng.uniform(-2.5, 2.5)
            lat = rng.uniform(-79, -1) if south else rng.uniform(1, 83)
            text = f"+proj=utm +zone={zone}{' +south' if south else ''} +ellps=WGS84"
            srid = (32700 if south else 32600) + zone
            a = P.transform_any(_pt(lon, lat), 4326, text).coords
            b = P.transform(_pt(lon, lat), 4326, srid).coords
            assert a == b, (zone, south, lon, lat)


class TestLineToCurveFuzz:
    def test_unstroke_relinearize_closes(self):
        rng = random.Random(162)
        for _ in range(120):
            cx, cy = rng.uniform(-50, 50), rng.uniform(-50, 50)
            r = rng.uniform(0.5, 40)
            a0 = rng.uniform(0, 2 * math.pi)
            sweep = rng.uniform(0.8, 4.0)  # radians, big enough to pin
            qs = rng.randint(2, 16)
            p = lambda t: (cx + r * math.cos(t), cy + r * math.sin(t))  # noqa: E731
            cs = (
                f"CIRCULARSTRING ({p(a0)[0]} {p(a0)[1]}, "
                f"{p(a0 + sweep / 2)[0]} {p(a0 + sweep / 2)[1]}, "
                f"{p(a0 + sweep)[0]} {p(a0 + sweep)[1]})"
            )
            lin = C.curvetoline_wkt(cs, qs)
            assert lin is not None
            npts = lin.count(",") + 1
            if npts < 5:
                continue  # below the unstroke minimum by design
            ltc = C.linetocurve_wkt(lin)
            assert ltc is not None and ltc.startswith("CIRCULARSTRING ("), (
                cs,
                qs,
                ltc,
            )
            relin = C.curvetoline_wkt(ltc, qs)
            # same circle through float-recovered points: vertexwise close
            lp = [tuple(map(float, t.split())) for t in lin[12:-1].split(", ")]
            rp = [tuple(map(float, t.split())) for t in relin[12:-1].split(", ")]
            assert len(lp) == len(rp)
            for (x1, y1), (x2, y2) in zip(lp, rp):
                assert abs(x1 - x2) < 1e-6 * max(1.0, r) and abs(y1 - y2) < 1e-6 * max(
                    1.0, r
                ), (cs, qs)

    def test_random_polylines_never_misconvert(self):
        # random jitter keeps points OFF any common circle: output must
        # echo canonically (no phantom arcs)
        rng = random.Random(163)
        for _ in range(80):
            pts = []
            x = y = 0.0
            for _ in range(rng.randint(4, 12)):
                x += rng.uniform(0.5, 3.0)
                y += rng.uniform(-2.0, 2.0)
                pts.append((round(x, 6), round(y, 6)))
            import sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry as G

            w = G.to_wkt(Geometry("LineString", pts))
            out = C.linetocurve_wkt(w)
            if out != w:
                # a conversion is only legal if some 5-run truly sits
                # on one circle — re-linearizing must reproduce the
                # original vertices; otherwise it IS a misconversion
                assert out.startswith(("CIRCULARSTRING", "COMPOUNDCURVE"))


class TestAreaSpheroidFuzz:
    def test_lune_additivity_and_globe_total(self):
        rng = random.Random(164)
        qp, e = S._authalic_setup(6378137.0, 1.0 / 298.257223563)
        r2 = 6378137.0**2 * qp / 2.0
        globe = 4.0 * math.pi * r2
        for _ in range(60):
            l1 = rng.uniform(-170, 160)
            l3 = l1 + rng.uniform(2.0, 19.0)
            l2 = rng.uniform(l1 + 0.5, l3 - 0.5)
            A = lambda a, b: S.areaspheroid_of(  # noqa: E731
                f"POLYGON (({a} 0, {b} 0, {a} 90, {a} 0))"
            )
            whole, p1, p2 = A(l1, l3), A(l1, l2), A(l2, l3)
            assert abs(whole - (p1 + p2)) < 1e-9 * whole
        oct_area = S.areaspheroid_of("POLYGON ((0 0, 90 0, 0 90, 0 0))")
        assert abs(8.0 * oct_area - globe) < 1e-12 * globe

    def test_shoelace_limit_small_figures(self):
        # tiny equatorial figures approach planar area on the authalic
        # sphere: compare against R² × (planar shoelace in radians)
        rng = random.Random(165)
        qp, e = S._authalic_setup(6378137.0, 1.0 / 298.257223563)
        for _ in range(40):
            cx, cy = rng.uniform(-170, 170), rng.uniform(-5, 5)
            d = rng.uniform(0.001, 0.02)
            w = (
                f"POLYGON (({cx} {cy}, {cx + d} {cy}, {cx + d} {cy + d}, "
                f"{cx} {cy + d}, {cx} {cy}))"
            )
            a = S.areaspheroid_of(w)
            # planar estimate with the meridian/parallel arc lengths
            a_est = (
                math.radians(d) * 6378137.0 * math.cos(math.radians(cy))
            ) * (math.radians(d) * 6378137.0 * (1 - 1 / 298.257223563) ** 0)
            assert abs(a - a_est) < 0.02 * a_est, (w, a, a_est)


class TestDWithinGcWkbFuzz:
    def test_dwithin_brackets_distance(self):
        rng = random.Random(166)
        for _ in range(150):
            a = f"POINT ({rng.uniform(-179, 179)} {rng.uniform(-85, 85)})"
            b = f"POINT ({rng.uniform(-179, 179)} {rng.uniform(-85, 85)})"
            g = S.distancespheroid_of(a, b)
            if not g:
                continue
            assert S.dwithinspheroid_of(a, b, g + 1.0) is True
            assert S.dwithinspheroid_of(a, b, max(g - 1.0, 0.0) * 0.999) is False

    def test_gc_force_laws(self):
        rng = random.Random(167)
        for _ in range(60):
            members = []
            for _ in range(rng.randint(1, 4)):
                x, y = rng.randint(-99, 99), rng.randint(-99, 99)
                if rng.random() < 0.5:
                    members.append(f"POINT ({x} {y})")
                else:
                    members.append(
                        f"LINESTRING ({x} {y}, {x + 1} {y + 2})"
                    )
            gc = "GEOMETRYCOLLECTION (" + ", ".join(members) + ")"
            z = rng.randint(-5, 5)
            g3 = Z.force3d_wkt(gc, z)
            assert g3 is not None and " Z " in g3
            # force2d undoes force3d back to the canonical 2-D text
            assert M.force2d_wkt(g3) == M.force2d_wkt(gc)
            # force4d(force3d) keeps Z and gains M
            g4 = Z.force4d_wkt(g3, 0, 7)
            assert g4 is not None and " ZM " in g4
            assert Z.zmin_of(g3) == float(z) == Z.zmax_of(g3)
            # WKB roundtrip of the dimensional collection
            assert W.wkb_to_wkt(W.wkt_to_wkb(g3)) == g3

    def test_random_circularstring_wkb_matches_linearizer(self):
        rng = random.Random(168)
        for _ in range(60):
            n = rng.choice([3, 5, 7, 9])
            pts = []
            cx, cy, r = rng.uniform(-40, 40), rng.uniform(-40, 40), rng.uniform(1, 20)
            a0 = rng.uniform(0, math.pi)
            for i in range(n):
                t = a0 + i * (math.pi / n)
                pts.append((cx + r * math.cos(t), cy + r * math.sin(t)))
            buf = struct.pack("<BII", 1, 8, n) + b"".join(
                struct.pack("<2d", *p) for p in pts
            )
            import sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry as G

            cs = "CIRCULARSTRING (" + ", ".join(
                f"{G._fmt(x)} {G._fmt(y)}" for x, y in pts
            ) + ")"
            assert W.wkb_to_wkt(buf) == C.curvetoline_wkt(cs, 32)
