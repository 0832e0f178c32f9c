"""Shared SQL-string builders for integer nation-box WKT fixtures.

The linework/accessor/linearref driver rows all string-build WKT from
the integer nation-box coordinates (spatial_ops.NATION_BOXES_SQL) so
the oracle can construct byte-identical expected strings. The int-cast
idiom and the box-corner point expressions live here once — a change
to the integer-coordinate WKT-building idiom applies to every family
at the same time instead of by-hand in each module.
"""

from __future__ import annotations


def int_str(expr: str) -> str:
    """SQL rendering an integer-valued DOUBLE expression as its exact
    integer string ('30', not '30.0') in both Spark and DuckDB."""
    return f"CAST(CAST({expr} AS BIGINT) AS STRING)"


def sql_concat(*parts: str) -> str:
    return " || ".join(parts)


# box corners as "x y" coordinate-pair SQL over NATION_BOXES_SQL columns
CORNERS = {
    "bl": f"{int_str('minx')} || ' ' || {int_str('miny')}",
    "br": f"{int_str('maxx')} || ' ' || {int_str('miny')}",
    "tr": f"{int_str('maxx')} || ' ' || {int_str('maxy')}",
    "tl": f"{int_str('minx')} || ' ' || {int_str('maxy')}",
}
