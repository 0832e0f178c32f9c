"""String-similarity kernels (functions/strsim.py) vs DuckDB's own
implementations — the independent-oracle idiom."""

from __future__ import annotations

import random

import duckdb
import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    strsim as S,
)


def test_known_anchors():
    # the classic published examples
    assert abs(S.jaro("martha", "marhta") - 0.9444444444444445) < 1e-15
    assert abs(S.jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-15
    assert S.damerau_levenshtein("ca", "abc") == 2  # FULL DL, not OSA (3)
    assert S.damerau_levenshtein("kitten", "sitting") == 3
    assert S.hamming("abc", "abd") == 1
    assert abs(S.jaccard_chars("duck", "luck") - 0.6) < 1e-15


def test_duckdb_matched_edges():
    # DuckDB / fuzzystrmatch: empty side → 0.0 jaro
    assert S.jaro("", "") == 0.0
    assert S.jaro("", "a") == 0.0
    assert S.jaro_winkler("", "") == 0.0
    assert S.damerau_levenshtein("", "abc") == 3
    # hamming requires equal lengths (DuckDB raises → loud NULL here)
    assert S.hamming("a", "ab") is None
    # jaccard on an empty side (DuckDB raises → loud NULL here)
    assert S.jaccard_chars("", "a") is None
    for fn in (
        S.jaro,
        S.jaro_winkler,
        S.damerau_levenshtein,
        S.hamming,
        S.jaccard_chars,
    ):
        assert fn(None, "x") is None and fn("x", None) is None


def test_winkler_boost_threshold():
    # shares a 2-char prefix but jaro <= 0.7: NO winkler boost
    a, b = "abzzzzzz", "abq"
    j = S.jaro(a, b)
    assert j <= 0.7
    assert S.jaro_winkler(a, b) == j


def test_length_budget_is_loud():
    long = "x" * (S._MAX_LEN + 1)
    assert S.jaro(long, "x") is None
    assert S.damerau_levenshtein(long, "x") is None


def test_fuzz_against_duckdb():
    con = duckdb.connect()
    rng = random.Random(99)
    for _ in range(400):
        a = "".join(rng.choice("abcde fgh") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abcde fgh") for _ in range(rng.randint(0, 12)))
        dj, djw, ddl = con.execute(
            "SELECT jaro_similarity(?,?), jaro_winkler_similarity(?,?),"
            " damerau_levenshtein(?,?)",
            [a, b, a, b, a, b],
        ).fetchone()
        assert abs(S.jaro(a, b) - dj) < 1e-12, (a, b)
        assert abs(S.jaro_winkler(a, b) - djw) < 1e-12, (a, b)
        assert S.damerau_levenshtein(a, b) == ddl, (a, b)
        if a and b:
            (djac,) = con.execute(
                "SELECT jaccard(?,?)", [a, b]
            ).fetchone()
            assert abs(S.jaccard_chars(a, b) - djac) < 1e-12, (a, b)
        if len(a) == len(b) and a:
            (dham,) = con.execute(
                "SELECT hamming(?,?)", [a, b]
            ).fetchone()
            assert S.hamming(a, b) == dham, (a, b)


def test_sql_surface(spark):
    row = spark.sql(
        "SELECT text_jaro('martha', 'marhta') AS j,"
        " text_jarowinkler('martha', 'marhta') AS jw,"
        " text_damerau('ca', 'abc') AS dl,"
        " text_hamming('abc', 'abd') AS h,"
        " text_jaccard_chars('duck', 'luck') AS jac,"
        " text_jaro(CAST(NULL AS STRING), 'x') AS nj"
    ).collect()[0]
    assert abs(row["j"] - 0.9444444444444445) < 1e-15
    assert abs(row["jw"] - 0.9611111111111111) < 1e-15
    assert row["dl"] == 2 and row["h"] == 1
    assert abs(row["jac"] - 0.6) < 1e-15
    assert row["nj"] is None
