"""Unicode normalization (functions/textnorm.py): NFC/NFKC semantics,
DuckDB parity for the oracle pair (nfc_normalize / strip_accents)."""

from __future__ import annotations

import duckdb
import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import textnorm as T

PROBES = (
    "café",          # decomposed é
    "café",           # composed é
    "é" * 5,
    "éàçüñÅøﬁŒ–über",
    "plain ascii",
    "",
    "mühleisen",
)


def test_nfc_composes():
    assert T.nfc("café") == "café"
    assert len(T.nfc("é" * 5)) == 5
    # idempotent
    for p in PROBES:
        assert T.nfc(T.nfc(p)) == T.nfc(p)
    assert T.nfc(None) is None


def test_nfkc_folds_compatibility_forms():
    assert T.nfkc("ﬁ") == "fi"          # ligature fi
    assert T.nfkc("Ｈｉ") == "Hi"     # fullwidth
    assert T.nfkc("x²") == "x2"          # superscript
    assert T.nfkc(None) is None


def test_strip_accents():
    assert T.strip_accents("café") == "cafe"
    assert T.strip_accents("mühleisen") == "muhleisen"
    # non-decomposable letters pass through
    assert T.strip_accents("øŒ") == "øŒ"
    assert T.strip_accents(None) is None


@pytest.mark.parametrize("probe", PROBES)
def test_duckdb_parity_of_the_oracle_pair(probe):
    con = duckdb.connect()
    nfc_d = con.sql("SELECT nfc_normalize(?)", params=[probe]).fetchone()[0]
    strip_d = con.sql("SELECT strip_accents(?)", params=[probe]).fetchone()[0]
    assert T.nfc(probe) == nfc_d
    assert T.strip_accents(probe) == strip_d


def test_null_inputs_yield_null_through_spark(spark):
    for name in ("text_nfc", "text_nfkc", "text_strip_accents"):
        row = spark.sql(
            f"SELECT {name}(CAST(NULL AS STRING)) AS v, {name}('café') AS w"
        ).collect()[0]
        assert row["v"] is None and row["w"] is not None, name
