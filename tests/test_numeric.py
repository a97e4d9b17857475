"""Parity of core/numeric.int_lex with the SQL twins' regex-guarded
HUGEINT cast, plus the pinned evidence for why the fragment's SUM/AVG are
integer-only (DuckDB's decimal cast is not mirrorable — see the
core/numeric.py docstring)."""

from __future__ import annotations

import random

import duckdb

from rdf_xml_ex_ray.core.numeric import INT_LEX_SQL_RE, int_lex

EDGE_CASES = [
    "0", "7", "-7", "+7", "007", "-007", "123456789012345678",
    "1234567890123456789",  # 19 digits: out of fragment -> NULL
    "-123456789012345678", " 7", "7 ", "\t7", "7\n", "", " ", "-", "+",
    "- ", "+ ", "--7", "+-7", "7.0", "7.", ".7", "7e1", "7E1", "1_0",
    "0x7", "٧", "７", "inf", "nan", "7a", "a7", "7-", None,
]


def _oracle(con, s):
    row = con.execute(
        "SELECT CAST(TRY_CAST(CASE WHEN regexp_matches(?, '" + INT_LEX_SQL_RE +
        "') THEN ? END AS HUGEINT) AS VARCHAR)",
        [s, s],
    ).fetchone()
    return row[0]


def test_edge_case_parity():
    con = duckdb.connect()
    for s in EDGE_CASES:
        want = _oracle(con, s)
        got = int_lex(s)
        got_str = None if got is None else str(got)
        assert got_str == want, f"int_lex({s!r}): {got_str!r} != duckdb {want!r}"


def test_random_parity():
    con = duckdb.connect()
    rng = random.Random(20260818)
    alphabet = "0123456789._+-eE \t"
    for _ in range(3000):
        s = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(1, 26))
        )
        want = _oracle(con, s)
        got = int_lex(s)
        got_str = None if got is None else str(got)
        assert got_str == want, f"int_lex({s!r}): {got_str!r} != duckdb {want!r}"


def test_sum_avg_building_blocks():
    """float(int) is the correctly-rounded parse of the SUM string — the
    identity AVG's parity rests on (strtod == Python float-of-int)."""
    con = duckdb.connect()
    rng = random.Random(7)
    for _ in range(500):
        x = rng.randrange(-(10**24), 10**24)
        want = con.execute(
            "SELECT CAST(CAST(? AS VARCHAR) AS DOUBLE)", [str(x)]
        ).fetchone()[0]
        assert float(x) == want


def test_duckdb_decimal_cast_unmirrorable():
    """Pins the probe that rejected DECIMAL(38,9) semantics: the same
    value written two ways rounds differently inside DuckDB, so no
    engine-independent kernel can define SUM through that cast. If this
    ever starts failing, DuckDB fixed its parser and the fragment could
    widen to decimal forms."""
    con = duckdb.connect()
    a = con.execute(
        "SELECT CAST(TRY_CAST('6e-11' AS DECIMAL(38,9)) AS VARCHAR)"
    ).fetchone()[0]
    b = con.execute(
        "SELECT CAST(TRY_CAST('0.0000000006e-1' AS DECIMAL(38,9)) AS VARCHAR)"
    ).fetchone()[0]
    assert a == "0.000000001" and b == "0.000000000"
