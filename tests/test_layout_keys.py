"""Pins the unrolled Hilbert xy2d SQL (shared verbatim by
q_hilbert_key and its DuckDB oracle) against the textbook recursive
implementation over the FULL 256x256 grid: bijection onto [0, 65536)
and Manhattan-adjacency of consecutive d — the two properties that
make the key a valid space-filling-curve layout order.

DuckDB-only (no Spark session): the SQL text is identical on both
engines by construction (`_hilbert_rounds()`), so one engine pins
both.
"""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry_mod


def _xy2d_ref(n: int, x: int, y: int) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rot(s): the d2xy-consistent variant encoded in _hilbert_rounds
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_sql_matches_reference_full_grid():
    sql = (
        "SELECT x0, y0, x0 AS x, y0 AS y, CAST(0 AS BIGINT) AS d FROM ("
        "SELECT CAST(gx.range AS BIGINT) AS x0, CAST(gy.range AS BIGINT) AS y0 "
        "FROM range(256) gx CROSS JOIN range(256) gy)"
    )
    for d_, nx, ny in entry_mod._hilbert_rounds():
        sql = f"SELECT x0, y0, {d_} AS d, {nx} AS x, {ny} AS y FROM ({sql})"
    con = duckdb.connect()
    rows = con.sql(f"SELECT x0, y0, d FROM ({sql}) ORDER BY d").fetchall()

    assert len(rows) == 65536
    # bijection + exact agreement with the recursive reference
    seen = set()
    for x0, y0, d in rows:
        assert _xy2d_ref(256, x0, y0) == d
        seen.add(d)
    assert seen == set(range(65536))
    # consecutive d are Manhattan-adjacent cells (the Hilbert property)
    for i in range(65535):
        xa, ya, _ = rows[i]
        xb, yb, _ = rows[i + 1]
        assert abs(xa - xb) + abs(ya - yb) == 1
