"""SAMPLE_HASH portability at 100 TB-scale id ranges (round-5 ADVICE).

The pre-round-6 form ``(id * 2654435761) % 2^32`` overflowed int64 for
ids > ~3.47e9: Spark (non-ANSI) wrapped silently while DuckDB raised,
so "portable, exact on any engine" broke exactly at the id ranges the
scale story invokes. The fixed form reduces the id mod 2^32 BEFORE the
multiply; these tests pin (a) Spark/DuckDB/Python agreement at small
AND huge ids, (b) value-equality with the old form at small ids (the
hash-neutrality claim that lets trained quantizers stay unchanged).
"""

from __future__ import annotations

import duckdb

from etl_transparencia_sergipe_spark.operators.similarity import SAMPLE_HASH

# spans the old overflow boundary (~3.47e9) and the int64 extremes the
# old form could never reach on DuckDB
IDS = [0, 1, 7, 12345, 2**31 - 1, 3_470_000_000, 2**32 - 1, 2**32,
       2**40 + 17, 2**62, 2**63 - 1]


def _py_hash(i: int) -> int:
    return ((i % 4294967296) * 2654435761) % 4294967296


def test_duckdb_matches_python_on_huge_ids():
    con = duckdb.connect()
    expr = SAMPLE_HASH.format(id="i")
    vals = ", ".join(f"({i}::BIGINT)" for i in IDS)
    got = con.execute(
        f"SELECT i, {expr} AS h FROM (VALUES {vals}) AS t(i) ORDER BY i"
    ).fetchall()
    assert got == [(i, _py_hash(i)) for i in sorted(IDS)]


def test_spark_matches_python_on_huge_ids(spark):
    expr = SAMPLE_HASH.format(id="i")
    df = spark.createDataFrame([(i,) for i in IDS], "i bigint")
    got = {r["i"]: r["h"] for r in
           df.selectExpr("i", f"{expr} AS h").collect()}
    assert got == {i: _py_hash(i) for i in IDS}


def test_small_id_values_unchanged_vs_old_form():
    """Below 2^32 the pre-reduction is a mathematical no-op, so every
    trained quantizer / sample order in the gates is unchanged."""
    for i in [0, 1, 999, 123_456_789, 2**31, 2**32 - 1]:
        assert _py_hash(i) == (i * 2654435761) % 4294967296
