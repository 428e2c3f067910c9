"""Oracle output-type guard: every DuckDB oracle must emit only types
that survive the driver's Arrow/pandas conversion with the same string
form Spark produces. Round 2's single red row (`sessionize`) was a
window `sum(b)` that DuckDB widened to HUGEINT — pandas rendered it
float64 ("7.0") while Spark emitted bigint ("7"), so the value hash
mismatched even though every value was equal. This test DESCRIBEs all
71 oracles at sf0.01 and fails on any wide/exotic output type, so the
class of bug can never cost a driver row again.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from hama_spark.session import TABLES

SF_DIR = "/root/testdata/sf0.01"

# Types whose stringified pandas form matches Spark's stringified form.
# HUGEINT / DECIMAL / UHUGEINT / UBIGINT are deliberately absent: pandas
# renders them as float64 / object and the driver's hash diverges.
SAFE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
}


def _base(typ: str) -> str:
    return typ.split("(")[0].strip()


def _is_safe(typ: str) -> bool:
    base = _base(typ)
    if base.endswith("[]"):  # list columns: element type must be safe too
        return _is_safe(base[:-2])
    return base in SAFE


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_oracle_emits_driver_safe_types(con):
    oracles = entrymod.oracle_sql()
    assert oracles, "oracle_sql() returned nothing"
    offenders = []
    for name, sql in oracles.items():
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        for col, typ, *_ in desc:
            if not _is_safe(typ):
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracle columns with driver-unsafe types (cast them in the SQL): "
        f"{offenders}"
    )


def test_every_query_has_oracle_or_is_documented():
    """Each queries() entry should have an oracle twin; rows-only checks
    are weaker and must stay a deliberate, short list."""
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    missing = qs - oracles
    # no exemptions today — every query is SQL-expressible
    assert not missing, f"queries without oracles: {sorted(missing)}"
    stray = oracles - qs
    assert not stray, f"oracles without queries: {sorted(stray)}"
