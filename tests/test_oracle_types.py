"""Standing type audit of every ``oracle_sql()`` block.

The driver's correctness gate hashes *values*, so a DuckDB result column
typed HUGEINT/DECIMAL (e.g. an uncast windowed ``SUM(BIGINT)``) can
value-match Spark's BIGINT yet hash differently.  Round 1's
``sessionize_events`` and round 2's ``sequence_packing`` both failed on
exactly this class.  This test kills the class permanently: DESCRIBE
every oracle query and assert no column resolves to a banned width.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

# Types whose textual/hashed representation can diverge from the Spark
# column that value-matches them.
BANNED = re.compile(r"HUGEINT|DECIMAL\(", re.IGNORECASE)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_oracle_emits_no_wide_types(name):
    sql = entry_mod.oracle_sql()[name]
    con = _duck(SF_DIR)
    # DESCRIBE resolves the output schema without materializing rows.
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(cname, ctype) for cname, ctype, *_ in rows if BANNED.search(ctype)]
    assert not bad, (
        f"{name}: oracle emits driver-hash-unsafe column types {bad}; "
        f"CAST them to BIGINT/DOUBLE in the oracle SQL"
    )
