"""Registry integrity: every query has an oracle twin and every oracle is
valid DuckDB SQL against the driver's table set (caught at test time, not
driver time). JVM-free — pure DuckDB."""

import duckdb
import pytest

from feature_extractor_mbo_lob_spark.plans.driver_queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_every_query_has_oracle():
    assert set(QUERIES) == set(ORACLES), (
        set(QUERIES) ^ set(ORACLES)
    )


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_sql_executes_in_duckdb(con, name):
    # full execution at sf0.001 (tiny) — catches runtime errors EXPLAIN
    # misses (recursive-CTE termination, cast overflows, list indexing)
    rows = con.sql(ORACLES[name]).fetchall()
    assert rows is not None


def test_no_shadowed_registrations():
    """Every `QUERIES["name"] =` statement in the source must survive
    into the dict — a duplicate key would silently overwrite an
    earlier operator (caught live twice: funnel, cliffs_delta)."""
    import re
    from collections import Counter
    from pathlib import Path

    import feature_extractor_mbo_lob_spark.plans.driver_queries as dq

    src = Path(dq.__file__).read_text()
    names = re.findall(r'^QUERIES\["([a-z_0-9]+)"\] = ', src, re.M)
    dupes = [n for n, c in Counter(names).items() if c > 1]
    assert not dupes, f"shadowed registrations: {dupes}"
    # every literal registration must have survived (programmatic
    # registrations — loops/helpers — account for the rest of the dict)
    missing = [n for n in names if n not in dq.QUERIES]
    assert not missing, f"literal registrations missing from dict: {missing}"


def test_coverage_appendix_in_sync():
    """COVERAGE.md's registry appendix is generated from the runtime
    registry (tools/gen_appendix.py) — hand-maintained counts drifted
    twice (440 vs 441 in r4's README, 441 vs 442 in its COVERAGE.md).
    This pins the doc to the dict the driver actually certifies."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "gen_appendix.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, f"appendix stale: {r.stdout}{r.stderr}"
