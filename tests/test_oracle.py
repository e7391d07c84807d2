"""Opt-in full differential-oracle suite: every __spark_entry__
queries() entry vs its DuckDB oracle at sf0.001 (CI-time budget).

Run with `pytest -m oracle` - deselected by default (pytest.ini adds
`-m "not oracle"`) because the default suite must stay fast; the
driver's per-round gate and tools/selfcheck.py cover the same pairs
at sf0.01.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from tools.selfcheck import compare_query, duck_connect  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.oracle


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_matches_oracle(spark, duck, name):
    status, detail = compare_query(spark, duck, entry, name, SF_DIR)
    assert status in ("OK", "NO_ORACLE"), f"{name}: {status} - {detail}"
