"""Round 11 (verdict item #4): the sf1 ledger — the artifact that
grades the scale story — must carry a non-empty adjudication note on
EVERY row whose engine/oracle ratio exceeds the 2x bar, and no
FLAG rows. tools/sf1_ledger.validate is the single source of the
invariant; tools/selfcheck.py re-checks it every run."""

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from sf1_ledger import RATIO_BAR, validate  # noqa: E402


@pytest.fixture(scope="module")
def ledger():
    path = os.path.join(ROOT, "SF1_LEDGER.json")
    if not os.path.exists(path):
        pytest.skip("no committed SF1_LEDGER.json")
    with open(path) as fh:
        return json.load(fh)


def test_committed_ledger_has_no_violations(ledger):
    assert validate(ledger) == []


def test_every_over_bar_row_notes_are_substantive(ledger):
    """Notes must explain, not placate: at least 40 chars and not a
    bare bar restatement."""
    for r in ledger["rows"]:
        if (r.get("vs_oracle") or 0) > RATIO_BAR:
            assert len(r["note"]) >= 40, r["query"]
            assert "unadjudicated" not in r["note"], r["query"]


def test_validate_catches_naked_row():
    bad = {"rows": [{"query": "x", "vs_oracle": 3.0, "note": ""}]}
    assert validate(bad)
    ok = {"rows": [{"query": "x", "vs_oracle": 3.0, "note": "stage floor ..."}]}
    assert validate(ok) == []
    flagged = {"rows": [{"query": "x", "vs_oracle": 1.0,
                         "note": "FLAG: growth 99x, unadjudicated"}]}
    assert validate(flagged)
