"""Plan-shape invariants over the whole query suite (tools/plan_audit).

Two layers:

* test_no_banned_operators_subset builds a representative subset of
  plans live (cheap at sf0.001) and asserts the suite-wide bans:
  no CartesianProduct, no row-at-a-time Python UDF (BatchEvalPython),
  no BroadcastNestedLoopJoin outside the adjudicated-bounded set.
* test_planaudit_artifact_invariants re-checks the committed
  PLANAUDIT.json (built over ALL 154 queries at sf0.01 by
  `python tools/plan_audit.py`) so a regression in any query the
  subset doesn't cover still fails CI the next time the artifact is
  refreshed — and the artifact cannot be committed with violations.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Mix of relational, genomics, pipeline, and the known BNLJ carriers.
SUBSET = [
    "revenue_by_nation",
    "pricing_summary",
    "seq_dist",
    "quality_dist",
    "view_with_ins",
    "customer_setops",
    "exact_dedup",
    "minhash_lsh_pairs",
    "semantic_dedup",
    "tfidf_terms",
    "pairwise_hamming",
    "token_count",
]


@pytest.fixture(scope="module")
def audit_subset(spark):
    from tools.plan_audit import build_audit

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    return build_audit(spark, sf_dir, names=set(SUBSET))


def test_no_banned_operators_subset(audit_subset):
    from tools.plan_audit import violations

    assert set(audit_subset) == set(SUBSET)
    assert violations(audit_subset) == []


def test_bnlj_carriers_detected(audit_subset):
    # the audit must actually SEE the nested-loop joins it adjudicates,
    # otherwise the allowlist is untestable
    assert audit_subset["quality_dist"]["bnlj"] >= 1
    assert audit_subset["customer_setops"]["bnlj"] >= 1
    assert audit_subset["pairwise_hamming"]["bnlj"] >= 1


def test_star_join_broadcasts(audit_subset):
    # the star join must broadcast its dimensions, not shuffle them:
    # >=3 BroadcastExchange (cust/nation/region), and the only
    # shuffle-joined pair is lineitem x orders
    row = audit_subset["revenue_by_nation"]
    assert row["broadcasts"] >= 3
    assert row["cartesian"] == 0


def test_join_strategy_invariant_across_sf(spark, audit_subset):
    """Join strategies must not depend on the scale factor: a query
    whose broadcast comes from Catalyst's SIZE-BASED auto-broadcast
    (not an explicit bounded F.broadcast) would silently flip to a
    shuffle join somewhere between bench scale and 100 TB. Audited
    across sf0.001/0.01/0.1 in SCALING.md ('Plan-shape invariance');
    this pins the subset at two sfs so a regression fails CI.
    (Exchange counts are NOT pinned: Catalyst's size-gated runtime
    bloom-filter injection legitimately adds bounded single-partition
    exchanges at larger sfs.)"""
    from tools.plan_audit import build_audit

    bigger = build_audit(spark, "/root/testdata/sf0.01", names=set(SUBSET))
    for q in SUBSET:
        for k in ("bhj", "smj", "shj", "bnlj", "broadcasts", "cartesian"):
            assert audit_subset[q][k] == bigger[q][k], (
                f"{q}: {k} differs across sf "
                f"({audit_subset[q][k]} at sf0.001 vs {bigger[q][k]} at sf0.01)"
            )


def test_planaudit_artifact_invariants():
    path = os.path.join(REPO, "PLANAUDIT.json")
    if not os.path.exists(path):
        pytest.skip("PLANAUDIT.json not built yet (run tools/plan_audit.py)")
    art = json.load(open(path))
    assert art["violations"] == []
    assert art["n_queries"] >= 154
    t = art["totals"]
    assert t["cartesian"] == 0
    assert t["py_row_udf"] == 0
    # every query's plan built (no error rows)
    errs = {k: v for k, v in art["queries"].items() if "error" in v}
    assert errs == {}
    # round 11: join-strategy invariance across the audited sf dirs
    # (sf0.01 + sf1 = four decades when run per the round protocol)
    assert art.get("strategy_deltas", []) == []
