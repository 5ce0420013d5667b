"""Registry-wide physical-plan audit: the global scale guarantees the
per-key plan tests cannot give — compiled for EVERY registered key.

* ZERO CartesianProduct anywhere (no exceptions — even join_cross plans
  as a broadcast nested loop of a bounded side);
* ZERO UNBOUNDED single-partition exchanges: no stage ever funnels raw
  rows through one task. Global scalar aggregates inherently merge
  through a 1-partition exchange, but map-side combine has collapsed
  each task to one row first, and compact pre-aggregated domains (value
  distributions, day grids) flowing through Project/broadcast-attach
  nodes are equally bounded — the audit classifies by the exchange's
  leftmost feed (tools/plan_audit.py::_single_partition_unbounded)
  rather than naively counting every SinglePartition, and the ONE key
  that genuinely collapsed a raw scan (win_ntile_cume) was rewritten
  onto the two-phase row-number machinery instead of allowlisted;
* BroadcastNestedLoopJoin only where the build side is a bounded
  broadcast (1-row aggregates, k-row query/centroid/anchor sets, the
  non-equi band contract keys) — the allowlist below; a NEW key
  acquiring a BNLJ fails this test until its broadcast side is argued
  and the key added here.
"""

from __future__ import annotations

import pytest

from tests.conftest import TEST_SF_DIR

from aind_data_transformation_spark.queries import registry

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from plan_audit import audit_plan  # noqa: E402

_QUERIES, _ = registry()

#: keys whose BroadcastNestedLoopJoin is a bounded broadcast by design.
#: r5 shrank this from 41 keys to the 5 that genuinely cannot be a
#: constant-key hash join: every 1-row-aggregate / k-row-set attach now
#: rides ops.attach_broadcast (fold-proof constant-key BroadcastHashJoin)
_BNLJ_BROADCAST_TINY = {
    # generated-SQL keys: the 1-row component/seed attaches live in SQL
    # text where attach_broadcast can't reach; broadcast side is 1 row
    "embed_pca_project",
    "sql_recursive_cte",
    # genuine non-equi joins over schema-bounded dimension pair spaces
    "fn_levenshtein",  # 25x25 nation-name pairs, key_a < key_b
    # contract keys whose POINT is the non-equi/cartesian shape
    "join_cross",
    "join_theta_range",
}


#: keys whose sum-over-BIGINT-product is argued bounded — headroom math
#: per key; everything else with the pattern must widen to decimal
#: (agg_corr_covar and embed_covariance did, r4)
_BIGINT_PRODUCT_SUM_BOUNDED = {
    # tf ≤ doc length (~1e4) × lp_u ≤ 2e7 → ≤2e11/row, summed over a
    # doc's distinct terms (~1e4) → ≤2e15 per (doc, cls) group
    "ml_naive_bayes_score",
    # cents ≤ 1e6 × dt_s ≤ 3e7 (a year in seconds) → ≤3e13/row, summed
    # per user over ≤1e5 observations → ≤3e18, inside int64
    "ts_time_weighted_avg",
    # Markov value iteration: BOTH operands live on the 1e-6 grid
    # (q_u6, p_u6 ≤ 1e6 → ≤1e12/term) and each (removed, cur) group has
    # ≤ |event-type domain|+2 terms (dst states) → ≤1e13 per sum,
    # corpus-size-independent (probabilities were normalized BEFORE the
    # iteration precisely to earn this bound)
    "attribution_markov_removal",
}


@pytest.mark.parametrize("key", sorted(_QUERIES))
def test_plan_audit_global_invariants(spark, key):
    a = audit_plan(_QUERIES[key](spark, TEST_SF_DIR))
    assert a["cartesian"] == 0, f"{key}: CartesianProduct in plan"
    assert a["single_partition_unbounded"] == 0, (
        f"{key}: single-partition exchange over a raw (non-aggregated)"
        " input in plan"
    )
    if key not in _BNLJ_BROADCAST_TINY:
        assert a["bnlj"] == 0, (
            f"{key}: unexpected BroadcastNestedLoopJoin — argue the"
            " broadcast side is bounded, then allowlist"
        )
    if key not in _BIGINT_PRODUCT_SUM_BOUNDED:
        assert a["bigint_product_sums"] == [], (
            f"{key}: raw BIGINT sum over a column product"
            f" {a['bigint_product_sums']} — int64 dies once"
            " sum(|a*b|) can exceed 9.2e18. Either argue BOTH operands"
            " are bounded (so the sum stays in headroom at 1e12 rows)"
            " and allowlist, or cast each operand to decimal(19,0) so"
            " the accumulator is decimal(38,0) (see agg_corr_covar)"
        )
