"""Repo-wide plan-lint invariants (tools/plan_audit.py made a test).

Round-3's review hand-verified that no board query plans a
CartesianProduct or a row-at-a-time Python UDF and that every
BroadcastNestedLoopJoin is a broadcast single-row scalar join
(argmax / query-vector / packed-centroid / total rows). This test runs
the same audit over EVERY queries() entry at sf0.001 so those claims
cannot silently regress as the board grows: a new query that plans a
cartesian, a BatchEvalPython, or an unlisted nested-loop join fails
here by name.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

# Queries whose plans legitimately contain BroadcastNestedLoopJoin: every
# one is a broadcast join against a SINGLE-ROW (or single-value) frame —
# a scalar argmax/total/query-vector/packed-centroid-array — never a
# data-sized side. Adding a query to this set requires checking that its
# BNLJ is of the same single-row kind.
BNLJ_ALLOWED = {
    "ann_ivf_search",
    "ann_ivfpq_search",
    "cosine_topk",
    "domain_mix",
    "dsir_weights",
    "hits_scores",
    "lm_rarity",
    "recrawl_priority",
    "sample_stratified",
    "semdedup",
    "token_diversity",
}


def test_every_board_query_plan_is_lint_clean(spark):
    import __spark_entry__ as entrymod
    from crawler_spark.plans.inspect import formatted_plan
    from crawler_spark.queries import release_query_barriers
    from tools.plan_audit import audit_plan

    offenders = {}
    bnlj = set()
    for name, fn in entrymod.queries().items():
        try:
            plan = formatted_plan(fn(spark, SF))
        finally:
            release_query_barriers()
        flags = audit_plan(plan)
        if flags.get("cartesian_product") or flags.get("row_at_a_time_python_udf") or flags.get("global_windows"):
            offenders[name] = flags
        if flags.get("broadcast_nested_loop_joins"):
            bnlj.add(name)
    assert not offenders, offenders
    unexpected = bnlj - BNLJ_ALLOWED
    assert not unexpected, (
        f"queries planning an unreviewed BroadcastNestedLoopJoin: {sorted(unexpected)} "
        "— verify the joined side is a single scalar row, then extend BNLJ_ALLOWED"
    )
