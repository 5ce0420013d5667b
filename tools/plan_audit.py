"""Full-registry physical-plan audit: for every registered key, compile
the plan (formatted explain, tree section) and count the scale-critical
operators. Emits one line per key plus a summary; used by
tests/test_plan_audit.py to enforce the global no-cartesian guarantee.

Usage: python tools/plan_audit.py [sf_dir]
"""
import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aind_data_transformation_spark.queries import registry
from aind_data_transformation_spark.session import build_session


def audit_plan(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n", 1)[0]
    return {
        "cartesian": tree.count("CartesianProduct"),
        "bnlj": tree.count("BroadcastNestedLoopJoin"),
        "exchanges": tree.count("Exchange"),
        "single_partition": plan.count("Exchange SinglePartition"),
        "windows": tree.count("Window"),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
    }


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()
    rows = {}
    for key in sorted(queries):
        try:
            rows[key] = audit_plan(queries[key](spark, sf))
        except Exception as exc:
            rows[key] = {"error": str(exc)[:120]}
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
