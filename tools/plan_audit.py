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
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aind_data_transformation_spark.queries import registry
from aind_data_transformation_spark.session import build_session


_TREE_NODE = re.compile(r"^([ :|+*\-]*)(\S[^(]*?) \((\d+)\)\s*$")


#: per-row nodes that do not change the boundedness of their (streamed,
#: leftmost) input — walked through when classifying an exchange's feed
_TRANSPARENT = (
    "Project",
    "Filter",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "ColumnarToRow",
    "AQEShuffleRead",
    "Coalesce",
)


def _single_partition_unbounded(plan: str, tree: str) -> int:
    """Count SinglePartition exchanges whose INPUT is not (a per-row
    transform of) a partial aggregate. A global scalar aggregate
    inherently merges through a 1-partition exchange, but map-side
    combine has already collapsed each task to one row, so the exchange
    moves O(#tasks) rows — benign at any scale; likewise a compact
    aggregated domain (value distribution, day grid) flowing through
    Project/broadcast-attach nodes. A SinglePartition exchange fed by a
    raw Scan/Sort/Window/shuffle join funnels RAW rows through one
    task: the scale-killer class this audit exists to catch."""
    sp_ids = {
        m.group(1)
        for m in re.finditer(r"\((\d+)\) Exchange", plan)
        if "SinglePartition"
        in plan.split(f"({m.group(1)}) Exchange", 1)[1].split("\n\n", 1)[0]
    }
    if not sp_ids:
        return 0
    lines = tree.split("\n")
    parsed = []
    for ln in lines:
        m = _TREE_NODE.match(ln)
        parsed.append(
            (len(m.group(1)), m.group(2).strip(), m.group(3)) if m else None
        )
    unbounded = 0
    for i, node in enumerate(parsed):
        if node is None or node[1] != "Exchange" or node[2] not in sp_ids:
            continue
        # walk the leftmost (streamed-side) spine through transparent
        # per-row nodes until a boundedness-determining operator
        depth, j, feed = node[0], i, None
        while True:
            child = None
            for k in range(j + 1, len(parsed)):
                p = parsed[k]
                if p is None:
                    continue
                if p[0] <= depth:
                    break
                child, j = p, k
                break
            if child is None:
                break
            if child[1].startswith(_TRANSPARENT):
                depth = child[0]
                continue
            feed = child[1]
            break
        if feed is None:
            unbounded += 1
            continue
        # benign feeds: a partial aggregate (map-side combine already
        # collapsed each task to ~1 row / a compact domain), or a stage-
        # materialized frame (`Scan ExistingRDD`). In this engine an
        # ExistingRDD leaf is produced ONLY by ops.local_materializer /
        # localCheckpoint at stage-materialization sites, and every such
        # site stages an aggregated/bounded frame (domain, vocabulary,
        # model, index) — raw tables always enter plans as parquet
        # scans, so the raw-scan-funnel class this audit catches cannot
        # hide behind an ExistingRDD.
        if "Aggregate" not in feed and not feed.startswith(
            "Scan ExistingRDD"
        ):
            unbounded += 1
    return unbounded


def audit_plan(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n", 1)[0]
    # formatted mode renders a single-partition shuffle as a bare
    # "Exchange" tree node whose DETAIL section says
    # "Arguments: SinglePartition"; the detail section prints each
    # exchange exactly once, so the substring count IS the node count
    # (counting "Exchange SinglePartition" — simple-mode syntax — was
    # always 0 and made the audit vacuous)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    # raw-BIGINT sums of a product of two column refs: the int64-overflow
    # class ADVICE r3 caught (squared cent totals). A key carrying one
    # must either bound both operands (argued allowlist in
    # tests/test_plan_audit.py) or cast the operands to decimal(19,0) so
    # the accumulator is decimal(38,0).
    product_sums = sorted(
        {
            f"{a}*{b}"
            for a, b in re.findall(
                r"sum\(\(([A-Za-z0-9_]+#\d+L) \* ([A-Za-z0-9_]+#\d+L)\)\)",
                plan,
            )
        }
    )
    return {
        "single_partition_unbounded": _single_partition_unbounded(plan, tree),
        "bigint_product_sums": product_sums,
        "cartesian": tree.count("CartesianProduct"),
        "bnlj": tree.count("BroadcastNestedLoopJoin"),
        "exchanges": tree.count("Exchange"),
        "single_partition": plan.count("SinglePartition"),
        "windows": tree.count("Window"),
        # per-scan pushdown: one entry per file scan; a multi-scan plan
        # where only some scans push filters used to misreport as False
        "pushed_scans": sum(1 for p in pushed if p.strip()),
        "scan_filter_slots": len(pushed),
        "pushed_filters": any(p.strip() for p in pushed),
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
