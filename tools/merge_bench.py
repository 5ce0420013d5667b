"""Merge a partial bench run (bench_last.json from a
``SPARK_GRAFT_KEYS=...`` invocation) into bench_full.json so
tests/test_registry.py's registry<->bench consistency gate stays green
when keys are added mid-round. The merged per-key numbers are
SPOT timings, not quiet-host medians — the round-end full sweep
re-measures everything; this keeps the key SETS consistent, nothing
more.

Usage: python tools/merge_bench.py [bench_last.json] [bench_full.json]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "bench_last.json"
    )
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, "bench_full.json"
    )
    with open(src) as fh:
        part = json.load(fh)
    with open(dst) as fh:
        full = json.load(fh)
    merged = dict(full.get("queries", {}))
    merged.update(part.get("queries", {}))
    full["queries"] = merged
    full["value"] = round(
        sum(t for t in merged.values() if t >= 0), 3
    )
    with open(dst, "w") as fh:
        fh.write(json.dumps(full, separators=(",", ":")) + "\n")
    print(
        f"merged {len(part.get('queries', {}))} keys into {dst}; "
        f"{len(merged)} total, sum {full['value']}s"
    )


if __name__ == "__main__":
    main()
