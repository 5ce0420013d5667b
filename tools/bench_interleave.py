"""Interleaved A/B bench: paired frozen-rev vs HEAD per-key timings
measured ADJACENT IN TIME, so no-regression claims stop depending on
cross-day medians (r10/r11: three straight rounds of headline deltas
adjudicated "host noise").

Design: the two code versions cannot share one driver process — Spark
pickles named functions BY REFERENCE, so a frozen registry's UDFs
would resolve to HEAD modules on the executors and the measurement
would be a franken-run. Instead the keys are split into batches and
each batch runs as two back-to-back subprocesses (frozen repo root,
then HEAD root, alternating which goes first per batch to cancel
thermal/cache ordering bias). Each subprocess pays one JVM start
(~15 s, amortized over the batch) and runs the SAME child code below;
per-key ratios pair within minutes on an identically-loaded host.

Absolute numbers from batch children are NOT comparable to the full
bench (lighter warmup: generic pools only — one-time stage builds land
inside whichever key triggers them, identically on both sides, so the
RATIOS stay fair; that is the product here).

Usage:
    python tools/bench_interleave.py --rev <git-rev> [--batch 40]
        [--sf-dir /root/testdata/sf0.1] [--cpus 32] [--keys k1,k2,...]

Writes bench_interleave.json:
    {"rev": ..., "pairs": {key: {"frozen": s, "head": s, "ratio": r}},
     "median_ratio": r, "regressions": [keys with ratio > 1.5 where
     head-frozen > 0.5s]}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(root: str, sf_dir: str, cpus: str, keys: list) -> None:
    """Run inside a subprocess: time the listed keys against the repo
    at ``root`` and print ONE JSON dict of per-key seconds."""
    sys.path.insert(0, root)
    import time
    import warnings

    warnings.filterwarnings("ignore")
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    from aind_data_transformation_spark.queries import registry
    from aind_data_transformation_spark.session import build_session

    spark = build_session(
        app_name="bench-interleave",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    # generic warmup only (JVM + parquet footers + python worker pool);
    # key-specific one-time stages land inside the key on BOTH sides
    force(queries["agg_group"](spark, sf_dir))
    n = int(cpus)
    spark.range(0, n * 2, 1, n).mapInPandas(lambda it: it, "id long").count()
    out = {}
    for key in keys:
        if key not in queries:
            out[key] = None
            continue
        t0 = time.monotonic()
        try:
            force(queries[key](spark, sf_dir))
            out[key] = round(time.monotonic() - t0, 3)
        except Exception as exc:
            out[key] = -1.0
            print(f"# interleave error in {key}: {exc}", file=sys.stderr)
    spark.stop()
    os.write(real_stdout, (json.dumps(out) + "\n").encode())


def _run_side(root: str, sf_dir: str, cpus: str, keys: list) -> dict:
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--child-root", root,
        "--sf-dir", sf_dir,
        "--cpus", cpus,
        "--keys", ",".join(keys),
    ]
    # PYTHONPATH (not just driver sys.path) so Spark's executor python
    # workers — which spawn with the child's env, not its sys.path —
    # resolve the package at `root` too; without it every key that runs
    # package code ON the executors (Python DataSource, Arrow UDF
    # modules) dies with ModuleNotFoundError while pure-SQL keys pass
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        cmd, capture_output=True, text=True, cwd=tempfile.gettempdir(),
        env=env,
    )
    if res.returncode != 0:
        raise RuntimeError(
            f"interleave child failed for {root}: {res.stderr[-2000:]}"
        )
    return json.loads(res.stdout.strip().splitlines()[-1])


def _frozen_worktree(rev: str) -> str:
    out = subprocess.run(
        ["git", "-C", ROOT, "rev-parse", rev],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    path = os.path.join(
        tempfile.gettempdir(), f"bench_frozen_{out[:12]}"
    )
    if not os.path.isdir(os.path.join(path, "aind_data_transformation_spark")):
        subprocess.run(
            ["git", "-C", ROOT, "worktree", "add", "--detach", path, out],
            check=True, capture_output=True, text=True,
        )
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", help="git rev of the frozen baseline")
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    ap.add_argument("--keys", default="")
    ap.add_argument(
        "--out",
        default=os.path.join(ROOT, "bench_interleave.json"),
        help="output JSON path (default bench_interleave.json; point a "
        "partial/recheck run elsewhere so it cannot clobber the full "
        "artifact)",
    )
    ap.add_argument("--child-root", help=argparse.SUPPRESS)
    args = ap.parse_args()

    keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    if args.child_root:
        _child(args.child_root, args.sf_dir, args.cpus, keys)
        return
    if not args.rev:
        ap.error("--rev is required (or --child-root internally)")

    frozen = _frozen_worktree(args.rev)
    sys.path.insert(0, ROOT)
    from aind_data_transformation_spark.queries import registry

    head_keys = sorted(registry()[0])
    if keys:
        head_keys = [k for k in head_keys if k in set(keys)]
    pairs: dict = {}
    batches = [
        head_keys[i:i + args.batch]
        for i in range(0, len(head_keys), args.batch)
    ]
    for bi, batch in enumerate(batches):
        sides = [("frozen", frozen), ("head", ROOT)]
        if bi % 2:
            sides.reverse()  # alternate ordering to cancel drift bias
        got = {}
        for label, root in sides:
            got[label] = _run_side(root, args.sf_dir, args.cpus, batch)
            print(
                f"# batch {bi + 1}/{len(batches)} {label} done",
                file=sys.stderr,
            )
        for k in batch:
            f, h = got["frozen"].get(k), got["head"].get(k)
            pairs[k] = {
                "frozen": f,
                "head": h,
                "ratio": (
                    round(h / f, 3)
                    if f and h and f > 0 and h > 0
                    else None
                ),
            }
    ratios = [p["ratio"] for p in pairs.values() if p["ratio"]]
    regressions = sorted(
        k
        for k, p in pairs.items()
        if p["ratio"] and p["ratio"] > 1.5
        and (p["head"] - p["frozen"]) > 0.5
    )
    payload = {
        "rev": args.rev,
        "sf_dir": args.sf_dir,
        "pairs": pairs,
        "median_ratio": (
            round(statistics.median(ratios), 3) if ratios else None
        ),
        "regressions": regressions,
    }
    with open(args.out, "w") as fh:
        fh.write(json.dumps(payload, separators=(",", ":")) + "\n")
    print(json.dumps({
        "median_ratio": payload["median_ratio"],
        "n_pairs": len(ratios),
        "regressions": regressions,
    }))


if __name__ == "__main__":
    main()
