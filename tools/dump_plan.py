"""Dump `.explain("formatted")` for registry keys to plans/<out>/<key>_<tag>.txt.

Usage: python tools/dump_plan.py <tag> key1 key2 ...
(tag is usually "before" or "after"; files land in $PLANS_OUT_DIR,
default plans/r13/)
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aind_data_transformation_spark.queries import registry
from aind_data_transformation_spark.session import build_session

OUT = os.environ.get(
    "PLANS_OUT_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "plans", "r13"),
)


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="dump_plan", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()
    os.makedirs(OUT, exist_ok=True)
    for key in keys:
        df = queries[key](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{key}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
