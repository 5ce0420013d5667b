"""Spot-check specific registry keys against their DuckDB oracles at
sf0.01 with the driver's compare semantics. Usage:

    python tools/check_keys.py key1 key2 ...
    python tools/check_keys.py --all
"""
import datetime
import decimal
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb

from aind_data_transformation_spark.queries import registry
from aind_data_transformation_spark.session import build_session

SF = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def key_of(row):
    return json.dumps(canon(tuple(row)), default=str, sort_keys=True)


def main():
    q, o = registry()
    args = sys.argv[1:]
    todo = list(q) if args == ["--all"] else args
    unknown = [k for k in todo if k not in q]
    if unknown:
        print("unknown keys:", unknown)
        sys.exit(2)
    spark = build_session(
        app_name="check-keys", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    n_bad = 0
    for k in todo:
        try:
            sdf = q[k](spark, SF)
            srows = sdf.collect()
            scols = [c.lower() for c in sdf.columns]
            if k not in o:
                print(k, "no_oracle rows=", len(srows))
                continue
            cur = con.execute(o[k])
            ocols = [d[0].lower() for d in cur.description]
            orows = cur.fetchall()
            smap = sorted(key_of(r) for r in srows)
            omap = sorted(key_of(r) for r in orows)
            ok = (
                len(srows) == len(orows)
                and scols == ocols
                and smap == omap
            )
            if ok:
                print(k, "pass", len(srows))
            else:
                n_bad += 1
                print(k, "FAIL rows", len(srows), len(orows))
                if scols != ocols:
                    print("  spark cols:", scols)
                    print("  oracle cols:", ocols)
                sset, oset = set(omap), set(smap)
                for r in [r for r in smap if r not in sset][:3]:
                    print("  spark_only:", r[:300])
                for r in [r for r in omap if r not in oset][:3]:
                    print("  oracle_only:", r[:300])
        except Exception as exc:
            n_bad += 1
            print(k, "ERROR", str(exc)[:500])
    spark.stop()
    sys.exit(1 if n_bad else 0)


main()
