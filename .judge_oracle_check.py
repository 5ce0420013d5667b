"""Judge-side replication of the driver's t2 oracle check for keys the
driver did not reach (CORRECTNESS_r01.json covers 50/158)."""
import datetime
import decimal
import json
import math
import sys

sys.path.insert(0, ".")
import duckdb

from aind_data_transformation_spark.queries import registry
from aind_data_transformation_spark.session import build_session

SF = "/root/testdata/sf0.01"
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
    checked = set(json.load(open("CORRECTNESS_r01.json")))
    todo = [k for k in q if k not in checked]
    spark = build_session(app_name="judge-oracle", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    out = {}
    for k in todo:
        try:
            sdf = q[k](spark, SF)
            srows = sdf.collect()
            scols = [c.lower() for c in sdf.columns]
            if k not in o:
                out[k] = {"status": "no_oracle", "spark_rows": len(srows)}
                continue
            cur = con.execute(o[k])
            ocols = [d[0].lower() for d in cur.description]
            orows = cur.fetchall()
            rows_match = len(srows) == len(orows)
            schema_match = scols == ocols
            smap = sorted(key_of(r) for r in srows)
            omap = sorted(key_of(r) for r in orows)
            hash_match = smap == omap
            out[k] = {
                "status": "pass" if (rows_match and schema_match and hash_match) else "FAIL",
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
            }
            if not hash_match:
                sonly = [r for r in smap if r not in set(omap)][:2]
                oonly = [r for r in omap if r not in set(smap)][:2]
                out[k]["spark_only"] = sonly
                out[k]["oracle_only"] = oonly
        except Exception as exc:
            out[k] = {"status": "ERROR", "err": str(exc)[:400]}
        print(k, out[k]["status"], flush=True)
    json.dump(out, open(".judge_oracle_results.json", "w"), indent=1)
    n_pass = sum(1 for v in out.values() if v["status"] == "pass")
    print("PASS", n_pass, "of", len(out))
    spark.stop()


main()
