"""Check one or more registry entries against their DuckDB oracles,
the way the driver does (sorted-column multiset compare at sf0.01).

Usage: python scripts/check_entry.py [--sf DIR] name [name ...]
"""
import datetime
import json
import math
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf = "/root/testdata/sf0.01"
for i, a in enumerate(sys.argv[1:]):
    if a == "--sf":
        sf = sys.argv[2 + i]
        args.remove(sf) if sf in args else None

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .appName("check-entry")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from data_ingestion_pipeline_spark.registry import REGISTRY  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


results = {}
for name in args:
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf)
    rows = [tuple(r) for r in sdf.collect()]
    cols = sdf.columns
    if not spec.oracle:
        results[name] = f"rows-only:{len(rows)}"
        continue
    res = con.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    order_s = sorted(range(len(cols)), key=lambda i: cols[i])
    order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    ms = Counter(tuple(norm(r[i]) for i in order_s) for r in rows)
    md = Counter(tuple(norm(r[i]) for i in order_d) for r in drows)
    if sorted(cols) != sorted(dcols):
        results[name] = f"SCHEMA MISMATCH spark={sorted(cols)} duck={sorted(dcols)}"
    elif len(rows) != len(drows):
        results[name] = f"ROWS MISMATCH spark={len(rows)} duck={len(drows)}"
    elif ms != md:
        diff_s = list((ms - md).items())[:3]
        diff_d = list((md - ms).items())[:3]
        results[name] = f"VALUE MISMATCH spark_only={diff_s} duck_only={diff_d}"
    else:
        results[name] = f"MATCH:{len(rows)}"
print(json.dumps(results, indent=1, default=str))
bad = [k for k, v in results.items() if not v.startswith(("MATCH", "rows-only"))]
print("VERDICT:", "ALL MATCH" if not bad else f"FAILURES: {bad}")
sys.exit(1 if bad else 0)
