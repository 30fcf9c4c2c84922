"""Simulate the driver: vanilla SparkSession, import __spark_entry__, smoke + oracle compare."""
import sys, json, datetime, math
from collections import Counter
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
import __spark_entry__ as e

df = e.entry(spark)
n = df.count()
print("entry rows:", n, "schema:", [f.name for f in df.schema])
assert n > 0

qs, os_ = e.queries(), e.oracle_sql()
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def norm(v):
    if isinstance(v, float): return "NaN" if math.isnan(v) else v
    if isinstance(v, datetime.datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

results = {}
for name, fn in qs.items():
    sdf = fn(spark, sf)
    rows = [tuple(r) for r in sdf.collect()]
    cols = sdf.columns
    if name not in os_:
        results[name] = f"rows-only:{len(rows)}"
        continue
    res = con.execute(os_[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    order_s = sorted(range(len(cols)), key=lambda i: cols[i])
    order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    ms = Counter(tuple(norm(r[i]) for i in order_s) for r in rows)
    md = Counter(tuple(norm(r[i]) for i in order_d) for r in drows)
    ok = sorted(cols) == sorted(dcols) and len(rows) == len(drows) and ms == md
    results[name] = "MATCH" if ok else "MISMATCH"
print(json.dumps(results, indent=1))
bad = [k for k, v in results.items() if v == "MISMATCH"]
print("VERDICT:", "ALL MATCH" if not bad else f"FAILURES: {bad}")
