"""Driver-style string-exact oracle sweep at sf0.01 (rotation-readiness
proof). Usage: sweep.py [tuned|stock] [outfile]"""
import json, sys, time
import duckdb

sys.path.insert(0, "src"); sys.path.insert(0, ".")
mode = sys.argv[1] if len(sys.argv) > 1 else "tuned"
out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sweep_{mode}.json"

# Import the entry module FIRST in both modes: it exports PYTHONPATH
# for executor python workers (the driver does the same — it imports
# __spark_entry__ before building its session). Creating the stock
# session first leaves workers unable to unpickle ocrflow UDFs.
import __spark_entry__ as E

if mode == "stock":
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
else:
    from ocrflow.session import build_session
    spark = build_session()
Q, O = E.queries(), E.oracle_sql()
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for n in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{SF}/{n}.parquet')")
res, bad = {}, 0
for k in Q:
    if k not in O:
        continue
    t0 = time.time()
    try:
        sdf = Q[k](spark, SF); c = sdf.columns
        i = sorted(range(len(c)), key=lambda j: c[j])
        s = sorted(tuple(str(r[j]) for j in i) for r in sdf.collect())
        rel = con.execute(O[k]); dc = [d[0] for d in rel.description]
        di = sorted(range(len(dc)), key=lambda j: dc[j])
        d = sorted(tuple(str(r[j]) for j in di) for r in rel.fetchall())
        ok = sorted(c) == sorted(dc) and s == d and bool(s)
        res[k] = {"ok": ok, "rows": len(s), "oracle_rows": len(d),
                  "sec": round(time.time() - t0, 2)}
    except Exception as ex:
        res[k] = {"ok": False, "err": str(ex)[:300],
                  "sec": round(time.time() - t0, 2)}
        ok = False
    if not ok:
        bad += 1
        print("ISSUE", k, json.dumps(res[k])[:200], flush=True)
json.dump({"mode": mode, "n": len(res), "bad": bad, "keys": res},
          open(out, "w"), indent=1)
print("sweep", mode, "issues:", bad, "of", len(res))
spark.stop()
