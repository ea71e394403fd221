#!/usr/bin/env python3
"""Times each oracle SQL in DuckDB (8 threads) for paired Spark-vs-oracle
bench comparisons. Usage: python3 tools/time_oracle.py <sfDir> <oracle_sql.json>"""
import sys, json, time, duckdb, os
sf_dir, oracle_json = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET TimeZone='UTC'"); con.execute("SET threads=8")
for tb in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{tb}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{p}')")
oracles = json.load(open(oracle_json))
times = {}
for name, sql in sorted(oracles.items()):
    t0 = time.time()
    con.execute(sql).fetchall()
    times[name] = time.time() - t0
print(json.dumps({"total": round(sum(times.values()),2),
  "slowest": dict(sorted(times.items(), key=lambda x:-x[1])[:8])}))
