#!/usr/bin/env python3
"""DuckDB side of the per-query bench comparison.

Usage: python3 tools/duckbench.py <sfDir> <verifyOutDir> [query ...]

Runs each oracle SQL from <verifyOutDir>/oracle_sql.json against the
fixture tables at <sfDir> (threads=32, full materialization), best of
two runs, and prints one JSON line {query: seconds}. Pair with the
"queries" map in graft.Bench output to find per-query ratio outliers.
"""
import sys, json, time
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    times, errors = {}, {}
    for name, sql in sorted(oracles.items()):
        if only and name not in only: continue
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                # keep a valid first-run timing if any, but record the
                # failure so intermittently failing queries stay visible
                errors[name] = str(e).splitlines()[0]
                if best is None:
                    best = -1.0
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
    if errors:
        # stderr only: the stdout contract stays a flat {query: seconds}
        for name in sorted(errors):
            print(f"[duckbench] FAILED {name}: {errors[name]}", file=sys.stderr)
    print(json.dumps(times))

if __name__ == "__main__":
    main()
