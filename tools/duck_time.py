#!/usr/bin/env python3
"""Per-query DuckDB timings over the same oracle SQL the driver runs.

Usage: python3 tools/duck_time.py <verify_out_dir> <sf_dir> [threads]

Writes tools/duck_times.json: {"total": sec, "queries": {name: sec}}.
Compare against BENCH_LOCAL.json's per-query map to find where the
Spark-vs-DuckDB aggregate ratio is actually lost (per-query, not vibes).
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    threads = sys.argv[3] if len(sys.argv) > 3 else "32"
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            con.execute(sql).fetchall()  # warm
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times[name] = time.perf_counter() - t0
        except Exception as e:
            times[name] = -1.0
            print(f"FAIL {name}: {e}", file=sys.stderr)
    total = sum(v for v in times.values() if v >= 0)
    out = {"total": total, "threads": threads, "queries": times}
    json.dump(out, open("tools/duck_times.json", "w"), indent=1)
    print(json.dumps({"total": total, "n": len(times)}))


if __name__ == "__main__":
    main()
