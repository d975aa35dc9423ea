#!/usr/bin/env python3
"""Time the full DuckDB oracle suite — the denominator of the bench ratio.

Usage: python3 tools/bench_oracle.py <sfDir> <oracle_sql.json> [reps]

Registers each testdata parquet as a DuckDB view, runs every oracle SQL
`reps` times (default 3), and writes ORACLE_BENCH.json with the per-query
medians and the suite total, so BENCH artifacts can carry the same-box
DuckDB total alongside the Spark total (the judge's 2x gate ratio is then
in the artifact, not re-derived). The oracle_sql.json comes from any
graft.Verify run — the SQL text does not depend on the scale factor.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_path))
    per = {}
    for name, sql in sorted(oracles.items()):
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            times.append(time.monotonic() - t0)
        per[name] = round(sorted(times)[len(times) // 2], 4)
    total = round(sum(per.values()), 2)
    # provenance: when it was measured and a fingerprint of the data it
    # was measured AGAINST (sum of int-mtime + size over the table
    # files; graft.Bench recomputes the same sum and drops oracle_sec on
    # mismatch) — a stale ORACLE_BENCH.json from an earlier round or a
    # regenerated corpus can then never misstate the Spark/DuckDB ratio
    fp = sum(int(os.path.getmtime(p)) + os.path.getsize(p)
             for t in TABLES
             if os.path.exists(p := os.path.join(sf_dir, f"{t}.parquet")))
    out = {"metric": "oracle_total", "value": total, "unit": "sec",
           "sf": os.path.basename(sf_dir.rstrip("/")), "reps": reps,
           "measured_at": int(time.time()), "data_fingerprint": fp,
           "queries": per}
    with open("ORACLE_BENCH.json", "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps({k: out[k] for k in ("metric", "value", "unit", "sf")}))

if __name__ == "__main__":
    main()
