#!/usr/bin/env python3
"""Pin the declared performance baseline: run every oracle SQL statement
(the DuckDB-expressible subset of SparkEntry.queries) in a single DuckDB
process over the same scale-factor parquet the Spark bench reads, and print
per-query + total wall seconds as one JSON line.

The reference engine publishes no benchmark numbers (BASELINE.md), so this
single-node DuckDB run over identical inputs and identical declared
semantics is the pinned baseline that BENCH_r{N}.json totals are ratioed
against. Convention:

  - same host, same parquet files, DuckDB threads = SPARK_GRAFT_CPUS (32,
    mirroring the Spark bench's local[32]);
  - each query is executed and fully materialized (fetchall) — the analogue
    of the Spark bench's noop-sink write;
  - per-query seconds are the median of 3 runs after 1 untimed warm-up
    (parquet metadata/OS page cache, mirroring the Spark bench's warm-up);
  - the comparable total is the sum over the INTERSECTION of query names in
    both JSONs (oracle-less queries have no SQL form and are excluded from
    the ratio on both sides).

Usage: python3 tools/baseline_duckdb.py <sf_dir> <oracle_sql.json> [runs]
"""
import json, os, statistics, sys, time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, oracle_path, runs=3):
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(oracle_path) as f:
        oracles = json.load(f)
    # Verify dumps each oracle under both "q_x" and "q_x.parquet" keys;
    # keep the bare form only
    queries = {k: v for k, v in sorted(oracles.items())
               if not k.endswith(".parquet")}
    results, failed = {}, []
    for name, sql in queries.items():
        try:
            con.execute(sql).fetchall()  # untimed warm-up
            times = []
            for _ in range(runs):
                t0 = time.monotonic()
                rows = con.execute(sql).fetchall()
                times.append(time.monotonic() - t0)
            results[name] = round(statistics.median(times), 4)
        except Exception as e:
            print(f"[baseline] {name} failed: {e}", file=sys.stderr)
            failed.append(name)
    total = round(sum(results.values()), 4)
    print(json.dumps({
        "metric": "baseline_total", "value": total, "unit": "sec",
        "engine": f"duckdb-{duckdb.__version__}", "threads": threads,
        "runs": runs, "queries": results, "failed": failed, "sf": sf_dir,
    }))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
