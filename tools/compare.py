#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same scale-factor tables and compare (rows, schema-insensitive column
set, values with columns sorted by name).

Usage: python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, math, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match on 10 significant digits to surface real mismatches while
        # tolerating final-ulp double render differences
        return f"{v:.10g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q_*.parquet"))):
        name = os.path.basename(qdir)[:-len(".parquet")]
        spark_df = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        if name not in oracle:
            results[name] = {"status": "rows_only", "rows": len(spark_df)}
            continue
        try:
            oracle_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = {"status": "oracle_error", "error": str(e)[:300]}
            continue
        s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
        if s_cols != o_cols:
            results[name] = {"status": "schema_mismatch",
                             "spark": s_cols, "oracle": o_cols}
            continue
        if len(spark_df) != len(oracle_df):
            results[name] = {"status": "rowcount_mismatch",
                             "spark": len(spark_df), "oracle": len(oracle_df)}
            continue
        s = spark_df[s_cols]
        o = oracle_df[o_cols]
        bad = None
        for i in range(len(s)):
            for c in s_cols:
                a, b = norm_cell(s.iloc[i][c]), norm_cell(o.iloc[i][c])
                if a != b:
                    bad = {"row": int(i), "col": c, "spark": a, "oracle": b}
                    break
            if bad:
                break
        if bad:
            results[name] = {"status": "value_mismatch", **bad}
        else:
            results[name] = {"status": "ok", "rows": len(s)}
    n_ok = sum(1 for r in results.values() if r["status"] == "ok")
    n_rows_only = sum(1 for r in results.values() if r["status"] == "rows_only")
    for name, r in sorted(results.items()):
        flag = "OK " if r["status"] == "ok" else ("ro " if r["status"] == "rows_only" else "BAD")
        print(f"{flag} {name}: {json.dumps(r)[:220]}")
    print(f"\n{n_ok} ok, {n_rows_only} rows-only, "
          f"{len(results) - n_ok - n_rows_only} bad, of {len(results)}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
