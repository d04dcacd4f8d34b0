#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same scale-factor tables and compare (rows, schema-insensitive column
set, values with columns sorted by name).

Queries with no oracle SQL (sketch/FP-clustering semantics DuckDB cannot
replay) are checked against committed GOLDEN PINS (r18 verdict #2): a
canonical sha256 of the result (columns sorted by name, rows sorted by
their normalized cell tuple) per scale factor, stored in
tools/golden_pins.json and regenerated only deliberately via
tools/pin_golden.py. A seeding/semantic drift in e.g. min_hashes now
fails the gate instead of passing silently as "rows-only".

Usage: python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, math, sys, glob, os, hashlib
import duckdb
import numpy as np

PINS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "golden_pins.json")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if v is None:
        return "NULL"
    # numpy scalars -> python scalars so the float/bool branches apply
    # identically whichever engine produced the frame
    if isinstance(v, np.generic):
        v = v.item()
    # list-typed parquet columns come back as numpy arrays / lists; the old
    # str(v) fallback truncated long arrays ('...') and depended on numpy's
    # repr — normalize recursively per element instead (ADVICE r19)
    if isinstance(v, np.ndarray):
        return "[" + ",".join(norm_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match on 10 significant digits to surface real mismatches while
        # tolerating final-ulp double render differences
        return f"{v:.10g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def canon_hash(df):
    """Order-insensitive canonical sha256 of a result frame: columns
    sorted by name, each row rendered with norm_cell (so float noise at
    the 10-sig-digit boundary is normalized identically to the oracle
    compare), rows sorted lexicographically."""
    cols = sorted(df.columns)
    rows = sorted("\x1f".join(norm_cell(df.iloc[i][c]) for c in cols)
                  for i in range(len(df)))
    h = hashlib.sha256()
    h.update(("\x1f".join(cols) + "\n").encode())
    for r in rows:
        h.update((r + "\n").encode())
    return h.hexdigest()

def load_pins(sf_dir):
    sf = os.path.basename(os.path.normpath(sf_dir))
    if os.path.exists(PINS_PATH):
        return json.load(open(PINS_PATH)).get(sf, {})
    return {}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    pins = load_pins(sf_dir)
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q_*.parquet"))):
        name = os.path.basename(qdir)[:-len(".parquet")]
        spark_df = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        if name not in oracle:
            h = canon_hash(spark_df)
            pin = pins.get(name)
            if pin is None:
                results[name] = {"status": "rows_only", "rows": len(spark_df),
                                 "hash": h}
            elif pin["hash"] == h and pin["rows"] == len(spark_df):
                results[name] = {"status": "ok_pinned", "rows": len(spark_df)}
            else:
                results[name] = {"status": "pin_mismatch",
                                 "rows": len(spark_df), "hash": h,
                                 "pin_rows": pin["rows"],
                                 "pin_hash": pin["hash"]}
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
    n_pinned = sum(1 for r in results.values() if r["status"] == "ok_pinned")
    n_rows_only = sum(1 for r in results.values() if r["status"] == "rows_only")
    for name, r in sorted(results.items()):
        flag = {"ok": "OK ", "ok_pinned": "PIN",
                "rows_only": "ro "}.get(r["status"], "BAD")
        print(f"{flag} {name}: {json.dumps(r)[:220]}")
    print(f"\n{n_ok} ok, {n_pinned} pinned, {n_rows_only} rows-only, "
          f"{len(results) - n_ok - n_pinned - n_rows_only} bad, "
          f"of {len(results)}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
