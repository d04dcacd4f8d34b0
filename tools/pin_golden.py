#!/usr/bin/env python3
"""Regenerate golden pins for the no-oracle (rows-only) queries (r18
verdict #2). For every query result in a graft.Verify output dir that has
NO entry in oracle_sql.json, record its canonical hash (see
compare.canon_hash) and row count under the scale factor's key in
tools/golden_pins.json.

Run this ONLY when a rows-only query's semantics change deliberately —
the whole point of the pin is that an accidental drift (a reseeded
min_hashes, a changed simhash chunking) fails tools/gate3sf.sh instead
of sliding through as "rows-only".

Usage: python3 tools/pin_golden.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import canon_hash, PINS_PATH

# A NARROWED Verify dump (SPARK_GRAFT_VERIFY_ONLY) contains only a few
# query dirs; running the pinner on one would mark every other pin stale
# and silently drop the committed regression surface. Refuse to drop more
# than this many pins in one run unless --force is passed.
MAX_SILENT_DROPS = 2


def main(sf_dir, out_dir, force=False):
    sf = os.path.basename(os.path.normpath(sf_dir))
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    pins = json.load(open(PINS_PATH)) if os.path.exists(PINS_PATH) else {}
    cur = pins.setdefault(sf, {})
    stale = set(cur)
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q_*.parquet"))):
        name = os.path.basename(qdir)[: -len(".parquet")]
        if name in oracle:
            continue
        df = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        entry = {"rows": len(df), "hash": canon_hash(df)}
        changed = cur.get(name) != entry
        cur[name] = entry
        stale.discard(name)
        print(f"{'UPDATED' if changed else 'same   '} {sf} {name}: "
              f"{entry['rows']} rows {entry['hash'][:16]}…")
    if len(stale) > MAX_SILENT_DROPS and not force:
        sys.exit(f"refusing to drop {len(stale)} pins ({sorted(stale)}) — "
                 "this looks like a NARROWED Verify dump. Re-run the full "
                 "Verify, or pass --force if the queries really went away.")
    for name in sorted(stale):
        del cur[name]
        print(f"DROPPED {sf} {name}: no longer produced (or gained an oracle)")
    with open(PINS_PATH, "w") as f:
        json.dump(pins, f, indent=1, sort_keys=True)
        f.write("\n")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--force"]
    main(args[0], args[1], force="--force" in sys.argv)
