#!/usr/bin/env python3
"""Regenerate tools/bench_pin_seconds.json from a committed local bench
pin (BENCH_local_r{N}{x}.json): the per-query MEDIAN SECONDS map plus the
pin's name and calibration (ref_sec / floor_sec).

graft.Bench reads this file at run time and emits the top-10 |delta|
queries vs the pin inside the trailing summary line (r19 verdict #1), so
a driver BENCH_r{N}.json alone answers "which queries moved and by how
much" — the r19 driver ratio regression (1.09 -> 1.31) was unattributable
from the driver artifact because per-query seconds lived only in local
pins.

Usage: python3 tools/make_bench_pin.py BENCH_local_r20a.json r20a
"""
import json, os, sys

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "bench_pin_seconds.json")


def main(pin_path, pin_name):
    # the bench line is the first JSON object on a "metric":"total" line
    with open(pin_path) as f:
        line = next(l for l in f if '"metric":"total"' in l)
    d = json.loads(line)
    out = {"pin": pin_name,
           "ref_sec": d.get("ref_sec"), "floor_sec": d.get("floor_sec"),
           "queries": {k: round(v, 3) for k, v in d["queries"].items()}}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(out['queries'])} queries from {pin_name}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
