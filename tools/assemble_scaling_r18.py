#!/usr/bin/env python3
"""Assemble bench_scaling_r18.json from the round's sweep legs.

Inputs (full Bench JSONs, written by tools/run_sweep_r18.sh):
  /tmp/bench_base_r18.json   - full suite at /root/testdata/sf0.1, reps=2
  /tmp/bench_100x_r18.json   - full suite at target/sf10 (factor-100), reps=2

Output: bench_scaling_r18.json with, per query: base/100x raw seconds,
raw + calibrated exponents (log100 of the ratio), and the factor-100
footprint telemetry (peak shuffle-write MB and spill MB across passes) -
the r15 lesson that disk, not wall-time, is the failure mode exponents
miss. r18 runs the ENTIRE declared surface inside the sweep — no
per-op side legs (the r17 verdict's item 2).
"""
import json, math, sys

def load(p):
    with open(p) as f:
        return json.loads(f.read())

base = load("/tmp/bench_base_r18.json")
big = load("/tmp/bench_100x_r18.json")

common = sorted(set(base["queries"]) & set(big["queries"]))
missing = sorted(set(base["queries"]) ^ set(big["queries"]))

def expo(b, s):
    if b <= 0 or s <= 0:
        return None
    return round(math.log(s / b) / math.log(100), 3)

queries = {}
for n in common:
    qb, qs = base["queries"][n], big["queries"][n]
    cb = base["queries_calibrated"][n]
    cs = big["queries_calibrated"][n]
    queries[n] = {
        "base_sec": qb,
        "sf10_sec": qs,
        "exponent_raw": expo(qb, qs),
        "exponent_cal": expo(cb, cs),
        "sf10_shuffle_mb": round(big["query_shuffle_mb"][n], 1),
        "sf10_spill_mb": round(big["query_spill_mb"][n], 1),
        "base_shuffle_mb": round(base["query_shuffle_mb"][n], 1),
        "base_spill_mb": round(base["query_spill_mb"][n], 1),
    }

superlin = {n: q for n, q in queries.items()
            if q["exponent_raw"] is not None and q["exponent_raw"] > 1.0}
worst = sorted(queries.items(), key=lambda kv: -(kv[1]["exponent_raw"] or 0))[:8]
fat = sorted(queries.items(), key=lambda kv: -kv[1]["sf10_shuffle_mb"])[:8]
spilled = sorted(queries.items(), key=lambda kv: -kv[1]["sf10_spill_mb"])[:8]

out = {
    "factors": [1, 100],
    "base_sf": "/root/testdata/sf0.1",
    "scaled_sf": "/root/repo/target/sf10",
    "full_suite_100x": {
        "note": ("Full %d-query suite swept at the factor-100 replica, reps=2 "
                 "min-of-2 per query, per-query peak shuffle-write/spill MB "
                 "recorded at BOTH legs (the r15 disk-exhaustion lesson made "
                 "footprint a standing artifact). Base leg = same-day full "
                 "bench at sf0.1." ) % len(common),
        "n_ok": len(common),
        "n_err": len(big.get("errors", {})) if isinstance(big.get("errors"), dict) else 0,
        "reps": big.get("reps"),
        "total_base_sec": round(sum(base["queries"][n] for n in common), 1),
        "total_sf10_sec": round(sum(big["queries"][n] for n in common), 1),
        "total_base_cal": round(sum(base["queries_calibrated"][n] for n in common), 1),
        "total_sf10_cal": round(sum(big["queries_calibrated"][n] for n in common), 1),
        "sentinel_floor": big.get("sentinel_floor"),
        "sentinel_spread_base": base.get("sentinel_spread"),
        "sentinel_spread_sf10": big.get("sentinel_spread"),
        "n_superlinear": len(superlin),
        "superlinear": {n: q["exponent_raw"] for n, q in superlin.items()},
        "worst_exponents": {n: q["exponent_raw"] for n, q in worst},
        "top_shuffle_mb_sf10": {n: q["sf10_shuffle_mb"] for n, q in fat},
        "top_spill_mb_sf10": {n: q["sf10_spill_mb"] for n, q in spilled},
        "not_in_both_legs": missing,
        "queries": queries,
    },
}

with open("bench_scaling_r18.json", "w") as f:
    json.dump(out, f, indent=1)

fs = out["full_suite_100x"]
print("n_ok", fs["n_ok"], "n_err", fs["n_err"], "superlinear", fs["n_superlinear"])
print("totals raw %.1f -> %.1f  cal %.1f -> %.1f" % (
    fs["total_base_sec"], fs["total_sf10_sec"],
    fs["total_base_cal"], fs["total_sf10_cal"]))
print("worst:", json.dumps(fs["worst_exponents"]))
print("fattest shuffle:", json.dumps(fs["top_shuffle_mb_sf10"]))
print("spill:", json.dumps(fs["top_spill_mb_sf10"]))
print("missing:", missing)
