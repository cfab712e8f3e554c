#!/usr/bin/env python3
"""Compare the sf0.1 and sf1 flagship bench runs (round-12 verdict task 1).

Reads the two one-line bench JSONs, computes the per-10x ratios
(seconds and shuffle write MB), and emits BENCH_sf1.json with a
per-query verdict: a query passes the linear-scaling validation when
its cost grew by <= THRESH x the data growth (10x); violations carry
the measured ratio for attribution.
"""
import json
import sys

THRESH = 1.5
SCALE = 10.0


def load(path):
    rows = [json.loads(l) for l in open(path) if l.startswith('{"metric"')]
    return rows[0]


def main(sf01_path, sf1_path, out_path):
    a, b = load(sf01_path), load(sf1_path)
    report = {}
    for q in sorted(a["queries"]):
        ta, tb = a["queries"][q], b["queries"].get(q, -1.0)
        sa, sb = a["shuffle_mb"][q], b["shuffle_mb"].get(q, [0, 0])
        time_ratio = (tb / ta / SCALE) if ta > 0 and tb > 0 else None
        wa, wb = sa[1], sb[1]
        shuf_ratio = (wb / wa / SCALE) if wa > 0.001 and wb > 0.001 else None
        report[q] = {
            "sec_sf01": ta, "sec_sf1": tb,
            "per_unit_time_ratio": round(time_ratio, 3) if time_ratio else None,
            "shufw_mb_sf01": wa, "shufw_mb_sf1": wb,
            "per_unit_shuf_ratio": round(shuf_ratio, 3) if shuf_ratio else None,
            "time_ok": time_ratio is not None and time_ratio <= THRESH,
            "shuf_ok": shuf_ratio is None or shuf_ratio <= THRESH,
        }
    ok = sum(1 for r in report.values() if r["time_ok"] and r["shuf_ok"])
    out = {
        "metric": "sf1_flagship_validation", "scale_factor": SCALE,
        "threshold": THRESH, "n_queries": len(report), "n_pass": ok,
        "total_sec_sf01": a["value"], "total_sec_sf1": b["value"],
        "queries": report,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    for q, r in sorted(report.items()):
        flag = "ok " if (r["time_ok"] and r["shuf_ok"]) else "VIOL"
        print(f"{flag} {q:35s} t x{r['per_unit_time_ratio']} "
              f"shuf x{r['per_unit_shuf_ratio']} "
              f"({r['sec_sf01']:.2f}s -> {r['sec_sf1']:.2f}s, "
              f"{r['shufw_mb_sf01']:.1f}MB -> {r['shufw_mb_sf1']:.1f}MB)")
    print(f"\n{ok}/{len(report)} within {THRESH}x per-unit at {SCALE}x data")


if __name__ == "__main__":
    main(*sys.argv[1:4])
