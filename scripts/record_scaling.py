#!/usr/bin/env python3
"""Record the r19 large-input scaling run (VERDICT r18 #10) as
SCALING_r{N}.json: the same 12 hot queries benched at sf1 (10x the
driver's sf0.1 rows) at 32 and 8 cores through the unchanged Bench
methodology (SPARK_GRAFT_SF_DIR + SPARK_GRAFT_CPUS — no harness change),
with the 8c/32c wall ratio per query (ideal 4.0 for embarrassingly
parallel work; r18's sf0.1 block maxed at 1.62 because every query was
overhead-bound at that scale).

Usage: record_scaling.py <round> <self_32c.json> <self_8c.json>
"""
import json
import sys


def main():
    rnd, p32, p8 = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    with open(p32) as f:
        b32 = json.load(f)
    with open(p8) as f:
        b8 = json.load(f)
    qs32 = {k: v["median"] for k, v in b32["queries"].items()}
    qs8 = {k: v["median"] for k, v in b8["queries"].items()}
    per = {}
    for k in sorted(qs32):
        if k in qs8 and qs32[k] > 0:
            per[k] = {"sec_32c": round(qs32[k], 3), "sec_8c": round(qs8[k], 3),
                      "ratio_8c_over_32c": round(qs8[k] / qs32[k], 2)}
    out = {
        "round": rnd,
        "sf_dir": b32.get("sf"),
        "reps": b32.get("reps"),
        "cpus": [32, 8],
        "note": "sf1 fixture (scripts/gen_sf1.py, 10x sf0.1 rows), same "
                "Bench methodology; ratio ideal=4.0, >2 means the query "
                "genuinely parallelizes at this scale",
        "per_query": per,
        "n_ratio_gt2": sum(1 for v in per.values()
                           if v["ratio_8c_over_32c"] > 2.0),
    }
    path = f"SCALING_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    for k, v in sorted(per.items(), key=lambda kv: -kv[1]["ratio_8c_over_32c"]):
        print(f"{v['ratio_8c_over_32c']:5.2f}  {v['sec_32c']:8.2f} -> {v['sec_8c']:8.2f}  {k}")


if __name__ == "__main__":
    main()
