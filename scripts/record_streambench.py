#!/usr/bin/env python3
"""Record a StreamBench run as STREAMBENCH_r{N}.json with an arm-by-arm
delta table vs the previous round's artifact and a regression gate
(r13 verdict #5: streaming regressions must show up as a NUMBER in a
per-round artifact, not only as a spec failure someone happens to re-run).

Usage:
    sbt "runMain graft.streaming.StreamBench" | tee /tmp/sb.log
    python3 scripts/record_streambench.py <round> /tmp/sb.log

Finds the bench JSON line (metric == stream_ingest_rows_per_sec), loads the
newest STREAMBENCH_r*.json as the previous round (falling back to the r13
SCALE.md table, which predates this artifact), and writes
STREAMBENCH_r<round>.json with:
  - the full bench JSON under "bench"
  - "prev": {round, arms} — the compared-against numbers
  - "delta_vs_prev": per-arm ratio (this/prev, rows/sec — higher is better)
  - "regressions_vs_prev": arms slower than prev by more than GATE (20%)
The script exits 1 if the gate trips, so a driver/CI wrapper fails loudly.
"""
import glob
import json
import os
import re
import sys

GATE = 0.80  # this/prev rows-per-sec ratio below this => regression

# r13 had no STREAMBENCH artifact; these are the SCALE.md-recorded numbers
# (5 batches x 5000 rows, dim 64, local[32]) used as the seed baseline.
R13_SCALE_MD = {
    "value": 83,            # processBatch direct, Brute
    "value_ann": 136,       # processBatch direct, MultiTableLsh 4x8
    "value_auto": 95,       # processBatch direct, Retrieval.Auto
    "value_stream_ann": 440,  # MemoryStream -> state-store dedup -> foreachBatch
}

ARM_KEYS = [
    "value", "value_ann", "value_auto", "value_stream_ann",
    "value_indexed", "value_stream_indexed", "value_stream_indexed_bloom",
]


def main():
    rnd = int(sys.argv[1])
    log = sys.argv[2]
    bench = None
    with open(log) as f:
        for line in f:
            m = re.search(r'\{"metric":"stream_ingest_rows_per_sec".*\}', line)
            if m:
                bench = json.loads(m.group(0))
    if bench is None:
        print("no StreamBench JSON line found in", log)
        sys.exit(2)

    prev_round, prev_arms = None, None
    arts = sorted(glob.glob("STREAMBENCH_r*.json"),
                  key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    arts = [a for a in arts
            if int(re.search(r"r(\d+)", a).group(1)) < rnd]
    if arts:
        with open(arts[-1]) as f:
            prev = json.load(f)
        prev_round = prev["round"]
        prev_arms = {k: prev["bench"].get(k) for k in ARM_KEYS
                     if prev["bench"].get(k) is not None}
    else:
        prev_round = 13
        prev_arms = dict(R13_SCALE_MD)

    delta = {}
    regressions = []
    for k, pv in prev_arms.items():
        cv = bench.get(k)
        if cv is None or pv in (None, 0):
            continue
        r = cv / pv
        delta[k] = round(r, 3)
        if r < GATE:
            regressions.append({"arm": k, "prev": pv, "now": cv,
                                "ratio": round(r, 3)})

    out = {
        "round": rnd,
        "metric": "stream_ingest_rows_per_sec",
        "bench": bench,
        "prev": {"round": prev_round, "arms": prev_arms,
                 "source": arts[-1] if arts else "SCALE.md r13 table"},
        "delta_vs_prev": delta,
        "gate": GATE,
        "regressions_vs_prev": regressions,
    }
    path = f"STREAMBENCH_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    print("delta_vs_prev:", json.dumps(delta))
    if regressions:
        print("REGRESSIONS:", json.dumps(regressions))
        sys.exit(1)


if __name__ == "__main__":
    main()
