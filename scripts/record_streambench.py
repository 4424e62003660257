#!/usr/bin/env python3
"""Record a StreamBench run as STREAMBENCH_r{N}.json with an arm-by-arm
delta table vs the previous round's artifact and a regression gate
(r13 verdict #5: streaming regressions must show up as a NUMBER in a
per-round artifact, not only as a spec failure someone happens to re-run).

Usage:
    sbt "runMain graft.streaming.StreamBench" | tee /tmp/sb.log
    python3 scripts/record_streambench.py <round> /tmp/sb.log [more.log ...]

Finds the bench JSON line (metric == stream_ingest_rows_per_sec) in each
log, loads the newest STREAMBENCH_r*.json as the previous round (falling
back to the r13 SCALE.md table, which predates this artifact), and writes
STREAMBENCH_r<round>.json with:
  - the full bench JSON under "bench" (from the run whose total arm
    throughput ranks median across the given logs — one coherent run,
    never a synthetic mix of series)
  - "runs": per-arm rows/sec from EVERY given log + the per-arm medians
    (only when >1 log given)
  - "prev": {round, arms} — the compared-against numbers
  - "delta_vs_prev": per-arm ratio (per-arm MEDIAN/prev — higher is
    better; r15 lesson: single-run gating on a shared host produced 20%+
    swings between back-to-back identical-code runs, so the gate reads
    the median exactly as the batch bench reads its 3 reps)
  - "regressions_vs_prev": arms slower than prev by more than GATE (20%)
The script exits 1 if the gate trips, so a driver/CI wrapper fails loudly.
"""
import glob
import json
import os
import re
import sys

GATE = 0.80  # this/prev rows-per-sec ratio below this => regression

# r16 verdict #5: the growth-series flatness ratios (tail-window mean /
# base-window mean over the slab series) are GATED, not just recorded.
# Gated arms are the self-managing ones that are DESIGNED to be flat:
#  - retire_study.flatness_bytext: text-derived retirement discovery
#    reads zero store rows, so its per-cycle cost must not track store
#    growth (the scan form's incremental_sec is the contrast arm and
#    grows at the id-column constant by design — recorded, not gated);
#  - admission_study.flatness_auto_rows: the occupancy-managed store's
#    per-decision rows-read is bounded by target occupancy; between
#    bucket-doublings it drifts up to ~2x, hence the bound;
#  - growth.flatness_indexed / flatness_indexed_bloom: the indexed
#    per-batch KNN path has been flat since r14 — now held to it.
#  - chunk_index_study.flatness_auto_rows (r18): the occupancy-managed
#    single-table bucketed chunk corpus — same bound rationale as
#    admission_study (up-to-2x drift between plane doublings).
FLATNESS_GATES = {
    ("retire_study", "flatness_bytext"): 2.0,
    ("admission_study", "flatness_auto_rows"): 2.5,
    ("growth", "flatness_indexed"): 2.0,
    ("growth", "flatness_indexed_bloom"): 2.0,
    ("chunk_index_study", "flatness_auto_rows"): 2.5,
}

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


def parse_log(log):
    bench = None
    with open(log) as f:
        for line in f:
            m = re.search(r'\{"metric":"stream_ingest_rows_per_sec".*\}', line)
            if m:
                bench = json.loads(m.group(0))
    if bench is None:
        print("no StreamBench JSON line found in", log)
        sys.exit(2)
    return bench


def main():
    if len(sys.argv) < 3:
        print("usage: record_streambench.py <round> <bench.log> [more.log ...]")
        sys.exit(2)
    rnd = int(sys.argv[1])
    logs = sys.argv[2:]
    benches = [parse_log(log) for log in logs]
    # every log must carry the same arm set: the median-run pick below
    # sums only arms PRESENT in each log, so a log missing an arm would
    # rank as artificially slow and bias the selection (r15 ADVICE #3)
    arm_sets = [frozenset(k for k in ARM_KEYS if b.get(k) is not None)
                for b in benches]
    if len(set(arm_sets)) > 1:
        print("logs carry different arm sets:",
              [sorted(s) for s in set(arm_sets)])
        sys.exit(2)
    if not arm_sets[0]:
        print("no known arms found in any log")
        sys.exit(2)
    # per-arm medians across runs; the canonical "bench" payload is the
    # single run whose total arm throughput ranks median (series stay
    # internally consistent — never a synthetic mix)
    def arms_of(b):
        return {k: b[k] for k in ARM_KEYS if b.get(k) is not None}
    med = {}
    for k in ARM_KEYS:
        vs = sorted(b[k] for b in benches if b.get(k) is not None)
        if vs:
            med[k] = vs[len(vs) // 2]
    bench = sorted(benches, key=lambda b: sum(arms_of(b).values()))[
        len(benches) // 2]

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
        cv = med.get(k)
        if cv is None or pv in (None, 0):
            continue
        r = cv / pv
        delta[k] = round(r, 3)
        if r < GATE:
            regressions.append({"arm": k, "prev": pv, "now": cv,
                                "ratio": round(r, 3)})

    # flatness gates read the canonical (median) run's series — a gated
    # arm growing past its bound is a regression even when no previous
    # round exists to compare against
    flatness_violations = []
    for (section, key), bound in FLATNESS_GATES.items():
        v = bench.get(section, {}).get(key) if isinstance(
            bench.get(section), dict) else None
        if v is None:
            continue  # pre-r17 logs lack the field — recorded runs only
        if v > bound:
            flatness_violations.append(
                {"series": f"{section}.{key}", "flatness": v,
                 "bound": bound})

    out = {
        "round": rnd,
        "metric": "stream_ingest_rows_per_sec",
        "bench": bench,
        "prev": {"round": prev_round, "arms": prev_arms,
                 "source": arts[-1] if arts else "SCALE.md r13 table"},
        "delta_vs_prev": delta,
        "gate": GATE,
        "regressions_vs_prev": regressions,
        "flatness_gates": {f"{s}.{k}": b
                           for (s, k), b in FLATNESS_GATES.items()},
        "flatness_violations": flatness_violations,
    }
    if len(benches) > 1:
        out["runs"] = {"n": len(benches),
                       "per_arm": [arms_of(b) for b in benches],
                       "median": med}
    path = f"STREAMBENCH_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    print("delta_vs_prev:", json.dumps(delta))
    if flatness_violations:
        print("FLATNESS VIOLATIONS:", json.dumps(flatness_violations))
    if regressions:
        print("REGRESSIONS:", json.dumps(regressions))
    if regressions or flatness_violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
