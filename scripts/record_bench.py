#!/usr/bin/env python3
"""Record a Bench run as BENCH_FULL_r{N}.json — the standalone-parseable
per-round artifact with the COMPLETE per-query timing map (r14 verdict #4:
the driver's BENCH_rNN.json keeps only a truncated stdout tail and recorded
"parsed": null every round; the full data lived only in gitignored
BENCH_SELF.json / BENCH_PROGRESS.jsonl). This recorder reads BENCH_SELF.json
(written by graft.Bench at the end of every run) and FAILS LOUDLY — nonzero
exit, no artifact — when the bench output is missing, unparseable, or
carries errored queries, instead of writing null.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench"
    python3 scripts/record_bench.py <round> [bench_self_path]
"""
import json
import subprocess
import sys


def fail(msg):
    print("record_bench: FATAL:", msg, file=sys.stderr)
    sys.exit(1)


def main():
    if len(sys.argv) < 2:
        fail("usage: record_bench.py <round> [bench_self_path]")
    rnd = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SELF.json"
    try:
        with open(src) as f:
            self_data = json.load(f)
    except FileNotFoundError:
        fail(f"{src} not found — did the bench run complete?")
    except json.JSONDecodeError as e:
        fail(f"{src} is not valid JSON: {e}")

    queries = self_data.get("queries")
    if not isinstance(queries, dict) or not queries:
        fail(f"{src} carries no per-query map")
    medians = {}
    for name, rec in sorted(queries.items()):
        med = rec.get("median") if isinstance(rec, dict) else rec
        if med is None:
            fail(f"query {name} has a null median (all reps failed)")
        medians[name] = med
    errors = self_data.get("errors", [])
    if errors:
        fail(f"bench recorded errored queries: {errors}")

    # the sha this artifact measured (r15 verdict #5: BENCH_FULL predated
    # the round's final commits by hours with nothing recording which
    # code was timed) — run AFTER the last code commit and the artifact
    # says so
    try:
        head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True).stdout.strip()
    except Exception:
        head = None
    out = {
        "round": rnd,
        "head": head,
        "metric": "total",
        "value": self_data.get("value"),
        "value_min": self_data.get("value_min"),
        "unit": "sec",
        "sf": self_data.get("sf"),
        "reps": self_data.get("reps"),
        "n_queries": len(medians),
        "queries": medians,
        "partial": self_data.get("partial", []),
        "rep_spread_violations": self_data.get("rep_spread_violations", []),
        "prev_artifact": self_data.get("prev_artifact"),
        "regressions_vs_prev": self_data.get("regressions_vs_prev", []),
        "per_rep_matrix_source": src,
    }
    path = f"BENCH_FULL_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    # self-check: the artifact must parse standalone with every timing
    with open(path) as f:
        back = json.load(f)
    if len(back["queries"]) != len(medians):
        fail("artifact readback lost queries")
    print(f"wrote {path}: {len(medians)} queries, total={out['value']:.1f}s")


if __name__ == "__main__":
    main()
