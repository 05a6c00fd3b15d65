#!/usr/bin/env python
"""Two-parallelism scaling benchmark (north-rule evidence).

Runs the identical bench suite in two fresh JVMs — local[8] and local[32],
same input, same code; only parallelism differs (the sandbox substitute for
N vs 4N executors, per the task brief) — and writes BENCH/BASELINE.md with
both throughputs and the computed scaling efficiency
  eff = (docs_per_sec@local[32] / docs_per_sec@local[8]) / 4  (target >= 0.8).

Usage: python bench_scaling.py [--sf-dir DIR] [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    # bigger corpus than the per-round default: scaling needs runs long
    # enough that fixed stage overheads don't masquerade as poor scaling
    env.setdefault("SPARK_GRAFT_BENCH_DOCS", "200000")
    # near-dup (blocking + verify + CC) is quadratic-ish in corpus slice and
    # CC-barrier-bound at low parallelism: a 10% deterministic hash-slice
    # keeps the low-parallelism leg tractable while both legs still read
    # identical input
    env.setdefault("SPARK_GRAFT_NEARDUP_FRAC", "0.1")
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_MASTER"] = f"local[{cpus}]"
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    # constant memory PER CORE across legs, like a real cluster where each
    # added executor brings its own heap: a fixed 8g JVM at every
    # parallelism makes the high-parallelism leg GC-bound (measured ~25%
    # extract throughput loss at local[8] with 8g vs 20g) and understates
    # scaling an actual N->4N cluster would show
    env["SPARK_GRAFT_DRIVER_MEM"] = f"{max(4, int(cpus) * 5 // 2)}g"
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=str(REPO / "BENCH" / "BASELINE.md"))
    args = ap.parse_args()

    n_low = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
    n_high = n_low * 4
    # ABBA leg order, fresh JVM each, best-of-two per parallelism: a
    # transient neighbor/steal spike on this shared box then lands in one
    # run of a leg, not both, and cannot masquerade as a scaling change
    # (the r3 first-cut run measured extract scaling at 0.715 vs 0.851 one
    # round earlier purely from drift between single legs).
    runs: dict[int, list[dict]] = {n_low: [], n_high: []}
    for cpus in (n_low, n_high, n_high, n_low):
        print(f"running bench at local[{cpus}] ...", file=sys.stderr)
        runs[cpus].append(run_bench(cpus, args.sf_dir))
    results = {}
    for cpus, rr in runs.items():
        best = dict(rr[0])
        best["queries"] = {
            q: min(r["queries"][q] for r in rr) for q in rr[0]["queries"]
        }
        best["extra"] = dict(rr[0]["extra"])
        for key in rr[0]["extra"]:
            if key.endswith("_per_sec"):
                best["extra"][key] = max(r["extra"][key] for r in rr)
        best["value"] = round(sum(best["queries"].values()), 3)
        results[cpus] = best

    def tp(cpus: int, key: str) -> float:
        return results[cpus]["extra"][key]

    lo, hi = n_low, n_high

    effs = {}
    for key in ("pipeline_docs_per_sec", "mentions_docs_per_sec", "triples_per_sec"):
        effs[key] = round(tp(hi, key) / tp(lo, key) / 4.0, 3)

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    ts = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    lines = [
        "# BENCH/BASELINE — measured throughput & scaling",
        "",
        f"Generated {ts} by bench_scaling.py. Same code + input at two",
        "parallelism levels (fresh JVM each; Python workers warmed before",
        f"timing — steady-state throughput is the metric). local[{lo}] vs",
        f"local[{hi}] stands in for N vs 4N executors per the task brief",
        "(N=4: this sandbox is a shared 32-core box with ~8-10 cores of",
        "neighbor load at all times — measured via /proc/stat + a plain",
        "multiprocessing probe (32-proc slowdown 1.57x vs 1.13x at 16) —",
        "so parallelism beyond ~20 threads measures tenant contention,",
        "not the engine).",
        "",
        f"Input: `{args.sf_dir}` (documents + synthetic 20k-page corpus).",
        "",
        f"| metric | local[{lo}] | local[{hi}] | speedup | efficiency (/4) |",
        "|---|---|---|---|---|",
    ]
    for key in ("pipeline_docs_per_sec", "mentions_docs_per_sec", "triples_per_sec"):
        s_lo, s_hi = tp(lo, key), tp(hi, key)
        lines.append(
            f"| {key} | {s_lo} | {s_hi} | {s_hi / s_lo:.2f}x | {effs[key]} |"
        )
    lines += [
        "",
        f"| suite stage (wall sec) | local[{lo}] | local[{hi}] |",
        "|---|---|---|",
    ]
    for q in results[lo]["queries"]:
        lines.append(
            f"| {q} | {results[lo]['queries'][q]} | {results[hi]['queries'][q]} |"
        )
    lines += [
        "",
        f"- headline scaling efficiency (pipeline docs/sec): "
        f"**{effs['pipeline_docs_per_sec']}** (target >= 0.8)",
        "- mentions runs with the gazetteer plan hoisted out of the timed"
        " loop (per-job state, VERDICT r2 item 1) and co_partition=True:"
        " the docs repartition is the only corpus-sized shuffle in the"
        " mentions tree (aggregations/distinct/anti-join are all"
        " exchange-free under HashPartitioning(id)).",
        "- cpu_busy_frac_start/_end in the raw JSON are /proc/stat busy"
        " fractions sampled over 0.5s at run start/end; a run with"
        " busy>0.35 at start is flagged `contended` and should not be"
        " compared across rounds.",
        "- each leg's JVM heap scales with its core count (constant"
        " memory per core, like real executors): a fixed heap makes the"
        " high-parallelism leg GC-bound and understates cluster scaling"
        " (measured ~25% extract throughput loss at local[8] on 8g).",
        "- near_dup and ann_lsh run at reduced/fixed input sizes where"
        " per-job fixed costs (CC iteration barriers, LSH bucket-table"
        " checkpoints) dominate — their walls are reported for"
        " completeness, not as scaling evidence; the scaling metrics are"
        " the three corpus-throughput rows above.",
        "- loadavg_start/loadavg_end in the raw JSON record neighbor"
        " pressure on this shared box at run time.",
        "- legs run in ABBA order (lo, hi, hi, lo), fresh JVM each;"
        " reported walls/throughputs are the best of the two runs per"
        " parallelism, so a transient neighbor spike cannot read as a"
        " scaling change. Raw JSON below: best-of per leg, then every"
        " individual run.",
        f"- raw JSON local[{lo}] (best-of): `{json.dumps(results[lo])}`",
        f"- raw JSON local[{hi}] (best-of): `{json.dumps(results[hi])}`",
    ] + [
        f"- raw run local[{cpus}] #{i + 1}: `{json.dumps(r)}`"
        for cpus in (lo, hi)
        for i, r in enumerate(runs[cpus])
    ] + [
        "",
    ]
    out_path.write_text("\n".join(lines))
    print(json.dumps({"efficiency": effs, "out": str(out_path)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
