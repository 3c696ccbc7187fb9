#!/usr/bin/env python
"""Extract the cycle-by-cycle RD trajectory from the marathon log.

The RD marathon (scripts/rd_marathon.sh) trains both codec variants in
warm-restart cycles (experiments/rd_continue.py) and evaluates a 5-QP
mini sweep at the end of each variant's budget. This script parses those
eval blocks out of logs/rd_marathon.log into a committed artifact,
``artifacts/rd_trajectory.json``, so RESULTS.md can show *convergence* —
eval PSNR, QP8→56 separation and the performance-vs-plain ROI gap per
cycle — rather than only the final point. (The log itself is gitignored;
this artifact is the durable record.)

    python experiments/rd_trajectory.py [logfile]

Reference context: the reference repo publishes a single headline number
(+1-1.5 dB ROI PSNR, reference README.md:7) from multi-day H100 training;
on this 1-CPU-core host the same quantity is necessarily presented as a
trajectory toward that regime.
"""

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# marathon epochs: a "=== marathon start ... ===" line resets the cycle
# counter; only the latest epoch is reported (earlier recipes are
# superseded and their checkpoints discarded).
RE_START = re.compile(r"^=== marathon start (.+?) \(")
RE_CYCLE = re.compile(r"^=== continue cycle (\d+) done (.+?) rc=(\d+)")
RE_EVAL = re.compile(r"^\[(\w+)\+?\] (bpp|psnr|roi)=\[([^\]]*)\]")


def parse(path):
    epochs = [[]]  # list of eval-block lists per marathon epoch
    pending = {}   # variant -> {bpp/psnr/roi}
    for line in open(path, errors="replace"):
        line = line.strip()
        if RE_START.match(line):
            epochs.append([])
            pending = {}
            continue
        m = RE_EVAL.match(line)
        if m:
            variant, key, vals = m.groups()
            variant = variant.rstrip("+")
            vals = [float(v) for v in vals.split(",") if v.strip()]
            pending.setdefault(variant, {})[key] = vals
            continue
        m = RE_CYCLE.match(line)
        if m and pending:
            cyc, when, rc = m.groups()
            epochs[-1].append({"cycle": int(cyc), "when": when,
                               "rc": int(rc), "variants": pending})
            pending = {}
    cycles = epochs[-1]
    if pending:
        # a cycle that was stopped mid-run but already evaluated >=1 variant
        last = cycles[-1]["cycle"] if cycles else 0
        cycles.append({"cycle": last + 1, "when": "(stopped mid-cycle)",
                       "rc": None, "partial": True, "variants": pending})
    return cycles


def summarize(cycles):
    rows = []
    for c in cycles:
        row = {"cycle": c["cycle"], "when": c["when"]}
        for v, d in c["variants"].items():
            psnr, roi = d.get("psnr"), d.get("roi")
            if psnr:
                row[f"{v}_psnr_qp56"] = psnr[-1]
                row[f"{v}_qp_separation_db"] = round(psnr[-1] - psnr[0], 3)
            if roi:
                row[f"{v}_roi_qp56"] = roi[-1]
        p, q = c["variants"].get("performance"), c["variants"].get("plain")
        if p and q and p.get("roi") and q.get("roi"):
            # mean ROI advantage of performance over plain across the sweep
            n = min(len(p["roi"]), len(q["roi"]))
            row["roi_gap_db"] = round(
                sum(p["roi"][i] - q["roi"][i] for i in range(n)) / n, 3)
        rows.append(row)
    return rows


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "logs/rd_marathon.log")
    cycles = parse(log)
    out = {"source": os.path.relpath(log, REPO),
           "note": "192px eval mini-sweep (QP 8..56) at the end of each "
                   "warm-restart cycle; cycles 1-4 constant-LR, 5 annealed "
                   "(SGDR) per commit 21dff4d. Held-out eval peaked at "
                   "cycle 3 and declined after (train PSNR kept climbing): "
                   "further 7e-4 warm restarts kick the model out of its "
                   "basin, so the marathon was stopped mid-cycle-5 and the "
                   "cycle-4 checkpoint pair (best surviving, matching the "
                   "committed rd_continued.json) is what rd_eval harvests.",
           "cycles": cycles, "summary": summarize(cycles)}
    dst = os.path.join(REPO, "artifacts/rd_trajectory.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {dst} ({len(cycles)} cycles)")
    for r in out["summary"]:
        print(r)


if __name__ == "__main__":
    main()
