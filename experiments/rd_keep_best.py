#!/usr/bin/env python
"""Keep-best checkpoint rotation for the fresh-data RD marathon.

After each rd_continue cycle, score each variant's held-out eval from
artifacts/rd_continued.json (mean global PSNR + mean ROI PSNR over the QP
sweep, both on the pinned 192px eval clips) and:

  * snapshot the live checkpoint to ``<live>.best`` when the score improves;
  * restore live from ``.best`` when the cycle regressed badly (>1 dB below
    best) so the next cycle doesn't continue from a diverged basin;
  * append the cycle's scores to artifacts/rd_fresh_trajectory.json.

Rationale: held-out eval peaked at marathon cycle 3 and declined under
further same-data cycles (rd_trajectory.json) — with fresh data per cycle
the expectation is recovery, but keep-best guarantees the harvested pair is
never worse than the best cycle seen.

    python experiments/rd_keep_best.py <cycle_index>
"""

import json
import os
import shutil
import sys

VARIANTS = ("performance", "plain")
BEST_JSON = "artifacts/rd_fresh_best.json"
TRAJ_JSON = "artifacts/rd_fresh_trajectory.json"
DIVERGE_DB = 1.0


def live_path(variant: str) -> str:
    return f"artifacts/rd_ckpt_{variant}_tiny-skip"


def score_of(curve: dict) -> float:
    psnr = curve["psnr"]
    roi = curve["roi_psnr"]
    return float(sum(psnr) / len(psnr) + sum(roi) / len(roi))


def main() -> None:
    cycle = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    with open("artifacts/rd_continued.json") as f:
        res = json.load(f)
    best = {}
    if os.path.exists(BEST_JSON):
        with open(BEST_JSON) as f:
            best = json.load(f)

    traj = []
    if os.path.exists(TRAJ_JSON):
        with open(TRAJ_JSON) as f:
            traj = json.load(f)
    row = {"cycle": cycle}

    for v in VARIANTS:
        cur = res.get("variants", {}).get(v, {})
        if "estimated_rd" not in cur:
            # gated/aborted cycle: rd_continue already restored .prev
            row[v] = {"score": None, "gate": cur.get("gate", "missing")}
            continue
        s = score_of(cur["estimated_rd"])
        row[v] = {"score": round(s, 4),
                  "psnr": [round(p, 3) for p in cur["estimated_rd"]["psnr"]],
                  "roi_psnr": [round(p, 3)
                               for p in cur["estimated_rd"]["roi_psnr"]],
                  "bpp": [round(b, 5) for b in cur["estimated_rd"]["bpp"]]}
        live, bst = live_path(v), live_path(v) + ".best"
        prev_best = best.get(v, {}).get("score", -1e9)
        if s > prev_best:
            if os.path.isdir(bst):
                shutil.rmtree(bst)
            shutil.copytree(live, bst)
            best[v] = {"score": s, "cycle": cycle}
            row[v]["action"] = "new_best"
        elif s < prev_best - DIVERGE_DB and os.path.isdir(bst):
            shutil.rmtree(live)
            shutil.copytree(bst, live)
            row[v]["action"] = "diverged_restored_best"
        else:
            row[v]["action"] = "kept_latest"
        print(f"[keep-best][{v}] cycle {cycle}: score {s:.3f} "
              f"(best {max(s, prev_best):.3f}) -> {row[v]['action']}",
              flush=True)

    for k in ("bd_psnr_roi_db", "bd_rate_roi_psnr_pct", "bd_psnr_db",
              "bd_rate_psnr_pct"):
        if k in res:
            row[k] = res[k]

    with open(BEST_JSON, "w") as f:
        json.dump(best, f, indent=2)
    traj.append(row)
    with open(TRAJ_JSON, "w") as f:
        json.dump(traj, f, indent=2)


if __name__ == "__main__":
    main()
