"""Unit tests for experiments/rd_keep_best.py (fresh-marathon checkpoint
rotation on held-out eval scores). Pure file/JSON logic — no jax."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "experiments"))

import rd_keep_best  # noqa: E402


def _curve(psnr_base):
    return {"psnr": [psnr_base + 0.1 * i for i in range(5)],
            "roi_psnr": [psnr_base - 7.0 + 0.05 * i for i in range(5)],
            "bpp": [0.02 * (i + 1) for i in range(5)]}


def _write_state(tmp, perf_psnr, plain_psnr, live_marker):
    os.makedirs("artifacts", exist_ok=True)
    res = {"variants": {
        "performance": {"estimated_rd": _curve(perf_psnr)},
        "plain": {"estimated_rd": _curve(plain_psnr)},
    }, "bd_psnr_roi_db": 0.5}
    with open("artifacts/rd_continued.json", "w") as f:
        json.dump(res, f)
    for v in ("performance", "plain"):
        d = rd_keep_best.live_path(v)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "marker.txt"), "w") as f:
            f.write(live_marker)


def _run(cycle):
    old = sys.argv
    sys.argv = ["rd_keep_best.py", str(cycle)]
    try:
        rd_keep_best.main()
    finally:
        sys.argv = old


def _marker(path):
    with open(os.path.join(path, "marker.txt")) as f:
        return f.read()


def test_new_best_snapshots_live(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_state(tmp_path, 21.0, 20.0, "cycle1")
    _run(1)
    for v in ("performance", "plain"):
        assert _marker(rd_keep_best.live_path(v) + ".best") == "cycle1"
    best = json.load(open(rd_keep_best.BEST_JSON))
    assert best["performance"]["cycle"] == 1
    traj = json.load(open(rd_keep_best.TRAJ_JSON))
    assert traj[-1]["performance"]["action"] == "new_best"
    assert traj[-1]["bd_psnr_roi_db"] == 0.5


def test_small_regression_keeps_latest_large_restores_best(tmp_path,
                                                           monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_state(tmp_path, 21.0, 20.0, "good")
    _run(1)
    # small regression (<1 dB combined): keep training from latest
    _write_state(tmp_path, 20.8, 19.9, "meh")
    _run(2)
    assert _marker(rd_keep_best.live_path("performance")) == "meh"
    assert _marker(rd_keep_best.live_path("performance") + ".best") == "good"
    # large regression (>1 dB below best): live restored from .best
    _write_state(tmp_path, 18.0, 17.0, "diverged")
    _run(3)
    traj = json.load(open(rd_keep_best.TRAJ_JSON))
    assert traj[-1]["performance"]["action"] == "diverged_restored_best"
    assert _marker(rd_keep_best.live_path("performance")) == "good"
    # best snapshot and score unchanged
    best = json.load(open(rd_keep_best.BEST_JSON))
    assert best["performance"]["cycle"] == 1


def test_gated_cycle_recorded_without_rotation(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_state(tmp_path, 21.0, 20.0, "good")
    _run(1)
    with open("artifacts/rd_continued.json", "w") as f:
        json.dump({"variants": {"performance": {
            "gate": "aborted_collapse_restored_prev"}}}, f)
    _run(2)
    traj = json.load(open(rd_keep_best.TRAJ_JSON))
    assert traj[-1]["performance"]["score"] is None
    assert traj[-1]["performance"]["gate"] == "aborted_collapse_restored_prev"
    assert _marker(rd_keep_best.live_path("performance") + ".best") == "good"
